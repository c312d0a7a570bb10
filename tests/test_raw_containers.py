"""Fixture-based decode tests for the RAW container matrix.

Each format gets a synthetic in-memory fixture written by the generic TIFF
builder below plus a format-specific stream encoder (test-only oracles),
and the parser must reproduce the known CFA samples exactly — the same
strategy as the LJPEG round-trip tests. Covers: packed 10/12/14-bit
DNG/TIFF, CR2 (sliced lossless-JPEG), NEF (packed 12-bit + lossless
compressed), PEF (Huffman), ARW (packed + ARW2 blocks), container
sniffing, and actionable unsupported-format errors.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from rapidraw_tpu.io.containers import (
    UnsupportedRawFormat,
    parse_raw,
    sniff_container,
)
from rapidraw_tpu.io.dng import DngError, parse_dng


def _skip_if_no_native():
    from rapidraw_tpu.native import NativeBuildError, load

    try:
        load("vendor_huff")
        load("ljpeg")
    except NativeBuildError as e:
        pytest.skip(f"native toolchain unavailable: {e}")


# ------------------------------------------------------------ TIFF builder
TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 7: 1}


class Ifd:
    """One IFD: entries is a list of (tag, type, value).

    value forms: list[int] (types 1/3/4), bytes (1/7), str (2),
    ("blob", bytes) -> LONG offset to raw data,
    ("ifd", Ifd) -> LONG offset to a nested IFD (EXIF pointer / SubIFDs).
    """

    def __init__(self, entries=None):
        self.entries = list(entries or [])

    def add(self, tag, typ, value):
        self.entries.append((tag, typ, value))
        return self


def build_tiff(chain: list[Ifd], endian: str = "<", magic_extra: bytes = b"") -> bytes:
    """Serialize chained IFDs (+ nested) into a TIFF byte string.

    magic_extra: bytes placed at offset 8 (e.g. CR2's b"CR\\x02\\x00" +
    raw-IFD pointer placeholder is NOT handled — CR2 just needs the magic).
    """
    # collect every IFD depth-first so nested ones get offsets
    all_ifds: list[Ifd] = []

    def collect(ifd: Ifd):
        all_ifds.append(ifd)
        for _, _, v in ifd.entries:
            if isinstance(v, tuple) and v[0] == "ifd":
                collect(v[1])

    for ifd in chain:
        collect(ifd)

    header = 8 + len(magic_extra)
    offsets: dict[int, int] = {}
    pos = header
    for ifd in all_ifds:
        offsets[id(ifd)] = pos
        pos += 2 + 12 * len(ifd.entries) + 4

    # extra-value area and blob area
    extra_start = pos
    extra = bytearray()
    blob_area = bytearray()

    def value_bytes(typ, v) -> bytes:
        if isinstance(v, tuple):
            raise AssertionError("resolved earlier")
        if isinstance(v, bytes):
            return v
        if isinstance(v, str):
            return v.encode() + b"\0"
        fmt = {1: "B", 3: "H", 4: "I", 7: "B"}[typ]
        return b"".join(struct.pack(endian + fmt, x) for x in v)

    # first pass: compute extra sizes for >4-byte values
    resolved: dict[int, list] = {}
    for ifd in all_ifds:
        rows = []
        for tag, typ, v in sorted(ifd.entries, key=lambda e: e[0]):
            if isinstance(v, tuple) and v[0] == "ifd":
                rows.append((tag, 4, 1, ("ifdref", v[1])))
                continue
            if isinstance(v, tuple) and v[0] == "blob":
                rows.append((tag, 4, 1, ("blobref", v[1])))
                continue
            raw = value_bytes(typ, v)
            count = (
                len(raw) // TYPE_SIZES[typ]
                if not isinstance(v, list)
                else len(v)
            )
            rows.append((tag, typ, count, raw))
        resolved[id(ifd)] = rows

    # lay out extra + blobs
    blob_offsets: dict[int, int] = {}
    extra_cursor = extra_start
    for ifd in all_ifds:
        for i, (tag, typ, count, raw) in enumerate(resolved[id(ifd)]):
            if isinstance(raw, tuple):
                continue
            if len(raw) > 4:
                resolved[id(ifd)][i] = (tag, typ, count, ("extra", extra_cursor, raw))
                extra_cursor += len(raw)
    blob_start = extra_cursor
    blob_cursor = blob_start
    for ifd in all_ifds:
        for tag, typ, count, raw in resolved[id(ifd)]:
            if isinstance(raw, tuple) and raw[0] == "blobref":
                blob_offsets[id(raw[1])] = blob_cursor
                blob_cursor += len(raw[1])

    out = bytearray()
    out += (b"II" if endian == "<" else b"MM") + struct.pack(endian + "HI", 42, header)
    out += magic_extra
    for idx, ifd in enumerate(all_ifds):
        rows = resolved[id(ifd)]
        out += struct.pack(endian + "H", len(rows))
        for tag, typ, count, raw in rows:
            if isinstance(raw, tuple) and raw[0] == "ifdref":
                out += struct.pack(endian + "HHII", tag, 4, 1, offsets[id(raw[1])])
            elif isinstance(raw, tuple) and raw[0] == "blobref":
                out += struct.pack(endian + "HHII", tag, 4, 1, blob_offsets[id(raw[1])])
            elif isinstance(raw, tuple) and raw[0] == "extra":
                out += struct.pack(endian + "HHII", tag, typ, count, raw[1])
            else:
                out += struct.pack(endian + "HHI", tag, typ, count) + raw.ljust(4, b"\0")
        # chain pointer: next top-level IFD, only for members of `chain`
        nxt = 0
        if ifd in chain:
            ci = chain.index(ifd)
            if ci + 1 < len(chain):
                nxt = offsets[id(chain[ci + 1])]
        out += struct.pack(endian + "I", nxt)
    # pad out to extra_start (DFS collection may interleave; keep simple)
    assert len(out) == extra_start, (len(out), extra_start)
    for ifd in all_ifds:
        for tag, typ, count, raw in resolved[id(ifd)]:
            if isinstance(raw, tuple) and raw[0] == "extra":
                out += raw[2]
    for ifd in all_ifds:
        for tag, typ, count, raw in resolved[id(ifd)]:
            if isinstance(raw, tuple) and raw[0] == "blobref":
                out += raw[1]
    return bytes(out)


def _pack_msb(samples: np.ndarray, bits: int) -> bytes:
    """Row-padded MSB-first packing (TIFF 6.0) — encoder oracle."""
    h, w = samples.shape
    out = bytearray()
    for row in samples:
        acc = 0
        n = 0
        rowb = bytearray()
        for v in row:
            acc = (acc << bits) | int(v)
            n += bits
            while n >= 8:
                rowb.append((acc >> (n - 8)) & 0xFF)
                n -= 8
        if n:
            rowb.append((acc << (8 - n)) & 0xFF)
        out += rowb
    return bytes(out)


def _pack_12le(samples: np.ndarray) -> bytes:
    """Nikon little-endian 12-bit packing — encoder oracle."""
    h, w = samples.shape
    assert w % 2 == 0
    out = bytearray()
    for row in samples:
        for i in range(0, w, 2):
            a, b = int(row[i]), int(row[i + 1])
            out.append(a & 0xFF)
            out.append(((a >> 8) & 0xF) | ((b & 0xF) << 4))
            out.append((b >> 4) & 0xFF)
    return bytes(out)


# ------------------------------------------------- packed DNG/TIFF fixtures
def _cfa_ifd(w, h, bits, compression, payload: bytes, extra_tags=()) -> Ifd:
    ifd = Ifd()
    ifd.add(256, 4, [w]).add(257, 4, [h]).add(258, 3, [bits])
    ifd.add(259, 3, [compression]).add(262, 3, [32803]).add(277, 3, [1])
    ifd.add(273, 4, ("blob", payload)).add(278, 4, [h]).add(279, 4, [len(payload)])
    ifd.add(33422, 1, bytes([0, 1, 1, 2]))  # RGGB
    for tag, typ, v in extra_tags:
        ifd.add(tag, typ, v)
    return ifd


@pytest.mark.parametrize("bits", [10, 12, 14])
def test_dng_packed_bits_roundtrip(bits):
    rng = np.random.default_rng(bits)
    cfa = rng.integers(0, 1 << bits, size=(10, 20), dtype=np.uint16)
    data = build_tiff([_cfa_ifd(20, 10, bits, 1, _pack_msb(cfa, bits))])
    r = parse_dng(data)
    np.testing.assert_array_equal(r.cfa, cfa)
    assert r.pattern == "RGGB"
    assert r.white_level == (1 << bits) - 1


# --------------------------------------------------------------- sniffing
def test_sniff_and_unsupported_errors():
    assert sniff_container(b"\0\0\0\x18ftypcrx " + b"\0" * 64) == "cr3"
    assert sniff_container(b"FUJIFILMCCD-RAW " + b"\0" * 64) == "raf"
    assert sniff_container(b"FOVb" + b"\0" * 64) == "x3f"
    assert sniff_container(b"IIRO\x08\0\0\0" + b"\0" * 64) == "orf"
    assert sniff_container(b"IIU\0\x08\0\0\0" + b"\0" * 64) == "rw2"

    with pytest.raises(UnsupportedRawFormat) as ei:
        parse_raw(b"\0\0\0\x18ftypcrx " + b"\0" * 64, ext="cr3")
    assert "cr3" in str(ei.value) and "supported" in str(ei.value)

    with pytest.raises(DngError):
        parse_raw(b"garbage-not-a-raw-file" + b"\0" * 64, ext="xyz")


def test_sniff_tiff_family_dispatch():
    cfa = np.zeros((4, 8), np.uint16)
    plain = build_tiff([_cfa_ifd(8, 4, 16, 1, cfa.astype("<u2").tobytes())])
    assert sniff_container(plain) == "tiff"
    # Make-based dispatch
    nikon = build_tiff([
        Ifd([(271, 2, "NIKON CORPORATION")]),
        _cfa_ifd(8, 4, 16, 1, cfa.astype("<u2").tobytes()),
    ])
    assert sniff_container(nikon) == "nef"
    sony = build_tiff([
        Ifd([(271, 2, "SONY")]),
        _cfa_ifd(8, 4, 16, 1, cfa.astype("<u2").tobytes()),
    ])
    assert sniff_container(sony) == "arw"
    pentax = build_tiff([
        Ifd([(271, 2, "PENTAX Corporation")]),
        _cfa_ifd(8, 4, 16, 1, cfa.astype("<u2").tobytes()),
    ])
    assert sniff_container(pentax) == "pef"


# -------------------------------------------------------------------- CR2
def test_cr2_sliced_ljpeg_roundtrip():
    _skip_if_no_native()
    from test_native_ljpeg import encode_ljpeg

    rng = np.random.default_rng(2)
    h, w = 12, 36
    cfa = rng.integers(0, 1 << 14, size=(h, w), dtype=np.uint16)

    # CR2 stores the sensor as vertical slices laid out sequentially:
    # 2 slices of 16 columns + final 4 (tag 0xc640 = [2, 16, 4])
    widths = [16, 16, 4]
    flat = np.concatenate([cfa[:, c0:c0 + sw].reshape(-1)
                           for c0, sw in zip([0, 16, 32], widths)])
    # encode as a 2-component SOF3 image with total samples h*w
    sof = flat.reshape(h, w)
    payload = encode_ljpeg(sof, precision=14, ncomp=2)

    # makernote: SensorInfo zeros (no crop), ColorData len 796 w/ WB at 63
    cd = [0] * 796
    cd[63:67] = [512, 256, 256, 384]  # R G1 G2 B -> wb (2, 1, 1.5)
    mn = Ifd([(0xE0, 3, [0] * 9), (0x4001, 3, cd)])
    exif = Ifd([(37500, 7, ("ifd", mn))])  # makernote as bare IFD via offset

    ifd0 = Ifd([(271, 2, "Canon"), (34665, 4, ("ifd", exif))])
    raw_ifd = Ifd([
        (259, 3, [7]),
        (273, 4, ("blob", payload)),
        (279, 4, [len(payload)]),
        (0xC640, 3, [2, 16, 4]),
    ])
    data = build_tiff([ifd0, raw_ifd], magic_extra=b"CR\x02\x00\0\0\0\0")
    assert sniff_container(data) == "cr2"
    r = parse_raw(data, ext="cr2")
    np.testing.assert_array_equal(r.cfa, cfa)
    np.testing.assert_allclose(r.wb, [2.0, 1.0, 1.5])
    assert r.pattern == "RGGB"


# -------------------------------------------------------------------- NEF
def _nikon_makernote_blob(entries: Ifd) -> bytes:
    """'Nikon\\0' + version + embedded little-endian TIFF."""
    inner = build_tiff([entries])
    return b"Nikon\x00\x02\x10\x00\x00" + inner


def _encode_nikon_lossless12(cfa: np.ndarray) -> bytes:
    """Test-only encoder for NEF compression 34713, 12-bit lossless
    (tree 2), vpred = 0: emits huffman(len) + len raw bits per diff."""
    counts = [0, 1, 4, 2, 3, 1, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0]
    values = [5, 4, 6, 3, 7, 2, 8, 1, 9, 0, 10, 11, 12]
    codes = {}
    code = 0
    k = 0
    for l in range(1, 17):
        for _ in range(counts[l - 1]):
            codes[values[k]] = (code, l)
            code += 1
            k += 1
        code <<= 1

    h, w = cfa.shape
    bits = []

    def put(v, n):
        for i in range(n - 1, -1, -1):
            bits.append((v >> i) & 1)

    vpred = [[0, 0], [0, 0]]
    hpred = [0, 0]
    for row in range(h):
        for col in range(w):
            target = int(cfa[row, col])
            if col < 2:
                diff = target - vpred[row & 1][col]
                vpred[row & 1][col] = target
                hpred[col] = target
            else:
                diff = target - hpred[col & 1]
                hpred[col & 1] = target
            # JPEG-style: category + offset bits
            ssss = abs(diff).bit_length()
            put(codes[ssss][0], codes[ssss][1])
            if ssss:
                v = diff if diff >= 0 else diff + (1 << ssss) - 1
                put(v, ssss)
    # pad to byte
    while len(bits) % 8:
        bits.append(1)
    out = bytearray()
    for i in range(0, len(bits), 8):
        b = 0
        for j in range(8):
            b = (b << 1) | bits[i + j]
        out.append(b)
    return bytes(out)


def test_nef_packed12_roundtrip():
    rng = np.random.default_rng(3)
    h, w = 8, 16
    cfa = rng.integers(0, 1 << 12, size=(h, w), dtype=np.uint16)
    mn = _nikon_makernote_blob(Ifd([(0x0C, 4, [2, 1, 1, 1])]))  # dummy WB longs
    exif = Ifd([(37500, 7, mn)])
    # Nikon packs uncompressed 12-bit MSB-first (dcraw packed_load_raw,
    # rawler decode_12be)
    sub = _cfa_ifd(w, h, 12, 1, _pack_msb(cfa, 12))
    ifd0 = Ifd([(271, 2, "NIKON CORPORATION"), (330, 4, ("ifd", sub)),
                (34665, 4, ("ifd", exif))])
    data = build_tiff([ifd0])
    r = parse_raw(data, ext="nef")
    np.testing.assert_array_equal(r.cfa, cfa)


def test_nef_compressed_lossless12_roundtrip():
    _skip_if_no_native()
    rng = np.random.default_rng(4)
    h, w = 10, 14
    cfa = rng.integers(0, 1 << 12, size=(h, w), dtype=np.uint16)
    stream = _encode_nikon_lossless12(cfa)

    # LinearizationTable: ver 0x46 0x14 (lossless), vpred zeros, csize 0
    lt = bytes([0x46, 0x14]) + struct.pack("<4H", 0, 0, 0, 0) + struct.pack("<H", 0)
    mn = _nikon_makernote_blob(Ifd([(0x96, 7, lt), (0x0C, 4, [2, 1, 1, 1])]))
    exif = Ifd([(37500, 7, mn)])
    sub = Ifd()
    sub.add(256, 4, [w]).add(257, 4, [h]).add(258, 3, [12])
    sub.add(259, 3, [34713]).add(262, 3, [32803]).add(277, 3, [1])
    sub.add(273, 4, ("blob", stream)).add(279, 4, [len(stream)])
    ifd0 = Ifd([(271, 2, "NIKON CORPORATION"), (330, 4, ("ifd", sub)),
                (34665, 4, ("ifd", exif))])
    data = build_tiff([ifd0])
    r = parse_raw(data, ext="nef")
    np.testing.assert_array_equal(r.cfa, cfa)


# -------------------------------------------------------------------- PEF
def _pentax_codemap(values=None) -> dict:
    """symbol -> (code, length) for the default counts with an optional
    symbol permutation (the makernote-0x220 override case)."""
    counts = [0, 2, 3, 1, 1, 1, 1, 1, 1, 2, 0, 0, 0, 0, 0, 0]
    values = values or [3, 4, 2, 5, 1, 6, 0, 7, 8, 9, 10, 11, 12]
    codes = {}
    code = 0
    k = 0
    for l in range(1, 17):
        for _ in range(counts[l - 1]):
            codes[values[k]] = (code, l)
            code += 1
            k += 1
        code <<= 1
    return codes


def _encode_pentax(cfa: np.ndarray, codes: dict | None = None) -> bytes:
    codes = codes or _pentax_codemap()
    h, w = cfa.shape
    bits = []

    def put(v, n):
        for i in range(n - 1, -1, -1):
            bits.append((v >> i) & 1)

    vpred = [[0, 0], [0, 0]]
    hpred = [0, 0]
    for row in range(h):
        for col in range(w):
            target = int(cfa[row, col])
            if col < 2:
                diff = target - vpred[row & 1][col]
                vpred[row & 1][col] = target
                hpred[col] = target
            else:
                diff = target - hpred[col & 1]
                hpred[col & 1] = target
            ssss = abs(diff).bit_length()
            put(codes[ssss][0], codes[ssss][1])
            if ssss:
                v = diff if diff >= 0 else diff + (1 << ssss) - 1
                put(v, ssss)
    while len(bits) % 8:
        bits.append(1)
    out = bytearray()
    for i in range(0, len(bits), 8):
        b = 0
        for j in range(8):
            b = (b << 1) | bits[i + j]
        out.append(b)
    return bytes(out)


def test_pef_huffman_roundtrip():
    _skip_if_no_native()
    rng = np.random.default_rng(5)
    h, w = 8, 12
    cfa = rng.integers(0, 1 << 12, size=(h, w), dtype=np.uint16)
    stream = _encode_pentax(cfa)
    ifd = _cfa_ifd(w, h, 12, 65535, stream)
    data = build_tiff([Ifd([(271, 2, "PENTAX Corporation")]), ifd])
    r = parse_raw(data, ext="pef")
    np.testing.assert_array_equal(r.cfa, cfa)


def test_pef_custom_huffman_table_0x220():
    """Makernote 0x220 overrides the Huffman table (dcraw builds from it
    unconditionally): a stream encoded with a permuted symbol assignment
    must decode correctly only when the tag is honored."""
    _skip_if_no_native()
    rng = np.random.default_rng(8)
    h, w = 8, 12
    cfa = rng.integers(0, 1 << 12, size=(h, w), dtype=np.uint16)
    # permute the class->code assignment vs the default table
    values = [4, 3, 2, 5, 1, 6, 0, 7, 8, 9, 10, 12, 11]
    codes = _pentax_codemap(values)
    stream = _encode_pentax(cfa, codes)

    # tag 0x220 payload (big-endian, like real 'AOC\0MM' makernotes):
    # u16 v with (v+12)&15 == 13, 12 filler bytes, 13 u16 codes
    # left-aligned in 12 bits, 13 length bytes
    payload = struct.pack(">H", 1) + b"\0" * 12
    payload += b"".join(
        struct.pack(">H", codes[c][0] << (12 - codes[c][1])) for c in range(13)
    )
    payload += bytes(codes[c][1] for c in range(13))

    # makernote blob: 'AOC\0' + order + one-entry IFD whose 0x220 offset is
    # FILE-absolute — build once, then patch the offset in place
    inner = struct.pack(">H", 1)
    inner += struct.pack(">HHI", 0x220, 7, len(payload)) + struct.pack(">I", 0)
    inner += struct.pack(">I", 0)
    mn_blob = b"AOC\0MM" + inner + payload

    exif = Ifd([(37500, 7, mn_blob)])
    ifd = _cfa_ifd(w, h, 12, 65535, stream)
    data = build_tiff([
        Ifd([(271, 2, "PENTAX Corporation"), (34665, 4, ("ifd", exif))]), ifd
    ])
    mn_pos = data.find(b"AOC\0")
    assert mn_pos > 0
    payload_abs = mn_pos + 6 + len(inner)
    entry_off_pos = mn_pos + 6 + 2 + 8  # IFD count + entry tag/type/count
    data = (
        data[:entry_off_pos]
        + struct.pack(">I", payload_abs)
        + data[entry_off_pos + 4 :]
    )
    r = parse_raw(data, ext="pef")
    np.testing.assert_array_equal(r.cfa, cfa)

    # sanity: the default table must NOT reproduce this stream
    no_mn = build_tiff([Ifd([(271, 2, "PENTAX Corporation")]),
                        _cfa_ifd(w, h, 12, 65535, stream)])
    try:
        r2 = parse_raw(no_mn, ext="pef")
        assert not np.array_equal(r2.cfa, cfa)
    except ValueError:
        pass  # default table may also fail to decode the stream at all


# -------------------------------------------------------------------- ARW
def _encode_arw2(plane: np.ndarray) -> bytes:
    """Pack 11-bit samples into ARW2 16-byte blocks (16 pixels per block,
    pairs of blocks interleaving 32 columns)."""
    h, w = plane.shape
    assert w % 32 == 0
    out = bytearray()
    for row in range(h):
        for c0 in range(0, w, 32):
            for phase in range(2):
                pix = plane[row, c0 + phase : c0 + 32 : 2].astype(int)
                imax = int(np.argmax(pix))
                # pick a DIFFERENT index for min (decoder tie-break)
                order = np.argsort(pix)
                imin = int(order[0]) if int(order[0]) != imax else int(order[1])
                vmax, vmin = int(pix[imax]), int(pix[imin])
                rng_ = vmax - vmin
                sh = 0
                while sh < 4 and (0x80 << sh) <= rng_:
                    sh += 1
                acc = 0
                acc |= vmax
                acc |= vmin << 11
                acc |= imax << 22
                acc |= imin << 26
                bit = 30
                for i in range(16):
                    if i in (imax, imin):
                        continue
                    delta = (int(pix[i]) - vmin) >> sh
                    assert delta < 0x80
                    acc |= delta << bit
                    bit += 7
                out += acc.to_bytes(16, "little")
    return bytes(out)


def test_arw2_roundtrip_quantized():
    rng = np.random.default_rng(6)
    h, w = 6, 64
    plane = rng.integers(0, 0x800, size=(h, w), dtype=np.uint16)
    stream = _encode_arw2(plane)
    ifd = _cfa_ifd(w, h, 8, 32767, stream)
    data = build_tiff([Ifd([(271, 2, "SONY")]), ifd])
    r = parse_raw(data, ext="arw")

    # decode then invert the tone curve: values quantized by the per-block
    # shift must match within the quantization step
    from rapidraw_tpu.io.makers import _arw2_curve

    curve = _arw2_curve()
    decoded_coded = np.searchsorted(curve, r.cfa.astype(np.uint32), side="left") >> 1
    assert np.abs(decoded_coded.astype(int) - plane.astype(int)).max() <= (1 << 4)


def test_arw2_partial_width_decodes_full_blocks():
    """A width that is not a multiple of 32 must decode the covered block
    pairs and leave the trailing columns black (dcraw's col < raw_width-30
    guard), not fail the reshape."""
    rng = np.random.default_rng(9)
    h = 4
    plane32 = rng.integers(0, 0x800, size=(h, 32), dtype=np.uint16)
    stream32 = _encode_arw2(plane32)
    # row stride is `width` bytes: pad each 32-byte row to 48
    w = 48
    rows = [stream32[r * 32 : (r + 1) * 32] + b"\0" * 16 for r in range(h)]
    ifd = _cfa_ifd(w, h, 8, 32767, b"".join(rows))
    data = build_tiff([Ifd([(271, 2, "SONY")]), ifd])
    r = parse_raw(data, ext="arw")
    assert r.cfa.shape == (h, w)
    assert (r.cfa[:, 32:] == 0).all()

    from rapidraw_tpu.io.makers import _arw2_curve

    curve = _arw2_curve()
    coded = np.searchsorted(curve, r.cfa[:, :32].astype(np.uint32), "left") >> 1
    assert np.abs(coded.astype(int) - plane32.astype(int)).max() <= (1 << 4)
    # Sony pedestal default applies when no BlackLevel tag is present
    assert r.black_level == 512.0


def test_arw_packed14_roundtrip():
    rng = np.random.default_rng(7)
    h, w = 8, 16
    cfa = rng.integers(0, 1 << 14, size=(h, w), dtype=np.uint16)
    ifd = _cfa_ifd(w, h, 14, 1, _pack_msb(cfa, 14))
    data = build_tiff([Ifd([(271, 2, "SONY")]), ifd])
    r = parse_raw(data, ext="arw")
    np.testing.assert_array_equal(r.cfa, cfa)


def test_loader_unsupported_is_actionable(tmp_path):
    from rapidraw_tpu.io.loader import load_image

    p = tmp_path / "img.cr3"
    p.write_bytes(b"\0\0\0\x18ftypcrx " + b"\0" * 64)
    with pytest.raises(UnsupportedRawFormat) as ei:
        load_image(str(p))
    assert "cr3" in str(ei.value)
    assert "supported" in str(ei.value)


# -------------------------------------------------------------- ORF fixtures
def _orf_bytes(ifd: Ifd) -> bytes:
    """ORF = TIFF with magic 'RO' (IIRO) instead of 42."""
    data = bytearray(build_tiff([ifd]))
    data[2:4] = b"RO"
    return bytes(data)


def test_orf_uncompressed16_roundtrip():
    rng = np.random.default_rng(5)
    cfa = rng.integers(0, 4096, (8, 12), dtype=np.uint16)
    payload = cfa.astype("<u2").tobytes()
    orf = _orf_bytes(_cfa_ifd(12, 8, 12, 1, payload))
    assert sniff_container(orf, "orf") == "orf"
    rf = parse_raw(orf, "orf")
    np.testing.assert_array_equal(rf.cfa, cfa)
    assert rf.pattern == "RGGB"
    assert rf.white_level == 4095.0


def test_orf_packed12_roundtrip():
    rng = np.random.default_rng(6)
    cfa = rng.integers(0, 4096, (6, 16), dtype=np.uint16)
    payload = _pack_12le(cfa)
    orf = _orf_bytes(_cfa_ifd(16, 6, 12, 1, payload))
    rf = parse_raw(orf, "orf")
    np.testing.assert_array_equal(rf.cfa, cfa)


def test_orf_corrupt_predictive_rejected():
    # an all-zero predictive stream decodes (zero diffs) — but a stream
    # that drives pixels past 12 bits must fail loudly, not wrap
    payload = b"\0" * 7 + b"\xff" * 64
    orf = _orf_bytes(_cfa_ifd(16, 6, 12, 1, payload))
    with pytest.raises(ValueError):
        parse_raw(orf, "orf")


# ------------------------------------------------- ADVICE regression tests
def test_dng_with_vendor_make_routes_to_dng():
    """DNGs converted from vendor RAWs keep Make='NIKON CORPORATION' etc.
    but carry DNGVersion (50706) — they must route to parse_dng, not the
    vendor parser (which would choke on DNG compression/metadata)."""
    cfa = np.arange(32, dtype=np.uint16).reshape(4, 8)
    converted = build_tiff([
        Ifd([(271, 2, "NIKON CORPORATION"), (50706, 1, bytes([1, 4, 0, 0]))]),
        _cfa_ifd(8, 4, 16, 1, cfa.astype("<u2").tobytes()),
    ])
    assert sniff_container(converted) == "tiff"
    r = parse_raw(converted, ext="dng")
    np.testing.assert_array_equal(r.cfa, cfa)
    # extension hint alone also wins over Make
    plain_vendor = build_tiff([
        Ifd([(271, 2, "SONY")]),
        _cfa_ifd(8, 4, 16, 1, cfa.astype("<u2").tobytes()),
    ])
    assert sniff_container(plain_vendor, ext="dng") == "tiff"


def test_nef_compressed_bigendian_makernote():
    """Real Nikon makernotes embed a big-endian TIFF; the
    LinearizationTable shorts (vpred/csize) must be read in that order —
    a little-endian misread byte-swaps every predictor."""
    _skip_if_no_native()
    rng = np.random.default_rng(11)
    h, w = 6, 8
    cfa = rng.integers(0, 1 << 12, size=(h, w), dtype=np.uint16)
    vp = [300, 500, 300, 500]  # asymmetric-byte values: swap would corrupt

    # encode against the nonzero vertical predictors
    counts = [0, 1, 4, 2, 3, 1, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0]
    values = [5, 4, 6, 3, 7, 2, 8, 1, 9, 0, 10, 11, 12]
    codes = {}
    code = 0
    k = 0
    for l in range(1, 17):
        for _ in range(counts[l - 1]):
            codes[values[k]] = (code, l)
            code += 1
            k += 1
        code <<= 1
    bits = []

    def put(v, n):
        for i in range(n - 1, -1, -1):
            bits.append((v >> i) & 1)

    vpred = [[vp[0], vp[1]], [vp[2], vp[3]]]
    hpred = [0, 0]
    for row in range(h):
        for col in range(w):
            target = int(cfa[row, col])
            if col < 2:
                diff = target - vpred[row & 1][col]
                vpred[row & 1][col] = target
                hpred[col] = target
            else:
                diff = target - hpred[col & 1]
                hpred[col & 1] = target
            ssss = abs(diff).bit_length()
            put(codes[ssss][0], codes[ssss][1])
            if ssss:
                v = diff if diff >= 0 else diff + (1 << ssss) - 1
                put(v, ssss)
    while len(bits) % 8:
        bits.append(1)
    stream = bytearray()
    for i in range(0, len(bits), 8):
        b = 0
        for j in range(8):
            b = (b << 1) | bits[i + j]
        stream.append(b)

    lt = (bytes([0x46, 0x14]) + struct.pack(">4H", *vp)
          + struct.pack(">H", 0))
    inner = build_tiff([Ifd([(0x96, 7, lt), (0x0C, 4, [2, 1, 1, 1])])],
                       endian=">")
    mn = b"Nikon\x00\x02\x10\x00\x00" + inner
    exif = Ifd([(37500, 7, mn)])
    sub = Ifd()
    sub.add(256, 4, [w]).add(257, 4, [h]).add(258, 3, [12])
    sub.add(259, 3, [34713]).add(262, 3, [32803]).add(277, 3, [1])
    sub.add(273, 4, ("blob", bytes(stream))).add(279, 4, [len(stream)])
    ifd0 = Ifd([(271, 2, "NIKON CORPORATION"), (330, 4, ("ifd", sub)),
                (34665, 4, ("ifd", exif))])
    data = build_tiff([ifd0])
    r = parse_raw(data, ext="nef")
    np.testing.assert_array_equal(r.cfa, cfa)


def test_arw2_curve_is_12bit_index_space():
    """dcraw shifts the SonyToneCurve breakpoints >>2 into the 12-bit
    index space of pix<<1; the curve must traverse all five segments by
    index 0xFFE and white_level must equal the curve ceiling."""
    from rapidraw_tpu.io.makers import _arw2_curve

    curve = _arw2_curve()
    # all five segments contribute: 512*1 + 768*2 + 768*4 + 768*8 + 1278*16
    assert int(curve[0xFFE]) == 31712
    # a full-scale frame must decode exactly to white_level
    plane = np.full((2, 32), 0x7FF, np.uint16)
    stream = _encode_arw2(plane)
    ifd = _cfa_ifd(32, 2, 8, 32767, stream)
    data = build_tiff([Ifd([(271, 2, "SONY")]), ifd])
    r = parse_raw(data, ext="arw")
    assert float(r.cfa.max()) == r.white_level == 31712.0


def test_cr2_bits_from_sof3_precision():
    """A dark 14-bit CR2 frame (max < 4096) must still report
    white_level 16383 — depth comes from the SOF3 precision field, not
    from pixel content."""
    _skip_if_no_native()
    from test_native_ljpeg import encode_ljpeg

    rng = np.random.default_rng(12)
    h, w = 8, 16
    cfa = rng.integers(0, 1 << 10, size=(h, w), dtype=np.uint16)  # dark
    payload = encode_ljpeg(cfa, precision=14, ncomp=2)
    ifd0 = Ifd([(271, 2, "Canon")])
    raw_ifd = Ifd([
        (259, 3, [7]),
        (273, 4, ("blob", payload)),
        (279, 4, [len(payload)]),
    ])
    data = build_tiff([ifd0, raw_ifd], magic_extra=b"CR\x02\x00\0\0\0\0")
    r = parse_raw(data, ext="cr2")
    np.testing.assert_array_equal(r.cfa, cfa)
    assert r.white_level == 16383.0


# ------------------------------------------------------------------- RW2
def _encode_rw2_stream(h, w, rng):
    """Test-only Panasonic 12-bit bitstream encoder: mirrors the decoder
    (dcraw panasonic_load_raw semantics) by SIMULATING it — random seeds
    and deltas drive the predictor state, and the expected image is the
    simulated predictor output. One 0x4000-byte section (small frames)."""
    buf = bytearray(0x4001)
    a = [0x20000]  # backwards bit cursor within the section

    def put(v, n):
        # LSB-first bit placement at the down-counting cursor with dcraw's
        # byte-index XOR: 16-byte groups advance forward through the
        # section, bytes within a group are consumed backward
        a[0] -= n
        assert a[0] >= 0, "test frame exceeds one section"
        idx = (a[0] // 8) ^ 0x3FF0
        sh = a[0] % 8
        word = buf[idx] | (buf[idx + 1] << 8)
        word |= (v & ((1 << n) - 1)) << sh
        buf[idx] = word & 0xFF
        buf[idx + 1] = (word >> 8) & 0xFF

    expected = np.zeros((h, w), np.uint16)
    for row in range(h):
        pred = [0, 0]
        nonz = [0, 0]
        sh = 0
        for col in range(w):
            i = col % 14
            if i == 0:
                pred = [0, 0]
                nonz = [0, 0]
            if i % 3 == 2:
                b = int(rng.integers(0, 4))
                put(b, 2)
                sh = 4 >> (3 - b)
            if nonz[i & 1]:
                j = int(rng.integers(0, 256))
                put(j, 8)
                if j:
                    pred[i & 1] -= 0x80 << sh
                    if pred[i & 1] < 0 or sh == 4:
                        pred[i & 1] &= ~(-1 << sh)
                    pred[i & 1] += j << sh
            else:
                nz = int(rng.integers(1, 256))  # nonzero: take the seed path
                put(nz, 8)
                nonz[i & 1] = nz
                lo = int(rng.integers(0, 16))
                put(lo, 4)
                pred[i & 1] = nz << 4 | lo
            expected[row, col] = pred[col & 1] & 0xFFFF
    # stored section layout: decoder copies the first 0x4000-0x2008 file
    # bytes to buf[0x2008:], the next 0x2008 bytes to buf[:0x2008]
    stream = bytes(buf[0x2008:0x4000]) + bytes(buf[0:0x2008])
    return stream, expected


def test_rw2_bitstream_roundtrip():
    _skip_if_no_native()
    from rapidraw_tpu.native import panasonic_decode

    rng = np.random.default_rng(21)
    h, w = 20, 56
    stream, expected = _encode_rw2_stream(h, w, rng)
    got = panasonic_decode(stream, w, h)
    np.testing.assert_array_equal(got, expected)


def test_rw2_container_parse():
    _skip_if_no_native()
    rng = np.random.default_rng(22)
    h, w = 20, 56
    stream, expected = _encode_rw2_stream(h, w, rng)

    ifd = Ifd([
        (0x0001, 1, bytes([4, 0, 0, 0])),
        (0x0002, 3, [w]), (0x0003, 3, [h]),
        (0x0004, 3, [2]), (0x0005, 3, [4]),   # top, left
        (0x0006, 3, [h]), (0x0007, 3, [w]),   # bottom, right
        (0x0009, 3, [1]),                     # 1-based: RGGB
        (0x000A, 3, [12]),
        (0x001C, 3, [143]), (0x001D, 3, [143]), (0x001E, 3, [143]),
        (0x0024, 3, [520]), (0x0025, 3, [263]), (0x0026, 3, [410]),
        (0x0118, 4, ("blob", stream)),
    ])
    data = bytearray(build_tiff([ifd]))
    data[2:4] = b"U\0"  # RW2 magic 85
    data = bytes(data)
    assert sniff_container(data, "rw2") == "rw2"
    r = parse_raw(data, ext="rw2")
    np.testing.assert_array_equal(r.cfa, expected[2:, 4:] & 0xFFFF)
    assert r.pattern == _shift(r)
    assert r.black_level == 143.0
    assert r.white_level == 4095.0
    np.testing.assert_allclose(r.wb, [520 / 263, 1.0, 410 / 263], rtol=1e-6)


def _shift(r):
    # RGGB shifted by (top=2, left=4) stays RGGB (even offsets)
    return "RGGB"


# ---------------------------------------------------------- ORF predictive
def _encode_orf_predictive(h, w, rng):
    """Test-only Olympus predictive encoder (dcraw olympus_load_raw
    semantics): simulates the decoder's carry/predictor state, emitting the
    3-bit sign+low, the unary high class (or the 12-zero escape), and the
    nbits remainder; returns (stream, expected_image)."""
    bits = []

    def put(v, n):
        for k in range(n - 1, -1, -1):
            bits.append((v >> k) & 1)

    expected = np.zeros((h, w), np.int32)
    for row in range(h):
        acarry = [[0, 0, 0], [0, 0, 0]]
        for col in range(w):
            carry = acarry[col & 1]
            i = 2 * (carry[2] < 3)
            nbits = 2 + i
            while (carry[0] & 0xFFFF) >> (nbits + i):
                nbits += 1

            # predictor (mirrors the decoder)
            if row < 2 and col < 2:
                pred = 0
            elif row < 2:
                pred = int(expected[row, col - 2])
            elif col < 2:
                pred = int(expected[row - 2, col])
            else:
                wv = int(expected[row, col - 2])
                nv = int(expected[row - 2, col])
                nw = int(expected[row - 2, col - 2])
                if (wv < nw < nv) or (nv < nw < wv):
                    if abs(wv - nw) > 32 or abs(nv - nw) > 32:
                        pred = wv + nv - nw
                    else:
                        pred = (wv + nv) >> 1
                else:
                    pred = wv if abs(wv - nw) > abs(nv - nw) else nv

            # choose a small carry0 / sign that keeps the pixel in range
            low = int(rng.integers(0, 4))
            for attempt in range(50):
                c0 = int(rng.integers(0, min(48, (12 << nbits) - 1)))
                sign_bit = int(rng.integers(0, 2))
                sign = -1 if sign_bit else 0
                diff = (c0 ^ sign) + carry[1]
                pix = pred + ((diff << 2) | low)
                if 0 <= pix < (1 << 12):
                    break
            else:
                sign_bit, sign = 0, 0
                c0 = 0
                diff = carry[1]
                pix = pred + ((diff << 2) | low)
                pix = max(0, min(pix, (1 << 12) - 1))

            put(sign_bit << 2 | low, 3)
            high = c0 >> nbits
            assert high < 12
            put(1, high + 1)  # `high` zeros then a 1
            put(c0 & ((1 << nbits) - 1), nbits)

            carry[0] = c0
            carry[1] = (diff * 3 + carry[1]) >> 5
            carry[2] = 0 if carry[0] > 16 else carry[2] + 1
            expected[row, col] = pix

    while len(bits) % 8:
        bits.append(0)
    payload = bytearray()
    for k in range(0, len(bits), 8):
        b = 0
        for j in range(8):
            b = (b << 1) | bits[k + j]
        payload.append(b)
    return b"\0" * 7 + bytes(payload), expected.astype(np.uint16)


def test_orf_predictive_roundtrip():
    _skip_if_no_native()
    from rapidraw_tpu.native import olympus_decode

    rng = np.random.default_rng(23)
    h, w = 12, 20
    stream, expected = _encode_orf_predictive(h, w, rng)
    got = olympus_decode(stream, w, w, h)
    np.testing.assert_array_equal(got, expected)


def test_orf_predictive_container_parse():
    _skip_if_no_native()
    rng = np.random.default_rng(24)
    h, w = 12, 20
    stream, expected = _encode_orf_predictive(h, w, rng)
    orf = _orf_bytes(_cfa_ifd(w, h, 12, 1, stream))
    rf = parse_raw(orf, "orf")
    np.testing.assert_array_equal(rf.cfa, expected)
    assert rf.white_level == 4095.0


# ------------------------------------------------------------------- RAF
def _build_raf(cfa: np.ndarray, xtrans=None, wb_grb=(300, 450, 520)) -> bytes:
    """Minimal RAF: magic + directory + CFA header records + bare 16-bit
    CFA block (libopenraw layout)."""
    h, w = cfa.shape
    recs = []
    recs.append((0x0100, struct.pack(">HH", h, w)))
    if xtrans is not None:
        recs.append((0x0131, bytes(int(v) for v in np.asarray(xtrans).reshape(-1))))
    recs.append((0x2FF0, struct.pack(">HHHH", *wb_grb, 0)))
    hdr = struct.pack(">I", len(recs))
    for tag, payload in recs:
        hdr += struct.pack(">HH", tag, len(payload)) + payload
    payload = cfa.astype("<u2").tobytes()

    pre = bytearray(b"FUJIFILMCCD-RAW " + b"0201" + b"\0" * (0x54 - 20))
    cfa_hdr_off = 0x6C
    cfa_off = cfa_hdr_off + len(hdr)
    pre += struct.pack(">II", 0, 0)                      # jpeg off/len
    pre += struct.pack(">II", cfa_hdr_off, len(hdr))     # cfa header
    pre += struct.pack(">II", cfa_off, len(payload))     # cfa data
    assert len(pre) == 0x6C
    return bytes(pre) + hdr + payload


def test_raf_uncompressed_roundtrip():
    from rapidraw_tpu.raw.xtrans import DEFAULT_XTRANS

    rng = np.random.default_rng(31)
    h, w = 12, 18
    cfa = rng.integers(0, 1 << 14, (h, w), dtype=np.uint16)
    raf = _build_raf(cfa, xtrans=DEFAULT_XTRANS)
    assert sniff_container(raf, "raf") == "raf"
    r = parse_raw(raf, "raf")
    np.testing.assert_array_equal(r.cfa, cfa)
    assert r.xtrans is not None and r.xtrans.shape == (6, 6)
    np.testing.assert_array_equal(r.xtrans, DEFAULT_XTRANS)
    np.testing.assert_allclose(r.wb, [450 / 300, 1.0, 520 / 300], rtol=1e-6)
    assert r.white_level == 16383.0


def test_raf_compressed_rejected_actionably():
    rng = np.random.default_rng(32)
    cfa = rng.integers(0, 1 << 14, (12, 18), dtype=np.uint16)
    raf = bytearray(_build_raf(cfa))
    # shrink the declared CFA length below 2 B/px -> "compressed"
    struct.pack_into(">I", raf, 0x68, 12 * 18)
    with pytest.raises(UnsupportedRawFormat) as ei:
        parse_raw(bytes(raf), "raf")
    assert "compressed" in str(ei.value)


def test_xtrans_demosaic_properties():
    """Constant images reproduce exactly; sample sites pass through; a
    smooth gradient interpolates with small error."""
    import jax.numpy as jnp

    from rapidraw_tpu.raw.xtrans import DEFAULT_XTRANS, demosaic_xtrans

    h, w = 24, 30
    # constant per-channel CFA
    site = np.tile(DEFAULT_XTRANS, (5, 6))[:h, :w]
    consts = [0.25, 0.5, 0.75]
    cfa = np.choose(site, consts).astype(np.float32)
    out = np.asarray(demosaic_xtrans(jnp.asarray(cfa), DEFAULT_XTRANS))
    for c in range(3):
        np.testing.assert_allclose(out[c], consts[c], atol=1e-6)

    # gradient: each channel's reconstruction stays close to the gradient
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    grad = (xs / w + ys / h) / 2.0
    out2 = np.asarray(demosaic_xtrans(jnp.asarray(grad), DEFAULT_XTRANS))
    interior = np.abs(out2[:, 3:-3, 3:-3] - grad[None, 3:-3, 3:-3])
    assert interior.max() < 0.03, interior.max()


def test_raf_loads_end_to_end(tmp_path):
    from rapidraw_tpu.io.loader import load_image
    from rapidraw_tpu.raw.xtrans import DEFAULT_XTRANS

    rng = np.random.default_rng(33)
    cfa = rng.integers(500, 1 << 13, (18, 24), dtype=np.uint16)
    p = tmp_path / "shot.raf"
    p.write_bytes(_build_raf(cfa, xtrans=DEFAULT_XTRANS))
    img, is_raw = load_image(p)
    assert is_raw
    arr = np.asarray(img)
    assert arr.shape == (3, 18, 24)
    assert np.isfinite(arr).all() and arr.max() > 0


# ------------------------------------------------------------------- CR3
def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def _build_cr3() -> bytes:
    from rapidraw_tpu.io.cr3 import CANON_UUID

    cmt1 = build_tiff([Ifd([(271, 2, "Canon"), (272, 2, "EOS R5"),
                            (274, 3, [1])])])
    cmt2 = build_tiff([Ifd([(33434, 4, [1]), (34855, 3, [800])])])
    # stsd with one CRAW video entry, 8192x5464
    entry = struct.pack(">I", 0x56) + b"CRAW" + b"\0" * 6 + struct.pack(">H", 1)
    entry += b"\0" * 16 + struct.pack(">HH", 8192, 5464)
    entry = entry.ljust(0x56, b"\0")
    stsd = _box(b"stsd", struct.pack(">II", 0, 1) + entry)
    stbl = _box(b"stbl", stsd)
    minf = _box(b"minf", stbl)
    mdia = _box(b"mdia", minf)
    trak = _box(b"trak", mdia)
    canon = _box(b"uuid", CANON_UUID + _box(b"CMT1", cmt1) + _box(b"CMT2", cmt2))
    moov = _box(b"moov", canon + trak)
    ftyp = _box(b"ftyp", b"crx " + b"\0\0\0\x01" + b"crx isom")
    return ftyp + moov


def test_cr3_container_metadata_and_refusal():
    from rapidraw_tpu.io.cr3 import parse_cr3_info

    data = _build_cr3()
    assert sniff_container(data, "cr3") == "cr3"
    info = parse_cr3_info(data)
    assert info.exif.get("Make") == "Canon"
    assert info.exif.get("Model") == "EOS R5"
    assert info.exif.get("ISOSpeedRatings") == 800
    assert (info.width, info.height) == (8192, 5464)
    assert info.tracks and info.tracks[0][0] == "CRAW"

    with pytest.raises(UnsupportedRawFormat) as ei:
        parse_raw(data, ext="cr3")
    msg = str(ei.value)
    assert "crx" in msg and "8192x5464" in msg


def test_xtrans_directional_edge_quality():
    """The directional-green + color-difference demosaic must beat the
    bilinear-class bound at a hard vertical edge (peak error <= 0.2 where
    raw-value interpolation measured 0.25)."""
    import jax.numpy as jnp

    from rapidraw_tpu.raw.xtrans import DEFAULT_XTRANS, demosaic_xtrans

    h, w = 96, 120
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    rgb = np.stack([
        0.5 + 0.3 * np.sin(xs / 11.0),
        0.5 + 0.3 * np.cos(ys / 13.0),
        0.5 + 0.2 * np.sin((xs + ys) / 17.0),
    ])
    rgb[:, :, 60:] *= 0.3
    site = np.tile(DEFAULT_XTRANS, (h // 6 + 1, w // 6 + 1))[:h, :w]
    cfa = np.take_along_axis(rgb, site[None], axis=0)[0].astype(np.float32)
    out = np.asarray(demosaic_xtrans(jnp.asarray(cfa), DEFAULT_XTRANS))
    err = np.abs(out - rgb)[:, 4:-4, 4:-4]
    assert err.max() < 0.19, err.max()
    assert err.mean() < 0.0025, err.mean()


def test_rwl_routes_to_rw2_parser(tmp_path):
    """Leica RWL shares Panasonic's RW2 container (magic 85); the loader
    must accept the extension and the sniffer route it by magic."""
    _skip_if_no_native()
    from rapidraw_tpu.io.loader import is_raw_file

    rng = np.random.default_rng(22)
    h, w = 20, 56
    stream, expected = _encode_rw2_stream(h, w, rng)
    ifd = Ifd([
        (0x0001, 1, bytes([4, 0, 0, 0])),
        (0x0002, 3, [w]), (0x0003, 3, [h]),
        (0x0004, 3, [2]), (0x0005, 3, [4]),
        (0x0006, 3, [h]), (0x0007, 3, [w]),
        (0x0009, 3, [1]),
        (0x000A, 3, [12]),
        (0x001C, 3, [143]), (0x001D, 3, [143]), (0x001E, 3, [143]),
        (0x0024, 3, [520]), (0x0025, 3, [263]), (0x0026, 3, [410]),
        (0x0118, 4, ("blob", stream)),
    ])
    data = bytearray(build_tiff([ifd]))
    data[2:4] = b"U\0"
    data = bytes(data)
    assert is_raw_file(tmp_path / "leica.rwl")
    assert sniff_container(data, "rwl") == "rw2"
    r = parse_raw(data, ext="rwl")
    np.testing.assert_array_equal(r.cfa, expected[2:, 4:] & 0xFFFF)


# ------------------------------------------------------------------- MRW


def _build_mrw(cfa: np.ndarray, packed: bool, bayer: int = 0x0001,
               gains=(320, 256, 256, 448)) -> bytes:
    """Minolta MRW container per the public spec (parse_mrw docstring)."""
    h, w = cfa.shape
    prd = (b"27730001" + struct.pack(">HHHH", h, w, h, w)
           + bytes([12 if packed else 16, 12, 0x59 if packed else 0x52, 0])
           + struct.pack(">HH", 0, bayer))
    wbg = bytes([0, 0, 0, 0]) + struct.pack(">HHHH", *gains)
    blocks = (b"\x00PRD" + struct.pack(">I", len(prd)) + prd
              + b"\x00WBG" + struct.pack(">I", len(wbg)) + wbg)
    if packed:
        assert w % 2 == 0
        payload = bytearray()
        for row in cfa:
            for i in range(0, w, 2):
                a, b = int(row[i]), int(row[i + 1])
                payload += bytes([a >> 4, ((a & 0xF) << 4) | (b >> 8), b & 0xFF])
        payload = bytes(payload)
    else:
        payload = cfa.astype(">u2").tobytes()
    return b"\x00MRM" + struct.pack(">I", len(blocks)) + blocks + payload


def test_mrw_packed_roundtrip():
    rng = np.random.default_rng(31)
    cfa = rng.integers(0, 4095, (8, 12), dtype=np.uint16)
    r = parse_raw(_build_mrw(cfa, packed=True), ext="mrw")
    np.testing.assert_array_equal(r.cfa, cfa)
    assert r.pattern == "RGGB" and r.white_level == 4095.0
    # WBG gains (320, 256, 256, 448)/64 over RGGB -> wb = (1.25, 1.0, 1.75)
    np.testing.assert_allclose(r.wb, [1.25, 1.0, 1.75], atol=1e-6)


def test_mrw_unpacked_and_gbrg():
    rng = np.random.default_rng(32)
    cfa = rng.integers(0, 4095, (6, 10), dtype=np.uint16)
    r = parse_raw(_build_mrw(cfa, packed=False, bayer=0x0004), ext="mrw")
    np.testing.assert_array_equal(r.cfa, cfa)
    assert r.pattern == "GBRG"


def test_mrw_malformed_refused():
    with pytest.raises(ValueError):
        parse_raw(b"\x00MRM" + struct.pack(">I", 0xFFFFFF) + b"x" * 32, ext="mrw")
    with pytest.raises(ValueError):
        parse_raw(_build_mrw(np.zeros((4, 4), np.uint16), packed=True)[:-10],
                  ext="mrw")


# --------------------------------------- generic vendor TIFF-CFA long tail


def _thumb_ifd() -> Ifd:
    """An RGB preview IFD that must NOT be picked as the raw plane."""
    return (
        Ifd()
        .add(256, 3, [64])
        .add(257, 3, [48])
        .add(258, 3, [8, 8, 8])
        .add(277, 3, [3])
        .add(259, 3, [1])
        .add(273, 4, ("blob", bytes(64 * 48 * 3)))
        .add(279, 4, [64 * 48 * 3])
    )


def test_erf_packed_12bit():
    rng = np.random.default_rng(40)
    cfa = rng.integers(0, 4095, (6, 8), dtype=np.uint16)
    raw_ifd = (
        Ifd()
        .add(256, 3, [8])
        .add(257, 3, [6])
        .add(258, 3, [12])
        .add(277, 3, [1])
        .add(259, 3, [1])
        .add(273, 4, ("blob", _pack_msb(cfa, 12)))
        .add(279, 4, [len(_pack_msb(cfa, 12))])
    )
    ifd0 = _thumb_ifd().add(271, 2, "SEIKO EPSON CORP.")
    data = build_tiff([ifd0, raw_ifd])
    assert sniff_container(data, "erf") == "tiffcfa"
    r = parse_raw(data, ext="erf")
    np.testing.assert_array_equal(r.cfa, cfa)
    assert r.pattern == "RGGB" and r.white_level == 4095.0


def test_srw_16bit_wb():
    rng = np.random.default_rng(41)
    cfa = rng.integers(0, 16383, (8, 10), dtype=np.uint16)
    raw_ifd = (
        Ifd()
        .add(256, 3, [10])
        .add(257, 3, [8])
        .add(258, 3, [16])
        .add(277, 3, [1])
        .add(259, 3, [1])
        .add(273, 4, ("blob", cfa.tobytes()))
        .add(279, 4, [cfa.size * 2])
    )
    ifd0 = (
        _thumb_ifd()
        .add(271, 2, "SAMSUNG")
        .add(0xA021, 4, [640, 256, 512, 256])
        .add(0xA028, 4, [128, 0, 0, 0])
    )
    data = build_tiff([ifd0, raw_ifd])
    assert sniff_container(data, "srw") == "tiffcfa"
    r = parse_raw(data, ext="srw")
    np.testing.assert_array_equal(r.cfa, cfa)
    # dcraw samsung WB: (640-128)/256 = 2.0 red, 512/256 = 2.0 blue
    np.testing.assert_allclose(r.wb, [2.0, 1.0, 2.0], atol=1e-6)


def test_fff_16bit_bigendian_pattern():
    rng = np.random.default_rng(42)
    cfa = rng.integers(0, 65535, (4, 6), dtype=np.uint16)
    raw_ifd = (
        Ifd()
        .add(256, 3, [6])
        .add(257, 3, [4])
        .add(258, 3, [16])
        .add(277, 3, [1])
        .add(273, 4, ("blob", cfa.astype(">u2").tobytes()))
        .add(279, 4, [cfa.size * 2])
        .add(33422, 1, [1, 0, 2, 1])  # GRBG
    )
    ifd0 = Ifd().add(271, 2, "Hasselblad")
    data = build_tiff([ifd0, raw_ifd], endian=">")
    r = parse_raw(data, ext="fff")
    np.testing.assert_array_equal(r.cfa, cfa)
    assert r.pattern == "GRBG"


def test_3fr_compressed_refused_precisely():
    raw_ifd = (
        Ifd()
        .add(256, 3, [6])
        .add(257, 3, [4])
        .add(258, 3, [16])
        .add(277, 3, [1])
        .add(259, 3, [8])  # Hasselblad entropy coding
        .add(273, 4, ("blob", bytes(64)))
        .add(279, 4, [64])
    )
    ifd0 = Ifd().add(271, 2, "Hasselblad")
    data = build_tiff([ifd0, raw_ifd])
    with pytest.raises(ValueError, match="compression"):
        parse_raw(data, ext="3fr")


def test_kdc_asshotneutral_wb():
    rng = np.random.default_rng(43)
    cfa = rng.integers(0, 4095, (4, 8), dtype=np.uint16)
    raw_ifd = (
        Ifd()
        .add(256, 3, [8])
        .add(257, 3, [4])
        .add(258, 3, [12])
        .add(277, 3, [1])
        .add(273, 4, ("blob", _pack_msb(cfa, 12)))
        .add(279, 4, [len(_pack_msb(cfa, 12))])
    )
    neutral = struct.pack("<6I", 1, 2, 1, 1, 1, 2)  # 0.5, 1.0, 0.5
    ifd0 = (
        Ifd()
        .add(271, 2, "EASTMAN KODAK COMPANY")
        .add(50728, 5, neutral)
    )
    data = build_tiff([ifd0, raw_ifd])
    r = parse_raw(data, ext="kdc")
    np.testing.assert_array_equal(r.cfa, cfa)
    np.testing.assert_allclose(r.wb, [2.0, 1.0, 2.0], atol=1e-6)


def test_mef_ext_dispatch_without_make():
    cfa = (np.arange(24, dtype=np.uint16) * 7).reshape(4, 6)
    raw_ifd = (
        Ifd()
        .add(256, 3, [6])
        .add(257, 3, [4])
        .add(258, 3, [16])
        .add(277, 3, [1])
        .add(273, 4, ("blob", cfa.tobytes()))
        .add(279, 4, [cfa.size * 2])
    )
    data = build_tiff([raw_ifd])
    assert sniff_container(data, "mef") == "tiffcfa"
    r = parse_raw(data, ext="mef")
    np.testing.assert_array_equal(r.cfa, cfa)


def test_crw_refused_precisely():
    data = b"II\x1a\x00\x00\x00HEAPCCDR" + bytes(64)
    assert sniff_container(data, "crw") == "crw"
    with pytest.raises(UnsupportedRawFormat, match="crw"):
        parse_raw(data, ext="crw")


def test_tiffcfa_truncated_strip_refused():
    raw_ifd = (
        Ifd()
        .add(256, 3, [64])
        .add(257, 3, [64])
        .add(258, 3, [16])
        .add(277, 3, [1])
        .add(273, 4, ("blob", bytes(32)))
        .add(279, 4, [64 * 64 * 2])
    )
    data = build_tiff([Ifd().add(271, 2, "LEAF"), raw_ifd])
    with pytest.raises(ValueError):
        parse_raw(data, ext="mos")


def test_iiq_without_phase_one_directory_is_malformed():
    """IIQ decodes now (io/iiq.py, tests/test_iiq.py); a Phase One TIFF
    missing the IIII raw directory is a clean malformed-file error."""
    ifd0 = Ifd().add(271, 2, "Phase One A/S").add(256, 3, [100]).add(257, 3, [80])
    data = build_tiff([ifd0])
    assert sniff_container(data, "iiq") == "iiq"
    with pytest.raises(DngError, match="IIQ"):
        parse_raw(data, ext="iiq")


def test_dng_spp_allocation_bomb_refused():
    """SamplesPerPixel is attacker-controlled: a 65535-sample IFD must be
    a clean DngError, not a ~35TB allocation / MemoryError."""
    ifd = (
        Ifd()
        .add(256, 4, [65535]).add(257, 4, [4095]).add(258, 3, [16])
        .add(259, 3, [1]).add(262, 3, [32803]).add(277, 3, [65535])
        .add(273, 4, [64]).add(279, 4, [64])
        .add(50706, 1, bytes([1, 4, 0, 0]))
    )
    with pytest.raises(ValueError, match="SamplesPerPixel"):
        parse_raw(build_tiff([ifd]), ext="dng")


def test_dng_short_asshotneutral_neutral_wb():
    """AsShotNeutral with <3 values must not produce a 2-element wb that
    crashes develop later."""
    cfa = np.arange(16, dtype=np.uint16).reshape(4, 4) * 100
    ifd = (
        Ifd()
        .add(256, 4, [4]).add(257, 4, [4]).add(258, 3, [16])
        .add(259, 3, [1]).add(262, 3, [32803]).add(277, 3, [1])
        .add(273, 4, ("blob", cfa.tobytes())).add(279, 4, [32])
        .add(50706, 1, bytes([1, 4, 0, 0]))
        .add(50728, 5, struct.pack("<4I", 1, 2, 1, 1))  # 2 rationals only
    )
    r = parse_raw(build_tiff([ifd]), ext="dng")
    assert r.wb.shape == (3,)
    np.testing.assert_allclose(r.wb, [1.0, 1.0, 1.0])


def test_dng_missing_stripbytecounts_multi_strip():
    """No StripByteCounts + multiple strips: counts are synthesized from
    consecutive offsets instead of silently decoding only strip 0."""
    cfa = (np.arange(64, dtype=np.uint16) * 9).reshape(8, 8)
    top, bot = cfa[:4].tobytes(), cfa[4:].tobytes()
    # the Ifd builder doesn't support two blob offsets in one tag: by hand
    data_area = top + bot
    hdr = struct.pack("<2sHI", b"II", 42, 8)
    # IFD with 9 entries at offset 8
    entries = []
    def ent(tag, typ, cnt, val):
        return struct.pack("<HHI", tag, typ, cnt) + val
    n_entries = 9
    ifd_size = 2 + n_entries * 12 + 4
    strips_off = 8 + ifd_size
    data_off = strips_off + 16
    entries.append(ent(256, 4, 1, struct.pack("<I", 8)))
    entries.append(ent(257, 4, 1, struct.pack("<I", 8)))
    entries.append(ent(258, 3, 1, struct.pack("<HH", 16, 0)))
    entries.append(ent(259, 3, 1, struct.pack("<HH", 1, 0)))
    entries.append(ent(262, 3, 1, struct.pack("<HH", 32803, 0)))
    entries.append(ent(273, 4, 2, struct.pack("<I", strips_off)))
    entries.append(ent(277, 3, 1, struct.pack("<HH", 1, 0)))
    entries.append(ent(278, 4, 1, struct.pack("<I", 4)))
    entries.append(ent(50706, 1, 4, bytes([1, 4, 0, 0])))
    body = struct.pack("<H", n_entries) + b"".join(entries) + struct.pack("<I", 0)
    strip_offsets = struct.pack("<II", data_off, data_off + len(top)) + bytes(8)
    blob = hdr + body + strip_offsets + data_area
    r = parse_raw(blob, ext="dng")
    np.testing.assert_array_equal(r.cfa, cfa)


def _encode_nikon_lossy14(cfa: np.ndarray) -> bytes:
    """Test-only encoder for NEF 34713 lossy type 2, 14-bit (tree 3),
    vpred = 0, no tree switch (split beyond the last row)."""
    counts = [0, 1, 4, 3, 1, 1, 1, 1, 1, 2, 0, 0, 0, 0, 0, 0]
    values = [5, 6, 4, 7, 8, 3, 9, 2, 1, 0, 10, 11, 12, 13, 14]
    codes = {}
    code = 0
    k = 0
    for l in range(1, 17):
        for _ in range(counts[l - 1]):
            codes[values[k]] = (code, l)
            code += 1
            k += 1
        code <<= 1

    h, w = cfa.shape
    bits = []

    def put(v, n):
        for i in range(n - 1, -1, -1):
            bits.append((v >> i) & 1)

    vpred = [[0, 0], [0, 0]]
    hpred = [0, 0]
    for row in range(h):
        for col in range(w):
            target = int(cfa[row, col])
            if col < 2:
                diff = target - vpred[row & 1][col]
                vpred[row & 1][col] = target
                hpred[col] = target
            else:
                diff = target - hpred[col & 1]
                hpred[col & 1] = target
            ssss = abs(diff).bit_length()
            put(codes[ssss][0], codes[ssss][1])
            if ssss:
                v = diff if diff >= 0 else diff + (1 << ssss) - 1
                put(v, ssss)
    while len(bits) % 8:
        bits.append(1)
    out = bytearray()
    for i in range(0, len(bits), 8):
        b = 0
        for j in range(8):
            b = (b << 1) | bits[i + j]
        out.append(b)
    return bytes(out)


def test_nef_lossy_type2_ver40_curve_and_white():
    """ver 0x44/0x40 stepped curve: step and max rescale into the quarter
    domain (LibRaw) and the effective white level is the curve's top entry
    (dcraw maximum = curve[max-1]), not 16383."""
    _skip_if_no_native()
    rng = np.random.default_rng(11)
    h, w = 8, 12
    coded = rng.integers(0, 4096, size=(h, w), dtype=np.uint16)  # quarter domain
    stream = _encode_nikon_lossy14(coded)

    # LinearizationTable ver 0x44 0x40: 257 knots at 64*i -> after the /4
    # rescale step=16, max_eff=4096, lut[v] = 4v exactly; split at byte 562
    # set beyond the last row (no post-split tree switch in this fixture)
    csize = 257
    knots = (np.arange(csize, dtype=np.uint16) * 64).astype("<u2").tobytes()
    lt = bytes([0x44, 0x40]) + struct.pack("<4H", 0, 0, 0, 0)
    lt += struct.pack("<H", csize) + knots
    lt += b"\0" * (562 - len(lt)) + struct.pack("<H", h)

    mn = _nikon_makernote_blob(Ifd([(0x96, 7, lt), (0x0C, 4, [2, 1, 1, 1])]))
    exif = Ifd([(37500, 7, mn)])
    sub = Ifd()
    sub.add(256, 4, [w]).add(257, 4, [h]).add(258, 3, [14])
    sub.add(259, 3, [34713]).add(262, 3, [32803]).add(277, 3, [1])
    sub.add(273, 4, ("blob", stream)).add(279, 4, [len(stream)])
    ifd0 = Ifd([(271, 2, "NIKON CORPORATION"), (330, 4, ("ifd", sub)),
                (34665, 4, ("ifd", exif))])
    r = parse_raw(build_tiff([ifd0]), ext="nef")
    np.testing.assert_array_equal(r.cfa, coded.astype(np.uint32) * 4)
    assert r.white_level == float(4 * 4095)


def _build_raf_embedded_tiff(cfa: np.ndarray, record_dims=None) -> bytes:
    """RAF whose CFA block is an embedded little-endian TIFF with a
    FujiIFD (newer bodies): 0xF001/0xF002 dims, 0xF007/0xF008 strip."""
    h, w = cfa.shape
    payload = cfa.astype("<u2").tobytes()
    entries = [
        (0xF001, 4, 1, w), (0xF002, 4, 1, h), (0xF003, 4, 1, 14),
        (0xF007, 4, 1, None), (0xF008, 4, 1, len(payload)),
    ]
    ifd = struct.pack("<H", len(entries))
    data_off = 8 + 2 + 12 * len(entries) + 4
    for tag, typ, cnt, val in entries:
        v = data_off if val is None else val
        ifd += struct.pack("<HHII", tag, typ, cnt, v)
    ifd += struct.pack("<I", 0)
    tiff = b"II*\x00" + struct.pack("<I", 8) + ifd + payload

    rh, rw = record_dims if record_dims else (h, w)
    recs = [(0x0100, struct.pack(">HH", rh, rw))]
    hdr = struct.pack(">I", len(recs))
    for tag, rec in recs:
        hdr += struct.pack(">HH", tag, len(rec)) + rec

    pre = bytearray(b"FUJIFILMCCD-RAW " + b"0201" + b"\0" * (0x54 - 20))
    cfa_hdr_off = 0x6C
    cfa_off = cfa_hdr_off + len(hdr)
    pre += struct.pack(">II", 0, 0)
    pre += struct.pack(">II", cfa_hdr_off, len(hdr))
    pre += struct.pack(">II", cfa_off, len(tiff))
    assert len(pre) == 0x6C
    return bytes(pre) + hdr + tiff


def test_raf_dimensions_agree_with_decoded_shape():
    """raf_dimensions must report the FujiIFD raw dims for embedded-TIFF
    RAFs — the shape parse_raf actually decodes — even when the 0x0100
    CFA record carries a different (sensor full) size."""
    from rapidraw_tpu.io.raf import parse_raf, raf_dimensions

    w, h = 12, 6
    plane = np.arange(w * h, dtype=np.uint16).reshape(h, w)
    raf = _build_raf_embedded_tiff(plane, record_dims=(h + 4, w + 8))
    assert raf_dimensions(raf) == (w, h)
    rf = parse_raf(raf)
    assert rf.cfa.shape == (h, w)
    np.testing.assert_array_equal(rf.cfa, plane)


def test_raf_embedded_tiff_missing_height_refuses():
    """A FujiIFD with strip+width but no 0xF002 height must raise the
    module's ValueError contract, not a raw KeyError."""
    from rapidraw_tpu.io.raf import parse_raf

    w, h = 8, 4
    plane = np.zeros((h, w), np.uint16)
    raf = bytearray(_build_raf_embedded_tiff(plane))
    # overwrite the 0xF002 tag id with a harmless unknown tag
    idx = raf.find(struct.pack("<HH", 0xF002, 4))
    assert idx > 0
    raf[idx : idx + 2] = struct.pack("<H", 0xFEEE)
    with pytest.raises(ValueError):
        parse_raf(bytes(raf))


# ------------------------------------------------ formats.rs extension tail
# k25 / bay / ari / pro / ptx / bare-.raw (formats.rs:4-71): TIFF-shaped
# payloads decode through the generic vendor paths on the extension hint
# alone; non-TIFF proprietary bitstreams refuse PRECISELY (naming the
# format) instead of the generic "unrecognized container" fallthrough.


def test_extension_tail_tiff_shaped_decodes():
    for i, ext in enumerate(("k25", "bay", "pro")):
        rng = np.random.default_rng(50 + i)
        cfa = rng.integers(0, 4095, (6, 8), dtype=np.uint16)
        raw_ifd = (
            Ifd()
            .add(256, 3, [8])
            .add(257, 3, [6])
            .add(258, 3, [16])
            .add(277, 3, [1])
            .add(259, 3, [1])
            .add(262, 3, [32803])
            .add(33422, 1, bytes([0, 1, 1, 2]))
            .add(273, 4, ("blob", cfa.tobytes()))
            .add(279, 4, [cfa.size * 2])
        )
        # NO vendor Make tag: the EXTENSION hint must route it
        data = build_tiff([_thumb_ifd(), raw_ifd])
        assert sniff_container(data, ext) == "tiffcfa", ext
        r = parse_raw(data, ext=ext)
        np.testing.assert_array_equal(r.cfa, cfa)


def test_extension_tail_ptx_routes_to_pef():
    _skip_if_no_native()
    rng = np.random.default_rng(54)
    h, w = 8, 12
    cfa = rng.integers(0, 1 << 12, size=(h, w), dtype=np.uint16)
    stream = _encode_pentax(cfa)
    ifd = _cfa_ifd(w, h, 12, 65535, stream)
    # PTX is the PEF sibling extension; with AND without the Make tag
    data = build_tiff([Ifd([(271, 2, "PENTAX Corporation")]), ifd])
    assert sniff_container(data, "ptx") == "pef"
    r = parse_raw(data, ext="ptx")
    np.testing.assert_array_equal(r.cfa, cfa)
    data2 = build_tiff([Ifd([(271, 2, "UNKNOWN VENDOR")]), ifd])
    assert sniff_container(data2, "ptx") == "pef"


def test_extension_tail_precise_refusals():
    for ext in ("k25", "bay", "pro", "ptx", "raw"):
        with pytest.raises(UnsupportedRawFormat) as ei:
            parse_raw(b"\x00NOT-A-TIFF-CONTAINER" + b"\0" * 64, ext=ext)
        assert ei.value.format == ext, ext


def test_ari_metadata_and_refusal():
    from rapidraw_tpu.io.containers import raw_dimensions

    head = b"ARRI" + b"\0" * 16 + struct.pack("<II", 2880, 1620) + b"\0" * 64
    assert sniff_container(head, "ari") == "ari"
    with pytest.raises(UnsupportedRawFormat) as ei:
        parse_raw(head, ext="ari")
    assert "2880x1620" in str(ei.value) and "ARRI" in str(ei.value)
    assert raw_dimensions(head, "ari") == (2880, 1620)
    # truncated header: still a refusal, never an internal slip
    with pytest.raises(ValueError):
        parse_raw(b"ARRI\x00\x01", ext="ari")


def test_bare_panasonic_raw_routes_by_magic():
    # old Panasonic/Leica bare .raw carries the same IIU\0 magic-85
    # container as RW2 — the sniffer routes by MAGIC, so the extension
    # does not matter; and a TIFF-shaped bare .raw rides the TIFF path
    assert sniff_container(b"IIU\0\x08\0\0\0" + b"\0" * 64, ext="raw") == "rw2"
    rng = np.random.default_rng(55)
    cfa = rng.integers(0, 4095, (6, 8), dtype=np.uint16)
    data = build_tiff([_cfa_ifd(8, 6, 16, 1, cfa.tobytes())])
    assert sniff_container(data, "raw") == "tiff"
    r = parse_raw(data, ext="raw")
    np.testing.assert_array_equal(r.cfa, cfa)
