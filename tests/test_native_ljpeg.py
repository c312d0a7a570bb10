"""Round-trip tests for the native lossless-JPEG decoder (native/ljpeg.cc).

A minimal pure-Python LJPEG *encoder* (test-only oracle) produces
spec-conformant SOF3 streams; the C++ decoder must reproduce the samples
bit-exactly. Also covers the DNG integration path (Compression=7 strips
and tiles through io.dng.parse_dng).
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from rapidraw_tpu.native import NativeBuildError, ljpeg_decode


# ---------------------------------------------------------------- encoder
class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                b = self.acc & 0xFF
                self.out.append(b)
                if b == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self) -> None:
        while self.n:
            self.put(1, 1)  # pad with 1s per spec


def _huff_table():
    """17 symbols (ssss 0..16), all 5-bit canonical codes."""
    counts = [0, 0, 0, 0, 17] + [0] * 11
    symbols = list(range(17))
    codes = {}
    code = 0
    for length in range(1, 17):
        for s in symbols if length == 5 else []:
            codes[s] = (code, 5)
            code += 1
        code <<= 1
    return counts, symbols, codes


def encode_ljpeg(samples: np.ndarray, precision: int = 16, predictor: int = 1,
                 pt: int = 0, ncomp: int = 1) -> bytes:
    """samples: (H, W*ncomp) uint16 with values < 2**precision."""
    h, wn = samples.shape
    w = wn // ncomp
    counts, symbols, codes = _huff_table()

    def seg(marker, payload):
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    dht = bytes([0x00] + counts + symbols)
    sof = struct.pack(">BHHB", precision, h, w, ncomp)
    for c in range(ncomp):
        sof += bytes([c, 0x11, 0])
    sos = bytes([ncomp])
    for c in range(ncomp):
        sos += bytes([c, 0x00])
    sos += bytes([predictor, 0, pt])

    bw = _BitWriter()
    s = (samples.astype(np.int64) >> pt).reshape(h, w, ncomp)
    default = 1 << (precision - 1 - pt)
    for y in range(h):
        for x in range(w):
            for c in range(ncomp):
                if y == 0 and x == 0:
                    pred = default
                elif y == 0:
                    pred = int(s[y, x - 1, c])
                elif x == 0:
                    pred = int(s[y - 1, 0, c])
                else:
                    ra, rb, rc = int(s[y, x - 1, c]), int(s[y - 1, x, c]), int(s[y - 1, x - 1, c])
                    pred = {1: ra, 2: rb, 3: rc, 4: ra + rb - rc,
                            5: ra + ((rb - rc) >> 1), 6: rb + ((ra - rc) >> 1),
                            7: (ra + rb) >> 1}[predictor]
                diff = (int(s[y, x, c]) - pred) & 0xFFFF
                if diff >= 0x8000:
                    diff -= 0x10000
                ssss = diff.bit_length() if diff > 0 else ((-diff).bit_length() if diff else 0)
                code, nb = codes[ssss]
                bw.put(code, nb)
                if ssss:
                    v = diff if diff > 0 else diff + (1 << ssss) - 1
                    bw.put(v, ssss)
    bw.flush()

    return (
        b"\xff\xd8" + seg(0xFFC4, dht) + seg(0xFFC3, sof) + seg(0xFFDA, sos)
        + bytes(bw.out) + b"\xff\xd9"
    )


def _skip_if_no_toolchain():
    try:
        ljpeg_decode(encode_ljpeg(np.zeros((2, 2), np.uint16)))
    except NativeBuildError as e:
        pytest.skip(f"native toolchain unavailable: {e}")


# ----------------------------------------------------------------- tests
def test_roundtrip_basic():
    _skip_if_no_toolchain()
    rng = np.random.default_rng(0)
    img = rng.integers(0, 1 << 12, size=(16, 24), dtype=np.uint16)
    out = ljpeg_decode(encode_ljpeg(img, precision=12))
    np.testing.assert_array_equal(out, img)


@pytest.mark.parametrize("predictor", [1, 2, 3, 4, 5, 6, 7])
def test_roundtrip_all_predictors(predictor):
    _skip_if_no_toolchain()
    rng = np.random.default_rng(predictor)
    img = rng.integers(0, 1 << 14, size=(9, 13), dtype=np.uint16)
    out = ljpeg_decode(encode_ljpeg(img, precision=14, predictor=predictor))
    np.testing.assert_array_equal(out, img)


def test_roundtrip_two_components():
    _skip_if_no_toolchain()
    rng = np.random.default_rng(3)
    img = rng.integers(0, 1 << 16, size=(8, 20), dtype=np.uint16)  # w=10, 2 comps
    out = ljpeg_decode(encode_ljpeg(img, precision=16, ncomp=2))
    np.testing.assert_array_equal(out, img)


def test_roundtrip_point_transform():
    _skip_if_no_toolchain()
    rng = np.random.default_rng(4)
    img = (rng.integers(0, 1 << 10, size=(6, 8), dtype=np.uint16) << 2).astype(np.uint16)
    out = ljpeg_decode(encode_ljpeg(img, precision=12, pt=2))
    np.testing.assert_array_equal(out, img)


def test_byte_stuffing_heavy():
    _skip_if_no_toolchain()
    # constant 0xFFFF-ish data produces many 0xFF bytes in the stream
    img = np.full((8, 8), 0xFFF0, np.uint16)
    img[::2, ::2] = 0x000F
    out = ljpeg_decode(encode_ljpeg(img, precision=16))
    np.testing.assert_array_equal(out, img)


# ------------------------------------------------------- DNG integration
def _write_dng(path, cfa: np.ndarray, compression: int, tile: bool = False):
    """Minimal little-endian DNG writer (CFA photometric, one IFD)."""
    h, w = cfa.shape
    entries = []
    extra = bytearray()
    data_start_placeholder = []

    def entry(tag, typ, vals):
        sizes = {3: 2, 4: 4}
        packed = b"".join(struct.pack("<" + ("H" if typ == 3 else "I"), v) for v in vals)
        if len(packed) <= 4:
            entries.append((tag, typ, len(vals), packed.ljust(4, b"\0")))
        else:
            entries.append((tag, typ, len(vals), len(extra)))  # offset patched later
            extra.extend(packed)

    if compression == 7:
        if tile:
            # one tile covering the image (dims padded to multiples of 16)
            payload = encode_ljpeg(cfa, precision=16, ncomp=2)
        else:
            payload = encode_ljpeg(cfa, precision=16, ncomp=2)
    else:
        payload = cfa.astype("<u2").tobytes()

    entry(256, 4, [w])      # ImageWidth
    entry(257, 4, [h])      # ImageLength
    entry(258, 3, [16])     # BitsPerSample
    entry(259, 3, [compression])
    entry(262, 3, [32803])  # Photometric CFA
    entry(277, 3, [1])      # SamplesPerPixel
    if tile:
        entry(322, 4, [w])  # TileWidth
        entry(323, 4, [h])  # TileLength
        entry(324, 4, [0])  # TileOffsets (patched)
        entry(325, 4, [len(payload)])
        data_start_placeholder.append(324)
    else:
        entry(273, 4, [0])  # StripOffsets (patched)
        entry(278, 4, [h])  # RowsPerStrip
        entry(279, 4, [len(payload)])
        data_start_placeholder.append(273)
    entry(33422, 1, [])     # CFAPattern written via extra below

    # assemble: header(8) + count(2) + entries(12*n) + next(4) + extra + payload
    entries_sorted = sorted(entries, key=lambda e: e[0])
    n = len(entries_sorted)
    ifd_off = 8
    extra_off = ifd_off + 2 + 12 * n + 4
    data_off = extra_off + len(extra)

    buf = bytearray()
    buf += b"II" + struct.pack("<HI", 42, ifd_off)
    buf += struct.pack("<H", n)
    for tag, typ, cnt, val in entries_sorted:
        if tag == 33422:
            # CFAPattern RGGB as 4 bytes inline
            buf += struct.pack("<HHI", tag, 1, 4) + bytes([0, 1, 1, 2])
            continue
        if isinstance(val, int):  # extra-block offset
            buf += struct.pack("<HHII", tag, typ, cnt, extra_off + val)
        else:
            patched = val
            if tag in data_start_placeholder:
                patched = struct.pack("<I", data_off)
            buf += struct.pack("<HHI", tag, typ, cnt) + patched
    buf += struct.pack("<I", 0)
    buf += extra
    buf += payload
    path.write_bytes(bytes(buf))


def test_dng_compression7_strip_matches_uncompressed(tmp_path):
    _skip_if_no_toolchain()
    from rapidraw_tpu.io.dng import parse_dng

    rng = np.random.default_rng(7)
    cfa = rng.integers(0, 1 << 14, size=(16, 24), dtype=np.uint16)
    p1 = tmp_path / "u.dng"
    p7 = tmp_path / "c.dng"
    _write_dng(p1, cfa, compression=1)
    _write_dng(p7, cfa, compression=7)
    r1 = parse_dng(p1.read_bytes())
    r7 = parse_dng(p7.read_bytes())
    np.testing.assert_array_equal(r1.cfa, cfa)
    np.testing.assert_array_equal(r7.cfa, cfa)
    assert r7.pattern == "RGGB"


def test_dng_compression7_tiled(tmp_path):
    _skip_if_no_toolchain()
    from rapidraw_tpu.io.dng import parse_dng

    rng = np.random.default_rng(8)
    cfa = rng.integers(0, 1 << 16, size=(12, 16), dtype=np.uint16)
    p = tmp_path / "t.dng"
    _write_dng(p, cfa, compression=7, tile=True)
    r = parse_dng(p.read_bytes())
    np.testing.assert_array_equal(r.cfa, cfa)


def test_oversubscribed_dht_rejected():
    """A malformed DHT with counts[0] = 255 over-subscribes the canonical
    prefix space; the decoder must reject it cleanly instead of writing out
    of bounds (ADVICE r1: Huff::build hardening)."""
    _skip_if_no_toolchain()
    samples = np.arange(16, dtype=np.uint16).reshape(4, 4)
    good = encode_ljpeg(samples)
    # locate the DHT segment (FFC4) and corrupt its counts
    i = good.find(b"\xff\xc4")
    assert i >= 0
    bad = bytearray(good)
    bad[i + 5] = 255  # counts[0] (1-bit codes) = 255 -> over-subscribed
    with pytest.raises(ValueError):
        ljpeg_decode(bytes(bad))


def test_oversubscribed_dht_deep_level_rejected():
    """Over-subscription can also happen at deeper levels (total prefix
    space > 1<<16 only after accumulation)."""
    _skip_if_no_toolchain()
    samples = np.arange(16, dtype=np.uint16).reshape(4, 4)
    good = encode_ljpeg(samples)
    i = good.find(b"\xff\xc4")
    bad = bytearray(good)
    # counts = [2, 255, ...]: 2 one-bit codes exhaust the space, any 2-bit
    # code then overflows
    bad[i + 5] = 2
    bad[i + 6] = 255
    with pytest.raises(ValueError):
        ljpeg_decode(bytes(bad))


def test_noncanonical_dht_with_consistent_symbols_rejected():
    """DHT whose symbol count matches its counts (passes the segment-length
    check) but whose code space is over-subscribed: counts[0] = 3 needs
    three 1-bit codes in a 2-code space. Must fail in Huff::build, not
    write OOB."""
    _skip_if_no_toolchain()
    samples = np.arange(16, dtype=np.uint16).reshape(4, 4)
    good = encode_ljpeg(samples)

    counts = [3] + [0] * 15
    symbols = [0, 1, 2]
    dht = bytes([0x00] + counts + symbols)
    bad_dht = struct.pack(">HH", 0xFFC4, len(dht) + 2) + dht

    i = good.find(b"\xff\xc4")
    (seg_len,) = struct.unpack_from(">H", good, i + 2)
    rest = good[i + 2 + seg_len:]
    with pytest.raises(ValueError):
        ljpeg_decode(good[:i] + bad_dht + rest)
