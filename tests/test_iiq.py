"""Phase One IIQ decode tests.

A test-only IIQ writer (container + the per-row compressed bitstream
encoder) produces fixtures; the parser must reproduce the dcraw-semantics
expected plane computed independently in NumPy here (curve ramp, <<2,
black + split col/row field subtraction). Covers: format-5 compressed
rows (length codes incl. the raw-16-bit escape, carry-over codes, the
unaligned-width tail), format-1 XOR-scrambled planes, margins + pattern
shift, WB/matrix tags, metadata-only dimension queries, and malformed
refusal."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from rapidraw_tpu.io.containers import parse_raw, raw_dimensions, sniff_container
from rapidraw_tpu.io.dng import DngError


def _skip_if_no_native():
    from rapidraw_tpu.native import NativeBuildError, load

    try:
        load("phase_one")
    except NativeBuildError as e:
        pytest.skip(f"native toolchain unavailable: {e}")


# ------------------------------------------------------------- bit writer
class _BitWriter:
    """MSB-first bit packer into 32-bit words in the file byte order
    (mirrors dcraw's ph1_bithuff refill: one u32 per get4())."""

    def __init__(self, big: bool):
        self.big = big
        self.chunks: list[tuple[int, int]] = []

    def put(self, val: int, nbits: int):
        if nbits:
            self.chunks.append((val & ((1 << nbits) - 1), nbits))

    def tobytes(self) -> bytes:
        bits = "".join(format(v, f"0{n}b") for v, n in self.chunks)
        bits += "0" * (-len(bits) % 32)
        out = bytearray()
        for i in range(0, len(bits), 32):
            out += int(bits[i : i + 32], 2).to_bytes(4, "big" if self.big else "little")
        return bytes(out)


# length value -> (unary index, extra bit); index 4 is coded as five zeros
# with no terminating one (the reader's unary scan exhausts at j == 5)
_LEN_CODE = {
    8: (0, 0), 7: (0, 1), 6: (1, 0), 9: (1, 1), 11: (2, 0),
    10: (2, 1), 5: (3, 0), 12: (3, 1), 14: (4, 0), 13: (4, 1),
}
_LENS = sorted(k for k in _LEN_CODE if k != 14)


def _emit_len(bw: _BitWriter, length: int):
    jj, bit = _LEN_CODE[length]
    if jj < 4:
        bw.put(0, jj + 1)  # the reader's unary count j is zeros-before-1
        bw.put(1, 1)
    else:
        bw.put(0, 5)  # j exhausts at 5 with no terminating one
    bw.put(bit, 1)


def _encode_row(bw: _BitWriter, values: np.ndarray, lens: list[int]):
    """Encode one row of predictor values (what dcraw calls pred[]).

    `lens` is the persistent per-parity length state — the decoder keeps
    it across rows (dcraw function scope), so the encoder must too; a
    group whose required length equals the current state emits the
    one-bit carry-over code (unary scan hits a 1 immediately)."""
    width = len(values)
    tail = width & ~7
    pred = [0, 0]
    for g0 in range(0, tail, 8):
        for i in (0, 1):
            # minimal available length covering this group's diffs
            p = pred[i]
            need = 5
            for v in values[g0 + i : g0 + 8 : 2]:
                d = int(v) - p
                p = int(v)
                while need < 14 and not (1 - (1 << (need - 1)) <= d <= (1 << (need - 1))):
                    need = next(
                        (L for L in _LENS if L > need), 14
                    )
            if need == lens[i]:
                bw.put(1, 1)  # carry-over: reuse the previous length
            else:
                _emit_len(bw, need)
                lens[i] = need
        for col in range(g0, g0 + 8):
            i = col & 1
            v = int(values[col])
            if lens[i] == 14:
                bw.put(v, 16)
            else:
                code = v - pred[i] - 1 + (1 << (lens[i] - 1))
                assert 0 <= code < (1 << lens[i])
                bw.put(code, lens[i])
            pred[i] = v
    for col in range(tail, width):
        bw.put(int(values[col]), 16)
    if tail < width:
        lens[0] = lens[1] = 14  # the decoder's tail branch sets both


def _curve(pred: np.ndarray) -> np.ndarray:
    """dcraw's format-5 small-value ramp."""
    ramp = (np.arange(256, dtype=np.float64) ** 2 / 3.969 + 0.5).astype(np.uint16)
    out = pred.astype(np.uint16).copy()
    small = pred < 256
    out[small] = ramp[pred[small]]
    return out


def _build_meta(entries: list[tuple[int, bytes]], big: bool) -> bytes:
    """A 0x110 correction meta block: 2-byte order mark, 6 pad bytes, u32
    directory offset (meta-relative), payloads, then 12-byte entries."""
    e = ">" if big else "<"
    payload = bytearray()
    ents = []
    for tag, pb in entries:
        off = 12 + len(payload)
        payload.extend(pb)
        ents.append((tag, len(pb), off))
    blob = bytearray()
    blob += b"MM" if big else b"II"
    blob += b"\0" * 6
    blob += struct.pack(e + "I", 12 + len(payload))
    blob += payload
    blob += struct.pack(e + "II", len(ents), 0)
    for tag, ln, off in ents:
        blob += struct.pack(e + "III", tag, ln, off)
    return bytes(blob)


# --------------------------------------------------------- container writer
def _build_iiq(
    pred: np.ndarray,
    fmt: int = 5,
    big: bool = False,
    black: int = 64,
    split_col: int = 0,
    split_row: int = 0,
    cblack: np.ndarray | None = None,
    rblack: np.ndarray | None = None,
    left: int = 0,
    top: int = 0,
    width: int | None = None,
    height: int | None = None,
    wb=(2.25, 1.0, 1.4375),
    romm: np.ndarray | None = None,
    keys: tuple[int, int] = (0xA5A5, 0x3C3C),
    meta_entries: list[tuple[int, bytes]] | None = None,
    tag210: float | None = None,
    tag21a: int | None = None,
) -> bytes:
    raw_h, raw_w = pred.shape
    e = ">" if big else "<"

    payload = bytearray()  # base-relative, starts at 12

    def _add(b: bytes) -> int:
        off = 12 + len(payload)
        payload.extend(b)
        return off

    wb_off = _add(struct.pack(e + "3f", *wb))
    romm_off = 0
    if romm is not None:
        romm_off = _add(struct.pack(e + "9f", *np.asarray(romm, np.float64).ravel()))
    cb_off = 0
    if cblack is not None:
        cb_off = _add(np.asarray(cblack, e + "i2").tobytes())
    rb_off = 0
    if rblack is not None:
        rb_off = _add(np.asarray(rblack, e + "i2").tobytes())

    strip_off = 0
    if fmt >= 3:
        rows = []
        lens = [0, 0]
        for r in range(raw_h):
            bw = _BitWriter(big)
            _encode_row(bw, pred[r], lens)
            rows.append(bw.tobytes())
        offsets = np.cumsum([0] + [len(b) for b in rows[:-1]]).astype(e + "u4")
        strip_off = _add(offsets.tobytes())
        data_off = _add(b"".join(rows))
    else:
        plane = pred.astype(e + "u2").ravel().copy()
        if fmt:
            mask = 0x5555 if fmt == 1 else 0x1354
            a = plane[0::2].astype(np.int64)
            b = plane[1::2].astype(np.int64)
            s0 = (a & mask) | (b & ~mask & 0xFFFF)
            s1 = (b & mask) | (a & ~mask & 0xFFFF)
            # invert the reader's unscramble: reader does a = v0 ^ akey
            # first, so we store (scrambled ^ key)
            plane[0::2] = (s0 ^ keys[0]).astype(np.uint16)
            plane[1::2] = (s1 ^ keys[1]).astype(np.uint16)
        data_off = _add(plane.tobytes())

    entries = [
        (0x108, 4, raw_w), (0x109, 4, raw_h), (0x10A, 4, left), (0x10B, 4, top),
        (0x10C, 4, width if width is not None else raw_w),
        (0x10D, 4, height if height is not None else raw_h),
        (0x10E, 4, fmt), (0x10F, 4, data_off), (0x21D, 4, black),
        (0x107, 12, wb_off),
    ]
    if fmt < 3:
        # splits also drive the meta corrections (quadrant multipliers,
        # the 0x419 right-half curve) on plain-plane files
        entries.extend([(0x222, 4, split_col), (0x224, 4, split_row)])
    if meta_entries is not None:
        meta_blob = _build_meta(meta_entries, big)
        meta_off = _add(meta_blob)
        entries.append((0x110, len(meta_blob), meta_off))
    if tag210 is not None:
        (word_210,) = struct.unpack(e + "I", struct.pack(e + "f", tag210))
        entries.append((0x210, 4, word_210))
    if tag21a is not None:
        entries.append((0x21A, 4, tag21a))
    if romm_off:
        entries.append((0x106, 36, romm_off))
    if fmt >= 3:
        entries.append((0x21C, 4 * raw_h, strip_off))
        entries.extend([(0x222, 4, split_col), (0x224, 4, split_row)])
        if cb_off:
            entries.append((0x223, 4 * raw_h, cb_off))
        if rb_off:
            entries.append((0x225, 4 * raw_w, rb_off))
    key_word = struct.unpack(e + "I", struct.pack(e + "HH", *keys))[0]
    entries.append((0x112, 4, key_word))

    dir_off = 12 + len(payload)
    blob = bytearray()
    blob += b"MMMM" if big else b"IIII"
    sig = (0x526177 << 8) | 0x55
    blob += struct.pack(e + "I", sig)
    blob += struct.pack(e + "I", dir_off)
    blob += payload
    blob += struct.pack(e + "II", len(entries), 0)
    for tag, length, word in entries:
        blob += struct.pack(e + "IIII", tag, 4, length, word)

    # TIFF wrapper: header + IFD0 with Make="Phase One A/S" after the blob
    ifd0_off = 8 + len(blob)
    make = b"Phase One A/S\0"
    out = bytearray()
    out += b"II*\0" + struct.pack("<I", ifd0_off)
    out += blob
    str_off = ifd0_off + 2 + 12 + 4
    out += struct.pack("<H", 1)
    out += struct.pack("<HHII", 271, 2, len(make), str_off)
    out += struct.pack("<I", 0)
    out += make
    return bytes(out)


def _expected_plane(
    pred: np.ndarray, fmt: int, black: int,
    split_col: int = 0, split_row: int = 0,
    cblack: np.ndarray | None = None, rblack: np.ndarray | None = None,
) -> np.ndarray:
    raw_h, raw_w = pred.shape
    pix = _curve(pred) if fmt == 5 else pred.astype(np.uint16)
    shift = 2 if fmt != 8 else 0
    v = (pix.astype(np.int32) << shift) - black
    if cblack is not None:
        cb = np.asarray(cblack, np.int32)
        v = v + cb[np.arange(raw_h)[:, None],
                   (np.arange(raw_w)[None, :] >= split_col).astype(int)]
    if rblack is not None:
        rb = np.asarray(rblack, np.int32)
        v = v + rb[np.arange(raw_w)[None, :],
                   (np.arange(raw_h)[:, None] >= split_row).astype(int)]
    return np.clip(v, 0, 65535).astype(np.uint16)


# ------------------------------------------------------------------- tests
def test_iiq_format5_roundtrip():
    _skip_if_no_native()
    rng = np.random.default_rng(11)
    # mixed dynamics: smooth regions (small diffs), hard jumps (raw escape),
    # small values (curve ramp), and a non-multiple-of-8 width tail
    h, w = 6, 21
    base = rng.integers(0, 300, (h, w))
    jumps = rng.integers(0, 16000, (h, w)) * (rng.random((h, w)) < 0.2)
    pred = (base + jumps).astype(np.uint16)
    cblack = rng.integers(-40, 40, (h, 2)).astype(np.int16)
    rblack = rng.integers(-40, 40, (w, 2)).astype(np.int16)
    data = _build_iiq(
        pred, fmt=5, black=64, split_col=9, split_row=3,
        cblack=cblack, rblack=rblack,
    )
    assert sniff_container(data, "iiq") == "iiq"
    r = parse_raw(data, ext="iiq")
    want = _expected_plane(pred, 5, 64, 9, 3, cblack, rblack)
    np.testing.assert_array_equal(r.cfa, want)
    assert r.pattern == "RGGB"
    assert r.black_level == 0.0
    assert r.white_level == float(0xFFFC - 64)
    np.testing.assert_allclose(r.wb, [2.25, 1.0, 1.4375], rtol=1e-6)


def test_iiq_format5_bigendian_margins_and_matrix():
    _skip_if_no_native()
    rng = np.random.default_rng(5)
    h, w = 8, 24
    pred = rng.integers(0, 4000, (h, w)).astype(np.uint16)
    romm = np.eye(3) + rng.normal(0, 0.05, (3, 3))
    data = _build_iiq(
        pred, fmt=5, big=True, black=16,
        left=3, top=1, width=16, height=6, romm=romm,
    )
    r = parse_raw(data, ext="iiq")
    want = _expected_plane(pred, 5, 16)[1 : 1 + 6, 3 : 3 + 16]
    np.testing.assert_array_equal(r.cfa, want)
    # top=1, left=3 -> both parities flip: RGGB -> GBRG... -> shifted
    from rapidraw_tpu.io.makers import _shift_pattern

    assert r.pattern == _shift_pattern("RGGB", 1, 1)
    # matrix: xyz_to_cam = inv(romm @ RGB_FROM_ROMM) @ inv(SRGB_TO_XYZ)
    from rapidraw_tpu.io.iiq import _RGB_FROM_ROMM
    from rapidraw_tpu.raw.color import SRGB_TO_XYZ

    want_m = np.linalg.inv(romm @ _RGB_FROM_ROMM) @ np.linalg.inv(SRGB_TO_XYZ)
    np.testing.assert_allclose(r.xyz_to_cam, want_m, rtol=2e-5, atol=1e-6)


def test_iiq_format1_xor_scramble():
    rng = np.random.default_rng(3)
    pred = rng.integers(0, 65535, (4, 10)).astype(np.uint16)
    data = _build_iiq(pred, fmt=1, black=100)
    r = parse_raw(data, ext="iiq")
    np.testing.assert_array_equal(r.cfa, pred)
    assert r.black_level == 100.0
    assert r.white_level == 65535.0


def test_iiq_format0_plain_and_dimensions():
    pred = np.arange(40, dtype=np.uint16).reshape(5, 8)
    data = _build_iiq(pred, fmt=0, black=0)
    r = parse_raw(data, ext="iiq")
    np.testing.assert_array_equal(r.cfa, pred)
    assert raw_dimensions(data, "iiq") == (8, 5)


def test_iiq_unknown_format_refuses_precisely():
    from rapidraw_tpu.io.containers import UnsupportedRawFormat

    pred = np.zeros((2, 8), np.uint16)
    data = _build_iiq(pred, fmt=0)
    # corrupt the format tag (0x10e) to an unimplemented code
    idx = data.find(struct.pack("<I", 0x10E))
    assert idx > 0
    data = data[: idx + 12] + struct.pack("<I", 6) + data[idx + 16 :]
    with pytest.raises(UnsupportedRawFormat) as ei:
        parse_raw(data, ext="iiq")
    assert "format code 6" in str(ei.value)


def test_iiq_malformed_raises_valueerror():
    pred = np.arange(16, dtype=np.uint16).reshape(2, 8)
    good = _build_iiq(pred, fmt=5)
    for cut in (10, 24, 60, len(good) - 60):
        with pytest.raises(ValueError):
            parse_raw(good[:cut], ext="iiq")
    # directory offset out of range
    bad = bytearray(good)
    struct.pack_into("<I", bad, 16, 1 << 30)
    with pytest.raises(DngError):
        parse_raw(bytes(bad), ext="iiq")


def test_iiq_loads_end_to_end(tmp_path):
    _skip_if_no_native()
    rng = np.random.default_rng(7)
    pred = rng.integers(200, 3000, (8, 16)).astype(np.uint16)
    p = tmp_path / "shot.iiq"
    p.write_bytes(_build_iiq(pred, fmt=5, black=32))
    from rapidraw_tpu.io.loader import load_image

    img, is_raw = load_image(str(p))
    assert is_raw
    arr = np.asarray(img)
    assert arr.shape == (3, 8, 16)
    assert np.isfinite(arr).all()


# --------------------------------------------- meta-directory corrections
def test_iiq_meta_quadrant_multipliers():
    """0x41E: per-quadrant gain at dcraw's documented float-word offsets
    (4, 10, 14, 18), values stored as (gain - 1)."""
    pred = np.full((6, 8), 1000, np.uint16)
    q = [1.5, 0.5, 2.0, 1.0]
    words = np.zeros(19, np.float32)
    for idx, val in zip((4, 10, 14, 18), q):
        words[idx] = val - 1.0
    data = _build_iiq(
        pred, fmt=0, black=0, split_col=4, split_row=3,
        meta_entries=[(0x41E, words.tobytes())],
    )
    r = parse_raw(data, ext="iiq")
    want = np.empty((6, 8), np.uint16)
    want[:3, :4] = 1500
    want[:3, 4:] = 500
    want[3:, :4] = 2000
    want[3:, 4:] = 1000
    np.testing.assert_array_equal(r.cfa, want)


def test_iiq_meta_defect_bad_pixel():
    """0x400 type 129: 8-neighbor mean, neighbor set chosen by CFA color."""
    rng = np.random.default_rng(21)
    pred = rng.integers(100, 5000, (8, 10)).astype(np.uint16)
    # (2,3): (2+3) odd -> green (RGGB FC==1) -> dirs[0:8]
    # (4,4): even -> non-green -> dirs[4:12]
    recs = struct.pack("<HHHH", 3, 2, 129, 0) + struct.pack("<HHHH", 4, 4, 129, 0)
    data = _build_iiq(pred, fmt=0, black=0, meta_entries=[(0x400, recs)])
    r = parse_raw(data, ext="iiq")

    dirs = [(-1, -1), (-1, 1), (1, -1), (1, 1), (-2, 0), (0, -2), (0, 2), (2, 0),
            (-2, -2), (-2, 2), (2, -2), (2, 2)]

    def fix(p, row, col, j):
        tot = 0
        for dr, dc in dirs[j : j + 8]:
            rr, cc = row + dr, col + dc
            if 0 <= rr < p.shape[0] and 0 <= cc < p.shape[1]:
                tot += int(p[rr, cc])
        return (tot + 4) >> 3

    want = pred.copy()
    want[2, 3] = fix(want, 2, 3, 0)
    want[4, 4] = fix(want, 4, 4, 4)
    np.testing.assert_array_equal(r.cfa, want)


def test_iiq_meta_defect_bad_column():
    """0x400 type 131: green sites drop the worst of 4 diagonals; non-green
    sites blend the ±2 diagonals and the same-row ±2 pair."""
    rng = np.random.default_rng(22)
    pred = rng.integers(100, 5000, (9, 12)).astype(np.uint16)
    col = 5
    data = _build_iiq(
        pred, fmt=0, black=0,
        meta_entries=[(0x400, struct.pack("<HHHH", col, 0, 131, 0))],
    )
    r = parse_raw(data, ext="iiq")

    def at(p, rr, cc):
        if 0 <= rr < p.shape[0] and 0 <= cc < p.shape[1]:
            return float(p[rr, cc])
        return 0.0

    want = pred.copy()
    for row in range(9):
        if (row + col) % 2 == 1:  # green
            vals = [at(pred, row - 1, col - 1), at(pred, row - 1, col + 1),
                    at(pred, row + 1, col - 1), at(pred, row + 1, col + 1)]
            s = sum(vals)
            dev = [abs(4 * v - s) for v in vals]
            mx = dev.index(max(dev))
            want[row, col] = int((s - vals[mx]) / 3.0 + 0.5)
        else:
            s8 = (at(pred, row - 2, col - 2) + at(pred, row - 2, col + 2)
                  + at(pred, row + 2, col - 2) + at(pred, row + 2, col + 2))
            h2 = at(pred, row, col - 2) + at(pred, row, col + 2)
            want[row, col] = int(0.5 + s8 * 0.0732233 + h2 * 0.3535534)
    np.testing.assert_array_equal(r.cfa, want)


def test_iiq_meta_poly_curves():
    """0x41A adds Horner(poly, i) to every sample; 0x419 applies its
    quadratic only right of split_col with the tag-0x210 constant folded
    into the linear term."""
    pred = (np.arange(48, dtype=np.uint16) * 100).reshape(6, 8)

    # 0x41A with poly = (10, 0, 0, 0): curve[i] = i + 10
    p41a = np.array([10, 0, 0, 0], np.float32).tobytes()
    data = _build_iiq(pred, fmt=0, black=0, meta_entries=[(0x41A, p41a)])
    r = parse_raw(data, ext="iiq")
    np.testing.assert_array_equal(r.cfa, pred + 10)

    # 0x419: skip-word + 8 floats, poly[1]=5, rest 0, tag210=0
    #   p3 = 0 + (0 - 0)*0 + 1 = 1  ->  curve[i] = i + 5, cols >= split_col
    p419 = b"\0\0\0\0" + np.array([0, 5, 0, 0, 0, 0, 0, 0], np.float32).tobytes()
    data = _build_iiq(
        pred, fmt=0, black=0, split_col=4,
        meta_entries=[(0x419, p419)], tag210=0.0,
    )
    r = parse_raw(data, ext="iiq")
    want = pred.copy()
    want[:, 4:] += 5
    np.testing.assert_array_equal(r.cfa, want)


def test_iiq_meta_malformed_degrades_to_uncorrected():
    """Corrections are refinement: truncated/garbage meta payloads must
    yield the uncorrected plane, never an exception."""
    pred = np.arange(16, dtype=np.uint16).reshape(2, 8)
    # entry payload shorter than the tag needs
    data = _build_iiq(pred, fmt=0, black=0, meta_entries=[(0x41E, b"\0" * 8)])
    np.testing.assert_array_equal(parse_raw(data, ext="iiq").cfa, pred)
    # directory offset pointing past EOF
    good = _build_iiq(pred, fmt=0, black=0, meta_entries=[(0x41A, b"\0" * 16)])
    idx = good.find(struct.pack("<I", 0x110))
    assert idx > 0
    bad = bytearray(good)
    meta_off = struct.unpack_from("<I", bad, idx + 12)[0]
    struct.pack_into("<I", bad, 8 + 12 + meta_off - 12 + 8, 1 << 29)
    np.testing.assert_array_equal(parse_raw(bytes(bad), ext="iiq").cfa, pred)


def _dcraw_flat_field_oracle(plane, head, grid_vals, nc, top=0, left=0):
    """Literal transcription of dcraw's phase_one_flat_field loops
    (incremental bilinear interpolation), used as the semantic oracle for
    the vectorized implementation."""
    out = plane.astype(np.float64).copy()
    h, w = plane.shape
    wide = head[2] // head[4] + (head[2] % head[4] != 0)
    high = head[3] // head[5] + (head[3] % head[5] != 0)
    mrow = np.zeros(nc * wide)
    it = iter(grid_vals)

    def fc(r, c):
        return [[0, 1], [1, 2]][r % 2][c % 2]

    for y in range(high):
        for x in range(wide):
            for c in range(0, nc, 2):
                num = next(it)
                if y == 0:
                    mrow[c * wide + x] = num
                else:
                    mrow[(c + 1) * wide + x] = (num - mrow[c * wide + x]) / head[5]
        if y == 0:
            continue
        rend = head[1] + y * head[5]
        row = rend - head[5]
        while row < h and row < rend and row < head[1] + head[3] - head[5]:
            for x in range(1, wide):
                mult = np.zeros(nc)
                for c in range(0, nc, 2):
                    mult[c] = mrow[c * wide + x - 1]
                    mult[c + 1] = (mrow[c * wide + x] - mult[c]) / head[4]
                cend = head[0] + x * head[4]
                col = cend - head[4]
                while col < w and col < cend and col < head[0] + head[2] - head[4]:
                    c = fc(row - top, col - left) if nc > 2 else 0
                    if not (c & 1):
                        out[row, col] = min(max(int(out[row, col] * mult[c]), 0), 65535)
                    for c in range(0, nc, 2):
                        mult[c] += mult[c + 1]
                    col += 1
            for x in range(wide):
                for c in range(0, nc, 2):
                    mrow[c * wide + x] += mrow[(c + 1) * wide + x]
            row += 1
    return out.astype(np.uint16)


def test_iiq_meta_flat_field_u16_matches_dcraw_loops():
    """0x416: u16/32768 all-color flat field, bilinearly interpolated per
    grid cell — pinned against a literal transcription of dcraw's
    incremental loops on a randomized gain grid."""
    rng = np.random.default_rng(31)
    pred = rng.integers(500, 8000, (10, 14)).astype(np.uint16)
    head = (2, 1, 12, 8, 4, 2, 0, 0)  # col0,row0,w,h,col_cell,row_cell
    wide, high = 3, 4
    raw16 = rng.integers(20000, 60000, high * wide).astype(np.uint16)
    payload = struct.pack("<8H", *head) + raw16.astype("<u2").tobytes()
    data = _build_iiq(pred, fmt=0, black=0, meta_entries=[(0x416, payload)])
    r = parse_raw(data, ext="iiq")
    want = _dcraw_flat_field_oracle(pred, head, raw16 / 32768.0, 2)
    np.testing.assert_array_equal(r.cfa, want)


def test_iiq_meta_flat_field_float_allcolor():
    """0x401: float32 gains; a constant grid multiplies every covered
    pixel (truncating store), pixels outside the grid footprint are
    untouched."""
    pred = np.full((8, 8), 1001, np.uint16)
    head = (0, 0, 8, 8, 4, 4, 0, 0)  # wide=2, high=2
    gains = np.full(4, 1.5, np.float32)
    payload = struct.pack("<8H", *head) + gains.astype("<f4").tobytes()
    data = _build_iiq(pred, fmt=0, black=0, meta_entries=[(0x401, payload)])
    r = parse_raw(data, ext="iiq")
    want = _dcraw_flat_field_oracle(pred, head, gains.astype(np.float64), 2)
    np.testing.assert_array_equal(r.cfa, want)
    # covered band: rows 0..3 (one row band), cols 0..3 (one col strip)
    assert (r.cfa[:4, :4] == 1501).all()
    assert (r.cfa[4:, :] == 1001).all() and (r.cfa[:, 4:] == 1001).all()


def test_iiq_meta_flat_field_redblue():
    """0x40B (nc=4): separate red/blue gains applied only at FC==0/FC==2
    CFA sites; green sites pass through."""
    rng = np.random.default_rng(32)
    pred = rng.integers(1000, 9000, (8, 8)).astype(np.uint16)
    head = (0, 0, 8, 8, 4, 4, 0, 0)
    # per cell: (red, blue) pairs — u16/32768 gains live in [0, 2)
    gains = np.tile(np.array([1.5, 1.25], np.float64), 4)
    raw16 = (gains * 32768.0).astype("<u2")
    payload = struct.pack("<8H", *head) + raw16.tobytes()
    data = _build_iiq(pred, fmt=0, black=0, meta_entries=[(0x40B, payload)])
    r = parse_raw(data, ext="iiq")
    want = _dcraw_flat_field_oracle(pred, head, raw16.astype(np.float64) / 32768.0, 4)
    np.testing.assert_array_equal(r.cfa, want)
    rr, cc = np.meshgrid(np.arange(4), np.arange(4), indexing="ij")
    red = (rr % 2 == 0) & (cc % 2 == 0)
    green = (rr + cc) % 2 == 1
    blk_in, blk_out = pred[:4, :4].astype(np.int64), r.cfa[:4, :4].astype(np.int64)
    np.testing.assert_array_equal(blk_out[red], np.trunc(blk_in[red] * 1.5))
    np.testing.assert_array_equal(blk_out[green], blk_in[green])


def test_cubic_spline_curve_identity_and_linear():
    """dcraw cubic_spline semantics: a natural spline through collinear
    knots reproduces the line (identity exactly; halving within 1 LSB)."""
    from rapidraw_tpu.io.iiq import _cubic_spline_curve

    knots = np.array([0, 9000, 20000, 33000, 47000, 55000, 61000, 64000, 65535])
    ident = _cubic_spline_curve(knots, knots)
    np.testing.assert_array_equal(ident, np.arange(65536, dtype=np.uint16))
    half = _cubic_spline_curve(knots, knots // 2)
    ref = np.arange(65536) / 2.0
    assert np.abs(half.astype(np.float64) - ref).max() <= 1.0
    # non-increasing knots refuse (None) rather than solving a degenerate system
    bad = knots.copy()
    bad[3] = bad[2]
    assert _cubic_spline_curve(bad, knots) is None


def test_iiq_meta_quadrant_linearization():
    """0x41F: per-quadrant code curves splined to the quadrant-average
    reference. Equal quadrants mean ref == lc -> identity; unequal
    quadrants pull each quadrant toward the common reference."""
    pred = np.full((6, 8), 30000, np.uint16)
    knots = np.array([8000, 16000, 24000, 32000, 40000, 48000, 56000], np.uint32)
    same = np.tile(knots, 4).astype("<u4").tobytes()
    data = _build_iiq(
        pred, fmt=0, black=0, split_col=4, split_row=3,
        meta_entries=[(0x41F, same)],
    )
    np.testing.assert_array_equal(parse_raw(data, ext="iiq").cfa, pred)

    # quadrant (0,0) reads 10% high -> its curve must pull values DOWN,
    # the other three quadrants (now below the average) push UP
    lc = np.tile(knots, (4, 1))
    lc[0] = (knots * 1.1).astype(np.uint32)
    data = _build_iiq(
        pred, fmt=0, black=0, split_col=4, split_row=3,
        meta_entries=[(0x41F, lc.astype("<u4").tobytes())],
    )
    out = parse_raw(data, ext="iiq").cfa
    assert (out[:3, :4] < 30000).all()
    assert (out[:3, 4:] > 30000).all()
    assert (out[3:, :] > 30000).all()
    # all four quadrants stay internally uniform
    for blk in (out[:3, :4], out[:3, 4:], out[3:, :4], out[3:, 4:]):
        assert np.unique(blk).size == 1


def test_iiq_meta_quadrant_combined_respects_qmult_order():
    """0x431 (reference knots then per-quadrant targets) applies when no
    quadrant multiplier ran, and is skipped after 0x41E (dcraw's
    qmult_applied guard)."""
    pred = np.full((6, 8), 20000, np.uint16)
    knots = np.array([8000, 16000, 24000, 32000, 40000, 48000, 56000], np.int64)
    lc = np.tile(knots, (4, 1))
    lc[3] = (knots * 1.1).astype(np.int64)  # quadrant (1,1) boosted
    p431 = np.concatenate([knots, lc.ravel()]).astype("<u4").tobytes()
    data = _build_iiq(
        pred, fmt=0, black=0, split_col=4, split_row=3,
        meta_entries=[(0x431, p431)],
    )
    out = parse_raw(data, ext="iiq").cfa
    assert (out[3:, 4:] > 20000).all()  # boosted target curve
    np.testing.assert_array_equal(out[:3, :4], pred[:3, :4])  # identity quadrant

    # identity 0x41E first -> qmult_applied -> 0x431 must be a no-op
    words = np.zeros(19, np.float32)
    data = _build_iiq(
        pred, fmt=0, black=0, split_col=4, split_row=3,
        meta_entries=[(0x41E, words.tobytes()), (0x431, p431)],
    )
    np.testing.assert_array_equal(parse_raw(data, ext="iiq").cfa, pred)


def test_iiq_meta_41e_blocks_41f():
    """dcraw's phase_one_correct sets BOTH qmult_applied and qlin_applied
    when 0x41E runs, so a 0x41F entry later in the meta directory is
    skipped: 0x41E+0x41F must equal 0x41E alone."""
    pred = np.full((6, 8), 20000, np.uint16)
    words = np.zeros(19, np.float32)
    for idx, val in zip((4, 10, 14, 18), (1.5, 0.5, 2.0, 1.0)):
        words[idx] = val - 1.0
    knots = np.array([8000, 16000, 24000, 32000, 40000, 48000, 56000], np.uint32)
    lc = np.tile(knots, (4, 1))
    lc[0] = (knots * 1.1).astype(np.uint32)  # non-identity linearization
    kwargs = dict(fmt=0, black=0, split_col=4, split_row=3)
    alone = parse_raw(
        _build_iiq(pred, meta_entries=[(0x41E, words.tobytes())], **kwargs),
        ext="iiq",
    ).cfa
    both = parse_raw(
        _build_iiq(
            pred,
            meta_entries=[
                (0x41E, words.tobytes()),
                (0x41F, lc.astype("<u4").tobytes()),
            ],
            **kwargs,
        ),
        ext="iiq",
    ).cfa
    np.testing.assert_array_equal(both, alone)


def test_iiq_meta_nonfinite_payloads_degrade():
    """NaN floats in 0x41E multipliers or 0x419/0x41A polynomial
    coefficients skip the entry (degrade to the uncorrected plane)
    instead of flowing NaN through clip into a uint16 cast."""
    pred = np.full((6, 8), 20000, np.uint16)
    kwargs = dict(fmt=0, black=0, split_col=4, split_row=3)

    words = np.zeros(19, np.float32)
    words[4] = np.nan
    out = parse_raw(
        _build_iiq(pred, meta_entries=[(0x41E, words.tobytes())], **kwargs),
        ext="iiq",
    ).cfa
    np.testing.assert_array_equal(out, pred)

    poly419 = np.zeros(9, np.float32)
    poly419[6] = np.nan  # 4-byte prefix + 8 coefficients
    out = parse_raw(
        _build_iiq(pred, meta_entries=[(0x419, poly419.tobytes())], **kwargs),
        ext="iiq",
    ).cfa
    np.testing.assert_array_equal(out, pred)

    poly41a = np.array([0.0, np.inf, 0.0, 0.0], np.float32)
    out = parse_raw(
        _build_iiq(pred, meta_entries=[(0x41A, poly41a.tobytes())], **kwargs),
        ext="iiq",
    ).cfa
    np.testing.assert_array_equal(out, pred)


def _p412_payload(slopes: list[float], disc: int) -> bytes:
    """A 0x412 payload: head[1]=2 knots/strip, head[3]=2 column strips
    (table 1 sized to absorb the reference's last-strip overrun read),
    each strip a constant multiplier."""
    head = np.array([0, 2, 2, 2, 1, 0, 0, 0, 0], "<u4")
    n0, n1 = 4, 2
    yval = np.array(
        [slopes[0], slopes[0], slopes[1], slopes[1], slopes[2], slopes[2]], "<f4"
    )
    xval = np.array([0, 65535] * 3, "<u2")
    assert yval.size == n0 + n1 and xval.size == n0 + n1
    return head.tobytes() + struct.pack("<H", disc) + yval.tobytes() + xval.tobytes()


def test_iiq_meta_spatial_gain_412():
    """0x412: value-dependent row-gradient gain. With constant-slope
    strips the corrected value is trunc((m*row + v/2)*2), m blended
    between column strips by the f32 fractional strip position."""
    rng = np.random.default_rng(33)
    pred = rng.integers(1000, 20000, (6, 12)).astype(np.uint16)
    slopes = [2.0, 3.0, 5.0]
    data = _build_iiq(
        pred, fmt=0, black=0, meta_entries=[(0x412, _p412_payload(slopes, 0))]
    )
    out = parse_raw(data, ext="iiq").cfa

    h, w = pred.shape
    cfrac = (np.arange(w, dtype=np.float32) * np.float32(2) / np.float32(w)).astype(
        np.float64
    )
    cip = cfrac.astype(np.int64)
    m0 = np.array(slopes)[cip]
    m1 = np.array(slopes)[cip + 1]
    m = m0 * (1 - (cfrac - cip)) + m1 * (cfrac - cip)
    rows = np.arange(h)[:, None]
    want = np.clip(
        np.trunc((m[None, :] * rows + pred * 0.5) * 2.0), 0, 65535
    ).astype(np.uint16)
    np.testing.assert_array_equal(out, want)


def test_iiq_meta_spatial_gain_412_selects_by_tag_21a():
    """Among several 0x412 entries dcraw applies the one whose
    discriminator u16 is nearest main-directory tag 0x21A."""
    pred = np.full((4, 12), 10000, np.uint16)
    ent_a = (0x412, _p412_payload([2.0, 2.0, 2.0], 100))
    ent_b = (0x412, _p412_payload([7.0, 7.0, 7.0], 5000))
    data = _build_iiq(
        pred, fmt=0, black=0, meta_entries=[ent_a, ent_b], tag21a=4990
    )
    out = parse_raw(data, ext="iiq").cfa
    rows = np.arange(4)[:, None]
    want = (pred + 2 * 7 * rows).astype(np.uint16)  # entry B's slope
    np.testing.assert_array_equal(out, want)


def test_iiq_meta_flat_field_and_412_malformed_degrade():
    """Degenerate correction payloads leave the plane unchanged: a
    zero-cell flat-field header (dcraw's own early return), NaN float
    gains, and an all-zero 0x412 header (empty multiplier table)."""
    pred = np.arange(48, dtype=np.uint16).reshape(6, 8)
    zero_cell = struct.pack("<8H", 0, 0, 8, 8, 0, 4, 0, 0)
    nan_gain = struct.pack("<8H", 0, 0, 8, 8, 4, 4, 0, 0) + np.full(
        4, np.nan, "<f4"
    ).tobytes()
    data = _build_iiq(
        pred, fmt=0, black=0,
        meta_entries=[(0x416, zero_cell), (0x401, nan_gain), (0x412, b"\0" * 40)],
    )
    np.testing.assert_array_equal(parse_raw(data, ext="iiq").cfa, pred)


def test_iiq_meta_corrections_fuzz_never_crash():
    """Byte-flipping the 0x110 correction blob must never escape as an
    unhandled exception: corrections either apply, degrade to the
    uncorrected plane, or the file refuses with the library's typed
    errors."""
    from rapidraw_tpu.io.containers import UnsupportedRawFormat
    from rapidraw_tpu.io.dng import DngError

    pred = np.full((6, 8), 5000, np.uint16)
    head = struct.pack("<8H", 0, 0, 8, 4, 4, 2, 0, 0)
    gains = np.full(4, 1.25, "<f4")
    entries = [
        (0x41A, np.zeros(4, "<f4").tobytes()),
        (0x400, struct.pack("<HHHH", 3, 2, 129, 0)),
        (0x41E, np.zeros(19, "<f4").tobytes()),
        (0x401, head + gains.tobytes()),
        (0x41F, np.tile(np.arange(1, 8) * 8000, 4).astype("<u4").tobytes()),
        (0x412, _p412_payload([1.0, 1.0, 1.0], 0)),
    ]
    good = _build_iiq(pred, fmt=0, black=0, meta_entries=entries, tag21a=0)
    # locate the meta blob by content (it is unique in the file)
    meta_blob = _build_meta(entries, big=False)
    meta_at = good.find(meta_blob)
    assert meta_at > 0
    meta_len = len(meta_blob)
    rng = np.random.default_rng(44)
    for _ in range(250):
        bad = bytearray(good)
        for _k in range(int(rng.integers(1, 6))):
            off = meta_at + int(rng.integers(0, max(meta_len, 1)))
            bad[off] = int(rng.integers(0, 256))
        try:
            r = parse_raw(bytes(bad), ext="iiq")
            assert r.cfa.shape == pred.shape
        except (DngError, UnsupportedRawFormat, ValueError):
            pass  # typed refusal is acceptable


def test_iiq_predictor_overflow_is_nonfatal():
    """A predictor overflow must NOT abort the decode (dcraw's derror is a
    warning): the stored sample truncates to 16 bits, the overflowed
    predictor carries forward, and the row keeps decoding. Only pervasive
    corruption refuses."""
    _skip_if_no_native()
    from rapidraw_tpu.native import phase_one_decode

    width = 136  # 68 samples/parity * +2048 max delta > 0xffff
    bw = _BitWriter(big=False)
    lens = [0, 0]
    for g0 in range(0, width, 8):
        for i in (0, 1):
            if lens[i] == 12:
                bw.put(1, 1)  # carry-over
            else:
                _emit_len(bw, 12)
                lens[i] = 12
        for _col in range(8):
            bw.put((1 << 12) - 1, 12)  # max positive delta: +2048
    data = bw.tobytes()
    out = phase_one_decode(data, np.zeros(1, np.uint32), width, 1, 5, False)
    assert out.shape == (1, width)
    # pred after k samples of one parity = 2048k; sample 33+ of each
    # parity exceeds 0xffff and must appear truncated mod 65536
    expect_last = (2048 * 68) % 65536
    assert int(out[0, -1]) == expect_last or int(out[0, -2]) == expect_last
