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
