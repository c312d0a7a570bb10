"""crx-class codec (io/crx.py + native/crx.cc) and the CR3 decode path.

The reference decodes CR3 via rawler's crx implementation
(/root/reference/src-tauri/Cargo.toml:27, raw_processing.rs:15-30). The
repo's codec implements the publicly documented lossless structure from
scratch; these tests pin round-trip conformance (encode -> decode is the
identity), strict validation (garbage refuses, it never decodes to
garbage), and the full container path (synthetic CR3 with CMT3 makernote
-> RawFile with Canon WB / SensorInfo black level).
"""

import struct

import numpy as np
import pytest

from rapidraw_tpu.io import crx
from rapidraw_tpu.io.containers import UnsupportedRawFormat, parse_raw
from rapidraw_tpu.native import crx_decode, crx_encode


def _natural_mosaic(h, w, seed=7, bits=14):
    """A mosaic with smooth gradients + noise — exercises small residuals
    (low Rice k) and occasional large ones."""
    rng = np.random.default_rng(seed)
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    base = 2048 + 4000 * (np.sin(xs / 23.0) + np.cos(ys / 31.0) + 2)
    base += rng.normal(0, 60, (h, w))
    base[h // 3 :, w // 2 :] += 3000  # hard edge
    return np.clip(base, 0, (1 << bits) - 1).astype(np.uint16)


# ------------------------------------------------------------- codec level


def test_codec_roundtrip_natural():
    planes = np.stack([_natural_mosaic(40, 56, seed=s) for s in range(4)])
    sample = crx_encode(planes)
    out = crx_decode(sample, 4, 56, 40)
    np.testing.assert_array_equal(out, planes)


def test_codec_roundtrip_extremes():
    rng = np.random.default_rng(3)
    # full-range noise: worst case for the entropy coder (escape path)
    planes = rng.integers(0, 1 << 16, (2, 17, 33), dtype=np.uint16)
    sample = crx_encode(planes)
    np.testing.assert_array_equal(crx_decode(sample, 2, 33, 17), planes)
    # constant plane: best case, long zero-residual runs
    flat = np.full((1, 64, 64), 9999, np.uint16)
    np.testing.assert_array_equal(
        crx_decode(crx_encode(flat), 1, 64, 64), flat
    )


def test_codec_rejects_garbage_and_truncation():
    planes = np.stack([_natural_mosaic(24, 32, seed=s) for s in range(4)])
    sample = crx_encode(planes)
    with pytest.raises(ValueError):
        crx_decode(b"\x00" * len(sample), 4, 32, 24)
    with pytest.raises(ValueError):
        crx_decode(sample[: len(sample) // 2], 4, 32, 24)
    # wrong dims -> either header size mismatch or bitstream overrun
    with pytest.raises(ValueError):
        crx_decode(sample, 4, 64, 48)


def test_codec_compresses_smooth_content():
    planes = np.stack([_natural_mosaic(64, 96, seed=s) for s in range(4)])
    sample = crx_encode(planes)
    assert len(sample) < planes.nbytes  # entropy coding actually helps


# ------------------------------------------------------------- CMP1 header


def test_cmp1_roundtrip():
    c = crx.Cmp1(
        f_width=6000, f_height=4000, tile_width=6000, tile_height=4000,
        n_bits=14, n_planes=4, cfa_layout=0, enc_type=0, image_levels=0,
    )
    parsed = crx.parse_cmp1(crx.build_cmp1(c))
    assert parsed is not None
    assert parsed == c
    assert crx.cfa_pattern(parsed) == "RGGB"


def test_cmp1_rejects_implausible():
    assert crx.parse_cmp1(b"\0" * 16) is None
    bad = crx.Cmp1(
        f_width=0, f_height=4000, tile_width=1, tile_height=1,
        n_bits=14, n_planes=4, cfa_layout=0, enc_type=0, image_levels=0,
    )
    assert crx.parse_cmp1(crx.build_cmp1(bad)) is None


def test_decode_raw_mosaic_roundtrip():
    mosaic = _natural_mosaic(48, 64)
    sample, cmp1 = crx.encode_raw(mosaic, n_bits=14, cfa_layout=0)
    np.testing.assert_array_equal(crx.decode_raw(sample, cmp1), mosaic)


def test_decode_raw_refuses_lossy_modes():
    mosaic = _natural_mosaic(16, 16)
    sample, cmp1 = crx.encode_raw(mosaic)
    cmp1.enc_type = 3  # lossy wavelet
    with pytest.raises(ValueError):
        crx.decode_raw(sample, cmp1)


# --------------------------------------------------------- full CR3 path


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def _build_cr3_with_raw(mosaic: np.ndarray, wb=(2145, 1024, 1024, 1556),
                        sensor_info=None, corrupt_sample=False) -> bytes:
    """Synthetic CR3 holding a real crx-encoded payload: ftyp / moov
    [ canon-uuid [CMT1, CMT3] / trak [stsd(CRAW+CMP1), stsz, stco] ] /
    mdat."""
    from tests.test_raw_containers import Ifd, build_tiff

    from rapidraw_tpu.io.cr3 import CANON_UUID

    h, w = mosaic.shape
    sample, cmp1 = crx.encode_raw(mosaic, n_bits=14, cfa_layout=0)
    if corrupt_sample:
        sample = bytes(len(sample))

    cmt1 = build_tiff([Ifd([(271, 2, "Canon"), (272, 2, "EOS R6"),
                            (274, 3, [1])])])
    # CMT3 = Canon makernote IFD: ColorData (0x4001, 796 shorts, WB at
    # offset 63 per exiftool's ColorData4+ layout) + SensorInfo (0xe0)
    cd = [0] * 796
    cd[63:67] = list(wb)
    mn_tags = [(0x4001, 3, cd)]
    if sensor_info is not None:
        mn_tags.append((0xE0, 3, sensor_info))
    cmt3 = build_tiff([Ifd(mn_tags)])

    cmp1_box = _box(b"CMP1", crx.build_cmp1(cmp1))
    entry = struct.pack(">I", 0x56 + len(cmp1_box)) + b"CRAW" + b"\0" * 6
    entry += struct.pack(">H", 1) + b"\0" * 16 + struct.pack(">HH", w, h)
    entry = entry.ljust(0x56, b"\0") + cmp1_box
    stsd = _box(b"stsd", struct.pack(">II", 0, 1) + entry)
    stsz = _box(b"stsz", struct.pack(">III", 0, len(sample), 1))
    # stco patched once the mdat offset is known
    stco_payload = struct.pack(">II", 0, 1) + struct.pack(">I", 0)
    stco = _box(b"stco", stco_payload)
    stbl = _box(b"stbl", stsd + stsz + stco)
    trak = _box(b"trak", _box(b"mdia", _box(b"minf", stbl)))
    canon = _box(b"uuid", CANON_UUID + _box(b"CMT1", cmt1)
                 + _box(b"CMT3", cmt3))
    moov = _box(b"moov", canon + trak)
    ftyp = _box(b"ftyp", b"crx " + b"\0\0\0\x01" + b"crx isom")
    head = ftyp + moov
    sample_off = len(head) + 8  # mdat payload starts after its header
    data = head + _box(b"mdat", sample)
    # patch the stco chunk offset in place
    idx = data.index(b"stco") + 4 + 8
    return data[:idx] + struct.pack(">I", sample_off) + data[idx + 4 :]


def test_cr3_full_decode_path():
    mosaic = _natural_mosaic(40, 64)
    data = _build_cr3_with_raw(mosaic)
    raw = parse_raw(data, ext="cr3")
    np.testing.assert_array_equal(raw.cfa, mosaic)
    assert raw.pattern == "RGGB"
    assert raw.white_level == float((1 << 14) - 1)
    # WB 2145/1024/1024/1556 -> green-normalized multipliers
    np.testing.assert_allclose(
        raw.wb, [2145 / 1024, 1.0, 1556 / 1024], rtol=1e-6
    )


def test_cr3_sensor_info_crop_and_black():
    mosaic = _natural_mosaic(40, 64)
    mosaic[:, :6] = 2048  # masked border columns
    # SensorInfo: [_, w, h, _, _, left, top, right, bottom]
    data = _build_cr3_with_raw(mosaic, sensor_info=[0, 64, 40, 0, 0,
                                                    6, 2, 61, 37])
    raw = parse_raw(data, ext="cr3")
    assert raw.cfa.shape == (36, 56)
    np.testing.assert_array_equal(raw.cfa, mosaic[2:38, 6:62])
    assert raw.black_level == pytest.approx(2048.0)
    assert raw.pattern == "RGGB"  # even (top, left) shift keeps RGGB


def test_cr3_corrupt_payload_falls_back_to_refusal():
    mosaic = _natural_mosaic(24, 32)
    data = _build_cr3_with_raw(mosaic, corrupt_sample=True)
    with pytest.raises(UnsupportedRawFormat) as ei:
        parse_raw(data, ext="cr3")
    assert "decode attempt" in str(ei.value)


def test_cmp1_byte_layout_matches_public_spec():
    """Pin the CMP1 offsets against the publicly documented layout
    (libraw crxParseImageHeader / dnglab Cmp1Box) byte by byte — a
    build/parse round-trip alone cannot catch a shifted struct."""
    import struct

    from rapidraw_tpu.io.crx import parse_cmp1

    hdr = bytearray(0x30)
    struct.pack_into(">h", hdr, 0, -1)       # unknown
    struct.pack_into(">H", hdr, 2, 0x30)     # header size
    struct.pack_into(">H", hdr, 4, 0x100)    # version
    struct.pack_into(">H", hdr, 6, 0)        # version sub
    struct.pack_into(">I", hdr, 8, 6000)     # f_width
    struct.pack_into(">I", hdr, 12, 4000)    # f_height
    struct.pack_into(">I", hdr, 16, 6000)    # tile width
    struct.pack_into(">I", hdr, 20, 4000)    # tile height
    hdr[24] = 14                             # nBits
    hdr[25] = (4 << 4) | 1                   # nPlanes=4, cfaLayout=1
    hdr[26] = (0 << 4) | 0                   # encType=0, imageLevels=0
    hdr[27] = 0                              # tile flags
    struct.pack_into(">I", hdr, 28, 32)      # mdatHdrSize

    c = parse_cmp1(bytes(hdr))
    assert c is not None
    assert (c.f_width, c.f_height) == (6000, 4000)
    assert (c.tile_width, c.tile_height) == (6000, 4000)
    assert c.n_bits == 14 and c.n_planes == 4 and c.cfa_layout == 1
    assert c.enc_type == 0 and c.image_levels == 0
    assert c.mdat_hdr_size == 32

    # unknown version refuses (cameras write 0x100/0x200 only)
    bad = bytearray(hdr)
    struct.pack_into(">H", bad, 4, 0x300)
    assert parse_cmp1(bytes(bad)) is None
