"""Round-trip + fixture tests for the float-image tail of the LDR loader:
Radiance HDR, OpenEXR (scanline NONE/ZIPS/ZIP), farbfeld, PAM.

Encoders here are test-only oracles written from the same public specs as
the decoders (see io/float_images.py docstring); the EXR builder applies
the spec's interleave+delta transform in the forward direction.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from rapidraw_tpu.io.float_images import (
    FloatImageError,
    load_exr,
    load_farbfeld,
    load_float_image,
    load_hdr,
    load_pam,
    write_hdr,
)


# ------------------------------------------------------------------- HDR


def test_hdr_flat_roundtrip():
    rng = np.random.default_rng(50)
    img = (rng.random((6, 7, 3), np.float32) * 8.0).astype(np.float32)
    out = load_hdr(write_hdr(img))
    # RGBE shares one exponent across channels: quantization is half a
    # mantissa unit = 2^(e-9) <= 8/512 absolute for values up to 8.0
    np.testing.assert_allclose(out, img, rtol=1e-2, atol=8 / 512 + 1e-6)


def test_hdr_zero_and_dynamic_range():
    img = np.zeros((2, 2, 3), np.float32)
    img[0, 0] = [1e-6, 2e-6, 3e-6]
    img[1, 1] = [1000.0, 2000.0, 4000.0]
    out = load_hdr(write_hdr(img))
    assert out[0, 1].max() == 0.0 and out[1, 0].max() == 0.0
    np.testing.assert_allclose(out[1, 1], img[1, 1], rtol=1.6e-2)
    np.testing.assert_allclose(out[0, 0], img[0, 0], rtol=2e-2)


def test_hdr_rle_scanline():
    # hand-built new-style RLE: w=8, one run of 0x80-coded repeats + literal
    w, h = 8, 1
    head = b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n" + f"-Y {h} +X {w}\n".encode()
    comps = []
    comps.append(bytes([128 + 8, 100]))               # R: run of 8 x 100
    comps.append(bytes([8]) + bytes(range(10, 18)))   # G: literal 8
    comps.append(bytes([128 + 4, 50, 128 + 4, 60]))   # B: two runs
    comps.append(bytes([128 + 8, 130]))               # E: exponent 130 -> x2^2
    data = head + bytes([2, 2, 0, 8]) + b"".join(comps)
    out = load_hdr(data)
    scale = 2.0 ** (130 - 136)
    np.testing.assert_allclose(out[0, :, 0], 100 * scale, rtol=1e-6)
    np.testing.assert_allclose(out[0, :, 1], np.arange(10, 18) * scale, rtol=1e-6)
    np.testing.assert_allclose(out[0, :4, 2], 50 * scale, rtol=1e-6)
    np.testing.assert_allclose(out[0, 4:, 2], 60 * scale, rtol=1e-6)


def test_hdr_malformed():
    with pytest.raises(ValueError):
        load_hdr(b"#?RADIANCE\n\n-Y 2 +X 2\n")  # missing FORMAT
    with pytest.raises(ValueError):
        load_hdr(b"not an hdr")
    good = write_hdr(np.ones((4, 4, 3), np.float32))
    with pytest.raises(ValueError):
        load_hdr(good[:-7])


# -------------------------------------------------------------- farbfeld


def test_farbfeld_roundtrip():
    rng = np.random.default_rng(51)
    px = rng.integers(0, 65535, (5, 4, 4), dtype=np.uint16)
    data = b"farbfeld" + struct.pack(">II", 4, 5) + px.astype(">u2").tobytes()
    out = load_farbfeld(data)
    np.testing.assert_allclose(out, px[:, :, :3] / 65535.0, atol=1e-7)
    with pytest.raises(ValueError):
        load_farbfeld(data[:-9])


# ------------------------------------------------------------------- PAM


def test_pam_rgb16():
    rng = np.random.default_rng(52)
    px = rng.integers(0, 65535, (3, 5, 3), dtype=np.uint16)
    head = (b"P7\nWIDTH 5\nHEIGHT 3\nDEPTH 3\nMAXVAL 65535\n"
            b"TUPLTYPE RGB\nENDHDR\n")
    out = load_pam(head + px.astype(">u2").tobytes())
    np.testing.assert_allclose(out, px / 65535.0, atol=1e-7)


def test_pam_gray8_and_malformed():
    px = np.arange(12, dtype=np.uint8).reshape(4, 3, 1)
    head = b"P7\nWIDTH 3\nHEIGHT 4\nDEPTH 1\nMAXVAL 255\nENDHDR\n"
    out = load_pam(head + px.tobytes())
    assert out.shape == (4, 3, 3)
    np.testing.assert_allclose(out[:, :, 0], px[:, :, 0] / 255.0)
    with pytest.raises(ValueError):
        load_pam(b"P7\nWIDTH 3\nENDHDR\n" + bytes(16))


# ------------------------------------------------------------------- EXR


def _exr_attr(name: bytes, typ: bytes, body: bytes) -> bytes:
    return name + b"\0" + typ + b"\0" + struct.pack("<I", len(body)) + body


def _build_exr(img: np.ndarray, compression: int, ptype: int = 2) -> bytes:
    """Single-part scanline EXR encoder oracle (RGB, one block geometry)."""
    h, w, _ = img.shape
    dt = {1: "<f2", 2: "<f4"}[ptype]
    chlist = b""
    for cname in (b"B", b"G", b"R"):  # stored sorted by name
        chlist += cname + b"\0" + struct.pack("<IIii", ptype, 0, 1, 1)
    chlist += b"\0"
    header = b""
    header += _exr_attr(b"channels", b"chlist", chlist)
    header += _exr_attr(b"compression", b"compression", bytes([compression]))
    header += _exr_attr(b"dataWindow", b"box2i", struct.pack("<4i", 0, 0, w - 1, h - 1))
    header += _exr_attr(b"displayWindow", b"box2i", struct.pack("<4i", 0, 0, w - 1, h - 1))
    header += _exr_attr(b"lineOrder", b"lineOrder", b"\0")
    header += _exr_attr(b"pixelAspectRatio", b"float", struct.pack("<f", 1.0))
    header += _exr_attr(b"screenWindowCenter", b"v2f", struct.pack("<ff", 0, 0))
    header += _exr_attr(b"screenWindowWidth", b"float", struct.pack("<f", 1.0))
    header += b"\0"

    lines_per_block = 16 if compression == 3 else 1
    n_blocks = -(-h // lines_per_block)
    pre = 8 + len(header) + 8 * n_blocks
    blocks = []
    chans = {"R": img[:, :, 0], "G": img[:, :, 1], "B": img[:, :, 2]}
    for b in range(n_blocks):
        y0 = b * lines_per_block
        n = min(lines_per_block, h - y0)
        raw = b""
        for y in range(y0, y0 + n):
            for cname in ("B", "G", "R"):
                raw += chans[cname][y].astype(dt).tobytes()
        if compression in (2, 3):
            d = np.frombuffer(raw, np.uint8)
            half = (d.size + 1) // 2
            split = np.concatenate([d[0::2], d[1::2]])  # two halves
            delta = np.concatenate(
                [split[:1].astype(np.int64),
                 split[1:].astype(np.int64) - split[:-1].astype(np.int64) + 128]
            )
            payload = zlib.compress((delta & 0xFF).astype(np.uint8).tobytes())
            if len(payload) >= len(raw):
                payload = raw  # spec: stored uncompressed if not smaller
        else:
            payload = raw
        blocks.append(struct.pack("<ii", y0, len(payload)) + payload)
    offsets = []
    pos = pre
    for blk in blocks:
        offsets.append(pos)
        pos += len(blk)
    out = struct.pack("<II", 0x01312F76, 2) + header
    out += struct.pack(f"<{n_blocks}Q", *offsets)
    out += b"".join(blocks)
    return out


@pytest.mark.parametrize("compression,ptype", [(0, 2), (2, 2), (3, 2), (3, 1)])
def test_exr_roundtrip(compression, ptype):
    rng = np.random.default_rng(53 + compression)
    img = (rng.random((37, 23, 3), np.float32) * 16.0 - 2.0).astype(np.float32)
    if ptype == 1:
        img = img.astype(np.float16).astype(np.float32)
    out = load_exr(_build_exr(img, compression, ptype))
    np.testing.assert_array_equal(out, img)


def test_exr_refusals():
    img = np.zeros((4, 4, 3), np.float32)
    good = _build_exr(img, 0)
    tiled = good[:4] + struct.pack("<I", 2 | 0x200) + good[8:]
    with pytest.raises(ValueError, match="tiled"):
        load_exr(tiled)
    with pytest.raises(ValueError):
        load_exr(good[:50])
    with pytest.raises(ValueError):
        load_exr(b"\x00" * 64)


def test_exr_fuzz_never_escapes_valueerror():
    rng = np.random.default_rng(54)
    seed = _build_exr(np.ones((6, 5, 3), np.float32), 3)
    for trial in range(200):
        buf = bytearray(seed)
        for _ in range(rng.integers(1, 9)):
            pos = int(rng.integers(4, len(buf)))
            buf[pos] = int(rng.integers(0, 256))
        try:
            load_float_image(bytes(buf), ext="exr")
        except ValueError:
            pass


# ------------------------------------------------------------ loader wire


def test_loader_dispatches_float_formats(tmp_path):
    from rapidraw_tpu.io.loader import load_ldr

    img = np.clip(np.random.default_rng(55).random((6, 7, 3)), 0, 1).astype(np.float32)
    p = tmp_path / "scene.hdr"
    p.write_bytes(write_hdr(img * 4.0))  # >1 values clamp like the reference
    planar = load_ldr(p)
    assert planar.shape == (3, 6, 7)
    assert planar.max() <= 1.0

    q = tmp_path / "pix.ff"
    px = (img * 65535).astype(">u2")
    alpha = np.full((6, 7, 1), 65535, dtype=">u2")
    q.write_bytes(b"farbfeld" + struct.pack(">II", 7, 6)
                  + np.concatenate([px, alpha], axis=2).astype(">u2").tobytes())
    planar2 = load_ldr(q)
    np.testing.assert_allclose(planar2.transpose(1, 2, 0), px.astype(np.float32) / 65535.0, atol=1e-4)


def test_hdr_old_format_repeat_runs_and_111_pixel():
    """(1,1,1,e) is a LEGAL dark pixel only as the old-format repeat marker
    of the previous pixel; a flat file containing it decodes via the
    old-format path (Radiance color.c oldreadcolrs)."""
    w, h = 6, 1
    head = b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n" + f"-Y {h} +X {w}\n".encode()
    # pixel, repeat x3 (marker count=3), then two literal pixels
    body = bytes([10, 20, 30, 130]) + bytes([1, 1, 1, 3]) \
        + bytes([40, 50, 60, 129]) + bytes([7, 8, 9, 128])
    out = load_hdr(head + body)
    s130 = 2.0 ** (130 - 136)
    np.testing.assert_allclose(out[0, 0], np.array([10, 20, 30]) * s130)
    for x in (1, 2, 3):
        np.testing.assert_allclose(out[0, x], out[0, 0])
    np.testing.assert_allclose(out[0, 4], np.array([40, 50, 60]) * 2.0 ** (129 - 136))
    np.testing.assert_allclose(out[0, 5], np.array([7, 8, 9]) * 2.0 ** (128 - 136))
    # repeat with no prior pixel refuses
    with pytest.raises(ValueError):
        load_hdr(head + bytes([1, 1, 1, 2]) + bytes(20))
