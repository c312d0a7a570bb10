"""JPEG XL encode/decode via the libjxl ctypes binding (io/jxl.py).

The reference exports lossless (q==100) and lossy JXL
(export_processing.rs:396-430); these tests pin the same matrix cell:
round-trip exactness for lossless, bounded error + smaller size for lossy,
RGBA alpha survival, the quality→distance mapping, and the export +
loader integration paths.
"""

from __future__ import annotations

import numpy as np
import pytest

from rapidraw_tpu.io import jxl


def _test_image(h=64, w=96):
    x = np.linspace(0, 1, w)[None, :, None] * np.linspace(0, 1, h)[:, None, None]
    return (np.concatenate([x, 1 - x, np.full_like(x, 0.5)], axis=2) * 255).astype(
        np.uint8
    )


needs_jxl = pytest.mark.skipif(not jxl.available(), reason="libjxl not present")


@needs_jxl
def test_lossless_roundtrip_exact():
    img = _test_image()
    data = jxl.encode_jxl(img, 100)
    assert data[:2] == b"\xff\x0a"  # bare codestream signature
    out = jxl.decode_jxl(data)
    np.testing.assert_array_equal(out, img)


@needs_jxl
def test_lossy_bounded_and_smaller():
    img = _test_image()
    lossless = jxl.encode_jxl(img, 100)
    lossy = jxl.encode_jxl(img, 85)
    assert len(lossy) < len(lossless)
    out = jxl.decode_jxl(lossy)
    assert out.shape == img.shape
    err = np.abs(out.astype(int) - img.astype(int)).max()
    assert err <= 40  # distance 1.5 on a smooth gradient


@needs_jxl
def test_lower_quality_larger_distance():
    """export_processing.rs:415-416: distance = max((100-q)/10, 0.01) —
    lower quality must compress harder."""
    rng = np.random.default_rng(3)
    img = (rng.random((128, 128, 3)) * 255).astype(np.uint8)
    q90 = jxl.encode_jxl(img, 90)
    q30 = jxl.encode_jxl(img, 30)
    assert len(q30) < len(q90)


@needs_jxl
def test_rgba_alpha_survives():
    img = _test_image()
    a = (np.arange(img.shape[0] * img.shape[1], dtype=np.uint32) % 256).astype(
        np.uint8
    ).reshape(img.shape[:2])
    rgba = np.dstack([img, a])
    out = jxl.decode_jxl(jxl.encode_jxl(rgba, 100))
    np.testing.assert_array_equal(out, rgba)


@needs_jxl
def test_encode_image_jxl_path(tmp_path):
    """encode_image(fmt='jxl') writes a decodable file from planar float."""
    from rapidraw_tpu.io.encode import encode_image
    from rapidraw_tpu.io.loader import to_uint8_hwc

    rng = np.random.default_rng(5)
    planar = rng.random((3, 32, 48)).astype(np.float32)
    p = tmp_path / "out.jxl"
    encode_image(planar, p, quality=100)
    out = jxl.decode_jxl(p.read_bytes())
    np.testing.assert_array_equal(out, to_uint8_hwc(planar))


@needs_jxl
def test_loader_decodes_jxl(tmp_path):
    """.jxl is a NON_RAW_EXTENSIONS member (formats.rs:73-79); load_ldr
    must decode it like any other LDR input."""
    from rapidraw_tpu.io.loader import load_ldr

    img = _test_image(24, 40)
    p = tmp_path / "in.jxl"
    p.write_bytes(jxl.encode_jxl(img, 100))
    planar = np.asarray(load_ldr(p))
    assert planar.shape == (3, 24, 40)
    np.testing.assert_allclose(
        planar, img.transpose(2, 0, 1).astype(np.float32) / 255.0, atol=1e-6
    )


def test_encode_jxl_rejects_bad_shapes():
    if not jxl.available():
        pytest.skip("libjxl not present")
    with pytest.raises(ValueError):
        jxl.encode_jxl(np.zeros((4, 4), np.uint8))
    with pytest.raises(ValueError):
        jxl.encode_jxl(np.zeros((4, 4, 3), np.float32))


@needs_jxl
def test_grayscale_jxl_round_trip(tmp_path):
    """A 1-channel .jxl (num_color_channels=1) used to wedge decode_jxl in
    an infinite loop: the 3-channel output format was rejected by
    JxlDecoderImageOutBufferSize, whose return code went unchecked, so the
    decoder kept returning NEED_IMAGE_OUT_BUFFER forever. Grayscale now
    decodes and expands to the documented RGB contract."""
    rng = np.random.default_rng(3)
    gray = rng.integers(0, 256, (20, 28, 1), dtype=np.uint8)
    data = jxl.encode_jxl(gray, 100)
    out = jxl.decode_jxl(data)
    assert out.shape == (20, 28, 3)
    np.testing.assert_array_equal(out[..., 0], gray[..., 0])
    np.testing.assert_array_equal(out[..., 0], out[..., 1])
    np.testing.assert_array_equal(out[..., 0], out[..., 2])

    # and through the library loader (the surface that used to hang)
    from rapidraw_tpu.io.loader import load_ldr

    p = tmp_path / "gray.jxl"
    p.write_bytes(data)
    planar = np.asarray(load_ldr(p))
    assert planar.shape == (3, 20, 28)
