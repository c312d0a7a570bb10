"""RAW front-end tests: demosaic correctness + highlight compression."""

import jax.numpy as jnp
import numpy as np
import pytest

from rapidraw_tpu.raw.color import camera_to_srgb_matrix, normalize_wb
from rapidraw_tpu.raw.demosaic import demosaic_bilinear, demosaic_malvar, demosaic_speed
from rapidraw_tpu.raw.develop import apply_highlight_compression, develop_cfa


def _mosaic_from_rgb(rgb, pattern="RGGB"):
    """Sample an RGB image through a Bayer pattern."""
    h, w = rgb.shape[1:]
    grid = [pattern[0:2], pattern[2:4]]
    cfa = np.zeros((h, w), np.float32)
    chan = {"R": 0, "G": 1, "B": 2}
    for dy in range(2):
        for dx in range(2):
            c = chan[grid[dy][dx]]
            cfa[dy::2, dx::2] = rgb[c, dy::2, dx::2]
    return cfa


@pytest.mark.parametrize("pattern", ["RGGB", "BGGR", "GRBG", "GBRG"])
@pytest.mark.parametrize("algo", [demosaic_bilinear, demosaic_malvar])
def test_demosaic_recovers_smooth_image(pattern, algo):
    """A smooth gradient mosaicked then demosaicked should round-trip closely."""
    h, w = 64, 80
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    rgb = np.stack(
        [
            0.3 + 0.4 * xx / w,
            0.5 + 0.2 * yy / h,
            0.4 + 0.1 * (xx + yy) / (h + w),
        ]
    )
    cfa = _mosaic_from_rgb(rgb, pattern)
    out = np.asarray(algo(jnp.asarray(cfa), pattern))
    # interior should match tightly (linear gradients are exactly
    # reconstructible by bilinear filters)
    err = np.abs(out[:, 4:-4, 4:-4] - rgb[:, 4:-4, 4:-4]).max()
    assert err < 5e-3, err


def test_demosaic_constant_is_exact():
    cfa = jnp.full((32, 32), 0.5, jnp.float32)
    for algo in (demosaic_bilinear, demosaic_malvar):
        out = np.asarray(algo(cfa, "RGGB"))
        np.testing.assert_allclose(out, 0.5, atol=1e-6)


def test_demosaic_speed_shape():
    cfa = jnp.asarray(np.random.default_rng(0).random((64, 80), np.float32))
    out = demosaic_speed(cfa, "RGGB")
    assert out.shape == (3, 32, 40)


def test_highlight_compression_matches_reference_math():
    """Scalar port check of raw_processing.rs:160-183."""
    rng = np.random.default_rng(3)
    px = (rng.random((3, 64)) * 3.0).astype(np.float32)
    shc = 2.5
    got = np.asarray(apply_highlight_compression(jnp.asarray(px), shc))

    want = np.empty_like(px)
    for i in range(px.shape[1]):
        r, g, b = np.maximum(px[:, i], 0.0)
        max_c = max(r, g, b)
        if max_c > 1.0:
            min_c = min(r, g, b)
            f = np.clip(1.0 - (max_c - 1.0) / (shc - 1.0), 0.0, 1.0)
            cr, cg, cb = (min_c + (v - min_c) * f for v in (r, g, b))
            cm = max(cr, cg, cb)
            if cm > 1e-6:
                rs = max_c / cm
                r, g, b = cr * rs, cg * rs, cb * rs
            else:
                r = g = b = max_c
        want[:, i] = np.clip([r, g, b], 0.0, shc)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_full_raw_develop_runs():
    rng = np.random.default_rng(0)
    cfa = jnp.asarray((rng.random((128, 160)) * 4000 + 512).astype(np.float32))
    xyz_to_cam = np.array(
        [[0.9, -0.2, -0.1], [-0.4, 1.3, 0.1], [-0.1, 0.3, 0.7]], np.float32
    )
    out = np.asarray(
        develop_cfa(
            cfa,
            black_level=512.0,
            white_level=16383.0,
            wb=normalize_wb([2.0, 1.0, 1.5]),
            cam_to_srgb=camera_to_srgb_matrix(xyz_to_cam),
            pattern="RGGB",
            algorithm="malvar",
        )
    )
    assert out.shape == (3, 128, 160)
    assert np.isfinite(out).all()
    assert out.min() >= 0.0 and out.max() <= 2.5


def test_cam_matrix_white_preservation():
    xyz_to_cam = np.array(
        [[0.9, -0.2, -0.1], [-0.4, 1.3, 0.1], [-0.1, 0.3, 0.7]], np.float32
    )
    m = camera_to_srgb_matrix(xyz_to_cam)
    np.testing.assert_allclose(m @ np.ones(3), np.ones(3), atol=1e-5)


def test_orient_planar_matches_loader_orientation():
    """The device-side planar EXIF-orientation (io/dng._orient_planar, used
    by the jitted RAW develop program) must match the host HWC
    implementation (io/loader._apply_exif_orientation) for all 8 codes."""
    from rapidraw_tpu.io.dng import _orient_planar
    from rapidraw_tpu.io.loader import _apply_exif_orientation

    rng = np.random.default_rng(5)
    hwc = rng.random((6, 9, 3)).astype(np.float32)
    planar = hwc.transpose(2, 0, 1)
    for o in range(1, 9):
        want = _apply_exif_orientation(hwc, o).transpose(2, 0, 1)
        got = np.asarray(_orient_planar(planar, o))
        np.testing.assert_array_equal(got, want, err_msg=f"orientation {o}")
