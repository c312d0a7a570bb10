"""Two-pass Pallas warp vs the exact gather warp (interpret mode on CPU)."""

from __future__ import annotations

import numpy as np
import pytest

from rapidraw_tpu.geometry.params import GeometryParams
from rapidraw_tpu.geometry.warp import warp_image_geometry
from rapidraw_tpu.geometry.warp_fast import plan_warp, warp_image_fast


def _smooth(h, w, seed=0):
    """Low-frequency image: double-resample error vanishes on smooth data."""
    rng = np.random.default_rng(seed)
    small = rng.random((3, 6, 8)).astype(np.float32)
    import jax

    return np.asarray(jax.image.resize(small, (3, h, w), "bicubic")).astype(np.float32)


def _noise(h, w, seed=0):
    return np.random.default_rng(seed).random((3, h, w)).astype(np.float32)


def test_identity_is_exact():
    # identity geometry still blacks the last row/col (the zero-outside
    # x < w-1 bound, image_processing.rs:365-373); callers guard identity
    # via is_geometry_identity before warping, like the reference. Compare
    # against the exact path, which must match bit-for-bit here (frac = 0
    # in both passes -> single-sample passthrough).
    img = _noise(48, 1024)
    p = GeometryParams()
    exact = np.asarray(warp_image_geometry(img, p))
    fast = np.asarray(warp_image_fast(img, p))
    np.testing.assert_allclose(fast, exact, atol=1e-6)
    np.testing.assert_allclose(fast[:, :-1, :-1], img[:, :-1, :-1], atol=1e-6)


def test_rotation_matches_exact_on_smooth():
    img = _smooth(64, 1024)
    p = GeometryParams(rotate=2.0)
    exact = np.asarray(warp_image_geometry(img, p))
    fast = np.asarray(warp_image_fast(img, p))
    # interior only: the zero-outside boundary band differs by the
    # double-resample (a pixel of bleed), like any mesh warp
    sl = (slice(None), slice(4, -4), slice(4, -4))
    assert np.abs(fast[sl] - exact[sl]).max() < 5e-3


def test_lens_distortion_matches_exact_on_smooth():
    img = _smooth(64, 1024, seed=1)
    p = GeometryParams(lens_dist_k1=-0.08, lens_dist_k2=0.02,
                      lens_distortion_amount=1.0)
    exact = np.asarray(warp_image_geometry(img, p))
    fast = np.asarray(warp_image_fast(img, p))
    sl = (slice(None), slice(4, -4), slice(4, -4))
    assert np.abs(fast[sl] - exact[sl]).max() < 5e-3


def test_tca_clamped_mode():
    img = _smooth(64, 1024, seed=2)
    p = GeometryParams(tca_vr=1.002, tca_vb=0.998, lens_tca_amount=1.0)
    exact = np.asarray(warp_image_geometry(img, p))
    fast = np.asarray(warp_image_fast(img, p))
    assert np.abs(fast - exact).max() < 5e-3


def test_vignette_and_zero_outside():
    img = _smooth(64, 1024, seed=3)
    p = GeometryParams(rotate=3.0, vig_k1=-0.4, lens_vignette_amount=1.0)
    exact = np.asarray(warp_image_geometry(img, p))
    fast = np.asarray(warp_image_fast(img, p))
    # rotated corners are zero-outside in both
    assert exact[0, 0, 0] == 0.0 and fast[0, 0, 0] == 0.0
    sl = (slice(None), slice(6, -6), slice(6, -6))
    assert np.abs(fast[sl] - exact[sl]).max() < 5e-3


def test_big_rotation_falls_back():
    p = GeometryParams(rotate=50.0)
    assert plan_warp(p, 64, 1024) is None
    img = _noise(64, 1024, seed=4)
    exact = np.asarray(warp_image_geometry(img, p))
    fast = np.asarray(warp_image_fast(img, p))  # must route to exact path
    np.testing.assert_allclose(fast, exact, atol=1e-6)


def test_batched_matches_per_image():
    import jax.numpy as jnp

    from rapidraw_tpu.geometry.warp_fast import warp_with_plan

    p = GeometryParams(rotate=2.0, vig_k1=-0.3, lens_vignette_amount=1.0)
    plan = plan_warp(p, 48, 1024)
    assert plan is not None
    arrays = {k: jnp.asarray(v) for k, v in plan.arrays.items()}
    imgs = np.stack([_noise(48, 1024, seed=i) for i in range(2)])
    batched = np.asarray(warp_with_plan(jnp.asarray(imgs), arrays, plan.static))
    for i in range(2):
        single = np.asarray(
            warp_with_plan(jnp.asarray(imgs[i]), arrays, plan.static)
        )
        np.testing.assert_allclose(batched[i], single, atol=1e-6)


def test_plan_spans_are_small_for_typical_geometry():
    p = GeometryParams(rotate=1.5, lens_dist_k1=-0.08, lens_dist_k2=0.02)
    plan = plan_warp(p, 1024, 1536)
    assert plan is not None
    for _, vstat, hstat in plan.static.modes:
        assert vstat.span <= 96 and hstat.span <= 96, (vstat.span, hstat.span)


def test_tca_with_rotation_plans_fast():
    # clamp-mode fold detection must not count border clamp plateaus as
    # folds: TCA + modest rotation previously always rejected the plan and
    # silently fell back to the ~200x slower exact path
    img = _smooth(64, 1024, seed=4)
    p = GeometryParams(rotate=1.5, tca_vr=1.002, tca_vb=0.998,
                       lens_tca_amount=1.0)
    plan = plan_warp(p, 64, 1024)
    assert plan is not None, "TCA+rotation must plan (clamp plateaus != folds)"
    exact = np.asarray(warp_image_geometry(img, p))
    fast = np.asarray(warp_image_fast(img, p))
    sl = (slice(None), slice(6, -6), slice(6, -6))
    assert np.abs(fast[sl] - exact[sl]).max() < 5e-3
