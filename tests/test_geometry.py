"""Geometry pipeline tests."""

import jax.numpy as jnp
import numpy as np

from rapidraw_tpu.geometry.params import geometry_params_from_json, is_geometry_identity
from rapidraw_tpu.geometry.resize import downscale
from rapidraw_tpu.geometry.transforms import (
    apply_all_transformations,
    apply_coarse_rotation,
    apply_crop,
    apply_flip,
    apply_rotation,
)
from rapidraw_tpu.geometry.warp import warp_image_geometry


def _img(h=40, w=60, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.random((3, h, w), dtype=np.float32))


def test_identity_params():
    assert is_geometry_identity(geometry_params_from_json({}))
    assert not is_geometry_identity(geometry_params_from_json({"transformRotate": 2.0}))
    assert not is_geometry_identity(
        geometry_params_from_json({"lensDistortionParams": {"k1": 0.05}})
    )
    # disabled lens correction with coefficients is still identity
    assert is_geometry_identity(
        geometry_params_from_json(
            {"lensDistortionParams": {"k1": 0.05}, "lensDistortionEnabled": False,
             "lensTcaEnabled": False, "lensVignetteEnabled": False}
        )
    )


def test_warp_identity_matches_interior():
    """Identity-parameter warp reproduces the source except the last
    row/col, which the reference's sampler blacks out (image_processing.rs:
    369-370) — why warps are gated behind is_geometry_identity."""
    img = _img()
    p = geometry_params_from_json({})
    out = np.asarray(warp_image_geometry(img, p))
    np.testing.assert_allclose(out[:, :-1, :-1], np.asarray(img)[:, :-1, :-1], atol=1e-5)
    assert np.all(out[:, -1, :] == 0.0) and np.all(out[:, :, -1] == 0.0)


def test_warp_scale_zooms_in():
    img = _img(64, 64)
    p = geometry_params_from_json({"transformScale": 200.0})
    out = np.asarray(warp_image_geometry(img, p))
    # 2x zoom: output center pixel maps to source center, and the output
    # samples only the central half of the source
    src = np.asarray(img)
    np.testing.assert_allclose(out[:, 32, 32], src[:, 32, 32], atol=1e-4)
    # corners of output map to source quarter positions
    np.testing.assert_allclose(out[:, 16, 16], src[:, 24, 24], atol=1e-4)


def test_coarse_rotation_and_flip():
    img = _img(4, 6)
    r1 = apply_coarse_rotation(img, 1)
    assert r1.shape == (3, 6, 4)
    # clockwise 90°: (y, x) -> (x, H-1-y); top-left goes to top-right
    np.testing.assert_allclose(np.asarray(r1[:, 0, 3]), np.asarray(img[:, 0, 0]))
    r4 = apply_coarse_rotation(apply_coarse_rotation(img, 2), 2)
    np.testing.assert_allclose(np.asarray(r4), np.asarray(img))

    f = apply_flip(img, True, False)
    np.testing.assert_allclose(np.asarray(f[:, :, 0]), np.asarray(img[:, :, -1]))


def test_fine_rotation_identity_and_gradient():
    img = _img(32, 32)
    out = apply_rotation(img, 360.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img))

    # bilinear reproduces linear ramps exactly: rotating f=x by ±90° must
    # yield a ±y ramp in the interior
    h = w = 33
    xs = np.broadcast_to(np.arange(w, dtype=np.float32), (h, w)).astype(np.float32)
    ramp = jnp.asarray(np.stack([xs, xs, xs]))
    out90 = np.asarray(apply_rotation(ramp, 90.0))[0, 8:-8, 8:-8]
    ys_exp = np.broadcast_to(np.arange(h, dtype=np.float32)[:, None], (h, w))[8:-8, 8:-8]
    # one of the two vertical ramps (top-down or bottom-up) must match
    match_down = np.allclose(out90, ys_exp, atol=1e-3)
    match_up = np.allclose(out90, ys_exp[::-1], atol=1e-3)
    assert match_down or match_up


def test_fine_rotation_direction_is_clockwise():
    """imageproc's rotate_about_center rotates content clockwise for
    positive angles; a top-left bright patch must land near the top-right."""
    img = np.zeros((3, 33, 33), np.float32)
    img[:, 2:8, 2:8] = 1.0
    out = np.asarray(apply_rotation(jnp.asarray(img), 90.0))
    tr = out[:, 2:8, -8:-2].sum()
    tl = out[:, 2:8, 2:8].sum()
    bl = out[:, -8:-2, 2:8].sum()
    assert tr > tl and tr > bl, (tr, tl, bl)


def test_crop():
    img = _img(40, 60)
    out = apply_crop(img, {"x": 10, "y": 5, "width": 20, "height": 15})
    assert out.shape == (3, 15, 20)
    np.testing.assert_allclose(np.asarray(out[:, 0, 0]), np.asarray(img[:, 5, 10]))


def test_downscale_preserves_flat_and_shape():
    img = jnp.full((3, 40, 60), 0.3, jnp.float32)
    out = downscale(img, 30, 30)
    # ratio = min(30/60, 30/40) = 0.5 -> 30x20
    assert out.shape == (3, 20, 30)
    np.testing.assert_allclose(np.asarray(out), 0.3, atol=1e-6)


def test_downscale_energy_preserving_semantics():
    # a 2x2 checkerboard of 0 and 1 downscaled 2x gives sqrt(mean of squares)
    img = np.zeros((3, 4, 4), np.float32)
    img[:, ::2, ::2] = 1.0
    out = np.asarray(downscale(jnp.asarray(img), 2, 2))
    np.testing.assert_allclose(out, np.sqrt(0.25), atol=1e-6)


def test_all_transformations_compose():
    img = _img(40, 60)
    adj = {
        "transformRotate": 3.0,
        "orientationSteps": 1,
        "flipHorizontal": True,
        "rotation": 1.5,
        "crop": {"x": 4, "y": 6, "width": 20, "height": 24},
    }
    out, offset = apply_all_transformations(img, adj)
    assert out.shape == (3, 24, 20)
    assert offset == (4.0, 6.0)
    assert np.isfinite(np.asarray(out)).all()


def test_rejected_crop_reports_no_offset():
    """An invalid crop rect leaves the image uncropped and must report a
    zero offset, or every mask shifts by the phantom crop origin."""
    import jax.numpy as jnp

    from rapidraw_tpu.geometry.transforms import apply_all_transformations

    img = jnp.zeros((3, 40, 60), jnp.float32)
    out, offset = apply_all_transformations(
        img, {"crop": {"x": 100, "y": 50, "width": 0, "height": 0}}
    )
    assert out.shape == (3, 40, 60)
    assert offset == (0.0, 0.0)
    out2, offset2 = apply_all_transformations(
        img, {"crop": {"x": 10, "y": 5, "width": 20, "height": 20}}
    )
    assert out2.shape == (3, 20, 20)
    assert offset2 == (10.0, 5.0)
