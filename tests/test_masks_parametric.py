"""Parametric/AI mask generators, grow/feather, AI patches, unwarp."""

import base64
import io

import numpy as np
from PIL import Image

from rapidraw_tpu.masks.parametric import (
    apply_grow_and_feather,
    generate_ai_depth,
    generate_ai_mask,
    generate_color_range,
    generate_luminance_range,
)
from rapidraw_tpu.masks.patches import composite_patches_on_image


def _mask_to_b64(arr):
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, "PNG")
    return "data:image/png;base64," + base64.b64encode(buf.getvalue()).decode()


def test_grow_and_feather():
    m = np.zeros((100, 100), np.uint8)
    m[40:60, 40:60] = 255
    grown = apply_grow_and_feather(m, grow=100.0, feather=0.0)  # 1% of 100px = 1px
    assert grown[39, 50] == 255 and grown[37, 50] == 0
    shrunk = apply_grow_and_feather(m, grow=-100.0, feather=0.0)
    assert shrunk[40, 50] == 0 and shrunk[42, 50] == 255
    feathered = apply_grow_and_feather(m, grow=0.0, feather=100.0)
    assert 0 < feathered[39, 50] < 255  # soft edge


def test_color_range_mask():
    warped = np.zeros((64, 64, 3), np.uint8)
    warped[:32] = (200, 40, 40)  # red top half
    warped[32:] = (40, 40, 200)  # blue bottom
    params = {"targetX": 10, "targetY": 10, "tolerance": 25, "feather": 0.0, "grow": 0.0}
    m = generate_color_range(params, 64, 64, 1.0, (0.0, 0.0), warped)
    assert m[5, 5] > 200  # matches red
    assert m[50, 50] == 0  # blue rejected


def test_luminance_range_mask():
    warped = np.zeros((64, 64, 3), np.uint8)
    warped[:32] = 220
    warped[32:] = 30
    params = {"targetX": 5, "targetY": 5, "tolerance": 20, "feather": 0.0}
    m = generate_luminance_range(params, 64, 64, 1.0, (0.0, 0.0), warped)
    assert m[5, 5] > 200
    assert m[50, 50] == 0


def test_ai_mask_reprojection_orientation():
    full = np.zeros((40, 60), np.uint8)
    full[:, :30] = 255  # left half on
    b64 = _mask_to_b64(full)
    m0 = generate_ai_mask({"maskDataBase64": b64}, 60, 40, 1.0, (0.0, 0.0))
    assert m0[20, 10] == 255 and m0[20, 50] == 0
    # orientation 1 (90° cw): output is 40x60; former left half -> top half
    m1 = generate_ai_mask({"maskDataBase64": b64, "orientationSteps": 1}, 40, 60, 1.0, (0.0, 0.0))
    assert m1.shape == (60, 40)
    assert m1[10, 20] == 255 and m1[50, 20] == 0


def test_ai_depth_bandpass():
    depth = np.tile(np.linspace(0, 255, 64, dtype=np.uint8), (64, 1))
    b64 = _mask_to_b64(depth)
    m = generate_ai_depth(
        {"maskDataBase64": b64, "minDepth": 40.0, "maxDepth": 60.0,
         "minFade": 5.0, "maxFade": 5.0, "feather": 0.0},
        64, 64, 1.0, (0.0, 0.0),
    )
    mid = m[:, 32].mean()  # ~50% depth, inside band
    edge = m[:, 5].mean()  # ~8% depth, outside
    assert mid > 80 and edge == 0


def test_composite_patches():
    base = np.zeros((3, 32, 32), np.float32)
    color = np.full((32, 32, 3), 255, np.uint8)
    color[..., 1:] = 0  # pure red patch
    mask = np.zeros((32, 32), np.uint8)
    mask[8:24, 8:24] = 255
    doc = {
        "aiPatches": [
            {"visible": True,
             "patchData": {"color": _mask_to_b64_rgb(color), "mask": _mask_to_b64(mask)}}
        ]
    }
    out = composite_patches_on_image(base, doc)
    assert out[0, 16, 16] > 0.95  # red inside
    assert out[0, 2, 2] == 0.0  # untouched outside


def _mask_to_b64_rgb(arr):
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, "PNG")
    return base64.b64encode(buf.getvalue()).decode()


def test_unwarp_inverts_warp_interior():
    import jax.numpy as jnp

    from rapidraw_tpu.geometry.params import geometry_params_from_json
    from rapidraw_tpu.geometry.warp import unwarp_image_geometry, warp_image_geometry

    yy, xx = np.mgrid[0:80, 0:100].astype(np.float32)
    img = jnp.asarray(np.stack([xx / 100, yy / 80, (xx + yy) / 180]))
    p = geometry_params_from_json({"transformDistortion": 20.0, "transformRotate": 3.0})
    warped = warp_image_geometry(img, p)
    restored = np.asarray(unwarp_image_geometry(warped, p))
    center = np.s_[:, 25:55, 30:70]
    err = np.abs(restored[center] - np.asarray(img)[center]).max()
    assert err < 0.02, err
