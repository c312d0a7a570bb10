"""LaMa inpainting port: reduced-size FFC generator on random weights +
the crop/pad/blend host orchestration (ai_processing.rs:781-917)."""

from __future__ import annotations

import numpy as np
import pytest

import rapidraw_tpu.ai.inpaint as inp
import rapidraw_tpu.ai.masks as am
from rapidraw_tpu.ai.models import ModelUnavailable


@pytest.fixture
def small_lama(tmp_path, monkeypatch):
    monkeypatch.setenv("RAPIDRAW_MODELS", str(tmp_path))
    monkeypatch.setattr(inp, "_NGF", 8)
    monkeypatch.setattr(inp, "_N_BLOCKS", 1)
    monkeypatch.setattr(inp, "_jit_cache", {})

    import jax

    model = inp._models()()
    variables = model.init(
        jax.random.PRNGKey(0),
        np.zeros((1, 64, 64, 3), np.float32),
        np.zeros((1, 64, 64, 1), np.float32),
    )
    am.save_variables_npz(variables, tmp_path / "lama.npz")
    return tmp_path


def _scene(h=80, w=96):
    img = np.zeros((3, h, w), np.float32)
    img[0] = 0.6  # flat reddish field
    img[1] = 0.4
    img[2] = 0.3
    mask = np.zeros((h, w), np.uint8)
    mask[30:46, 40:60] = 255
    return img, mask


def test_missing_weights_graceful(tmp_path, monkeypatch):
    monkeypatch.setenv("RAPIDRAW_MODELS", str(tmp_path))
    monkeypatch.setattr(inp, "_jit_cache", {})
    img, mask = _scene()
    with pytest.raises(ModelUnavailable):
        inp.run_lama_inpainting(img, mask)


def test_empty_mask_is_identity(small_lama):
    img, _ = _scene()
    out = inp.run_lama_inpainting(img, np.zeros(img.shape[1:], np.uint8))
    np.testing.assert_array_equal(out, img)


def test_inpaint_changes_only_masked_region(small_lama):
    img, mask = _scene()
    out = inp.run_lama_inpainting(img, mask)
    assert out.shape == img.shape and np.isfinite(out).all()
    # unmasked pixels pass through exactly (alpha = 0 outside the mask)
    outside = mask == 0
    np.testing.assert_allclose(out[:, outside], img[:, outside], atol=1e-6)
    # masked pixels were replaced by model output (random weights -> ~0.5
    # after sigmoid, far from the 0.6/0.4/0.3 field with overwhelming odds)
    inside = mask > 0
    assert np.abs(out[:, inside] - img[:, inside]).max() > 1e-3


def test_partial_mask_alpha_blends(small_lama):
    img, mask = _scene()
    mask[30:46, 40:60] = 128  # half-opacity mask
    out_half = inp.run_lama_inpainting(img, mask)
    mask_full = np.zeros_like(mask)
    mask_full[30:46, 40:60] = 255
    out_full = inp.run_lama_inpainting(img, mask_full)
    # half-opacity result sits between original and full replacement...
    a = out_half[:, 35, 45] - img[:, 35, 45]
    b = out_full[:, 35, 45] - img[:, 35, 45]
    # ...but the binarized model mask is identical, so delta ratio ~128/255
    np.testing.assert_allclose(a, b * (128.0 / 255.0), atol=1e-5)


def test_generate_replace_patch(small_lama):
    img, _ = _scene()
    patch_def = {
        "visible": True,
        "subMasks": [{
            "type": "radial", "visible": True, "mode": "additive",
            "parameters": {"centerX": 48, "centerY": 38, "radiusX": 10,
                           "radiusY": 8, "rotation": 0.0, "feather": 0.3},
        }],
    }
    pd = inp.generate_replace_patch(img, patch_def)
    assert set(pd) == {"color", "mask"}
    import base64
    import io

    from PIL import Image

    m = np.asarray(Image.open(io.BytesIO(base64.b64decode(pd["mask"]))))
    c = np.asarray(Image.open(io.BytesIO(base64.b64decode(pd["color"]))))
    assert m.shape == (80, 96) and c.shape == (80, 96, 3)
    assert m.max() > 200  # the radial mask center is (near) opaque
    # outside the mask the color layer is black (JPEG-noise tolerance)
    assert c[0, 0].max() <= 5 and c[-1, -1].max() <= 5


def test_generate_replace_patch_no_backend(small_lama):
    img, _ = _scene()
    patch_def = {"visible": True, "subMasks": [{
        "type": "radial", "visible": True, "mode": "additive",
        "parameters": {"centerX": 48, "centerY": 38, "radiusX": 10,
                       "radiusY": 8},
    }]}
    with pytest.raises(ValueError):
        inp.generate_replace_patch(img, patch_def, use_fast_inpaint=False)
