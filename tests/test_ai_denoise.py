"""Tiled-inference harness + UtNet denoiser tests (weights-free)."""

import numpy as np
import pytest

from rapidraw_tpu.ai.models import ModelUnavailable
from rapidraw_tpu.ai.tiled_inference import (
    TILE_BALANCED, TILE_FASTER, TILE_HIGHER_QUALITY, TileParams,
    run_tiled, select_tile_params,
)


def test_select_tile_params_matches_reference_thresholds():
    assert select_tile_params(0.0) == TILE_FASTER
    assert select_tile_params(0.5) == TILE_BALANCED
    assert select_tile_params(1.0) == TILE_HIGHER_QUALITY


def test_run_tiled_identity_model_is_lossless():
    rng = np.random.default_rng(0)
    img = rng.random((3, 200, 300)).astype(np.float32)
    out = run_tiled(lambda b: b, img, TileParams(64, 48, 4))
    np.testing.assert_allclose(out, img, atol=1e-6)


def test_run_tiled_no_overlap():
    rng = np.random.default_rng(1)
    img = rng.random((3, 100, 130)).astype(np.float32)
    out = run_tiled(lambda b: b, img, TileParams(64, 64, 0))
    np.testing.assert_allclose(out, img, atol=1e-6)


def test_run_tiled_model_sees_context():
    # a model that averages 3x3 neighborhoods must produce seamless output
    # thanks to the mirror-padded context
    import scipy.ndimage as ndi

    rng = np.random.default_rng(2)
    img = rng.random((3, 96, 96)).astype(np.float32)

    def blur_model(batch):
        return np.stack([
            np.stack([ndi.uniform_filter(c, 3, mode="nearest") for c in t])
            for t in batch
        ])

    out = run_tiled(blur_model, img, TileParams(64, 48, 4))
    ref = np.stack([ndi.uniform_filter(c, 3, mode="reflect") for c in img])
    # interior must match exactly (context covers the stencil)
    np.testing.assert_allclose(out[:, 2:-2, 2:-2], ref[:, 2:-2, 2:-2], atol=1e-5)


def test_denoise_ai_without_weights_raises(tmp_path, monkeypatch):
    from rapidraw_tpu.ai.denoise import denoise_ai

    monkeypatch.setenv("RAPIDRAW_MODELS", str(tmp_path))
    with pytest.raises(ModelUnavailable, match="utnet.npz"):
        denoise_ai(np.zeros((3, 64, 64), np.float32))


def test_utnet_forward_shape():
    # architecture is runnable end-to-end (random init)
    import jax
    from rapidraw_tpu.ai.denoise import _utnet

    model = _utnet()
    x = np.zeros((1, 64, 64, 3), np.float32)
    variables = model.init(jax.random.key(0), x)
    y = model.apply(variables, x)
    assert y.shape == (1, 64, 64, 3)
