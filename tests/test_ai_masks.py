"""AI mask inference: U2-Net / Depth-Anything flax graphs on random
weights, EDT mask ops, and the precompute wiring into the rasterizer."""

from __future__ import annotations

import numpy as np
import pytest

import rapidraw_tpu.ai.masks as am
from rapidraw_tpu.ai.models import ModelUnavailable


def _rand_image(h=40, w=56, seed=0):
    return np.random.default_rng(seed).random((3, h, w)).astype(np.float32)


@pytest.fixture
def models_dir(tmp_path, monkeypatch):
    monkeypatch.setenv("RAPIDRAW_MODELS", str(tmp_path))
    return tmp_path


def _init_u2net_npz(path, size, small=True):
    import jax

    model = am._u2net()(small=small)
    x = np.zeros((1, size, size, 3), np.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    am.save_variables_npz(variables, path)


def test_u2net_mask_from_random_weights(models_dir, monkeypatch):
    monkeypatch.setattr(am, "U2NET_INPUT", 64)
    monkeypatch.setattr(am, "_jit_cache", {})
    _init_u2net_npz(models_dir / "u2net.npz", 64, small=False)
    img = _rand_image()
    mask = am.generate_foreground_mask(img)
    assert mask.shape == (40, 56) and mask.dtype == np.uint8
    # sigmoid output min-max normalized -> full u8 range endpoints
    assert mask.min() == 0 and mask.max() == 255


def test_u2net_missing_weights_graceful(models_dir):
    with pytest.raises(ModelUnavailable) as ei:
        am.generate_sky_mask(_rand_image())
    assert "skyseg.npz" in str(ei.value)


def test_depth_map_from_random_weights(models_dir, monkeypatch):
    import rapidraw_tpu.ai.depth as dep

    monkeypatch.setattr(dep, "DEPTH_INPUT", 70)  # 5x14 grid
    monkeypatch.setattr(dep, "_jit_cache", {})
    import jax

    model = dep._depth_model()()
    x = np.zeros((1, 70, 70, 3), np.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    am.save_variables_npz(variables, models_dir / "depth_anything_v2_vits.npz")

    depth = dep.generate_depth_map(_rand_image(32, 48))
    assert depth.shape == (32, 48) and depth.dtype == np.uint8
    assert depth.min() == 0 and depth.max() == 255


def test_edt_and_grow_mask():
    mask = np.zeros((21, 21), np.uint8)
    mask[10, 10] = 255
    dist = am.euclidean_distance_transform((mask > 127).astype(np.uint8))
    assert dist[10, 10] == 0.0
    np.testing.assert_allclose(dist[10, 13], 3.0)
    np.testing.assert_allclose(dist[13, 14], 5.0)  # 3-4-5 triangle

    grown = am.grow_mask(mask, 3.0)
    assert grown[10, 13] == 255 and grown[10, 14] == 0
    shrunk = am.grow_mask(grown, -2.0)
    assert shrunk[10, 10] == 255 and shrunk[10, 12] == 0


def test_edt_pure_numpy_matches_scipy():
    rng = np.random.default_rng(1)
    binary = (rng.random((17, 23)) > 0.9).astype(np.uint8)
    binary[3, 5] = 1  # guarantee at least one seed
    from scipy.ndimage import distance_transform_edt

    ref = distance_transform_edt(binary == 0)
    f = np.where(binary != 0, 0.0, 1e12)
    d = am._edt_1d_sq(f)
    d = am._edt_1d_sq(np.ascontiguousarray(d.T)).T
    np.testing.assert_allclose(np.sqrt(d), ref, atol=1e-6)


def test_precompute_wires_into_rasterizer(models_dir, monkeypatch):
    monkeypatch.setattr(am, "U2NET_INPUT", 64)
    monkeypatch.setattr(am, "_jit_cache", {})
    _init_u2net_npz(models_dir / "u2net.npz", 64, small=False)

    adj = {
        "masks": [{
            "name": "fg", "visible": True,
            "adjustments": {"exposure": 1.0},
            "subMasks": [{"type": "ai-foreground", "visible": True,
                          "mode": "additive", "parameters": {}}],
        }],
    }
    img = _rand_image(40, 56)
    filled = am.precompute_ai_submasks(adj, img)
    p = filled["masks"][0]["subMasks"][0]["parameters"]
    assert p["maskDataBase64"].startswith("data:image/png;base64,")
    # original doc untouched
    assert "maskDataBase64" not in adj["masks"][0]["subMasks"][0]["parameters"]

    from rapidraw_tpu.masks.rasterize import rasterize_masks

    bitmaps = rasterize_masks(filled, 56, 40, scale=1.0)
    assert bitmaps is not None and bitmaps.shape == (1, 40, 56)
    assert bitmaps.max() > 0


def test_precompute_subject_raises(models_dir):
    adj = {"masks": [{"visible": True, "subMasks": [
        {"type": "ai-subject", "visible": True, "parameters": {}}]}]}
    with pytest.raises(ModelUnavailable):
        am.precompute_ai_submasks(adj, _rand_image())


def test_weights_cache_is_lru_with_five_slots(tmp_path, monkeypatch):
    """The weight-tree cache must hold all five mask nets (SAM enc+dec,
    fg, sky, depth) and refresh recency on hit, so a batch cycling through
    four AI mask types does not reload a ~170 MB npz per image."""
    import numpy as np

    monkeypatch.setenv("RAPIDRAW_MODELS", str(tmp_path))
    am._weights_cache.clear()
    names = [f"m{i}.npz" for i in range(5)]
    for n in names:
        np.savez(tmp_path / n, **{"params/w": np.zeros(2, np.float32)})

    trees = [am._load_variables(n) for n in names]
    # all five stay resident
    for n, t in zip(names, trees):
        assert am._load_variables(n) is t

    # recency: touch m0, then add a sixth -> m1 (the LRU) is evicted, m0 kept
    assert am._load_variables(names[0]) is trees[0]
    np.savez(tmp_path / "m5.npz", **{"params/w": np.zeros(2, np.float32)})
    am._load_variables("m5.npz")
    assert am._load_variables(names[0]) is trees[0]
    assert am._load_variables(names[1]) is not trees[1]
    am._weights_cache.clear()
