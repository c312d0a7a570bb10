"""Flare generator tests."""

import numpy as np
import jax.numpy as jnp

from rapidraw_tpu.ops.flare import FLARE_MAP_SIZE, flare_threshold_map, generate_flare_map


def test_threshold_extracts_bright_regions():
    img = np.zeros((3, 64, 64), np.float32)
    img[:, 28:36, 28:36] = 1.0  # bright blob
    thr = np.asarray(
        flare_threshold_map(jnp.asarray(img), 0.8, 0.0, 0.0, 0.0, is_raw=False)
    )
    assert thr.shape == (3, FLARE_MAP_SIZE, FLARE_MAP_SIZE)
    c = FLARE_MAP_SIZE // 2
    assert thr[:, c - 4 : c + 4, c - 4 : c + 4].mean() > 0.01
    assert thr[:, :64, :64].max() < 1e-4  # dark corner contributes nothing


def test_flare_map_runs_and_scales_with_amount():
    rng = np.random.default_rng(0)
    img = jnp.asarray((rng.random((3, 96, 128)) ** 4).astype(np.float32))
    m1 = np.asarray(generate_flare_map(img, 0.5, 0.0, 0.0, 0.0, False))
    assert m1.shape == (FLARE_MAP_SIZE, FLARE_MAP_SIZE, 3)
    assert np.isfinite(m1).all()
    m2 = np.asarray(generate_flare_map(img, 1.0, 0.0, 0.0, 0.0, False))
    assert m2.sum() > m1.sum()


def test_develop_with_flare_active():
    from rapidraw_tpu.params.parse import parse_adjustments
    from rapidraw_tpu.pipeline.develop import develop

    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.random((3, 48, 64), dtype=np.float32))
    params, cfg = parse_adjustments({"flareAmount": 50})
    assert cfg.flare_active
    out = np.asarray(develop(img, params, cfg))
    assert np.isfinite(out).all()
    p0, c0 = parse_adjustments({})
    base = np.asarray(develop(img, p0, c0))
    # flare adds light somewhere
    assert out.sum() >= base.sum() - 1e-3
