"""Parity: the fused Pallas megakernel must match the XLA develop path.

Dither is disabled for the comparison: dither/grain hash through
fract(sin(x)*43758.5453) whose sin() differs in the last ulp between the
Mosaic interpreter and XLA CPU, bounded by 2x the dither amplitude — an
accepted approximation (SURVEY.md treats grain/dither as approximate).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from rapidraw_tpu.params.parse import parse_adjustments
from rapidraw_tpu.pipeline.develop import develop
from rapidraw_tpu.pipeline.fused import develop_fused

FULL_DOC = {
    "exposure": 0.4,
    "contrast": 18,
    "highlights": -30,
    "shadows": 22,
    "whites": 10,
    "blacks": -6,
    "saturation": 12,
    "vibrance": 15,
    "temperature": 8,
    "tint": -4,
    "hue": 6,
    "clarity": 15,
    "structure": 10,
    "sharpness": 25,
    "dehaze": 8,
    "vignetteAmount": -30,
    "grainAmount": 0,
    "hsl": {
        "reds": {"hue": 5, "saturation": 8, "luminance": -2},
        "blues": {"hue": -6, "saturation": 10, "luminance": 4},
    },
    "curves": {
        "luma": [{"x": 0, "y": 6}, {"x": 128, "y": 120}, {"x": 255, "y": 250}],
    },
    "toneMapper": "agx",
}


def _img(h=256, w=640, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.random((3, h, w), dtype=np.float32))


def _nodither(cfg):
    return dataclasses.replace(cfg, dither_active=False)


def test_fused_matches_xla_full_grade():
    img = _img()
    p, c = parse_adjustments(FULL_DOC, is_raw=False)
    c = _nodither(c)
    ref = np.asarray(develop(img, p, c))
    got = np.asarray(develop_fused(img, p, c))
    assert np.abs(ref - got).max() < 2e-4


def test_fused_matches_xla_masked():
    doc = dict(FULL_DOC)
    doc["masks"] = [
        {
            "name": "m1",
            "visible": True,
            "adjustments": {"exposure": 0.8, "saturation": -20,
                            "curves": {"luma": [{"x": 0, "y": 20}, {"x": 255, "y": 235}]}},
            "subMasks": [
                {"type": "radial", "visible": True, "mode": "additive",
                 "parameters": {"centerX": 320, "centerY": 128, "radiusX": 150,
                                "radiusY": 100, "rotation": 0.0, "feather": 0.5}}
            ],
        }
    ]
    p, c = parse_adjustments(doc, is_raw=False)
    c = _nodither(c)
    from rapidraw_tpu.masks.rasterize import rasterize_masks

    masks = jnp.asarray(rasterize_masks(doc, 640, 256, scale=1.0))
    ref = np.asarray(develop(img := _img(), p, c, masks=masks))
    got = np.asarray(develop_fused(img, p, c, masks=masks))
    assert np.abs(ref - got).max() < 2e-4


def test_fused_matches_xla_with_lut():
    # LUT configs split the kernel: grade in Pallas, finish via XLA gather
    rng = np.random.default_rng(3)
    lut = jnp.asarray(rng.random((8, 8, 8, 3), dtype=np.float32))
    doc = dict(FULL_DOC)
    doc["lutPath"] = "dummy.cube"
    doc["lutIntensity"] = 75
    p, c = parse_adjustments(doc, is_raw=False)
    c = _nodither(c)
    assert c.has_lut
    img = _img(seed=1)
    ref = np.asarray(develop(img, p, c, lut=lut))
    got = np.asarray(develop_fused(img, p, c, lut=lut))
    assert np.abs(ref - got).max() < 2e-4


def test_fused_non_tile_aligned_shape():
    # H, W not multiples of the (128, 512) tile exercise the padding path
    img = _img(h=130, w=700, seed=2)
    p, c = parse_adjustments({"exposure": 0.5, "contrast": 15}, is_raw=False)
    c = _nodither(c)
    ref = np.asarray(develop(img, p, c))
    got = np.asarray(develop_fused(img, p, c))
    assert np.abs(ref - got).max() < 2e-4


def test_fused_batch_route_matches_xla_route(monkeypatch):
    from rapidraw_tpu.pipeline.batch import develop_batch, stack_params

    docs = [dict(FULL_DOC), dict(FULL_DOC, exposure=-0.5, contrast=-10)]
    parsed = [parse_adjustments(d, is_raw=False) for d in docs]
    params, cfg = stack_params([p for p, _ in parsed], [c for _, c in parsed])
    cfg = _nodither(cfg)
    imgs = jnp.stack([_img(h=128, w=512, seed=s) for s in (5, 6)])

    monkeypatch.setenv("RAPIDRAW_FUSED", "0")
    ref = np.asarray(develop_batch(imgs, params, cfg))
    monkeypatch.setenv("RAPIDRAW_FUSED", "1")
    got = np.asarray(develop_batch(imgs, params, cfg))
    assert ref.shape == got.shape
    assert np.abs(ref - got).max() < 2e-4


@pytest.mark.parametrize("doc", [{}, {"exposure": 1.0}, {"toneMapper": "agx"}])
def test_fused_minimal_docs(doc):
    img = _img(h=128, w=512, seed=4)
    p, c = parse_adjustments(doc, is_raw=False)
    c = _nodither(c)
    ref = np.asarray(develop(img, p, c))
    got = np.asarray(develop_fused(img, p, c))
    assert np.abs(ref - got).max() < 2e-4


def test_batched_megakernel_matches_per_image():
    """develop_fused_batch (batch as a grid dimension) must reproduce the
    per-image fused path exactly — same kernel body, batched specs."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from rapidraw_tpu.params.parse import parse_adjustments
    from rapidraw_tpu.pipeline.batch import stack_params
    from rapidraw_tpu.pipeline.fused import (
        develop_fused,
        develop_fused_batch,
        fusable_batched,
    )

    docs = [
        {"exposure": 0.4, "contrast": 15, "shadows": 20, "vignetteAmount": -30,
         "toneMapper": "agx"},
        {"exposure": -0.2, "saturation": 25, "hue": 10, "toneMapper": "agx"},
        {"clarity": 30, "toneMapper": "agx"},
    ]
    parsed = [parse_adjustments(d, is_raw=False) for d in docs]
    params, cfg = stack_params([p for p, _ in parsed], [c for _, c in parsed])
    assert fusable_batched(cfg)

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.random((3, 3, 40, 640), dtype=np.float32))

    batched = np.asarray(develop_fused_batch(imgs, params, cfg))
    for i in range(3):
        p_i = jax.tree.map(lambda x: x[i], params)
        single = np.asarray(develop_fused(imgs[i], p_i, cfg))
        np.testing.assert_allclose(batched[i], single, atol=1e-6, err_msg=f"image {i}")


def test_batched_megakernel_with_masks():
    import numpy as np
    import jax
    import jax.numpy as jnp

    from rapidraw_tpu.params.parse import parse_adjustments
    from rapidraw_tpu.pipeline.batch import stack_params
    from rapidraw_tpu.pipeline.fused import develop_fused, develop_fused_batch

    doc = {"exposure": 0.2, "toneMapper": "agx", "masks": [{
        "name": "m", "visible": True,
        "adjustments": {"exposure": 1.0, "saturation": 20},
        "subMasks": [{"type": "radial", "visible": True, "mode": "additive",
                       "parameters": {"centerX": 300, "centerY": 20,
                                      "radiusX": 120, "radiusY": 14}}],
    }]}
    parsed = [parse_adjustments(doc, is_raw=False) for _ in range(2)]
    params, cfg = stack_params([p for p, _ in parsed], [c for _, c in parsed])
    assert cfg.mask_count == 1

    from rapidraw_tpu.masks.rasterize import rasterize_masks

    m = rasterize_masks(doc, 640, 40, scale=1.0)
    masks = jnp.asarray(np.stack([m, m]))
    rng = np.random.default_rng(1)
    imgs = jnp.asarray(rng.random((2, 3, 40, 640), dtype=np.float32))

    batched = np.asarray(develop_fused_batch(imgs, params, cfg, masks=masks))
    for i in range(2):
        p_i = jax.tree.map(lambda x: x[i], params)
        single = np.asarray(develop_fused(imgs[i], p_i, cfg, masks=masks[i]))
        np.testing.assert_allclose(batched[i], single, atol=1e-6)
