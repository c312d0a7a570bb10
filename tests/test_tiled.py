"""Tiled dispatch vs whole-image develop.

Interior pixels (further than the blur radius from any tile seam) must be
bit-identical; seam bands only differ when a blur radius exceeds the
overlap — the same contract as the reference's 2048/128 tiling
(gpu_processing.rs:1279-1280).
"""

import jax
import numpy as np
import jax.numpy as jnp

from rapidraw_tpu.params.parse import parse_adjustments
from rapidraw_tpu.pipeline.develop import develop
from rapidraw_tpu.pipeline.tiled import develop_tiled


def _img(h, w, seed=0):
    return np.random.default_rng(seed).random((3, h, w)).astype(np.float32)


def _develop_jit(img, p, c, masks=None):
    # jit like the tiled path does — eager XLA uses a different sin()
    # fusion than compiled XLA, which shifts the dither/grain hash by ulps
    fn = jax.jit(lambda x, q, mk: develop(x, q, c, masks=mk))
    return np.asarray(fn(jnp.asarray(img), p, masks))


def test_tiled_elementwise_doc_is_exact():
    # no spatial stages -> tiling must be exact everywhere incl. the
    # coordinate-dependent vignette (absolute-coordinate parametrization).
    # dither/grain are excluded: their fract(sin(x)*43758) hash shifts by
    # whole dither steps from sin() ulp differences across array shapes
    # (SIMD lane assignment), an accepted approximation per SURVEY.
    import dataclasses

    doc = {"exposure": 0.5, "contrast": 20, "vignetteAmount": -40,
           "toneMapper": "agx"}
    img = _img(96, 160)
    p, c = parse_adjustments(doc, is_raw=False)
    c = dataclasses.replace(c, dither_active=False)
    whole = _develop_jit(img, p, c)
    tiled = develop_tiled(img, p, c, tile_size=64, overlap=16)
    np.testing.assert_allclose(tiled, whole, atol=1e-5)


def test_tiled_grain_dither_bounded():
    # hash stages stay within their amplitude across tile boundaries
    doc = {"exposure": 0.5, "grainAmount": 25, "toneMapper": "agx"}
    img = _img(96, 160)
    p, c = parse_adjustments(doc, is_raw=False)
    whole = _develop_jit(img, p, c)
    tiled = develop_tiled(img, p, c, tile_size=64, overlap=16)
    assert np.abs(tiled - whole).max() < 0.1
    assert np.abs(np.mean(tiled - whole)) < 1e-3  # zero-mean noise


def test_tiled_blur_doc_interior_exact():
    doc = {"shadows": 40, "clarity": 30, "exposure": 0.2}
    img = _img(96, 160, seed=1)
    p, c = parse_adjustments(doc, is_raw=False)
    # blur radii at this size: scale=0.1 -> radius 1 for both levels
    whole = _develop_jit(img, p, c)
    tiled = develop_tiled(img, p, c, tile_size=64, overlap=16)
    assert np.abs(tiled - whole).max() < 1e-5  # overlap >> radius: exact


def test_tiled_single_tile_path():
    import dataclasses

    doc = {"exposure": 1.0}
    img = _img(40, 60, seed=2)
    p, c = parse_adjustments(doc, is_raw=False)
    c = dataclasses.replace(c, dither_active=False)  # jit-vs-eager sin ulps
    whole = _develop_jit(img, p, c)
    tiled = develop_tiled(img, p, c)  # fits in one tile
    np.testing.assert_allclose(tiled, whole, atol=1e-6)


def test_tiled_fused_kernel_offsets(monkeypatch):
    """Force the fused-megakernel route (Pallas interpret mode on CPU):
    dynamic tile offsets must keep the coordinate-dependent vignette exact
    across seams, and all interior tiles must share one jit entry."""
    import dataclasses

    monkeypatch.setenv("RAPIDRAW_FUSED", "1")
    doc = {"exposure": 0.4, "contrast": 15, "vignetteAmount": -50,
           "toneMapper": "agx"}
    img = _img(96, 160, seed=4)
    p, c = parse_adjustments(doc, is_raw=False)
    c = dataclasses.replace(c, dither_active=False)
    from rapidraw_tpu.pipeline.fused import develop_fused

    whole = np.asarray(
        jax.jit(lambda x, q: develop_fused(x, q, c))(jnp.asarray(img), p)
    )
    tiled = develop_tiled(img, p, c, tile_size=64, overlap=16)
    np.testing.assert_allclose(tiled, whole, atol=1e-5)


def test_tiled_with_masks():
    doc = {
        "exposure": 0.2,
        "masks": [{
            "name": "m", "visible": True,
            "adjustments": {"exposure": 1.5},
            "subMasks": [{"type": "radial", "visible": True, "mode": "additive",
                          "parameters": {"centerX": 80, "centerY": 48, "radiusX": 50,
                                         "radiusY": 30, "rotation": 0.0, "feather": 0.5}}],
        }],
    }
    from rapidraw_tpu.masks.rasterize import rasterize_masks

    img = _img(96, 160, seed=3)
    masks = rasterize_masks(doc, 160, 96, scale=1.0)
    p, c = parse_adjustments(doc, is_raw=False)
    whole = _develop_jit(img, p, c, masks=jnp.asarray(masks))
    tiled = develop_tiled(img, p, c, masks=masks, tile_size=64, overlap=16)
    np.testing.assert_allclose(tiled, whole, atol=1e-6)


def test_tiled_ca_recenters_on_full_image():
    """CA must warp toward the FULL image's optical center on every tile:
    re-centering per tile misregisters red/blue and seams at boundaries."""
    import dataclasses

    doc = {"exposure": 0.2, "chromaticAberrationRedCyan": 500,
           "chromaticAberrationBlueYellow": -400}
    img = _img(96, 160, seed=5)
    p, c = parse_adjustments(doc, is_raw=False)
    assert c.ca_active
    c = dataclasses.replace(c, dither_active=False)
    whole = _develop_jit(img, p, c)
    tiled = develop_tiled(img, p, c, tile_size=64, overlap=16)
    np.testing.assert_allclose(tiled, whole, atol=1e-6)


def test_tiled_masked_nr_uses_absolute_hash_coords():
    """Mask-driven NR takes the jittered gather path (nr_static_* is None);
    its hash tap jitter must use absolute coordinates so every tile
    reproduces the whole-image tap pattern."""
    import dataclasses

    doc = {
        "exposure": 0.1,
        "masks": [{
            "name": "m", "visible": True,
            "adjustments": {"lumaNoiseReduction": 60, "colorNoiseReduction": 40},
            "subMasks": [{"type": "radial", "visible": True, "mode": "additive",
                          "parameters": {"centerX": 80, "centerY": 48, "radiusX": 70,
                                         "radiusY": 40, "rotation": 0.0, "feather": 0.5}}],
        }],
    }
    from rapidraw_tpu.masks.rasterize import rasterize_masks

    img = _img(96, 160, seed=6)
    masks = rasterize_masks(doc, 160, 96, scale=1.0)
    p, c = parse_adjustments(doc, is_raw=False)
    assert c.nr_active and c.nr_static_luma is None
    c = dataclasses.replace(c, dither_active=False)
    whole = _develop_jit(img, p, c, masks=jnp.asarray(masks))
    tiled = develop_tiled(img, p, c, masks=masks, tile_size=64, overlap=16)
    np.testing.assert_allclose(tiled, whole, atol=1e-5)


def test_tiled_exact_jitter_nr_matches_whole(monkeypatch):
    """RAPIDRAW_NR_EXACT_JITTER=1 on the tiled path: per-tile static
    offsets must reproduce the whole-image jittered tap pattern exactly."""
    import dataclasses

    monkeypatch.setenv("RAPIDRAW_NR_EXACT_JITTER", "1")
    doc = {"lumaNoiseReduction": 50, "colorNoiseReduction": 30}
    img = _img(96, 160, seed=7)
    p, c = parse_adjustments(doc, is_raw=False)
    assert c.nr_active and c.nr_static_luma is not None
    c = dataclasses.replace(c, dither_active=False)
    whole = _develop_jit(img, p, c)
    tiled = develop_tiled(img, p, c, tile_size=64, overlap=16)
    np.testing.assert_allclose(tiled, whole, atol=1e-5)
