"""End-to-end smoke + property tests for the develop pipeline."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rapidraw_tpu.params.parse import merge_configs, parse_adjustments
from rapidraw_tpu.pipeline.develop import develop


def _rand_img(h=64, w=96, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.random((3, h, w), dtype=np.float32))


def test_default_adjustments_identity_modulo_dither():
    """Empty adjustment doc + basic tonemapper == sRGB passthrough + dither."""
    img = _rand_img()
    params, cfg = parse_adjustments({}, is_raw=False)
    out = develop(img, params, cfg)
    # only the output dither (±0.5/255) and clamp separate out from input
    # tolerance: dither amplitude + sRGB round-trip float error
    assert np.abs(np.asarray(out) - np.clip(np.asarray(img), 0, 1)).max() <= 0.5 / 255 + 5e-5


def test_exposure_brightens():
    img = _rand_img() * 0.25
    params, cfg = parse_adjustments({"exposure": 1.0}, is_raw=False)
    out = develop(img, params, merge_configs([cfg]))
    params0, cfg0 = parse_adjustments({}, is_raw=False)
    base = develop(img, params0, cfg0)
    assert np.asarray(out).mean() > np.asarray(base).mean()


def test_full_stack_runs_and_is_finite():
    """Exercise every stage at once."""
    doc = {
        "exposure": 0.5,
        "brightness": 20,
        "contrast": 30,
        "highlights": -40,
        "shadows": 35,
        "whites": 10,
        "blacks": -10,
        "saturation": 15,
        "temperature": 8,
        "tint": -5,
        "vibrance": 25,
        "hue": 10,
        "sharpness": 40,
        "lumaNoiseReduction": 30,
        "colorNoiseReduction": 30,
        "clarity": 25,
        "dehaze": 20,
        "structure": 15,
        "centré": 30,
        "vignetteAmount": -40,
        "grainAmount": 30,
        "glowAmount": 20,
        "halationAmount": 20,
        "chromaticAberrationRedCyan": 5,
        "hsl": {"reds": {"hue": 20, "saturation": 30, "luminance": -10}},
        "colorGrading": {
            "shadows": {"hue": 220, "saturation": 30, "luminance": 5},
            "highlights": {"hue": 40, "saturation": 20, "luminance": 0},
            "blending": 60,
            "balance": 10,
        },
        "colorCalibration": {"redHue": 20, "redSaturation": 15, "shadowsTint": 10},
        "curves": {
            "luma": [{"x": 0, "y": 10}, {"x": 128, "y": 120}, {"x": 255, "y": 250}],
            "red": [{"x": 0, "y": 0}, {"x": 255, "y": 255}],
            "green": [{"x": 0, "y": 0}, {"x": 255, "y": 255}],
            "blue": [{"x": 0, "y": 0}, {"x": 255, "y": 255}],
        },
        "toneMapper": "agx",
    }
    img = _rand_img(48, 64)
    params, cfg = parse_adjustments(doc, is_raw=False)
    out = np.asarray(develop(img, params, cfg))
    assert out.shape == (3, 48, 64)
    assert np.isfinite(out).all()
    assert out.min() >= 0.0 and out.max() <= 1.0


def test_mask_blending_local_only():
    """A mask with exposure boost must only brighten where influence > 0."""
    img = jnp.full((3, 32, 32), 0.2, jnp.float32)
    doc = {
        "masks": [
            {
                "visible": True,
                "adjustments": {"exposure": 2.0},
                "subMasks": [],
            }
        ]
    }
    params, cfg = parse_adjustments(doc, is_raw=False)
    assert cfg.mask_count == 1
    masks = np.zeros((1, 32, 32), np.float32)
    masks[0, :, 16:] = 1.0
    out = np.asarray(develop(img, params, cfg, masks=jnp.asarray(masks)))
    left = out[:, :, :15].mean()
    right = out[:, :, 17:].mean()
    assert right > left + 0.1


def test_mask_zero_opacity_is_noop():
    img = _rand_img(32, 32)
    doc = {
        "masks": [
            {"visible": True, "adjustments": {"exposure": 2.0, "contrast": 50}, "subMasks": []}
        ]
    }
    params, cfg = parse_adjustments(doc, is_raw=False)
    masks = jnp.zeros((1, 32, 32), jnp.float32)
    out = develop(img, params, cfg, masks=masks)
    params0, cfg0 = parse_adjustments({}, is_raw=False)
    base = develop(img, params0, cfg0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base), atol=1e-6)


def test_jit_compiles_and_caches():
    img = _rand_img(32, 32)
    params, cfg = parse_adjustments({"exposure": 1.0, "contrast": 25}, is_raw=False)
    fn = jax.jit(develop, static_argnames=("cfg",))
    out1 = fn(img, params, cfg)
    out2 = fn(img, params, cfg)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))


def test_raw_emulation_path():
    img = _rand_img(32, 32) * 2.0  # linear RAW values can exceed 1
    params, cfg = parse_adjustments({}, is_raw=True)
    out = np.asarray(develop(img, params, cfg))
    assert np.isfinite(out).all()


@pytest.mark.parametrize("tm", ["agx", "basic"])
def test_tonemappers(tm):
    img = _rand_img(32, 32)
    params, cfg = parse_adjustments({"toneMapper": tm}, is_raw=False)
    out = np.asarray(develop(img, params, cfg))
    assert np.isfinite(out).all()


def test_random_document_fuzz_finite_and_bounded():
    """30 random adjustment documents (random subsets of every slider,
    values across and beyond the UI ranges) must parse and develop to
    finite [0, 1] output — no combination may crash or produce NaN."""
    from rapidraw_tpu.ops import blur as _blur
    from rapidraw_tpu.ops import nr as _nr

    # XLA-native blur/NR paths (numerically pinned elsewhere): interpreted
    # Pallas on the CPU test platform costs ~15 s per blur-active document
    tok_b = _blur.FORCE_CONV.set(True)
    tok_n = _nr.FORCE_XLA.set(True)
    try:
        _run_doc_fuzz()
    finally:
        _blur.FORCE_CONV.reset(tok_b)
        _nr.FORCE_XLA.reset(tok_n)


def _run_doc_fuzz():
    import numpy as np

    # NR keys excluded: the static-grid NR runs interpreted Pallas on the
    # CPU test platform (~40 s per hit) and has dedicated tests at every
    # level (test_components / test_tiled / test_oracle_match)
    keys_100 = [
        "contrast", "highlights", "shadows", "whites", "blacks", "saturation",
        "temperature", "tint", "vibrance", "sharpness",
        "clarity", "dehaze", "structure", "centré",
        "vignetteAmount", "grainAmount", "glowAmount", "halationAmount",
        "flareAmount", "hueShift",
    ]
    rng = np.random.default_rng(42)
    img = jnp.asarray(rng.random((3, 40, 64), dtype=np.float32))
    for trial in range(30):
        doc = {}
        for k in keys_100:
            if rng.random() < 0.35:
                doc[k] = float(rng.uniform(-150, 150))  # beyond UI range too
        if rng.random() < 0.5:
            doc["exposure"] = float(rng.uniform(-6, 6))
        if rng.random() < 0.3:
            doc["toneMapper"] = rng.choice(["agx", "basic"]).item()
        if rng.random() < 0.3:
            doc["sectionVisibility"] = {"effects": bool(rng.random() < 0.5)}
        params, cfg = parse_adjustments(doc, is_raw=bool(rng.random() < 0.3))
        out = np.asarray(develop(img, params, cfg))
        assert np.isfinite(out).all(), f"trial {trial}: NaN/Inf for {doc}"
        assert out.min() >= -1e-5 and out.max() <= 1.0 + 1e-5, (
            f"trial {trial}: out of range [{out.min()}, {out.max()}] for {doc}"
        )


def test_interleaved_input_raises_clear_error():
    """The public develop() contract is planar (3, H, W); the classic HWC
    hand-off must fail loud (it used to silently slice 3 rows as planes)."""
    params, cfg = parse_adjustments({}, is_raw=False)
    for bad in ((40, 64, 3), (40, 64, 4), (4, 40, 64)):
        with pytest.raises(ValueError, match="PLANAR"):
            develop(jnp.zeros(bad, jnp.float32), params, cfg)
    # planar passes — including the degenerate W==3 case (assumed planar)
    out = develop(jnp.zeros((3, 40, 64), jnp.float32), params, cfg)
    assert out.shape == (3, 40, 64)
