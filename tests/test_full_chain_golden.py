"""Full-chain golden test: JAX develop() vs the scalar NumPy oracle's
whole-image develop (tests/oracle.py develop_image), every stage active.

This backs the <=1e-3 fidelity claim end-to-end (VERDICT.md Missing #4):
the oracle is an independent per-pixel transcription of shader.wgsl main
(:1438-1735) including the blur pyramid (blur.wgsl), so a semantic
mistranslation in any JAX op or in the chain ORDER shows up here.

NR note: the TPU static-grid path drops the per-pixel hash jitter of the
tap positions (ops/nr.py docstring); the oracle is run with jitter=False to
match. The jittered path is covered pixel-exact by
test_oracle_match.test_nr_dynamic_jitter_matches_oracle.
"""

import numpy as np

import oracle

RNG = np.random.default_rng(42)

# every stage active (masks/LUT/flare excluded — covered by dedicated tests)
FULL_DOC = {
    "exposure": 0.4,
    "brightness": 15,
    "contrast": 20,
    "highlights": -25,
    "shadows": 20,
    "whites": 10,
    "blacks": -8,
    "saturation": 10,
    "vibrance": 18,
    "temperature": 5,
    "tint": -4,
    "hue": 6,
    "sharpness": 30,
    "clarity": 20,
    "structure": 15,
    "centré": 25,
    "dehaze": 10,
    "glowAmount": 20,
    "halationAmount": 15,
    "lumaNoiseReduction": 30,
    "colorNoiseReduction": 25,
    "chromaticAberrationRedCyan": 4,
    "chromaticAberrationBlueYellow": -3,
    "vignetteAmount": -30,
    "vignetteMidpoint": 45,
    "vignetteRoundness": 10,
    "vignetteFeather": 60,
    "grainAmount": 20,
    "grainSize": 30,
    "grainRoughness": 55,
    "colorCalibration": {
        "shadowsTint": 10,
        "redHue": 8, "redSaturation": 12,
        "greenHue": -6, "greenSaturation": 5,
        "blueHue": 4, "blueSaturation": -8,
    },
    "hsl": {
        "reds": {"hue": 6, "saturation": 10, "luminance": 0},
        "greens": {"hue": -4, "saturation": 8, "luminance": 2},
        "blues": {"hue": -8, "saturation": 14, "luminance": -6},
    },
    "colorGrading": {
        "shadows": {"hue": 220, "saturation": 12, "luminance": 2},
        "midtones": {"hue": 120, "saturation": 6, "luminance": 0},
        "highlights": {"hue": 40, "saturation": 8, "luminance": -2},
        "blending": 60,
        "balance": 10,
    },
    "curves": {
        "luma": [{"x": 0, "y": 4}, {"x": 110, "y": 96}, {"x": 255, "y": 252}],
        "red": [{"x": 0, "y": 2}, {"x": 128, "y": 120}, {"x": 255, "y": 255}],
        "green": [{"x": 0, "y": 0}, {"x": 255, "y": 255}],
        "blue": [{"x": 0, "y": 0}, {"x": 250, "y": 255}],
    },
    "toneMapper": "agx",
}


def _doc_curves(doc):
    return {
        k: [(float(p["x"]), float(p["y"])) for p in v]
        for k, v in doc["curves"].items()
    }


def _run_chain(tonemapper):
    import jax
    import jax.numpy as jnp

    from rapidraw_tpu.params.parse import parse_adjustments
    from rapidraw_tpu.pipeline.develop import develop

    doc = dict(FULL_DOC)
    doc["toneMapper"] = tonemapper
    h, w = 16, 20
    img = RNG.random((3, h, w), dtype=np.float32)

    params, cfg = parse_adjustments(doc, is_raw=False)
    got = np.asarray(develop(jnp.asarray(img), jax.tree.map(jnp.asarray, params), cfg))

    g = params["glob"]
    p = {
        k: float(g[k])
        for k in (
            "exposure", "brightness", "contrast", "highlights", "shadows",
            "whites", "blacks", "saturation", "vibrance", "temperature",
            "tint", "hue", "sharpness", "sharpness_threshold", "clarity",
            "structure", "centre", "dehaze", "glow", "halation", "luma_nr",
            "color_nr", "ca_rc", "ca_by", "vignette_amount",
            "vignette_midpoint", "vignette_roundness", "vignette_feather",
            "grain_amount", "grain_size", "grain_roughness",
            "cg_blending", "cg_balance",
        )
    }
    p["calibration"] = np.asarray(g["calibration"], np.float32)
    p["hsl"] = np.asarray(g["hsl"], np.float32)
    p["cg"] = np.asarray(g["cg"], np.float32)
    p["curves"] = _doc_curves(doc)

    want = oracle.develop_image(
        img, p, is_raw=False, tonemapper=tonemapper,
        agx_p2r=np.asarray(g["agx_p2r"], np.float32),
        agx_r2p=np.asarray(g["agx_r2p"], np.float32),
        nr_jitter=False,
    )
    return got, want


def test_full_chain_agx():
    got, want = _run_chain("agx")
    diff = np.abs(got - want)
    assert diff.max() <= 1e-3, f"max |delta| = {diff.max():.2e} (budget 1e-3)"


def test_full_chain_basic():
    got, want = _run_chain("basic")
    diff = np.abs(got - want)
    assert diff.max() <= 1e-3, f"max |delta| = {diff.max():.2e} (budget 1e-3)"
