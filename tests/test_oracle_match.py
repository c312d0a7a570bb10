"""Golden tests: vectorized JAX ops vs the scalar NumPy oracle."""

import numpy as np
import pytest

import oracle

from rapidraw_tpu.ops import color as color_ops
from rapidraw_tpu.ops import colorspace as cs
from rapidraw_tpu.ops import curves as curve_ops
from rapidraw_tpu.ops import tone as tone_ops
from rapidraw_tpu.params.agx import AGX_PIPE_TO_RENDERING, AGX_RENDERING_TO_PIPE
from rapidraw_tpu.params.curves import bake_curve_set

RNG = np.random.default_rng(7)
TOL = 2e-5


def _pixels(n=256, lo=0.0, hi=1.0):
    # oracle iterates rows of (n, 3); jnp ops take planar (3, n)
    return (RNG.random((n, 3)) * (hi - lo) + lo).astype(np.float32)


def test_srgb_roundtrip_matches():
    px = _pixels()
    got = np.asarray(cs.srgb_to_linear(px.T)).T
    want = oracle.srgb_to_linear(px)
    np.testing.assert_allclose(got, want, atol=TOL)
    got2 = np.asarray(cs.linear_to_srgb(got.T)).T
    np.testing.assert_allclose(got2, oracle.linear_to_srgb(want), atol=TOL)


def test_hsv_roundtrip_matches():
    px = _pixels()
    h, s, v = (np.asarray(x) for x in cs.rgb_to_hsv(px.T))
    back = np.asarray(cs.hsv_to_rgb(h, s, v)).T
    for i in range(64):
        want = oracle.rgb_to_hsv(px[i])
        np.testing.assert_allclose([h[i], s[i], v[i]], want, atol=1e-3)
        np.testing.assert_allclose(back[i], oracle.hsv_to_rgb(want), atol=1e-3)


@pytest.mark.parametrize(
    "points",
    [
        [(0, 0), (255, 255)],
        [(0, 30), (64, 50), (128, 140), (200, 220), (255, 240)],
        [(0, 0), (60, 20), (128, 170), (255, 255)],
        [(10, 0), (128, 255), (250, 10)],  # non-monotone
    ],
)
def test_curve_matches_oracle(points):
    seg_set = bake_curve_set(
        {
            "luma": [{"x": float(x), "y": float(y)} for x, y in points],
            "red": [{"x": 0, "y": 0}, {"x": 255, "y": 255}],
            "green": [{"x": 0, "y": 0}, {"x": 255, "y": 255}],
            "blue": [{"x": 0, "y": 0}, {"x": 255, "y": 255}],
        }
    )
    vals = np.linspace(-0.05, 1.05, 400).astype(np.float32)
    got = np.asarray(
        curve_ops.eval_curve(vals, seg_set["seg"][0], seg_set["ends"][0], seg_set["enabled"][0])
    )
    want = np.array([oracle.apply_curve(float(v), points) for v in vals], np.float32)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_filmic_exposure_matches():
    px = _pixels(128, 0.0, 2.0)
    for b in (-1.2, -0.3, 0.4, 1.5):
        got = np.asarray(tone_ops.apply_filmic_exposure(px.T, np.float32(b))).T
        want = np.stack([oracle.apply_filmic_exposure(p, b) for p in px])
        np.testing.assert_allclose(got, want, atol=1e-4)


def test_tonal_matches():
    px = _pixels(64, 0.0, 1.5)
    blur = _pixels(64, 0.0, 1.0)
    for con, sh, wh, bl in [(0.4, 0, 0, 0), (0, 0.5, 0, 0), (0, 0, 0.3, -0.4), (-0.5, 0.2, -0.2, 0.3)]:
        got = np.asarray(
            tone_ops.apply_tonal_adjustments(px.T, blur.T, False, np.float32(con), np.float32(sh), np.float32(wh), np.float32(bl)).T
        )
        want = np.stack([oracle.apply_tonal(p, b, False, con, sh, wh, bl) for p, b in zip(px, blur)])
        np.testing.assert_allclose(got, want, atol=1e-4)


def test_highlights_matches():
    px = _pixels(128, 0.0, 3.0)
    for adj in (-0.8, -0.2, 0.3, 0.9):
        got = np.asarray(tone_ops.apply_highlights(px.T, np.float32(adj))).T
        want = np.stack([oracle.apply_highlights(p, adj) for p in px])
        # oracle runs in f64; f32 pow/exp differ in the last few ulps
        np.testing.assert_allclose(got, want, rtol=3e-5, atol=1e-4)


def test_creative_color_matches():
    px = _pixels(128)
    for sat, vib in [(0.3, 0.0), (0.0, 0.5), (-0.2, -0.4), (0.5, 0.8)]:
        got = np.asarray(color_ops.apply_creative_color(px.T, np.float32(sat), np.float32(vib))).T
        want = np.stack([oracle.apply_creative_color(p, sat, vib) for p in px])
        np.testing.assert_allclose(got, want, atol=1e-4)


def test_hsl_panel_matches():
    px = _pixels(128)
    hsl = (RNG.random((8, 3), dtype=np.float32) - 0.5) * np.array([30.0, 0.6, 0.6], np.float32)
    got = np.asarray(color_ops.apply_hsl_panel(px.T, hsl.astype(np.float32))).T
    want = np.stack([oracle.apply_hsl_panel(p, hsl) for p in px])
    np.testing.assert_allclose(got, want, atol=2e-3)  # hue-sector edges


def test_color_grading_matches():
    px = _pixels(128)
    cg = np.array(
        [[220.0, 0.06, 0.01], [120.0, 0.04, -0.02], [40.0, 0.08, 0.0], [0.0, 0.02, 0.01]],
        np.float32,
    )
    got = np.asarray(color_ops.apply_color_grading(px.T, cg, np.float32(0.6), np.float32(0.1))).T
    want = np.stack([oracle.apply_color_grading(p, cg, 0.6, 0.1) for p in px])
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_agx_matches():
    px = _pixels(128, -0.1, 4.0)
    got = np.asarray(tone_ops.agx_tonemap(px.T, AGX_PIPE_TO_RENDERING, AGX_RENDERING_TO_PIPE)).T
    want = np.stack(
        [oracle.agx_tonemap(p, AGX_PIPE_TO_RENDERING, AGX_RENDERING_TO_PIPE) for p in px]
    )
    np.testing.assert_allclose(got, want, atol=1e-4)
