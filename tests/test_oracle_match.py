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


# ---------------------------------------------------------------------------
# round 2: oracle coverage of the remaining stages (VERDICT.md Missing #4)
# ---------------------------------------------------------------------------

from rapidraw_tpu.ops import ca as ca_ops
from rapidraw_tpu.ops import grain as grain_ops
from rapidraw_tpu.ops import local as local_ops
from rapidraw_tpu.ops import nr as nr_ops
from rapidraw_tpu.ops.blur import gaussian_blur
from rapidraw_tpu.pipeline.grade import apply_vignette


def test_white_balance_matches():
    px = _pixels(128)
    for temp, tint in [(0.3, -0.2), (-0.5, 0.4)]:
        got = np.asarray(color_ops.apply_white_balance(px.T, np.float32(temp), np.float32(tint))).T
        want = np.stack([oracle.apply_white_balance(p, temp, tint) for p in px])
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_calibration_matches():
    px = _pixels(128)
    for cal in [(0.2, 0.1, -0.3, -0.15, 0.25, 0.05, -0.2), (-0.4, 0.0, 0.5, 0.3, 0.0, -0.1, 0.1)]:
        got = np.asarray(
            color_ops.apply_color_calibration(px.T, np.asarray(cal, np.float32))
        ).T
        want = np.stack([oracle.apply_color_calibration(p, cal) for p in px])
        np.testing.assert_allclose(got, want, atol=1e-4)


def test_local_contrast_matches():
    px = _pixels(96, 0.0, 1.3)
    blur = np.clip(px + (RNG.random((96, 3)).astype(np.float32) - 0.5) * 0.2, 0.0, 1.3)
    for amount, mode, thr in [(0.5, 0, 0.1), (-0.4, 0, 0.0), (0.7, 1, 0.0), (-0.6, 1, 0.0)]:
        got = np.asarray(
            local_ops.apply_local_contrast(px.T, blur.T, np.float32(amount), False, mode, np.float32(thr))
        ).T
        want = np.stack(
            [oracle.apply_local_contrast(p, b, amount, False, mode, thr) for p, b in zip(px, blur)]
        )
        np.testing.assert_allclose(got, want, atol=2e-4)


def test_dehaze_matches():
    px = _pixels(96)
    blur = np.clip(px + (RNG.random((96, 3)).astype(np.float32) - 0.5) * 0.1, 0.0, 1.0)
    for amount in (0.5, -0.4):
        got = np.asarray(local_ops.apply_dehaze(px.T, blur.T, False, np.float32(amount))).T
        want = np.stack([oracle.apply_dehaze(p, b, False, amount) for p, b in zip(px, blur)])
        np.testing.assert_allclose(got, want, atol=2e-4)


def test_glow_matches():
    px = _pixels(96, 0.0, 1.5)
    blur = _pixels(96, 0.0, 1.2)
    got = np.asarray(
        local_ops.apply_glow_bloom(px.T, blur.T, np.float32(0.6), False,
                                   np.float32(0.2), np.float32(0.1), np.float32(0.0), np.float32(0.1))
    ).T
    want = np.stack(
        [oracle.apply_glow_bloom(p, b, 0.6, False, 0.2, 0.1, 0.0, 0.1) for p, b in zip(px, blur)]
    )
    np.testing.assert_allclose(got, want, atol=3e-4)


def test_halation_matches():
    px = _pixels(96, 0.0, 1.5)
    blur = _pixels(96, 0.0, 1.5)
    got = np.asarray(
        local_ops.apply_halation(px.T, blur.T, np.float32(0.5), False,
                                 np.float32(0.0), np.float32(0.0), np.float32(0.0), np.float32(0.0))
    ).T
    want = np.stack(
        [oracle.apply_halation(p, b, 0.5, False, 0.0, 0.0, 0.0, 0.0) for p, b in zip(px, blur)]
    )
    np.testing.assert_allclose(got, want, atol=3e-4)


def _coord_grids(h, w):
    import jax.numpy as jnp

    ys = jnp.arange(h, dtype=jnp.float32)[:, None] * jnp.ones((1, w), jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)[None, :] * jnp.ones((h, 1), jnp.float32)
    return xs, ys


def test_centre_matches():
    h, w = 12, 16
    img = RNG.random((3, h, w), dtype=np.float32)
    blur = RNG.random((3, h, w), dtype=np.float32)
    for amount in (0.6, -0.5):
        got = np.asarray(
            local_ops.apply_centre_local_contrast(img, np.float32(amount), blur, False)
        )
        got2 = np.asarray(local_ops.apply_centre_tonal_and_color(got, np.float32(amount)))
        want = np.empty_like(img)
        for y in range(h):
            for x in range(w):
                c = oracle.apply_centre_local_contrast(
                    img[:, y, x], amount, (x, y), (float(w), float(h)), blur[:, y, x], False
                )
                want[:, y, x] = oracle.apply_centre_tonal_and_color(
                    c, amount, (x, y), (float(w), float(h))
                )
        np.testing.assert_allclose(got2, want, atol=3e-4)


def test_vignette_matches():
    h, w = 12, 16
    img = RNG.random((3, h, w), dtype=np.float32)
    xs, ys = _coord_grids(h, w)
    for amount in (-0.6, 0.5):
        got = np.asarray(apply_vignette(img, xs, ys, w, h, np.float32(amount),
                                        np.float32(0.4), np.float32(0.2), np.float32(0.6)))
        want = np.empty_like(img)
        for y in range(h):
            for x in range(w):
                want[:, y, x] = oracle.apply_vignette(
                    img[:, y, x], (x, y), (float(w), float(h)), amount, 0.4, 0.2, 0.6
                )
        np.testing.assert_allclose(got, want, atol=2e-4)


def test_grain_and_dither_match():
    h, w = 12, 16
    img = RNG.random((3, h, w), dtype=np.float32)
    got = np.asarray(grain_ops.apply_grain(img, np.float32(0.5), np.float32(1.2),
                                           np.float32(0.4), 0.1))
    want = np.empty_like(img)
    for y in range(h):
        for x in range(w):
            want[:, y, x] = oracle.apply_grain(img[:, y, x], (float(x), float(y)),
                                               0.5, 1.2, 0.4, 0.1)
    np.testing.assert_allclose(got, want, atol=1e-5)
    # dither: strict-f32 hash agreement
    dither = np.asarray(grain_ops.dither_pattern(h, w))
    for y in range(0, h, 3):
        for x in range(0, w, 3):
            assert abs(dither[y, x] - (oracle.hash2(float(x), float(y)) - 0.5)) < 1e-6


def test_ca_matches():
    h, w = 14, 18
    img = RNG.random((3, h, w), dtype=np.float32)
    for rc, by in [(0.02, -0.015), (-0.01, 0.03)]:
        want = oracle.apply_ca_correction(img, rc, by)
        got_static = np.asarray(ca_ops.apply_ca_correction(img, rc, by, static_rc=rc, static_by=by))
        got_dyn = np.asarray(ca_ops.apply_ca_correction(img, np.float32(rc), np.float32(by)))
        np.testing.assert_allclose(got_static, want, atol=1e-6)
        np.testing.assert_allclose(got_dyn, want, atol=1e-6)


def test_blur_matches():
    h, w = 20, 24
    img = RNG.random((3, h, w), dtype=np.float32)
    for radius in (1, 3, 7):
        got = np.asarray(gaussian_blur(img, radius))
        want = oracle.gaussian_blur(img, radius)
        np.testing.assert_allclose(got, want, atol=5e-5)


def test_nr_matches_oracle():
    h, w = 12, 14
    img = RNG.random((3, h, w), dtype=np.float32)
    import jax.numpy as jnp

    from rapidraw_tpu.ops import colorspace as cs

    center_linear = np.asarray(cs.srgb_to_linear(jnp.asarray(img)))
    scale = 0.1
    for luma_a, color_a in [(0.6, 0.0), (0.0, 0.5), (0.7, 0.4)]:
        # static grid path vs oracle with jitter disabled
        got = np.asarray(
            nr_ops.apply_noise_reduction(
                jnp.asarray(center_linear), jnp.asarray(img), luma_a, color_a, scale,
                False, static_luma=luma_a, static_color=color_a,
            )
        )
        want = np.empty_like(img)
        for y in range(h):
            for x in range(w):
                want[:, y, x] = oracle.apply_noise_reduction(
                    center_linear[:, y, x], img, (x, y), luma_a, color_a, scale,
                    False, jitter=False,
                )
        np.testing.assert_allclose(got, want, atol=2e-4)


def test_nr_dynamic_jitter_matches_oracle():
    h, w = 10, 12
    img = RNG.random((3, h, w), dtype=np.float32)
    import jax.numpy as jnp

    from rapidraw_tpu.ops import colorspace as cs

    center_linear = np.asarray(cs.srgb_to_linear(jnp.asarray(img)))
    scale = 4096.0 / 1080.0  # high-res: stride > 1 -> jitter engaged
    luma_a, color_a = 0.8, 0.6
    got = np.asarray(
        nr_ops.apply_noise_reduction(
            jnp.asarray(center_linear), jnp.asarray(img),
            jnp.float32(luma_a), jnp.float32(color_a), scale, False,
        )
    )
    want = np.empty_like(img)
    for y in range(h):
        for x in range(w):
            want[:, y, x] = oracle.apply_noise_reduction(
                center_linear[:, y, x], img, (x, y), luma_a, color_a, scale,
                False, jitter=True,
            )
    np.testing.assert_allclose(got, want, atol=2e-4)
