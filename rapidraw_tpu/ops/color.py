"""Color adjustments: white balance, saturation/vibrance, global hue shift,
HSL 8-band mixer, 3-way color grading, color calibration.

Ports of shader.wgsl:276-293 (hue shift + HSL influence), :549-626 (calibration,
WB, creative color), :628-717 (HSL panel, color grading). Planar (3, H, W).
"""

from __future__ import annotations

import jax.numpy as jnp

from rapidraw_tpu.ops import colorspace as cs
from rapidraw_tpu.ops.common import bcast3, luma, mix, smoothstep, wgsl_mod

# (center_degrees, width) per band: Red, Orange, Yellow, Green, Aqua, Blue,
# Purple, Magenta (shader.wgsl:186-195).
HSL_RANGES = (
    (358.0, 35.0),
    (25.0, 45.0),
    (60.0, 40.0),
    (115.0, 90.0),
    (180.0, 60.0),
    (225.0, 60.0),
    (280.0, 55.0),
    (330.0, 50.0),
)


def apply_white_balance(rgb: jnp.ndarray, temp, tint) -> jnp.ndarray:
    """Per-channel temperature/tint gains (shader.wgsl:587-593)."""
    t, n = temp, tint
    r = rgb[0] * ((1.0 + t * 0.2) * (1.0 + n * 0.25))
    g = rgb[1] * ((1.0 + t * 0.05) * (1.0 - n * 0.25))
    b = rgb[2] * ((1.0 - t * 0.2) * (1.0 + n * 0.25))
    return jnp.stack([r, g, b])


def apply_creative_color(rgb: jnp.ndarray, sat, vib) -> jnp.ndarray:
    """Saturation + selective vibrance with skin protection (shader.wgsl:595-626)."""
    l = luma(rgb)
    processed = jnp.where(jnp.asarray(sat) != 0.0, mix(l, rgb, 1.0 + sat), rgb)

    c_max = jnp.max(processed, axis=0)
    c_min = jnp.min(processed, axis=0)
    delta = c_max - c_min
    current_sat = delta / jnp.maximum(c_max, 0.001)

    # vibrance > 0: protect already-saturated regions and skin tones
    sat_mask = 1.0 - smoothstep(0.4, 0.9, current_sat)
    h, _, _ = cs.rgb_to_hsv(processed)
    hue_dist = jnp.minimum(jnp.abs(h - 25.0), 360.0 - jnp.abs(h - 25.0))
    is_skin = smoothstep(35.0, 10.0, hue_dist)
    skin_dampener = mix(1.0, 0.6, is_skin)
    amount_pos = vib * sat_mask * skin_dampener * 3.0

    # vibrance < 0: desaturate the unsaturated first
    desat_mask = 1.0 - smoothstep(0.2, 0.8, current_sat)
    amount_neg = vib * desat_mask

    # NB: the shader computes `luma` once from the *input* color and reuses
    # it for the vibrance mix (shader.wgsl:597,619,623).
    amount = jnp.where(vib > 0.0, amount_pos, amount_neg)
    vibed = mix(l, processed, 1.0 + amount)
    skip = (jnp.asarray(vib) == 0.0) | (delta < 0.02)
    return jnp.where(skip, processed, vibed)


def apply_hue_shift(rgb: jnp.ndarray, shift_degrees) -> jnp.ndarray:
    """Global hue rotation via extended-sRGB HSV (shader.wgsl:276-286)."""
    srgb = cs.linear_to_srgb_extended(rgb)
    h, s, v = cs.rgb_to_hsv(srgb)
    shifted_h = wgsl_mod(h + shift_degrees + 360.0, 360.0)
    shifted = cs.hsv_to_rgb(shifted_h, s, v)
    out = cs.srgb_to_linear(shifted)
    return jnp.where(jnp.abs(jnp.asarray(shift_degrees)) < 0.01, rgb, out)


def _raw_hsl_influence(hue, center, width):
    """Wrapped-gaussian band influence (shader.wgsl:288-293). `width` is a
    static table constant, so the divide folds into the host reciprocal."""
    dist = jnp.minimum(jnp.abs(hue - center), 360.0 - jnp.abs(hue - center))
    falloff = dist * (2.0 / width)
    return jnp.exp(-1.5 * falloff * falloff)


def apply_hsl_panel(
    rgb: jnp.ndarray,
    hsl: jnp.ndarray,
    mask_hsl: jnp.ndarray | None = None,
    mask_influence: jnp.ndarray | None = None,
    band_active: tuple | None = None,
) -> jnp.ndarray:
    """8-band hue/sat/luma mixer (shader.wgsl:628-684).

    Args:
      rgb: (3, ...) linear.
      hsl: (8, 3) global band params [hue, sat, lum].
      mask_hsl: optional (N, 8, 3) per-mask band params.
      mask_influence: optional (N, ...) influence maps.
      band_active: optional STATIC per-band activity
        (DevelopConfig.hsl_band_active, the doc's zero pattern union over
        global + mask params): a statically-zero band contributes exactly
        zero to the totals, so its contraction terms compile out. The
        influence normalizer still sums all 8 bands (shader semantics).

    The shader first sums global+mask band params per pixel then computes the
    3 weighted totals; both reductions are linear, so we contract the band
    weights against global and mask params separately and never materialize
    a per-pixel (8, 3) field.
    """
    safe = jnp.maximum(rgb, 0.0)
    h, s, v = cs.rgb_to_hsv(safe)
    original_luma = luma(safe)

    saturation_mask = smoothstep(0.05, 0.20, s)
    luminance_weight = smoothstep(0.0, 1.0, s)

    active = band_active if band_active is not None else (True,) * 8
    raw_inf = [_raw_hsl_influence(h, c, w) for c, w in HSL_RANGES]
    total_raw = raw_inf[0]
    for r in raw_inf[1:]:
        total_raw = total_raw + r
    inv_total = 1.0 / total_raw

    def totals(band_params):  # (8,3) -> three (...) maps
        th = ts = tl = 0.0
        for i in range(8):
            if not active[i]:
                continue  # statically zero params: terms are exactly 0
            ni = raw_inf[i] * inv_total
            th = th + band_params[i][0] * 2.0 * ni
            ts = ts + band_params[i][1] * ni
            tl = tl + band_params[i][2] * ni
        return th * saturation_mask, ts * saturation_mask, tl * luminance_weight

    total_hue, total_sat, total_lum = totals(hsl)
    if mask_hsl is not None:
        for n in range(len(mask_hsl)):
            mh, ms, ml = totals(mask_hsl[n])
            total_hue = total_hue + mask_influence[n] * mh
            total_sat = total_sat + mask_influence[n] * ms
            total_lum = total_lum + mask_influence[n] * ml

    new_sat_raw = s * (1.0 + total_sat)
    desat_val = original_luma * (1.0 + total_lum)

    new_h = wgsl_mod(h + total_hue + 360.0, 360.0)
    new_s = jnp.clip(new_sat_raw, 0.0, 1.0)
    hs_shifted = cs.hsv_to_rgb(new_h, new_s, v)
    new_luma = luma(hs_shifted)
    target_luma = original_luma * (1.0 + total_lum)
    scaled = hs_shifted * (target_luma / jnp.where(new_luma < 0.0001, 1.0, new_luma))
    result = jnp.where(new_luma < 0.0001, jnp.maximum(0.0, target_luma), scaled)
    result = jnp.where(new_sat_raw < 0.0001, desat_val, result)

    # early-outs (shader.wgsl:630-641): near-gray pixels and zero weights
    gray = (jnp.abs(safe[0] - safe[1]) < 0.001) & (jnp.abs(safe[1] - safe[2]) < 0.001)
    zero_w = (saturation_mask < 0.001) & (luminance_weight < 0.001)
    return jnp.where(gray | zero_w, safe, result)


def apply_color_grading(rgb: jnp.ndarray, cg: jnp.ndarray, blending, balance) -> jnp.ndarray:
    """3-way (+global) additive color grading (shader.wgsl:686-717).

    cg: (4, 3) rows = shadows, midtones, highlights, global of [hue, sat, lum].
    """
    l = luma(jnp.maximum(rgb, 0.0))
    shadow_crossover = 0.1 + jnp.maximum(0.0, -balance) * 0.5
    highlight_crossover = 0.5 - jnp.maximum(0.0, balance) * 0.5
    feather = 0.2 * blending
    final_shadow_crossover = jnp.minimum(shadow_crossover, highlight_crossover - 0.01)
    shadow_mask = 1.0 - smoothstep(
        final_shadow_crossover - feather, final_shadow_crossover + feather, l
    )
    highlight_mask = smoothstep(highlight_crossover - feather, highlight_crossover + feather, l)
    midtone_mask = jnp.maximum(0.0, 1.0 - shadow_mask - highlight_mask)

    strengths = ((0.3, 0.5), (0.6, 0.8), (0.8, 1.0), (1.0, 1.0))
    masks = (shadow_mask, midtone_mask, highlight_mask, jnp.ones_like(l))
    graded = rgb
    for i, ((sat_str, lum_str), m) in enumerate(zip(strengths, masks)):
        hue, sat, lum = cg[i][0], cg[i][1], cg[i][2]
        one = jnp.ones_like(jnp.asarray(hue))
        # channel tuple (not a stacked (3,) vector): hue/sat are scalars and
        # Mosaic rejects tiny 1-D vectors inside the fused kernel
        tr, tg, tb = cs.hsv_to_rgb_channels(hue, one, one)
        amt = (sat * sat_str) * m
        contrib = jnp.stack([(tr - 0.5) * amt, (tg - 0.5) * amt, (tb - 0.5) * amt])
        graded = graded + jnp.where(sat > 0.001, contrib, 0.0)
        graded = graded + (lum * lum_str) * m
    return graded


def apply_color_calibration(rgb: jnp.ndarray, cal: jnp.ndarray) -> jnp.ndarray:
    """Primary-hue skew + per-primary saturation + shadow tint
    (shader.wgsl:549-585). cal: (7,) = [shadows_tint, r_hue, r_sat, g_hue,
    g_sat, b_hue, b_sat]."""
    st, h_r, s_r, h_g, s_g, h_b, s_b = (cal[i] for i in range(7))
    st = jnp.asarray(st)
    zero = jnp.zeros(())
    h_r, h_g, h_b = jnp.asarray(h_r), jnp.asarray(h_g), jnp.asarray(h_b)
    r_prime = (1.0 - jnp.abs(h_r), jnp.maximum(zero, h_r), jnp.maximum(zero, -h_r))
    g_prime = (jnp.maximum(zero, -h_g), 1.0 - jnp.abs(h_g), jnp.maximum(zero, h_g))
    b_prime = (jnp.maximum(zero, h_b), jnp.maximum(zero, -h_b), 1.0 - jnp.abs(h_b))
    # WGSL mat3x3<f32>(c0,c1,c2) * v = sum_j v[j] * col_j
    c = jnp.stack(
        [
            r_prime[0] * rgb[0] + g_prime[0] * rgb[1] + b_prime[0] * rgb[2],
            r_prime[1] * rgb[0] + g_prime[1] * rgb[1] + b_prime[1] * rgb[2],
            r_prime[2] * rgb[0] + g_prime[2] * rgb[1] + b_prime[2] * rgb[2],
        ]
    )

    l = luma(jnp.maximum(c, 0.0))
    sat_vector = c - l
    color_sum = jnp.sum(c, axis=0)
    masks = jnp.where(color_sum > 0.001, c / jnp.where(color_sum == 0.0, 1.0, color_sum), 0.0)
    total_sat_adj = masks[0] * s_r + masks[1] * s_g + masks[2] * s_b
    c = c + sat_vector * total_sat_adj

    shadow_luma = luma(jnp.maximum(c, 0.0))
    m = 1.0 - smoothstep(0.0, 0.3, shadow_luma)
    # per-channel scalar gains (no (3,) vector: Mosaic-incompatible)
    tinted = jnp.stack(
        [
            mix(c[0], c[0] * (1.0 + st * 0.25), m),
            mix(c[1], c[1] * (1.0 - st * 0.25), m),
            mix(c[2], c[2] * (1.0 + st * 0.25), m),
        ]
    )
    c = jnp.where(jnp.abs(st) > 0.001, tinted, c)
    return c
