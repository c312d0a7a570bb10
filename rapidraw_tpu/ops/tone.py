"""Tonal adjustments: exposure, filmic brightness, contrast/shadows/whites/
blacks, highlights, and the output tonemappers (AgX / basic / RAW emulation).

Ports of shader.wgsl:380-547 (tonal), :466-509 (highlights), :511-547
(exposure/filmic), :1107-1191 (AgX + legacy tonemap), :1664-1676 (RAW sRGB
emulation). Planar (3, H, W) layout; per-pixel parameter maps (H, W) are
supported everywhere (masked edits make the effective parameters spatially
varying, shader.wgsl:1498-1536) via broadcasting.
"""

from __future__ import annotations

import jax.numpy as jnp

from rapidraw_tpu.ops import colorspace as cs
from rapidraw_tpu.ops.common import (
    fpow,
    fpow_lt1,
    fpow_static,
    luma,
    mat3_apply,
    mix,
    smoothstep,
)
from rapidraw_tpu.params import agx as agx_c


def apply_linear_exposure(rgb: jnp.ndarray, exposure) -> jnp.ndarray:
    """rgb * 2^exposure, identity at 0 (shader.wgsl:511-516)."""
    out = rgb * jnp.exp2(exposure)
    return jnp.where(jnp.asarray(exposure) == 0.0, rgb, out)


def apply_filmic_exposure(rgb: jnp.ndarray, brightness) -> jnp.ndarray:
    """Luma-shaped midtone brightness with chroma rolloff (shader.wgsl:518-547)."""
    rational_curve_mix = 0.95
    midtone_strength = 1.2
    top_anchor = 1.06

    original_luma = luma(rgb)
    direct_adj = brightness * (1.0 - rational_curve_mix)
    rational_adj = brightness * rational_curve_mix
    scale = jnp.exp2(direct_adj)
    k = jnp.exp2(-rational_adj * midtone_strength)

    luma_abs = jnp.abs(original_luma)
    luma_floor = jnp.floor(luma_abs / top_anchor) * top_anchor
    luma_norm = (luma_abs - luma_floor) / top_anchor
    shaped_norm = luma_norm / (luma_norm + (1.0 - luma_norm) * k)
    shaped_luma_abs = luma_floor + shaped_norm * top_anchor
    new_luma = jnp.sign(original_luma) * shaped_luma_abs * scale

    chroma = rgb - original_luma
    safe_orig = jnp.where(jnp.abs(original_luma) < 1e-20, 1.0, original_luma)
    total_luma_scale = new_luma / safe_orig
    luma_weight = jnp.clip(new_luma, 0.0, 2.0) * 0.5
    dynamic_exp = mix(0.95, 0.65, luma_weight)
    # pow(negative, e) is undefined in WGSL; clamp the base at 0 instead of
    # propagating NaN (only reachable for negative-luma pixels).
    base_chroma_scale = fpow_lt1(jnp.maximum(total_luma_scale, 0.0), dynamic_exp)
    highlight_rolloff = 1.0 / (1.0 + jnp.maximum(0.0, new_luma - 0.9) * 2.0)
    chroma_scale = base_chroma_scale * highlight_rolloff

    out = new_luma + chroma * chroma_scale
    skip = (jnp.asarray(brightness) == 0.0) | (jnp.abs(original_luma) < 0.00001)
    return jnp.where(skip, rgb, out)


def get_shadow_mult(l, sh, bl):
    """Shadow/black lift multiplier (shader.wgsl:380-403). All args (...)."""
    safe_luma = jnp.maximum(l, 0.0001)
    mult = jnp.ones_like(safe_luma)

    # blacks: limit 0.05
    x = safe_luma / 0.05
    m = (1.0 - x) * (1.0 - x)
    factor = jnp.minimum(jnp.exp2(bl * 0.75), 3.9)
    bl_mult = mix(1.0, factor, m)
    mult = mult * jnp.where((bl != 0.0) & (safe_luma < 0.05), bl_mult, 1.0)

    # shadows: limit 0.1
    x = safe_luma / 0.1
    m = (1.0 - x) * (1.0 - x)
    factor = jnp.minimum(jnp.exp2(sh * 1.5), 3.9)
    sh_mult = mix(1.0, factor, m)
    mult = mult * jnp.where((sh != 0.0) & (safe_luma < 0.1), sh_mult, 1.0)
    return mult


def apply_tonal_adjustments(
    rgb: jnp.ndarray,
    blurred_input_space: jnp.ndarray,
    is_raw: bool,
    con,
    sh,
    wh,
    bl,
    blur_is_linear: bool = False,
    shadow_path: bool = True,
) -> jnp.ndarray:
    """Contrast / shadows / whites / blacks (shader.wgsl:405-464).

    `blurred_input_space` is the tonal blur-pyramid level in the *input*
    space (sRGB for LDR sources, linear for RAW) — or already linear when
    `blur_is_linear` (the pipeline pre-linearizes each level once).
    `shadow_path=False` statically compiles out the blur-consuming
    shadows/blacks block — correct when DevelopConfig.tonal_blur_needed is
    False (shadows and blacks are provably zero for every doc in the batch).
    """
    if is_raw or blur_is_linear:
        blurred_linear = blurred_input_space
    else:
        blurred_linear = cs.srgb_to_linear(blurred_input_space)

    white_level = 1.0 - wh * 0.25
    w_mult = 1.0 / jnp.maximum(white_level, 0.01)
    w_on = jnp.asarray(wh) != 0.0
    rgb = jnp.where(w_on, rgb * w_mult, rgb)

    if shadow_path:
        blurred_linear = jnp.where(w_on, blurred_linear * w_mult, blurred_linear)

        pixel_luma = luma(jnp.maximum(rgb, 0.0))
        blurred_luma = luma(jnp.maximum(blurred_linear, 0.0))
        safe_pixel_luma = jnp.maximum(pixel_luma, 0.0001)
        safe_blurred_luma = jnp.maximum(blurred_luma, 0.0001)

        perc_pixel = jnp.sqrt(safe_pixel_luma)
        perc_blurred = jnp.sqrt(safe_blurred_luma)
        halo_protection = smoothstep(0.05, 0.25, jnp.abs(perc_pixel - perc_blurred))

        spatial_mult = get_shadow_mult(safe_blurred_luma, sh, bl)
        pixel_mult = get_shadow_mult(safe_pixel_luma, sh, bl)
        final_mult = mix(spatial_mult, pixel_mult, halo_protection)
        sb_on = (jnp.asarray(sh) != 0.0) | (jnp.asarray(bl) != 0.0)
        rgb = jnp.where(sb_on, rgb * final_mult, rgb)

    # sigmoid contrast in gamma-2.2 perceptual space (shader.wgsl:449-462)
    g = 2.2
    safe_rgb = jnp.maximum(rgb, 0.0)
    perceptual = fpow_lt1(safe_rgb, 1.0 / g)
    clamped_perceptual = jnp.clip(perceptual, 0.0, 1.0)
    strength = jnp.exp2(con * 1.25)
    # one pow instead of two: both branches are 0.5*base^strength reflected
    lo = clamped_perceptual < 0.5
    base = jnp.where(lo, 2.0 * clamped_perceptual, 2.0 * (1.0 - clamped_perceptual))
    powed = 0.5 * fpow(base, strength)
    curved = jnp.where(lo, powed, 1.0 - powed)
    # g is static 2.2: x^2 * x^0.2, no Newton divide (fpow_static)
    contrast_adjusted = fpow_static(curved, g)
    mix_factor = smoothstep(1.0, 1.01, safe_rgb)
    contrasted = mix(contrast_adjusted, rgb, mix_factor)
    rgb = jnp.where(jnp.asarray(con) != 0.0, contrasted, rgb)
    return rgb


def apply_highlights(rgb: jnp.ndarray, highlights_adj) -> jnp.ndarray:
    """Highlight recovery / boost (shader.wgsl:466-509).

    (The shader signature also takes the tonal blur but never reads it.)
    """
    pixel_luma = luma(jnp.maximum(rgb, 0.0))
    safe_pixel_luma = jnp.maximum(pixel_luma, 0.0001)
    pixel_mask_input = jnp.tanh(safe_pixel_luma * 1.5)
    highlight_mask = smoothstep(0.3, 0.95, pixel_mask_input)

    l = pixel_luma
    # negative branch: gamma compress below 1.0, rational compress above
    gamma = 1.0 - highlights_adj * 1.75
    new_luma_lo = fpow(jnp.maximum(l, 0.0), gamma)
    luma_excess = l - 1.0
    compression_strength = -highlights_adj * 6.0
    compressed_excess = luma_excess / (1.0 + jnp.maximum(luma_excess, 0.0) * compression_strength)
    new_luma_hi = 1.0 + compressed_excess
    new_luma = jnp.where(l <= 1.0, new_luma_lo, new_luma_hi)
    tonally_adjusted = rgb * (new_luma / jnp.maximum(l, 0.0001))
    desat = smoothstep(1.0, 10.0, l)
    neg_result = mix(tonally_adjusted, new_luma, desat)

    # positive branch: plain gain
    factor = jnp.exp2(highlights_adj * 1.75)
    pos_result = rgb * factor

    adjusted = jnp.where(jnp.asarray(highlights_adj) < 0.0, neg_result, pos_result)
    out = mix(rgb, adjusted, highlight_mask)
    skip = (jnp.asarray(highlights_adj) == 0.0) | (highlight_mask < 0.001)
    return jnp.where(skip, rgb, out)


# ---------------------------------------------------------------------------
# Tonemappers
# ---------------------------------------------------------------------------


def _agx_sigmoid(x, power):
    return x / fpow(1.0 + fpow(jnp.maximum(x, 0.0), power), 1.0 / power)


def _agx_scaled_sigmoid(x, scale, slope, power, tx, ty):
    return scale * _agx_sigmoid(slope * (x - tx) / scale, power) + ty


def _agx_curve_channel_exact(x):
    """Piecewise toe/linear/shoulder curve (shader.wgsl:1125-1143) —
    the literal sigmoid formulas; reference implementation for tests."""
    toe = _agx_scaled_sigmoid(
        x,
        agx_c.AGX_TOE_SCALE,
        agx_c.AGX_SLOPE,
        agx_c.AGX_TOE_POWER,
        agx_c.AGX_TOE_TRANSITION_X,
        agx_c.AGX_TOE_TRANSITION_Y,
    )
    linear = agx_c.AGX_SLOPE * x + agx_c.AGX_INTERCEPT
    shoulder = _agx_scaled_sigmoid(
        x,
        agx_c.AGX_SHOULDER_SCALE,
        agx_c.AGX_SLOPE,
        agx_c.AGX_SHOULDER_POWER,
        agx_c.AGX_SHOULDER_TRANSITION_X,
        agx_c.AGX_SHOULDER_TRANSITION_Y,
    )
    result = jnp.where(
        x < agx_c.AGX_TOE_TRANSITION_X,
        toe,
        jnp.where(x <= agx_c.AGX_SHOULDER_TRANSITION_X, linear, shoulder),
    )
    return jnp.clip(result, 0.0, 1.0)


def _horner(u, coef):
    acc = coef[-1] * jnp.ones_like(u)
    for c in coef[-2::-1]:
        acc = acc * u + c
    return acc


def _agx_curve_channel(x):
    """Curve via the import-time branch polynomials (params/agx.py): each
    sigmoid branch is ~5 pow-class transcendentals on the VPU; the degree-10
    Horner forms (max |err| ~1.6e-6) are register-resident mul/adds."""
    tx = agx_c.AGX_TOE_TRANSITION_X
    t_coef, t_mid, t_inv_half = agx_c.AGX_TOE_POLY
    s_coef, s_mid, s_inv_half = agx_c.AGX_SHOULDER_POLY
    ut = (jnp.clip(x, agx_c.AGX_CURVE_M0, tx) - t_mid) * t_inv_half
    us = (jnp.clip(x, tx, agx_c.AGX_CURVE_M1) - s_mid) * s_inv_half
    result = jnp.where(x < tx, _horner(ut, t_coef), _horner(us, s_coef))
    return jnp.clip(result, 0.0, 1.0)


def agx_tonemap(rgb: jnp.ndarray, p2r: jnp.ndarray, r2p: jnp.ndarray) -> jnp.ndarray:
    """Full AgX transform (shader.wgsl:1145-1174): gamut compress -> rendering
    space -> log encode -> sigmoid -> gamma 2.4 -> back to pipe space."""
    min_c = jnp.min(rgb, axis=0)
    compressed = jnp.where(min_c < 0.0, rgb - min_c, rgb)
    in_agx = mat3_apply(p2r, compressed)
    x_rel = jnp.maximum(in_agx / 0.18, agx_c.AGX_EPSILON)
    log_encoded = (jnp.log2(x_rel) - agx_c.AGX_MIN_EV) / agx_c.AGX_RANGE_EV
    mapped = jnp.clip(log_encoded, 0.0, 1.0)
    curved = _agx_curve_channel(mapped)
    # AGX_GAMMA is static 2.4: x^2 * x^0.4, no Newton divide (fpow_static)
    final = fpow_static(jnp.maximum(curved, 0.0), agx_c.AGX_GAMMA)
    return mat3_apply(r2p, final)


def raw_srgb_emulation(rgb_linear: jnp.ndarray) -> jnp.ndarray:
    """RAW 'basic' tonemap path (shader.wgsl:1667-1673): sRGB encode, gamma
    1.1 brightness lift, 75% smoothstep contrast S-curve."""
    srgb = cs.linear_to_srgb(rgb_linear)
    srgb = fpow_lt1(jnp.maximum(srgb, 0.0), 1.0 / 1.1)
    contrast_curve = srgb * srgb * (3.0 - 2.0 * srgb)
    return mix(srgb, contrast_curve, 0.75)
