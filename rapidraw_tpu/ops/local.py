"""Blur-pyramid-driven local ops: sharpen/clarity/structure local contrast,
centre effect, dehaze, glow/bloom, halation.

Ports of shader.wgsl:719-887 (local contrast, centre, dehaze) and
:1313-1436 (glow, halation). All take the relevant blur-pyramid level in
*input space* (sRGB for LDR, linear for RAW) exactly as the shader binds
them (gpu_processing.rs:1402-1405, 1447-1478). Planar (3, H, W) layout.
"""

from __future__ import annotations

import jax.numpy as jnp

from rapidraw_tpu.ops import colorspace as cs
from rapidraw_tpu.ops import tone
from rapidraw_tpu.ops.common import bcast3, fpow, fpow_lt1, luma, mix, smoothstep


def _blur_to_linear(
    blurred_input_space: jnp.ndarray, is_raw: bool, blur_is_linear: bool = False
) -> jnp.ndarray:
    if is_raw or blur_is_linear:
        return blurred_input_space
    return cs.srgb_to_linear(blurred_input_space)


def apply_local_contrast(
    rgb: jnp.ndarray,
    blurred_input_space: jnp.ndarray,
    amount,
    is_raw: bool,
    mode: int,
    threshold,
    blur_is_linear: bool = False,
) -> jnp.ndarray:
    """Log-ratio local contrast (shader.wgsl:719-778).

    mode 0 = sharpness (edge-masked, threshold knob); mode 1 = clarity /
    structure (plain log-ratio gain). Negative amounts blend toward the blur.
    """
    blurred_linear = _blur_to_linear(blurred_input_space, is_raw, blur_is_linear)

    # negative branch: blur blend
    blur_amount = -amount * (0.5 if mode == 0 else 1.0)
    neg_result = mix(rgb, blurred_linear, blur_amount)

    # positive branch
    center_luma = luma(rgb)
    shadow_threshold = 0.1 if is_raw else 0.03
    shadow_protection = smoothstep(0.0, shadow_threshold, center_luma)
    highlight_protection = 1.0 - smoothstep(0.9, 1.0, center_luma)
    midtone_mask = shadow_protection * highlight_protection

    blurred_luma = luma(blurred_linear)
    safe_center = jnp.maximum(center_luma, 0.0001)
    safe_blurred = jnp.maximum(blurred_luma, 0.0001)
    log_ratio = jnp.log2(safe_center / safe_blurred)

    if mode == 0:
        edge_magnitude = jnp.abs(log_ratio)
        normalized_edge = jnp.clip(edge_magnitude / 3.0, 0.0, 1.0)
        edge_dampener = 1.0 - jnp.sqrt(normalized_edge)
        edge_mask = smoothstep(threshold * 0.5, threshold * 1.5, edge_magnitude)
        effective_amount = amount * edge_dampener * edge_mask * 0.8
    else:
        effective_amount = amount * jnp.ones_like(log_ratio)

    contrast_factor = jnp.exp2(log_ratio * effective_amount)
    boosted = rgb * contrast_factor
    pos_result = mix(rgb, boosted, midtone_mask)
    pos_result = jnp.where(midtone_mask < 0.001, rgb, pos_result)

    out = jnp.where(jnp.asarray(amount) < 0.0, neg_result, pos_result)
    return jnp.where(jnp.asarray(amount) == 0.0, rgb, out)


def centre_mask_from_coords(xs: jnp.ndarray, ys: jnp.ndarray, w_full: int, h_full: int) -> jnp.ndarray:
    """Radial centre weight (shader.wgsl:790-798) from absolute pixel
    coordinate maps — tile-safe (full dims + absolute coords)."""
    un = (xs / w_full - 0.5) * 2.0
    vn = (ys / h_full - 0.5) * 2.0
    aspect = h_full / w_full
    d = jnp.sqrt(un * un + (vn * aspect) ** 2) * 0.5
    vignette_mask = smoothstep(0.4 - 0.375, 0.4 + 0.375, d)
    return 1.0 - vignette_mask


def _centre_mask(shape_hw: tuple[int, int]) -> jnp.ndarray:
    h, w = shape_hw
    ys = jnp.arange(h, dtype=jnp.float32)[:, None] * jnp.ones((1, w), jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)[None, :] * jnp.ones((h, 1), jnp.float32)
    return centre_mask_from_coords(xs, ys, w, h)


def apply_centre_local_contrast(
    rgb: jnp.ndarray,
    centre_amount,
    blurred_input_space: jnp.ndarray,
    is_raw: bool,
    blur_is_linear: bool = False,
    centre_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Centre-weighted clarity (shader.wgsl:780-809). Uses the clarity blur."""
    if centre_mask is None:
        centre_mask = _centre_mask(rgb.shape[-2:])
    clarity_strength = centre_amount * (2.0 * centre_mask - 1.0) * 0.9
    out = apply_local_contrast(
        rgb, blurred_input_space, clarity_strength, is_raw, 1, 0.0, blur_is_linear
    )
    out = jnp.where(jnp.abs(clarity_strength) > 0.001, out, rgb)
    return jnp.where(jnp.asarray(centre_amount) == 0.0, rgb, out)


def apply_centre_tonal_and_color(
    rgb: jnp.ndarray, centre_amount, centre_mask: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Centre-weighted exposure/vibrance/saturation (shader.wgsl:811-846)."""
    if centre_mask is None:
        centre_mask = _centre_mask(rgb.shape[-2:])
    exposure_boost = centre_mask * centre_amount * 0.5
    out = tone.apply_filmic_exposure(rgb, exposure_boost)
    vib_boost = centre_mask * centre_amount * 0.4
    sat_centre = centre_mask * centre_amount * 0.3
    sat_edge = -(1.0 - centre_mask) * centre_amount * 0.8
    from rapidraw_tpu.ops.color import apply_creative_color

    out = apply_creative_color(out, sat_centre + sat_edge, vib_boost)
    return jnp.where(jnp.asarray(centre_amount) == 0.0, rgb, out)


def apply_dehaze(
    rgb: jnp.ndarray,
    blurred_input_space: jnp.ndarray,
    is_raw: bool,
    amount,
    blur_is_linear: bool = False,
) -> jnp.ndarray:
    """Dark-channel-prior dehaze / haze add (shader.wgsl:848-887).

    Uses the structure blur as the regional dark-channel estimate.
    """
    blurred_linear = _blur_to_linear(blurred_input_space, is_raw, blur_is_linear)
    atmospheric_light = bcast3((0.95, 0.97, 1.0), rgb)

    # positive: remove haze
    pixel_dark = jnp.min(rgb, axis=0)
    regional_dark = jnp.min(blurred_linear, axis=0)
    pixel_luma = luma(jnp.maximum(rgb, 0.0))
    blurred_luma = luma(jnp.maximum(blurred_linear, 0.0))
    edge_diff = jnp.abs(
        jnp.sqrt(jnp.maximum(pixel_luma, 0.0)) - jnp.sqrt(jnp.maximum(blurred_luma, 0.0))
    )
    halo_protection = smoothstep(0.02, 0.15, edge_diff)
    spatial_dark = mix(regional_dark, pixel_dark, halo_protection)
    safe_dark = jnp.maximum(spatial_dark - 0.02, 0.0)
    mapped_haze = safe_dark / (safe_dark + 0.2)
    t = jnp.maximum(1.0 - amount * mapped_haze * 0.85, 0.15)
    recovered = (rgb - atmospheric_light) / t + atmospheric_light
    rec_luma = luma(jnp.maximum(recovered, 0.0))
    shadow_lift = smoothstep(0.1, 0.0, rec_luma) * (1.0 - t) * 0.15
    recovered = recovered + shadow_lift
    sat_boost = (1.0 - t) * 0.5
    final_luma = luma(jnp.maximum(recovered, 0.0))
    recovered = mix(final_luma, recovered, 1.0 + sat_boost)
    pos_result = jnp.maximum(recovered, 0.0)

    # negative: add atmospheric haze, deeper where the scene is bright/far
    safe_dark_n = jnp.maximum(regional_dark - 0.02, 0.0)
    mapped_depth = safe_dark_n / (safe_dark_n + 0.2)
    depth_factor = mix(0.4, 1.0, mapped_depth)
    neg_result = mix(rgb, atmospheric_light, jnp.abs(amount) * 0.7 * depth_factor)

    out = jnp.where(jnp.asarray(amount) > 0.0, pos_result, neg_result)
    return jnp.where(jnp.asarray(amount) == 0.0, rgb, out)


def _perceptual_luma(linear_luma: jnp.ndarray) -> jnp.ndarray:
    """Gamma-2.2 with linear extension above 1.0 (shader.wgsl:1337-1343)."""
    lo = fpow_lt1(jnp.maximum(linear_luma, 0.0), 1.0 / 2.2)
    hi = 1.0 + fpow_lt1(jnp.maximum(linear_luma - 1.0, 0.0), 1.0 / 2.2)
    return jnp.where(linear_luma <= 1.0, lo, hi)


def _graded_blur_luma(
    blurred_input_space: jnp.ndarray, is_raw: bool, exp, bright, wh,
    blur_is_linear: bool = False,
) -> jnp.ndarray:
    """Shared glow/halation source: the blur level pushed through the same
    exposure/brightness/whites chain as the main pixel (shader.wgsl:1324-1335)."""
    blurred_linear = _blur_to_linear(blurred_input_space, is_raw, blur_is_linear)
    blurred_linear = tone.apply_linear_exposure(blurred_linear, exp)
    blurred_linear = tone.apply_filmic_exposure(blurred_linear, bright)
    # NB: the shader passes the raw blur texture here and re-linearizes; the
    # value is identical, so we hand over the linear copy directly.
    blurred_linear = tone.apply_tonal_adjustments(
        blurred_linear, blurred_linear, is_raw, 0.0, 0.0, wh, 0.0, blur_is_linear=True
    )
    return blurred_linear


def apply_glow_bloom(
    rgb: jnp.ndarray,
    blurred_input_space: jnp.ndarray,
    amount,
    is_raw: bool,
    exp,
    bright,
    con,
    wh,
    blur_is_linear: bool = False,
) -> jnp.ndarray:
    """Soft bloom from the structure blur (shader.wgsl:1313-1381)."""
    del con  # shader receives but never uses contrast here
    blurred_linear = _graded_blur_luma(
        blurred_input_space, is_raw, exp, bright, wh, blur_is_linear
    )
    linear_luma = luma(jnp.maximum(blurred_linear, 0.0))
    perceptual_luma = _perceptual_luma(linear_luma)

    luma_cutoff = mix(0.75, 0.08, jnp.clip(amount, 0.0, 1.0))
    cutoff_fade = smoothstep(luma_cutoff, luma_cutoff + 0.15, perceptual_luma)
    excess = jnp.maximum(perceptual_luma - luma_cutoff, 0.0)
    bloom_intensity = fpow_lt1(smoothstep(0.0, 1.0, excess / 5.5), 0.45)

    color_ratio = blurred_linear / jnp.where(linear_luma > 0.01, linear_luma, 1.0)
    warm = bcast3((1.03, 1.0, 0.97), rgb)
    dark_default = bcast3((1.0, 0.99, 0.98), rgb)
    bloom_color = jnp.where(linear_luma > 0.01, color_ratio * warm, dark_default)

    luma_factor = fpow_lt1(jnp.maximum(linear_luma, 0.0), 0.6)
    black_gate = jnp.sqrt(smoothstep(0.0, 0.5, linear_luma))
    bloom_color = bloom_color * (bloom_intensity * luma_factor * cutoff_fade * black_gate)

    current_luma = luma(jnp.maximum(rgb, 0.0))
    protection = 1.0 - smoothstep(1.0, 2.2, current_luma)
    out = rgb + bloom_color * (jnp.asarray(amount) * 3.8 * protection)
    return jnp.where(jnp.asarray(amount) <= 0.0, rgb, out)


def apply_halation(
    rgb: jnp.ndarray,
    blurred_input_space: jnp.ndarray,
    amount,
    is_raw: bool,
    exp,
    bright,
    con,
    wh,
    blur_is_linear: bool = False,
) -> jnp.ndarray:
    """Red-orange film halation from the clarity blur (shader.wgsl:1383-1436)."""
    del con
    blurred_linear = _graded_blur_luma(
        blurred_input_space, is_raw, exp, bright, wh, blur_is_linear
    )
    linear_luma = luma(jnp.maximum(blurred_linear, 0.0))
    perceptual_luma = _perceptual_luma(linear_luma)

    luma_cutoff = mix(0.85, 0.1, jnp.clip(amount, 0.0, 1.0))
    excess = perceptual_luma - luma_cutoff
    rng = jnp.maximum(1.5 - luma_cutoff, 0.1)
    halation_mask = smoothstep(0.0, rng * 0.6, excess)

    core = bcast3((1.0, 0.15, 0.03), rgb)
    fringe = bcast3((1.0, 0.32, 0.10), rgb)
    intensity_blend = smoothstep(0.0, 0.7, halation_mask)
    halation_tint = mix(fringe, core, intensity_blend)
    glow_intensity = halation_mask * linear_luma
    halation_glow = halation_tint * glow_intensity

    color_luma = luma(jnp.maximum(rgb, 0.0))
    desat_strength = halation_mask * 0.12
    affected = mix(rgb, color_luma, desat_strength)
    contrast_reduced = mix(0.5, affected, 1.0 - halation_mask * 0.06)
    out = contrast_reduced + halation_glow * jnp.asarray(amount) * 2.5

    skip = (jnp.asarray(amount) <= 0.0) | (perceptual_luma <= luma_cutoff)
    return jnp.where(skip, rgb, out)
