"""The per-pixel grade chain — shared by the XLA path (pipeline.develop)
and the fused Pallas megakernel (pipeline.fused).

Everything here is pure elementwise math over planar (3, ...) tiles plus
small parameter arrays; spatially-dependent stages (centre, vignette,
grain, dither) take absolute pixel-coordinate maps so the same code runs
on full images and on kernel tiles. Stage order is shader.wgsl main
(:1555-1732) between noise reduction and the 3D LUT.
"""

from __future__ import annotations

import jax.numpy as jnp

from rapidraw_tpu.ops import color as color_ops
from rapidraw_tpu.ops import curves as curve_ops
from rapidraw_tpu.ops import local as local_ops
from rapidraw_tpu.ops import tone as tone_ops
from rapidraw_tpu.ops import colorspace as cs
from rapidraw_tpu.ops.common import fpow, luma, mix, smoothstep
from rapidraw_tpu.ops.grain import apply_grain, dither_from_coords
from rapidraw_tpu.params.parse import DevelopConfig

# fields blended per-pixel by mask influence (shader.wgsl:1503-1525)
EFF_FIELDS = (
    "exposure", "brightness", "contrast", "highlights", "shadows", "whites",
    "blacks", "saturation", "temperature", "tint", "vibrance", "luma_nr",
    "color_nr", "clarity", "dehaze", "structure", "glow", "halation",
    "flare", "hue",
)


def blend_mask_indices(cfg: DevelopConfig, f: str):
    """Static mask-index set whose value for field f is non-zero (the
    other masks' terms are provably zero and compile out)."""
    if f not in cfg.mask_blend_fields:
        return ()
    i = cfg.mask_blend_fields.index(f)
    if i < len(cfg.mask_blend_masks):
        return cfg.mask_blend_masks[i]
    return tuple(range(cfg.mask_count))  # pre-gating configs: blend all


def effective_params(g: dict, m: dict | None, gated_infl, cfg: DevelopConfig) -> dict:
    """t_x = global.x + sum_i mask_i.x * influence_i (shader.wgsl:1498-1536)."""
    eff = {}
    for f in EFF_FIELDS:
        v = g[f]
        if cfg.mask_count > 0:
            for n in blend_mask_indices(cfg, f):
                v = v + gated_infl[n] * m[f][n]
        eff[f] = v
    return eff


def _mask_curve_set(mask_curves: dict, n: int) -> dict:
    return {k: v[n] for k, v in mask_curves.items()}


def _trim_curves(curve_set: dict, n_seg: int) -> dict:
    seg = curve_set["seg"]
    if not hasattr(seg, "ndim"):
        return curve_set  # tuple layout (fused kernel) is pre-trimmed
    out = dict(curve_set)
    out["seg"] = seg[..., : max(n_seg, 1), :]
    return out


def apply_vignette(rgb, xs, ys, w_full, h_full, amount, midpoint, roundness, feather):
    """Post-grade vignette (shader.wgsl:1645-1662). xs/ys are absolute pixel
    coordinate maps; w_full/h_full the full image dims (tile-safe)."""
    v_round = 1.0 - roundness
    v_feather = feather * 0.5
    un = (xs / w_full - 0.5) * 2.0
    vn = (ys / h_full - 0.5) * 2.0
    aspect = h_full / w_full
    ux = jnp.sign(un) * fpow(jnp.abs(un), v_round)
    uy = jnp.sign(vn) * fpow(jnp.abs(vn), v_round)
    d = jnp.sqrt(ux * ux + (uy * aspect) ** 2) * 0.5
    vmask = smoothstep(midpoint - v_feather, midpoint + v_feather, d)
    darken = rgb * (1.0 + amount * vmask)
    lighten = mix(rgb, 1.0, amount * vmask)
    return jnp.where(jnp.asarray(amount) < 0.0, darken, lighten)


def grade_chain(
    initial_linear: jnp.ndarray,
    sharp_blur,
    tonal_blur,
    clarity_blur,
    structure_blur,
    flare_rgb,
    g: dict,
    m: dict | None,
    gated_infl,
    cfg: DevelopConfig,
    xs: jnp.ndarray,
    ys: jnp.ndarray,
    w_full: int,
    h_full: int,
    scale: float,
) -> jnp.ndarray:
    """NR output -> post-curves sRGB (shader.wgsl:1555-1697).

    Blur inputs are pre-LINEARIZED pyramid levels (or None when statically
    unused); flare_rgb is the pre-sampled, pre-squared flare contribution
    map or None. xs/ys are absolute pixel coordinates as (H, W)-shaped f32.
    """
    is_raw = cfg.is_raw
    eff = effective_params(g, m, gated_infl, cfg)

    centre_mask = None
    if cfg.centre_active:
        centre_mask = local_ops.centre_mask_from_coords(xs, ys, w_full, h_full)

    # ---- local contrast chain (shader.wgsl:1555-1580) ----------------------
    rgb = initial_linear
    if cfg.sharpness_active:
        rgb = local_ops.apply_local_contrast(
            rgb, sharp_blur, g["sharpness"], is_raw, 0, g["sharpness_threshold"],
            blur_is_linear=True,
        )
    if cfg.mask_sharpness_active:
        delta = jnp.zeros_like(rgb)
        for n in range(cfg.mask_count):
            res = local_ops.apply_local_contrast(
                initial_linear, sharp_blur, m["sharpness"][n], is_raw, 0,
                m["sharpness_threshold"][n], blur_is_linear=True,
            )
            contrib = (res - initial_linear) * gated_infl[n]
            delta = delta + jnp.where(jnp.abs(m["sharpness"][n]) > 0.001, contrib, 0.0)
        rgb = rgb + delta
    if cfg.clarity_active:
        rgb = local_ops.apply_local_contrast(
            rgb, clarity_blur, eff["clarity"], is_raw, 1, 0.0, blur_is_linear=True
        )
    if cfg.structure_active:
        rgb = local_ops.apply_local_contrast(
            rgb, structure_blur, eff["structure"], is_raw, 1, 0.0, blur_is_linear=True
        )
    if cfg.centre_active:
        rgb = local_ops.apply_centre_local_contrast(
            rgb, g["centre"], clarity_blur, is_raw, blur_is_linear=True,
            centre_mask=centre_mask,
        )

    # ---- exposure + atmosphere (shader.wgsl:1582-1613) ---------------------
    if cfg.exposure_active:
        rgb = tone_ops.apply_linear_exposure(rgb, eff["exposure"])
    if cfg.glow_active:
        rgb = local_ops.apply_glow_bloom(
            rgb, structure_blur, eff["glow"], is_raw,
            eff["exposure"], eff["brightness"], eff["contrast"], eff["whites"],
            blur_is_linear=True,
        )
    if cfg.halation_active:
        rgb = local_ops.apply_halation(
            rgb, clarity_blur, eff["halation"], is_raw,
            eff["exposure"], eff["brightness"], eff["contrast"], eff["whites"],
            blur_is_linear=True,
        )
    if cfg.flare_active and flare_rgb is not None:
        # shader.wgsl:1596-1610 (flare_rgb already *1.4 and squared)
        linear_luma = luma(jnp.maximum(rgb, 0.0))
        perceptual = local_ops._perceptual_luma(linear_luma)
        protection = 1.0 - smoothstep(0.7, 1.8, perceptual)
        contrib = flare_rgb * eff["flare"] * protection
        rgb = jnp.where(jnp.asarray(eff["flare"]) > 0.0, rgb + contrib, rgb)
    if cfg.dehaze_active:
        rgb = local_ops.apply_dehaze(
            rgb, structure_blur, is_raw, eff["dehaze"], blur_is_linear=True
        )
    if cfg.centre_active:
        rgb = local_ops.apply_centre_tonal_and_color(rgb, g["centre"], centre_mask)

    # ---- global grade (shader.wgsl:1614-1631) ------------------------------
    if cfg.wb_active:
        rgb = color_ops.apply_white_balance(rgb, eff["temperature"], eff["tint"])
    if cfg.brightness_active:
        rgb = tone_ops.apply_filmic_exposure(rgb, eff["brightness"])
    if cfg.tonal_active:
        # tonal_blur None => shadows/blacks statically zero: compile out the
        # blur-consuming path (also avoids a materialized zeros constant,
        # which crashes Mosaic's compile inside the fused kernel)
        rgb = tone_ops.apply_tonal_adjustments(
            rgb, tonal_blur if tonal_blur is not None else rgb, is_raw,
            eff["contrast"], eff["shadows"], eff["whites"], eff["blacks"],
            blur_is_linear=True, shadow_path=tonal_blur is not None,
        )
    if cfg.highlights_active:
        rgb = tone_ops.apply_highlights(rgb, eff["highlights"])
    if cfg.calibration_active:
        rgb = color_ops.apply_color_calibration(rgb, g["calibration"])
    if cfg.hsl_active:
        rgb = color_ops.apply_hsl_panel(
            rgb,
            g["hsl"],
            m["hsl"] if (cfg.mask_hsl_active and cfg.mask_count > 0) else None,
            gated_infl if cfg.mask_hsl_active else None,
            band_active=cfg.hsl_band_active,
        )
    if cfg.hue_active:
        rgb = color_ops.apply_hue_shift(rgb, eff["hue"])
    if cfg.creative_active:
        rgb = color_ops.apply_creative_color(rgb, eff["saturation"], eff["vibrance"])
    if cfg.cg_active:
        rgb = color_ops.apply_color_grading(rgb, g["cg"], g["cg_blending"], g["cg_balance"])
    if cfg.mask_cg_active:
        for n in range(cfg.mask_count):
            graded = color_ops.apply_color_grading(
                rgb, m["cg"][n], m["cg_blending"][n], m["cg_balance"][n]
            )
            rgb = mix(rgb, graded, gated_infl[n])

    # ---- vignette (shader.wgsl:1645-1662) ----------------------------------
    if cfg.vignette_active:
        rgb = apply_vignette(
            rgb, xs, ys, w_full, h_full,
            g["vignette_amount"], g["vignette_midpoint"],
            g["vignette_roundness"], g["vignette_feather"],
        )

    # ---- tonemap (shader.wgsl:1664-1676) -----------------------------------
    if cfg.tonemapper_agx:
        base_srgb = tone_ops.agx_tonemap(rgb, g["agx_p2r"], g["agx_r2p"])
    elif is_raw:
        base_srgb = tone_ops.raw_srgb_emulation(rgb)
    else:
        base_srgb = cs.linear_to_srgb(rgb)

    # ---- point curves (shader.wgsl:1678-1697) ------------------------------
    final = base_srgb
    if cfg.curves_active:
        final = curve_ops.apply_all_curves(
            final, _trim_curves(g["curves"], cfg.curve_segments), cfg.rgb_curves_maybe_active
        )
    if cfg.mask_curves_active:
        for n in range(cfg.mask_count):
            curved = curve_ops.apply_all_curves(
                final,
                _trim_curves(_mask_curve_set(m["curves"], n), cfg.curve_segments),
                cfg.rgb_curves_maybe_active,
            )
            final = mix(final, curved, gated_infl[n])
    return final


def finish_chain(
    final: jnp.ndarray,
    g: dict,
    cfg: DevelopConfig,
    xs: jnp.ndarray,
    ys: jnp.ndarray,
    scale: float,
    lut=None,
) -> jnp.ndarray:
    """3D LUT -> grain -> clipping -> dither -> clamp (shader.wgsl:1699-1734)."""
    if cfg.has_lut and lut is not None:
        from rapidraw_tpu.ops.lut3d import apply_lut

        final = apply_lut(final, lut, g["lut_intensity"])
    if cfg.grain_active:
        final = apply_grain(
            final, g["grain_amount"], g["grain_size"], g["grain_roughness"], scale, xs, ys
        )
    if cfg.show_clipping:
        hi = jnp.any(final > 0.998, axis=0)
        lo = jnp.any(final < 0.002, axis=0)
        # channel-wise (scalar constants only — Pallas rejects captured arrays)
        zero = jnp.zeros_like(final[0])
        one = jnp.ones_like(final[0])
        final = jnp.stack(
            [
                jnp.where(hi, one, jnp.where(lo, zero, final[0])),
                jnp.where(hi, zero, jnp.where(lo, zero, final[1])),
                jnp.where(hi, zero, jnp.where(lo, one, final[2])),
            ]
        )
    if cfg.dither_active:
        final = final + dither_from_coords(xs, ys) * (1.0 / 255.0)
    return jnp.clip(final, 0.0, 1.0)
