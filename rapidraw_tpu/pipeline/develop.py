"""The full develop chain — TPU equivalent of the reference megakernel.

Stage order is exactly shader.wgsl `main` (:1438-1735):
  CA -> linearize -> mask param blend -> NR -> [blur pyramid] ->
  sharpen (+ per-mask sharpen deltas) -> clarity -> structure -> centre LC ->
  exposure -> glow -> halation -> flare -> dehaze -> centre tonal/color ->
  white balance -> filmic brightness -> tonal -> highlights -> calibration ->
  HSL -> hue shift -> sat/vibrance -> color grading (+ per-mask) -> vignette ->
  tonemap -> curves (+ per-mask) -> 3D LUT -> grain -> clipping -> dither.

Architecture notes (TPU-first, not a shader translation):
  * Planar (3, H, W) layout: a minor dim of 3 wastes TPU lanes and makes
    transposes pathological; planar keeps W on the lane axis and makes the
    blur matmuls transpose-free.
  * One traced function; XLA fuses the elementwise chain into a few loops
    over HBM-resident images. No tiling: HBM holds full 24MP f32 planes.
  * Static specialization (DevelopConfig) compiles out provably-identity
    stages instead of per-pixel uniform branches — the analog of the
    reference's `is_image_edited` byte-compare idea.
  * With masks, the blended parameters become (H, W) maps; ops broadcast
    over scalar-or-map params transparently.
  * Blur pyramid = banded-matmul Pallas kernels on the MXU; NR/CA = gather
    ops (Pallas fast paths planned); everything else is elementwise VPU work.
"""

from __future__ import annotations

import jax.numpy as jnp

from rapidraw_tpu.ops import color as color_ops
from rapidraw_tpu.ops import colorspace as cs
from rapidraw_tpu.ops import curves as curve_ops
from rapidraw_tpu.ops import local as local_ops
from rapidraw_tpu.ops import tone as tone_ops
from rapidraw_tpu.ops.blur import gaussian_blur
from rapidraw_tpu.ops.ca import apply_ca_correction
from rapidraw_tpu.ops.common import luma, mix, smoothstep
from rapidraw_tpu.ops.grain import apply_grain, dither_pattern
from rapidraw_tpu.ops.lut3d import apply_lut
from rapidraw_tpu.ops.nr import apply_noise_reduction
from rapidraw_tpu.params import scales
from rapidraw_tpu.params.parse import DevelopConfig

# fields blended per-pixel by mask influence (shader.wgsl:1503-1525)
_EFF_FIELDS = (
    "exposure",
    "brightness",
    "contrast",
    "highlights",
    "shadows",
    "whites",
    "blacks",
    "saturation",
    "temperature",
    "tint",
    "vibrance",
    "luma_nr",
    "color_nr",
    "clarity",
    "dehaze",
    "structure",
    "glow",
    "halation",
    "flare",
    "hue",
)


def _mask_curve_set(mask_curves: dict, n: int) -> dict:
    return {k: v[n] for k, v in mask_curves.items()}


def _trim_curves(curve_set: dict, n_seg: int) -> dict:
    """Statically drop unused segment rows (DevelopConfig.curve_segments)."""
    out = dict(curve_set)
    out["seg"] = curve_set["seg"][..., : max(n_seg, 1), :]
    return out


def _bilinear_sample(tex: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Clamp-to-edge bilinear sample of (Ht, Wt, C) at normalized uv maps.

    Returns planar (C, ...).
    """
    ht, wt, nc = tex.shape
    x = u * wt - 0.5
    y = v * ht - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    xi0 = jnp.clip(x0.astype(jnp.int32), 0, wt - 1)
    yi0 = jnp.clip(y0.astype(jnp.int32), 0, ht - 1)
    xi1 = jnp.clip(xi0 + 1, 0, wt - 1)
    yi1 = jnp.clip(yi0 + 1, 0, ht - 1)
    flat = tex.reshape(-1, nc)

    def fetch(yy, xx):
        idx = yy * wt + xx
        g = jnp.take(flat, idx.reshape(-1), axis=0).reshape(idx.shape + (nc,))
        return jnp.moveaxis(g, -1, 0)

    c00 = fetch(yi0, xi0)
    c10 = fetch(yi0, xi1)
    c01 = fetch(yi1, xi0)
    c11 = fetch(yi1, xi1)
    top = c00 * (1.0 - fx) + c10 * fx
    bot = c01 * (1.0 - fx) + c11 * fx
    return top * (1.0 - fy) + bot * fy


def develop(
    image: jnp.ndarray,
    params: dict,
    cfg: DevelopConfig,
    masks: jnp.ndarray | None = None,
    lut: jnp.ndarray | None = None,
    flare: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Develop one image.

    Args:
      image: planar (3, H, W) float32 in *input space*: sRGB-encoded for LDR
        sources, scene-linear for RAW (matching the reference's input
        texture contract, gpu_processing.rs:1738-1778).
      params: DevelopParams pytree ({'glob': {...}, 'mask': {...}|None}).
      cfg: static DevelopConfig (hashable) — pass as a jit static arg.
      masks: (N, H, W) float32 mask influence bitmaps in [0, 1].
      lut: (L, L, L, 3) 3D LUT (required when cfg.has_lut).
      flare: (512, 512, 3) flare map (required when cfg.flare_active).

    Returns planar (3, H, W) float32 sRGB in [0, 1].
    """
    g = params["glob"]
    m = params["mask"]
    _, h, w = image.shape
    scale = max(0.1, min(h, w) / scales.REFERENCE_DIMENSION)
    is_raw = cfg.is_raw

    input_rgb = image

    # ---- chromatic aberration (reads the raw input texture) -------------
    if cfg.ca_active:
        color_from_texture = apply_ca_correction(input_rgb, g["ca_rc"], g["ca_by"])
    else:
        color_from_texture = input_rgb

    if is_raw:
        initial_linear = color_from_texture
    else:
        initial_linear = cs.srgb_to_linear(color_from_texture)

    # ---- effective (mask-blended) parameters -----------------------------
    # shader.wgsl:1498-1536: t_x = global.x + sum_i mask_i.x * influence_i,
    # with influence gated at 0.001.
    if cfg.mask_count > 0:
        assert masks is not None, "cfg.mask_count > 0 requires mask bitmaps"
        gated_infl = jnp.where(masks > 0.001, masks, 0.0)  # (N, H, W)
    else:
        gated_infl = None

    eff = {}
    for f in _EFF_FIELDS:
        v = g[f]
        if cfg.mask_count > 0 and f in cfg.mask_blend_fields:
            for n in range(cfg.mask_count):
                v = v + gated_infl[n] * m[f][n]
        eff[f] = v

    # ---- noise reduction --------------------------------------------------
    if cfg.nr_active:
        initial_linear = apply_noise_reduction(
            initial_linear, input_rgb, eff["luma_nr"], eff["color_nr"], scale, is_raw
        )

    # ---- blur pyramid (input-space source, gpu_processing.rs:1402-1405) ---
    # Consumers need the blur in LINEAR space; the shader re-linearizes per
    # consumer (srgb_to_linear of the same texture up to 3x) — we linearize
    # each level once and tell consumers the input is already linear.
    def blur_linear(base_radius: float) -> jnp.ndarray:
        b = gaussian_blur(input_rgb, scales.blur_radius(base_radius, scale))
        return b if is_raw else cs.srgb_to_linear(b)

    sharp_blur = tonal_blur = clarity_blur = structure_blur = None
    if cfg.sharpness_blur_needed:
        sharp_blur = blur_linear(scales.BLUR_RADIUS_SHARPNESS)
    if cfg.tonal_blur_needed:
        tonal_blur = blur_linear(scales.BLUR_RADIUS_TONAL)
    if cfg.clarity_blur_needed:
        clarity_blur = blur_linear(scales.BLUR_RADIUS_CLARITY)
    if cfg.structure_blur_needed:
        structure_blur = blur_linear(scales.BLUR_RADIUS_STRUCTURE)

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
        rgb = local_ops.apply_local_contrast(rgb, clarity_blur, eff["clarity"], is_raw, 1, 0.0, blur_is_linear=True)
    if cfg.structure_active:
        rgb = local_ops.apply_local_contrast(rgb, structure_blur, eff["structure"], is_raw, 1, 0.0, blur_is_linear=True)
    if cfg.centre_active:
        rgb = local_ops.apply_centre_local_contrast(rgb, g["centre"], clarity_blur, is_raw, blur_is_linear=True)

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
    if cfg.flare_active and flare is None:
        # the flare map is built from global (unmasked) params
        # (gpu_processing.rs:1180-1277 passes adjustments.global)
        from rapidraw_tpu.ops.flare import generate_flare_map

        flare = generate_flare_map(
            input_rgb, g["flare"], g["exposure"], g["brightness"], g["whites"], is_raw
        )
    if cfg.flare_active and flare is not None:
        # shader.wgsl:1596-1610
        ys = (jnp.arange(h, dtype=jnp.float32)[:, None] + jnp.zeros((1, w))) / h
        xs = (jnp.arange(w, dtype=jnp.float32)[None, :] + jnp.zeros((h, 1))) / w
        flare_color = _bilinear_sample(flare, xs, ys) * 1.4
        flare_color = flare_color * flare_color
        linear_luma = luma(jnp.maximum(rgb, 0.0))
        perceptual = local_ops._perceptual_luma(linear_luma)
        protection = 1.0 - smoothstep(0.7, 1.8, perceptual)
        contrib = flare_color * eff["flare"] * protection
        rgb = jnp.where(jnp.asarray(eff["flare"]) > 0.0, rgb + contrib, rgb)
    if cfg.dehaze_active:
        rgb = local_ops.apply_dehaze(rgb, structure_blur, is_raw, eff["dehaze"], blur_is_linear=True)
    if cfg.centre_active:
        rgb = local_ops.apply_centre_tonal_and_color(rgb, g["centre"])

    # ---- global grade (shader.wgsl:1614-1631) -------------------------------
    if cfg.wb_active:
        rgb = color_ops.apply_white_balance(rgb, eff["temperature"], eff["tint"])
    if cfg.brightness_active:
        rgb = tone_ops.apply_filmic_exposure(rgb, eff["brightness"])
    if cfg.tonal_active:
        tb = tonal_blur if tonal_blur is not None else jnp.zeros_like(rgb)
        rgb = tone_ops.apply_tonal_adjustments(
            rgb, tb, is_raw, eff["contrast"], eff["shadows"], eff["whites"], eff["blacks"],
            blur_is_linear=True,
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

    # ---- vignette (shader.wgsl:1645-1662) -----------------------------------
    if cfg.vignette_active:
        v_amount = g["vignette_amount"]
        v_mid = g["vignette_midpoint"]
        v_round = 1.0 - g["vignette_roundness"]
        v_feather = g["vignette_feather"] * 0.5
        ys = (jnp.arange(h, dtype=jnp.float32)[:, None] / h - 0.5) * 2.0
        xs = (jnp.arange(w, dtype=jnp.float32)[None, :] / w - 0.5) * 2.0
        aspect = h / w
        ux = jnp.sign(xs) * jnp.power(jnp.abs(xs), v_round)
        uy = jnp.sign(ys) * jnp.power(jnp.abs(ys), v_round)
        d = jnp.sqrt(ux * ux + (uy * aspect) ** 2) * 0.5
        vmask = smoothstep(v_mid - v_feather, v_mid + v_feather, d)
        darken = rgb * (1.0 + v_amount * vmask)
        lighten = mix(rgb, 1.0, v_amount * vmask)
        rgb = jnp.where(v_amount < 0.0, darken, lighten)

    # ---- tonemap to display space (shader.wgsl:1664-1676) -------------------
    if cfg.tonemapper_agx:
        base_srgb = tone_ops.agx_tonemap(rgb, g["agx_p2r"], g["agx_r2p"])
    elif is_raw:
        base_srgb = tone_ops.raw_srgb_emulation(rgb)
    else:
        base_srgb = cs.linear_to_srgb(rgb)

    # ---- point curves (shader.wgsl:1678-1697) -------------------------------
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

    # ---- LUT / grain / clipping / dither ------------------------------------
    if cfg.has_lut and lut is not None:
        final = apply_lut(final, lut, g["lut_intensity"])
    if cfg.grain_active:
        final = apply_grain(
            final, g["grain_amount"], g["grain_size"], g["grain_roughness"], scale
        )
    if cfg.show_clipping:
        # shader.wgsl:1719-1729
        hi = jnp.any(final > 0.998, axis=0)
        lo = jnp.any(final < 0.002, axis=0)
        red = jnp.array([1.0, 0.0, 0.0], final.dtype).reshape(3, 1, 1)
        blue = jnp.array([0.0, 0.0, 1.0], final.dtype).reshape(3, 1, 1)
        final = jnp.where(hi, red, jnp.where(lo, blue, final))
    if cfg.dither_active:
        final = final + dither_pattern(h, w) * (1.0 / 255.0)
    return jnp.clip(final, 0.0, 1.0)
