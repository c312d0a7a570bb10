"""The full develop chain — TPU equivalent of the reference megakernel.

Stage order is exactly shader.wgsl `main` (:1438-1735):
  CA -> linearize -> mask param blend -> NR -> [blur pyramid] ->
  grade chain (pipeline.grade: local contrast ... curves) ->
  3D LUT -> grain -> clipping -> dither.

Architecture notes (TPU-first, not a shader translation):
  * Planar (3, H, W) layout: a minor dim of 3 wastes TPU lanes and makes
    transposes pathological; planar keeps W on the lane axis and makes the
    blur matmuls transpose-free.
  * Static specialization (DevelopConfig) compiles out provably-identity
    stages instead of per-pixel uniform branches — the analog of the
    reference's `is_image_edited` byte-compare idea.
  * With masks, the blended parameters become (H, W) maps; ops broadcast
    over scalar-or-map params transparently.
  * Blur pyramid = banded-matmul Pallas kernels on the MXU; NR/CA = gather
    ops; the per-pixel chain itself lives in pipeline.grade and can run
    either through XLA (here) or as one fused Pallas megakernel
    (pipeline.fused) that eliminates the inter-fusion HBM round-trips.
"""

from __future__ import annotations

import jax.numpy as jnp

from rapidraw_tpu.ops import colorspace as cs
from rapidraw_tpu.ops.blur import gaussian_blur
from rapidraw_tpu.ops.ca import apply_ca_correction
from rapidraw_tpu.ops.nr import apply_noise_reduction
from rapidraw_tpu.params import scales
from rapidraw_tpu.params.parse import DevelopConfig
from rapidraw_tpu.pipeline.grade import finish_chain, grade_chain


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


def prepare_inputs(
    image: jnp.ndarray,
    params: dict,
    cfg: DevelopConfig,
    masks: jnp.ndarray | None,
    flare: jnp.ndarray | None,
    linearize_blurs: bool = True,
    full_size: tuple[int, int] | None = None,
    tile_offset: tuple[int, int] = (0, 0),
    linearize_image: bool = True,
    blur_bands: tuple | None = None,
    ca_indices=None,
):
    """Shared front half: CA, linearize, NR, blur pyramid, flare sampling.

    Returns (initial_linear, blurs dict, flare_rgb, gated_infl, scale).
    `linearize_blurs=False` leaves the blur levels in input space — the
    fused megakernel linearizes them per tile in VMEM instead, saving one
    full HBM round-trip per level.
    `blur_bands`: static ((level_key, y0, y1), ...) from
    pipeline.bands.blur_band_rows — levels listed there are computed only
    over [y0, y1) rows (mask-only consumers; exact: outside the band the
    effective amounts are zero and the consumers are identity). Ignored on
    the tiled path (full_size != image dims — bands are full-image rows).
    """
    g = params["glob"]
    m = params["mask"]
    _, h, w = image.shape
    w_full, h_full = full_size if full_size is not None else (w, h)
    scale = scales.resolution_scale(w_full, h_full)
    is_raw = cfg.is_raw
    input_rgb = image

    if cfg.ca_active:
        color_from_texture = apply_ca_correction(
            input_rgb, g["ca_rc"], g["ca_by"],
            static_rc=cfg.ca_static_rc, static_by=cfg.ca_static_by,
            tile_offset=tile_offset, full_size=(w_full, h_full),
            precomputed=ca_indices,
        )
    else:
        color_from_texture = input_rgb
    if is_raw or not linearize_image:
        # linearize_image=False: the fused kernel applies srgb_to_linear per
        # tile in VMEM instead (only valid when NR is inactive — NR consumes
        # the linear image here)
        initial_linear = color_from_texture
    else:
        initial_linear = cs.srgb_to_linear(color_from_texture)

    if cfg.mask_count > 0:
        assert masks is not None, "cfg.mask_count > 0 requires mask bitmaps"
        gated_infl = jnp.where(masks > 0.001, masks, 0.0)
    else:
        gated_infl = None

    if cfg.nr_active:
        luma_nr = g["luma_nr"]
        color_nr = g["color_nr"]
        if cfg.mask_count > 0:
            from rapidraw_tpu.pipeline.grade import blend_mask_indices

            for f, v in (("luma_nr", luma_nr), ("color_nr", color_nr)):
                for n in blend_mask_indices(cfg, f):
                    v = v + gated_infl[n] * m[f][n]
                if f == "luma_nr":
                    luma_nr = v
                else:
                    color_nr = v
        initial_linear = apply_noise_reduction(
            initial_linear, input_rgb, luma_nr, color_nr, scale, is_raw,
            static_luma=cfg.nr_static_luma, static_color=cfg.nr_static_color,
            tile_offset=tile_offset,
        )

    # blur pyramid, pre-linearized once (gpu_processing.rs:1402-1405);
    # every needed level runs in ONE kernel-launch pair (gaussian_blur_multi
    # amortizes the pad + pipeline fixed cost across levels)
    blurs = {"sharp": None, "tonal": None, "clarity": None, "structure": None}
    need = [
        (key, scales.blur_radius(base_r, scale))
        for key, flag, base_r in (
            ("sharp", cfg.sharpness_blur_needed, scales.BLUR_RADIUS_SHARPNESS),
            ("tonal", cfg.tonal_blur_needed, scales.BLUR_RADIUS_TONAL),
            ("clarity", cfg.clarity_blur_needed, scales.BLUR_RADIUS_CLARITY),
            ("structure", cfg.structure_blur_needed, scales.BLUR_RADIUS_STRUCTURE),
        )
        if flag
    ]
    if need:
        from rapidraw_tpu.ops.blur import gaussian_blur_multi

        def _lin(b):
            return b if (is_raw or not linearize_blurs) else cs.srgb_to_linear(b)

        bands = {}
        if blur_bands and (w_full, h_full) == (w, h):
            valid = {k for k, _ in need}
            bands = {
                k: (y0, y1) for k, y0, y1 in blur_bands
                if k in valid and 0 <= y0 < y1 <= h and (y1 - y0) < h
            }
        full_need = [(k, r) for k, r in need if k not in bands]
        band_need = [(k, r) for k, r in need if k in bands]
        if full_need:
            levels = gaussian_blur_multi(input_rgb, tuple(r for _, r in full_need))
            for (key, _), b in zip(full_need, levels):
                blurs[key] = _lin(b)
        if band_need:
            # per-band launches: a shared union slice wastes (union - own)
            # rows per level — measured 6.0 vs 4.1 ms on config-4's bands
            # (tools/prof_band_blur.py); levels share a launch only when
            # their bands coincide. The max-radius halo makes each level's
            # band rows exact full-image blur values (edge clamp only ever
            # lands in the halo).
            groups: dict = {}
            for k, r in band_need:
                groups.setdefault(bands[k], []).append((k, r))
            for (y0, y1), items in groups.items():
                rmax = max(r for _, r in items)
                lo = max(0, y0 - rmax)
                hi = min(h, y1 + rmax)
                levels = gaussian_blur_multi(
                    input_rgb[:, lo:hi], tuple(r for _, r in items)
                )
                for (key, _), b in zip(items, levels):
                    band = _lin(b[:, y0 - lo : y1 - lo])
                    blurs[key] = jnp.pad(band, ((0, 0), (y0, h - y1), (0, 0)))

    flare_rgb = None
    if cfg.flare_active:
        if flare is None:
            # the flare map is built from global (unmasked) params
            # (gpu_processing.rs:1180-1277 passes adjustments.global)
            from rapidraw_tpu.ops.flare import generate_flare_map

            flare = generate_flare_map(
                input_rgb, g["flare"], g["exposure"], g["brightness"], g["whites"], is_raw
            )
        x0, y0 = tile_offset
        ys = (
            jnp.arange(h, dtype=jnp.float32)[:, None]
            + jnp.asarray(y0, jnp.float32) + jnp.zeros((1, w))
        ) / h_full
        xs = (
            jnp.arange(w, dtype=jnp.float32)[None, :]
            + jnp.asarray(x0, jnp.float32) + jnp.zeros((h, 1))
        ) / w_full
        flare_rgb = _bilinear_sample(flare, xs, ys) * 1.4
        flare_rgb = flare_rgb * flare_rgb  # shader.wgsl:1599-1600

    return initial_linear, blurs, flare_rgb, gated_infl, scale


def develop(
    image: jnp.ndarray,
    params: dict,
    cfg: DevelopConfig,
    masks: jnp.ndarray | None = None,
    lut: jnp.ndarray | None = None,
    flare: jnp.ndarray | None = None,
    tile_offset: tuple[int, int] = (0, 0),
    full_size: tuple[int, int] | None = None,
    blur_bands: tuple | None = None,
    ca_indices=None,
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
      flare: (512, 512, 3) flare map (generated on the fly when absent).
      tile_offset/full_size: when developing one tile of a larger image
        (host-side tiled dispatch, pipeline.tiled — the analog of the
        reference's tile_offset_x/y uniforms, image_processing.rs:1402-1407),
        the absolute pixel coordinates and full dimensions keep the
        spatially-dependent stages (vignette, centre, grain, dither)
        consistent across tiles.

    Returns planar (3, H, W) float32 sRGB in [0, 1].
    """
    if image.ndim != 3 or image.shape[0] != 3:
        # catch the classic HWC (or HW-RGBA) hand-off: shapes are static
        # under jit, so this costs nothing and fails loud instead of
        # slicing the first 3 rows as color planes
        raise ValueError(
            f"develop() expects a PLANAR (3, H, W) image, got {image.shape}; "
            "convert interleaved (H, W, C) with np.moveaxis(img, -1, 0) "
            "(and drop alpha)"
        )
    g = params["glob"]
    m = params["mask"]
    _, h, w = image.shape
    x0, y0 = tile_offset
    w_full, h_full = full_size if full_size is not None else (w, h)

    initial_linear, blurs, flare_rgb, gated_infl, scale = prepare_inputs(
        image, params, cfg, masks, flare, full_size=full_size,
        tile_offset=tile_offset, blur_bands=blur_bands, ca_indices=ca_indices,
    )

    ys = (
        jnp.arange(h, dtype=jnp.float32)[:, None] + jnp.asarray(y0, jnp.float32)
    ) * jnp.ones((1, w), jnp.float32)
    xs = (
        jnp.arange(w, dtype=jnp.float32)[None, :] + jnp.asarray(x0, jnp.float32)
    ) * jnp.ones((h, 1), jnp.float32)

    final = grade_chain(
        initial_linear,
        blurs["sharp"], blurs["tonal"], blurs["clarity"], blurs["structure"],
        flare_rgb, g, m, gated_infl, cfg, xs, ys, w_full, h_full, scale,
    )
    return finish_chain(final, g, cfg, xs, ys, scale, lut=lut)
