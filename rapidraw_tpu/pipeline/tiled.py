"""Host-side tiled dispatch for images too large for one develop pass.

The reference renders everything through 2048-pixel tiles with a 128-pixel
halo (gpu_processing.rs:1279-1280 TILE_SIZE/TILE_OVERLAP) because wgpu
textures cap at 8192px. The TPU engine develops 24MP-class frames whole in
HBM; this module exists for the genuinely huge cases (stitched panoramas,
scan masters) where the blur pyramid + activations would exceed device
memory. Same contract as the reference: the halo feeds the spatial stages
(blur pyramid, NR, CA), so seams only appear where a blur radius exceeds
the overlap — identical to the reference's behavior.

Spatially-dependent per-pixel stages (vignette, centre mask, grain, dither,
flare sampling) stay exact: tiles carry their absolute offset + the full
dimensions (the analog of the reference's tile_offset uniforms,
image_processing.rs:1402-1407).
"""

from __future__ import annotations

import os
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from rapidraw_tpu.params.parse import DevelopConfig

TILE_SIZE = 2048  # gpu_processing.rs:1279
TILE_OVERLAP = 128  # gpu_processing.rs:1280


@lru_cache(maxsize=64)
def _tiled_jit(develop_fn, cfg: DevelopConfig, full_w: int, full_h: int,
               static_off: tuple[int, int] | None):
    """Cached per-(develop fn, cfg, full size) jitted tile develop.

    jit caches on the function object, so building the lambda inside
    develop_tiled would re-trace + re-compile the megakernel on every call.
    `static_off=None` passes the tile offset as a traced scalar pair (all
    interior tiles share ONE executable); the exact-jitter NR opt-in needs
    static offsets (its candidate masks constant-fold the coordinate hash)
    and pays one compile per tile position instead.
    """
    if static_off is None:
        return jax.jit(
            lambda img, p, mk, fl, lt, off, cai: develop_fn(
                img, p, cfg, masks=mk, lut=lt, flare=fl,
                tile_offset=off, full_size=(full_w, full_h), ca_indices=cai,
            )
        )
    fn = jax.jit(
        lambda img, p, mk, fl, lt, cai: develop_fn(
            img, p, cfg, masks=mk, lut=lt, flare=fl,
            tile_offset=static_off, full_size=(full_w, full_h), ca_indices=cai,
        )
    )
    return lambda img, p, mk, fl, lt, off, cai: fn(img, p, mk, fl, lt, cai)


def develop_tiled(
    image: np.ndarray,
    params: dict,
    cfg: DevelopConfig,
    masks: np.ndarray | None = None,
    lut=None,
    tile_size: int = TILE_SIZE,
    overlap: int = TILE_OVERLAP,
) -> np.ndarray:
    """Develop a huge planar (3, H, W) image tile-by-tile on device.

    The input/output stay host-side (numpy); only one padded tile lives in
    HBM at a time. The fused megakernel handles each tile via the normal
    develop path (same jit cache key for all interior tiles).
    """
    from rapidraw_tpu.pipeline.batch import _use_fused
    from rapidraw_tpu.pipeline.develop import develop

    if _use_fused(cfg):
        # the megakernel takes tile_offset/full_size, so oversized images
        # keep the whole fused-kernel win (VMEM-resident chain per tile)
        from rapidraw_tpu.pipeline.fused import develop_fused as _develop
    else:
        _develop = develop

    _, h, w = image.shape
    if h <= tile_size and w <= tile_size:
        out = _develop(jnp.asarray(image), params, cfg,
                       masks=jnp.asarray(masks) if masks is not None else None,
                       lut=lut)
        return np.asarray(out)

    flare = None
    if cfg.flare_active:
        # the flare map is global: build it once from a downscaled proxy of
        # the full image (the map itself is 512x512; gpu_processing.rs
        # renders it from the full-res input, a downscale is equivalent at
        # map resolution)
        from rapidraw_tpu.geometry.resize import downscale_to_long_edge
        from rapidraw_tpu.ops.flare import generate_flare_map

        g = params["glob"]
        proxy = downscale_to_long_edge(jnp.asarray(image), 1024)
        flare = generate_flare_map(
            proxy, g["flare"], g["exposure"], g["brightness"], g["whites"], cfg.is_raw
        )

    # tile offsets are traced scalars: every interior tile (same padded
    # shape) reuses ONE compiled executable — with static offsets a 16-tile
    # image would pay 16 Mosaic compiles. The exact-jitter NR opt-in is the
    # exception (static offsets required; see _tiled_jit).
    exact_jitter_nr = (
        cfg.nr_active
        and cfg.nr_static_luma is not None
        and cfg.nr_static_color is not None  # the NR gate needs BOTH
        and os.environ.get("RAPIDRAW_NR_EXACT_JITTER") == "1"
    )

    out = np.empty((3, h, w), np.float32)
    for y0 in range(0, h, tile_size):
        for x0 in range(0, w, tile_size):
            y1 = min(y0 + tile_size, h)
            x1 = min(x0 + tile_size, w)
            # halo-extended source window (clamped to the image)
            ys0 = max(0, y0 - overlap)
            xs0 = max(0, x0 - overlap)
            ys1 = min(h, y1 + overlap)
            xs1 = min(w, x1 + overlap)
            tile = jnp.asarray(image[:, ys0:ys1, xs0:xs1])
            mk = jnp.asarray(masks[:, ys0:ys1, xs0:xs1]) if masks is not None else None
            ca_idx = None
            if cfg.ca_active and cfg.ca_static_rc is not None:
                # host-baked per-tile CA sample indices (float64 rounding
                # matches the whole-image path; traced args keep interior
                # tiles on one executable)
                from rapidraw_tpu.ops.ca import ca_host_indices

                ca_idx = tuple(
                    jnp.asarray(a) for a in ca_host_indices(
                        ys1 - ys0, xs1 - xs0, cfg.ca_static_rc,
                        cfg.ca_static_by, (xs0, ys0), (w, h),
                    )
                )
            fn = _tiled_jit(
                _develop, cfg, w, h, (xs0, ys0) if exact_jitter_nr else None
            )
            res = fn(tile, params, mk, flare, lut, (xs0, ys0), ca_idx)
            res = np.asarray(res)
            out[:, y0:y1, x0:x1] = res[:, y0 - ys0 : y0 - ys0 + (y1 - y0),
                                       x0 - xs0 : x0 - xs0 + (x1 - x0)]
    return out
