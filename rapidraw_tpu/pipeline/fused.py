"""Fused develop megakernel — the whole grade chain as ONE Pallas kernel.

Motivation (measured on v5e, 24MP): the XLA path splits the ~40-stage
elementwise chain into many fusions, each paying a full HBM round-trip —
~40 ms for work whose flop cost is ~9 ms. This kernel runs the entire
post-NR chain (pipeline.grade) per (256, 512) tile while it sits in VMEM:
one read of the inputs, one write of the output — the TPU equivalent of
the reference's single WGSL megakernel dispatch (shader.wgsl main).

Mechanics:
  * The same grade_chain/finish_chain code runs inside the kernel — ops
    were written shape-polymorphic over (3, h, w) tiles with absolute
    coordinate maps for the spatial stages.
  * All adjustment parameters are packed into one flat (1, K) f32 vector;
    inside the kernel they are re-exposed as *nested tuples of scalar
    reads*, which the ops consume through plain [i][j] indexing. K is a
    few hundred — scalar loads are free next to the pixel math.
  * Tiles of the image, the pre-linearized blur levels, the sampled flare
    map and the mask bitmaps stream through standard BlockSpecs (automatic
    double buffering).
  * The 3D LUT stage gathers from a table, which stays outside the kernel:
    when cfg.has_lut the kernel stops after the curves and XLA finishes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rapidraw_tpu.params.parse import DevelopConfig
from rapidraw_tpu.pipeline.develop import prepare_inputs
from rapidraw_tpu.pipeline.grade import finish_chain, grade_chain

# measured on v5e (24MP full grade): 128x512 28.7ms, 256x512 21.2ms,
# 512x512 28.3ms, 128x1024 27.5ms — 256x512 with the raised VMEM limit wins
_TH = 256
_TW = 512
# rows per in-kernel chunk: whole-tile elementwise ops are VMEM-bandwidth
# bound (~12 B/elem/op, measured 0.08 ms per 24MP mul); running the chain
# over vreg-sized row chunks inside a fori_loop keeps intermediates in
# vector registers. Measured on a 48-op synthetic chain at 24MP: whole-tile
# 3.94 ms vs 1.42 ms chunked at 16 rows (tools/prof_chunked.py).
_CH = 16
# unroll the per-tile chunk loop into straight-line code (measured A/B in
# tools/prof_fused_chunk.py; flip only with evidence)
_UNROLL_CHUNKS = False

# Linearize the sRGB image inside the kernel (per chunk, in vregs) instead
# of as a standalone XLA stage. Pre-chunking this measured ~3% SLOWER (858
# vs 888 MPix/s: the XLA stage pipelined better than an in-kernel pow on
# the critical path); post-chunking the kernel is register-resident and the
# saved HBM round-trip wins. Only valid when NR is inactive (NR consumes
# the pre-linearized image host-side).
KERNEL_LINEARIZE_IMAGE = True


def _prod(shape) -> int:
    out = 1
    for s in shape:
        out *= int(s)
    return out


def _trim_param_curves(params: dict, n_seg: int) -> dict:
    """Pre-trim curve segment slots so the packed vector stays small."""
    n_seg = max(n_seg, 1)

    def trim(curves: dict) -> dict:
        out = dict(curves)
        out["seg"] = curves["seg"][..., :n_seg, :]
        return out

    g = dict(params["glob"])
    g["curves"] = trim(g["curves"])
    m = params["mask"]
    if m is not None:
        m = dict(m)
        m["curves"] = trim(m["curves"])
    return {"glob": g, "mask": m}


def pack_params(params: dict):
    """Flatten the (traced) param pytree into one (1, K) f32 vector.

    Returns (vec, (treedef, shapes)) — the metadata is static.
    """
    leaves, treedef = jax.tree_util.tree_flatten(params)
    shapes = tuple(tuple(np.shape(l)) for l in leaves)
    flat = [jnp.ravel(jnp.asarray(l, jnp.float32)) for l in leaves]
    vec = jnp.concatenate(flat) if flat else jnp.zeros((1,), jnp.float32)
    pad = (-vec.shape[0]) % 128
    vec = jnp.pad(vec, (0, pad)).reshape(1, -1)
    return vec, (treedef, shapes)


def _nest_scalars(vals: list, shape: tuple):
    if shape == ():
        return vals[0]
    if len(shape) == 1:
        return tuple(vals)
    step = _prod(shape[1:])
    return tuple(
        _nest_scalars(vals[i * step : (i + 1) * step], shape[1:]) for i in range(shape[0])
    )


def unpack_params(vec_ref, meta, row=0):
    """Rebuild the params structure as nested tuples of scalar loads.
    `row` selects the image in a batched (B, K) SMEM matrix (dynamic SMEM
    indexing is a scalar-unit load either way)."""
    treedef, shapes = meta
    leaves = []
    off = 0
    for shape in shapes:
        n = _prod(shape)
        vals = [vec_ref[row, off + i] for i in range(n)]
        leaves.append(_nest_scalars(vals, shape))
        off += n
    return jax.tree_util.tree_unflatten(treedef, leaves)




def _make_dev_kernel(cfg, meta, blur_keys, has_flare_map, has_masks,
                     w_full, h_full, scale, include_finish,
                     kernel_linearize_image, gdim: int):
    """Build the megakernel body. `gdim` is the grid position of the tile
    axes: 0 for single-image (grid = (ti, tj)), 1 for the batched variant
    (grid = (b, ti, tj) — the batch index only affects BlockSpec index
    maps, never the math)."""

    def kernel(*refs):
        vec_ref = refs[0]
        img_ref = refs[1]
        idx = 2
        blur_refs = {"sharp": None, "tonal": None, "clarity": None, "structure": None}
        for k in blur_keys:
            blur_refs[k] = refs[idx]
            idx += 1
        flare_ref = None
        if has_flare_map:
            flare_ref = refs[idx]
            idx += 1
        mask_ref = None
        if has_masks:
            mask_ref = refs[idx]
            idx += 1
        out_ref = refs[idx]

        i = pl.program_id(gdim)
        j = pl.program_id(gdim + 1)
        # scalar param reads hoisted out of the chunk loop; in the batched
        # variant each image's params live in row b of the SMEM matrix
        p = unpack_params(vec_ref, meta, pl.program_id(0) if gdim else 0)
        g = p["glob"]
        m = p["mask"]
        x0s, y0s = p["tile_xy"]

        def body(ci, carry):
            r0 = ci * _CH
            rows = pl.ds(r0, _CH)
            img_tile = img_ref[:, rows, :]
            if kernel_linearize_image:
                from rapidraw_tpu.ops import colorspace as _cs0

                img_tile = _cs0.srgb_to_linear(img_tile)
            blur_tiles = {}
            for k in ("sharp", "tonal", "clarity", "structure"):
                if blur_refs[k] is None:
                    blur_tiles[k] = None
                    continue
                t = blur_refs[k][:, rows, :]
                if not cfg.is_raw:
                    from rapidraw_tpu.ops import colorspace as _cs

                    t = _cs.srgb_to_linear(t)  # once per level per chunk, in vregs
                blur_tiles[k] = t
            flare_tile = flare_ref[:, rows, :] if flare_ref is not None else None
            mask_tile = mask_ref[:, rows, :] if mask_ref is not None else None

            # Mosaic's iota is integer-only; cast after
            ys = (
                jax.lax.broadcasted_iota(jnp.int32, (_CH, _TW), 0).astype(jnp.float32)
                + ((i * _TH + r0).astype(jnp.float32) + y0s)
            )
            xs = (
                jax.lax.broadcasted_iota(jnp.int32, (_CH, _TW), 1).astype(jnp.float32)
                + ((j * _TW).astype(jnp.float32) + x0s)
            )

            final = grade_chain(
                img_tile,
                blur_tiles["sharp"], blur_tiles["tonal"],
                blur_tiles["clarity"], blur_tiles["structure"],
                flare_tile, g, m, mask_tile, cfg, xs, ys, w_full, h_full, scale,
            )
            if include_finish:
                final = finish_chain(final, g, cfg, xs, ys, scale, lut=None)
            out_ref[:, rows, :] = final
            return carry

        if _UNROLL_CHUNKS:
            # statically unrolled chunk loop: lets Mosaic schedule loads of
            # chunk ci+1 under the math of chunk ci (A/B:
            # tools/prof_fused_chunk.py)
            for ci in range(_TH // _CH):
                body(ci, 0)
        else:
            jax.lax.fori_loop(0, _TH // _CH, body, 0)

    return kernel


def develop_fused(
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
    """Drop-in replacement for pipeline.develop.develop on TPU.

    tile_offset/full_size: absolute placement when developing one tile of a
    larger image (pipeline.tiled) — the coordinate maps fed to the spatial
    stages (vignette, centre, grain, dither) are offset so tiles agree at
    seams, matching the reference's tile_offset uniforms
    (image_processing.rs:1402-1407).
    """
    _, h, w = image.shape
    x_off, y_off = tile_offset
    w_full, h_full = full_size if full_size is not None else (w, h)

    # blur levels stay in INPUT space; the kernel linearizes each tile once
    # in VMEM (saves a full HBM round-trip per level vs pre-linearizing).
    kernel_linearize_image = KERNEL_LINEARIZE_IMAGE and not cfg.is_raw and not cfg.nr_active
    initial_linear, blurs, flare_rgb, gated_infl, scale = prepare_inputs(
        image, params, cfg, masks, flare, linearize_blurs=False,
        linearize_image=not kernel_linearize_image,
        full_size=full_size, tile_offset=tile_offset, blur_bands=blur_bands,
        ca_indices=ca_indices,
    )

    params_t = dict(_trim_param_curves(params, cfg.curve_segments))
    # tile offsets ride the SMEM param vector as dynamic scalars, so every
    # interior tile of a huge image reuses ONE compiled kernel
    params_t["tile_xy"] = (
        jnp.asarray(x_off, jnp.float32),
        jnp.asarray(y_off, jnp.float32),
    )
    vec, meta = pack_params(params_t)

    # assemble tile-streamed inputs
    tile_inputs = [initial_linear]
    blur_keys = [k for k in ("sharp", "tonal", "clarity", "structure") if blurs[k] is not None]
    tile_inputs += [blurs[k] for k in blur_keys]
    has_flare_map = cfg.flare_active and flare_rgb is not None
    if has_flare_map:
        tile_inputs.append(flare_rgb)
    has_masks = cfg.mask_count > 0
    if has_masks:
        tile_inputs.append(gated_infl)

    # no explicit padding: Mosaic handles partial edge tiles (reads are
    # garbage-padded, writes clipped) — safe because the chain is elementwise
    padded = tile_inputs
    grid = (-(-h // _TH), -(-w // _TW))

    n_blurs = len(blur_keys)
    include_finish = not cfg.has_lut
    kernel = _make_dev_kernel(
        cfg, meta, blur_keys, has_flare_map, has_masks,
        w_full, h_full, scale, include_finish, kernel_linearize_image, gdim=0,
    )


    # param vector lives in SMEM: scalar-unit loads, far lighter to compile
    # and execute than VMEM vector extracts (610s -> measured much less)
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    for x in padded:
        nb = x.shape[0]
        in_specs.append(
            pl.BlockSpec((nb, _TH, _TW), lambda i, j: (0, i, j), memory_space=pltpu.VMEM)
        )

    interpret = jax.devices()[0].platform != "tpu"
    if interpret:
        # the interpreter lacks Mosaic's partial-tile handling: pad explicitly
        hp, wp = -h % _TH, -w % _TW
        padded = [jnp.pad(x, ((0, 0), (0, hp), (0, wp))) for x in padded]
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(
            (3, h, w) if not interpret else (3, h + (-h % _TH), w + (-w % _TW)),
            jnp.float32,
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (3, _TH, _TW), lambda i, j: (0, i, j), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=(
                pltpu.GridDimensionSemantics.PARALLEL,
                pltpu.GridDimensionSemantics.PARALLEL,
            ),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(vec, *padded)
    final = out[:, :h, :w]

    if not include_finish:
        ys = (
            jnp.arange(h, dtype=jnp.float32)[:, None] + jnp.asarray(y_off, jnp.float32)
        ) * jnp.ones((1, w), jnp.float32)
        xs = (
            jnp.arange(w, dtype=jnp.float32)[None, :] + jnp.asarray(x_off, jnp.float32)
        ) * jnp.ones((h, 1), jnp.float32)
        final = finish_chain(final, params["glob"], cfg, xs, ys, scale, lut=lut)
    return final


def pack_params_batched(params_list_stacked: dict):
    """(B, K) param matrix: image b's flattened params in row b — the
    batched analog of pack_params (same leaf order, same per-row layout,
    so unpack_params reads row blocks unchanged)."""
    leaves, treedef = jax.tree_util.tree_flatten(params_list_stacked)
    b = int(np.shape(leaves[0])[0]) if leaves else 1
    shapes = tuple(tuple(np.shape(l)[1:]) for l in leaves)
    per = [jnp.reshape(jnp.asarray(l, jnp.float32), (b, -1)) for l in leaves]
    vec = jnp.concatenate(per, axis=1) if per else jnp.zeros((b, 1), jnp.float32)
    pad = (-vec.shape[1]) % 128
    vec = jnp.pad(vec, ((0, 0), (0, pad)))
    return vec, (treedef, shapes)


def fusable_batched(cfg: DevelopConfig) -> bool:
    """Can the whole batch run as ONE megakernel launch? Configs needing
    per-image host-side prep (CA resample, NR kernel, flare map, LUT
    gather) fall back to the per-image path."""
    return not (cfg.ca_active or cfg.nr_active or cfg.flare_active or cfg.has_lut)


def develop_fused_batch(
    images: jnp.ndarray,
    params: dict,
    cfg: DevelopConfig,
    masks: jnp.ndarray | None = None,
    blur_bands: tuple | None = None,
) -> jnp.ndarray:
    """Develop a whole (B, 3, H, W) batch in ONE megakernel launch.

    The batch rides a leading grid dimension: image/blur/mask tiles index
    (b, i, j) and each image's packed params occupy row b of an SMEM
    matrix — no host-side per-image slicing or output restacking, which
    cost a measured ~2 ms/frame at 24MP in the scan/unroll paths. Blur
    pyramid levels are computed batched by folding B into the channel axis
    of the banded-matmul kernels. Requires fusable_batched(cfg).
    """
    assert fusable_batched(cfg), "config needs per-image prep; use develop_batch"
    b, _, h, w = images.shape

    from rapidraw_tpu.ops import colorspace as _cs
    from rapidraw_tpu.params import scales as _scales

    scale = _scales.resolution_scale(w, h)
    kernel_linearize_image = KERNEL_LINEARIZE_IMAGE and not cfg.is_raw

    imgs_in = images
    if not kernel_linearize_image and not cfg.is_raw:
        imgs_in = _cs.srgb_to_linear(images)

    blur_keys = []
    tile_inputs = [imgs_in]
    flat = images.reshape(b * 3, h, w)
    need = [
        (key, _scales.blur_radius(base_r, scale))
        for key, flag, base_r in (
            ("sharp", cfg.sharpness_blur_needed, _scales.BLUR_RADIUS_SHARPNESS),
            ("tonal", cfg.tonal_blur_needed, _scales.BLUR_RADIUS_TONAL),
            ("clarity", cfg.clarity_blur_needed, _scales.BLUR_RADIUS_CLARITY),
            ("structure", cfg.structure_blur_needed, _scales.BLUR_RADIUS_STRUCTURE),
        )
        if flag
    ]
    if need:
        from rapidraw_tpu.ops.blur import gaussian_blur_multi

        bands = {}
        if blur_bands:
            valid = {k for k, _ in need}
            bands = {
                k: (y0, y1) for k, y0, y1 in blur_bands
                if k in valid and 0 <= y0 < y1 <= h and (y1 - y0) < h
            }
        full_need = [(k, r) for k, r in need if k not in bands]
        band_need = [(k, r) for k, r in need if k in bands]
        if full_need:
            levels = gaussian_blur_multi(flat, tuple(r for _, r in full_need))
            for (key, _), blurred in zip(full_need, levels):
                blur_keys.append(key)
                tile_inputs.append(blurred.reshape(b, 3, h, w))
        if band_need:
            # mask-only level(s): blur just each level's row band (+radius
            # halo); rows outside are zeros the amount-gated consumers never
            # observe (pipeline.bands). Per-band launches — a shared union
            # slice measured slower (tools/prof_band_blur.py).
            groups: dict = {}
            for k, r in band_need:
                groups.setdefault(bands[k], []).append((k, r))
            for (y0, y1), items in groups.items():
                rmax = max(r for _, r in items)
                lo = max(0, y0 - rmax)
                hi = min(h, y1 + rmax)
                levels = gaussian_blur_multi(
                    flat[:, lo:hi], tuple(r for _, r in items)
                )
                for (key, _), blurred in zip(items, levels):
                    band = jnp.pad(
                        blurred[:, y0 - lo : y1 - lo],
                        ((0, 0), (y0, h - y1), (0, 0)),
                    )
                    blur_keys.append(key)
                    tile_inputs.append(band.reshape(b, 3, h, w))

    has_masks = cfg.mask_count > 0
    if has_masks:
        assert masks is not None
        gated = jnp.where(masks > 0.001, masks, 0.0)
        tile_inputs.append(gated)

    # per-image packed params: trim curves, append per-image (0,0) tile
    # offsets ((B,)-shaped so every packed leaf has a batch row)
    stacked_t = dict(_trim_param_curves(params, cfg.curve_segments))
    stacked_t["tile_xy"] = (
        jnp.zeros((b,), jnp.float32), jnp.zeros((b,), jnp.float32)
    )
    vec, meta = pack_params_batched(stacked_t)

    include_finish = True  # no-LUT guaranteed by fusable_batched
    kernel = _make_dev_kernel(
        cfg, meta, blur_keys, False, has_masks,
        w, h, scale, include_finish, kernel_linearize_image, gdim=1,
    )

    grid = (b, -(-h // _TH), -(-w // _TW))
    # whole-array SMEM: Mosaic's block divisibility rules reject a (1, K)
    # row block; the kernel row-indexes with program_id(0) instead
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    padded = tile_inputs
    interpret = jax.devices()[0].platform != "tpu"
    if interpret:
        hp, wp = -h % _TH, -w % _TW
        padded = [jnp.pad(x, ((0, 0), (0, 0), (0, hp), (0, wp))) for x in padded]
    for x in padded:
        nc = x.shape[1]
        in_specs.append(
            pl.BlockSpec((None, nc, _TH, _TW), lambda bb, i, j: (bb, 0, i, j),
                         memory_space=pltpu.VMEM)
        )

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(
            (b, 3, h, w) if not interpret
            else (b, 3, h + (-h % _TH), w + (-w % _TW)),
            jnp.float32,
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (None, 3, _TH, _TW), lambda bb, i, j: (bb, 0, i, j),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=(
                pltpu.GridDimensionSemantics.PARALLEL,
                pltpu.GridDimensionSemantics.PARALLEL,
                pltpu.GridDimensionSemantics.PARALLEL,
            ),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(vec, *padded)
    return out[:, :, :h, :w]
