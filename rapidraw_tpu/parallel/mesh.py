"""Mesh construction and sharded develop entry points.

The reference has no distributed backend (single wgpu device; SURVEY.md §5.8)
— its scaling analog is 2048²+halo spatial tiling (gpu_processing.rs:1279).
TPU-native scaling instead uses:

  * `batch` axis — data parallelism: one image (or slice of the batch) per
    device, zero collectives on the hot path.
  * `x` axis — spatial parallelism: image width sharded across devices.
    The only cross-shard dependencies are the blur-pyramid convolutions and
    the NR/CA gathers; XLA's SPMD partitioner inserts the halo exchanges
    for convs automatically (the ICI analog of the reference's 128px tile
    overlap).

Both are expressed as jit shardings, never hand-written collectives.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rapidraw_tpu.params.parse import DevelopConfig
from rapidraw_tpu.pipeline.batch import develop_batch


def make_mesh(devices=None, batch: int | None = None, spatial: int | None = None) -> Mesh:
    """Build a (batch, x) mesh. Defaults to all devices on the batch axis."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if batch is None and spatial is None:
        batch, spatial = n, 1
    elif batch is None:
        batch = n // spatial
    elif spatial is None:
        spatial = n // batch
    if batch * spatial != n:
        raise ValueError(f"mesh {batch}x{spatial} != {n} devices")
    arr = np.asarray(devices).reshape(batch, spatial)
    return Mesh(arr, ("batch", "x"))


def sharded_develop_batch(mesh: Mesh, cfg: DevelopConfig, blur_bands=None):
    """jit develop_batch with batch+spatial shardings over `mesh`.

    Returns fn(images (B,3,H,W), params, masks|None, lut|None) -> (B,3,H,W);
    B must be divisible by the mesh batch axis, W by the x axis. `lut` is a
    (N,N,N,3) 3D LUT REPLICATED to every device (a LUT is ~1-5 MB and every
    shard needs all of it — replication over ICI beats serializing LUT
    buckets onto one chip, which round 3 did).

    Two regimes, chosen by the mesh shape:
      * batch-only (x == 1): shard_map over 'batch' — every device runs the
        full single-chip pipeline (including the fused Pallas megakernel)
        on its local batch shard, zero collectives.
      * spatial (x > 1): jit + sharding constraints with the Pallas paths
        disabled — the blur lowers to lax.conv so XLA's SPMD partitioner
        inserts the halo exchanges over ICI (the analog of the reference's
        128px tile overlap, gpu_processing.rs:1279), and the grade chain
        stays elementwise (trivially partitionable).
    """
    from jax import shard_map

    from rapidraw_tpu.ops import blur as blur_mod
    from rapidraw_tpu.ops import nr as nr_mod

    spatial = mesh.shape["x"] > 1
    img_sh = NamedSharding(mesh, P("batch", None, None, "x"))
    mask_sh = NamedSharding(mesh, P("batch", None, None, "x"))
    param_sh = NamedSharding(mesh, P("batch"))

    if not spatial:
        def body(images, params, masks, lut):
            out = develop_batch(
                images, params, cfg, masks=masks, lut=lut,
                blur_bands=blur_bands,
            )
            return out

        @jax.jit
        def fn(images, params, masks=None, lut=None):
            has_masks = masks is not None
            m_spec = P("batch") if has_masks else P()
            sm = shard_map(
                body, mesh=mesh,
                # lut replicates (P()): every batch shard samples the whole
                # cube locally, zero collectives on the hot path
                in_specs=(P("batch"), P("batch"), m_spec, P()),
                out_specs=P("batch"),
                check_vma=False,  # pallas_call outputs carry no vma info
            )
            return sm(images, params, masks, lut)

        return fn

    # ---- spatial regime (x > 1) -------------------------------------------
    # Round 5 (VERDICT r4 #2): the default spatial body is now shard_map +
    # the SAME fast kernels the single-chip path runs (fused Pallas
    # megakernel, Pallas NR, banded-matmul blur) on each W-shard, with an
    # explicit halo exchanged between neighbors over ICI via
    # jax.lax.ppermute — the direct analog of the reference's 128-px tile
    # overlap (gpu_processing.rs:1279-1340). Each shard develops its
    # halo-extended slab with absolute coordinates (the machinery
    # pipeline/tiled.py already uses: traced tile_xy in SMEM, host-baked
    # float64 CA indices per shard) and slices the halo off. Configs the
    # shard-local fused path can't express fall back to the XLA
    # sharding-constraint formulation (FORCE_CONV/FORCE_XLA), where the
    # SPMD partitioner inserts the halo exchanges for convs itself.
    from rapidraw_tpu.pipeline.batch import _use_fused

    fused_ok = (
        _use_fused(cfg)
        and not cfg.flare_active  # flare map is global (512² from the whole image)
        and not (
            cfg.nr_active
            and (cfg.nr_static_luma is None or cfg.nr_static_color is None)
        )  # mask-driven NR = per-pixel gather path, not SPMD-safe
        and os.environ.get("RAPIDRAW_NR_EXACT_JITTER") != "1"
        and os.environ.get("RAPIDRAW_SPATIAL_XLA") != "1"
    )
    if fused_ok:
        return _sharded_spatial_fused(mesh, cfg, blur_bands)

    lut_sh = NamedSharding(mesh, P())

    @functools.partial(jax.jit, static_argnames=())
    def fn(images, params, masks=None, lut=None):
        images = jax.lax.with_sharding_constraint(images, img_sh)
        params = jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(x, param_sh), params
        )
        if masks is not None:
            masks = jax.lax.with_sharding_constraint(masks, mask_sh)
        if lut is not None:
            lut = jax.lax.with_sharding_constraint(lut, lut_sh)
        token = blur_mod.FORCE_CONV.set(True)
        token_nr = nr_mod.FORCE_XLA.set(True)
        try:
            # row bands slice/pad the H axis, which the spatial regime never
            # shards (x shards W) — SPMD-safe
            out = develop_batch(
                images, params, cfg, masks=masks, lut=lut, fused=False,
                blur_bands=blur_bands,
            )
        finally:
            nr_mod.FORCE_XLA.reset(token_nr)
            blur_mod.FORCE_CONV.reset(token)
        return jax.lax.with_sharding_constraint(out, img_sh)

    return fn


def spatial_halo(cfg: DevelopConfig, h: int, w: int) -> int:
    """Static halo width for the fused spatial regime.

    Blur levels and CA both read the ORIGINAL input (prepare_inputs:
    gaussian_blur_multi runs on input_rgb), so their supports are
    independent: blur taps span the full radius (blur.wgsl:40), CA shifts
    by |ca| * max_extent / 2. NR, however, reads the CA-CORRECTED image
    (apply_noise_reduction consumes initial_linear), so its 16-px kernel
    halo (ops/nr._NR_HALO) COMPOUNDS with the CA shift: an NR tap 16 px
    into the halo needs CA-gathered data up to the shift further out, and
    the host-baked CA indices clamp to the slab — an under-sized halo
    would silently read wrong columns near interior seams."""
    import math

    from rapidraw_tpu.params import scales

    sc = scales.resolution_scale(w, h)
    hp = 8
    for flag, base_r in (
        (cfg.sharpness_blur_needed, scales.BLUR_RADIUS_SHARPNESS),
        (cfg.tonal_blur_needed, scales.BLUR_RADIUS_TONAL),
        (cfg.clarity_blur_needed, scales.BLUR_RADIUS_CLARITY),
        (cfg.structure_blur_needed, scales.BLUR_RADIUS_STRUCTURE),
    ):
        if flag:
            hp = max(hp, scales.blur_radius(base_r, sc))
    ca_pad = 0
    if cfg.ca_active:
        ca = max(abs(cfg.ca_static_rc), abs(cfg.ca_static_by))
        ca_pad = int(math.ceil(ca * max(w, h) / 2.0)) + 1
        hp = max(hp, ca_pad)
    if cfg.nr_active:
        from rapidraw_tpu.ops.nr import _NR_HALO

        hp = max(hp, _NR_HALO + ca_pad)
    return -(-hp // 8) * 8


def _sharded_spatial_fused(mesh: Mesh, cfg: DevelopConfig, blur_bands=None):
    """shard_map spatial develop: per-shard fused Pallas + ppermute halos."""
    from jax import shard_map
    from jax import lax

    from rapidraw_tpu.pipeline.fused import develop_fused

    nx = mesh.shape["x"]

    def body(images, params, masks, lut, cai):
        # images: LOCAL (B_l, 3, H, W_l) shard of the (B, 3, H, W) batch
        b_l, _, h, w_l = images.shape
        w_full = w_l * nx
        hp = spatial_halo(cfg, h, w_full)
        xi = lax.axis_index("x")

        # halo exchange over ICI: my right edge becomes my right
        # neighbor's left halo and vice versa (ppermute zero-fills the
        # chain ends; true image edges get edge-replicated columns instead,
        # matching the kernels' edge-clamp semantics)
        from_left = lax.ppermute(
            images[..., w_l - hp :], "x", [(i, i + 1) for i in range(nx - 1)]
        )
        from_right = lax.ppermute(
            images[..., :hp], "x", [(i, i - 1) for i in range(1, nx)]
        )
        repl_l = jnp.broadcast_to(images[..., :1], images.shape[:-1] + (hp,))
        repl_r = jnp.broadcast_to(images[..., -1:], images.shape[:-1] + (hp,))
        from_left = jnp.where(xi == 0, repl_l, from_left)
        from_right = jnp.where(xi == nx - 1, repl_r, from_right)
        ext = jnp.concatenate([from_left, images, from_right], axis=-1)

        if masks is not None:
            # masks feed only ELEMENTWISE influence maps (mask-driven NR is
            # excluded by fused_ok), so halo values are never read by
            # surviving outputs — zero-pad instead of exchanging
            masks = jnp.pad(masks, ((0, 0), (0, 0), (0, 0), (hp, hp)))

        # absolute x of the extended slab's first column (traced; rides the
        # megakernel's SMEM tile_xy like every interior tile in tiled.py)
        x0 = xi * w_l - hp

        outs = []
        for i in range(b_l):
            p_i = jax.tree.map(lambda x: x[i], params)
            mk_i = None if masks is None else masks[i]
            cai_i = None if cai is None else tuple(a[0] for a in cai)
            out = develop_fused(
                ext[i], p_i, cfg, masks=mk_i, lut=lut,
                tile_offset=(x0, 0), full_size=(w_full, h),
                blur_bands=blur_bands, ca_indices=cai_i,
            )
            outs.append(out[..., hp : hp + w_l])
        return jnp.stack(outs)

    @jax.jit
    def fn(images, params, masks=None, lut=None):
        b, _, h, w = images.shape
        if w % nx:
            raise ValueError(f"W={w} not divisible by mesh x={nx}")
        w_l = w // nx
        hp = spatial_halo(cfg, h, w)
        if hp > w_l:
            # the halo exchange sends each neighbor a slice of the LOCAL
            # shard, so a halo wider than the shard can't be assembled in
            # one ppermute hop — fail with the remedy instead of an opaque
            # broadcast error deep inside shard_map
            raise ValueError(
                f"spatial halo {hp} px exceeds the {w_l}-px W-shard "
                f"(W={w} over x={nx}): use fewer spatial shards or the "
                "XLA-constraint body (RAPIDRAW_SPATIAL_XLA=1)"
            )

        cai = None
        if cfg.ca_active:
            # host-baked float64 CA indices per shard (exactly the tiled
            # path's mechanism, ops/ca.ca_host_indices): LOCAL indices into
            # each shard's extended slab, stacked on a leading x-sharded
            # axis. Shifts never exceed the halo, so interior reads stay
            # inside the slab; absolute clamping bites only at true image
            # edges, where the slab edge IS the image edge.
            from rapidraw_tpu.ops.ca import ca_host_indices

            per_shard = [
                ca_host_indices(
                    h, w_l + 2 * hp, cfg.ca_static_rc, cfg.ca_static_by,
                    tile_offset=(i * w_l - hp, 0), full_size=(w, h),
                )
                for i in range(nx)
            ]
            cai = tuple(
                jnp.asarray(np.stack([s[k] for s in per_shard]))
                for k in range(4)
            )

        has_masks = masks is not None
        m_spec = P("batch", None, None, "x") if has_masks else P()
        cai_spec = (P("x"), P("x"), P("x"), P("x")) if cai is not None else P()
        sm = shard_map(
            body, mesh=mesh,
            in_specs=(
                P("batch", None, None, "x"),
                P("batch"),
                m_spec,
                P(),           # LUT replicated
                cai_spec,
            ),
            out_specs=P("batch", None, None, "x"),
            check_vma=False,  # pallas_call outputs carry no vma info
        )
        return sm(images, params, masks, lut, cai)

    return fn
