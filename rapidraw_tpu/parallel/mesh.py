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

import jax
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
