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


def sharded_develop_batch(mesh: Mesh, cfg: DevelopConfig):
    """jit develop_batch with batch+spatial shardings over `mesh`.

    Returns fn(images (B,3,H,W), params, masks|None) -> (B,3,H,W); B must be
    divisible by the mesh batch axis, W by the x axis.
    """
    # images are planar (B, 3, H, W): batch-shard B, spatially shard W
    img_sh = NamedSharding(mesh, P("batch", None, None, "x"))
    mask_sh = NamedSharding(mesh, P("batch", None, None, "x"))
    param_sh = NamedSharding(mesh, P("batch"))

    @functools.partial(jax.jit, static_argnames=())
    def fn(images, params, masks=None):
        images = jax.lax.with_sharding_constraint(images, img_sh)
        params = jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(x, param_sh), params
        )
        if masks is not None:
            masks = jax.lax.with_sharding_constraint(masks, mask_sh)
        out = develop_batch(images, params, cfg, masks=masks)
        return jax.lax.with_sharding_constraint(out, img_sh)

    return fn
