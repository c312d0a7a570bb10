"""Batch develop: vmap over images + parameter stacking with mask padding.

The reference processes one image at a time behind a mutex
(gpu_processing.rs GpuProcessor singleton); the TPU framework's unit of work
is a *batch* of same-shape images with per-image parameters, vmapped and
sharded across the device mesh (SURVEY.md §2 'Parallelism strategies':
batch-parallel export needs no collectives).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from rapidraw_tpu.params.parse import DevelopConfig, DevelopParams, merge_configs
from rapidraw_tpu.pipeline.develop import develop


def _pad_mask_sets(params: DevelopParams, target_n: int) -> DevelopParams:
    """Pad a document's mask stack to `target_n` entries (zero adjustments).

    Padded masks get zero influence bitmaps, so they are exact no-ops.
    """
    mask = params["mask"]
    if target_n == 0:
        return {"glob": params["glob"], "mask": None}

    def pad(x):
        x = np.asarray(x)
        n = x.shape[0]
        if n >= target_n:
            return x[:target_n]
        pad_width = [(0, target_n - n)] + [(0, 0)] * (x.ndim - 1)
        return np.pad(x, pad_width)

    if mask is None:
        # build an all-zero mask set with the right shapes from a template
        from rapidraw_tpu.params.parse import _shared_set  # noqa: PLC0415

        tmpl = _shared_set({})
        mask = {}
        for k, v in tmpl.items():
            if k == "curves":
                mask["curves"] = {
                    ck: np.zeros((0,) + np.asarray(cv).shape, np.float32)
                    for ck, cv in v.items()
                }
            else:
                mask[k] = np.zeros((0,) + np.asarray(v).shape, np.float32)

    out = {}
    for k, v in mask.items():
        if k == "curves":
            out["curves"] = {ck: pad(cv) for ck, cv in v.items()}
        else:
            out[k] = pad(v)
    return {"glob": params["glob"], "mask": out}


def stack_params(
    params_list: list[DevelopParams],
    configs: list[DevelopConfig],
    cfg: DevelopConfig | None = None,
) -> tuple[DevelopParams, DevelopConfig]:
    """Stack per-image params into batched arrays + the merged static config.

    `cfg` overrides the merge — the export service merges once per *bucket*
    so every chunk of the bucket shares one compilation (a chunk-local merge
    would give each chunk its own activity union, hence its own compile).
    """
    if cfg is None:
        cfg = merge_configs(configs)
    padded = [_pad_mask_sets(p, cfg.mask_count) for p in params_list]

    def _stack(*xs):
        # stack on HOST when every leaf is host data, then move the stacked
        # leaf to the device ONCE: one transfer per leaf at build time (vs
        # B small ones + a device stack), and the result is device-resident
        # so REPEATED jit calls don't re-upload it (a bare numpy leaf is
        # re-transferred on every call — measured as a ~30% hit on the
        # 2.9 ms config-1 bench frame)
        import numpy as _np

        if all(not isinstance(x, jax.Array) for x in xs):
            return jnp.asarray(_np.stack([_np.asarray(x) for x in xs]))
        return jnp.stack([jnp.asarray(x) for x in xs])

    stacked = jax.tree.map(_stack, *padded)
    return stacked, cfg


def _use_fused(cfg: DevelopConfig) -> bool:
    """Route the per-pixel chain through the fused Pallas megakernel?

    Default: on for TPU backends (measured faster — one kernel instead of
    many XLA fusions), off elsewhere (interpret mode is for testing only).
    Env override RAPIDRAW_FUSED=0/1.
    """
    env = os.environ.get("RAPIDRAW_FUSED")
    if env is not None:
        return env.strip().lower() not in ("0", "false", "no", "off", "")
    return jax.devices()[0].platform == "tpu"


# unroll threshold for the fused path: below this, python-unrolled per-image
# calls replace lax.scan (see the comment at the use site)
_UNROLL_MAX = int(os.environ.get("RAPIDRAW_UNROLL_MAX", "4"))


def develop_batch(
    images: jnp.ndarray,
    params: DevelopParams,
    cfg: DevelopConfig,
    masks: jnp.ndarray | None = None,
    lut: jnp.ndarray | None = None,
    flare: jnp.ndarray | None = None,
    fused: bool | None = None,
    blur_bands: tuple | None = None,
) -> jnp.ndarray:
    """Develop planar (B, 3, H, W) images with per-image stacked params.

    masks: (B, N, H, W) or None; lut/flare shared across the batch.
    fused: force the Pallas megakernel on/off (None = auto: TPU backend,
    env RAPIDRAW_FUSED override). The spatially-sharded multi-chip path
    passes False — pallas_call has no SPMD partitioning rule, so XLA would
    gather+replicate it across shards.
    blur_bands: static ((level, y0, y1), ...) row bands for mask-only blur
    levels (pipeline.bands.blur_band_rows over THIS batch's mask bitmaps) —
    exact, skips blur work outside the masks' support.
    """
    if fused is None:
        fused = _use_fused(cfg)
    if fused:
        from rapidraw_tpu.pipeline.fused import (
            develop_fused,
            develop_fused_batch,
            fusable_batched,
        )

        b = images.shape[0]
        if b > 1 and lut is None and flare is None and fusable_batched(cfg):
            # one megakernel launch for the whole batch: a leading grid
            # dimension replaces the host-side per-image slicing/stacking
            # that cost ~2 ms/frame at 24MP
            return develop_fused_batch(
                images, params, cfg, masks=masks, blur_bands=blur_bands
            )
        if b <= _UNROLL_MAX:
            # small batches unroll: lax.scan's per-step dynamic input slice
            # and output update each copy a full 300 MB frame — measured
            # ~2 ms/frame at 24MP (11.8 ms unrolled vs 13.8 scanned).
            # Static slices fuse/alias instead. Compile cost is one trace
            # per image, bounded by _UNROLL_MAX.
            outs = []
            for i in range(b):
                p_i = jax.tree.map(lambda x: x[i], params)
                mk_i = None if masks is None else masks[i]
                outs.append(
                    develop_fused(images[i], p_i, cfg, masks=mk_i, lut=lut,
                                  flare=flare, blur_bands=blur_bands)
                )
            return jnp.stack(outs)

        # large batches scan: the megakernel traces+compiles ONCE for any
        # batch size (an unrolled 100-image export would inline 100 kernels)
        def body(_, xs):
            if masks is None:
                img, p = xs
                mk = None
            else:
                img, p, mk = xs
            return None, develop_fused(
                img, p, cfg, masks=mk, lut=lut, flare=flare, blur_bands=blur_bands
            )

        xs = (images, params) if masks is None else (images, params, masks)
        _, out = jax.lax.scan(body, None, xs)
        return out
    fn = lambda img, p, mk: develop(
        img, p, cfg, masks=mk, lut=lut, flare=flare, blur_bands=blur_bands
    )
    if masks is None and cfg.mask_count == 0:
        return jax.vmap(lambda img, p: fn(img, p, None))(images, params)
    return jax.vmap(fn)(images, params, masks)
