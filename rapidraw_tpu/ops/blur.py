"""Separable Gaussian blur pyramid — MXU banded-matmul kernels.

Semantics ported from blur.wgsl: truncated Gaussian with sigma = radius/2,
taps at [-radius, radius], clamp-to-edge sampling, normalized by the full
weight sum (edge samples duplicate the border pixel, so the weight total is
position-independent — blur.wgsl:40-51). Radius = max(1, ceil(base * scale))
per pyramid level (gpu_processing.rs:1326-1327, 1402-1405).

TPU design: a 1-D convolution along an axis is a banded Toeplitz matmul.
A depthwise conv is VPU-bound and catastrophically slow at radius ~150
(measured 871 ms for one 24MP blur); instead each 128-wide output tile is

    vertical:   out[i] = sum_q  K_q   @ x_block[i + q]
    horizontal: out[j] = sum_q  x_block[j + q] @ K_q^T

where K_q are 128x128 blocks of the Gaussian band matrix and q runs over
the band-window blocks of the same array (per-axis pad offsets chosen in
_pad_lo: tile-aligned, minimal window) — expressing the
overlapping window as multiple shifted BlockSpecs of one input lets Pallas
pipeline the HBM->VMEM streams automatically. Planar (3, H, W) layout makes
both directions transpose-free (a 24MP (H,W,3) transpose costs ~200 ms on
v5e; this whole pyramid level runs in a few ms).
"""

from __future__ import annotations

import contextvars
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F16_MAX = 65504.0

_TB = 128  # tile size along the blurred axis (matches K block size)
_TP = 512  # tile size along the passive axis
_S = 4  # output sub-blocks per tile (halo DMA amortization)


@functools.lru_cache(maxsize=64)
def _gauss_weights(radius: int) -> np.ndarray:
    sigma = radius / 2.0
    x = np.arange(-radius, radius + 1, dtype=np.float32)
    w = np.exp(-(x * x) / np.float32(2.0 * sigma * sigma))
    return (w / w.sum()).astype(np.float32)


def _pad_lo(radius: int, axis: int) -> int:
    """Low-side pad for the blurred axis — the band-window offset.

    Vertical pass (axis 0, sublanes): ceil(r/8)*8 — the smallest offset
    that (a) covers the taps (pad >= r) and (b) keeps the padded copy
    (8, 128)-tile-aligned, so the edge pad stays a cheap aligned copy.
    Horizontal pass (axis 1, lanes): lane alignment is 128, so the offset
    must be a full block — the centered ceil(r/TB)*TB scheme.

    MEASURED (v5e, 24MP, interleaved medians): pad_lo = r exactly (the
    minimal-window scheme) saves one 128-contraction matmul per tile but
    the misaligned 300 MB pad copy costs MORE than the matmul saved
    (blur r14: 5.98 -> 6.81 ms). Tile-aligned offsets keep the copy cheap
    while still shrinking the vertical band: nb_v = ceil((pad8+TB+r)/TB)
    = 2 at r<=112 (vs 3 centered) and 4 at r=152 (vs 5).
    """
    if axis == 0:
        return -(-radius // 8) * 8
    return -(-radius // _TB) * _TB


def _n_band_blocks(radius: int, pad_lo: int) -> int:
    """TB-aligned input blocks covering one output block's tap window
    [i*TB + pad_lo - r, i*TB + pad_lo + r + TB - 1]."""
    return -(-(pad_lo + radius + _TB) // _TB)


@functools.lru_cache(maxsize=64)
def _k_blocks(radius: int, pad_lo: int) -> np.ndarray:
    """(nb, TB, TB) blocks of the band matrix.

    With pad_lo elements prepended to the blurred axis,
    out[i*TB + b] = sum_q sum_t K[q, b, t] * P[i*TB + q*TB + t], where
    K[q, b, t] = w[q*TB + t - b - (pad_lo - r)].
    """
    w = _gauss_weights(radius)
    nb = _n_band_blocks(radius, pad_lo)
    k = np.zeros((nb, _TB, _TB), np.float32)
    for q in range(nb):
        for b in range(_TB):
            base = q * _TB - pad_lo - b + radius
            t0 = max(0, -base)
            t1 = min(_TB, 2 * radius + 1 - base)
            if t1 > t0:
                k[q, b, t0:t1] = w[base + t0 : base + t1]
    return k


def _bf16_dot(a, b):
    return jax.lax.dot(
        a.astype(jnp.bfloat16),
        b.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )


def _make_kernel(nb: int, axis: int, s: int):
    """Banded-matmul kernel with manual 3-pass bf16 splitting.

    Default MXU precision truncates inputs to bf16 (~2e-3 error on the
    blurred planes); full HIGHEST is 6 passes. Mosaic doesn't expose the
    HIGH (3-pass) mode, so we split both operands into bf16 hi+lo halves
    and take the three significant products — ~1.5e-5 relative error, well
    inside the 1e-3 fidelity budget, at half the cost of HIGHEST.

    `s` output sub-blocks are produced per tile from s+nb-1 input blocks —
    the halo blocks amortize over the superblock (DMA read amplification
    (s+nb-1)/s instead of nb).
    """

    def kernel(*refs):
        khi_ref, klo_ref = refs[0], refs[1]
        x_refs = refs[2 : 2 + s + nb - 1]
        out_ref = refs[2 + s + nb - 1]
        # split each input block once; sub-blocks share their halo splits.
        # the rgba16f-range clamp (blur.wgsl:35,44) runs in-kernel so the
        # host-side pad stays a pure copy XLA can fuse/stream
        hi_lo = []
        for r in x_refs:
            x = jnp.clip(r[0], 0.0, F16_MAX)
            xhi = x.astype(jnp.bfloat16).astype(jnp.float32)
            hi_lo.append((xhi, x - xhi))
        for si in range(s):
            acc = None
            for q in range(nb):
                xhi, xlo = hi_lo[si + q]
                if axis == 0:
                    d = (
                        _bf16_dot(khi_ref[q], xhi)
                        + _bf16_dot(khi_ref[q], xlo)
                        + _bf16_dot(klo_ref[q], xhi)
                    )
                else:
                    d = (
                        _bf16_dot(xhi, khi_ref[q].T)
                        + _bf16_dot(xlo, khi_ref[q].T)
                        + _bf16_dot(xhi, klo_ref[q].T)
                    )
                acc = d if acc is None else acc + d
            if axis == 0:
                out_ref[0, si * _TB : (si + 1) * _TB, :] = acc
            else:
                out_ref[0, :, si * _TB : (si + 1) * _TB] = acc

    return kernel


@functools.lru_cache(maxsize=1)
def _use_interpret() -> bool:
    return jax.devices()[0].platform != "tpu"


def _blur_axis(
    x: jnp.ndarray, radius: int, axis: int, grid_b_override: int | None = None
) -> jnp.ndarray:
    """Blur (C, N, M) along `axis` (0 -> N, 1 -> M), per-channel edge clamp.

    grid_b_override: the fast 2D-prepadded path (gaussian_blur) passes the
    superblock grid explicitly; the input then already carries the halo pad
    on the blurred axis and _TP alignment on the passive axis, and the
    output is returned uncropped."""
    c, n, m = x.shape
    pad = _pad_lo(radius, axis)
    nb = _n_band_blocks(radius, pad)

    if grid_b_override is not None:
        # prepadded input: the caller already applied the single 2D edge pad
        s = _S
        grid_b = grid_b_override
    else:
        # superblock: s output blocks per tile -> halo DMA amortized
        blocks_b = -(-(n if axis == 0 else m) // _TB)
        s = _S if blocks_b >= _S else 1
        grid_b = -(-blocks_b // s)

    if axis == 0:
        if grid_b_override is None:
            grid_p = -(-m // _TP)
            total_b = (grid_b * s + nb - 1) * _TB
            # one edge-mode pad: band weights are zero beyond `radius`, and
            # the passive-axis extension is cropped, so edge copies are safe
            x = jnp.pad(
                x,
                ((0, 0), (pad, total_b - pad - n), (0, -m % _TP)),
                mode="edge",
            )
        else:
            grid_p = m // _TP
        block = (1, _TB, _TP)
        oblock = (1, s * _TB, _TP)
        out_shape = (c, grid_b * s * _TB, grid_p * _TP)
        grid = (c, grid_b, grid_p)

        def imap(q):
            return lambda ci, i, j, q=q: (ci, i * s + q, j)

        omap = lambda ci, i, j: (ci, i, j)
    else:
        if grid_b_override is None:
            grid_p = -(-n // _TP)
            total_b = (grid_b * s + nb - 1) * _TB
            x = jnp.pad(
                x,
                ((0, 0), (0, -n % _TP), (pad, total_b - pad - m)),
                mode="edge",
            )
        else:
            grid_p = n // _TP
        block = (1, _TP, _TB)
        oblock = (1, _TP, s * _TB)
        out_shape = (c, grid_p * _TP, grid_b * s * _TB)
        grid = (c, grid_b, grid_p)

        def imap(q):
            return lambda ci, i, j, q=q: (ci, j, i * s + q)

        omap = lambda ci, i, j: (ci, j, i)

    k = _k_blocks(radius, pad)
    khi = k.astype(np.float32)  # split host-side: hi = bf16-rounded, lo = rest
    khi = jnp.asarray(khi).astype(jnp.bfloat16).astype(jnp.float32)
    klo = jnp.asarray(k) - khi
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    for q in range(s + nb - 1):
        in_specs.append(pl.BlockSpec(block, imap(q), memory_space=pltpu.VMEM))

    interpret = _use_interpret()
    out = pl.pallas_call(
        _make_kernel(nb, axis, s),
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(oblock, omap, memory_space=pltpu.VMEM),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=(
                pltpu.GridDimensionSemantics.PARALLEL,
                pltpu.GridDimensionSemantics.PARALLEL,
                pltpu.GridDimensionSemantics.PARALLEL,
            ),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(khi, klo, *([x] * (s + nb - 1)))
    if grid_b_override is not None:
        return out
    return out[:, :n, :m]


def _make_multi_kernel(nb: int, axis: int, s: int, cpg: int):
    """Channel-grouped variant of _make_kernel: output channel ci belongs
    to radius group ci // cpg and selects its K blocks by a dynamic leading
    index — one launch blurs every pyramid level of the same source."""

    def kernel(*refs):
        khi_ref, klo_ref = refs[0], refs[1]
        x_refs = refs[2 : 2 + s + nb - 1]
        out_ref = refs[2 + s + nb - 1]
        grp = pl.program_id(0) // cpg
        hi_lo = []
        for r in x_refs:
            x = jnp.clip(r[0], 0.0, F16_MAX)
            xhi = x.astype(jnp.bfloat16).astype(jnp.float32)
            hi_lo.append((xhi, x - xhi))
        for si in range(s):
            acc = None
            for q in range(nb):
                xhi, xlo = hi_lo[si + q]
                khi = khi_ref[grp, q]
                klo = klo_ref[grp, q]
                if axis == 0:
                    d = (
                        _bf16_dot(khi, xhi)
                        + _bf16_dot(khi, xlo)
                        + _bf16_dot(klo, xhi)
                    )
                else:
                    d = (
                        _bf16_dot(xhi, khi.T)
                        + _bf16_dot(xlo, khi.T)
                        + _bf16_dot(xhi, klo.T)
                    )
                acc = d if acc is None else acc + d
            if axis == 0:
                out_ref[0, si * _TB : (si + 1) * _TB, :] = acc
            else:
                out_ref[0, :, si * _TB : (si + 1) * _TB] = acc

    return kernel


def _blur_axis_multi(
    x: jnp.ndarray, radii: tuple, axis: int, grid_b: int, pad: int,
    src_mod: int | None,
) -> jnp.ndarray:
    """Blur prepadded (C, N, M) along `axis` with one radius per channel
    group. `src_mod`: when set, input channel for output ci is ci % src_mod
    (the first pass fans a 3-channel source out to 3*len(radii) outputs)."""
    c_in, n, m = x.shape
    groups = len(radii)
    cpg = src_mod if src_mod is not None else c_in // groups
    c_out = cpg * groups
    nb = max(_n_band_blocks(r, pad) for r in radii)
    s = _S

    k_all = np.zeros((groups, nb, _TB, _TB), np.float32)
    for gi, r in enumerate(radii):
        kg = _k_blocks(r, pad)
        k_all[gi, : kg.shape[0]] = kg
    khi = jnp.asarray(k_all).astype(jnp.bfloat16).astype(jnp.float32)
    klo = jnp.asarray(k_all) - khi

    if axis == 0:
        grid_p = m // _TP
        block = (1, _TB, _TP)
        oblock = (1, s * _TB, _TP)
        out_shape = (c_out, grid_b * s * _TB, grid_p * _TP)

        def imap(q):
            if src_mod is None:
                return lambda ci, i, j, q=q: (ci, i * s + q, j)
            return lambda ci, i, j, q=q: (ci % src_mod, i * s + q, j)

        omap = lambda ci, i, j: (ci, i, j)
    else:
        grid_p = n // _TP
        block = (1, _TP, _TB)
        oblock = (1, _TP, s * _TB)
        out_shape = (c_out, grid_p * _TP, grid_b * s * _TB)

        def imap(q):
            if src_mod is None:
                return lambda ci, i, j, q=q: (ci, j, i * s + q)
            return lambda ci, i, j, q=q: (ci % src_mod, j, i * s + q)

        omap = lambda ci, i, j: (ci, j, i)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    for q in range(s + nb - 1):
        in_specs.append(pl.BlockSpec(block, imap(q), memory_space=pltpu.VMEM))

    interpret = _use_interpret()
    return pl.pallas_call(
        _make_multi_kernel(nb, axis, s, cpg),
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        grid=(c_out, grid_b, grid_p),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(oblock, omap, memory_space=pltpu.VMEM),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=(
                pltpu.GridDimensionSemantics.PARALLEL,
                pltpu.GridDimensionSemantics.PARALLEL,
                pltpu.GridDimensionSemantics.PARALLEL,
            ),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(khi, klo, *([x] * (s + nb - 1)))


def gaussian_blur_multi(img: jnp.ndarray, radii: tuple) -> list:
    """All blur-pyramid levels of one (C, H, W) source in ONE launch pair.

    Per-level launches pay a ~2.5 ms fixed cost each at 24MP (pad
    construction + pipeline spin-up) regardless of radius; sharing one
    max-radius edge pad and running every level as a channel group of a
    single H and a single V kernel amortizes that across the pyramid
    (gpu_processing.rs:1402-1405 builds the same four levels per dispatch).
    Weights are identical to gaussian_blur — larger shared pads only
    prepend all-zero K blocks.
    """
    if FORCE_CONV.get() or len(radii) == 1:
        return [gaussian_blur(img, r) for r in radii]
    c, n, m = img.shape
    blocks_r = -(-n // _TB)
    blocks_c = -(-m // _TB)
    if blocks_r < _S or blocks_c < _S:
        return [gaussian_blur(img, r) for r in radii]

    pad_v = max(_pad_lo(r, 0) for r in radii)
    pad_h = max(_pad_lo(r, 1) for r in radii)
    nb_v = max(_n_band_blocks(r, pad_v) for r in radii)
    nb_h = max(_n_band_blocks(r, pad_h) for r in radii)
    grid_r = -(-blocks_r // _S)
    grid_c = -(-blocks_c // _S)
    need_r = (grid_r * _S + nb_v - 1) * _TB
    row_total = -(-need_r // _TP) * _TP
    col_total = (grid_c * _S + nb_h - 1) * _TB
    x = jnp.pad(
        img,
        ((0, 0), (pad_v, row_total - pad_v - n), (pad_h, col_total - pad_h - m)),
        mode="edge",
    )
    x = _blur_axis_multi(x, radii, axis=1, grid_b=grid_c, pad=pad_h, src_mod=c)
    x = _blur_axis_multi(x, radii, axis=0, grid_b=grid_r, pad=pad_v, src_mod=None)
    return [x[c * gi : c * gi + c, :n, :m] for gi in range(len(radii))]


# When set, gaussian_blur lowers to lax.conv instead of the Pallas banded
# matmul. Used by the spatially-sharded multi-chip path: XLA's SPMD
# partitioner inserts halo exchanges for convs automatically, while a
# pallas_call would be gathered+replicated across shards.
FORCE_CONV = contextvars.ContextVar("rapidraw_blur_force_conv", default=False)


def gaussian_blur(img: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Blur planar (3, H, W) with the reference's truncated Gaussian.

    Input samples are clamped to [0, F16_MAX] exactly as blur.wgsl:35,44 does
    before accumulation (the reference pyramid lives in rgba16f textures).
    """
    if FORCE_CONV.get():
        return gaussian_blur_reference(img, radius)
    x = img  # range clamp happens in-kernel on each loaded block
    c, n, m = x.shape
    pad_v = _pad_lo(radius, 0)
    pad_h = _pad_lo(radius, 1)
    nb_v = _n_band_blocks(radius, pad_v)
    nb_h = _n_band_blocks(radius, pad_h)
    blocks_r = -(-n // _TB)
    blocks_c = -(-m // _TB)
    if blocks_r >= _S and blocks_c >= _S:
        # fast path: ONE 2D edge pad serves both passes (edge-padding
        # commutes with a separable clamp-to-edge blur: the H-blurred pad
        # rows ARE the blurred edge rows the V pass needs)
        grid_r = -(-blocks_r // _S)
        grid_c = -(-blocks_c // _S)
        need_r = (grid_r * _S + nb_v - 1) * _TB
        row_total = -(-need_r // _TP) * _TP  # H-pass passive alignment
        col_total = (grid_c * _S + nb_h - 1) * _TB
        x = jnp.pad(
            x,
            ((0, 0), (pad_v, row_total - pad_v - n), (pad_h, col_total - pad_h - m)),
            mode="edge",
        )
        x = _blur_axis(x, radius, axis=1, grid_b_override=grid_c)
        x = _blur_axis(x, radius, axis=0, grid_b_override=grid_r)
        return x[:, :n, :m]
    x = _blur_axis(x, radius, axis=1)  # horizontal (blur.wgsl pass 1)
    return _blur_axis(x, radius, axis=0)  # vertical (pass 2)


def gaussian_blur_reference(img: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Slow XLA depthwise-conv path, kept as a cross-check oracle for tests.

    NOTE: on TPU, XLA lowers this conv through bf16 — accurate only to ~2e-3;
    run comparisons on CPU for exactness.
    """
    x = jnp.clip(img, 0.0, F16_MAX)
    weights = jnp.asarray(_gauss_weights(radius))
    xp = jnp.pad(x, ((0, 0), (0, 0), (radius, radius)), mode="edge")
    x = _conv1d(xp, weights, axis=1)
    xp = jnp.pad(x, ((0, 0), (radius, radius), (0, 0)), mode="edge")
    return _conv1d(xp, weights, axis=0)


def _conv1d(img: jnp.ndarray, weights: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Depthwise 1-D conv of planar (C, H, W) along spatial `axis` (valid)."""
    c = img.shape[0]
    nchw = img[None]
    k = weights.size
    kernel = weights.reshape(1, 1, 1, k) if axis == 1 else weights.reshape(1, 1, k, 1)
    kernel = jnp.broadcast_to(kernel, (c, 1) + kernel.shape[2:])
    out = lax.conv_general_dilated(
        nchw,
        kernel,
        window_strides=(1, 1),
        padding="VALID",
        feature_group_count=c,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=lax.Precision.HIGHEST,
    )
    return out[0]
