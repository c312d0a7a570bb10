"""Shared numeric helpers matching WGSL built-in semantics.

Layout convention: images are PLANAR, channel-first — (3, H, W), or
generally (3, ...spatial). TPU rationale: a minor dimension of 3 wastes
lanes and makes transposes catastrophically slow (measured ~200 ms for one
24MP (H,W,3) transpose on v5e); planar planes keep W on the lane axis,
make the blur matmuls transpose-free, and measured ~25% faster on the
elementwise chain. Adjustment parameter maps are (H, W) (or scalars) and
broadcast against (3, H, W) naturally.
"""

from __future__ import annotations

import jax.numpy as jnp

# Rec.709 luma coefficients (shader.wgsl:214).
LUMA_COEFF = (0.2126, 0.7152, 0.0722)


def luma(rgb: jnp.ndarray) -> jnp.ndarray:
    """dot(c, LUMA_COEFF) (shader.wgsl:216-218). rgb: (3, ...) -> (...)."""
    return rgb[0] * LUMA_COEFF[0] + rgb[1] * LUMA_COEFF[1] + rgb[2] * LUMA_COEFF[2]


def mix(a, b, t):
    """WGSL mix: a*(1-t) + b*t."""
    return a * (1.0 - t) + b * t


def smoothstep(e0, e1, x):
    """WGSL smoothstep with a step-function fallback when e0 == e1.

    When both edges are static python floats (nearly every call site), the
    divide is hoisted to a host-side reciprocal — a VPU divide costs ~2.4x
    a multiply and the chain has ~15 smoothstep sites.
    """
    if isinstance(e0, (int, float)) and isinstance(e1, (int, float)):
        d = e1 - e0
        inv = 1.0 / d if d != 0.0 else 1e20
        t = jnp.clip((x - e0) * inv, 0.0, 1.0)
        return t * t * (3.0 - 2.0 * t)
    d = e1 - e0
    d = jnp.where(d == 0.0, 1e-20, d)
    t = jnp.clip((x - e0) / d, 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)


def fract(x):
    return x - jnp.floor(x)


def fpow(x, y):
    """pow for non-negative bases via hardware exp2/log2 + one refinement.

    Mosaic lowers lax.pow through a generic path measured at ~0.77 ms per
    24MP evaluation. The hardware log2 is coarse (3.5e-4 relative), so raw
    exp2(y*log2(x)) misses the 1e-3 fidelity budget after chained pows; one
    Newton step of the log against the (accurate, 5e-6) exp2 brings the
    identity to ~1.2e-5 relative at roughly a third of lax.pow's cost.
    Bases are flushed to a tiny positive value so x == 0 behaves like
    jnp.power for the exponents the pipeline uses (y > 0 -> 0, y == 0 -> 1).
    """
    safe = jnp.maximum(x, 1e-37)
    l = jnp.log2(safe)
    e = jnp.exp2(l)
    l = l + (safe - e) / (e * 0.6931471805599453)  # refine: + (x/e - 1)/ln2
    return jnp.exp2(jnp.asarray(y) * l)


def fpow_lt1(x, y):
    """fpow specialization for exponents |y| <= 1 (gamma-decode-style).

    The output's relative error is y * ln2 * (log2 error), so exponents
    below one CONTRACT the coarse hardware log2 — the Newton refinement is
    unnecessary there (raw identity measured ~4e-5 relative at y=1/2.4).
    Callers assert the static exponent; traced exponents use fpow.
    """
    safe = jnp.maximum(x, 1e-37)
    return jnp.exp2(jnp.asarray(y) * jnp.log2(safe))


def fpow_static(x, y: float):
    """fpow for a STATIC exponent y > 1: split x^y = x^n * x^f (n = floor,
    f = frac), the integer part by exact repeated multiplication and the
    fractional part via fpow_lt1 — which contracts the coarse hardware
    log2, so the whole thing needs NO Newton-refinement divide.

    Cost vs fpow: drops one divide + one exp2 + the refinement mul/sub per
    call (per-op table in PERFORMANCE.md: ~0.25 -> ~0.07 ms per 24MP op).
    Worst absolute error on [0, 1] inputs at y=2.4 is ~6e-5 (x^f relative
    error f*ln2*|log2 x|*3.5e-4 peaks mid-range where x^y is small), vs
    1.2e-5 refined and ~2.5e-3 raw. x == 0 behaves like jnp.power for
    y > 0 (the x^n factor is exactly 0).
    """
    assert isinstance(y, (int, float)) and y >= 1.0, "static exponent >= 1 only"
    n = int(y)
    f = y - n
    acc = fpow_lt1(x, f) if f else None
    for _ in range(n):  # n is tiny (2-3 at the call sites)
        acc = x if acc is None else acc * x
    return acc


def wgsl_mod(x, y):
    """WGSL % on floats: truncation-based remainder (sign follows x)."""
    return jnp.fmod(x, y)


def bcast3(v, rgb):
    """Broadcast a 3-vector along the channel axis of rgb.

    Python tuples/lists of floats are built as traced per-channel products
    (scalar constants only) rather than a concrete (3,) array — Pallas
    kernels reject captured array constants, and scalars fuse identically.
    """
    if isinstance(v, (tuple, list)):
        ones = jnp.ones_like(rgb[0])
        return jnp.stack([v[0] * ones, v[1] * ones, v[2] * ones])
    return jnp.asarray(v).reshape((3,) + (1,) * (rgb.ndim - 1))


def mat3_apply(m: jnp.ndarray, rgb: jnp.ndarray) -> jnp.ndarray:
    """out = M @ rgb per pixel, expanded as elementwise VPU math.

    A 3x3 einsum would lower to an MXU matmul which defaults to bf16
    accumulation on TPU — unacceptable for color matrices; the unrolled
    form stays in f32 and fuses into the surrounding elementwise chain.
    """
    r, g, b = rgb[0], rgb[1], rgb[2]
    # [i][j] chained indexing works for jnp arrays AND nested scalar tuples
    # (the fused megakernel passes params as SMEM scalars)
    return jnp.stack(
        [
            m[0][0] * r + m[0][1] * g + m[0][2] * b,
            m[1][0] * r + m[1][1] * g + m[1][2] * b,
            m[2][0] * r + m[2][1] * g + m[2][2] * b,
        ]
    )
