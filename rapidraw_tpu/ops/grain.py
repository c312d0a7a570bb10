"""Film grain, hash PRNG and output dither.

Ports of shader.wgsl:295-325 (position-hash PRNG, gradient noise, dither)
and :1704-1717 (grain compositing). Both the grain and the dither are pure
functions of pixel coordinates — deterministic and reproducible.
"""

from __future__ import annotations

import jax.numpy as jnp

from rapidraw_tpu.ops.common import fract, luma, mix, smoothstep


def hash2(px: jnp.ndarray, py: jnp.ndarray) -> jnp.ndarray:
    """fract-sin-free 2D hash (shader.wgsl:295-299)."""
    p3x = fract(px * 0.1031)
    p3y = fract(py * 0.1031)
    p3z = fract(px * 0.1031)
    d = p3x * (p3y + 33.33) + p3y * (p3z + 33.33) + p3z * (p3x + 33.33)
    p3x = p3x + d
    p3y = p3y + d
    p3z = p3z + d
    return fract((p3x + p3y) * p3z)


def gradient_noise(px: jnp.ndarray, py: jnp.ndarray) -> jnp.ndarray:
    """2D Perlin-style gradient noise with quintic fade (shader.wgsl:301-320)."""
    ix, iy = jnp.floor(px), jnp.floor(py)
    fx, fy = px - ix, py - iy
    ux = fx * fx * fx * (fx * (fx * 6.0 - 15.0) + 10.0)
    uy = fy * fy * fy * (fy * (fy * 6.0 - 15.0) + 10.0)

    def grad_dot(ox, oy):
        gx = hash2(ix + ox, iy + oy) * 2.0 - 1.0
        gy = hash2(ix + ox + 11.0, iy + oy + 37.0) * 2.0 - 1.0
        return gx * (fx - ox) + gy * (fy - oy)

    d00 = grad_dot(0.0, 0.0)
    d10 = grad_dot(1.0, 0.0)
    d01 = grad_dot(0.0, 1.0)
    d11 = grad_dot(1.0, 1.0)
    bottom = mix(d00, d10, ux)
    top = mix(d01, d11, ux)
    return mix(bottom, top, uy)


def dither_pattern(h: int, w: int) -> jnp.ndarray:
    """Screen-space hash dither in [-0.5, 0.5) (shader.wgsl:322-325)."""
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]
    return dither_from_coords(xs, ys)


def dither_from_coords(xs: jnp.ndarray, ys: jnp.ndarray) -> jnp.ndarray:
    # The shader's one-liner is fract(sin(dot(xy,(12.9898,78.233)))*43758.5)
    # (shader.wgsl:322-325). sin() is a software polynomial on the TPU VPU
    # (~2 ms for one 24MP evaluation — measured) and the one-liner's exact
    # values are GPU-implementation-defined in the reference anyway (vendor
    # sin precision varies); the fract-hash already used for grain
    # (shader.wgsl:295-299) supplies the same uniform screen-space noise at
    # multiply cost, keeping dither deterministic and coordinate-pure.
    return hash2(xs, ys) - 0.5


def apply_grain(
    rgb: jnp.ndarray, amount, size, roughness, scale: float,
    xs: jnp.ndarray | None = None, ys: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Luma-masked gradient-noise grain (shader.wgsl:1704-1717).

    `scale` is the resolution scale min(W,H)/1080 — grain frequency is
    resolution-adaptive so prints look identical across sizes.
    rgb is planar (3, H, W); xs/ys are absolute pixel coordinate maps
    (tile-safe), derived from the shape when omitted.
    """
    h, w = rgb.shape[-2], rgb.shape[-1]
    if ys is None:
        ys = jnp.arange(h, dtype=jnp.float32)[:, None] * jnp.ones((1, w), jnp.float32)
    if xs is None:
        xs = jnp.arange(w, dtype=jnp.float32)[None, :] * jnp.ones((h, 1), jnp.float32)

    amt = amount * 0.5
    freq = (1.0 / jnp.maximum(size, 0.1)) / scale
    l = jnp.maximum(0.0, luma(rgb))
    luma_mask = smoothstep(0.0, 0.15, l) * (1.0 - smoothstep(0.6, 1.0, l))
    noise_base = gradient_noise(xs * freq, ys * freq)
    noise_rough = gradient_noise(xs * freq * 0.6 + 5.2, ys * freq * 0.6 + 1.3)
    noise_val = mix(noise_base, noise_rough, roughness)
    return rgb + noise_val * amt * luma_mask
