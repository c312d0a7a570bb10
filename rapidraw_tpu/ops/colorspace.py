"""Transfer functions and RGB<->HSV conversion (planar (3, ...) layout).

Ports of shader.wgsl:220-286 (srgb transfer, hsv) as vectorized jnp.
"""

from __future__ import annotations

import jax.numpy as jnp

from rapidraw_tpu.ops.common import fpow, fpow_lt1, fpow_static


def srgb_to_linear(c: jnp.ndarray) -> jnp.ndarray:
    """shader.wgsl:220-226. Elementwise on any shape."""
    # static exponent: x^2.4 = x^2 * x^0.4 — no Newton divide (fpow_static)
    higher = fpow_static(jnp.abs(c + 0.055) / 1.055, 2.4)
    lower = c / 12.92
    return jnp.where(c <= 0.04045, lower, higher)


def linear_to_srgb(c: jnp.ndarray) -> jnp.ndarray:
    """shader.wgsl:228-235 — clamps input to [0,1] first."""
    c = jnp.clip(c, 0.0, 1.0)
    higher = 1.055 * fpow_lt1(c, 1.0 / 2.4) - 0.055
    lower = c * 12.92
    return jnp.where(c <= 0.0031308, lower, higher)


def linear_to_srgb_extended(c: jnp.ndarray) -> jnp.ndarray:
    """shader.wgsl:237-244 — no upper clamp (values > 1 pass through curve)."""
    c = jnp.maximum(c, 0.0)
    higher = 1.055 * fpow_lt1(c, 1.0 / 2.4) - 0.055
    lower = c * 12.92
    return jnp.where(c <= 0.0031308, lower, higher)


def rgb_to_hsv(rgb: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """shader.wgsl:246-259. rgb (3, ...) -> (h_degrees, s, v) each (...)."""
    r, g, b = rgb[0], rgb[1], rgb[2]
    c_max = jnp.maximum(r, jnp.maximum(g, b))
    c_min = jnp.minimum(r, jnp.minimum(g, b))
    delta = c_max - c_min
    safe_delta = jnp.where(delta > 0.0, delta, 1.0)
    inv_delta = 1.0 / safe_delta  # one divide instead of three
    # the shader's fmod((g-b)/delta, 6.0) is an exact identity: the argument
    # is already in [-1, 1] (|g-b| <= delta), so the mod is dropped
    h_r = 60.0 * ((g - b) * inv_delta)
    h_g = 60.0 * ((b - r) * inv_delta + 2.0)
    h_b = 60.0 * ((r - g) * inv_delta + 4.0)
    # branch order matches the shader: c_max==r, elif c_max==g, else b
    h = jnp.where(c_max == r, h_r, jnp.where(c_max == g, h_g, h_b))
    h = jnp.where(delta > 0.0, h, 0.0)
    h = jnp.where(h < 0.0, h + 360.0, h)
    s = jnp.where(c_max > 0.0, delta / jnp.where(c_max > 0.0, c_max, 1.0), 0.0)
    return h, s, c_max


def hsv_to_rgb(h: jnp.ndarray, s: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """shader.wgsl:261-274. h in degrees; returns (3, ...)."""
    r, g, b = hsv_to_rgb_channels(h, s, v)
    return jnp.stack([r, g, b])


def hsv_to_rgb_channels(h, s, v):
    """hsv_to_rgb returning a (r, g, b) tuple — for scalar inputs inside
    Pallas kernels, where stacking scalars into a (3,) vector is rejected
    by Mosaic (tiny 1-D vectors have no lane layout)."""
    c = v * s
    # h in [0, 360): u = h/60 >= 0, so fmod(u, 2) == u - 2*floor(u*0.5)
    # exactly; mul-by-reciprocal-of-60 differs from the divide by <= 1 ulp
    # of u, far below sector width
    u = h * (1.0 / 60.0)
    x = c * (1.0 - jnp.abs(u - 2.0 * jnp.floor(u * 0.5) - 1.0))
    z = jnp.zeros_like(c)
    # sector table (shader's if/else chain; final else covers h >= 300)
    conds_trips = [
        ((h < 60.0), (c, x, z)),
        ((h >= 60.0) & (h < 120.0), (x, c, z)),
        ((h >= 120.0) & (h < 180.0), (z, c, x)),
        ((h >= 180.0) & (h < 240.0), (z, x, c)),
        ((h >= 240.0) & (h < 300.0), (x, z, c)),
    ]
    rp, gp, bp = c, z, x  # default: h >= 300
    for cond, (tr, tg, tb) in reversed(conds_trips):
        rp = jnp.where(cond, tr, rp)
        gp = jnp.where(cond, tg, gp)
        bp = jnp.where(cond, tb, bp)
    m = v - c
    return rp + m, gp + m, bp + m
