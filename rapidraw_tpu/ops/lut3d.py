"""3D LUT application with tetrahedral interpolation.

Port of shader.wgsl:1243-1311 (`sample_lut_tetrahedral`): the RGB cube is
split into 6 tetrahedra by the ordering of the fractional coordinates; the
output is a 4-corner barycentric blend. LUT parsing (.cube/.3dl/HALD) lives
host-side in rapidraw_tpu.io.lut. Planar (3, ...) layout.
"""

from __future__ import annotations

import jax.numpy as jnp


def sample_lut_tetrahedral(rgb: jnp.ndarray, lut: jnp.ndarray) -> jnp.ndarray:
    """rgb: (3, ...) in [0,1]; lut: (L, L, L, 3) indexed [r, g, b]."""
    size = lut.shape[0]
    scaled = jnp.clip(rgb, 0.0, 1.0) * (size - 1)
    i0 = jnp.floor(scaled)
    f = scaled - i0
    c0 = i0.astype(jnp.int32)
    c1 = jnp.minimum(c0 + 1, size - 1)

    flat = lut.reshape(-1, 3)

    def fetch(xi, yi, zi):
        idx = (xi * size + yi) * size + zi
        g = jnp.take(flat, idx.reshape(-1), axis=0).reshape(idx.shape + (3,))
        return jnp.moveaxis(g, -1, 0)  # back to planar (3, ...)

    r0, g0, b0 = c0[0], c0[1], c0[2]
    r1, g1, b1 = c1[0], c1[1], c1[2]
    fr, fg, fb = f[0], f[1], f[2]

    c000 = fetch(r0, g0, b0)
    c111 = fetch(r1, g1, b1)
    c100 = fetch(r1, g0, b0)
    c110 = fetch(r1, g1, b0)
    c101 = fetch(r1, g0, b1)
    c001 = fetch(r0, g0, b1)
    c011 = fetch(r0, g1, b1)
    c010 = fetch(r0, g1, b0)

    def t(w0, wa, ca, wb, cb, w1):
        return c000 * w0 + ca * wa + cb * wb + c111 * w1

    # 6 tetrahedra by sort order of (fr, fg, fb) — shader.wgsl:1256-1308
    t1 = t(1.0 - fr, fr - fg, c100, fg - fb, c110, fb)  # r > g > b
    t2 = t(1.0 - fr, fr - fb, c100, fb - fg, c101, fg)  # r > g, r > b >= g
    t3 = t(1.0 - fb, fb - fr, c001, fr - fg, c101, fg)  # b >= r > g
    t4 = t(1.0 - fb, fb - fg, c001, fg - fr, c011, fr)  # b > g >= r
    t5 = t(1.0 - fg, fg - fb, c010, fb - fr, c011, fr)  # g >= b > r
    t6 = t(1.0 - fg, fg - fr, c010, fr - fb, c110, fb)  # g >= r, b <= r

    res_hi = jnp.where(fg > fb, t1, jnp.where(fr > fb, t2, t3))
    res_lo = jnp.where(fb > fg, t4, jnp.where(fb > fr, t5, t6))
    return jnp.where(fr > fg, res_hi, res_lo)


def apply_lut(rgb: jnp.ndarray, lut: jnp.ndarray, intensity) -> jnp.ndarray:
    """mix(rgb, lut(rgb), intensity) (shader.wgsl:1699-1702)."""
    lut_color = sample_lut_tetrahedral(rgb, lut)
    return rgb * (1.0 - intensity) + lut_color * intensity
