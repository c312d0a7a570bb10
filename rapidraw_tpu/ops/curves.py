"""Device-side tone-curve evaluation.

The host bakes each curve into fixed-size per-segment Hermite coefficients
(params/curves.py); here we evaluate them branch-free: every pixel computes
all MAX_SEGMENTS cubics and masks by interval membership. This is the
vectorized equivalent of the shader's segment-search loop
(shader.wgsl:340-378) with identical arithmetic.
"""

from __future__ import annotations

import jax.numpy as jnp

from rapidraw_tpu.ops.common import luma


def eval_curve(val: jnp.ndarray, seg: jnp.ndarray, ends: jnp.ndarray, enabled) -> jnp.ndarray:
    """Evaluate one curve.

    Args:
      val: (...,) channel values in [0, 1].
      seg: (MAX_SEGMENTS, 7) [x0, x1, inv_dx, a, b, c, d] — host-baked
        power-form cubic per segment (params/curves.py bake_curve), /255
        pre-folded; identical math to the shader's Hermite basis
        (shader.wgsl:340-378) with the division and basis blends hoisted.
      ends: (4,) [x_first, y_first, x_last, y_last].
      enabled: scalar; 0 -> identity (count < 2, shader.wgsl:341).
    """
    x = val * 255.0
    # statically unrolled over segment slots (trimmed to
    # DevelopConfig.curve_segments) — keeps every intermediate at the pixel
    # shape, which both XLA and Mosaic fuse cleanly
    seg_val = jnp.zeros_like(x)
    any_seg = jnp.zeros_like(x, dtype=bool)
    n_seg = len(seg)
    for i in range(n_seg):
        x0, x1, inv_dx, a, b, c, d = (seg[i][j] for j in range(7))
        t = (x - x0) * inv_dx
        result_y = jnp.clip(((d * t + c) * t + b) * t + a, 0.0, 1.0)
        in_seg = (x > x0) & (x <= x1)
        seg_val = jnp.where(in_seg, result_y, seg_val)
        any_seg = any_seg | in_seg

    out = jnp.where(any_seg, seg_val, ends[3] / 255.0)  # loop fallthrough
    out = jnp.where(x >= ends[2], ends[3] / 255.0, out)
    out = jnp.where(x <= ends[0], ends[1] / 255.0, out)
    return jnp.where(enabled > 0.0, out, val)


def apply_all_curves(
    rgb: jnp.ndarray, curve_set: dict, rgb_maybe_active: bool = True
) -> jnp.ndarray:
    """Luma + RGB point curves with luma preservation (shader.wgsl:1218-1237).

    curve_set: {'seg': (4,S,7), 'ends': (4,4), 'enabled': (4,),
                'rgb_active': ()} — channel order luma, red, green, blue;
    each segment row is [x0, x1, inv_dx, a, b, c, d] (params/curves.py).

    `rgb_maybe_active` is the *static* union flag
    (DevelopConfig.rgb_curves_maybe_active): when False (the common case —
    only the luma curve edited) the whole rgb path compiles out and the
    eval cost drops to 3 lookups. When True, both paths are computed and
    selected by the traced per-document rgb_active flag.
    """
    seg, ends, en = curve_set["seg"], curve_set["ends"], curve_set["enabled"]

    def cv(v, i):
        return eval_curve(v, seg[i], ends[i], en[i])

    # luma-only path: the luma curve applied to each channel
    luma_path = jnp.stack([cv(rgb[0], 0), cv(rgb[1], 0), cv(rgb[2], 0)])
    if not rgb_maybe_active:
        return luma_path

    # RGB path: per-channel curves, luma curve drives overall luminance
    graded = jnp.stack([cv(rgb[0], 1), cv(rgb[1], 2), cv(rgb[2], 3)])
    luma_initial = luma(rgb)
    luma_target = cv(luma_initial, 0)
    luma_graded = luma(graded)
    scale = luma_target / jnp.where(luma_graded > 0.001, luma_graded, 1.0)
    rgb_path = jnp.where(luma_graded > 0.001, graded * scale, luma_target)
    max_comp = jnp.max(rgb_path, axis=0)
    rgb_path = jnp.where(max_comp > 1.0, rgb_path / max_comp, rgb_path)

    return jnp.where(curve_set["rgb_active"] > 0.0, rgb_path, luma_path)
