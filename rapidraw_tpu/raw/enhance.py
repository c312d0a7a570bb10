"""RAW post-demosaic artifact suppression + gentle detail enhance.

Port of remove_raw_artifacts_and_enhance (image_processing.rs:2347-2551):
  * chroma pass: YCbCr bilateral over a sparse 3x3 grid of offsets
    {-5, -1, +3} with luma-difference range weights and a chroma-magnitude
    clamp that prevents color bleed (:2370-2452);
  * luma pass: 5x5 box-blur unsharp mask with edge-adaptive gain and a
    clipping-safe boost rescale (:2461-2551).

Implemented as shift-add stencils (static offsets -> XLA fuses to one VPU
pass each). Applied right after RAW develop when the corresponding settings
are enabled (image_loader.rs:62-150).
"""

from __future__ import annotations

import jax.numpy as jnp

_OFFSETS = (-5, -1, 3)
_OFFSET_SQ = {-5: 25.0, -1: 1.0, 3: 9.0}


def _rgb_to_ycc(rgb):
    r, g, b = rgb[0], rgb[1], rgb[2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b
    return y, cb, cr


def _ycc_to_rgb(y, cb, cr):
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return jnp.stack([r, g, b])


def _shift(plane: jnp.ndarray, dy: int, dx: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """plane[y+dy, x+dx] with a validity mask (the reference SKIPS
    out-of-bounds taps rather than clamping, :2394-2410)."""
    h, w = plane.shape
    pad = max(abs(dy), abs(dx))
    p = jnp.pad(plane, pad)
    shifted = p[pad + dy : pad + dy + h, pad + dx : pad + dx + w]
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    valid = ((ys + dy >= 0) & (ys + dy < h) & (xs + dx >= 0) & (xs + dx < w)).astype(
        plane.dtype
    )
    return shifted, valid


def remove_raw_artifacts_and_enhance(
    image: jnp.ndarray, color_nr_inv_sigma: float, sharpening_amount: float
) -> jnp.ndarray:
    """image: planar (3, H, W) linear [0,1]-ish. Both passes optional."""
    y, cb, cr = _rgb_to_ycc(image)
    out = image

    if color_nr_inv_sigma > 0.0:
        cb_sum = jnp.zeros_like(cb)
        cr_sum = jnp.zeros_like(cr)
        w_sum = jnp.zeros_like(y)
        for ky in _OFFSETS:
            ky_term = _OFFSET_SQ[ky] * 0.02
            for kx in _OFFSETS:
                ny, vy = _shift(y, ky, kx)
                ncb, _ = _shift(cb, ky, kx)
                ncr, _ = _shift(cr, ky, kx)
                y_diff = jnp.abs(y - ny)
                val = y_diff * color_nr_inv_sigma
                spatial_penalty = _OFFSET_SQ[kx] * 0.02 + ky_term
                weight = vy / (1.0 + val * val + spatial_penalty)
                cb_sum = cb_sum + ncb * weight
                cr_sum = cr_sum + ncr * weight
                w_sum = w_sum + weight

        inv_w = 1.0 / jnp.maximum(w_sum, 1e-12)
        f_cb = cb_sum * inv_w
        f_cr = cr_sum * inv_w
        orig_mag_sq = cb * cb + cr * cr
        filt_mag_sq = f_cb * f_cb + f_cr * f_cr
        clamp_scale = jnp.sqrt(
            orig_mag_sq / jnp.where(filt_mag_sq > 0.0, filt_mag_sq, 1.0)
        )
        need_clamp = (filt_mag_sq > orig_mag_sq) & (orig_mag_sq > 1e-12)
        out_cb = jnp.where(need_clamp, f_cb * clamp_scale, f_cb)
        out_cr = jnp.where(need_clamp, f_cr * clamp_scale, f_cr)
        ok = w_sum > 1e-4
        out_cb = jnp.where(ok, out_cb, cb)
        out_cr = jnp.where(ok, out_cr, cr)
        out = jnp.clip(_ycc_to_rgb(y, out_cb, out_cr), 0.0, 1.0)

    if sharpening_amount > 0.0:
        out = _gentle_detail_enhance(out, y, sharpening_amount)
    return out


def _box_blur_1d(plane: jnp.ndarray, axis: int, radius: int = 2) -> jnp.ndarray:
    """Clamped 1-D box mean (the USM blur, :2470-2504)."""
    pads = [(0, 0), (0, 0)]
    pads[axis] = (radius, radius)
    p = jnp.pad(plane, pads, mode="edge")
    acc = None
    for k in range(2 * radius + 1):
        sl = [slice(None), slice(None)]
        sl[axis] = slice(k, k + plane.shape[axis])
        v = p[tuple(sl)]
        acc = v if acc is None else acc + v
    return acc / (2 * radius + 1)


def _gentle_detail_enhance(rgb: jnp.ndarray, luma_source: jnp.ndarray, amount: float) -> jnp.ndarray:
    blurred = _box_blur_1d(_box_blur_1d(luma_source, 1), 0)
    detail = luma_source - blurred
    adaptive = jnp.where(jnp.abs(detail) > 0.1, amount * 0.3, amount)
    boost = detail * adaptive

    r, g, b = rgb[0], rgb[1], rgb[2]
    new_max = jnp.maximum(jnp.maximum(r, g), b) + boost
    new_min = jnp.minimum(jnp.minimum(r, g), b) + boost
    over = new_max > 1.0
    under = new_min < 0.0
    max_rgb = jnp.maximum(jnp.maximum(r, g), b)
    min_rgb = jnp.minimum(jnp.minimum(r, g), b)
    scale = jnp.where(
        over & under,
        0.0,
        jnp.where(
            over,
            (1.0 - max_rgb) / jnp.maximum(boost, 0.001),
            jnp.where(under, min_rgb / jnp.maximum(-boost, 0.001), 1.0),
        ),
    )
    safe_boost = boost * jnp.clip(scale, 0.0, 1.0)
    return jnp.clip(rgb + safe_boost, 0.0, 1.0)
