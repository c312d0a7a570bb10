"""Energy-preserving area downscale.

Port of downscale_f32_image (image_processing.rs:197-354): area-weighted
box filtering computed on SQUARED pixel values with a square root at the
end — the reference's energy-preserving trick (:335-344). Aspect is
preserved via ratio = min(nw/W, nh/H) with rounded output dims (:205-207).

TPU mapping: the overlap-weight tables are separable, so the whole resample
is two matmuls on the MXU:  out^2 = Wy @ src^2 @ Wx^T,  with Wx/Wy built
host-side exactly like the reference's weight loops.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=32)
def _area_weights(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) normalized overlap weights (image_processing.rs:226-299)."""
    ratio = n_in / n_out
    w = np.zeros((n_out, n_in), np.float32)
    for i_out in range(n_out):
        start = i_out * ratio
        end = (i_out + 1) * ratio
        i0 = int(np.floor(start))
        i1 = min(int(np.ceil(end)), n_in)
        total = 0.0
        for i_in in range(i0, i1):
            ov = max(min(end, i_in + 1) - max(start, i_in), 0.0)
            if ov > 0:
                w[i_out, i_in] = ov
                total += ov
        if total > 0:
            w[i_out] /= total
    return w


def downscale(image: jnp.ndarray, nwidth: int, nheight: int) -> jnp.ndarray:
    """Downscale planar (3, H, W) to fit (nwidth, nheight), keeping aspect."""
    _, h, w = image.shape
    if nwidth <= 0 or nheight <= 0 or (nwidth >= w and nheight >= h):
        return image
    ratio = min(nwidth / w, nheight / h)
    new_w = int(round(w * ratio))
    new_h = int(round(h * ratio))
    if new_w == 0 or new_h == 0:
        return image

    wy = jnp.asarray(_area_weights(h, new_h))
    wx = jnp.asarray(_area_weights(w, new_w))
    sq = jnp.square(jnp.maximum(image, 0.0))

    def mm(a, b):
        return jax.lax.dot(
            a, b, precision=jax.lax.Precision.HIGHEST, preferred_element_type=jnp.float32
        )

    out = jnp.stack([mm(mm(wy, sq[c]), wx.T) for c in range(3)])
    return jnp.sqrt(jnp.maximum(out, 0.0))


def downscale_to_long_edge(image: jnp.ndarray, long_edge: int) -> jnp.ndarray:
    """Fit the longest side to `long_edge` (preview/thumbnail sizing)."""
    _, h, w = image.shape
    if max(h, w) <= long_edge:
        return image
    if w >= h:
        return downscale(image, long_edge, max(1, int(round(h * long_edge / w))))
    return downscale(image, max(1, int(round(w * long_edge / h))), long_edge)
