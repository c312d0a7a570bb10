"""Separable Gaussian blur pyramid.

Port of blur.wgsl: truncated Gaussian with sigma = radius/2, taps at
[-radius, radius], clamp-to-edge sampling, normalized by the *full* weight
sum (edge samples duplicate the border pixel, so the weight total is
position-independent — blur.wgsl:40-51). Radius = max(1, ceil(base * scale))
per pyramid level (gpu_processing.rs:1326-1327, 1402-1405).

TPU mapping: edge-pad + two 1-D depthwise convolutions. XLA lowers these to
vectorized VPU stencils; radii are static per compilation (they depend only
on image shape), so the kernels are baked as constants.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np
from jax import lax

F16_MAX = 65504.0


@functools.lru_cache(maxsize=64)
def _gauss_weights(radius: int) -> np.ndarray:
    sigma = radius / 2.0
    x = np.arange(-radius, radius + 1, dtype=np.float32)
    w = np.exp(-(x * x) / np.float32(2.0 * sigma * sigma))
    return (w / w.sum()).astype(np.float32)


def gaussian_blur(img: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Blur (H, W, C) with the reference's truncated Gaussian.

    Input samples are clamped to [0, F16_MAX] exactly as blur.wgsl:35,44 does
    before accumulation (the pyramid lives in rgba16f textures).
    """
    h, w, c = img.shape
    x = jnp.clip(img, 0.0, F16_MAX)
    weights = jnp.asarray(_gauss_weights(radius))

    # horizontal pass
    xp = jnp.pad(x, ((0, 0), (radius, radius), (0, 0)), mode="edge")
    x = _conv1d(xp, weights, axis=1)
    # vertical pass
    xp = jnp.pad(x, ((radius, radius), (0, 0), (0, 0)), mode="edge")
    x = _conv1d(xp, weights, axis=0)
    return x


def _conv1d(img: jnp.ndarray, weights: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Depthwise 1-D convolution of (H, W, C) along `axis` (valid padding)."""
    h, w, c = img.shape
    nchw = img.transpose(2, 0, 1)[None]  # (1, C, H, W)
    k = weights.size
    if axis == 1:
        kernel = weights.reshape(1, 1, 1, k)
    else:
        kernel = weights.reshape(1, 1, k, 1)
    kernel = jnp.broadcast_to(kernel, (c, 1) + kernel.shape[2:])
    out = lax.conv_general_dilated(
        nchw,
        kernel,
        window_strides=(1, 1),
        padding="VALID",
        feature_group_count=c,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return out[0].transpose(1, 2, 0)
