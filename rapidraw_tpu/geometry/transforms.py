"""Orientation steps, flips, fine rotation, crop, and the composed
transform pipeline (adjustment_utils.rs:93-120, image_processing.rs:1063-1144).

All functions take/return planar (3, H, W) jnp arrays; parameters are
static Python values (crop/rotation changes retrace, matching XLA's static
shape model).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from rapidraw_tpu.geometry.params import geometry_params_from_json, is_geometry_identity
from rapidraw_tpu.geometry.warp import warp_image_geometry


def apply_coarse_rotation(image: jnp.ndarray, steps: int) -> jnp.ndarray:
    """90-degree steps (image_processing.rs:1063-1074). steps: 0..3.

    The reference's rotate90 turns the image clockwise (image crate).
    """
    steps = int(steps) % 4
    if steps == 0:
        return image
    # image crate rotate90 = clockwise = numpy rot90 with k=-1 on (H, W)
    return jnp.rot90(image, k=-steps, axes=(-2, -1))


def apply_flip(image: jnp.ndarray, horizontal: bool, vertical: bool) -> jnp.ndarray:
    if horizontal:
        image = image[..., :, ::-1]
    if vertical:
        image = image[..., ::-1, :]
    return image


def apply_rotation(image: jnp.ndarray, degrees: float) -> jnp.ndarray:
    """Fine rotation about center, bilinear, same-size canvas, black fill
    (imageproc rotate_about_center; image_processing.rs:1076-1094)."""
    if float(degrees) % 360.0 == 0.0:
        return image
    _, h, w = image.shape
    theta = np.deg2rad(degrees)
    c, s = np.cos(theta), np.sin(theta)
    cx, cy = w / 2.0, h / 2.0
    ys = jnp.arange(h, dtype=jnp.float32)[:, None] * jnp.ones((1, w), jnp.float32) - cy
    xs = jnp.arange(w, dtype=jnp.float32)[None, :] * jnp.ones((h, 1), jnp.float32) - cx
    # inverse rotation of output coords into source space
    src_x = cx + xs * c + ys * s
    src_y = cy - xs * s + ys * c
    valid = (src_x >= 0) & (src_y >= 0) & (src_x <= w - 1) & (src_y <= h - 1)
    xs0 = jnp.clip(jnp.floor(src_x), 0, w - 2).astype(jnp.int32)
    ys0 = jnp.clip(jnp.floor(src_y), 0, h - 2).astype(jnp.int32)
    wx = jnp.clip(src_x, 0, w - 1) - xs0
    wy = jnp.clip(src_y, 0, h - 1) - ys0

    def sample(plane):
        f = plane.reshape(-1)

        def g(yy, xx):
            return jnp.take(f, (yy * w + xx).reshape(-1)).reshape(xx.shape)

        top = g(ys0, xs0) * (1 - wx) + g(ys0, xs0 + 1) * wx
        bot = g(ys0 + 1, xs0) * (1 - wx) + g(ys0 + 1, xs0 + 1) * wx
        return jnp.where(valid, top * (1 - wy) + bot * wy, 0.0)

    return jnp.stack([sample(image[c]) for c in range(3)])


def apply_crop(image: jnp.ndarray, crop: dict | None) -> jnp.ndarray:
    """Crop rect in current-image pixels (image_processing.rs:1096-1124)."""
    if not isinstance(crop, dict):
        return image
    _, img_h, img_w = image.shape
    x = int(round(float(crop.get("x", 0))))
    y = int(round(float(crop.get("y", 0))))
    cw = int(round(float(crop.get("width", 0))))
    ch = int(round(float(crop.get("height", 0))))
    if cw <= 0 or ch <= 0 or x >= img_w or y >= img_h or x < 0 or y < 0:
        return image
    nw = min(img_w - x, cw)
    nh = min(img_h - y, ch)
    if nw <= 0 or nh <= 0:
        return image
    if x == 0 and y == 0 and nw == img_w and nh == img_h:
        return image
    return image[:, y : y + nh, x : x + nw]


def apply_all_transformations(
    image: jnp.ndarray, adjustments: dict, patch_scale: float = 1.0
) -> tuple[jnp.ndarray, tuple[float, float]]:
    """AI patches -> warp -> coarse rotate -> flip -> fine rotate -> crop
    (lib.rs:198-217 + adjustment_utils.rs:93-120).
    Returns (image, unscaled_crop_offset). patch_scale: image resolution
    relative to full-res subMask coordinates (downscaled-preview callers)."""
    if adjustments.get("aiPatches"):
        import numpy as _np

        from rapidraw_tpu.masks.patches import composite_patches_on_image

        image = jnp.asarray(
            composite_patches_on_image(
                _np.asarray(image), adjustments, scale=patch_scale
            )
        )

    p = geometry_params_from_json(adjustments)
    if not is_geometry_identity(p):
        import jax

        if jax.devices()[0].platform == "tpu":
            # planned two-pass Pallas warp (exact-path fallback inside);
            # the XLA gather costs ~2 s per 24MP frame on TPU
            from rapidraw_tpu.geometry.warp_fast import warp_image_fast

            image = warp_image_fast(image, p)
        else:
            image = warp_image_geometry(image, p)

    steps = int(adjustments.get("orientationSteps", 0) or 0)
    image = apply_coarse_rotation(image, steps)
    image = apply_flip(
        image,
        bool(adjustments.get("flipHorizontal", False)),
        bool(adjustments.get("flipVertical", False)),
    )
    image = apply_rotation(image, float(adjustments.get("rotation", 0.0) or 0.0))

    crop = adjustments.get("crop")
    pre_shape = image.shape
    image = apply_crop(image, crop if isinstance(crop, dict) else None)
    offset = (0.0, 0.0)
    # a rejected/identity crop (apply_crop returns the image unchanged)
    # must not report a phantom offset — masks would shift off-position
    if isinstance(crop, dict) and image.shape != pre_shape:
        offset = (float(crop.get("x", 0.0)), float(crop.get("y", 0.0)))
    return image, offset
