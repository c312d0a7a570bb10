"""AI patch (generative replace) compositing.

Port of composite_patches_on_image (image_loader.rs:214-332): visible
aiPatches carrying base64 color + mask images (JPEG q92 in the
reference, ai_commands.rs:553-572) are alpha-blended onto the base
image before the geometry transform; patches without an explicit mask
rasterize their subMasks instead. The reference strips patch base64 on the
IPC hot path and re-hydrates from a cache (adjustment_utils.rs:47-91) — the
hydration cache here is the caller's concern.
"""

from __future__ import annotations

import base64
import io

import numpy as np


def _decode_image(b64: str, mode: str) -> np.ndarray | None:
    from PIL import Image

    data = b64.split(",", 1)[1] if "," in b64 else b64
    try:
        raw = base64.b64decode(data)
        return np.asarray(Image.open(io.BytesIO(raw)).convert(mode))
    except Exception:
        return None


def _resize(arr: np.ndarray, w: int, h: int) -> np.ndarray:
    from PIL import Image

    if arr.shape[1] == w and arr.shape[0] == h:
        return arr
    return np.asarray(Image.fromarray(arr).resize((w, h), Image.LANCZOS))


def composite_patches_on_image(
    image: np.ndarray, adjustments: dict, scale: float = 1.0
) -> np.ndarray:
    """image: planar (3, H, W) float; returns a composited copy when any
    visible patch applies, else the INPUT array unchanged (don't mutate
    the return value in place).

    scale: image resolution relative to the full-res coordinates the
    subMask parameters are expressed in (baked base64 masks resize to the
    canvas regardless; only the subMask-rasterized fallback needs it —
    the reference always composites at full res, image_loader.rs:214-332,
    so scale=1.0 is the reference-faithful default)."""
    patches = adjustments.get("aiPatches")
    if not isinstance(patches, list) or not patches:
        return image
    visible = [
        p
        for p in patches
        if isinstance(p, dict)
        and p.get("visible", True)
        and isinstance((p.get("patchData") or {}).get("color"), str)
        and (p.get("patchData") or {}).get("color")
    ]
    if not visible:
        return image

    _, h, w = image.shape
    out = image.copy()
    for patch in visible:
        pd = patch["patchData"]
        mask_b64 = pd.get("mask")
        if isinstance(mask_b64, str) and mask_b64:
            mask = _decode_image(mask_b64, "L")
            if mask is None:
                continue
            mask = _resize(mask, w, h)
        else:
            from rapidraw_tpu.masks.rasterize import generate_mask_bitmap

            mask = generate_mask_bitmap(
                {
                    "visible": True,
                    "invert": bool(patch.get("invert", False)),
                    "opacity": 100.0,
                    "subMasks": patch.get("subMasks") or [],
                },
                w, h, scale=scale,
            )
            if mask is None:
                continue
        color = _decode_image(pd["color"], "RGB")
        if color is None:
            continue
        color = _resize(color, w, h).astype(np.float32) / 255.0

        alpha = mask.astype(np.float32) / 255.0
        # plain lerp: where alpha == 0 the blend is exactly `out`, so no
        # extra mask>0 gate is needed
        out = color.transpose(2, 0, 1) * alpha + out * (1.0 - alpha)
    return out.astype(np.float32)
