"""Output encoding: JPEG/PNG/TIFF/WebP via PIL (host).

Equivalent of export_processing.rs:388-469 (format dispatch + quality) —
AVIF/JXL are gated on PIL plugin availability and report a clear error.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def encode_image(
    planar: np.ndarray,
    path: str | Path,
    fmt: str | None = None,
    quality: int = 90,
) -> None:
    """Write planar (3, H, W) float [0,1] (or (H,W,3) u8) to disk."""
    from PIL import Image

    path = Path(path)
    fmt = (fmt or path.suffix.lstrip(".")).lower()
    from rapidraw_tpu.io.loader import to_uint8_hwc

    if planar.ndim == 3 and planar.shape[0] == 3 and planar.dtype != np.uint8:
        arr = to_uint8_hwc(planar)
    elif planar.ndim == 3 and planar.shape[0] == 3 and planar.dtype == np.uint8:
        arr = planar.transpose(1, 2, 0)  # device-quantized planar u8
    elif planar.ndim == 3 and planar.shape[-1] == 3:
        # interleaved (H, W, 3): floats scale like the planar branch —
        # a bare astype truncated [0,1] data to near-black
        if planar.dtype == np.uint8:
            arr = planar
        else:
            arr = (np.clip(planar, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
    else:
        raise ValueError(f"unsupported image array shape {planar.shape}")
    im = Image.fromarray(arr)

    if fmt in ("jpg", "jpeg"):
        im.save(path, "JPEG", quality=quality)
    elif fmt == "png":
        im.save(path, "PNG")
    elif fmt in ("tif", "tiff"):
        im.save(path, "TIFF")
    elif fmt == "webp":
        im.save(path, "WEBP", quality=quality)
    elif fmt in ("avif", "jxl"):
        # reference encodes both lossy (quality) and lossless (q>=100)
        # variants (export_processing.rs:388-469); JXL needs a plugin in
        # some PIL builds — gate with an actionable error either way
        kwargs = {"quality": quality}
        if quality >= 100:
            kwargs = {"quality": 100, "lossless": True} if fmt == "jxl" else {"quality": 100}
        try:
            im.save(path, fmt.upper(), **kwargs)
        except (KeyError, OSError, TypeError) as e:
            raise ValueError(f"format {fmt!r} not supported by this PIL build: {e}") from e
    else:
        raise ValueError(f"unsupported export format: {fmt}")


def encode_jpeg_bytes(planar: np.ndarray, quality: int = 85) -> bytes:
    """In-memory JPEG (the interactive preview reply path, lib.rs:560-582)."""
    import io

    from PIL import Image

    from rapidraw_tpu.io.loader import to_uint8_hwc

    arr = to_uint8_hwc(planar)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, "JPEG", quality=quality)
    return buf.getvalue()
