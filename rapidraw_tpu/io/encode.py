"""Output encoding: JPEG/PNG/TIFF/WebP/AVIF via PIL, JXL via libjxl (host).

Equivalent of export_processing.rs:388-469 (format dispatch + quality) —
AVIF is gated on PIL plugin availability (present in this build); JXL uses
the ctypes libjxl binding (io/jxl.py) with a PIL fallback.
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
    elif fmt == "jxl":
        # reference encodes lossless at q==100, else distance=(100-q)/10
        # (export_processing.rs:396-430) — PIL here has no JXL plugin, so
        # we bind the system libjxl directly (io/jxl.py); if neither the
        # plugin nor the library exists the error stays actionable
        from rapidraw_tpu.io.jxl import available as _jxl_ok, encode_jxl

        if _jxl_ok():
            Path(path).write_bytes(encode_jxl(arr, quality))
        else:
            try:
                kwargs = {"quality": 100, "lossless": True} if quality >= 100 else {"quality": quality}
                im.save(path, "JXL", **kwargs)
            except (KeyError, OSError, TypeError) as e:
                raise ValueError(f"format 'jxl' not supported by this PIL build: {e}") from e
    elif fmt == "avif":
        # reference encodes both lossy (quality) and lossless (q>=100)
        # variants (export_processing.rs:388-469)
        kwargs = {"quality": 100 if quality >= 100 else quality}
        try:
            im.save(path, "AVIF", **kwargs)
        except (KeyError, OSError, TypeError) as e:
            raise ValueError(f"format 'avif' not supported by this PIL build: {e}") from e
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
