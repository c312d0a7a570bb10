"""Output encoding: JPEG/PNG/TIFF/WebP/AVIF via PIL, JXL via libjxl (host).

Equivalent of export_processing.rs:388-469 (format dispatch + quality) —
PNG from float renders and TIFF are 16-bit like the reference's Rgb16
encodes (:446-462, via cv2 — PIL can't write 48-bit RGB); AVIF is gated on
PIL plugin availability (present in this build); JXL uses the ctypes
libjxl binding (io/jxl.py) with a PIL fallback.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def write_tiff16(
    path: str | Path, arr16: np.ndarray, extra_tags: dict | None = None
) -> None:
    """Write (H, W, 3) u16 as an uncompressed baseline 16-bit RGB TIFF.

    PIL cannot represent 48-bit RGB, so the pixel strip is written by hand;
    the IFD (including any extra_tags, e.g. flattened EXIF) is serialized
    through PIL's ImageFileDirectory_v2, whose tobytes() auto-patches
    StripOffsets to land right after the directory block."""
    import struct

    from PIL.TiffImagePlugin import ImageFileDirectory_v2

    arr16 = np.ascontiguousarray(arr16, dtype=np.uint16)
    h, w, _ = arr16.shape
    ifd = ImageFileDirectory_v2()
    for tag, value in (extra_tags or {}).items():
        try:
            ifd[tag] = value
        except Exception:  # noqa: BLE001 — untypable foreign tag, skip it
            continue
    ifd[256] = w  # ImageWidth
    ifd[257] = h  # ImageLength
    ifd[258] = (16, 16, 16)  # BitsPerSample
    ifd[259] = 1  # Compression: none
    ifd[262] = 2  # Photometric: RGB
    ifd[273] = (0,)  # StripOffsets — patched by tobytes to end of IFD
    ifd[277] = 3  # SamplesPerPixel
    ifd[278] = h  # RowsPerStrip (single strip)
    ifd[279] = (h * w * 6,)  # StripByteCounts
    data = ifd.tobytes(8)
    with open(path, "wb") as f:
        f.write(b"II*\0" + struct.pack("<I", 8))
        f.write(data)
        f.write(arr16.astype("<u2").tobytes())


def read_tiff16_rgb(path: str | Path) -> np.ndarray | None:
    """(H, W, 3) u16 from a 16-bit RGB TIFF, or None when the file is not
    16-bit (8-bit TIFFs stay on the lossless PIL path). Reads the strip
    bytes directly for uncompressed files — PIL would silently truncate
    the pixels to 8-bit — and falls back to cv2 for compressed ones."""
    from PIL import Image

    with Image.open(path) as im:
        if not hasattr(im, "tag_v2"):
            return None
        t = dict(im.tag_v2)
    bits = t.get(258)
    if isinstance(bits, (tuple, list)):
        bits = bits[0] if bits else 0
    if bits != 16 or t.get(277, 3) != 3:
        return None
    h, w = int(t[257]), int(t[256])
    if int(t.get(259, 1)) == 1:
        offsets = t.get(273) or ()
        counts = t.get(279) or ()
        if not isinstance(offsets, (tuple, list)):
            offsets = (offsets,)
        if not isinstance(counts, (tuple, list)):
            counts = (counts,)
        raw = bytearray()
        with open(path, "rb") as f:
            head = f.read(2)
            endian = "<" if head == b"II" else ">"
            for off, cnt in zip(offsets, counts):
                f.seek(int(off))
                raw += f.read(int(cnt))
        arr = np.frombuffer(bytes(raw), dtype=endian + "u2")
        if arr.size != h * w * 3:
            return None
        return arr.reshape(h, w, 3)
    try:
        import cv2
    except ImportError:
        return None
    arr = cv2.imread(str(path), cv2.IMREAD_UNCHANGED)
    if arr is None or arr.dtype != np.uint16 or arr.ndim != 3:
        return None
    return np.ascontiguousarray(arr[..., ::-1])


def _write_deep(arr16: np.ndarray, path: Path, fmt: str) -> bool:
    """Write (H, W, 3) u16 as 16-bit PNG (cv2 — PIL cannot write 48-bit
    RGB) or 16-bit TIFF (own baseline writer). Returns False when no
    16-bit writer is available so the caller can degrade to 8-bit."""
    if fmt in ("tif", "tiff"):
        write_tiff16(path, arr16)
        return True
    try:
        import cv2
    except ImportError:
        return False
    ok = cv2.imwrite(str(path), np.ascontiguousarray(arr16[..., ::-1]))
    if not ok:
        raise ValueError(f"cv2 refused to encode {fmt} at {path}")
    return True


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

    # PNG from a float render and TIFF (always) are 16-bit in the reference:
    # f32 sources encode as Rgb16 (export_processing.rs:446-462), and u8
    # sources upgrade x*257 for TIFF while PNG keeps them 8-bit
    deep = fmt in ("png", "tif", "tiff")

    if planar.ndim == 3 and planar.shape[0] == 3:
        hwc = planar.transpose(1, 2, 0)
    elif planar.ndim == 3 and planar.shape[-1] == 3:
        hwc = planar
    else:
        raise ValueError(f"unsupported image array shape {planar.shape}")

    if deep:
        arr16 = None
        if hwc.dtype == np.uint16:
            arr16 = hwc
        elif hwc.dtype != np.uint8:
            # image crate f32 -> u16: (x.clamp(0,1) * 65535).round()
            arr16 = np.floor(
                np.clip(hwc.astype(np.float32), 0.0, 1.0) * 65535.0 + 0.5
            ).astype(np.uint16)
        elif fmt != "png":
            # TIFF upgrades u8 sources too (to_rgb16 scales by 257);
            # PNG leaves u8 sources 8-bit (image.clone())
            arr16 = hwc.astype(np.uint16) * 257
        if arr16 is not None:
            if _write_deep(arr16, path, fmt):
                return
            # no 16-bit writer available: degrade to 8-bit PIL below
            hwc = np.floor(arr16.astype(np.float32) / 257.0 + 0.5).astype(np.uint8)

    if hwc.dtype == np.uint8:
        arr = hwc
    elif hwc.dtype == np.uint16:
        arr = np.floor(hwc.astype(np.float32) / 257.0 + 0.5).astype(np.uint8)
    elif planar.ndim == 3 and planar.shape[0] == 3:
        arr = to_uint8_hwc(planar)
    else:
        # interleaved floats scale like the planar branch — a bare astype
        # truncated [0,1] data to near-black
        arr = (np.clip(hwc, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
    im = Image.fromarray(np.ascontiguousarray(arr))

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
