"""HDR exposure merge.

Equivalent of the reference's `merge_hdr` command (lib.rs:1399-1506), which
delegates to the image-hdr crate: images are linearized, weighted by a
hat function over pixel value, and averaged as radiance estimates
v / (exposure_time * gain). All images must share dimensions (checked like
lib.rs:1450-1473). Runs on-device as a pure weighted reduction.
"""

from __future__ import annotations

import jax.numpy as jnp


class HdrError(ValueError):
    pass


def _hat_weight(v: jnp.ndarray) -> jnp.ndarray:
    """Triangle (hat) weighting centered at 0.5, floored to keep extreme
    exposures contributing — the standard Debevec-style weight image-hdr
    uses."""
    return jnp.maximum(1.0 - jnp.abs(v - 0.5) * 2.0, 0.02)


def merge_hdr(
    images: list[jnp.ndarray],
    exposures_secs: list[float],
    gains_iso: list[float],
) -> jnp.ndarray:
    """Merge linearized planar (3, H, W) frames into linear radiance.

    Args:
      images: scene-linear [0,1] frames (sRGB sources must be linearized
        first — lib.rs:1433-1435).
      exposures_secs: shutter time per frame (required, lib.rs:1442-1446).
      gains_iso: ISO per frame (required, lib.rs:1436-1440).

    Returns planar (3, H, W) merged radiance normalized so the best-exposed
    content lands in [0, 1].
    """
    if len(images) < 2:
        raise HdrError("Please select at least two images to merge.")
    if not (len(images) == len(exposures_secs) == len(gains_iso)):
        raise HdrError("images, exposures and gains must align")
    shape = images[0].shape
    for i, img in enumerate(images[1:], 1):
        if img.shape != shape:
            raise HdrError(
                f"Dimension mismatch: image 0 is {shape[2]}x{shape[1]}, "
                f"image {i} is {img.shape[2]}x{img.shape[1]}"
            )

    num = jnp.zeros(shape, jnp.float32)
    den = jnp.zeros(shape, jnp.float32)
    for img, t, iso in zip(images, exposures_secs, gains_iso):
        if t <= 0 or iso <= 0:
            raise HdrError("exposure time and ISO must be positive")
        w = _hat_weight(img)
        radiance = img / (t * (iso / 100.0))
        num = num + w * radiance
        den = den + w
    merged = num / jnp.maximum(den, 1e-9)

    # normalize: map the mid-exposure frame's radiance scale back to ~[0,1];
    # "mid" is by effective exposure (t * gain), not argv order
    factors = [
        float(t) * (float(g) / 100.0)
        for t, g in zip(exposures_secs, gains_iso)
    ]
    scale = sorted(factors)[len(factors) // 2]
    return merged * scale


def read_exif_exposure(path: str) -> tuple[float | None, float | None]:
    """(exposure_secs, iso) from EXIF via PIL (lib.rs read_exposure/read_iso)."""
    from PIL import Image
    from PIL.ExifTags import Base as Tag

    try:
        exif = Image.open(path).getexif()
        merged = dict(exif)
        try:
            merged.update(exif.get_ifd(0x8769))  # Exif IFD
        except Exception:
            pass
        exp = merged.get(Tag.ExposureTime)
        # 0x8827 is ISOSpeedRatings in older Pillow / PhotographicSensitivity
        # in EXIF 2.3 naming; look the raw tag up directly so a missing enum
        # member can't raise inside this try and discard a valid exposure
        iso = merged.get(Tag.ISOSpeedRatings) or merged.get(0x8833)

        def _rational(v):
            # Pillow yields IFDRational OR a plain (num, den) tuple
            # depending on version/path; float() on the tuple raises
            if isinstance(v, tuple) and len(v) == 2:
                return float(v[0]) / float(v[1]) if v[1] else None
            return float(v)

        exp_f = _rational(exp) if exp else None
        if isinstance(iso, (list, tuple)):
            iso = iso[0] if iso else None
        iso_f = float(iso) if iso else None
        return exp_f, iso_f
    except Exception:
        return None, None
