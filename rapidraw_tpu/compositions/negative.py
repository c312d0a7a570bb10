"""Film negative -> positive conversion.

Port of negative_conversion.rs: per-channel -log10 density (:116-119),
percentile bounds from the center 76% of a <=1080px reference (:49-105),
normalized sigmoid tone curve with exposure/contrast (:129-155), channel
weights, highlight desaturation rolloff (:161-171), gamma 1/2.2 output
(:173-175). Runs fully on-device (pure elementwise jnp).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class NegativeConversionParams:
    red_weight: float = 1.0
    green_weight: float = 1.0
    blue_weight: float = 1.0
    exposure: float = 0.0
    contrast: float = 1.0


def analyze_bounds(log_rgb: np.ndarray) -> np.ndarray:
    """Density bounds per channel (negative_conversion.rs:49-105).

    log_rgb: planar (3, H, W) of -log10 densities (host numpy).
    Returns (3, 2) [min, max]. Sampling: skip a 12% margin, every 3rd row,
    column stride targeting ~40k samples; 0.1%/99.9% percentiles.
    """
    _, h, w = log_rgb.shape
    mx = int(w * 0.12)
    my = int(h * 0.12)
    est = max((w - mx * 2), 0) * max((h - my * 2), 0)
    step = max(est // 40_000, 1)
    out = np.zeros((3, 2), np.float32)
    for c in range(3):
        vals = log_rgb[c, my : h - my : 3, mx : w - mx : step].reshape(-1)
        vals = vals[np.isfinite(vals)]
        if vals.size == 0:
            out[c] = (0.0, 1.0)
            continue
        vals = np.sort(vals)
        n = float(vals.size)
        mn = vals[min(int(n * 0.001), vals.size - 1)]
        mxv = vals[min(int(n * 0.999), vals.size - 1)]
        if mxv <= mn + 0.0001:
            mxv = mn + 1.0
        out[c] = (mn, mxv)
    return out


def run_pipeline(
    image: jnp.ndarray,
    params: NegativeConversionParams = NegativeConversionParams(),
    bounds: np.ndarray | None = None,
) -> jnp.ndarray:
    """Convert planar (3, H, W) [0,1] negative to positive (rs:107-180)."""
    log_px = -jnp.log10(jnp.clip(image, 1e-6, 1.0))
    if bounds is None:
        bounds = analyze_bounds(np.asarray(log_px))
    b = np.asarray(bounds, np.float32)

    k = 4.0 * max(params.contrast, 0.1)
    x0 = 0.6 - params.exposure * 0.25
    y0 = 1.0 / (1.0 + np.exp(k * x0))
    y1 = 1.0 / (1.0 + np.exp(-k * (1.0 - x0)))
    scale = 1.0 / (y1 - y0)

    mins = jnp.asarray(b[:, 0]).reshape(3, 1, 1)
    ranges = jnp.asarray(b[:, 1] - b[:, 0]).reshape(3, 1, 1)
    weights = jnp.asarray(
        [params.red_weight, params.green_weight, params.blue_weight], jnp.float32
    ).reshape(3, 1, 1)
    n = jnp.maximum((log_px - mins) / ranges, 0.0) * weights

    sigmoid = 1.0 / (1.0 + jnp.exp(-k * (n - x0)))
    curved = jnp.clip((sigmoid - y0) * scale, 0.0, 1.0)

    r, g, bl = curved[0], curved[1], curved[2]
    luma = 0.2126 * r + 0.7152 * g + 0.0722 * bl
    max_ch = jnp.max(curved, axis=0)
    overflow = jnp.clip((max_ch - 0.9) * 10.0, 0.0, 1.0)
    sat_reduction = jnp.where(max_ch > 0.9, overflow * overflow, 0.0)
    desat = curved + (luma - curved) * sat_reduction

    return jnp.power(jnp.clip(desat, 0.0, 1.0), 1.0 / 2.2)


def convert_negative(
    image: jnp.ndarray, params: NegativeConversionParams = NegativeConversionParams()
) -> jnp.ndarray:
    """Batch-path conversion: bounds from a <=1080px downscaled reference
    (negative_conversion.rs:316-326), applied to the full image."""
    from rapidraw_tpu.geometry.resize import downscale

    ref = downscale(image, 1080, 1080)
    log_ref = -jnp.log10(jnp.clip(ref, 1e-6, 1.0))
    bounds = analyze_bounds(np.asarray(log_ref))
    return run_pipeline(image, params, bounds)
