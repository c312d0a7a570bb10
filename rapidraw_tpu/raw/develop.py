"""RAW develop: CFA mosaic -> scene-linear RGB ready for the main pipeline.

Port of the reference's rawler-driven develop (raw_processing.rs:48-231):
  1. normalize: (raw - black) / (white - black), unclipped — the reference
     forces whitelevel to u32::MAX precisely to defer clipping
     (raw_processing.rs:101-103,125-126).
  2. white balance multipliers on CFA sites (rawler RawDevelop step).
  3. demosaic (bilinear / malvar / 2x2-speed).
  4. camera matrix -> linear sRGB primaries (rawler Calibrate step; the
     SRgb gamma step is removed, :115-117).
  5. highlight compression toward the min channel with luma-preserving
     rescale (:160-183), then clamp to [0, highlight_compression].

The output feeds `develop(..., cfg.is_raw=True)` which treats the input
texture as scene-linear.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from rapidraw_tpu.ops.common import mat3_apply
from rapidraw_tpu.raw.demosaic import (
    _phase_masks,
    demosaic_bilinear,
    demosaic_malvar,
    demosaic_speed,
)

_ALGOS = {
    "bilinear": demosaic_bilinear,
    "malvar": demosaic_malvar,
    "speed": demosaic_speed,
}


def apply_highlight_compression(
    rgb: jnp.ndarray, highlight_compression: float,
    clamp_limit: float | None = None,
) -> jnp.ndarray:
    """Channel-coupled highlight rolloff (raw_processing.rs:160-183).

    Values with max channel > 1.0 are compressed toward the pixel's min
    channel (reducing chroma), then rescaled so the max channel is
    preserved; finally everything clamps to [0, clamp_limit] —
    the compression limit normally, 1.0 on the fast-demosaic path
    (raw_processing.rs:130-134).
    """
    shc = max(float(highlight_compression), 1.01)
    limit = shc if clamp_limit is None else float(clamp_limit)
    r = jnp.maximum(rgb, 0.0)
    max_c = jnp.max(r, axis=0)
    min_c = jnp.min(r, axis=0)
    factor = jnp.clip(1.0 - (max_c - 1.0) / (shc - 1.0), 0.0, 1.0)
    compressed = min_c + (r - min_c) * factor
    compressed_max = jnp.max(compressed, axis=0)
    rescale = max_c / jnp.where(compressed_max > 1e-6, compressed_max, 1.0)
    result = jnp.where(compressed_max > 1e-6, compressed * rescale, max_c)
    out = jnp.where(max_c > 1.0, result, r)
    return jnp.clip(out, 0.0, limit)


def develop_cfa(
    cfa: jnp.ndarray,
    black_level: float,
    white_level: float,
    wb: np.ndarray,
    cam_to_srgb: np.ndarray,
    pattern: str = "RGGB",
    algorithm: str = "malvar",
    highlight_compression: float = 2.5,
    clamp_limit: float | None = None,
) -> jnp.ndarray:
    """CFA (H, W) uint16/float -> planar (3, H, W) float32 scene-linear sRGB.

    wb: (3,) multipliers normalized to green == 1 (raw/color.normalize_wb);
    cam_to_srgb: (3,3) from raw/color.camera_to_srgb_matrix.
    """
    h, w = cfa.shape
    x = (cfa.astype(jnp.float32) - black_level) / max(white_level - black_level, 1.0)

    # white balance on CFA sites (gains indexed by site color)
    masks = _phase_masks(h, w, pattern)
    gain = masks["R"] * float(wb[0]) + masks["G"] * float(wb[1]) + masks["B"] * float(wb[2])
    x = x * gain

    rgb = _ALGOS[algorithm](x, pattern)
    rgb = mat3_apply(jnp.asarray(cam_to_srgb, jnp.float32), rgb)
    return apply_highlight_compression(rgb, highlight_compression, clamp_limit)


def develop_cfa_xtrans(
    cfa: jnp.ndarray,
    black_level: float,
    white_level: float,
    wb: np.ndarray,
    cam_to_srgb: np.ndarray,
    xtrans: np.ndarray,
    highlight_compression: float = 2.5,
    clamp_limit: float | None = None,
) -> jnp.ndarray:
    """X-Trans CFA (H, W) -> planar (3, H, W) scene-linear sRGB.

    Same normalize/WB/matrix/highlight chain as develop_cfa with the
    6x6-periodic demosaic from raw/xtrans.py.
    """
    from rapidraw_tpu.raw.xtrans import demosaic_xtrans

    h, w = cfa.shape
    x = (cfa.astype(jnp.float32) - black_level) / max(white_level - black_level, 1.0)

    xt = np.asarray(xtrans, np.int32)
    reps = (h + 5) // 6 + 1, (w + 5) // 6 + 1
    site = np.tile(xt, reps)[:h, :w]
    gain = (
        (site == 0) * float(wb[0])
        + (site == 1) * float(wb[1])
        + (site == 2) * float(wb[2])
    ).astype(np.float32)
    x = x * jnp.asarray(gain)

    rgb = demosaic_xtrans(x, xt)
    rgb = mat3_apply(jnp.asarray(cam_to_srgb, jnp.float32), rgb)
    return apply_highlight_compression(rgb, highlight_compression, clamp_limit)


def develop_linear_raw(
    rgb: jnp.ndarray,
    black_level: float,
    white_level: float,
    apply_ungamma: bool = False,
    highlight_compression: float = 2.5,
    cam_matrix: np.ndarray | None = None,
    clamp_limit: float | None = None,
) -> jnp.ndarray:
    """Linear-DNG path (raw_processing.rs:81-86,107-112,138-188): no
    demosaic; optional camera-matrix calibration (skipped for the
    'skip_calib' linear modes), optional sRGB ungamma (the 'gamma' modes),
    same highlight handling. Order matches the reference: rawler's
    Calibrate step runs inside develop_intermediate, THEN the rescaled
    values are ungamma'd (raw_processing.rs:148-158)."""
    from rapidraw_tpu.ops.colorspace import srgb_to_linear

    x = (rgb.astype(jnp.float32) - black_level) / max(white_level - black_level, 1.0)
    if cam_matrix is not None:
        x = mat3_apply(jnp.asarray(cam_matrix, jnp.float32), x)
    x = jnp.maximum(x, 0.0)
    if apply_ungamma:
        x = srgb_to_linear(jnp.clip(x, 0.0, 1.0))
    return apply_highlight_compression(x, highlight_compression, clamp_limit)
