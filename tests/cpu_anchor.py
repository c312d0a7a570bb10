"""Independent fidelity anchor: the reference's CPU AgX path, transcribed
from the RUST (image_processing.rs:1566-1661 `calculate_agx_matrices_glam`
and :1686-1794 `apply_cpu_agx_tonemap`, :964-972 `apply_srgb_to_linear`)
— NOT from the WGSL that tests/oracle.py transcribes.

The reference ships two implementations of the AgX transform: the WGSL
megakernel (exact per-pixel sigmoids) and this CPU path used for unedited
thumbnails (file_management.rs:1346-1363), which evaluates the curve
through a 4096-entry floor-indexed LUT with the 2.4 gamma baked in.
Cross-checking the WGSL-derived oracle, the TPU kernels and this
Rust-derived transcription bounds the "shared misreading" risk: a
misread of the matrix derivation or the log encoding in ONE source shows
up as a disagreement here.

All math in float32 to mirror glam/f32.
"""

from __future__ import annotations

import numpy as np

WP_D65 = np.array([0.3127, 0.3290], np.float32)
PRIMARIES_SRGB = np.array([[0.64, 0.33], [0.30, 0.60], [0.15, 0.06]], np.float32)
PRIMARIES_REC2020 = np.array(
    [[0.708, 0.292], [0.170, 0.797], [0.131, 0.046]], np.float32
)

AGX_EPSILON = np.float32(1.0e-6)
AGX_MIN_EV = np.float32(-15.2)
AGX_MAX_EV = np.float32(5.0)
AGX_RANGE_EV = AGX_MAX_EV - AGX_MIN_EV
AGX_GAMMA = np.float32(2.4)
AGX_SLOPE = np.float32(2.3843)
AGX_TOE_POWER = np.float32(1.5)
AGX_SHOULDER_POWER = np.float32(1.5)
AGX_TOE_TRANSITION_X = np.float32(0.6060606)
AGX_TOE_TRANSITION_Y = np.float32(0.43446)
AGX_SHOULDER_TRANSITION_X = np.float32(0.6060606)
AGX_SHOULDER_TRANSITION_Y = np.float32(0.43446)
AGX_INTERCEPT = np.float32(-1.0112)
AGX_TOE_SCALE = np.float32(-1.0359)
AGX_SHOULDER_SCALE = np.float32(1.3475)

LUT_SIZE = 4096


def _xy_to_xyz(xy):
    x, y = float(xy[0]), float(xy[1])
    if y < 1e-6:
        return np.zeros(3, np.float64)
    return np.array([x / y, 1.0, (1.0 - x - y) / y], np.float64)


def _primaries_to_xyz_matrix(primaries, white_point):
    r = _xy_to_xyz(primaries[0])
    g = _xy_to_xyz(primaries[1])
    b = _xy_to_xyz(primaries[2])
    m = np.stack([r, g, b], axis=1)  # columns
    wp = _xy_to_xyz(white_point)
    s = np.linalg.inv(m) @ wp
    return np.stack([r * s[0], g * s[1], b * s[2]], axis=1)


def _rotate_and_scale_primary(primary, white_point, scale, rotation):
    p_rel = np.asarray(primary, np.float64) - np.asarray(white_point, np.float64)
    p_scaled = p_rel * scale
    s, c = np.sin(rotation), np.cos(rotation)
    return np.asarray(white_point, np.float64) + np.array(
        [p_scaled[0] * c - p_scaled[1] * s, p_scaled[0] * s + p_scaled[1] * c]
    )


def agx_matrices():
    """(pipe_to_rendering, rendering_to_pipe) — the Rust derivation."""
    pipe_to_xyz = _primaries_to_xyz_matrix(PRIMARIES_SRGB, WP_D65)
    base_to_xyz = _primaries_to_xyz_matrix(PRIMARIES_REC2020, WP_D65)
    xyz_to_base = np.linalg.inv(base_to_xyz)
    pipe_to_base = xyz_to_base @ pipe_to_xyz

    inset = [0.2946245, 0.25861925, 0.14641371]
    rotation = [0.03540329, -0.02108586, -0.06305724]
    outset = [0.2907764, 0.2631554, 0.04581072]

    inset_prims = [
        _rotate_and_scale_primary(PRIMARIES_REC2020[i], WP_D65, 1.0 - inset[i], rotation[i])
        for i in range(3)
    ]
    rendering_to_xyz = _primaries_to_xyz_matrix(inset_prims, WP_D65)
    base_to_rendering = xyz_to_base @ rendering_to_xyz

    # master_outset_ratio = 1.0, master_unrotation_ratio = 0.0
    outset_prims = [
        _rotate_and_scale_primary(PRIMARIES_REC2020[i], WP_D65, 1.0 - outset[i], 0.0)
        for i in range(3)
    ]
    outset_to_xyz = _primaries_to_xyz_matrix(outset_prims, WP_D65)
    rendering_to_base = np.linalg.inv(xyz_to_base @ outset_to_xyz)

    pipe_to_rendering = base_to_rendering @ pipe_to_base
    rendering_to_pipe = np.linalg.inv(pipe_to_base) @ rendering_to_base
    return (
        pipe_to_rendering.astype(np.float32),
        rendering_to_pipe.astype(np.float32),
    )


def _agx_sigmoid(x, power):
    # the sigmoid argument is non-negative on both branches (negative
    # scale flips the toe's sign), matching Rust powf domains
    return x / (1.0 + max(x, 0.0) ** power) ** (1.0 / power)


def _agx_scaled_sigmoid(x, scale, slope, power, tx, ty):
    return scale * _agx_sigmoid(slope * (x - tx) / scale, power) + ty


def _agx_curve_channel(x):
    if x < AGX_TOE_TRANSITION_X:
        r = _agx_scaled_sigmoid(
            x, AGX_TOE_SCALE, AGX_SLOPE, AGX_TOE_POWER,
            AGX_TOE_TRANSITION_X, AGX_TOE_TRANSITION_Y,
        )
    elif x <= AGX_SHOULDER_TRANSITION_X:
        r = AGX_SLOPE * x + AGX_INTERCEPT
    else:
        r = _agx_scaled_sigmoid(
            x, AGX_SHOULDER_SCALE, AGX_SLOPE, AGX_SHOULDER_POWER,
            AGX_SHOULDER_TRANSITION_X, AGX_SHOULDER_TRANSITION_Y,
        )
    return min(max(float(r), 0.0), 1.0)


def _curve_lut():
    lut = np.zeros(LUT_SIZE, np.float32)
    for i in range(LUT_SIZE):
        x = i / (LUT_SIZE - 1)
        lut[i] = max(_agx_curve_channel(x), 0.0) ** float(AGX_GAMMA)
    return lut


_LUT = None


def apply_cpu_agx_tonemap(rgb: np.ndarray) -> np.ndarray:
    """(3, H, W) linear pipe-space f32 -> tonemapped f32 in [0, 1]
    (image_processing.rs:1686-1794)."""
    global _LUT
    if _LUT is None:
        _LUT = _curve_lut()
    p2r, r2p = agx_matrices()
    x = np.asarray(rgb, np.float32)

    min_c = x.min(axis=0)
    lifted = np.where(min_c < 0.0, x - min_c, x)

    in_rendering = np.einsum("ij,jhw->ihw", p2r, lifted).astype(np.float32)
    rel = np.maximum(in_rendering / np.float32(0.18), AGX_EPSILON)
    log_encoded = (np.log2(rel) - AGX_MIN_EV) / AGX_RANGE_EV
    mapped = np.clip(log_encoded, 0.0, 1.0)

    # floor-indexed LUT lookup (the Rust casts to usize)
    idx = np.minimum((mapped * (LUT_SIZE - 1)).astype(np.int64), LUT_SIZE - 1)
    curved = _LUT[idx]

    final = np.einsum("ij,jhw->ihw", r2p, curved).astype(np.float32)
    return np.clip(final, 0.0, 1.0)


def apply_srgb_to_linear(rgb: np.ndarray) -> np.ndarray:
    """image_processing.rs:964-972."""
    x = np.maximum(np.asarray(rgb, np.float32), 0.0)
    return np.where(x <= 0.04045, x / 12.92, ((x + 0.055) / 1.055) ** 2.4)


def unedited_ldr_thumbnail_cpu(srgb: np.ndarray) -> np.ndarray:
    """The null-adjustments AgX thumbnail semantic for non-RAW sources
    (file_management.rs:1346-1363 with default_tm == 'agx')."""
    return apply_cpu_agx_tonemap(apply_srgb_to_linear(srgb))
