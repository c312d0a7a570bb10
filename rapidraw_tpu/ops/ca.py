"""Chromatic aberration correction: radial per-channel resampling.

Port of shader.wgsl:1077-1105 (`apply_ca_correction`): red and blue channels
are re-sampled at positions shifted toward/away from the image center by a
distance-proportional amount (nearest-neighbor via round). Planar (3, H, W).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _axis_indices(n: int, ca: float, off: int = 0, n_full: int | None = None) -> np.ndarray:
    """Static local sample indices for one axis of a (possibly tiled) image.

    `off`/`n_full`: the tile's absolute offset and the full-image extent —
    the optical center is the FULL image's center and edge clamping happens
    in absolute space (so every tile computes the same values the whole
    image would; the halo guarantees the clamped absolute index stays
    inside the tile except at true image edges, where tile == image edge).
    """
    n_full = n if n_full is None else n_full
    c = n_full / 2.0
    a = np.arange(n, dtype=np.float64) + off
    idx = np.clip(np.round(a - (a - c) * ca), 0, n_full - 1) - off
    return np.clip(idx, 0, n - 1).astype(np.int32)


def ca_host_indices(
    h: int, w: int, static_rc: float, static_by: float,
    tile_offset: tuple[int, int] = (0, 0),
    full_size: tuple[int, int] | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Host-side (ry, rx, by, bx) local sample indices for one tile.

    The tiled dispatch passes these as TRACED jit arguments: the float64
    host math matches the whole-image static path exactly (a traced-offset
    float32 recomputation rounds knife-edge samples differently), while the
    index arrays — unlike static constants — let all interior tiles share
    one compiled executable.
    """
    x_off, y_off = tile_offset
    w_full, h_full = full_size if full_size is not None else (w, h)
    return (
        _axis_indices(h, static_rc, y_off, h_full),
        _axis_indices(w, static_rc, x_off, w_full),
        _axis_indices(h, static_by, y_off, h_full),
        _axis_indices(w, static_by, x_off, w_full),
    )


def apply_ca_correction(
    input_rgb: jnp.ndarray, ca_rc, ca_by,
    static_rc: float | None = None, static_by: float | None = None,
    tile_offset=(0, 0), full_size: tuple[int, int] | None = None,
    precomputed=None,
) -> jnp.ndarray:
    """input_rgb: (3, H, W) input-space texture. ca_*: scalar shifts.

    The radial shift x' = x - (x-cx)*ca is separable per axis. CA amounts
    are global-only (never mask-blended), so the sample indices are
    compile-time constants: static 1-D axis gathers cost 6.3 ms for 24MP
    on v5e vs 437 ms for the flat 2-D gather. The dynamic path remains for
    callers without static amounts.

    tile_offset/full_size: absolute placement when input_rgb is one tile of
    a larger image (pipeline.tiled) — re-centering on the tile would shift
    red/blue toward each tile's own center and seam at tile boundaries.
    `precomputed` overrides the index computation with host-baked
    (ry, rx, by, bx) arrays (ca_host_indices) passed as traced arguments.
    """
    _, h, w = input_rgb.shape
    x_off, y_off = tile_offset
    w_full, h_full = full_size if full_size is not None else (w, h)
    if precomputed is not None:
        ry, rx, by, bx = precomputed
        r = input_rgb[0][ry, :][:, rx]
        b = input_rgb[2][by, :][:, bx]
        return jnp.stack([r, input_rgb[1], b])
    if static_rc is not None and static_by is not None:
        if not (isinstance(x_off, (int, float)) and isinstance(y_off, (int, float))):
            raise ValueError(
                "static CA amounts with traced tile offsets: pass "
                "precomputed=ca_host_indices(...) instead (float64 host "
                "rounding must match the whole-image static path)"
            )
        r = input_rgb[0]
        b = input_rgb[2]
        if static_rc != 0.0:
            ry = jnp.asarray(_axis_indices(h, static_rc, int(y_off), h_full))
            rx = jnp.asarray(_axis_indices(w, static_rc, int(x_off), w_full))
            r = r[ry, :][:, rx]
        if static_by != 0.0:
            by = jnp.asarray(_axis_indices(h, static_by, int(y_off), h_full))
            bx = jnp.asarray(_axis_indices(w, static_by, int(x_off), w_full))
            b = b[by, :][:, bx]
        return jnp.stack([r, input_rgb[1], b])
    cx_f = w_full / 2.0
    cy_f = h_full / 2.0
    ys = (
        jnp.arange(h, dtype=jnp.float32)[:, None] + jnp.asarray(y_off, jnp.float32)
    ) * jnp.ones((1, w), jnp.float32)
    xs = (
        jnp.arange(w, dtype=jnp.float32)[None, :] + jnp.asarray(x_off, jnp.float32)
    ) * jnp.ones((h, 1), jnp.float32)
    to_cx = xs - cx_f
    to_cy = ys - cy_f
    # dir * dist == to_center, so the shift is simply to_center * ca;
    # clamp in absolute space, then map back to (clamped) local indices
    def local(arr_abs, off, n, n_full):
        loc = jnp.clip(arr_abs, 0.0, float(n_full - 1)) - off
        return jnp.clip(jnp.round(loc).astype(jnp.int32), 0, n - 1)

    red_x = local(xs - to_cx * ca_rc, x_off, w, w_full)
    red_y = local(ys - to_cy * ca_rc, y_off, h, h_full)
    blue_x = local(xs - to_cx * ca_by, x_off, w, w_full)
    blue_y = local(ys - to_cy * ca_by, y_off, h, h_full)

    r_flat = input_rgb[0].reshape(-1)
    b_flat = input_rgb[2].reshape(-1)
    r = jnp.take(r_flat, (red_y * w + red_x).reshape(-1)).reshape(h, w)
    b = jnp.take(b_flat, (blue_y * w + blue_x).reshape(-1)).reshape(h, w)
    # center pixel (dist == 0) keeps the original sample (shader.wgsl:1085)
    # — round(x - 0) == x there, so no special case is needed.
    return jnp.stack([r, input_rgb[1], b])
