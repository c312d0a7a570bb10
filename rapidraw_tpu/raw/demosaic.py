"""Bayer demosaic on TPU.

Three algorithms, mirroring the reference's quality tiers
(raw_processing.rs:113-118, rawler DemosaicAlgorithm):
  * bilinear — 3x3 neighbor averaging (shift-add formulation; XLA fuses the
    taps into one VPU pass).
  * malvar   — Malvar-He-Cutler gradient-corrected bilinear (5x5), the
    high-quality default.
  * speed    — 2x2 superpixel binning to half resolution (thumbnails,
    matching rawler's Speed algorithm).

CFA input is a (H, W) float32 mosaic, already black-subtracted/normalized
and white-balanced. Pattern is a 2-char-per-row string like "RGGB" giving
the color of (row, col) = (0,0),(0,1),(1,0),(1,1).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_PATTERNS = ("RGGB", "BGGR", "GRBG", "GBRG")


def _phase_masks(h: int, w: int, pattern: str) -> dict[str, jnp.ndarray]:
    """(H, W) 0/1 masks for R, G, B sites.

    Built from broadcast iotas ON DEVICE — materializing them as numpy
    constants embeds 3x(H,W) f32 into the compiled executable (~300 MB at
    24MP), which blows past the axon remote-compile payload limit.
    """
    if pattern not in _PATTERNS:
        raise ValueError(f"unsupported CFA pattern {pattern!r}")
    ym = (jnp.arange(h, dtype=jnp.int32) % 2).astype(jnp.float32)[:, None]
    xm = (jnp.arange(w, dtype=jnp.int32) % 2).astype(jnp.float32)[None, :]
    cell = (
        (1.0 - ym) * (1.0 - xm),  # pattern[0]: even row, even col
        (1.0 - ym) * xm,          # pattern[1]
        ym * (1.0 - xm),          # pattern[2]
        ym * xm,                  # pattern[3]
    )
    masks = {}
    for c in "RGB":
        terms = [cell[i] for i in range(4) if pattern[i] == c]
        masks[c] = sum(terms[1:], terms[0])
    return masks


def _shift_sum(x: jnp.ndarray, taps: list[tuple[int, int, float]]) -> jnp.ndarray:
    """sum_k w_k * x[y+dy_k, x+dx_k] with edge clamping, via pad+slice."""
    r = max(max(abs(dy), abs(dx)) for dy, dx, _ in taps)
    xp = jnp.pad(x, ((r, r), (r, r)), mode="edge")
    h, w = x.shape
    out = None
    for dy, dx, wt in taps:
        sl = xp[r + dy : r + dy + h, r + dx : r + dx + w] * wt
        out = sl if out is None else out + sl
    return out


_K_RB = [(dy, dx, wt) for dy in (-1, 0, 1) for dx in (-1, 0, 1)
         for wt in ([[1, 2, 1], [2, 4, 2], [1, 2, 1]][dy + 1][dx + 1],)]
_K_G = [(-1, 0, 1.0), (0, -1, 1.0), (0, 0, 4.0), (0, 1, 1.0), (1, 0, 1.0)]


def demosaic_bilinear(cfa: jnp.ndarray, pattern: str = "RGGB") -> jnp.ndarray:
    """Bilinear demosaic: (H, W) -> planar (3, H, W)."""
    h, w = cfa.shape
    m = _phase_masks(h, w, pattern)
    planes = []
    for c, taps in (("R", _K_RB), ("G", _K_G), ("B", _K_RB)):
        sparse = cfa * m[c]
        num = _shift_sum(sparse, taps)
        den = _shift_sum(m[c], taps)
        planes.append(num / den)
    return jnp.stack(planes)


# Malvar-He-Cutler 5x5 kernels (x8 scaling), from the MSR-TR-2004-02 paper.
_MALVAR = {
    # G at R/B sites
    "g_at_rb": np.array(
        [
            [0, 0, -1, 0, 0],
            [0, 0, 2, 0, 0],
            [-1, 2, 4, 2, -1],
            [0, 0, 2, 0, 0],
            [0, 0, -1, 0, 0],
        ],
        np.float32,
    ) / 8.0,
    # R at green in R-row/B-col (and B equivalently)
    "rb_at_g_rrow": np.array(
        [
            [0, 0, 0.5, 0, 0],
            [0, -1, 0, -1, 0],
            [-1, 4, 5, 4, -1],
            [0, -1, 0, -1, 0],
            [0, 0, 0.5, 0, 0],
        ],
        np.float32,
    ) / 8.0,
    "rb_at_g_brow": np.array(
        [
            [0, 0, -1, 0, 0],
            [0, -1, 4, -1, 0],
            [0.5, 0, 5, 0, 0.5],
            [0, -1, 4, -1, 0],
            [0, 0, -1, 0, 0],
        ],
        np.float32,
    ) / 8.0,
    # R at B sites / B at R sites
    "rb_at_br": np.array(
        [
            [0, 0, -1.5, 0, 0],
            [0, 2, 0, 2, 0],
            [-1.5, 0, 6, 0, -1.5],
            [0, 2, 0, 2, 0],
            [0, 0, -1.5, 0, 0],
        ],
        np.float32,
    ) / 8.0,
}


def _conv5(x: jnp.ndarray, k: np.ndarray) -> jnp.ndarray:
    taps = [
        (dy - 2, dx - 2, float(k[dy, dx]))
        for dy in range(5)
        for dx in range(5)
        if k[dy, dx] != 0.0
    ]
    return _shift_sum(x, taps)


def demosaic_malvar(cfa: jnp.ndarray, pattern: str = "RGGB") -> jnp.ndarray:
    """Malvar-He-Cutler gradient-corrected demosaic: (H, W) -> (3, H, W)."""
    h, w = cfa.shape
    m = _phase_masks(h, w, pattern)
    g_interp = _conv5(cfa, _MALVAR["g_at_rb"])
    g = cfa * m["G"] + g_interp * (m["R"] + m["B"])

    # row phase masks: rows containing R sites vs rows containing B sites
    r_row = jnp.max(m["R"], axis=1, keepdims=True) * jnp.ones((1, w))
    b_row = 1.0 - r_row
    at_g = m["G"]

    def chan(c_mask, same_row):
        # same_row: 1 where this channel's sites share the row with G here
        direct = cfa * c_mask
        at_g_same = _conv5(cfa, _MALVAR["rb_at_g_rrow"]) * at_g * same_row
        at_g_cross = _conv5(cfa, _MALVAR["rb_at_g_brow"]) * at_g * (1.0 - same_row)
        opposite = _conv5(cfa, _MALVAR["rb_at_br"])
        return direct, at_g_same + at_g_cross, opposite

    r_direct, r_at_g, r_interp = chan(m["R"], r_row)
    b_direct, b_at_g, b_interp = chan(m["B"], b_row)
    r = r_direct + r_at_g + r_interp * m["B"]
    b = b_direct + b_at_g + b_interp * m["R"]
    return jnp.stack([r, g, b])


def demosaic_speed(cfa: jnp.ndarray, pattern: str = "RGGB") -> jnp.ndarray:
    """2x2 superpixel binning -> (3, H//2, W//2) (thumbnail path)."""
    h, w = cfa.shape
    h2, w2 = h // 2, w // 2
    cells = cfa[: h2 * 2, : w2 * 2].reshape(h2, 2, w2, 2).transpose(0, 2, 1, 3)
    pos = {c: [] for c in "RGB"}
    grid = [pattern[0:2], pattern[2:4]]
    for dy in range(2):
        for dx in range(2):
            pos[grid[dy][dx]].append((dy, dx))
    planes = []
    for c in "RGB":
        vals = [cells[:, :, dy, dx] for dy, dx in pos[c]]
        planes.append(sum(vals) / len(vals))
    return jnp.stack(planes)
