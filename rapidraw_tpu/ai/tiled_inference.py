"""Tiled model inference with mirror padding and seam blending.

Port of the reference's tiling harness (ai_processing.rs:536-780): models
with fixed input sizes (denoisers, inpainting) run over overlapping tiles
extracted with mirror (reflect) padding; overlapping bands are blended so
tile seams vanish. Quality presets trade tile overlap for speed exactly
like the reference (TILE_FASTER/BALANCED/HIGHER_QUALITY, :554-567).

TPU-shaped differences: tiles are gathered host-side then run as ONE
batched model call (the MXU wants batch), and the seam blend is a weighted
accumulation (weight 0.5 in overlap bands — the same arithmetic as the
reference's apply_seamless halving, expressed as a normalized average).
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass(frozen=True)
class TileParams:
    cs: int  # model input (context) size
    ucs: int  # useful center size
    overlap: int  # blend band width

    @property
    def pad(self) -> int:
        return (self.cs - self.ucs) // 2


TILE_BALANCED = TileParams(504, 480, 6)
TILE_FASTER = TileParams(504, 504, 0)
TILE_HIGHER_QUALITY = TileParams(504, 448, 12)


def select_tile_params(quality_0_1: float) -> TileParams:
    q = min(max(quality_0_1, 0.0), 1.0)
    if q <= 0.25:
        return TILE_FASTER
    if q >= 0.75:
        return TILE_HIGHER_QUALITY
    return TILE_BALANCED


def run_tiled(
    model_fn,
    image: np.ndarray,
    params: TileParams = TILE_BALANCED,
    batch_size: int = 8,
) -> np.ndarray:
    """Run `model_fn` over mirror-padded tiles of planar (3, H, W) float32.

    model_fn: callable (B, 3, cs, cs) -> (B, 3, cs, cs) (jitted by caller).
    Returns the stitched (3, H, W) output.
    """
    _, h, w = image.shape
    cs, ucs, ol, pad = params.cs, params.ucs, params.overlap, params.pad
    step = ucs - ol if ucs > ol else ucs

    # mirror-pad once; every tile is then a plain slice. The high-side pad
    # is exactly what the furthest tile reads (over-padding by +cs copied
    # ~20-25% extra mirrored pixels per call for nothing).
    ys = list(range(0, max(h - ol, 1), step))
    xs = list(range(0, max(w - ol, 1), step))
    pad_lo = pad
    pad_hi_y = max(0, ys[-1] + cs - pad_lo - h)
    pad_hi_x = max(0, xs[-1] + cs - pad_lo - w)
    src = np.pad(
        image, ((0, 0), (pad_lo, pad_hi_y), (pad_lo, pad_hi_x)), mode="reflect"
    )
    tiles = []
    coords = []
    for y0 in ys:
        for x0 in xs:
            tiles.append(src[:, y0 : y0 + cs, x0 : x0 + cs])
            coords.append((y0, x0))

    out = np.zeros((3, h, w), np.float32)
    wsum = np.zeros((1, h, w), np.float32)

    # per-tile blend weight over the USEFUL region: 0.5 in the overlap
    # bands (matching apply_seamless), 1 in the interior
    tw = np.ones((ucs, ucs), np.float32)
    if ol > 0:
        tw[:ol, :] *= 0.5
        tw[-ol:, :] *= 0.5
        tw[:, :ol] *= 0.5
        tw[:, -ol:] *= 0.5

    for start in range(0, len(tiles), batch_size):
        chunk = tiles[start : start + batch_size]
        n_valid = len(chunk)
        if n_valid < batch_size and len(tiles) > batch_size:
            # pad the remainder to the full batch shape: a jitted model_fn
            # would otherwise pay a second XLA compile for the odd shape
            chunk = chunk + [chunk[-1]] * (batch_size - n_valid)
        batch = np.stack(chunk)
        res = np.asarray(model_fn(batch))
        for b, (y0, x0) in enumerate(coords[start : start + n_valid]):
            useful = res[b][:, pad : pad + ucs, pad : pad + ucs]
            y1 = min(y0 + ucs, h)
            x1 = min(x0 + ucs, w)
            if y1 <= y0 or x1 <= x0:
                continue
            wslice = tw[: y1 - y0, : x1 - x0]
            out[:, y0:y1, x0:x1] += useful[:, : y1 - y0, : x1 - x0] * wslice
            wsum[:, y0:y1, x0:x1] += wslice
    return out / np.maximum(wsum, 1e-8)
