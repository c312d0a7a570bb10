"""Interactive render service — the headless equivalent of the reference's
preview worker (lib.rs:330-721).

Maps the reference's flow onto the TPU engine:
  * decoded-image LRU keyed by path (cache_utils.rs DecodedImageCache),
  * transformed-preview cache keyed by the transform hash
    (lib.rs:156-217 + cache_utils.rs:70-150),
  * mask bitmap cache keyed by (definition, size, scale, crop) hash
    (mask_generation.rs:1459-1511),
  * interactive quality divisor + JPEG quality from settings
    (lib.rs:364-368),
  * optional ROI rendering (gpu_processing.rs Roi): the ROI is cut from the
    transformed preview before develop, like the tile path.

The reference coalesces preview jobs on a worker thread; callers here get a
synchronous API (`render_preview`) — concurrency policy is the embedder's.
"""

from __future__ import annotations

import dataclasses
import json
import time
from typing import Any

import numpy as np

from rapidraw_tpu.utils.hashing import LruCache, calculate_transform_hash
from rapidraw_tpu.utils.settings import AppSettings


@dataclasses.dataclass
class PreviewResult:
    jpeg: bytes
    width: int
    height: int
    full_width: int
    full_height: int
    roi: tuple[int, int, int, int] | None
    seconds: float
    histogram: dict | None = None
    waveform: dict | None = None


class RenderService:
    def __init__(self, settings: AppSettings | None = None):
        if settings is None:
            from rapidraw_tpu.utils.settings import DEFAULTS

            settings = AppSettings(DEFAULTS)
        self.settings = settings
        self._decoded = LruCache(self.settings.image_cache_size)
        self._transformed = LruCache(8)
        self._mask_cache = LruCache(50)  # cap like mask_generation.rs:1503
        self._jit = {}

    # -- loading ----------------------------------------------------------
    def load(self, path: str) -> tuple[np.ndarray, bool]:
        hit = self._decoded.get(path)
        if hit is not None:
            return hit
        from rapidraw_tpu.io.loader import load_image

        img, is_raw = load_image(path)
        self._decoded.put(path, (img, is_raw))
        return img, is_raw

    # -- caches -----------------------------------------------------------
    def _transformed_preview(self, path: str, adjustments: dict, long_edge: int):
        import jax.numpy as jnp

        from rapidraw_tpu.geometry.resize import downscale_to_long_edge
        from rapidraw_tpu.geometry.transforms import apply_all_transformations

        key = (path, calculate_transform_hash(adjustments), long_edge)
        hit = self._transformed.get(key)
        if hit is not None:
            return hit
        img, is_raw = self.load(path)
        x, crop_offset = apply_all_transformations(jnp.asarray(img), adjustments)
        full_h, full_w = int(x.shape[1]), int(x.shape[2])
        x = downscale_to_long_edge(x, long_edge)
        entry = (np.asarray(x), crop_offset, (full_w, full_h), is_raw)
        self._transformed.put(key, entry)
        return entry

    def _masks(self, adjustments: dict, w: int, h: int, scale: float, crop_offset):
        import hashlib

        mask_defs = adjustments.get("masks")
        key_src = json.dumps(
            {"m": mask_defs, "w": w, "h": h, "s": scale, "c": crop_offset},
            sort_keys=True, default=str,
        )
        key = hashlib.blake2b(key_src.encode(), digest_size=8).hexdigest()
        hit = self._mask_cache.get(key)
        if hit is not None:
            return hit
        from rapidraw_tpu.masks.rasterize import rasterize_masks

        masks = rasterize_masks(
            adjustments, w, h, scale=scale,
            crop_offset=(crop_offset[0] * scale, crop_offset[1] * scale),
        )
        self._mask_cache.put(key, masks)
        return masks

    def _develop_fn(self, cfg):
        import jax

        from rapidraw_tpu.pipeline.develop import develop

        if cfg not in self._jit:
            self._jit[cfg] = jax.jit(
                lambda img, p, masks=None, lut=None: develop(img, p, cfg, masks=masks, lut=lut)
            )
        return self._jit[cfg]

    # -- main entry (process_preview_job, lib.rs:330-614) ------------------
    def render_preview(
        self,
        path: str,
        adjustments: dict | None = None,
        interactive: bool = False,
        roi: tuple[float, float, float, float] | None = None,
        compute_histogram: bool = False,
        compute_waveform: bool = False,
    ) -> PreviewResult:
        import jax.numpy as jnp

        from rapidraw_tpu.geometry.resize import downscale
        from rapidraw_tpu.io.encode import encode_jpeg_bytes
        from rapidraw_tpu.io.sidecar import load_adjustments
        from rapidraw_tpu.params.parse import parse_adjustments

        t0 = time.perf_counter()
        adjustments = adjustments if adjustments is not None else load_adjustments(path)

        long_edge = self.settings.editor_preview_resolution
        x, crop_offset, (full_w, full_h), is_raw = self._transformed_preview(
            path, adjustments, long_edge
        )
        divisor, quality = self.settings.preview_quality(interactive)

        _, h, w = x.shape
        scale = h / full_h if full_h else 1.0
        masks = self._masks(adjustments, w, h, scale, crop_offset)

        roi_px = None
        if roi is not None:
            # normalized ROI (lib.rs:448-457) clamped into the preview
            rx = int(max(0.0, min(roi[0], 1.0)) * w)
            ry = int(max(0.0, min(roi[1], 1.0)) * h)
            rw = max(int(roi[2] * w), 1)
            rh = max(int(roi[3] * h), 1)
            rw = min(rw, w - rx)
            rh = min(rh, h - ry)
            roi_px = (rx, ry, rw, rh)
            x = x[:, ry : ry + rh, rx : rx + rw]
            if masks is not None:
                masks = masks[:, ry : ry + rh, rx : rx + rw]

        xj = jnp.asarray(x)
        if divisor > 1.0:
            xj = downscale(
                xj, max(int(xj.shape[2] / divisor), 1), max(int(xj.shape[1] / divisor), 1)
            )
            if masks is not None:
                h2, w2 = int(xj.shape[1]), int(xj.shape[2])
                iy = (np.arange(h2) * masks.shape[1] / h2).astype(np.int64)
                ix = (np.arange(w2) * masks.shape[2] / w2).astype(np.int64)
                masks = masks[:, iy[:, None], ix[None, :]]

        tonemapper_override = self.settings.tonemapper_override(is_raw)
        params, cfg = parse_adjustments(adjustments, is_raw, tonemapper_override)
        lut = None
        if cfg.has_lut and isinstance(adjustments.get("lutPath"), str):
            from rapidraw_tpu.io.lut import parse_lut_file

            try:
                lut = jnp.asarray(parse_lut_file(adjustments["lutPath"]))
            except Exception:
                cfg = dataclasses.replace(cfg, has_lut=False)

        fn = self._develop_fn(cfg)
        out = np.asarray(
            fn(xj, params, jnp.asarray(masks) if masks is not None else None, lut)
        )

        histogram = waveform = None
        if compute_histogram or compute_waveform:
            from rapidraw_tpu.analysis.scopes import calculate_histogram, calculate_waveform

            if compute_histogram:
                histogram = calculate_histogram(out)
            if compute_waveform:
                waveform = calculate_waveform(out)

        jpeg = encode_jpeg_bytes(out, quality=quality)
        return PreviewResult(
            jpeg=jpeg,
            width=out.shape[2],
            height=out.shape[1],
            full_width=full_w,
            full_height=full_h,
            roi=roi_px,
            seconds=time.perf_counter() - t0,
            histogram=histogram,
            waveform=waveform,
        )

    def auto_adjustments(self, path: str) -> dict[str, Any]:
        from rapidraw_tpu.analysis.auto_adjust import calculate_auto_adjustments

        img, _ = self.load(path)
        return calculate_auto_adjustments(img)

    def clear_caches(self) -> None:
        self._decoded.clear()
        self._transformed.clear()
        self._mask_cache.clear()
