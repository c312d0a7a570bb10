"""Batch export service — the TPU money path.

Equivalent of export_processing.rs:637-1004: per image, load + sidecar
adjustments -> full-res geometry transform -> masks at scale 1.0 -> develop
-> resize -> encode. Where the reference fans out CPU threads bounded by
RAM (:661-683) and serializes on one GPU, this service buckets images by
(shape, merged DevelopConfig) and runs whole buckets as one vmapped,
jit-cached develop per bucket — images/sec scales with batch and chips
instead of mutex turns.
"""

from __future__ import annotations

import dataclasses
import time
from pathlib import Path
from typing import Callable, Iterable

import numpy as np

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class ExportSettings:
    format: str = "jpeg"
    quality: int = 90
    long_edge: int | None = None  # resize target (None = full res)
    filename_template: str = "{filename}_edited"
    batch_size: int = 4
    watermark: "object | None" = None  # pipeline.watermark.WatermarkSettings
    copy_exif: bool = True  # EXIF write-through with GPS strip (rs:297-303)
    strip_gps: bool = True


@dataclasses.dataclass
class ExportResult:
    source: str
    output: str | None
    ok: bool
    error: str | None = None
    seconds: float = 0.0


_jit_cache: dict = {}


def _jitted_develop(cfg):
    from rapidraw_tpu.pipeline.batch import develop_batch

    key = ("batch", cfg)
    if key not in _jit_cache:
        _jit_cache[key] = jax.jit(
            lambda imgs, p, masks=None, lut=None: develop_batch(
                imgs, p, cfg, masks=masks, lut=lut
            )
        )
    return _jit_cache[key]


def _prepare_one(path: str, settings: ExportSettings):
    """Load + transform one image; returns per-image develop inputs."""
    from rapidraw_tpu.geometry.transforms import apply_all_transformations
    from rapidraw_tpu.io.loader import load_image
    from rapidraw_tpu.io.sidecar import load_adjustments
    from rapidraw_tpu.masks.rasterize import rasterize_masks
    from rapidraw_tpu.params.parse import parse_adjustments

    img, is_raw = load_image(path)
    adj = load_adjustments(path)
    # show_clipping is forced off for export (export_processing.rs:250)
    adj = dict(adj)
    adj["showClipping"] = False

    timg, crop_offset = apply_all_transformations(jnp.asarray(img), adj)
    _, h, w = timg.shape
    masks = rasterize_masks(adj, w, h, scale=1.0, crop_offset=crop_offset)
    params, cfg = parse_adjustments(adj, is_raw=is_raw)

    lut = None
    if cfg.has_lut:
        from rapidraw_tpu.io.lut import parse_lut_file

        try:
            lut = np.asarray(parse_lut_file(adj["lutPath"]), np.float32)
        except Exception:
            cfg = dataclasses.replace(cfg, has_lut=False)
    return timg, masks, params, cfg, lut


def _output_path(source: str, out_dir: Path, settings: ExportSettings, seq: int) -> Path:
    src = Path(source)
    name = settings.filename_template.format(
        filename=src.stem, sequence=seq, ext=settings.format
    )
    ext = "jpg" if settings.format in ("jpeg", "jpg") else settings.format
    return out_dir / f"{name}.{ext}"


def _resize_long_edge_host(planar: np.ndarray, long_edge: int) -> np.ndarray:
    """Lanczos3 output resize, host-side (export_processing.rs:194-211)."""
    from PIL import Image

    _, h, w = planar.shape
    if max(h, w) <= long_edge:
        return planar
    scale = long_edge / max(h, w)
    nw, nh = max(1, round(w * scale)), max(1, round(h * scale))
    arr = (np.clip(planar, 0, 1) * 255.0 + 0.5).astype(np.uint8).transpose(1, 2, 0)
    out = np.asarray(Image.fromarray(arr).resize((nw, nh), Image.LANCZOS))
    return out.transpose(2, 0, 1).astype(np.float32) / 255.0


def export_images(
    paths: Iterable[str],
    output_dir: str | Path,
    settings: ExportSettings | None = None,
    progress: Callable[[int, int, str], None] | None = None,
) -> list[ExportResult]:
    """Export a list of image paths using their sidecar adjustments.

    Same-shape, same-config images are developed as one batch per bucket.
    """
    from rapidraw_tpu.io.encode import encode_image
    from rapidraw_tpu.params.parse import merge_configs
    from rapidraw_tpu.pipeline.batch import stack_params

    settings = settings or ExportSettings()
    out_dir = Path(output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    paths = list(paths)
    results: list[ExportResult] = []
    prepared = []
    for i, p in enumerate(paths):
        if progress:
            progress(i, len(paths), p)
        t0 = time.perf_counter()
        try:
            prepared.append((p, _prepare_one(p, settings), time.perf_counter() - t0))
        except Exception as e:  # noqa: BLE001 — per-image isolation like the reference
            results.append(ExportResult(p, None, False, f"prepare failed: {e}"))

    # bucket by (H, W, config-modulo-mask-count, has-masks, lut identity)
    buckets: dict = {}
    for p, (timg, masks, params, cfg, lut), tprep in prepared:
        key = (timg.shape, cfg, masks is not None and masks.shape[0], lut is not None)
        buckets.setdefault(key, []).append((p, timg, masks, params, cfg, lut, tprep))

    seq = 0
    for key, items in buckets.items():
        for start in range(0, len(items), settings.batch_size):
            chunk = items[start : start + settings.batch_size]
            t0 = time.perf_counter()
            imgs = jnp.stack([c[1] for c in chunk])
            cfgs = [c[4] for c in chunk]
            params, cfg = stack_params([c[3] for c in chunk], cfgs)
            masks = None
            if cfg.mask_count > 0:
                n = cfg.mask_count
                h, w = imgs.shape[-2:]
                mstack = []
                for c in chunk:
                    m = c[2] if c[2] is not None else np.zeros((0, h, w), np.float32)
                    if m.shape[0] < n:
                        m = np.concatenate([m, np.zeros((n - m.shape[0], h, w), np.float32)])
                    mstack.append(m[:n])
                masks = jnp.asarray(np.stack(mstack))
            lut = jnp.asarray(chunk[0][5]) if chunk[0][5] is not None else None

            fn = _jitted_develop(cfg)
            out = np.asarray(fn(imgs, params, masks, lut))
            dt = time.perf_counter() - t0

            for b, (p, *_rest) in enumerate(chunk):
                seq += 1
                try:
                    planar = out[b]
                    if settings.long_edge:
                        planar = _resize_long_edge_host(planar, settings.long_edge)
                    if settings.watermark is not None:
                        from rapidraw_tpu.pipeline.watermark import apply_watermark

                        planar = apply_watermark(np.asarray(planar), settings.watermark)
                    dst = _output_path(p, out_dir, settings, seq)
                    encode_image(planar, dst, settings.format, settings.quality)
                    if settings.copy_exif:
                        from rapidraw_tpu.io.exif import copy_exif

                        copy_exif(p, dst, strip_gps_data=settings.strip_gps)
                    results.append(
                        ExportResult(p, str(dst), True, seconds=dt / len(chunk))
                    )
                except Exception as e:  # noqa: BLE001
                    results.append(ExportResult(p, None, False, f"encode failed: {e}"))
    if progress:
        progress(len(paths), len(paths), "")
    _ = merge_configs
    return results
