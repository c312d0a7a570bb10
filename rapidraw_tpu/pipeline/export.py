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
    filename_template: str = "{original_filename}_edited"
    batch_size: int = 4
    watermark: "object | None" = None  # pipeline.watermark.WatermarkSettings
    copy_exif: bool = True  # EXIF write-through with GPS strip (rs:297-303)
    strip_gps: bool = True
    preserve_folders: bool = False  # recreate source tree under output dir (rs:789-822)
    base_origin_folders: tuple = ()  # roots relative to which the tree is kept
    preserve_timestamps: bool = False  # stamp outputs with EXIF capture time (rs:272-281)
    export_masks: bool = False  # also emit per-mask image+alpha pairs (rs:471-585)


def settings_from_preset(preset: dict) -> ExportSettings:
    """Build ExportSettings from a saved export preset (app_settings.rs
    ExportPreset :218-292; presets live under settings['exportPresets'])."""
    watermark = None
    if preset.get("enable_watermark") and preset.get("watermark_path"):
        from rapidraw_tpu.pipeline.watermark import WatermarkSettings

        watermark = WatermarkSettings(
            path=preset["watermark_path"],
            anchor=preset.get("watermark_anchor") or "bottomRight",
            scale=float(preset.get("watermark_scale", 15)),
            spacing=float(preset.get("watermark_spacing", 2)),
            opacity=float(preset.get("watermark_opacity", 100)),
        )
    long_edge = None
    if preset.get("enable_resize") and preset.get("resize_value"):
        long_edge = int(preset["resize_value"])
    return ExportSettings(
        format=preset.get("file_format", "jpeg").lower(),
        quality=int(preset.get("jpeg_quality", 90)),
        long_edge=long_edge,
        filename_template=preset.get("filename_template") or "{original_filename}_edited",
        watermark=watermark,
        copy_exif=bool(preset.get("keep_metadata", True)),
        strip_gps=bool(preset.get("strip_gps", True)),
        preserve_folders=bool(preset.get("preserve_folders") or False),
        preserve_timestamps=bool(preset.get("preserve_timestamps") or False),
        export_masks=bool(preset.get("export_masks") or False),
    )


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


def _render_chunk(imgs, params, masks, lut, cfg) -> np.ndarray:
    """Develop one export chunk, sharded across every visible chip.

    Multi-device: images/params/masks shard over the mesh batch axis
    (parallel/mesh.sharded_develop_batch — each chip runs the full fused
    pipeline on its local shard, zero collectives), with the batch padded
    up to a mesh multiple by repeating the last image. This is the scaling
    model for "the TPU money path" (export_processing.rs:637-1004: the
    reference fans out across CPU threads but serializes on one GPU).
    Single device (or a LUT bucket — the sharded entry takes no lut):
    plain jitted develop_batch.
    """
    if jax.device_count() > 1 and lut is None:
        from rapidraw_tpu.parallel.mesh import make_mesh, sharded_develop_batch

        key = ("mesh", cfg)
        if key not in _jit_cache:
            mesh = make_mesh()
            _jit_cache[key] = (mesh, sharded_develop_batch(mesh, cfg))
        mesh, fn = _jit_cache[key]
        b = imgs.shape[0]
        pad = (-b) % mesh.shape["batch"]
        if pad:
            rep = lambda x: jnp.concatenate(
                [x, jnp.repeat(x[-1:], pad, axis=0)], axis=0
            )
            imgs = rep(imgs)
            params = jax.tree.map(rep, params)
            if masks is not None:
                masks = rep(masks)
        return np.asarray(fn(imgs, params, masks))[:b]
    return np.asarray(_jitted_develop(cfg)(imgs, params, masks, lut))


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
    from rapidraw_tpu.masks.rasterize import resolve_warped_image

    warped = resolve_warped_image(img, adj, is_raw)
    masks = rasterize_masks(adj, w, h, scale=1.0, crop_offset=crop_offset,
                            warped_image=warped)
    params, cfg = parse_adjustments(adj, is_raw=is_raw)

    lut = None
    if cfg.has_lut:
        from rapidraw_tpu.io.lut import parse_lut_file

        try:
            lut = np.asarray(parse_lut_file(adj["lutPath"]), np.float32)
        except Exception:
            cfg = dataclasses.replace(cfg, has_lut=False)
    return timg, masks, params, cfg, lut


def generate_filename_from_template(
    template: str, original_path: str | Path, sequence: int, total: int, file_date
) -> str:
    """{original_filename} {sequence} {YYYY} {MM} {DD} {hh} {mm}
    (file_management.rs:3264-3292). {sequence} is zero-padded to the width
    of `total`. {filename} is accepted as an alias of {original_filename}."""
    stem = Path(original_path).stem or "image"
    width = max(len(str(total)), 1)
    out = template
    out = out.replace("{original_filename}", stem).replace("{filename}", stem)
    out = out.replace("{sequence}", str(sequence).zfill(width))
    out = out.replace("{YYYY}", f"{file_date:%Y}").replace("{MM}", f"{file_date:%m}")
    out = out.replace("{DD}", f"{file_date:%d}").replace("{hh}", f"{file_date:%H}")
    out = out.replace("{mm}", f"{file_date:%M}")
    return out


def _output_path(
    source: str,
    out_dir: Path,
    settings: ExportSettings,
    seq: int,
    total: int = 1,
    vc: int | None = None,
    appearance: int = 0,
) -> Path:
    """Template + virtual-copy suffix + optional source-tree preservation
    (export_processing.rs:767-822)."""
    from rapidraw_tpu.io.exif import get_creation_date

    src = Path(source)
    name = generate_filename_from_template(
        settings.filename_template, src, seq, total, get_creation_date(source)
    )
    if vc is not None:
        name = f"{name}_VC{vc:02d}"
    elif appearance > 1:
        name = f"{name}_VC{appearance - 1:02d}"
    ext = "jpg" if settings.format in ("jpeg", "jpg") else settings.format

    target_dir = out_dir
    if settings.preserve_folders:
        for base in settings.base_origin_folders:
            basep = Path(base)
            try:
                rel = src.resolve().relative_to(basep.resolve())
            except (ValueError, OSError):
                continue
            rel_dir = rel.parent
            # refuse path traversal out of the output tree
            if any(part == ".." for part in rel_dir.parts):
                break
            target_dir = out_dir / rel_dir
            target_dir.mkdir(parents=True, exist_ok=True)
            break
    return target_dir / f"{name}.{ext}"


def _restore_timestamps(source: str, dst: Path) -> None:
    """Stamp the output with the source's EXIF capture time (rs:272-281)."""
    import os

    from rapidraw_tpu.io.exif import get_creation_date

    t = get_creation_date(source).timestamp()
    try:
        os.utime(dst, (t, t))
    except OSError:
        pass


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
    cancel=None,  # utils.recovery.CancellationToken (export_processing.rs:1006-1018)
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
        if cancel is not None and cancel.cancelled:
            results.append(ExportResult(p, None, False, "cancelled"))
            continue
        if progress:
            progress(i, len(paths), p)
        t0 = time.perf_counter()
        try:
            prepared.append((p, _prepare_one(p, settings), time.perf_counter() - t0))
        except Exception as e:  # noqa: BLE001 — per-image isolation like the reference
            results.append(ExportResult(p, None, False, f"prepare failed: {e}"))

    # Bucket on STRUCTURAL fields only (shape + the DevelopConfig fields
    # merge_configs cannot union + LUT content), then merge the per-image
    # configs inside each bucket — so documents differing in ordinary
    # sliders still share one compilation. Exact-config bucketing paid one
    # 30-120 s Mosaic compile per distinct edit; this pays O(buckets)
    # (the reference runs every export through a single GPU pipeline,
    # export_processing.rs:661-738).
    def _lut_fingerprint(lut) -> int | None:
        if lut is None:
            return None
        import zlib

        return zlib.adler32(np.ascontiguousarray(lut).tobytes())

    buckets: dict = {}
    for p, (timg, masks, params, cfg, lut), tprep in prepared:
        key = (
            timg.shape,
            cfg.is_raw,
            cfg.tonemapper_agx,
            cfg.ca_static_rc,
            cfg.ca_static_by,
            _lut_fingerprint(lut),
        )
        buckets.setdefault(key, []).append((p, timg, masks, params, cfg, lut, tprep))

    # union config per bucket; structural keys make the merge safe, but keep
    # the exact-config fallback in case a future field turns unmergeable
    merged: list[tuple] = []  # (bucket_cfg, items)
    for items in buckets.values():
        try:
            merged.append((merge_configs([it[4] for it in items]), items))
        except ValueError:
            by_cfg: dict = {}
            for it in items:
                by_cfg.setdefault(it[4], []).append(it)
            merged.extend((c, its) for c, its in by_cfg.items())

    from rapidraw_tpu.io.loader import parse_virtual_path

    seq = 0
    total = len(paths)
    appearance: dict = {}
    for bucket_cfg, items in merged:
        for start in range(0, len(items), settings.batch_size):
            if cancel is not None and cancel.cancelled:
                for p, *_ in items[start:]:
                    results.append(ExportResult(p, None, False, "cancelled"))
                break
            chunk = items[start : start + settings.batch_size]
            t0 = time.perf_counter()
            imgs = jnp.stack([c[1] for c in chunk])
            cfgs = [c[4] for c in chunk]
            params, cfg = stack_params([c[3] for c in chunk], cfgs, cfg=bucket_cfg)
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

            out = _render_chunk(imgs, params, masks, lut, cfg)
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
                    real, vc = parse_virtual_path(p)
                    appearance[real] = appearance.get(real, 0) + 1
                    dst = _output_path(
                        real, out_dir, settings, seq, total=total, vc=vc,
                        appearance=appearance[real],
                    )
                    encode_image(planar, dst, settings.format, settings.quality)
                    if settings.copy_exif:
                        from rapidraw_tpu.io.exif import copy_exif

                        copy_exif(real, dst, strip_gps_data=settings.strip_gps)
                    if settings.preserve_timestamps:
                        _restore_timestamps(real, dst)
                    if settings.export_masks:
                        _export_masks_for_image(p, dst, settings)
                    results.append(
                        ExportResult(p, str(dst), True, seconds=dt / len(chunk))
                    )
                except Exception as e:  # noqa: BLE001
                    results.append(ExportResult(p, None, False, f"encode failed: {e}"))
    if progress:
        progress(len(paths), len(paths), "")
    return results


def _export_masks_for_image(path: str, main_output: Path, settings: ExportSettings) -> None:
    """Per-mask image+alpha export (export_processing.rs:471-585).

    For each visible mask: render the image with ONLY that mask's
    adjustments applied everywhere (full-white influence bitmap) and save it
    as `{stem}_mask_{i}_image.{ext}`, plus the actual mask bitmap
    Lanczos-resized to the output dims as `{stem}_mask_{i}_alpha.png`.
    """
    from PIL import Image

    import jax
    import jax.numpy as jnp

    from rapidraw_tpu.geometry.transforms import apply_all_transformations
    from rapidraw_tpu.io.encode import encode_image
    from rapidraw_tpu.io.loader import load_image
    from rapidraw_tpu.io.sidecar import load_adjustments
    from rapidraw_tpu.masks.rasterize import rasterize_masks
    from rapidraw_tpu.params.parse import parse_adjustments
    from rapidraw_tpu.pipeline.batch import develop_batch, stack_params

    img, is_raw = load_image(path)
    adj = dict(load_adjustments(path))
    adj["showClipping"] = False
    masks_json = [
        m for m in (adj.get("masks") or [])
        if isinstance(m, dict) and m.get("visible", False)
    ]
    if not masks_json:
        return

    timg, crop_offset = apply_all_transformations(jnp.asarray(img), adj)
    _, h, w = timg.shape
    from rapidraw_tpu.masks.rasterize import resolve_warped_image

    bitmaps = rasterize_masks(
        adj, w, h, scale=1.0, crop_offset=crop_offset,
        warped_image=resolve_warped_image(img, adj, is_raw),
    )
    if bitmaps is None:
        return

    white = np.ones((1, h, w), np.float32)
    out_dir = main_output.parent
    stem = main_output.stem
    ext = main_output.suffix.lstrip(".")
    for i, mdef in enumerate(masks_json):
        single = dict(adj)
        single["masks"] = [mdef]
        params, cfg = parse_adjustments(single, is_raw=is_raw)
        sp, scfg = stack_params([params], [cfg])
        out = np.asarray(
            develop_batch(timg[None], sp, scfg, masks=jnp.asarray(white)[None])
        )[0]
        if settings.long_edge:
            out = _resize_long_edge_host(out, settings.long_edge)
        if settings.watermark is not None:
            from rapidraw_tpu.pipeline.watermark import apply_watermark

            out = apply_watermark(np.asarray(out), settings.watermark)
        img_path = out_dir / f"{stem}_mask_{i}_image.{ext}"
        encode_image(out, img_path, settings.format, settings.quality)
        if settings.copy_exif:
            from rapidraw_tpu.io.exif import copy_exif

            copy_exif(path, img_path, strip_gps_data=settings.strip_gps)
        if settings.preserve_timestamps:
            _restore_timestamps(path, img_path)

        _, oh, ow = np.asarray(out).shape
        alpha = (np.clip(bitmaps[i], 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
        alpha_img = Image.fromarray(alpha).resize((ow, oh), Image.LANCZOS)
        alpha_img.save(out_dir / f"{stem}_mask_{i}_alpha.png")


_ESTIMATE_DIM = 1280  # export_processing.rs:1118


def estimate_export_sizes(
    paths: list[str], settings: ExportSettings | None = None
) -> int:
    """Estimated total output bytes (export_processing.rs:1020-1210).

    Renders the FIRST image at <=1280px, encodes it with the requested
    format/quality, and extrapolates by the output-pixel ratio x len(paths).
    `.cube` exports are a flat ~1.05 MB each.
    """
    settings = settings or ExportSettings()
    if settings.format.lower() == "cube":
        return 1_050_000 * len(paths)
    if not paths:
        return 0

    import io as _io

    import jax.numpy as jnp
    from PIL import Image

    from rapidraw_tpu.geometry.transforms import apply_all_transformations
    from rapidraw_tpu.io.loader import load_image, to_uint8_hwc
    from rapidraw_tpu.io.sidecar import load_adjustments
    from rapidraw_tpu.masks.rasterize import rasterize_masks
    from rapidraw_tpu.params.parse import parse_adjustments
    from rapidraw_tpu.pipeline.develop import develop

    img, is_raw = load_image(paths[0])
    adj = dict(load_adjustments(paths[0]))
    adj["showClipping"] = False
    timg, crop_offset = apply_all_transformations(jnp.asarray(img), adj)
    _, fh, fw = timg.shape

    scale = min(1.0, _ESTIMATE_DIM / max(fh, fw))
    if scale < 1.0:
        from rapidraw_tpu.geometry.resize import downscale

        ph, pw = max(1, round(fh * scale)), max(1, round(fw * scale))
        preview = downscale(timg, pw, ph)
    else:
        ph, pw = fh, fw
        preview = timg
    masks = rasterize_masks(
        adj, pw, ph, scale=scale,
        crop_offset=(crop_offset[0] * scale, crop_offset[1] * scale),
    )
    params, cfg = parse_adjustments(adj, is_raw=is_raw)
    out = np.asarray(
        develop(
            preview, params, cfg,
            masks=jnp.asarray(masks) if masks is not None else None,
        )
    )

    buf = _io.BytesIO()
    fmt = "JPEG" if settings.format.lower() in ("jpeg", "jpg") else settings.format.upper()
    pil = Image.fromarray(to_uint8_hwc(out))
    try:
        pil.save(buf, format=fmt, quality=settings.quality)
    except (KeyError, OSError, ValueError):
        pil.save(buf, format="PNG")
    preview_bytes = buf.tell()

    out_h, out_w = fh, fw
    if settings.long_edge and max(fh, fw) > settings.long_edge:
        s = settings.long_edge / max(fh, fw)
        out_h, out_w = max(1, round(fh * s)), max(1, round(fw * s))
    ratio = (out_h * out_w) / float(ph * pw)
    return int(preview_bytes * ratio) * len(paths)
