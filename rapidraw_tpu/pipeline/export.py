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
    long_edge: int | None = None  # resize value (None = resize disabled)
    resize_mode: str = "longEdge"  # longEdge | shortEdge | width | height (rs:42-47)
    dont_enlarge: bool = True  # skip resize when the mode's edge already fits (rs:165-175)
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

        def _num(key, default):
            # frontend presets carry explicit nulls for unset keys
            # (float(None) would crash) — but 0 is a MEANINGFUL value
            # (spacing 0 = flush to the corner, opacity 0 = transparent),
            # so only None falls back, not falsy values
            v = preset.get(key)
            return float(default if v is None else v)

        watermark = WatermarkSettings(
            path=preset["watermark_path"],
            anchor=preset.get("watermark_anchor") or "bottomRight",
            scale=_num("watermark_scale", 15),
            spacing=_num("watermark_spacing", 2),
            opacity=_num("watermark_opacity", 100),
        )
    long_edge = None
    if preset.get("enable_resize") and preset.get("resize_value"):
        long_edge = int(preset["resize_value"])
    return ExportSettings(
        resize_mode=preset.get("resize_mode") or "longEdge",
        # plain bool in the schema (app_settings.rs:226); explicit null
        # reads like a missing key, and the frontend default is True
        dont_enlarge=bool(
            True if preset.get("dont_enlarge") is None else preset["dont_enlarge"]
        ),
        # presets saved by the frontend carry explicit nulls for unset keys
        format=str(preset.get("file_format") or "jpeg").lower(),
        quality=int(preset.get("jpeg_quality") or 90),
        long_edge=long_edge,
        filename_template=preset.get("filename_template") or "{original_filename}_edited",
        watermark=watermark,
        # keep_metadata/strip_gps are plain bools in the reference preset
        # schema (app_settings.rs:227-228); treat an explicit null like a
        # missing key — null must NOT read as False (it would silently
        # disable GPS stripping / drop all EXIF)
        copy_exif=bool(
            True if preset.get("keep_metadata") is None
            else preset["keep_metadata"]
        ),
        strip_gps=bool(
            True if preset.get("strip_gps") is None else preset["strip_gps"]
        ),
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


_u8_jit = None
_u16_jit = None


def _device_u16(x):
    """u16 quantization ON DEVICE for the 16-bit output formats (PNG from
    float renders, TIFF — the reference encodes Rgb16 there,
    export_processing.rs:446-462). Same rounding as the image crate's
    f32->u16 component conversion; half the wire bytes of f32."""
    global _u16_jit
    if _u16_jit is None:
        _u16_jit = jax.jit(
            lambda y: (jnp.clip(y, 0.0, 1.0) * 65535.0 + 0.5).astype(jnp.uint16)
        )
    return _u16_jit(x)


def _device_u8(x):
    """Quantize to u8 ON DEVICE before readback: the host download (and a
    real host's PCIe copy) shrinks 4x vs f32, and the formula matches the
    host-side encode quantization exactly."""
    global _u8_jit
    if _u8_jit is None:
        _u8_jit = jax.jit(
            lambda y: (jnp.clip(y, 0.0, 1.0) * 255.0 + 0.5).astype(jnp.uint8)
        )
    return _u8_jit(x)


def _jitted_develop(cfg, blur_bands=None):
    from rapidraw_tpu.pipeline.batch import develop_batch

    key = ("batch", cfg, blur_bands)
    if key not in _jit_cache:
        _jit_cache[key] = jax.jit(
            lambda imgs, p, masks=None, lut=None: develop_batch(
                imgs, p, cfg, masks=masks, lut=lut, blur_bands=blur_bands
            )
        )
    return _jit_cache[key]


def develop_single_compiled(timg, params, cfg, masks=None, lut=None):
    """One image through the SAME compiled batch-of-1 entry an export
    chunk renders with — the single-image render path for every surface
    that must match export byte-for-byte (CLI develop, community preset
    tiles, the export size probe). Centralized so the un/rebatching and
    band-restriction boilerplate can't drift between call sites. Returns
    a planar (3, H, W) float device array."""
    from rapidraw_tpu.pipeline.bands import blur_band_rows
    from rapidraw_tpu.pipeline.batch import stack_params

    sp, scfg = stack_params([params], [cfg])
    bands = blur_band_rows(scfg, masks) if masks is not None else None
    return _jitted_develop(scfg, bands)(
        jnp.asarray(timg)[None], sp,
        jnp.asarray(masks)[None] if masks is not None else None,
        jnp.asarray(lut) if lut is not None else None,
    )[0]


def _render_chunk(
    imgs, params, masks, lut, cfg, blur_bands=None, out_dtype="u8"
) -> np.ndarray:
    """Develop one export chunk, sharded across every visible chip.

    Multi-device: images/params/masks shard over the mesh batch axis and
    the document LUT (if any) REPLICATES to every device
    (parallel/mesh.sharded_develop_batch — each chip runs the full
    pipeline on its local shard, zero collectives), with the batch padded
    up to a mesh multiple by repeating the last image. This is the scaling
    model for "the TPU money path" (export_processing.rs:637-1004: the
    reference fans out across CPU threads but serializes on one GPU).
    Single device: plain jitted develop_batch.

    out_dtype: "u8" for 8-bit targets, "u16" for the 16-bit ones (PNG from
    float renders, TIFF) — quantized on device either way before readback.
    """
    quant = _device_u16 if out_dtype == "u16" else _device_u8
    if jax.device_count() > 1:
        from rapidraw_tpu.parallel.mesh import make_mesh, sharded_develop_batch

        key = ("mesh", cfg, blur_bands)
        if key not in _jit_cache:
            mesh = make_mesh()
            _jit_cache[key] = (
                mesh, sharded_develop_batch(mesh, cfg, blur_bands=blur_bands)
            )
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
        return np.asarray(quant(fn(imgs, params, masks, lut)))[:b]
    return np.asarray(
        quant(_jitted_develop(cfg, blur_bands)(imgs, params, masks, lut))
    )


def _prepare_one(path: str, settings: ExportSettings, app_settings=None):
    """Load + transform one image; returns per-image develop inputs.

    app_settings: the app-level AppSettings (RAW develop knobs + tonemapper
    override) — the reference's export renders with the same settings the
    preview honored (export_processing.rs:637-1004), so exports match what
    the user tuned."""
    from rapidraw_tpu.geometry.transforms import apply_all_transformations
    from rapidraw_tpu.io.loader import load_image
    from rapidraw_tpu.io.sidecar import load_adjustments
    from rapidraw_tpu.masks.rasterize import rasterize_masks
    from rapidraw_tpu.params.parse import parse_adjustments

    t0 = time.perf_counter()
    img, is_raw = load_image(path, app_settings=app_settings)
    t1 = time.perf_counter()
    _stat_add("decode_s", t1 - t0)
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
    tonemapper_override = (
        app_settings.tonemapper_override(is_raw) if app_settings is not None
        else None
    )
    params, cfg = parse_adjustments(
        adj, is_raw=is_raw, tonemapper_override=tonemapper_override
    )

    lut = None
    if cfg.has_lut:
        from rapidraw_tpu.io.lut import parse_lut_file

        try:
            lut = np.asarray(parse_lut_file(adj["lutPath"]), np.float32)
        except Exception:
            cfg = dataclasses.replace(cfg, has_lut=False)
    _stat_add("prepare_s", time.perf_counter() - t1)
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
    created=None,
) -> Path:
    """Template + virtual-copy suffix + optional source-tree preservation
    (export_processing.rs:767-822). `created` lets callers reuse one EXIF
    read for both the filename template and timestamp restore."""
    if created is None:
        from rapidraw_tpu.io.exif import get_creation_date

        created = get_creation_date(source)
    src = Path(source)
    name = generate_filename_from_template(
        settings.filename_template, src, seq, total, created
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


def _restore_timestamps(source: str, dst: Path, created=None) -> None:
    """Stamp the output with the source's EXIF capture time (rs:272-281)."""
    import os

    if created is None:
        from rapidraw_tpu.io.exif import get_creation_date

        created = get_creation_date(source)
    t = created.timestamp()
    try:
        os.utime(dst, (t, t))
    except OSError:
        pass


def calculate_resize_target(
    w: int, h: int, settings: ExportSettings
) -> tuple[int, int] | None:
    """Final output dims for the export resize, or None if no resize applies.

    Reproduces both stages of the reference (export_processing.rs:160-211):
    calculate_resize_target picks the mode-fixed edge (longEdge/shortEdge/
    width/height, f32 ratio + .round()) after the dont_enlarge early-out,
    then DynamicImage::resize FITS the image inside that box preserving
    aspect (the image crate's resize_dimensions: f64 min-ratio, .round(),
    floor at 1) — resize with dont_enlarge=False can ENLARGE."""
    if not settings.long_edge:
        return None
    value = int(settings.long_edge)
    mode = settings.resize_mode or "longEdge"
    if settings.dont_enlarge:
        exceeds = {
            "longEdge": max(w, h) > value,
            "shortEdge": min(w, h) > value,
            "width": w > value,
            "height": h > value,
        }.get(mode, max(w, h) > value)
        if not exceeds:
            return None
    fix_width = {
        "longEdge": w >= h,
        "shortEdge": w <= h,
        "width": True,
        "height": False,
    }.get(mode, w >= h)
    if fix_width:
        tw = value
        th = int(np.floor(np.float32(value) * (np.float32(h) / np.float32(w)) + 0.5))
    else:
        tw = int(np.floor(np.float32(value) * (np.float32(w) / np.float32(h)) + 0.5))
        th = value
    if (tw, th) == (w, h):
        return None
    ratio = min(tw / w, th / h)
    nw = max(1, int(np.floor(w * ratio + 0.5)))
    nh = max(1, int(np.floor(h * ratio + 0.5)))
    if (nw, nh) == (w, h):
        return None
    return nw, nh


def _resize_host(planar: np.ndarray, settings: ExportSettings) -> np.ndarray:
    """Lanczos3 output resize, host-side (export_processing.rs:194-211).

    Resamples in FLOAT (PIL 'F' mode per channel), like the reference's
    DynamicImage::resize on an Rgb32F — precision survives into the
    16-bit PNG/TIFF encodes instead of being clipped to 8 bits here."""
    from PIL import Image

    _, h, w = planar.shape
    tgt = calculate_resize_target(w, h, settings)
    if tgt is None:
        return planar
    nw, nh = tgt
    chans = [
        np.asarray(
            Image.fromarray(
                np.ascontiguousarray(planar[c], dtype=np.float32), mode="F"
            ).resize((nw, nh), Image.LANCZOS)
        )
        for c in range(3)
    ]
    # Lanczos overshoots; the reference's f32 buffer carries that until the
    # encode clamp — clamp here so the watermark composite sees [0,1]
    return np.clip(np.stack(chans, axis=0), 0.0, 1.0)


def _available_ram_bytes() -> int:
    """MemAvailable from /proc/meminfo (8 GB fallback off-Linux)."""
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemAvailable:"):
                    return int(line.split()[1]) * 1024
    except OSError:
        pass
    return 8 << 30


def host_worker_budget() -> int:
    """Prepare/encode concurrency = min(cores, freeRAM/2.5 GB, 16) —
    the reference's export thread budget (export_processing.rs:661-683)."""
    import os

    cores = os.cpu_count() or 1
    by_ram = max(1, int(_available_ram_bytes() / (2.5 * (1 << 30))))
    return max(1, min(cores, by_ram, 16))


def prepare_window(batch_size: int, n_workers: int) -> int:
    """Max prepared-but-unrendered images in flight: enough to keep one
    device chunk ahead of the render loop. Prepared frames are DEVICE
    arrays (the load->develop chain never leaves HBM), so the cap is sized
    for device memory: worst-case live device frames ≈ 2x this window
    (pend + accumulating chunks), each 24MP frame ~300 MB f32 — 8 keeps
    that under ~5 GB of a 16 GB chip alongside the develop working set.
    Host RAM still bounds it on RAM-starved hosts (masks + encode queue)."""
    want = max(batch_size + n_workers, 2 * batch_size, 2)
    return max(2, min(want, 8, max(2, int(_available_ram_bytes() / (2.5 * (1 << 30))))))


# test hook: tracks the peak number of live prepared-but-unencoded images
# (the RAM-bound invariant; multiplied by per-image bytes it bounds RSS)
import threading as _threading

_live_prepared = 0
_peak_prepared = 0
_live_lock = _threading.Lock()

# per-stage wall-time accounting for the export pipeline (bench.py's e2e
# leg reports this breakdown; stages overlap across threads, so the sums
# are CPU-seconds per stage, not a wall-clock decomposition):
#   decode_s    host container decode + device develop DISPATCH (async)
#   prepare_s   transforms + mask rasterization dispatch (async)
#   render_s    device develop + u8 readback (the np.asarray sync point)
#   encode_s    host JPEG/PNG encode + EXIF splice
STAGE_STATS = {
    "decode_s": 0.0, "prepare_s": 0.0, "render_s": 0.0, "encode_s": 0.0,
    "frames": 0,
}
_stats_lock = _threading.Lock()


def reset_stage_stats() -> None:
    with _stats_lock:
        for k in STAGE_STATS:
            STAGE_STATS[k] = 0.0 if k != "frames" else 0


def _stat_add(key: str, value) -> None:
    with _stats_lock:
        STAGE_STATS[key] += value


def _track_prepared(delta: int) -> None:
    global _live_prepared, _peak_prepared
    with _live_lock:
        _live_prepared += delta
        _peak_prepared = max(_peak_prepared, _live_prepared)


def export_images(
    paths: Iterable[str],
    output_dir: str | Path,
    settings: ExportSettings | None = None,
    progress: Callable[[int, int, str], None] | None = None,
    cancel=None,  # utils.recovery.CancellationToken (export_processing.rs:1006-1018)
    app_settings=None,  # AppSettings: RAW develop knobs + tonemapper override
) -> list[ExportResult]:
    """Export a list of image paths using their sidecar adjustments.

    Pipelined host side (export_processing.rs:661-738's RAM-bounded fan-out,
    restructured around one device): a thread pool prepares images
    (decode + transform + masks) through a BOUNDED window, the render loop
    groups them into structural buckets and develops whole chunks on the
    device, and an encode pool drains rendered frames (encode + EXIF +
    timestamps) while the next chunk renders. Live prepared frames are
    bounded by prepare_window() in the prep stage plus the accumulating
    chunk and the encode queue (≈ 2*window + 2*n_enc worst case — the test
    asserts the exact bound); the whole job is never materialized.
    """
    import collections
    import threading
    from concurrent.futures import ThreadPoolExecutor

    from rapidraw_tpu.io.encode import encode_image
    from rapidraw_tpu.io.loader import parse_virtual_path
    from rapidraw_tpu.params.parse import merge_configs
    from rapidraw_tpu.pipeline.batch import stack_params

    settings = settings or ExportSettings()
    out_dir = Path(output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    paths = list(paths)
    total = len(paths)
    results: dict[int, ExportResult] = {}
    res_lock = threading.Lock()
    global _peak_prepared, _live_prepared
    _peak_prepared = _live_prepared = 0

    n_workers = host_worker_budget()
    window = prepare_window(settings.batch_size, n_workers)
    n_enc = max(1, min(n_workers, 8))

    def _lut_fingerprint(lut) -> int | None:
        if lut is None:
            return None
        import zlib

        return zlib.adler32(np.ascontiguousarray(lut).tobytes())

    def prep_safe(idx: int, p: str):
        t0 = time.perf_counter()
        try:
            prep = _prepare_one(p, settings, app_settings=app_settings)
            _track_prepared(+1)
            return idx, p, prep, time.perf_counter() - t0, None
        except Exception as e:  # noqa: BLE001 — per-image isolation
            return idx, p, None, time.perf_counter() - t0, f"prepare failed: {e}"

    # encode side: bounded in-flight frames (each holds one full-res image)
    enc_sem = threading.BoundedSemaphore(n_enc * 2)
    claimed_paths: set = set()

    # {sequence} and virtual-copy appearance numbers follow INPUT order
    # (file_management.rs:3264-3292 numbers the request list), not bucket
    # flush order — flush order depends on the live prepare_window()
    # reading, so numbering from the render loop made re-exports of the
    # same list produce different filenames on a RAM-constrained host
    appearance_by_idx: dict[int, int] = {}
    _occ: dict[str, int] = {}
    for _i, _p in enumerate(paths):
        _real, _ = parse_virtual_path(_p)
        _occ[_real] = _occ.get(_real, 0) + 1
        appearance_by_idx[_i] = _occ[_real]

    def encode_one(idx, p, planar, dt, n_in_chunk, mask_prep=None):
        # output-path claiming happens in the render loop (single thread)
        # so two sources that template to the same name can't overwrite
        # each other (2023/IMG_0001.CR2 + 2024/IMG_0001.CR2 without
        # preserve_folders both map to IMG_0001_edited.jpg)
        seq = idx + 1
        real, vc = parse_virtual_path(p)
        app = appearance_by_idx[idx]
        from rapidraw_tpu.io.exif import get_creation_date

        try:
            created = get_creation_date(real)  # one EXIF read: name + utime
        except Exception:  # noqa: BLE001 — missing/unreadable source EXIF
            import datetime as _dt

            created = _dt.datetime.now()
        dst = _output_path(
            real, out_dir, settings, seq, total=total, vc=vc,
            appearance=app, created=created,
        )
        n_dup = 1
        while str(dst) in claimed_paths:
            dst = dst.with_name(f"{dst.stem}-{n_dup}{dst.suffix}")
            n_dup += 1
        claimed_paths.add(str(dst))

        def task():
            t_enc = time.perf_counter()
            try:
                out = planar
                if settings.long_edge or settings.watermark is not None:
                    if out.dtype == np.uint8:
                        out = out.astype(np.float32) / 255.0
                    elif out.dtype == np.uint16:
                        out = out.astype(np.float32) / 65535.0
                if settings.long_edge:
                    out = _resize_host(out, settings)
                if settings.watermark is not None:
                    from rapidraw_tpu.pipeline.watermark import apply_watermark

                    out = apply_watermark(np.asarray(out), settings.watermark)
                encode_image(out, dst, settings.format, settings.quality)
                if settings.copy_exif:
                    from rapidraw_tpu.io.exif import copy_exif

                    copy_exif(real, dst, strip_gps_data=settings.strip_gps)
                if settings.preserve_timestamps:
                    _restore_timestamps(real, dst, created=created)
                if settings.export_masks:
                    # mask_prep hands over the render loop's already-
                    # decoded timg + rasterized bitmaps — no second full
                    # RAW decode/transform per image
                    _export_masks_for_image(
                        p, dst, settings, app_settings, prepared=mask_prep
                    )
                r = ExportResult(p, str(dst), True, seconds=dt / n_in_chunk)
            except Exception as e:  # noqa: BLE001
                r = ExportResult(p, None, False, f"encode failed: {e}")
            finally:
                _stat_add("encode_s", time.perf_counter() - t_enc)
                _track_prepared(-1)
                enc_sem.release()
            with res_lock:
                results[idx] = r

        return task

    # PRE-SCAN sidecars (JSON only — no pixel IO) so each structural
    # bucket's config union is known before the first chunk renders:
    # streaming chunks then all hit ONE compiled entry per bucket instead
    # of recompiling as the union grows (the reference compiles its one
    # GPU pipeline once, export_processing.rs:661-738)
    def _cfg_key(cfg):
        # has_lut must be part of the key: buckets split by LUT content,
        # and a no-LUT bucket seeded from a union that absorbed a LUT doc
        # would carry has_lut=True — disabling the batched megakernel
        # (fused.fusable_batched excludes LUT configs) for LUT-less images
        return (
            cfg.is_raw, cfg.tonemapper_agx, cfg.ca_static_rc,
            cfg.ca_static_by, cfg.has_lut,
        )

    pre_union: dict = {}
    from rapidraw_tpu.io.loader import is_raw_file
    from rapidraw_tpu.io.sidecar import load_adjustments
    from rapidraw_tpu.params.parse import parse_adjustments

    for p in paths:
        try:
            adj = dict(load_adjustments(p))
            adj["showClipping"] = False
            is_raw = is_raw_file(parse_virtual_path(p)[0])
            # same tonemapper override as _prepare_one: the override flips
            # cfg.tonemapper_agx, which is part of the bucket key — a
            # prescan without it would never match any actual bucket and
            # every chunk would recompile as its union grows
            _, pcfg = parse_adjustments(
                adj, is_raw=is_raw,
                tonemapper_override=(
                    app_settings.tonemapper_override(is_raw)
                    if app_settings is not None else None
                ),
            )
            k = _cfg_key(pcfg)
            pre_union[k] = (
                merge_configs([pre_union[k], pcfg]) if k in pre_union else pcfg
            )
        except Exception:  # noqa: BLE001 — prescan is advisory
            continue

    # chunk accumulation by structural bucket (shape + unmergeable config
    # fields + LUT content); per-bucket union starts from the prescan so it
    # never grows mid-stream (falls back to incremental merging if the
    # prescan missed the document)
    chunks: dict = {}
    union_cfg: dict = {}

    def render_chunk(key):
        # device-side failures are isolated per BUCKET, like prepare/encode
        # failures are per image: one bad bucket must not abort the batch
        chunk = chunks.pop(key)
        try:
            _render_chunk_inner(key, chunk)
        except Exception as e:  # noqa: BLE001
            for c in chunk:
                _track_prepared(-1)
                with res_lock:
                    results[c["idx"]] = ExportResult(
                        c["path"], None, False, f"render failed: {e}"
                    )

    def _render_chunk_inner(key, chunk):
        bucket_cfg = union_cfg[key]
        t0 = time.perf_counter()
        imgs = jnp.stack([c["timg"] for c in chunk])
        params, cfg = stack_params(
            [c["params"] for c in chunk], [c["cfg"] for c in chunk], cfg=bucket_cfg
        )
        masks = None
        blur_bands = None
        if cfg.mask_count > 0:
            n = cfg.mask_count
            h, w = imgs.shape[-2:]
            mstack = []
            for c in chunk:
                m = c["masks"] if c["masks"] is not None else np.zeros((0, h, w), np.float32)
                if m.shape[0] < n:
                    m = np.concatenate([m, np.zeros((n - m.shape[0], h, w), np.float32)])
                mstack.append(m[:n])
            mnp = np.stack(mstack)
            from rapidraw_tpu.pipeline.bands import blur_band_rows

            blur_bands = blur_band_rows(cfg, mnp)
            masks = jnp.asarray(mnp)
        lut = jnp.asarray(chunk[0]["lut"]) if chunk[0]["lut"] is not None else None

        out = _render_chunk(
            imgs, params, masks, lut, cfg, blur_bands=blur_bands,
            out_dtype="u16" if settings.format.lower() in ("png", "tif", "tiff")
            else "u8",
        )
        dt = time.perf_counter() - t0
        _stat_add("render_s", dt)
        _stat_add("frames", len(chunk))
        tasks = []
        for b, c in enumerate(chunk):
            tasks.append(encode_one(
                c["idx"], c["path"], out[b], dt, len(chunk),
                mask_prep=(
                    (c["timg"], c["masks"]) if settings.export_masks else None
                ),
            ))
        for t in tasks:
            enc_sem.acquire()
            enc_pool.submit(t)

    with ThreadPoolExecutor(n_workers) as prep_pool, \
            ThreadPoolExecutor(n_enc) as enc_pool:
        path_iter = iter(enumerate(paths))
        pend: collections.deque = collections.deque()

        def submit_more():
            while len(pend) < window:
                try:
                    i, p = next(path_iter)
                except StopIteration:
                    return
                if cancel is not None and cancel.cancelled:
                    with res_lock:
                        results[i] = ExportResult(p, None, False, "cancelled")
                    continue
                pend.append(prep_pool.submit(prep_safe, i, p))

        done_in = 0
        submit_more()
        while pend:
            idx, p, prep, tprep, err = pend.popleft().result()
            done_in += 1
            if progress:
                progress(done_in - 1, total, p)
            if cancel is not None and cancel.cancelled and prep is not None:
                _track_prepared(-1)
                prep = None
                err = "cancelled"
            if err is not None:
                with res_lock:
                    results[idx] = ExportResult(p, None, False, err)
            else:
                timg, masks, params, cfg, lut = prep
                key = (
                    tuple(timg.shape),
                    cfg.is_raw,
                    cfg.tonemapper_agx,
                    cfg.ca_static_rc,
                    cfg.ca_static_by,
                    _lut_fingerprint(lut),
                )
                chunks.setdefault(key, []).append({
                    "idx": idx, "path": p, "timg": timg, "masks": masks,
                    "params": params, "cfg": cfg, "lut": lut,
                })
                try:
                    seed = (
                        [union_cfg[key]] if key in union_cfg
                        else [pre_union[_cfg_key(cfg)]]
                        if _cfg_key(cfg) in pre_union else []
                    )
                    union_cfg[key] = merge_configs(seed + [cfg])
                except ValueError:
                    # unmergeable despite the structural key: render what
                    # accumulated under the old union, restart the bucket
                    full = chunks.pop(key)
                    chunks[key] = full[:-1]
                    if chunks[key]:
                        render_chunk(key)
                    else:
                        chunks.pop(key)
                    chunks[key] = [full[-1]]
                    union_cfg[key] = cfg
                if len(chunks.get(key, ())) >= settings.batch_size:
                    render_chunk(key)
                elif sum(len(v) for v in chunks.values()) >= window:
                    # bound accumulated chunks too: flush the fullest bucket
                    big = max(chunks, key=lambda k: len(chunks[k]))
                    render_chunk(big)
            submit_more()

        for key in list(chunks):
            if cancel is not None and cancel.cancelled:
                for c in chunks.pop(key):
                    _track_prepared(-1)
                    with res_lock:
                        results[c["idx"]] = ExportResult(
                            c["path"], None, False, "cancelled"
                        )
                continue
            render_chunk(key)

    if progress:
        progress(total, total, "")
    return [results[i] for i in sorted(results)]


def _export_masks_for_image(path: str, main_output: Path, settings: ExportSettings,
                            app_settings=None, prepared=None) -> None:
    """Per-mask image+alpha export (export_processing.rs:471-585).

    `prepared`: optional (timg, bitmaps) handed over from the export
    pipeline's _prepare_one — the render loop already decoded, transformed
    and rasterized this exact image, so the standalone decode below (the
    most expensive host work per image) is skipped.

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
    from rapidraw_tpu.io.loader import parse_virtual_path
    from rapidraw_tpu.params.parse import parse_adjustments

    real, _vc = parse_virtual_path(path)
    from rapidraw_tpu.io.loader import is_raw_file

    is_raw = is_raw_file(real)
    adj = dict(load_adjustments(path))
    adj["showClipping"] = False
    masks_json = [
        m for m in (adj.get("masks") or [])
        if isinstance(m, dict) and m.get("visible", False)
    ]
    if not masks_json:
        return

    if prepared is not None:
        timg, bitmaps = prepared
    else:
        img, is_raw = load_image(path, app_settings=app_settings)
        timg, crop_offset = apply_all_transformations(jnp.asarray(img), adj)
        _, h, w = timg.shape
        from rapidraw_tpu.masks.rasterize import resolve_warped_image

        bitmaps = rasterize_masks(
            adj, w, h, scale=1.0, crop_offset=crop_offset,
            warped_image=resolve_warped_image(img, adj, is_raw),
        )
    if bitmaps is None:
        return
    _, h, w = timg.shape

    white = np.ones((1, h, w), np.float32)
    out_dir = main_output.parent
    stem = main_output.stem
    ext = main_output.suffix.lstrip(".")
    # rasterize_masks caps bitmaps at MAX_MASKS — export the same subset
    for i, mdef in enumerate(masks_json[: bitmaps.shape[0]]):
        single = dict(adj)
        single["masks"] = [mdef]
        tm = (
            app_settings.tonemapper_override(is_raw)
            if app_settings is not None else None
        )
        params, cfg = parse_adjustments(
            single, is_raw=is_raw, tonemapper_override=tm
        )
        # the compiled single-image entry (a 24MP eager op-by-op dispatch
        # is orders of magnitude slower than the compiled path)
        out = np.asarray(
            develop_single_compiled(timg, params, cfg, masks=white)
        )
        if settings.long_edge:
            out = _resize_host(out, settings)
        if settings.watermark is not None:
            from rapidraw_tpu.pipeline.watermark import apply_watermark

            out = apply_watermark(np.asarray(out), settings.watermark)
        img_path = out_dir / f"{stem}_mask_{i}_image.{ext}"
        encode_image(out, img_path, settings.format, settings.quality)
        if settings.copy_exif:
            from rapidraw_tpu.io.exif import copy_exif

            # the REAL file path — a virtual '?vc=N' path reads no EXIF
            copy_exif(real, img_path, strip_gps_data=settings.strip_gps)
        if settings.preserve_timestamps:
            _restore_timestamps(real, img_path)

        _, oh, ow = np.asarray(out).shape
        alpha = (np.clip(bitmaps[i], 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
        alpha_img = Image.fromarray(alpha).resize((ow, oh), Image.LANCZOS)
        alpha_img.save(out_dir / f"{stem}_mask_{i}_alpha.png")


_ESTIMATE_DIM = 1280  # export_processing.rs:1118


def estimate_export_sizes(
    paths: list[str], settings: ExportSettings | None = None, app_settings=None
) -> int:
    """Estimated total output bytes (export_processing.rs:1020-1210).

    Renders the FIRST image at <=1280px, encodes it with the requested
    format/quality, and extrapolates by the output-pixel ratio x len(paths).
    `.cube` exports are a flat ~1.05 MB each. The estimate renders under
    the same app settings (RAW knobs + tonemapper override,
    export_processing.rs:1113) as export_images, so the probe pixels match
    what the export will actually encode.
    """
    settings = settings or ExportSettings()
    if settings.format.lower() == "cube":
        return 1_050_000 * len(paths)
    if not paths:
        return 0

    import io as _io
    import os

    import jax.numpy as jnp
    from PIL import Image

    from rapidraw_tpu.io.encode import encode_image
    from rapidraw_tpu.geometry.transforms import apply_all_transformations
    from rapidraw_tpu.io.loader import load_image, to_uint8_hwc
    from rapidraw_tpu.io.sidecar import load_adjustments
    from rapidraw_tpu.masks.rasterize import rasterize_masks
    from rapidraw_tpu.params.parse import parse_adjustments

    img, is_raw = load_image(paths[0], app_settings=app_settings)
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
    from rapidraw_tpu.masks.rasterize import (
        requires_warped_image, resolve_warped_image,
    )

    masks = rasterize_masks(
        adj, pw, ph, scale=scale,
        crop_offset=(crop_offset[0] * scale, crop_offset[1] * scale),
        # color/luminance range masks need the warped source — without it
        # they rasterize all-zero and the estimate renders unedited pixels
        warped_image=(
            resolve_warped_image(img, adj, is_raw)
            if requires_warped_image(adj) else None
        ),
    )
    tm_override = (
        app_settings.tonemapper_override(is_raw)
        if app_settings is not None else None
    )
    params, cfg = parse_adjustments(
        adj, is_raw=is_raw, tonemapper_override=tm_override
    )
    lut = None
    if cfg.has_lut and isinstance(adj.get("lutPath"), str):
        # the probe must apply the document LUT like the export will —
        # un-LUT-ed pixels encode to a different byte size
        from rapidraw_tpu.io.lut import parse_lut_file

        try:
            lut = jnp.asarray(parse_lut_file(adj["lutPath"]))
        except Exception:  # noqa: BLE001
            import dataclasses as _dc

            cfg = _dc.replace(cfg, has_lut=False)
    # run the probe through the COMPILED path (batch of one, the same
    # entry the real export renders with): eager develop dispatches the
    # whole chain op-by-op — orders of magnitude slower, stalling the
    # export dialog
    out = np.asarray(
        develop_single_compiled(preview, params, cfg, masks=masks, lut=lut)
    )

    # probe through the REAL encoder (the reference sizes the preview with
    # encode_image_to_bytes, export_processing.rs:1138-1143) so 16-bit
    # PNG/TIFF estimates carry their actual depth
    import tempfile as _tempfile

    try:
        with _tempfile.NamedTemporaryFile(
            suffix=f".{settings.format.lower()}", delete=False
        ) as tf:
            probe_path = tf.name
        try:
            encode_image(out, probe_path, settings.format, settings.quality)
            preview_bytes = os.path.getsize(probe_path)
        finally:
            try:
                os.unlink(probe_path)
            except OSError:
                pass
    except ValueError:
        buf = _io.BytesIO()
        Image.fromarray(to_uint8_hwc(out)).save(buf, format="PNG")
        preview_bytes = buf.tell()

    out_h, out_w = fh, fw
    tgt = calculate_resize_target(fw, fh, settings)
    if tgt is not None:
        out_w, out_h = tgt
    ratio = (out_h * out_w) / float(ph * pw)
    return int(preview_bytes * ratio) * len(paths)
