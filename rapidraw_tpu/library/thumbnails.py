"""Thumbnail service: content+adjustment-hashed disk cache of small renders.

Port of the reference thumbnail system (file_management.rs:1070-1439):
cache key = hash(path + mtime + adjustments) (:1377-1439, blake3 there,
blake2 here), render = mini develop pipeline (fast-demosaic load -> geometry
transform -> downscale to thumbnail resolution -> same develop chain ->
JPEG). Worker-pool concurrency is replaced by batched develop calls — the
TPU-native equivalent of the condvar queue (:1440-1568).
"""

from __future__ import annotations

import hashlib
from pathlib import Path

import numpy as np


def thumbnail_cache_key(
    path: str, adjustments: dict, resolution: int = 720, app_settings=None
) -> str:
    import json

    from rapidraw_tpu.io.loader import parse_virtual_path

    # the REAL file's mtime: a virtual '?vc=N' path would stat-fail and pin
    # mtime to 0, so the cache would never invalidate on re-edit
    p = Path(parse_virtual_path(str(path))[0])
    try:
        mtime = p.stat().st_mtime_ns
    except OSError:
        mtime = 0
    h = hashlib.blake2b(digest_size=16)
    h.update(str(path).encode())
    h.update(str(mtime).encode())
    # resolution is part of the identity: a 240px cache hit must not
    # satisfy a 1440px request
    h.update(str(int(resolution)).encode())
    h.update(json.dumps(adjustments, sort_keys=True, default=str).encode())
    if app_settings is not None:
        # develop-relevant app settings are part of the identity too: a
        # thumbnail rendered under old RAW-preprocessing/tonemapper
        # settings must not be served after settings.json changes
        h.update(
            json.dumps(
                [
                    app_settings.preprocessing_amounts(),
                    app_settings.raw_highlight_compression,
                    app_settings.linear_raw_mode,
                    app_settings.apply_preprocessing_to_non_raws,
                    app_settings.tonemapper_override(True),
                    app_settings.tonemapper_override(False),
                    str(app_settings.get("defaultRawTonemapper") or "agx"),
                    str(app_settings.get("defaultNonRawTonemapper") or "basic"),
                ],
                default=str,
            ).encode()
        )
    return h.hexdigest()


_jit_cache: dict = {}

# fixed develop-batch chunk for thumbnail buckets: a FIXED size means one
# compiled executable serves every chunk (a per-group batch size would
# recompile per folder size); 4 matches the export default batch_size
import os as _os_env

_THUMB_BATCH = int(_os_env.environ.get("RAPIDRAW_THUMB_BATCH", "4"))


def _jitted_develop(cfg):
    """cfg-keyed jitted develop (the service/export precedent): an eager
    per-op dispatch of the ~60-op chain per thumbnail is the expensive
    case on a remote device."""
    import jax

    if cfg not in _jit_cache:
        from rapidraw_tpu.pipeline.develop import develop

        _jit_cache[cfg] = jax.jit(
            lambda x, p, masks, lut: develop(x, p, cfg, masks=masks, lut=lut)
        )
    return _jit_cache[cfg]


def _container_preview_jpeg(path: str) -> bytes | None:
    """Embedded preview JPEG from a container whose RAW payload refuses:
    CR3 PRVW box (io/cr3.py), X3F IMAG section (io/x3f.py), CRW CIFF
    JpgFromRaw record (io/ciff.py)."""
    low = path.lower()
    try:
        data = Path(path).read_bytes()
        if low.endswith(".cr3"):
            from rapidraw_tpu.io.cr3 import parse_cr3_info

            return parse_cr3_info(data).preview_jpeg
        if low.endswith(".x3f"):
            from rapidraw_tpu.io.x3f import parse_x3f_info

            return parse_x3f_info(data).preview_jpeg
        if low.endswith(".crw"):
            from rapidraw_tpu.io.ciff import parse_crw_info

            info = parse_crw_info(data)
            return info.preview_jpeg or info.thumbnail_jpeg
    except Exception:  # noqa: BLE001
        return None
    return None


def _preview_fallback_thumbnail(path: str, resolution: int) -> bytes | None:
    """Downscaled JPEG from a refused container's embedded preview."""
    import io as _io

    from PIL import Image

    preview = _container_preview_jpeg(path)
    if not preview:
        return None
    im = Image.open(_io.BytesIO(preview)).convert("RGB")
    im.thumbnail((resolution, resolution))
    buf = _io.BytesIO()
    im.save(buf, "JPEG", quality=85)
    return buf.getvalue()


def _prep_thumbnail(
    path: str,
    resolution: int = 720,
    cache_dir: str | Path | None = None,
    app_settings=None,
):
    """Host-side half of a thumbnail render.

    Returns either finished JPEG `bytes` (cache hit / preview fallback /
    unedited-LDR downscale) or a dict
    {x, masks, params, cfg, lut, cache_file} ready for the develop chain —
    the split is what lets generate_thumbnails() batch same-shape develops
    into one launch (the TPU-native analog of the reference's worker pool,
    file_management.rs:1440-1507).
    """
    import jax.numpy as jnp

    from rapidraw_tpu.geometry.resize import downscale_to_long_edge
    from rapidraw_tpu.geometry.transforms import apply_all_transformations
    from rapidraw_tpu.io.encode import encode_jpeg_bytes
    from rapidraw_tpu.io.loader import load_image
    from rapidraw_tpu.io.sidecar import load_adjustments
    from rapidraw_tpu.masks.rasterize import rasterize_masks
    from rapidraw_tpu.params.parse import parse_adjustments

    if app_settings is None:
        from rapidraw_tpu.utils.settings import AppSettings, app_data_dir

        app_settings = AppSettings.load(app_data_dir() / "settings.json")

    adjustments = load_adjustments(path)
    key = thumbnail_cache_key(path, adjustments, resolution, app_settings)
    cache_file = None
    if cache_dir is not None:
        cache_file = Path(cache_dir) / f"{key}.jpg"
        if cache_file.exists():
            return cache_file.read_bytes()

    from rapidraw_tpu.params.parse import is_image_edited
    from rapidraw_tpu.masks.rasterize import requires_warped_image

    # fast = the reference's use_fast_raw_dev thumbnail path: speed demosaic
    # (HALF resolution), clamp to 1.0, no preprocessing enhance
    # (file_management.rs:1070-1367). Color/luminance range masks sample
    # the FULL-res warped image (targetX/Y are full-res pixels), so those
    # documents take the full-res load.
    fast = not requires_warped_image(adjustments)
    try:
        img, is_raw = load_image(path, app_settings=app_settings, fast=fast)
    except Exception as e:  # noqa: BLE001
        from rapidraw_tpu.io.containers import UnsupportedRawFormat

        from rapidraw_tpu.io.loader import parse_virtual_path

        real_path = parse_virtual_path(str(path))[0]
        if isinstance(e, UnsupportedRawFormat) and real_path.lower().endswith(
            (".cr3", ".x3f", ".crw")
        ):
            # refused RAW payload (unmatched crx dialect / Foveon / CIFF
            # compressed) but the container carries an embedded JPEG
            # preview — browse with that (the develop chain stays
            # unavailable, matching the refusal)
            data = _preview_fallback_thumbnail(real_path, resolution)
            if data is not None:
                if cache_file is not None:
                    cache_file.parent.mkdir(parents=True, exist_ok=True)
                    cache_file.write_bytes(data)
                return data
        raise
    x = jnp.asarray(img)

    if not is_raw and not is_image_edited(adjustments, is_raw):
        # unedited LDR: plain downscale, no develop
        # (file_management.rs:1134-1152's fast path)
        data = encode_jpeg_bytes(
            np.asarray(downscale_to_long_edge(x, resolution)), quality=85
        )
        if cache_file is not None:
            cache_file.parent.mkdir(parents=True, exist_ok=True)
            cache_file.write_bytes(data)
        return data

    # the fast RAW decode is 2x2-binned: measure the actual size ratio and
    # bucket it like the reference probe (raw_processing.rs:233-254), then
    # scale every full-res pixel coordinate (crop rect, AI patches, mask
    # scale) into the loaded space — the reference multiplies the same
    # raw_scale_factor into total_scale (file_management.rs:1184-1215)
    load_scale = 1.0
    if is_raw and fast:
        try:
            from rapidraw_tpu.library.catalog import get_image_dimensions

            fw, fh = get_image_dimensions(path)
            full_max = max(fw, fh)
            ratio = max(img.shape[2], img.shape[1]) / full_max if full_max else 1.0
            if 0.1 < ratio < 0.35:
                load_scale = 0.25
            elif 0.35 <= ratio < 0.75:
                load_scale = 0.5
        except Exception:  # dims unavailable: reload full-res (coords exact)
            img, is_raw = load_image(path, app_settings=app_settings)
            x = jnp.asarray(img)

    adj_t = adjustments
    if load_scale != 1.0:
        adj_t = dict(adjustments)
        crop = adjustments.get("crop")
        if isinstance(crop, dict):
            adj_t["crop"] = {k: float(v) * load_scale for k, v in crop.items()}

    # transform at loaded res, then downscale (matches the reference's
    # warp -> downscale -> flip/rotate/crop ordering closely enough for
    # thumbnails; the geometry cache trick of :1216-1219 is the jit cache)
    x, crop_offset = apply_all_transformations(x, adj_t, patch_scale=load_scale)
    full_h = int(x.shape[1])  # POST-transform height — mask coordinates
    # live in the transformed frame (same convention as service.py)
    x = downscale_to_long_edge(x, resolution)
    _, h, w = x.shape
    ds = h / full_h if full_h else 1.0
    from rapidraw_tpu.masks.rasterize import resolve_warped_image

    warped = (
        resolve_warped_image(img, adjustments, is_raw)
        if requires_warped_image(adjustments)
        else None
    )
    masks = rasterize_masks(
        adjustments, w, h, scale=ds * load_scale,
        crop_offset=(crop_offset[0] * ds, crop_offset[1] * ds),
        warped_image=warped,
    )
    # tonemapper: edited docs follow the override (None when disabled);
    # unedited ones force the settings default, mirroring the reference's
    # adjustments.is_null() branch (file_management.rs:1346-1363)
    if adjustments:
        tm_override = app_settings.tonemapper_override(is_raw)
    else:
        tm_key = "defaultRawTonemapper" if is_raw else "defaultNonRawTonemapper"
        tm_default = "agx" if is_raw else "basic"
        tm_override = 1 if (app_settings.get(tm_key) or tm_default) == "agx" else 0
    params, cfg = parse_adjustments(
        adjustments, is_raw=is_raw, tonemapper_override=tm_override
    )
    lut = None
    if cfg.has_lut and isinstance(adjustments.get("lutPath"), str):
        # thumbnails must show the document's LUT like every other render
        # path (the wrong render would cache under a key that includes the
        # LUT adjustments and never self-correct)
        from rapidraw_tpu.io.lut import parse_lut_file

        try:
            lut = jnp.asarray(parse_lut_file(adjustments["lutPath"]))
        except Exception:
            import dataclasses

            cfg = dataclasses.replace(cfg, has_lut=False)
    return {
        "x": x,
        "masks": jnp.asarray(masks) if masks is not None else None,
        "params": params,
        "cfg": cfg,
        "lut": lut,
        "cache_file": cache_file,
    }


def _finish_thumbnail(out, cache_file) -> bytes:
    from rapidraw_tpu.io.encode import encode_jpeg_bytes
    from rapidraw_tpu.pipeline.export import _device_u8

    # quantize ON DEVICE before readback (1/4 the wire bytes; identical
    # JPEG output — same formula as to_uint8_hwc, the export precedent);
    # batched callers pass pre-quantized u8 slices
    if getattr(out, "dtype", None) != np.uint8:
        out = _device_u8(out)
    data = encode_jpeg_bytes(np.asarray(out), quality=85)
    if cache_file is not None:
        cache_file.parent.mkdir(parents=True, exist_ok=True)
        cache_file.write_bytes(data)
    return data


def generate_thumbnail(
    path: str,
    resolution: int = 720,
    cache_dir: str | Path | None = None,
    app_settings=None,
) -> bytes:
    """Render one thumbnail JPEG (bytes), using the disk cache when valid.

    Mirrors generate_thumbnail_data (file_management.rs:1070-1367): edited
    images run the real develop chain at thumbnail scale; unedited LDRs are
    plain downscales; unedited RAWs get the default RAW tonemap via the
    develop path. Like the reference (:1092, :1317 load_settings per call),
    the app settings govern the RAW develop knobs and the tonemapper;
    app_settings=None loads settings.json from the app data dir.
    """
    prep = _prep_thumbnail(path, resolution, cache_dir, app_settings)
    if isinstance(prep, bytes):
        return prep
    out = _jitted_develop(prep["cfg"])(
        prep["x"], prep["params"], prep["masks"], prep["lut"]
    )
    return _finish_thumbnail(out, prep["cache_file"])


def generate_thumbnails(
    paths: list[str],
    resolution: int = 720,
    cache_dir: str | Path | None = None,
    cancel=None,  # utils.recovery.CancellationToken (lib.rs:239-258)
    progress=None,  # callable(done, total, path)
    app_settings=None,
) -> dict[str, bytes]:
    """Batch thumbnail generation (the worker-pool equivalent).

    Cancellation and progress mirror the reference's thumbnail queue
    (file_management.rs:1440-1568): the walk stops at the next item (or
    next device chunk, the batched analog) when the token fires, returning
    whatever completed. `progress(done, total, path)` fires after each
    COMPLETED thumbnail — completion-based, so the bar tracks the real
    develop/encode work rather than racing ahead during the cheap prep
    pass — plus one terminal (total, total, "") signal. Failures are
    isolated per image (a corrupt file must not discard the completed
    batch), like the reference's worker pool and export_images.
    """
    if app_settings is None:
        from rapidraw_tpu.utils.settings import AppSettings, app_data_dir

        app_settings = AppSettings.load(app_data_dir() / "settings.json")

    out: dict[str, bytes] = {}
    pending: list[tuple[str, dict]] = []
    cancelled = False
    total = len(paths)

    def _done(p):
        # progress counts COMPLETED thumbnails (the develop/encode work),
        # not prep-loop iterations — a folder of uncached edits would
        # otherwise race to total during the cheap hashing pass and then
        # sit frozen through the actual minutes of develop work
        if progress:
            progress(len(out), total, p)

    for p in paths:
        if cancel is not None and cancel.cancelled:
            cancelled = True
            break
        try:
            prep = _prep_thumbnail(p, resolution, cache_dir, app_settings)
        except Exception as e:  # noqa: BLE001
            from rapidraw_tpu.utils.trace import log

            log.warning("thumbnail failed for %s: %s", p, e)
            continue
        if isinstance(prep, bytes):
            out[p] = prep
            _done(p)
        else:
            pending.append((p, prep))

    # batch same-shape develops into ONE launch (round 5, VERDICT r4 #5):
    # thumbnails are all ~`resolution`-long-edge, so a library folder
    # collapses into a handful of (H, W) buckets — exactly the same-shape
    # small-batch work develop_fused_batch exists for. Different documents
    # share a compile via the merged DevelopConfig (the export-bucket
    # mechanism); LUT documents stay single (the LUT operand is per-doc).
    from collections import defaultdict

    buckets: dict = defaultdict(list)
    for p, prep in pending:
        if cancel is not None and cancel.cancelled:
            cancelled = True
            break
        cfg = prep["cfg"]
        if prep["lut"] is not None:
            buckets[("single", p)].append((p, prep))
            continue
        key = (
            tuple(prep["x"].shape),
            None if prep["masks"] is None else int(prep["masks"].shape[0]),
            cfg.is_raw,
            cfg.tonemapper_agx,
            float(cfg.ca_static_rc),
            float(cfg.ca_static_by),
            # mixed NR amounts would merge to the per-pixel gather path
            # (seconds per frame) — keep them in their own buckets
            cfg.nr_static_luma,
            cfg.nr_static_color,
        )
        buckets[key].append((p, prep))

    for key, group in buckets.items():
        if cancel is not None and cancel.cancelled:
            cancelled = True
            break
        try:
            if key[0] == "single" or len(group) == 1:
                for p, prep in group:
                    if cancel is not None and cancel.cancelled:
                        cancelled = True
                        break
                    o = _jitted_develop(prep["cfg"])(
                        prep["x"], prep["params"], prep["masks"], prep["lut"]
                    )
                    out[p] = _finish_thumbnail(o, prep["cache_file"])
                    _done(p)
                continue
            import jax.numpy as jnp

            from rapidraw_tpu.pipeline.batch import develop_batch, stack_params
            from rapidraw_tpu.pipeline.export import _device_u8

            # merge the whole group's activity ONCE (the export-bucket
            # rule): every fixed-size chunk then shares one compilation;
            # the last chunk pads by repeating its final entry
            _, cfg_b = stack_params(
                [prep["params"] for _, prep in group],
                [prep["cfg"] for _, prep in group],
            )
            z = None
            if cfg_b.mask_count > 0:
                z = jnp.zeros(
                    (cfg_b.mask_count,) + tuple(group[0][1]["x"].shape[1:]),
                    jnp.float32,
                )

            def pad_masks(mk):
                if mk is None:
                    return z
                n = int(mk.shape[0])
                if n == cfg_b.mask_count:
                    return mk
                return jnp.concatenate([mk, z[: cfg_b.mask_count - n]])

            for c0 in range(0, len(group), _THUMB_BATCH):
                if cancel is not None and cancel.cancelled:
                    # the reference's queue stops at the next item
                    # (file_management.rs:1440-1568); per-chunk is the
                    # batched analog of its per-image check
                    cancelled = True
                    break
                chunk = group[c0 : c0 + _THUMB_BATCH]
                n_real = len(chunk)
                padded = chunk + [chunk[-1]] * (_THUMB_BATCH - n_real)
                params_b, _ = stack_params(
                    [prep["params"] for _, prep in padded],
                    [prep["cfg"] for _, prep in padded],
                    cfg=cfg_b,
                )
                imgs = jnp.stack([prep["x"] for _, prep in padded])
                masks_b = None
                if cfg_b.mask_count > 0:
                    masks_b = jnp.stack(
                        [pad_masks(prep["masks"]) for _, prep in padded]
                    )
                outs = np.asarray(_device_u8(
                    develop_batch(imgs, params_b, cfg_b, masks=masks_b)
                ))[:n_real]
                for (p, prep), o in zip(chunk, outs):
                    out[p] = _finish_thumbnail(o, prep["cache_file"])
                    _done(p)
        except Exception as e:  # noqa: BLE001 — isolate per bucket, then
            # per image: a corrupt entry must not discard the folder
            from rapidraw_tpu.utils.trace import log

            log.warning("thumbnail bucket failed (%s): %s — retrying singly",
                        key, e)
            for p, prep in group:
                if p in out:  # chunks before the failure already finished
                    continue
                if cancel is not None and cancel.cancelled:
                    cancelled = True
                    break
                try:
                    o = _jitted_develop(prep["cfg"])(
                        prep["x"], prep["params"], prep["masks"], prep["lut"]
                    )
                    out[p] = _finish_thumbnail(o, prep["cache_file"])
                    _done(p)
                except Exception as e2:  # noqa: BLE001
                    log.warning("thumbnail failed for %s: %s", p, e2)

    if progress and paths and not cancelled:
        progress(len(paths), len(paths), "")  # terminal signal
    return out


def clear_thumbnail_cache(cache_dir: str) -> None:
    """Wipe and recreate the hash-keyed thumbnail cache directory
    (file_management.rs:1035-1054)."""
    import shutil
    from pathlib import Path

    d = Path(cache_dir)
    if d.exists():
        shutil.rmtree(d)
    d.mkdir(parents=True, exist_ok=True)
