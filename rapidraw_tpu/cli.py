"""Command-line interface.

The TPU-native framework's user surface, replacing the reference's Tauri
command layer for headless/batch use:

  python -m rapidraw_tpu develop IMG [-a adjustments.json] [-o out.jpg]
  python -m rapidraw_tpu export IMG... -o DIR [--format jpeg] [--long-edge N]
  python -m rapidraw_tpu auto IMG            # auto-adjust JSON to stdout
  python -m rapidraw_tpu negative IMG -o OUT # film negative -> positive
  python -m rapidraw_tpu histogram IMG       # scope stats to stdout
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path


_EXPORT_FORMATS = ("jpeg", "jpg", "png", "tiff", "tif", "webp", "avif", "jxl")


def _require_file(path: str) -> None:
    # virtual-copy paths ('img.jpg?vc=2') are first-class CLI arguments
    # everywhere the reference accepts them (export_processing.rs:699-718,
    # parse_virtual_path file_management.rs:165-196): check the REAL file
    from rapidraw_tpu.io.loader import parse_virtual_path

    if not Path(parse_virtual_path(str(path))[0]).is_file():
        raise SystemExit(f"error: no such file: {path}")


def _default_output(image: str, tag: str, ext: str) -> str:
    """'<real stem>[_vcN]_<tag>.<ext>' beside the source — virtual-copy
    aware (a '?vc=N' query must not leak into the output filename)."""
    from rapidraw_tpu.io.loader import parse_virtual_path

    real, vc = parse_virtual_path(str(image))
    p = Path(real)
    stem = p.with_suffix("").name + (f"_vc{vc}" if vc else "")
    return str(p.parent / f"{stem}_{tag}.{ext}")


def _app_settings():
    """The app-level settings every image-loading verb must share: RAW
    develop knobs + tonemapper override. `export` already threaded these
    (export_processing.rs:637+); the single-image verbs must too, or
    `develop RAW.dng` and `export RAW.dng` disagree on the same file."""
    from rapidraw_tpu.utils.settings import AppSettings, app_data_dir

    return AppSettings.load(app_data_dir() / "settings.json")


def _cmd_develop(args) -> int:
    import numpy as np
    import jax.numpy as jnp

    from rapidraw_tpu.geometry.transforms import apply_all_transformations
    from rapidraw_tpu.io.encode import encode_image
    from rapidraw_tpu.io.loader import load_image
    from rapidraw_tpu.io.sidecar import load_adjustments
    from rapidraw_tpu.masks.rasterize import rasterize_masks
    from rapidraw_tpu.params.parse import parse_adjustments

    _require_file(args.image)
    if args.adjustments:  # validate before the (device-touching) load
        _require_file(args.adjustments)
    app_settings = _app_settings()
    img, is_raw = load_image(args.image, app_settings=app_settings)
    if args.adjustments:
        adj = json.loads(Path(args.adjustments).read_text())
        if isinstance(adj.get("adjustments"), dict):
            # a full sidecar (.rrdata ImageMetadata) was passed — unwrap it
            # instead of silently developing with the identity doc
            adj = adj["adjustments"]
    else:
        adj = load_adjustments(args.image)
    # develop writes a FINAL file: the clipping overlay is an editor aid
    # and must never bake into output, exactly like every export entry
    # (export_processing.rs:250 forces show_clipping=0)
    adj = dict(adj)
    adj["showClipping"] = False

    timg, crop_offset = apply_all_transformations(jnp.asarray(img), adj)
    _, h, w = timg.shape
    from rapidraw_tpu.masks.rasterize import resolve_warped_image

    warped = resolve_warped_image(img, adj, is_raw)
    masks = rasterize_masks(adj, w, h, scale=1.0, crop_offset=crop_offset,
                            warped_image=warped)
    params, cfg = parse_adjustments(
        adj, is_raw=is_raw,
        tonemapper_override=app_settings.tonemapper_override(is_raw),
    )
    lut = None
    if cfg.has_lut:
        from rapidraw_tpu.io.lut import parse_lut_file

        try:
            lut = jnp.asarray(parse_lut_file(adj["lutPath"]))
        except Exception as e:  # degrade exactly like export._prepare_one
            import dataclasses as _dc

            print(f"warning: LUT unavailable ({e}); developing without it",
                  file=sys.stderr)
            cfg = _dc.replace(cfg, has_lut=False)
    if max(timg.shape[1], timg.shape[2]) > 8192:
        # beyond the reference's texture cap: host-side 2048/128 tiling
        from rapidraw_tpu.pipeline.tiled import develop_tiled

        out = develop_tiled(np.asarray(timg), params, cfg, masks=masks, lut=lut)
    else:
        # the SAME jitted batch entry export renders through (batch of 1):
        # `develop X` and `export X` must produce identical bytes, and the
        # eager per-op dispatch drifts up to ~4e-3 from the compiled graph
        # (fusion changes the pow/log paths) besides being the slow case
        # on a remote device
        from rapidraw_tpu.pipeline.export import develop_single_compiled

        out = develop_single_compiled(timg, params, cfg, masks=masks, lut=lut)
    dst = args.output or _default_output(args.image, "edited", "jpg")
    encode_image(np.asarray(out), dst, quality=args.quality)
    print(dst)
    return 0


def _cmd_export(args) -> int:
    from rapidraw_tpu.pipeline.export import ExportSettings, export_images

    if args.format.lower() not in _EXPORT_FORMATS:
        raise SystemExit(
            f"error: unsupported format {args.format!r} (choose from {', '.join(_EXPORT_FORMATS)})"
        )
    for p in args.images:
        _require_file(p)
    watermark = None
    if args.watermark:
        from rapidraw_tpu.pipeline.watermark import WatermarkSettings

        _require_file(args.watermark)
        watermark = WatermarkSettings(
            path=args.watermark,
            anchor=args.watermark_anchor,
            scale=args.watermark_scale,
            spacing=args.watermark_spacing,
            opacity=args.watermark_opacity,
        )
    settings = ExportSettings(
        format=args.format,
        quality=args.quality,
        long_edge=args.long_edge,
        resize_mode=args.resize_mode,
        dont_enlarge=not args.allow_enlarge,
        batch_size=args.batch_size,
        watermark=watermark,
        filename_template=args.template,
        preserve_folders=args.preserve_folders,
        base_origin_folders=tuple(args.base_folder),
        preserve_timestamps=args.preserve_timestamps,
        export_masks=args.export_masks,
    )
    if args.estimate_size:
        from rapidraw_tpu.pipeline.export import estimate_export_sizes
        from rapidraw_tpu.utils.settings import AppSettings, app_data_dir

        app_settings = AppSettings.load(app_data_dir() / "settings.json")
        print(estimate_export_sizes(args.images, settings, app_settings))
        return 0

    def progress(i, n, p):
        if p:
            print(f"[{i + 1}/{n}] {p}", file=sys.stderr)

    # app-level settings (RAW develop knobs + tonemapper override) so the
    # export matches the preview the user tuned (export_processing.rs:637+)
    from rapidraw_tpu.utils.settings import AppSettings, app_data_dir

    app_settings = AppSettings.load(app_data_dir() / "settings.json")
    results = export_images(
        args.images, args.output, settings, progress, app_settings=app_settings
    )
    failed = [r for r in results if not r.ok]
    for r in results:
        if r.ok:
            print(r.output)
        else:
            print(f"FAILED {r.source}: {r.error}", file=sys.stderr)
    return 1 if failed else 0


def _cmd_auto(args) -> int:
    from rapidraw_tpu.analysis.auto_adjust import calculate_auto_adjustments
    from rapidraw_tpu.io.loader import load_image

    _require_file(args.image)
    img, _ = load_image(args.image, app_settings=_app_settings())
    print(json.dumps(calculate_auto_adjustments(img), indent=2, ensure_ascii=False))
    return 0


def _cmd_negative(args) -> int:
    import numpy as np
    import jax.numpy as jnp

    from rapidraw_tpu.compositions.negative import (
        NegativeConversionParams,
        convert_negative,
    )
    from rapidraw_tpu.io.encode import encode_image
    from rapidraw_tpu.io.loader import load_image

    _require_file(args.image)
    img, _ = load_image(args.image, app_settings=_app_settings())
    params = NegativeConversionParams(
        red_weight=args.red, green_weight=args.green, blue_weight=args.blue,
        exposure=args.exposure, contrast=args.contrast,
    )
    out = convert_negative(jnp.asarray(img), params)
    dst = args.output or _default_output(args.image, "Positive", "tiff")
    encode_image(np.asarray(out), dst, quality=95)
    print(dst)
    return 0


def _cmd_cull(args) -> int:
    from rapidraw_tpu.compositions.culling import cull_images

    for p in args.images:
        _require_file(p)
    res = cull_images(args.images, group_similar_images=not args.no_group)
    out = {
        "groups": [
            [
                {
                    "path": a.path,
                    "qualityScore": round(a.quality_score, 4),
                    "sharpness": round(a.sharpness_metric, 2),
                    "exposure": round(a.exposure_metric, 4),
                }
                for a in g
            ]
            for g in res["groups"]
        ],
        "best": res["best"],
        "failed": res["failed"],
    }
    print(json.dumps(out, indent=2))
    return 0


def _cmd_hdr(args) -> int:
    import numpy as np
    import jax.numpy as jnp

    from rapidraw_tpu.compositions.hdr import merge_hdr, read_exif_exposure
    from rapidraw_tpu.io.encode import encode_image
    from rapidraw_tpu.io.loader import load_image
    from rapidraw_tpu.ops.colorspace import linear_to_srgb, srgb_to_linear

    if len(args.images) < 2:
        raise SystemExit("error: need at least two images to merge")
    imgs, exps, isos = [], [], []
    app_settings = _app_settings()
    for p in args.images:
        _require_file(p)
        img, is_raw = load_image(p, app_settings=app_settings)
        x = jnp.asarray(img)
        if not is_raw:
            x = srgb_to_linear(x)  # lib.rs:1433-1435
        exp, iso = read_exif_exposure(p)
        if exp is None or iso is None:
            raise SystemExit(f"error: {p} is missing ExposureTime/ISO EXIF data")
        imgs.append(x)
        exps.append(exp)
        isos.append(iso)
    merged = merge_hdr(imgs, exps, isos)
    out = np.asarray(linear_to_srgb(merged))
    dst = args.output or "hdr_merged.png"
    encode_image(out, dst)
    print(dst)
    return 0


def _cmd_denoise(args) -> int:
    import numpy as np

    from rapidraw_tpu.compositions.bm3d import run_bm3d
    from rapidraw_tpu.io.encode import encode_image
    from rapidraw_tpu.io.loader import load_image

    _require_file(args.image)
    img, _ = load_image(args.image, app_settings=_app_settings())
    if args.method == "ai":
        from rapidraw_tpu.ai.denoise import denoise_ai
        from rapidraw_tpu.ai.models import ModelUnavailable

        try:
            out = denoise_ai(np.asarray(img), quality=args.intensity)
        except ModelUnavailable as e:
            raise SystemExit(f"error: {e}")
    else:
        out = run_bm3d(np.asarray(img), intensity=args.intensity)
    dst = args.output or _default_output(args.image, "denoised", "png")
    encode_image(out, dst)
    print(dst)
    return 0


def _cmd_panorama(args) -> int:
    import numpy as np

    from rapidraw_tpu.compositions.panorama import PanoramaError, stitch_panorama
    from rapidraw_tpu.io.encode import encode_image
    from rapidraw_tpu.io.loader import load_image

    app_settings = _app_settings()
    for p in args.images:
        _require_file(p)
    imgs = [np.asarray(load_image(p, app_settings=app_settings)[0])
            for p in args.images]
    try:
        pano = stitch_panorama(imgs)
    except PanoramaError as e:
        raise SystemExit(f"error: {e}") from e
    dst = args.output or "panorama.png"
    encode_image(pano, dst)
    print(dst)
    return 0


def _cmd_lut_export(args) -> int:
    from pathlib import Path as P

    from rapidraw_tpu.pipeline.watermark import export_adjustments_as_lut

    if args.adjustments:
        _require_file(args.adjustments)
        adj = json.loads(P(args.adjustments).read_text())
    elif args.image:
        from rapidraw_tpu.io.sidecar import load_adjustments

        _require_file(args.image)  # a typo'd path would emit an identity LUT
        adj = load_adjustments(args.image)
    else:
        raise SystemExit("error: provide --adjustments or --image")
    cube = export_adjustments_as_lut(adj, lut_size=args.size)
    dst = args.output or "grade.cube"
    P(dst).write_text(cube)
    print(dst)
    return 0


def _cmd_histogram(args) -> int:
    from rapidraw_tpu.analysis.scopes import calculate_histogram
    from rapidraw_tpu.io.loader import load_image

    _require_file(args.image)
    img, _ = load_image(args.image, app_settings=_app_settings())
    hist = calculate_histogram(img)
    print(json.dumps({k: [round(float(x), 4) for x in v] for k, v in hist.items()}))
    return 0


def _enable_persistent_jit_cache() -> None:
    """CLI invocations are separate processes; persist XLA executables so
    repeat invocations skip the 30s+ TPU compile (override dir with
    RAPIDRAW_CACHE_DIR, disable with RAPIDRAW_CACHE_DIR=none)."""
    import os

    cache_dir = os.environ.get(
        "RAPIDRAW_CACHE_DIR", os.path.expanduser("~/.cache/rapidraw_tpu/jit")
    )
    if cache_dir.lower() == "none":
        return
    try:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # noqa: BLE001 — cache is best-effort
        pass


def _cmd_tag(args) -> int:
    from rapidraw_tpu.ai.models import ModelUnavailable
    from rapidraw_tpu.ai.tagging import index_folder_tags

    try:
        n = index_folder_tags(
            args.folder, custom_tags=args.custom, max_tags=args.max_tags,
            progress=lambda c, t: print(f"\r{c}/{t}", end="", flush=True),
        )
    except ModelUnavailable as e:  # actionable message, not a traceback
        raise SystemExit(f"error: {e}")
    print(f"\ntagged {n} image(s)")
    return 0


def _cmd_lib(args) -> int:
    """Library/file-management verbs (COMMANDS.md host-side surface)."""
    from rapidraw_tpu.library import catalog

    op = args.op
    if op == "ls":
        for p in catalog.list_images(args.path, recursive=args.recursive):
            print(p)
    elif op == "rate":
        for p in args.paths:
            catalog.set_rating(p, args.value)
    elif op == "label":
        for p in args.paths:
            catalog.set_color_label(p, args.value or None)
    elif op == "tag-add":
        for p in args.paths:
            catalog.add_tags(p, [f"user:{t}" for t in args.tags])
    elif op == "tag-remove":
        for p in args.paths:
            catalog.remove_tags(p, args.tags + [f"user:{t}" for t in args.tags])
    elif op == "clear-ai-tags":
        from rapidraw_tpu.ai.tagging import clear_ai_tags

        print(clear_ai_tags(args.path))
    elif op == "clear-sidecars":
        print(catalog.clear_all_sidecars(args.path))
    elif op == "types":
        print(json.dumps(catalog.get_supported_file_types()))
    elif op == "dims":
        for p in args.paths:
            w, h = catalog.get_image_dimensions(p)
            print(f"{p}: {w}x{h}")
    return 0


def _cmd_exif(args) -> int:
    # read the EFFECTIVE tags (sidecar exif block first — where --set
    # persists, and what exports write through), not just the file bytes
    from rapidraw_tpu.io.exif import effective_exif_tags, update_exif_fields

    if args.set:
        for kv in args.set:
            if "=" not in kv:
                raise SystemExit(
                    f"error: --set expects TAG=VALUE, got {kv!r}"
                )
        updates = dict(kv.split("=", 1) for kv in args.set)
        update_exif_fields(args.paths, updates)
    for p in args.paths:
        print(json.dumps({p: effective_exif_tags(p)}, ensure_ascii=False))
    return 0


def _cmd_preset(args) -> int:
    from rapidraw_tpu.library.presets import (
        PresetStore,
        apply_adjustments_to_paths,
        export_presets_to_file,
        reset_adjustments_for_paths,
    )

    store = PresetStore(args.store)
    if args.op == "list":
        for p in store.list():
            print(p["name"])
    elif args.op == "import":
        for p in store.import_file(args.file):
            print(f"imported {p['name']}")
    elif args.op == "export":
        export_presets_to_file(store.list(), args.file)
    elif args.op == "apply":
        preset = store.get(args.name)
        if preset is None:
            print(f"no preset named {args.name!r}", file=sys.stderr)
            return 1
        apply_adjustments_to_paths(args.paths, preset["adjustments"])
    elif args.op == "reset":
        reset_adjustments_for_paths(args.paths)
    elif args.op == "show":
        preset = store.get(args.name)
        if preset is None:
            return 1
        print(json.dumps(preset["adjustments"], indent=2, ensure_ascii=False))
    return 0


def main(argv=None) -> int:
    _enable_persistent_jit_cache()
    ap = argparse.ArgumentParser(prog="rapidraw_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    d = sub.add_parser("develop", help="develop one image")
    d.add_argument("image")
    d.add_argument("-a", "--adjustments", help="adjustment JSON file (default: sidecar)")
    d.add_argument("-o", "--output")
    d.add_argument("-q", "--quality", type=int, default=90)
    d.set_defaults(fn=_cmd_develop)

    e = sub.add_parser("export", help="batch export")
    e.add_argument("images", nargs="+")
    e.add_argument("-o", "--output", required=True)
    e.add_argument("--format", default="jpeg")
    e.add_argument("-q", "--quality", type=int, default=90)
    e.add_argument("--long-edge", type=int, dest="long_edge",
                   help="resize value (edge picked by --resize-mode)")
    e.add_argument("--resize-mode", default="longEdge",
                   choices=["longEdge", "shortEdge", "width", "height"])
    e.add_argument("--allow-enlarge", action="store_true",
                   help="also upscale images smaller than the resize value")
    e.add_argument("--batch-size", type=int, default=4)
    e.add_argument("--watermark", help="watermark image path")
    e.add_argument("--watermark-anchor", default="bottomRight")
    e.add_argument("--watermark-scale", type=float, default=15.0)
    e.add_argument("--watermark-spacing", type=float, default=2.0)
    e.add_argument("--watermark-opacity", type=float, default=100.0)
    e.add_argument("--template", default="{original_filename}_edited",
                   help="filename template: {original_filename} {sequence} {YYYY} {MM} {DD} {hh} {mm}")
    e.add_argument("--preserve-folders", action="store_true",
                   help="recreate the source folder tree under the output dir")
    e.add_argument("--base-folder", action="append", default=[],
                   help="root(s) relative to which --preserve-folders keeps the tree")
    e.add_argument("--preserve-timestamps", action="store_true",
                   help="stamp outputs with the source capture time")
    e.add_argument("--export-masks", action="store_true",
                   help="also write per-mask image+alpha pairs")
    e.add_argument("--estimate-size", action="store_true",
                   help="print the estimated total output bytes and exit")
    e.set_defaults(fn=_cmd_export)

    a = sub.add_parser("auto", help="compute auto adjustments")
    a.add_argument("image")
    a.set_defaults(fn=_cmd_auto)

    n = sub.add_parser("negative", help="convert film negative to positive")
    n.add_argument("image")
    n.add_argument("-o", "--output")
    n.add_argument("--red", type=float, default=1.0)
    n.add_argument("--green", type=float, default=1.0)
    n.add_argument("--blue", type=float, default=1.0)
    n.add_argument("--exposure", type=float, default=0.0)
    n.add_argument("--contrast", type=float, default=1.0)
    n.set_defaults(fn=_cmd_negative)

    h = sub.add_parser("histogram", help="print histogram JSON")
    h.add_argument("image")
    h.set_defaults(fn=_cmd_histogram)

    c = sub.add_parser("cull", help="group similar images and rank quality")
    c.add_argument("images", nargs="+")
    c.add_argument("--no-group", action="store_true")
    c.set_defaults(fn=_cmd_cull)

    m = sub.add_parser("hdr", help="merge bracketed exposures")
    m.add_argument("images", nargs="+")
    m.add_argument("-o", "--output")
    m.set_defaults(fn=_cmd_hdr)

    dn = sub.add_parser("denoise", help="denoise an image (BM3D or AI)")
    dn.add_argument("image")
    dn.add_argument("-o", "--output")
    dn.add_argument("--intensity", type=float, default=0.5)
    dn.add_argument("--method", choices=("bm3d", "ai"), default="bm3d",
                    help="ai requires UtNet weights in RAPIDRAW_MODELS")
    dn.set_defaults(fn=_cmd_denoise)

    pa = sub.add_parser("panorama", help="stitch overlapping frames")
    pa.add_argument("images", nargs="+")
    pa.add_argument("-o", "--output")
    pa.set_defaults(fn=_cmd_panorama)

    le = sub.add_parser("lut-export", help="bake a grade into a .cube LUT")
    le.add_argument("-a", "--adjustments")
    le.add_argument("--image", help="take adjustments from this image's sidecar")
    le.add_argument("-o", "--output")
    le.add_argument("--size", type=int, default=33)
    le.set_defaults(fn=_cmd_lut_export)

    tg = sub.add_parser("tag", help="CLIP-tag every image in a folder into sidecars")
    tg.add_argument("folder")
    tg.add_argument("--custom", nargs="*", help="score only these labels")
    tg.add_argument("--max-tags", type=int, default=10)
    tg.set_defaults(fn=_cmd_tag)

    lb = sub.add_parser("lib", help="library/file-management operations")
    lsub = lb.add_subparsers(dest="op", required=True)
    p_ls = lsub.add_parser("ls", help="list images (incl. virtual copies)")
    p_ls.add_argument("path")
    p_ls.add_argument("-r", "--recursive", action="store_true")
    p_rate = lsub.add_parser("rate", help="set star rating on sidecars")
    p_rate.add_argument("value", type=int)
    p_rate.add_argument("paths", nargs="+")
    p_lab = lsub.add_parser("label", help="set color label ('' clears)")
    p_lab.add_argument("value")
    p_lab.add_argument("paths", nargs="+")
    p_ta = lsub.add_parser("tag-add", help="add user: tags")
    p_ta.add_argument("--tags", required=True, type=lambda s: s.split(","),
                      help="comma-separated tag list")
    p_ta.add_argument("paths", nargs="+")
    p_tr = lsub.add_parser("tag-remove", help="remove tags")
    p_tr.add_argument("--tags", required=True, type=lambda s: s.split(","),
                      help="comma-separated tag list")
    p_tr.add_argument("paths", nargs="+")
    p_cat = lsub.add_parser("clear-ai-tags", help="strip AI tags under a root")
    p_cat.add_argument("path")
    p_cs = lsub.add_parser("clear-sidecars", help="delete all sidecars under a root")
    p_cs.add_argument("path")
    lsub.add_parser("types", help="print supported file types JSON")
    p_dim = lsub.add_parser("dims", help="print image dimensions (no decode)")
    p_dim.add_argument("paths", nargs="+")
    lb.set_defaults(fn=_cmd_lib)

    ex = sub.add_parser("exif", help="read/update EXIF via sidecars")
    ex.add_argument("paths", nargs="+")
    ex.add_argument("--set", nargs="*", metavar="KEY=VALUE",
                    help="field updates (empty value deletes the key)")
    ex.set_defaults(fn=_cmd_exif)

    pr = sub.add_parser("preset", help="preset store operations")
    pr.add_argument("--store", default="presets.json",
                    help="preset store JSON (default ./presets.json)")
    psub = pr.add_subparsers(dest="op", required=True)
    psub.add_parser("list")
    p_imp = psub.add_parser("import", help="import presets (.json or Lightroom .xmp)")
    p_imp.add_argument("file")
    p_exp = psub.add_parser("export", help="export all presets to a share file")
    p_exp.add_argument("file")
    p_app = psub.add_parser("apply", help="paste a preset onto image sidecars")
    p_app.add_argument("name")
    p_app.add_argument("paths", nargs="+")
    p_res = psub.add_parser("reset", help="reset sidecar adjustments to {}")
    p_res.add_argument("paths", nargs="+")
    p_shw = psub.add_parser("show", help="print a preset's adjustments JSON")
    p_shw.add_argument("name")
    pr.set_defaults(fn=_cmd_preset)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
