"""CLI + export service end-to-end tests (CPU)."""

import json
from pathlib import Path

import numpy as np
from PIL import Image

from rapidraw_tpu.cli import main


def _make_jpeg(path, h=48, w=64, seed=0):
    rng = np.random.default_rng(seed)
    arr = (rng.random((h, w, 3)) * 255).astype(np.uint8)
    Image.fromarray(arr).save(path, quality=95)
    return path


def test_cli_develop_with_adjustments(tmp_path):
    src = _make_jpeg(tmp_path / "in.jpg")
    adj = tmp_path / "adj.json"
    adj.write_text(json.dumps({"exposure": 1.0, "contrast": 20}))
    out = tmp_path / "out.jpg"
    rc = main(["develop", str(src), "-a", str(adj), "-o", str(out)])
    assert rc == 0
    assert out.exists()
    assert Image.open(out).size == (64, 48)


def test_cli_develop_accepts_sidecar_format_adjustments(tmp_path):
    """-a with a full .rrdata ImageMetadata file (what the app writes) must
    unwrap `adjustments`, not silently develop with the identity doc."""
    src = _make_jpeg(tmp_path / "in.jpg")
    adj = tmp_path / "meta.rrdata"
    adj.write_text(json.dumps(
        {"version": 1, "rating": 3, "adjustments": {"exposure": 2.0}}
    ))
    out = tmp_path / "out.jpg"
    rc = main(["develop", str(src), "-a", str(adj), "-o", str(out)])
    assert rc == 0
    assert np.asarray(Image.open(out)).mean() > np.asarray(Image.open(src)).mean()


def test_cli_develop_uses_sidecar(tmp_path):
    from rapidraw_tpu.io.sidecar import save_sidecar

    src = _make_jpeg(tmp_path / "in.jpg")
    save_sidecar(src, {"adjustments": {"exposure": 2.0}})
    out = tmp_path / "out.jpg"
    rc = main(["develop", str(src), "-o", str(out)])
    assert rc == 0
    bright = np.asarray(Image.open(out)).mean()
    plain = np.asarray(Image.open(src)).mean()
    assert bright > plain


def test_export_service_batches(tmp_path):
    from rapidraw_tpu.io.sidecar import save_sidecar
    from rapidraw_tpu.pipeline.export import ExportSettings, export_images

    paths = []
    for i in range(3):
        p = _make_jpeg(tmp_path / f"img{i}.jpg", seed=i)
        save_sidecar(p, {"adjustments": {"exposure": 0.5, "vibrance": 20}})
        paths.append(str(p))
    # one odd-size image forces a second bucket
    p = _make_jpeg(tmp_path / "odd.jpg", h=32, w=32, seed=9)
    save_sidecar(p, {"adjustments": {"exposure": 0.5}})
    paths.append(str(p))

    out_dir = tmp_path / "out"
    results = export_images(paths, out_dir, ExportSettings(batch_size=2, quality=92))
    assert len(results) == 4
    assert all(r.ok for r in results), [r.error for r in results]
    assert len(list(out_dir.glob("*.jpg"))) == 4


def test_export_mixed_edits_share_one_compile(tmp_path):
    """Documents differing only in sliders must land in ONE bucket/compile
    (structural bucketing + per-bucket merge_configs; the reference pushes
    every export through a single pipeline, export_processing.rs:661-738)."""
    import rapidraw_tpu.pipeline.export as ex
    from rapidraw_tpu.io.sidecar import save_sidecar

    edits = [
        {"exposure": 0.5},
        {"exposure": -1.0, "contrast": 35},
        {"vibrance": 40, "vignetteAmount": -30},
        {"hsl": {"reds": {"hue": 10, "saturation": 5, "luminance": 0}}},
        {"shadows": 25, "temperature": 12},
    ]
    paths = []
    for i, adj in enumerate(edits):
        p = _make_jpeg(tmp_path / f"m{i}.jpg", seed=i)
        save_sidecar(p, {"adjustments": adj})
        paths.append(str(p))

    ex._jit_cache.clear()
    results = ex.export_images(paths, tmp_path / "out", ex.ExportSettings(batch_size=3))
    assert all(r.ok for r in results), [r.error for r in results]
    assert len(ex._jit_cache) == 1, list(ex._jit_cache)


def test_export_mixed_ca_splits_buckets(tmp_path):
    """Different chromatic-aberration amounts can't share a compile
    (the CA resample grid is doc-static) — the bucketer must split them
    instead of letting merge_configs raise."""
    import rapidraw_tpu.pipeline.export as ex
    from rapidraw_tpu.io.sidecar import save_sidecar

    paths = []
    for i, ca in enumerate((0.0, 30.0)):
        p = _make_jpeg(tmp_path / f"ca{i}.jpg", seed=i)
        save_sidecar(p, {"adjustments": {"exposure": 0.3, "chromaticAberrationRedCyan": ca}})
        paths.append(str(p))

    ex._jit_cache.clear()
    results = ex.export_images(paths, tmp_path / "out", ex.ExportSettings())
    assert all(r.ok for r in results), [r.error for r in results]
    assert len(ex._jit_cache) == 2


def test_export_resize_long_edge(tmp_path):
    from rapidraw_tpu.pipeline.export import ExportSettings, export_images

    p = _make_jpeg(tmp_path / "big.jpg", h=64, w=96)
    results = export_images([str(p)], tmp_path / "out", ExportSettings(long_edge=48))
    assert results[0].ok
    assert Image.open(results[0].output).size == (48, 32)


def test_calculate_resize_target_modes():
    """All four reference resize modes + dont_enlarge (export_processing.rs
    :160-192; the shipped 'Fast (Web)' preset uses mode=width,
    app_settings.rs:273)."""
    from rapidraw_tpu.pipeline.export import ExportSettings, calculate_resize_target

    # width mode on a portrait fixes the WIDTH...
    s = ExportSettings(long_edge=2048, resize_mode="width")
    assert calculate_resize_target(3000, 4000, s) == (2048, 2731)
    # ...where longEdge on the same portrait fixes the HEIGHT
    s = ExportSettings(long_edge=2048, resize_mode="longEdge")
    assert calculate_resize_target(3000, 4000, s) == (1536, 2048)
    s = ExportSettings(long_edge=1000, resize_mode="shortEdge")
    assert calculate_resize_target(3000, 4000, s) == (1000, 1333)
    s = ExportSettings(long_edge=500, resize_mode="height")
    assert calculate_resize_target(3000, 4000, s) == (375, 500)
    # dont_enlarge (default) tests the MODE's edge: width 3500 does not
    # exceed 3000, but longEdge 3500 < 4000 does
    s = ExportSettings(long_edge=3500, resize_mode="width")
    assert calculate_resize_target(3000, 4000, s) is None
    s = ExportSettings(long_edge=3500, resize_mode="longEdge")
    assert calculate_resize_target(3000, 4000, s) == (2625, 3500)
    # dont_enlarge=False upscales (DynamicImage::resize enlarges too)
    s = ExportSettings(long_edge=6000, resize_mode="width", dont_enlarge=False)
    assert calculate_resize_target(3000, 4000, s) == (6000, 8000)


def test_export_resize_width_mode(tmp_path):
    from rapidraw_tpu.pipeline.export import ExportSettings, export_images

    p = _make_jpeg(tmp_path / "big.jpg", h=64, w=96)
    results = export_images(
        [str(p)], tmp_path / "out",
        ExportSettings(long_edge=48, resize_mode="width"),
    )
    assert results[0].ok
    assert Image.open(results[0].output).size == (48, 32)
    # longEdge 48 of the same image gives (48, 32) too; height mode differs
    results = export_images(
        [str(p)], tmp_path / "out2",
        ExportSettings(long_edge=32, resize_mode="height"),
    )
    assert results[0].ok
    assert Image.open(results[0].output).size == (48, 32)


def test_encode_16bit_png_tiff(tmp_path):
    """Float renders encode as 16-bit PNG/TIFF like the reference's Rgb16
    writes (export_processing.rs:446-462); u8 sources stay 8-bit for PNG
    but upgrade x*257 for TIFF (to_rgb16)."""
    import cv2

    from rapidraw_tpu.io.encode import encode_image

    rng = np.random.default_rng(0)
    img = rng.random((3, 8, 8), dtype=np.float32)
    exp = np.floor(np.clip(img, 0, 1) * 65535.0 + 0.5).astype(np.uint16)
    exp = exp.transpose(1, 2, 0)

    encode_image(img, tmp_path / "x.png")
    head = (tmp_path / "x.png").read_bytes()
    assert head[24] == 16 and head[25] == 2  # IHDR: bit depth 16, RGB
    back = cv2.imread(str(tmp_path / "x.png"), cv2.IMREAD_UNCHANGED)[..., ::-1]
    assert back.dtype == np.uint16 and (back == exp).all()

    encode_image(img, tmp_path / "x.tif")
    back = cv2.imread(str(tmp_path / "x.tif"), cv2.IMREAD_UNCHANGED)[..., ::-1]
    assert back.dtype == np.uint16 and (back == exp).all()

    u8 = (img * 255).astype(np.uint8)
    encode_image(u8, tmp_path / "u.png")
    assert (tmp_path / "u.png").read_bytes()[24] == 8
    encode_image(u8, tmp_path / "u.tif")
    back = cv2.imread(str(tmp_path / "u.tif"), cv2.IMREAD_UNCHANGED)[..., ::-1]
    assert back.dtype == np.uint16
    assert (back == u8.transpose(1, 2, 0).astype(np.uint16) * 257).all()


def test_load_ldr_reads_16bit_at_full_depth(tmp_path):
    """16-bit PNG/TIFF inputs decode at full depth (the reference's image
    crate decodes Rgb16; PIL's convert('RGB') would truncate to 8 bits)."""
    import cv2

    from rapidraw_tpu.io.encode import write_tiff16
    from rapidraw_tpu.io.loader import load_ldr

    # values that straddle u8 quantization steps: 300/65535 is ~1.17 u8 LSB
    a = np.full((4, 4, 3), 300, np.uint16)
    a[0, 0] = (100, 200, 300)
    write_tiff16(tmp_path / "d.tif", a)
    got = np.asarray(load_ldr(tmp_path / "d.tif"))
    exp = a.astype(np.float32).transpose(2, 0, 1) / 65535.0
    assert np.allclose(got, exp, atol=1e-7)  # would be 0 after a u8 round

    cv2.imwrite(str(tmp_path / "d.png"), a[..., ::-1])
    got = np.asarray(load_ldr(tmp_path / "d.png"))
    assert np.allclose(got, exp, atol=1e-7)

    # 8-bit files keep the u8 path
    from PIL import Image
    Image.fromarray(np.full((4, 4, 3), 128, np.uint8)).save(tmp_path / "s.png")
    got8 = np.asarray(load_ldr(tmp_path / "s.png"))
    assert np.allclose(got8, 128 / 255.0)


def test_export_pipeline_png_16bit(tmp_path):
    """PNG export rides the device-u16 readback end to end."""
    from rapidraw_tpu.pipeline.export import ExportSettings, export_images

    p = _make_jpeg(tmp_path / "a.jpg", h=32, w=48)
    res = export_images([str(p)], tmp_path / "out", ExportSettings(format="png"))
    assert res[0].ok
    data = Path(res[0].output).read_bytes()
    assert data[24] == 16 and data[25] == 2


def test_settings_from_preset_resize_mode():
    from rapidraw_tpu.pipeline.export import settings_from_preset

    s = settings_from_preset({
        "file_format": "jpeg", "jpeg_quality": 80,
        "enable_resize": True, "resize_mode": "width", "resize_value": 2048,
        "dont_enlarge": False,
    })
    assert s.resize_mode == "width" and s.long_edge == 2048 and not s.dont_enlarge
    # explicit nulls fall back to the frontend defaults (longEdge, True)
    s2 = settings_from_preset({
        "file_format": "jpeg", "enable_resize": True, "resize_value": 100,
        "resize_mode": None, "dont_enlarge": None,
    })
    assert s2.resize_mode == "longEdge" and s2.dont_enlarge


def test_cli_auto_and_histogram(tmp_path, capsys):
    src = _make_jpeg(tmp_path / "in.jpg")
    assert main(["auto", str(src)]) == 0
    out = json.loads(capsys.readouterr().out)
    assert "exposure" in out
    assert main(["histogram", str(src)]) == 0
    h = json.loads(capsys.readouterr().out)
    assert len(h["luma"]) == 256


def test_filename_template_variables(tmp_path):
    import datetime

    from rapidraw_tpu.pipeline.export import generate_filename_from_template

    d = datetime.datetime(2026, 3, 7, 14, 5)
    out = generate_filename_from_template(
        "{YYYY}-{MM}-{DD}_{hh}{mm}_{original_filename}_{sequence}",
        "/x/IMG_0042.jpg", 3, 120, d,
    )
    assert out == "2026-03-07_1405_IMG_0042_003"
    # alias + width-1 padding
    assert generate_filename_from_template("{filename}-{sequence}", "a.png", 2, 9, d) == "a-2"


def test_export_preserve_folders_and_timestamps(tmp_path):
    import os

    from rapidraw_tpu.io.sidecar import save_sidecar
    from rapidraw_tpu.pipeline.export import ExportSettings, export_images

    sub = tmp_path / "shoot" / "day1"
    sub.mkdir(parents=True)
    p = _make_jpeg(sub / "pic.jpg")
    save_sidecar(p, {"adjustments": {"exposure": 0.3}})
    old = 946684800.0  # 2000-01-01
    os.utime(p, (old, old))

    out_dir = tmp_path / "out"
    results = export_images(
        [str(p)], out_dir,
        ExportSettings(
            preserve_folders=True, base_origin_folders=(str(tmp_path / "shoot"),),
            preserve_timestamps=True, copy_exif=False,
        ),
    )
    assert results[0].ok, results[0].error
    dst = results[0].output
    assert dst.endswith(str(out_dir / "day1" / "pic_edited.jpg"))
    # mtime restored from the source capture date (fs mtime fallback)
    assert abs(os.path.getmtime(dst) - old) < 2.0


def test_export_virtual_copies(tmp_path):
    from rapidraw_tpu.io.sidecar import save_sidecar
    from rapidraw_tpu.pipeline.export import ExportSettings, export_images

    p = _make_jpeg(tmp_path / "vc.jpg")
    save_sidecar(p, {"adjustments": {"exposure": 0.2}})
    save_sidecar(f"{p}?vc=1", {"adjustments": {"exposure": -0.5}})
    results = export_images(
        [str(p), f"{p}?vc=1"], tmp_path / "out", ExportSettings(copy_exif=False)
    )
    assert all(r.ok for r in results), [r.error for r in results]
    names = sorted(Path(r.output).name for r in results)
    assert names == ["vc_edited.jpg", "vc_edited_VC01.jpg"]


def test_export_masks_emits_image_and_alpha(tmp_path):
    from rapidraw_tpu.io.sidecar import save_sidecar
    from rapidraw_tpu.pipeline.export import ExportSettings, export_images

    p = _make_jpeg(tmp_path / "m.jpg")
    save_sidecar(p, {"adjustments": {
        "exposure": 0.2,
        "masks": [{
            "name": "m0", "visible": True,
            "adjustments": {"exposure": 1.0},
            "subMasks": [{"type": "radial", "visible": True, "mode": "additive",
                          "parameters": {"centerX": 32, "centerY": 24, "radiusX": 20,
                                         "radiusY": 15, "rotation": 0.0, "feather": 0.5}}],
        }],
    }})
    out_dir = tmp_path / "out"
    results = export_images(
        [str(p)], out_dir, ExportSettings(copy_exif=False, export_masks=True)
    )
    assert results[0].ok, results[0].error
    assert (out_dir / "m_edited_mask_0_image.jpg").exists()
    alpha = out_dir / "m_edited_mask_0_alpha.png"
    assert alpha.exists()
    a = np.asarray(Image.open(alpha))
    assert a.shape == (48, 64)
    assert a.max() > 200 and a.min() < 50  # radial mask has on+off regions


def test_estimate_export_sizes(tmp_path):
    from rapidraw_tpu.io.sidecar import save_sidecar
    from rapidraw_tpu.pipeline.export import ExportSettings, estimate_export_sizes

    p = _make_jpeg(tmp_path / "e.jpg", h=64, w=96)
    save_sidecar(p, {"adjustments": {"exposure": 0.3}})
    est = estimate_export_sizes([str(p)] * 3, ExportSettings(quality=90))
    assert est > 0
    # should be ~3x a single-image estimate
    single = estimate_export_sizes([str(p)], ExportSettings(quality=90))
    assert abs(est - 3 * single) < single * 0.01
    assert estimate_export_sizes([str(p)], ExportSettings(format="cube")) == 1_050_000


def test_settings_from_preset():
    from rapidraw_tpu.pipeline.export import settings_from_preset

    s = settings_from_preset({
        "name": "web", "file_format": "JPEG", "jpeg_quality": 80,
        "enable_resize": True, "resize_mode": "longEdge", "resize_value": 2048,
        "keep_metadata": False, "strip_gps": True,
        "filename_template": "{original_filename}_web",
        "enable_watermark": False, "export_masks": True,
    })
    assert s.format == "jpeg" and s.quality == 80 and s.long_edge == 2048
    assert not s.copy_exif and s.export_masks
    assert s.filename_template == "{original_filename}_web"


def test_render_chunk_sharded_matches_single_device():
    """The mesh-sharded chunk renderer (batch padded to a mesh multiple)
    must produce exactly what the plain jitted path produces."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rapidraw_tpu.params.parse import parse_adjustments
    from rapidraw_tpu.pipeline.batch import stack_params
    from rapidraw_tpu.pipeline.export import (
        _device_u8,
        _jitted_develop,
        _render_chunk,
    )

    assert jax.device_count() == 8  # conftest virtual mesh
    doc = {"exposure": 0.4, "contrast": 15, "saturation": 10}
    parsed = [parse_adjustments(doc, is_raw=False) for _ in range(3)]
    params, cfg = stack_params([p for p, _ in parsed], [c for _, c in parsed])
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.random((3, 3, 24, 128), dtype=np.float32))

    sharded = _render_chunk(imgs, params, None, None, cfg)  # pads 3 -> 8
    # the chunk renderer quantizes to u8 on device before readback
    plain = np.asarray(_device_u8(_jitted_develop(cfg)(imgs, params, None, None)))
    assert sharded.shape == (3, 3, 24, 128)
    assert sharded.dtype == np.uint8
    # u8 quantization may flip on <=1 ulp float differences between the
    # sharded and plain paths: allow off-by-one
    assert np.abs(sharded.astype(int) - plain.astype(int)).max() <= 1


def test_export_colliding_names_uniquified(tmp_path):
    """Two sources templating to the same output name must both survive
    (previously the encode threads overwrote one file and reported two
    successes)."""
    import numpy as np
    from PIL import Image

    from rapidraw_tpu.pipeline.export import ExportSettings, export_images

    rng = np.random.default_rng(3)
    (tmp_path / "2023").mkdir()
    (tmp_path / "2024").mkdir()
    paths = []
    for sub in ("2023", "2024"):
        p = tmp_path / sub / "IMG_0001.jpg"
        Image.fromarray((rng.random((24, 32, 3)) * 255).astype(np.uint8)).save(p)
        paths.append(str(p))
    out = tmp_path / "out"
    results = export_images(paths, out, ExportSettings(batch_size=2))
    assert all(r.ok for r in results)
    outs = {r.output for r in results}
    assert len(outs) == 2, outs
    for o in outs:
        assert Path(o).exists()


def test_settings_from_preset_null_metadata_keys():
    """Frontend presets carry explicit nulls for unset keys; null must
    read as the default (keep metadata, strip GPS) — not as False, which
    would silently export GPS coordinates."""
    from rapidraw_tpu.pipeline.export import settings_from_preset

    s = settings_from_preset({
        "file_format": "jpeg", "keep_metadata": None, "strip_gps": None,
    })
    assert s.copy_exif is True
    assert s.strip_gps is True
    s2 = settings_from_preset({"keep_metadata": False, "strip_gps": False})
    assert s2.copy_exif is False and s2.strip_gps is False


def test_settings_from_preset_null_watermark_fields():
    """Frontend presets carry explicit nulls for unset keys; the watermark
    numeric fields used to crash on float(None)."""
    from rapidraw_tpu.pipeline.export import settings_from_preset

    s = settings_from_preset({
        "enable_watermark": True, "watermark_path": "/x.png",
        "watermark_scale": None, "watermark_spacing": None,
        "watermark_opacity": None, "watermark_anchor": None,
    })
    assert s.watermark is not None
    assert s.watermark.scale == 15 and s.watermark.spacing == 2
    assert s.watermark.opacity == 100 and s.watermark.anchor == "bottomRight"


def test_sequence_numbers_follow_input_order(tmp_path):
    """{sequence} follows the INPUT list (file_management.rs:3264-3292),
    not bucket flush order — alternating shapes used to interleave the
    numbering by render order."""
    import json as _json

    from rapidraw_tpu.pipeline.export import ExportSettings, export_images

    paths = []
    for i in range(4):
        # alternate aspect so consecutive inputs land in DIFFERENT buckets
        h, w = (32, 48) if i % 2 == 0 else (48, 32)
        p = tmp_path / f"in{i}.jpg"
        _make_jpeg(p, h=h, w=w, seed=i)
        (tmp_path / f"in{i}.jpg.rrdata").write_text(
            _json.dumps({"version": 1, "adjustments": {"exposure": 0.1}})
        )
        paths.append(str(p))

    out_dir = tmp_path / "out"
    results = export_images(
        paths, out_dir,
        ExportSettings(batch_size=2,
                       filename_template="{original_filename}_s{sequence}"),
    )
    assert all(r.ok for r in results)
    for i in range(4):
        assert (out_dir / f"in{i}_s{i + 1}.jpg").exists(), sorted(
            q.name for q in out_dir.iterdir()
        )


def test_cli_develop_honors_app_settings(tmp_path, monkeypatch):
    """`develop` threads AppSettings (tonemapper override) exactly like
    `export` does — the two verbs must agree on the same file."""
    import os

    data_dir = tmp_path / "_appdata"
    data_dir.mkdir(parents=True, exist_ok=True)
    monkeypatch.setenv("RAPIDRAW_DATA_DIR", str(data_dir))
    src = _make_jpeg(tmp_path / "in.jpg")
    adj = tmp_path / "adj.json"
    adj.write_text(json.dumps({"exposure": 0.8, "contrast": 30}))

    out_default = tmp_path / "d.jpg"
    assert main(["develop", str(src), "-a", str(adj), "-o", str(out_default)]) == 0

    (data_dir / "settings.json").write_text(json.dumps(
        {"tonemapperOverrideEnabled": True, "defaultNonRawTonemapper": "agx"}
    ))
    out_agx = tmp_path / "a.jpg"
    assert main(["develop", str(src), "-a", str(adj), "-o", str(out_agx)]) == 0
    a = np.asarray(Image.open(out_default), dtype=np.int16)
    b = np.asarray(Image.open(out_agx), dtype=np.int16)
    assert np.abs(a - b).max() > 2, "tonemapper override had no effect"


def test_cli_accepts_virtual_copy_paths(tmp_path):
    """'img.jpg?vc=N' is a first-class CLI argument (the reference exports
    virtual copies, export_processing.rs:699-718); _require_file used to
    reject it as a missing file."""
    import os

    from rapidraw_tpu.io.sidecar import save_sidecar
    from rapidraw_tpu.library.catalog import create_virtual_copy

    src = _make_jpeg(tmp_path / "in.jpg")
    vc = create_virtual_copy(src)
    assert vc.endswith("?vc=1")
    save_sidecar(vc, {"adjustments": {"exposure": 1.0}})

    out_dir = tmp_path / "out"
    assert main(["export", vc, "-o", str(out_dir)]) == 0
    [out] = list(out_dir.iterdir())
    assert "VC01" in out.name

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        assert main(["develop", vc]) == 0
    finally:
        os.chdir(cwd)
    assert (tmp_path / "in_vc1_edited.jpg").exists()


def test_cli_exif_set_visible_in_read(tmp_path):
    """`exif --set` persists to the sidecar (file_management.rs:235-277);
    the read-back must show the EFFECTIVE tags (sidecar-first — what
    exports write through), not just the file bytes."""
    import io
    from contextlib import redirect_stdout

    src = _make_jpeg(tmp_path / "e.jpg")
    buf = io.StringIO()
    with redirect_stdout(buf):
        assert main(["exif", str(src), "--set", "Artist=Tester",
                     "Make=CamCo"]) == 0
    tags = json.loads(buf.getvalue())[str(src)]
    assert tags["Artist"] == "Tester" and tags["Make"] == "CamCo"

    buf = io.StringIO()
    with redirect_stdout(buf):
        assert main(["exif", str(src), "--set", "Make="]) == 0
    tags = json.loads(buf.getvalue())[str(src)]
    assert "Make" not in tags and tags["Artist"] == "Tester"


def test_settings_from_preset_explicit_zero_watermark_fields():
    """0 is a meaningful watermark value (spacing 0 = flush corner,
    opacity 0 = transparent) — only None may fall back to defaults."""
    from rapidraw_tpu.pipeline.export import settings_from_preset

    s = settings_from_preset({
        "enable_watermark": True, "watermark_path": "/x.png",
        "watermark_scale": 30, "watermark_spacing": 0,
        "watermark_opacity": 0,
    })
    assert s.watermark.scale == 30
    assert s.watermark.spacing == 0
    assert s.watermark.opacity == 0


def test_cli_develop_strips_clipping_overlay(tmp_path):
    """The clipping overlay is an editor aid: a doc carrying
    showClipping=true must NOT bake red/blue overlays into the developed
    file (export_processing.rs:250 forces show_clipping=0)."""
    src = _make_jpeg(tmp_path / "in.jpg")
    adj = tmp_path / "adj.json"
    # exposure 3 clips plenty of highlights — the overlay would paint red
    adj.write_text(json.dumps({"exposure": 3.0, "showClipping": True}))
    out_a = tmp_path / "clip.png"
    out_b = tmp_path / "noclip.png"
    assert main(["develop", str(src), "-a", str(adj), "-o", str(out_a)]) == 0
    adj.write_text(json.dumps({"exposure": 3.0}))
    assert main(["develop", str(src), "-a", str(adj), "-o", str(out_b)]) == 0
    a = np.asarray(Image.open(out_a))
    b = np.asarray(Image.open(out_b))
    np.testing.assert_array_equal(a, b)
