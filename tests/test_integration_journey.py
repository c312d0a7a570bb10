"""End-to-end user journey: a RAW file (synthetic ORF) + an imported
Lightroom XMP preset, applied through the sidecar and exported via the
CLI — the switch-from-the-reference workflow in one test."""

from __future__ import annotations

import sys

import numpy as np
import pytest

sys.path.insert(0, "tests")


def _make_orf(path, w=64, h=48, seed=3):
    from test_raw_containers import _cfa_ifd, build_tiff

    rng = np.random.default_rng(seed)
    cfa = rng.integers(128, 900, (h, w), dtype=np.uint16)
    data = bytearray(build_tiff([_cfa_ifd(w, h, 12, 1, cfa.astype("<u2").tobytes())]))
    data[2:4] = b"RO"
    path.write_bytes(bytes(data))


_XMP = """<x:xmpmeta xmlns:x="adobe:ns:meta/"><rdf:RDF
 xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#">
<rdf:Description xmlns:crs="http://ns.adobe.com/camera-raw-settings/1.0/"
 crs:Exposure2012="+0.8" crs:Contrast2012="+20" crs:Shadows2012="+20"
 crs:PostCropVignetteAmount="-25">
<crs:Name><rdf:Alt><rdf:li xml:lang="x-default">Journey</rdf:li></rdf:Alt></crs:Name>
</rdf:Description></rdf:RDF></x:xmpmeta>"""


def test_orf_xmp_preset_cli_export(tmp_path):
    from PIL import Image

    from rapidraw_tpu.cli import main
    from rapidraw_tpu.io.sidecar import load_adjustments, save_sidecar
    from rapidraw_tpu.library.presets import PresetStore, apply_preset

    raw = tmp_path / "shot.orf"
    _make_orf(raw)

    # import the Lightroom preset and bake it into the sidecar
    xmp = tmp_path / "journey.xmp"
    xmp.write_text(_XMP)
    store = PresetStore(tmp_path / "presets.json")
    [preset] = store.import_file(xmp)
    doc = apply_preset({}, preset["adjustments"])
    save_sidecar(str(raw), {"adjustments": doc})
    assert load_adjustments(str(raw))["exposure"] == 0.8

    out_dir = tmp_path / "out"
    rc = main(["export", str(raw), "-o", str(out_dir), "--quality", "90"])
    assert rc == 0
    outs = list(out_dir.glob("*.jpg"))
    assert len(outs) == 1
    rendered = np.asarray(Image.open(outs[0]), np.float32) / 255.0
    assert rendered.shape[2] == 3 and np.isfinite(rendered).all()
    # +0.8EV over a dark synthetic CFA renders mid-bright, unclipped
    assert 0.2 < rendered.mean() < 0.9
    # vignette: corners darker than center
    h, w, _ = rendered.shape
    corners = (rendered[:4, :4].mean() + rendered[-4:, -4:].mean()) / 2
    center = rendered[h // 2 - 4 : h // 2 + 4, w // 2 - 4 : w // 2 + 4].mean()
    assert corners < center


def test_export_honors_app_settings_tonemapper(tmp_path):
    """The export must render with the same app-level settings the preview
    honored: a tonemapper override (basic instead of AgX for RAW) must
    change the exported pixels (export_processing.rs:637+ renders through
    the same settings-aware parse as the preview)."""
    from PIL import Image

    from rapidraw_tpu.pipeline.export import ExportSettings, export_images
    from rapidraw_tpu.io.sidecar import save_sidecar
    from rapidraw_tpu.utils.settings import DEFAULTS, AppSettings

    raw = tmp_path / "shot.orf"
    _make_orf(raw)
    save_sidecar(raw, {"adjustments": {"exposure": 0.4}})

    base_settings = AppSettings(dict(DEFAULTS))
    override = AppSettings({
        **DEFAULTS,
        # the doc carries no toneMapper (parse default: basic) — override
        # RAW documents to AgX, which must change the exported pixels
        "tonemapperOverrideEnabled": True,
        "defaultRawTonemapper": "agx",
    })

    out_a = tmp_path / "a"
    out_b = tmp_path / "b"
    ra = export_images([str(raw)], out_a, ExportSettings(format="png"),
                       app_settings=base_settings)
    rb = export_images([str(raw)], out_b, ExportSettings(format="png"),
                       app_settings=override)
    assert ra[0].ok and rb[0].ok, (ra[0].error, rb[0].error)
    a = np.asarray(Image.open(ra[0].output), np.float32)
    b = np.asarray(Image.open(rb[0].output), np.float32)
    assert a.shape == b.shape
    assert np.abs(a - b).max() > 2.0, "tonemapper override must reach export"


def test_cli_develop_matches_export_pixels(tmp_path):
    """`develop` and `export` of the same document must produce identical
    pixels — one user surface, one render semantics (both verbs now thread
    the same AppSettings and share the device-u8 quantization)."""
    from PIL import Image

    from rapidraw_tpu.cli import main
    from rapidraw_tpu.io.sidecar import save_sidecar

    raw = tmp_path / "shot.orf"
    _make_orf(raw)
    save_sidecar(str(raw), {"adjustments": {
        "exposure": 0.5, "contrast": 15, "saturation": 10,
        "vignetteAmount": -20,
        "masks": [{
            "visible": True, "invert": False, "opacity": 100.0,
            "adjustments": {"exposure": -0.6},
            "subMasks": [{"type": "radial", "visible": True,
                          "mode": "additive",
                          "parameters": {"centerX": 30, "centerY": 20,
                                         "radiusX": 18, "radiusY": 12,
                                         "feather": 0.5}}],
        }],
    }})

    dev_out = tmp_path / "dev.png"
    assert main(["develop", str(raw), "-o", str(dev_out)]) == 0
    exp_dir = tmp_path / "exp"
    assert main(["export", str(raw), "-o", str(exp_dir),
                 "--format", "png"]) == 0
    [exp_out] = list(exp_dir.glob("*.png"))
    a = np.asarray(Image.open(dev_out))
    b = np.asarray(Image.open(exp_out))
    np.testing.assert_array_equal(a, b)
