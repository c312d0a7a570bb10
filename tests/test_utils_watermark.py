"""Hashing, settings, watermark, LUT-export tests."""

import numpy as np
import jax.numpy as jnp

from rapidraw_tpu.pipeline.watermark import (
    WatermarkSettings,
    apply_watermark,
    export_adjustments_as_lut,
)
from rapidraw_tpu.utils.hashing import (
    LruCache,
    calculate_geometry_hash,
    calculate_transform_hash,
    calculate_visual_hash,
)
from rapidraw_tpu.utils.settings import AppSettings


def test_hash_key_structure():
    base = {"exposure": 1.0, "transformRotate": 2.0, "crop": {"x": 1, "y": 2}}
    # geometry hash ignores grade-only changes
    assert calculate_geometry_hash(base) == calculate_geometry_hash({**base, "exposure": 5.0})
    assert calculate_geometry_hash(base) != calculate_geometry_hash(
        {**base, "transformRotate": 9.0}
    )
    # visual hash ignores geometry/crop, varies with grade and path
    assert calculate_visual_hash("a", base) == calculate_visual_hash(
        "a", {**base, "transformRotate": 9.0, "crop": None}
    )
    assert calculate_visual_hash("a", base) != calculate_visual_hash("b", base)
    assert calculate_visual_hash("a", base) != calculate_visual_hash(
        "a", {**base, "exposure": 2.0}
    )
    # transform hash varies with crop and geometry, ignores grade
    assert calculate_transform_hash(base) != calculate_transform_hash(
        {**base, "crop": {"x": 3, "y": 2}}
    )
    assert calculate_transform_hash(base) == calculate_transform_hash(
        {**base, "exposure": 3.0}
    )


def test_lru_cache():
    c = LruCache(2)
    c.put(1, "a")
    c.put(2, "b")
    assert c.get(1) == "a"
    c.put(3, "c")  # evicts 2 (least recently used)
    assert c.get(2) is None
    assert c.get(1) == "a" and c.get(3) == "c"


def test_settings_defaults_and_overrides(tmp_path):
    p = tmp_path / "settings.json"
    s = AppSettings.load(p)
    assert s.editor_preview_resolution == 1920
    assert s.tonemapper_override(True) is None
    s["tonemapperOverrideEnabled"] = True
    assert s.tonemapper_override(True) == 1  # agx default for raw
    assert s.tonemapper_override(False) == 0
    s["customKey"] = {"x": 1}
    s.save(p)
    s2 = AppSettings.load(p)
    assert s2["customKey"] == {"x": 1}
    assert s2.preview_quality(True)[1] == 88


def test_watermark_anchors(tmp_path):
    from PIL import Image

    wm_path = tmp_path / "wm.png"
    wm = np.zeros((8, 8, 4), np.uint8)
    wm[..., 0] = 255
    wm[..., 3] = 255
    Image.fromarray(wm).save(wm_path)

    base = np.zeros((3, 64, 64), np.float32)
    out = apply_watermark(
        base, WatermarkSettings(str(wm_path), anchor="bottomRight", scale=20, spacing=5, opacity=100)
    )
    # red watermark appears in the bottom-right corner only
    assert out[0, -8:, -8:].max() > 0.9
    assert out[0, :16, :16].max() == 0.0
    out2 = apply_watermark(
        base, WatermarkSettings(str(wm_path), anchor="topLeft", scale=20, spacing=0, opacity=50)
    )
    assert 0.4 < out2[0, :6, :6].max() < 0.6


def test_export_adjustments_as_lut_identity_and_grade():
    cube = export_adjustments_as_lut({}, lut_size=5)
    from rapidraw_tpu.io.lut import parse_cube, identity_lut

    lut = parse_cube(cube)
    np.testing.assert_allclose(lut, identity_lut(5), atol=2e-3)

    cube2 = export_adjustments_as_lut({"exposure": 1.0}, lut_size=5)
    lut2 = parse_cube(cube2)
    assert lut2.mean() > lut.mean() + 0.02  # brighter grade baked in


def test_cancellation_token_stops_export(tmp_path):
    import numpy as np
    from PIL import Image

    from rapidraw_tpu.io.sidecar import save_sidecar
    from rapidraw_tpu.pipeline.export import ExportSettings, export_images
    from rapidraw_tpu.utils.recovery import CancellationToken

    paths = []
    for i in range(3):
        p = tmp_path / f"c{i}.jpg"
        arr = (np.random.default_rng(i).random((32, 48, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(p)
        save_sidecar(p, {"adjustments": {"exposure": 0.2}})
        paths.append(str(p))
    tok = CancellationToken()
    tok.cancel()
    results = export_images(paths, tmp_path / "out", ExportSettings(), cancel=tok)
    assert all(not r.ok and r.error == "cancelled" for r in results)


def test_stage_timer_and_logging(tmp_path):
    from rapidraw_tpu.utils.trace import setup_logging, stage_timer, log_render_fps

    setup_logging("debug", tmp_path / "log.txt")
    with stage_timer("unit") as t:
        pass
    assert t["seconds"] >= 0.0
    for _ in range(10):
        log_render_fps(0.01)
    assert (tmp_path / "log.txt").exists()


def test_guarded_backend_init(tmp_path, monkeypatch):
    from rapidraw_tpu.utils import recovery

    monkeypatch.setenv("RAPIDRAW_CACHE_DIR", str(tmp_path))
    platform = recovery.guarded_backend_init()
    assert platform  # normal path: flag cleaned up
    assert not (tmp_path / "backend_crash_flag").exists()
    # simulate a crash: flag left behind -> CPU fallback signalled
    (tmp_path / "backend_crash_flag").write_text("init")
    platform2 = recovery.guarded_backend_init()
    assert "cpu" in platform2
    assert not (tmp_path / "backend_crash_flag").exists()


def test_lut_export_with_masks_bakes_global_grade():
    """Documents with visible masks must still export their GLOBAL grade as
    a LUT (masks are spatial and meaningless for a LUT; leaving them in
    tripped develop()'s mask-bitmap assert)."""
    from rapidraw_tpu.pipeline.watermark import export_adjustments_as_lut

    adj = {
        "exposure": 0.5,
        "masks": [{
            "name": "m", "visible": True,
            "adjustments": {"exposure": 1.0},
            "subMasks": [{"type": "radial", "visible": True, "mode": "additive",
                          "parameters": {"centerX": 10, "centerY": 10,
                                         "radiusX": 5, "radiusY": 5,
                                         "rotation": 0.0, "feather": 0.5}}],
        }],
    }
    cube = export_adjustments_as_lut(adj, lut_size=8)
    assert "LUT_3D_SIZE 8" in cube
    # the global exposure must be baked: brighter than the identity export
    import numpy as np

    def _vals(text):
        rows = [ln for ln in text.splitlines() if ln and ln[0].isdigit()]
        return np.array([[float(x) for x in r.split()] for r in rows])

    base = export_adjustments_as_lut({}, lut_size=8)
    assert _vals(cube).mean() > _vals(base).mean() + 0.02
