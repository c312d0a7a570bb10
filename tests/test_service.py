"""RenderService preview tests."""

import io

import numpy as np
from PIL import Image

from rapidraw_tpu.pipeline.service import RenderService
from rapidraw_tpu.utils.settings import DEFAULTS, AppSettings


def _jpg(path, h=120, w=160):
    arr = (np.random.default_rng(0).random((h, w, 3)) * 255).astype(np.uint8)
    Image.fromarray(arr).save(path, quality=95)
    return str(path)


def test_render_preview_basic(tmp_path):
    p = _jpg(tmp_path / "a.jpg")
    svc = RenderService()
    res = svc.render_preview(p, {"exposure": 1.0}, compute_histogram=True)
    assert res.jpeg[:2] == b"\xff\xd8"
    im = Image.open(io.BytesIO(res.jpeg))
    assert im.size == (160, 120)  # under preview resolution: no downscale
    assert res.full_width == 160 and res.full_height == 120
    assert res.histogram is not None and len(res.histogram["luma"]) == 256
    # cache warm: second render reuses decoded+transformed caches
    res2 = svc.render_preview(p, {"exposure": 1.0})
    assert res2.jpeg


def test_render_preview_downscales_and_interactive(tmp_path):
    p = _jpg(tmp_path / "b.jpg", h=300, w=400)
    s = AppSettings(DEFAULTS)
    s["editorPreviewResolution"] = 200
    s["livePreviewQuality"] = "performance"
    svc = RenderService(s)
    res = svc.render_preview(p, {})
    assert max(res.width, res.height) == 200
    res_i = svc.render_preview(p, {}, interactive=True)
    assert max(res_i.width, res_i.height) == 100  # divisor 2


def test_render_preview_roi_and_masks(tmp_path):
    p = _jpg(tmp_path / "c.jpg", h=128, w=128)
    doc = {
        "masks": [
            {"visible": True, "invert": False, "opacity": 100.0,
             "adjustments": {"exposure": 2.0},
             "subMasks": [{"type": "all", "visible": True, "mode": "additive"}]}
        ]
    }
    svc = RenderService()
    res = svc.render_preview(p, doc, roi=(0.25, 0.25, 0.5, 0.5))
    assert res.roi == (32, 32, 64, 64)
    assert res.width == 64 and res.height == 64


def test_service_tonemapper_override(tmp_path):
    p = _jpg(tmp_path / "d.jpg")
    s = AppSettings(DEFAULTS)
    s["tonemapperOverrideEnabled"] = True
    s["defaultNonRawTonemapper"] = "agx"
    svc = RenderService(s)
    res = svc.render_preview(p, {})
    assert res.jpeg  # agx path compiles and runs


def test_uncropped_preview_ignores_crop(tmp_path):
    p = _jpg(tmp_path / "u.jpg")
    svc = RenderService()
    adj = {"exposure": 0.5, "crop": {"x": 20, "y": 10, "width": 80, "height": 60}}
    # normal preview honors the crop; uncropped ignores it
    res = svc.render_preview(p, adj)
    assert Image.open(io.BytesIO(res.jpeg)).size == (80, 60)
    jpeg = svc.render_uncropped_preview(p, adj)
    assert Image.open(io.BytesIO(jpeg)).size == (160, 120)


def test_original_preview_skips_grade(tmp_path):
    p = _jpg(tmp_path / "o.jpg")
    svc = RenderService()
    # huge exposure: graded preview differs, original preview does not
    jpeg = svc.render_original_preview(p, {"exposure": 5.0})
    orig = np.asarray(Image.open(p), np.float32)
    got = np.asarray(Image.open(io.BytesIO(jpeg)), np.float32)
    assert got.shape == orig.shape
    assert abs(got.mean() - orig.mean()) < 8.0  # jpeg noise only, no grade


def test_geometry_preview_and_guides(tmp_path):
    from rapidraw_tpu.geometry.params import GeometryParams

    p = _jpg(tmp_path / "g.jpg")
    svc = RenderService()
    gp = GeometryParams(rotate=2.0)
    jpeg = svc.preview_geometry_transform(p, gp, {"exposure": 0.2})
    assert jpeg[:2] == b"\xff\xd8"
    # cached base reused on second call
    jpeg2 = svc.preview_geometry_transform(p, gp, {"exposure": 0.2}, show_lines=True)
    assert jpeg2[:2] == b"\xff\xd8"
    assert len(svc._geometry_base) == 1


def test_preset_preview_small(tmp_path):
    p = _jpg(tmp_path / "pp.jpg", h=600, w=800)
    svc = RenderService()
    jpeg = svc.render_preset_preview(p, {"contrast": 40})
    im = Image.open(io.BytesIO(jpeg))
    assert max(im.size) == 400


def test_preview_binary_protocol(tmp_path):
    import struct

    p = _jpg(tmp_path / "b.jpg")
    svc = RenderService()
    res = svc.render_preview(p, {"exposure": 0.3}, roi=(0.25, 0.25, 0.5, 0.5))
    blob = res.to_binary()
    x, y, w, h, fw, fh = struct.unpack("<6I", blob[:24])
    assert (fw, fh) == (160, 120)
    assert blob[24:26] == b"\xff\xd8"
    assert (w, h) == (res.width, res.height)


def test_color_range_mask_resolves_warped_image(tmp_path):
    # left half red, right half blue; a color-range mask on red must light
    # up only the left half — requires the service to resolve the warped
    # image (previously the bitmap came back empty)
    arr = np.zeros((60, 80, 3), np.uint8)
    arr[:, :40] = (220, 30, 30)
    arr[:, 40:] = (30, 30, 220)
    p = tmp_path / "cr.jpg"
    Image.fromarray(arr).save(p, quality=98)

    adj = {
        "exposure": 2.0,
        "masks": [{
            "name": "reds", "visible": True,
            "adjustments": {"exposure": 2.0},
            "subMasks": [{"type": "color", "visible": True, "mode": "additive",
                          "parameters": {"targetX": 10, "targetY": 30, "tolerance": 30}}],
        }],
    }
    svc = RenderService()
    warped = svc._warped_for_masks(str(p), adj)
    assert warped is not None and warped.shape == (60, 80, 3)
    masks = svc._masks(str(p), adj, 80, 60, 1.0, (0.0, 0.0), warped_image=warped)
    assert masks is not None
    assert masks[0][:, :35].mean() > 0.8  # red half selected
    assert masks[0][:, 45:].mean() < 0.1  # blue half not


def test_preview_worker_coalesces(tmp_path):
    """Drain-to-latest: jobs submitted while busy replace each other
    (lib.rs:650-683)."""
    import threading
    import time as _time

    import numpy as np
    from PIL import Image

    from rapidraw_tpu.pipeline.service import PreviewWorker, RenderService

    p = tmp_path / "img.jpg"
    rng = np.random.default_rng(0)
    Image.fromarray((rng.random((24, 32, 3)) * 255).astype(np.uint8)).save(p)

    service = RenderService()
    results = []
    done = threading.Event()

    def cb(r):
        results.append(r)
        done.set()

    worker = PreviewWorker(service, cb)
    # first render warms the jit; then burst-submit — intermediate jobs
    # must coalesce away
    worker.submit(str(p), {"exposure": 0.1})
    assert done.wait(120)
    done.clear()
    for i in range(8):
        worker.submit(str(p), {"exposure": 0.1 * i})
    deadline = _time.time() + 120
    while _time.time() < deadline:
        with worker._cond:
            idle = worker._pending is None
        if idle and done.is_set():
            _time.sleep(0.2)
            with worker._cond:
                if worker._pending is None:
                    break
    worker.close()
    assert all(not isinstance(r, Exception) for r in results), results
    # 1 warmup + far fewer than 8 burst renders (coalescing dropped most)
    assert 2 <= len(results) < 9
    assert results[-1].jpeg[:2] == b"\xff\xd8"


def test_analytics_worker(tmp_path):
    import threading

    import numpy as np

    from rapidraw_tpu.pipeline.service import AnalyticsWorker

    got = []
    done = threading.Event()

    def cb(r):
        got.append(r)
        done.set()

    w = AnalyticsWorker(cb)
    img = np.random.default_rng(0).random((3, 32, 48)).astype(np.float32)
    w.submit(img)
    assert done.wait(60)
    w.close()
    assert not isinstance(got[0], Exception)
    assert "histogram" in got[0] and "waveform" in got[0]


def test_mask_cache_keyed_by_image_identity(tmp_path):
    """Same mask defs + dims on two DIFFERENT photos must not share
    bitmaps: color/luminance masks sample the image itself."""
    a = np.zeros((60, 80, 3), np.uint8)
    a[:, :40] = (220, 30, 30)        # red fills the left HALF
    b = np.zeros((60, 80, 3), np.uint8)
    b[:20, :20] = (220, 30, 30)      # red fills only a small corner
    pa, pb = tmp_path / "a.jpg", tmp_path / "b.jpg"
    Image.fromarray(a).save(pa, quality=98)
    Image.fromarray(b).save(pb, quality=98)
    adj = {
        "masks": [{
            "visible": True, "invert": False, "opacity": 100.0,
            "adjustments": {"exposure": 2.0},
            "subMasks": [{"type": "color", "visible": True, "mode": "additive",
                          "parameters": {"targetX": 10, "targetY": 10, "tolerance": 30}}],
        }],
    }
    svc = RenderService()
    wa = svc._warped_for_masks(str(pa), adj)
    ma = svc._masks(str(pa), adj, 80, 60, 1.0, (0.0, 0.0), warped_image=wa)
    wb = svc._warped_for_masks(str(pb), adj)
    mb = svc._masks(str(pb), adj, 80, 60, 1.0, (0.0, 0.0), warped_image=wb)
    assert ma is not mb
    # A selects the whole left half, B only the corner — bitmaps must differ
    diff = np.abs(np.asarray(ma, np.float32) - np.asarray(mb, np.float32))
    assert float(diff.max()) > 0.5


def test_device_u8_matches_host_encode_quantization():
    """The preview paths download device-quantized u8; its formula must be
    bit-identical to the host encode quantization (io/loader.to_uint8_hwc)
    so the JPEG replies are unchanged by the device-side readback."""
    import numpy as np

    from rapidraw_tpu.io.loader import to_uint8_hwc
    from rapidraw_tpu.pipeline.service import _device_u8

    rng = np.random.default_rng(9)
    # include out-of-range and exact-boundary values
    x = np.concatenate([
        rng.random((3, 16, 16)).astype(np.float32),
        np.linspace(-0.2, 1.2, 768, dtype=np.float32).reshape(3, 16, 16),
    ], axis=1)
    via_device = np.asarray(_device_u8(x)).transpose(1, 2, 0)
    via_host = to_uint8_hwc(x)
    np.testing.assert_array_equal(via_device, via_host)
    # u8 passthrough in to_uint8_hwc
    np.testing.assert_array_equal(
        to_uint8_hwc(np.asarray(_device_u8(x))), via_host
    )


def test_geometry_preview_with_masked_document(tmp_path):
    """The geometry/crop base renders without mask gradings: a document
    with a visible mask used to trip develop()'s mask-bitmaps assert and
    crash the whole crop tool."""
    from rapidraw_tpu.geometry.params import GeometryParams

    p = _jpg(tmp_path / "gm.jpg")
    svc = RenderService()
    adj = {
        "exposure": 0.2,
        "masks": [{
            "visible": True, "invert": False, "opacity": 100.0,
            "adjustments": {"exposure": 2.0},
            "subMasks": [{"type": "radial", "visible": True, "mode": "additive",
                          "parameters": {"centerX": 80, "centerY": 60,
                                         "radiusX": 40, "radiusY": 30,
                                         "feather": 0.5}}],
        }],
    }
    jpeg = svc.preview_geometry_transform(p, GeometryParams(rotate=2.0), adj)
    assert jpeg[:2] == b"\xff\xd8"


def test_mask_cache_ignores_grading_changes(tmp_path, monkeypatch):
    """Scrubbing a masked grading slider must HIT the bitmap cache — the
    rasterizer never reads the per-mask \"adjustments\", so keying on them
    re-rasterized every mask per interactive frame."""
    import rapidraw_tpu.masks.rasterize as rast

    p = _jpg(tmp_path / "mc.jpg")
    calls = {"n": 0}
    real = rast.rasterize_masks

    def counting(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    monkeypatch.setattr(rast, "rasterize_masks", counting)

    def doc(exposure):
        return {
            "masks": [{
                "visible": True, "invert": False, "opacity": 100.0,
                "adjustments": {"exposure": exposure},
                "subMasks": [{"type": "radial", "visible": True,
                              "mode": "additive",
                              "parameters": {"centerX": 80, "centerY": 60,
                                             "radiusX": 40, "radiusY": 30,
                                             "feather": 0.5}}],
            }],
        }

    svc = RenderService()
    svc.render_preview(p, doc(0.5))
    assert calls["n"] == 1
    svc.render_preview(p, doc(1.5))   # grading change only
    assert calls["n"] == 1            # cache hit — no re-rasterize
    d2 = doc(1.5)
    d2["masks"][0]["subMasks"][0]["parameters"]["radiusX"] = 70
    svc.render_preview(p, d2)         # geometry change
    assert calls["n"] == 2


def test_lut_cached_across_renders(tmp_path, monkeypatch):
    """The parsed+uploaded 3D LUT is cached by (path, mtime): interactive
    frames must not re-parse the .cube file per render."""
    import rapidraw_tpu.io.lut as lutmod

    cube = tmp_path / "t.cube"
    lines = ["LUT_3D_SIZE 2"]
    for b in (0.0, 1.0):
        for g in (0.0, 1.0):
            for r in (0.0, 1.0):
                lines.append(f"{r:.1f} {g:.1f} {b:.1f}")
    cube.write_text("\n".join(lines))

    calls = {"n": 0}
    real = lutmod.parse_lut_file

    def counting(path):
        calls["n"] += 1
        return real(path)

    monkeypatch.setattr(lutmod, "parse_lut_file", counting)

    p = _jpg(tmp_path / "l.jpg")
    svc = RenderService()
    adj = {"lutPath": str(cube), "lutAmount": 80, "exposure": 0.1}
    svc.render_preview(p, adj)
    svc.render_preview(p, dict(adj, exposure=0.6))
    assert calls["n"] == 1
    cube.write_text("\n".join(lines))  # touch: new mtime invalidates
    import os as _os

    _os.utime(cube, ns=(1, 1))
    svc.render_preview(p, dict(adj, exposure=0.9))
    assert calls["n"] == 2


def test_roi_accepts_struct_spelling(tmp_path):
    """ROI arrives as the reference's 4-array wire format, but the
    Roi-struct field spelling {x, y, width, height} must work too
    (gpu_processing.rs:17-22) instead of crashing with KeyError."""
    import pytest

    p = _jpg(tmp_path / "roi.jpg")
    svc = RenderService()
    adj = {"exposure": 0.3}
    a = svc.render_preview(p, adj, interactive=True, roi=[0.25, 0.25, 0.5, 0.5])
    b = svc.render_preview(
        p, adj, interactive=True,
        roi={"x": 0.25, "y": 0.25, "width": 0.5, "height": 0.5},
    )
    assert a.jpeg == b.jpeg and a.roi == b.roi
    with pytest.raises(ValueError, match="roi dict"):
        svc.render_preview(p, adj, interactive=True, roi={"x": 0.2, "y": 0.2})


def test_workers_survive_raising_callbacks(tmp_path):
    """A raising embedder callback must not kill the worker thread — the
    reference's preview/analytics workers loop forever (lib.rs:650-683)."""
    import time

    from rapidraw_tpu.pipeline.service import AnalyticsWorker, PreviewWorker

    p = _jpg(tmp_path / "wk.jpg")
    svc = RenderService()

    got = []

    def bad_then_good(r):
        got.append(r)
        if len(got) == 1:
            raise RuntimeError("embedder bug")

    pw = PreviewWorker(svc, bad_then_good)
    pw.submit(p, {"exposure": 0.2})
    for _ in range(100):
        if got:
            break
        time.sleep(0.1)
    pw.submit(p, {"exposure": 0.6})
    for _ in range(100):
        if len(got) >= 2:
            break
        time.sleep(0.1)
    pw.close()
    assert len(got) == 2 and all(hasattr(r, "jpeg") for r in got)

    seen = []

    def scope_cb(s):
        seen.append(s)
        raise RuntimeError("embedder bug")

    aw = AnalyticsWorker(scope_cb)
    aw.submit(np.zeros((3, 16, 24), np.float32))
    for _ in range(100):
        if seen:
            break
        time.sleep(0.1)
    aw.submit(np.ones((3, 16, 24), np.float32))
    for _ in range(100):
        if len(seen) >= 2:
            break
        time.sleep(0.1)
    aw.close()
    assert len(seen) == 2 and all("histogram" in s for s in seen)
