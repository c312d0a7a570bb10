"""Interactive preview latency through RenderService on the real TPU.

The reference is latency-oriented (one slider change -> process_preview_job
-> JPEG reply, lib.rs:330-614). This measures the same interaction on the
TPU service: a 24MP source edited at editor_preview_resolution=1920, timing
(a) the FIRST render after an image load (transform + downscale + compile-
cached develop) and (b) steady-state slider changes (param-only changes on
the cached transformed preview — the reference's hot interactive loop),
including mozjpeg-equivalent JPEG encode of the reply.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u tools/prof_preview_latency.py
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import numpy as np

H, W = 4096, 6144


def main():
    from PIL import Image

    from rapidraw_tpu.cli import _enable_persistent_jit_cache
    from rapidraw_tpu.pipeline.service import RenderService

    _enable_persistent_jit_cache()
    rng = np.random.default_rng(0)
    src = (np.clip(rng.normal(0.45, 0.2, (H, W, 3)), 0, 1) * 255).astype(np.uint8)
    path = "/dev/shm/rr_preview_src.png" if _os.path.isdir("/dev/shm") \
        else "/tmp/rr_preview_src.png"
    Image.fromarray(src).save(path)

    svc = RenderService()
    doc = {"exposure": 0.3, "contrast": 22, "saturation": 15,
           "vignetteAmount": -35, "toneMapper": "agx"}

    t0 = time.perf_counter()
    r = svc.render_preview(path, doc, interactive=True)
    first_ms = (time.perf_counter() - t0) * 1e3
    print(f"first interactive render (load+transform+compile+develop+jpeg): "
          f"{first_ms:.0f} ms, reply {len(r.to_binary())} B", flush=True)

    # steady state: slider nudges over the cached transformed preview
    lat = []
    for i in range(12):
        doc2 = dict(doc, exposure=0.3 + 0.01 * i)
        t0 = time.perf_counter()
        r = svc.render_preview(path, doc2, interactive=True)
        lat.append((time.perf_counter() - t0) * 1e3)
    lat = np.array(lat[2:])  # drop residual warm-up
    print(f"steady-state slider latency: median {np.median(lat):.1f} ms "
          f"p90 {np.percentile(lat, 90):.1f} ms min {lat.min():.1f} ms "
          f"({1e3 / np.median(lat):.1f} fps)", flush=True)

    # non-interactive (full preview res, analytics-quality) steady state
    lat = []
    for i in range(6):
        doc2 = dict(doc, contrast=22 + i)
        t0 = time.perf_counter()
        r = svc.render_preview(path, doc2, interactive=False)
        lat.append((time.perf_counter() - t0) * 1e3)
    lat = np.array(lat[1:])
    print(f"full-quality preview latency: median {np.median(lat):.1f} ms",
          flush=True)

    # ROI interactive loop (round 5, VERDICT r4 #6): the reference's
    # pan/zoom path renders ROIs (gpu_processing.rs:17-22, lib.rs:448-457);
    # the service slices the ROI BEFORE develop and quantizes/downloads
    # only ROI-sized bytes. Half-frame ROI of the 1920 preview.
    lat = []
    for i in range(12):
        doc2 = dict(doc, exposure=0.3 + 0.01 * i)
        t0 = time.perf_counter()
        r = svc.render_preview(
            path, doc2, interactive=True, roi=(0.25, 0.25, 0.5, 0.5)
        )
        lat.append((time.perf_counter() - t0) * 1e3)
    assert r.roi is not None and r.width <= 1024
    lat = np.array(lat[2:])
    print(f"ROI slider latency ({r.width}x{r.height} of the 1920 preview): "
          f"median {np.median(lat):.1f} ms p90 {np.percentile(lat, 90):.1f} ms "
          f"({1e3 / np.median(lat):.1f} fps)", flush=True)


if __name__ == "__main__":
    main()
