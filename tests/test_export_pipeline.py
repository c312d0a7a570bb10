"""Pipelined batch-export host side: bounded prepare window, RAM budget,
parallel encode — export_processing.rs:661-738's RAM-bounded fan-out.

The key invariant: the number of live prepared-but-unencoded images never
exceeds prepare_window() + one render chunk — the whole job is NOT
materialized in RAM (the round-2 implementation held every full-res f32
frame at once: 100 x 24MP = ~28 GB).
"""

from __future__ import annotations

import json

import numpy as np
import pytest
from PIL import Image

from rapidraw_tpu.pipeline import export as export_mod
from rapidraw_tpu.pipeline.export import (
    ExportSettings,
    export_images,
    host_worker_budget,
    prepare_window,
)


def _make_sources(tmp_path, n, w=96, h=64, doc=None):
    rng = np.random.default_rng(0)
    paths = []
    for i in range(n):
        p = tmp_path / f"img_{i:03d}.jpg"
        arr = (rng.random((h, w, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(p, quality=95)
        sidecar = p.with_suffix(".jpg.rrdata")
        meta = {"version": 1, "adjustments": doc or {"exposure": 0.4}}
        sidecar.write_text(json.dumps(meta))
        paths.append(str(p))
    return paths


def test_budgets_match_reference_formula():
    import os

    n = host_worker_budget()
    assert 1 <= n <= min(os.cpu_count() or 1, 16)
    w = prepare_window(batch_size=4, n_workers=n)
    assert 2 <= w <= 16


def test_pipelined_export_bounded_and_complete(tmp_path):
    paths = _make_sources(tmp_path, 11)
    out = tmp_path / "out"
    st = ExportSettings(batch_size=3)
    results = export_images(paths, out, st)
    assert len(results) == 11
    assert all(r.ok for r in results), [r.error for r in results]
    # results come back in input order
    assert [r.source for r in results] == paths
    outs = sorted(out.glob("*.jpg"))
    assert len(outs) == 11
    # RAM-bound invariant: live prepared frames never exceeded the window
    # plus one in-flight render chunk plus the bounded encode queue
    window = prepare_window(st.batch_size, host_worker_budget())
    n_enc = max(1, min(host_worker_budget(), 8))
    bound = window + window + st.batch_size + 2 * n_enc
    assert export_mod._peak_prepared <= bound, (export_mod._peak_prepared, bound)
    assert export_mod._live_prepared == 0


def test_pipelined_export_output_matches_serial_reference(tmp_path):
    """The pipelined path must produce byte-identical frames to a direct
    single-image develop through the same code path."""
    doc = {"exposure": 0.5, "contrast": 15, "toneMapper": "agx"}
    paths = _make_sources(tmp_path, 3, doc=doc)
    out = tmp_path / "out"
    results = export_images(paths, out, ExportSettings(batch_size=2))
    assert all(r.ok for r in results)

    import jax.numpy as jnp

    from rapidraw_tpu.io.loader import load_image
    from rapidraw_tpu.params.parse import parse_adjustments
    from rapidraw_tpu.pipeline.batch import stack_params
    from rapidraw_tpu.pipeline.export import _render_chunk

    img, _ = load_image(paths[0])
    p, cfg = parse_adjustments(dict(doc, showClipping=False), is_raw=False)
    sp, scfg = stack_params([p], [cfg])
    # same device entry the export render loop uses (on a multi-device host
    # that is the mesh-sharded path — the plain jit path differs by ~1 ulp)
    ref = _render_chunk(jnp.asarray(img)[None], sp, None, None, scfg)[0]
    got = np.asarray(Image.open(results[0].output))
    # JPEG round-trip: compare against the reference after the same encode
    from rapidraw_tpu.io.encode import encode_image

    ref_path = out / "ref.jpg"
    encode_image(ref, ref_path, "jpeg", 90)
    ref_rt = np.asarray(Image.open(ref_path))
    np.testing.assert_array_equal(got, ref_rt)


def test_pipelined_export_error_isolation(tmp_path):
    paths = _make_sources(tmp_path, 4)
    bad = tmp_path / "broken.jpg"
    bad.write_bytes(b"not an image at all")
    all_paths = paths[:2] + [str(bad)] + paths[2:]
    out = tmp_path / "out"
    results = export_images(all_paths, out, ExportSettings(batch_size=2))
    assert len(results) == 5
    by_src = {r.source: r for r in results}
    assert not by_src[str(bad)].ok
    assert "prepare failed" in by_src[str(bad)].error
    assert sum(r.ok for r in results) == 4


def test_pipelined_export_cancellation(tmp_path):
    from rapidraw_tpu.utils.recovery import CancellationToken

    paths = _make_sources(tmp_path, 6)
    out = tmp_path / "out"
    token = CancellationToken()
    calls = {"n": 0}

    def progress(i, total, p):
        calls["n"] += 1
        if calls["n"] == 2:
            token.cancel()

    results = export_images(paths, out, ExportSettings(batch_size=2),
                            progress=progress, cancel=token)
    assert len(results) == 6
    assert any(not r.ok and r.error == "cancelled" for r in results)


def test_mixed_docs_bucket_and_merge(tmp_path):
    """Different slider values share a bucket (one compile); a shape change
    forces a second bucket — both still export correctly."""
    rng = np.random.default_rng(1)
    paths = []
    for i, (w, h, doc) in enumerate([
        (96, 64, {"exposure": 0.3}),
        (96, 64, {"contrast": 30, "saturation": 12}),
        (64, 96, {"exposure": -0.2}),
    ]):
        p = tmp_path / f"m_{i}.jpg"
        arr = (rng.random((h, w, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(p)
        p.with_suffix(".jpg.rrdata").write_text(
            json.dumps({"version": 1, "adjustments": doc})
        )
        paths.append(str(p))
    out = tmp_path / "out"
    results = export_images(paths, out, ExportSettings(batch_size=4))
    assert all(r.ok for r in results), [r.error for r in results]
    assert len(list(out.glob("*.jpg"))) == 3


def test_encode_avif_lossy_and_lossless(tmp_path):
    """AVIF export (export_processing.rs:388-469): lossy honors quality,
    q>=100 selects the lossless variant; unsupported builds raise an
    actionable ValueError instead of writing nothing."""
    from rapidraw_tpu.io.encode import encode_image

    rng = np.random.default_rng(5)
    img = rng.random((3, 40, 48), dtype=np.float32)
    try:
        encode_image(img, tmp_path / "a.avif", "avif", 60)
        encode_image(img, tmp_path / "b.avif", "avif", 100)
    except ValueError as e:
        assert "not supported by this PIL build" in str(e)
        return
    from PIL import Image

    lossy = Image.open(tmp_path / "a.avif")
    assert lossy.size == (48, 40)
    assert (tmp_path / "b.avif").stat().st_size > (tmp_path / "a.avif").stat().st_size
