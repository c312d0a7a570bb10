"""CLI + export service end-to-end tests (CPU)."""

import json

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


def test_export_resize_long_edge(tmp_path):
    from rapidraw_tpu.pipeline.export import ExportSettings, export_images

    p = _make_jpeg(tmp_path / "big.jpg", h=64, w=96)
    results = export_images([str(p)], tmp_path / "out", ExportSettings(long_edge=48))
    assert results[0].ok
    assert Image.open(results[0].output).size == (48, 32)


def test_cli_auto_and_histogram(tmp_path, capsys):
    src = _make_jpeg(tmp_path / "in.jpg")
    assert main(["auto", str(src)]) == 0
    out = json.loads(capsys.readouterr().out)
    assert "exposure" in out
    assert main(["histogram", str(src)]) == 0
    h = json.loads(capsys.readouterr().out)
    assert len(h["luma"]) == 256
