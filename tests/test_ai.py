"""AI subsystem tests: tagging, model registry degradation."""

import numpy as np
import pytest

from rapidraw_tpu.ai.models import MODELS, ModelUnavailable, model_path
from rapidraw_tpu.ai.tagging import extract_color_tags, preprocess_clip_image, softmax


def test_color_tags_dominant():
    img = np.zeros((3, 60, 60), np.float32)
    img[0] = 0.9  # bright red everywhere
    assert extract_color_tags(img) == ["red"]

    img2 = np.zeros((3, 60, 60), np.float32)
    img2[2, :, :30] = 0.9  # half blue
    img2[1, :, 30:] = 0.8  # half green
    tags = extract_color_tags(img2)
    assert set(tags) == {"blue", "green"}

    gray = np.full((3, 60, 60), 0.5, np.float32)
    assert extract_color_tags(gray) == ["gray"]


def test_clip_preprocess_shape_and_norm():
    rng = np.random.default_rng(0)
    img = rng.random((3, 100, 160), dtype=np.float32)
    x = preprocess_clip_image(img)
    assert x.shape == (1, 3, 224, 224)
    # normalized values center near 0
    assert abs(float(x.mean())) < 2.0

    s = softmax(np.array([[1.0, 2.0, 3.0]]))
    np.testing.assert_allclose(s.sum(), 1.0, atol=1e-6)


def test_model_registry_degrades_clearly(tmp_path, monkeypatch):
    monkeypatch.setenv("RAPIDRAW_MODELS_DIR", str(tmp_path))
    with pytest.raises(ModelUnavailable) as ei:
        model_path("sam_encoder")
    assert "no network egress" in str(ei.value)
    assert "sam_vit_b_encoder.onnx" in str(ei.value)
    # all registry entries resolvable by key
    for key in MODELS:
        with pytest.raises(ModelUnavailable):
            model_path(key)


def test_tags_on_sidecars(tmp_path):
    from PIL import Image

    from rapidraw_tpu.library.catalog import add_tags, clear_tags, get_tags, remove_tags

    p = tmp_path / "a.jpg"
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(p)
    assert add_tags(p, ["sky", "blue"]) == ["sky", "blue"]
    assert add_tags(p, ["sky"]) == ["sky", "blue"]  # dedup
    assert remove_tags(p, ["sky"]) == ["blue"]
    clear_tags(p)
    assert get_tags(p) == []
