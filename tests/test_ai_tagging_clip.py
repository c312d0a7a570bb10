"""CLIP zero-shot tagging on a tiny random-weight checkpoint
(reference: tagging.rs:145-249 + tagging_utils data tables)."""

from __future__ import annotations

import json

import numpy as np
import pytest

import rapidraw_tpu.ai.tagging as tg
from rapidraw_tpu.ai.models import ModelUnavailable
from rapidraw_tpu.ai.tag_data import TAG_CANDIDATES, TAG_HIERARCHY


def _rand_image(h=48, w=64, seed=0):
    return np.random.default_rng(seed).random((3, h, w)).astype(np.float32)


@pytest.fixture
def tiny_clip(tmp_path, monkeypatch):
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from transformers import CLIPConfig, CLIPModel, CLIPTokenizer

    d = tmp_path / "clip"
    d.mkdir()

    # minimal byte-ish BPE vocab the CLIPTokenizer accepts
    words = ["a", "b", "c", "d", "e", "f", "g", "person", "dog", "sunset"]
    vocab = {"<|startoftext|>": 0, "<|endoftext|>": 1}
    for w in words:
        vocab[w + "</w>"] = len(vocab)
        vocab[w] = len(vocab)
    (d / "vocab.json").write_text(json.dumps(vocab))
    (d / "merges.txt").write_text("#version: 0.2\n")
    tok = CLIPTokenizer(str(d / "vocab.json"), str(d / "merges.txt"))
    tok.save_pretrained(d)

    cfg = CLIPConfig.from_text_vision_configs(
        transformers.CLIPTextConfig(
            vocab_size=len(vocab), hidden_size=16, intermediate_size=32,
            num_hidden_layers=2, num_attention_heads=2, max_position_embeddings=16,
        ),
        transformers.CLIPVisionConfig(
            hidden_size=16, intermediate_size=32, num_hidden_layers=2,
            num_attention_heads=2, image_size=32, patch_size=16,
        ),
        projection_dim=8,
    )
    torch.manual_seed(0)
    CLIPModel(cfg).save_pretrained(d)
    monkeypatch.setenv("RAPIDRAW_CLIP", str(d))
    return d


def test_missing_checkpoint_graceful(tmp_path, monkeypatch):
    monkeypatch.setenv("RAPIDRAW_CLIP", str(tmp_path / "nope"))
    with pytest.raises(ModelUnavailable):
        tg.generate_tags_with_clip(_rand_image())


def test_custom_tags_scoring(tiny_clip):
    tags = tg.generate_tags_with_clip(
        _rand_image(), custom_tags=["dog", "person", "sunset"], max_tags=2
    )
    assert len(tags) <= 2
    assert set(tags) <= {"dog", "person", "sunset"}


def test_default_list_adds_colors_and_parents(tiny_clip):
    tags = tg.generate_tags_with_clip(_rand_image(seed=1), max_tags=5)
    assert tags  # something survived the 0.005 threshold or color extraction
    # every returned tag is a candidate, a color, or a hierarchy parent
    colors = {"red", "orange", "yellow", "green", "blue", "purple", "brown",
              "white", "gray", "black"}
    parents = {p for ps in TAG_HIERARCHY.values() for p in ps}
    assert set(tags) <= set(TAG_CANDIDATES) | colors | parents
    # hierarchy closure: any tag with parents has them present
    for t in tags:
        for p in TAG_HIERARCHY.get(t, ()):  # pragma: no branch
            assert p in tags or t not in tags[:5]


def test_tag_data_tables():
    assert len(TAG_CANDIDATES) == 590  # candidates.rs:1
    assert "person" in TAG_CANDIDATES and "sunset" in TAG_CANDIDATES
    assert TAG_HIERARCHY["dog"]  # hierarchy.rs animal block


def test_index_folder_tags(tiny_clip, tmp_path):
    from PIL import Image

    from rapidraw_tpu.library.catalog import add_tags, get_tags

    folder = tmp_path / "photos"
    folder.mkdir()
    rng = np.random.default_rng(0)
    for name in ("a.jpg", "b.jpg"):
        arr = (rng.random((32, 40, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(folder / name)
    # b already has an AI tag -> skipped by the has-AI-tags check
    add_tags(str(folder / "b.jpg"), ["sunset"])

    seen = []
    n = tg.index_folder_tags(str(folder), progress=lambda c, t: seen.append((c, t)))
    assert n == 1
    assert seen[-1] == (2, 2)
    assert get_tags(str(folder / "a.jpg"))  # tags written to sidecar
    assert get_tags(str(folder / "b.jpg")) == ["sunset"]  # untouched
