"""SAM ViT-B flax port: encoder/decoder graphs on random weights at a
reduced size, prompt un-transform math, and the ai-subject precompute
wiring (reference: ai_processing.rs:918-1062, ai_commands.rs:200-340)."""

from __future__ import annotations

import numpy as np
import pytest

import rapidraw_tpu.ai.masks as am
import rapidraw_tpu.ai.sam as sam
from rapidraw_tpu.ai.models import ModelUnavailable


@pytest.fixture
def small_sam(tmp_path, monkeypatch):
    """Shrink the architecture (dim 48 / 2 blocks / 64-px input) and save
    random-init weights where the loaders look."""
    monkeypatch.setenv("RAPIDRAW_MODELS", str(tmp_path))
    monkeypatch.setattr(sam, "SAM_INPUT", 64)
    monkeypatch.setattr(sam, "_EMBED", 48)
    monkeypatch.setattr(sam, "_HEADS", 6)
    monkeypatch.setattr(sam, "_LAYERS", 2)
    monkeypatch.setattr(sam, "_GLOBAL", (1,))
    monkeypatch.setattr(sam, "_PROMPT_DIM", 32)
    monkeypatch.setattr(sam, "_jit_cache", {})

    import jax

    SamEncoder, SamDecoder = sam._models()
    g = 64 // sam._PATCH
    enc_vars = SamEncoder().init(
        jax.random.PRNGKey(0), np.zeros((1, 64, 64, 3), np.float32)
    )
    am.save_variables_npz(enc_vars, tmp_path / "sam_vit_b_encoder.npz")
    dec_vars = SamDecoder().init(
        jax.random.PRNGKey(1),
        np.zeros((1, g, g, 32), np.float32),
        np.zeros((1, 2, 2), np.float32),
        np.zeros((1, 2), np.float32),
        np.zeros((1, 4 * g, 4 * g, 1), np.float32),
        np.float32(0.0),
    )
    am.save_variables_npz(dec_vars, tmp_path / "sam_vit_b_decoder.npz")
    return tmp_path


def _rand_image(h=40, w=56, seed=0):
    return np.random.default_rng(seed).random((3, h, w)).astype(np.float32)


def test_embeddings_shape_and_decoder_mask(small_sam):
    img = _rand_image()
    emb = sam.generate_image_embeddings(img)
    assert emb.embeddings.shape == (1, 4, 4, 32)
    assert emb.original_size == (56, 40)

    # point prompt (degenerate drag) and box prompt both produce u8 masks
    m_point = sam.run_sam_decoder(emb, (28.0, 20.0), (28.0, 20.0))
    assert m_point.shape == (40, 56) and m_point.dtype == np.uint8
    assert set(np.unique(m_point)) <= {0, 255}

    m_box = sam.run_sam_decoder(emb, (10.0, 8.0), (45.0, 30.0))
    assert m_box.shape == (40, 56)
    assert set(np.unique(m_box)) <= {0, 255}


def test_missing_weights_graceful(tmp_path, monkeypatch):
    monkeypatch.setenv("RAPIDRAW_MODELS", str(tmp_path))
    monkeypatch.setattr(sam, "_jit_cache", {})
    with pytest.raises(ModelUnavailable) as ei:
        sam.generate_image_embeddings(_rand_image())
    assert "sam_vit_b_encoder.npz" in str(ei.value)


def test_unproject_prompt_rect_identity():
    sp, ep = sam.unproject_prompt_rect((10.0, 20.0), (30.0, 40.0), 100, 80)
    assert sp == (10.0, 20.0) and ep == (30.0, 40.0)


def test_unproject_prompt_rect_transforms():
    # pure horizontal flip: x mirrors, y unchanged
    sp, ep = sam.unproject_prompt_rect(
        (10.0, 20.0), (30.0, 40.0), 100, 80, flip_horizontal=True
    )
    assert sp == (70.0, 20.0) and ep == (90.0, 40.0)

    # 90-degree coarse rotation (steps=1): display space is 80x100;
    # un-rotate maps (x, y) -> (y, H - x)
    sp, ep = sam.unproject_prompt_rect((10.0, 20.0), (30.0, 40.0), 100, 80,
                                       orientation_steps=1)
    assert sp == (20.0, 50.0) and ep == (40.0, 70.0)

    # fine rotation round-trips: rotate the rect corners forward by hand,
    # then unproject must recover the original bbox
    ang = np.radians(7.0)
    ca, sa = np.cos(ang), np.sin(ang)
    cx, cy = 50.0, 40.0

    def fwd(p):
        dx, dy = p[0] - cx, p[1] - cy
        return (dx * ca - dy * sa + cx, dx * sa + dy * ca + cy)

    a, b = (22.0, 18.0), (61.0, 55.0)
    corners = [a, (a[0], b[1]), b, (b[0], a[1])]
    rcorners = [fwd(c) for c in corners]
    xs = [c[0] for c in rcorners]
    ys = [c[1] for c in rcorners]
    sp, ep = sam.unproject_prompt_rect(
        (min(xs), min(ys)), (max(xs), max(ys)), 100, 80, rotation=7.0
    )
    # bbox-of-unrotated-bbox is a superset of the original rect
    assert sp[0] <= a[0] + 1e-6 and sp[1] <= a[1] + 1e-6
    assert ep[0] >= b[0] - 1e-6 and ep[1] >= b[1] - 1e-6


def test_precompute_ai_subject_wiring(small_sam):
    doc = {
        "masks": [{
            "name": "subject", "visible": True,
            "adjustments": {"exposure": 0.5},
            "subMasks": [{
                "type": "ai-subject", "visible": True, "mode": "additive",
                "parameters": {"startX": 10.0, "startY": 8.0,
                               "endX": 45.0, "endY": 30.0},
            }],
        }],
    }
    out = am.precompute_ai_submasks(doc, _rand_image())
    p = out["masks"][0]["subMasks"][0]["parameters"]
    assert isinstance(p.get("maskDataBase64"), str)
    assert p["maskDataBase64"].startswith("data:image/png;base64,")
    # decodes back to the image-sized mask
    from rapidraw_tpu.masks.parametric import _decode_data_url_gray

    decoded = _decode_data_url_gray(p["maskDataBase64"])
    assert decoded.shape == (40, 56)
