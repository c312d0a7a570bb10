"""Image tagging: HSV color tags + CLIP zero-shot scoring + folder indexing.

Port of tagging.rs: the color-tag extractor (:56-144) runs pure NumPy;
generate_tags_with_clip (:145-249) scores TAG_CANDIDATES with a locally
provided transformers CLIP checkpoint (no network egress in this
environment — the user supplies it, see _clip_dir); index_folder_tags
mirrors the background indexer (:251-434).
"""

from __future__ import annotations

import numpy as np

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.2613026, 0.2757771)


def preprocess_clip_image(planar: np.ndarray, input_size: int = 224) -> np.ndarray:
    """Resize-to-fill + CLIP normalization (tagging.rs:26-42). Returns (1,3,S,S)."""
    from PIL import Image

    arr = (np.clip(planar, 0, 1) * 255).astype(np.uint8).transpose(1, 2, 0)
    im = Image.fromarray(arr)
    w, h = im.size
    scale = max(input_size / w, input_size / h)
    im = im.resize((max(round(w * scale), input_size), max(round(h * scale), input_size)), Image.BILINEAR)
    left = (im.width - input_size) // 2
    top = (im.height - input_size) // 2
    im = im.crop((left, top, left + input_size, top + input_size))
    x = np.asarray(im, np.float32) / 255.0
    x = (x - np.asarray(CLIP_MEAN, np.float32)) / np.asarray(CLIP_STD, np.float32)
    return x.transpose(2, 0, 1)[None]


def softmax(x: np.ndarray) -> np.ndarray:
    """(tagging.rs:43-54)."""
    m = x.max(axis=-1, keepdims=True)
    e = np.exp(x - m)
    s = e.sum(axis=-1, keepdims=True)
    return np.where(s > 0, e / np.where(s > 0, s, 1.0), e)


def extract_color_tags(planar: np.ndarray) -> list[str]:
    """Dominant-color tags (tagging.rs:87-144)."""
    from PIL import Image

    arr = (np.clip(planar, 0, 1) * 255).astype(np.uint8).transpose(1, 2, 0)
    im = Image.fromarray(arr)
    im.thumbnail((100, 100))
    px = np.asarray(im, np.float32) / 255.0

    r, g, b = px[..., 0], px[..., 1], px[..., 2]
    mx = px.max(-1)
    mn = px.min(-1)
    delta = mx - mn
    safe = np.where(delta > 0, delta, 1.0)
    h = np.where(
        delta == 0, 0.0,
        np.where(
            mx == r, 60.0 * np.mod((g - b) / safe, 6.0),
            np.where(mx == g, 60.0 * ((b - r) / safe + 2.0), 60.0 * ((r - g) / safe + 4.0)),
        ),
    )
    h = np.where(h < 0, h + 360.0, h)
    s = np.where(mx > 0, delta / np.where(mx > 0, mx, 1.0), 0.0)
    v = mx

    names = np.full(h.shape, "unknown", dtype="<U8")
    names[(h < 20) | (h >= 340)] = "red"
    names[(h >= 20) & (h < 45)] = "orange"
    names[(h >= 45) & (h < 70)] = "yellow"
    names[(h >= 70) & (h < 160)] = "green"
    names[(h >= 160) & (h < 260)] = "blue"
    names[(h >= 260) & (h < 340)] = "purple"
    brown = ((names == "orange") | (names == "red")) & (v < 0.6) & (s < 0.7)
    names[brown] = "brown"
    names[(v >= 0.2) & (s < 0.1) & (v > 0.8)] = "white"
    names[(v >= 0.2) & (s < 0.1) & (v <= 0.8)] = "gray"
    names[v < 0.2] = "black"

    uniq, counts = np.unique(names, return_counts=True)
    tally = dict(zip(uniq.tolist(), counts.tolist()))
    colorful = sorted(
        ((n, c) for n, c in tally.items() if n not in ("black", "white", "gray")),
        key=lambda t: -t[1],
    )
    if colorful:
        return [n for n, _ in colorful[:2]]
    if tally:
        return [max(tally.items(), key=lambda t: t[1])[0]]
    return []


# --------------------------------------------------------------- CLIP scoring
def _clip_dir():
    """Local CLIP checkpoint directory (transformers save_pretrained layout:
    config + weights + tokenizer files). No network egress in this build —
    the user supplies the checkpoint, like every model in ai/models.py."""
    import os
    from pathlib import Path

    from rapidraw_tpu.ai.masks import _models_dir

    return Path(os.environ.get("RAPIDRAW_CLIP", str(_models_dir() / "clip")))


_CLIP_CACHE: dict = {}


def _load_clip():
    from rapidraw_tpu.ai.models import ModelUnavailable

    d = _clip_dir()
    hit = _CLIP_CACHE.get(str(d))
    if hit is not None:
        return hit
    if not d.is_dir():
        raise ModelUnavailable(
            f"CLIP checkpoint not found at {d}. Place a transformers "
            "save_pretrained() CLIP directory there or set RAPIDRAW_CLIP."
        )
    from transformers import AutoTokenizer, CLIPModel

    model = CLIPModel.from_pretrained(d)
    model.eval()
    tokenizer = AutoTokenizer.from_pretrained(d)
    _CLIP_CACHE.clear()  # one checkpoint resident at a time
    _CLIP_CACHE[str(d)] = (model, tokenizer)
    return model, tokenizer


def generate_tags_with_clip(
    planar: np.ndarray,
    custom_tags: list[str] | None = None,
    max_tags: int = 10,
) -> list[str]:
    """Zero-shot tags for planar (3, H, W) f32 [0,1] (tagging.rs:145-249).

    Scores the image against TAG_CANDIDATES (or the user's custom list) via
    CLIP logits_per_image -> softmax, keeps probabilities > 0.005, takes the
    top `max_tags`, then (for the default list only) unions in the dominant
    color tags and every hierarchy parent of a kept tag.
    """
    import torch

    from rapidraw_tpu.ai.tag_data import TAG_CANDIDATES, TAG_HIERARCHY

    model, tokenizer = _load_clip()
    is_custom = bool(custom_tags)
    texts = list(custom_tags) if is_custom else list(TAG_CANDIDATES)

    image_size = getattr(model.config.vision_config, "image_size", 224)
    pixel_values = torch.from_numpy(preprocess_clip_image(planar, image_size))
    enc = tokenizer(
        texts, padding=True, truncation=True, return_tensors="pt",
        max_length=getattr(model.config.text_config, "max_position_embeddings", 77),
    )
    with torch.no_grad():
        out = model(
            input_ids=enc["input_ids"],
            attention_mask=enc["attention_mask"],
            pixel_values=pixel_values,
        )
    probs = softmax(out.logits_per_image[0].numpy()[None])[0]

    scored = [(texts[i], float(p)) for i, p in enumerate(probs) if p > 0.005]
    scored.sort(key=lambda t: -t[1])
    initial = [t for t, _ in scored[:max_tags]]

    final = set(initial)
    if not is_custom:
        # bare color names, NOT "color:"-prefixed: the reference's
        # extract_color_tags also returns bare names (tagging.rs:86-144,
        # insert at :232-235) — generated color tags are AI tags and are
        # wiped by clear_ai_tags there too
        final.update(extract_color_tags(planar))
        for t in initial:
            final.update(TAG_HIERARCHY.get(t, ()))
    return sorted(final)


COLOR_TAG_PREFIX = "color:"
USER_TAG_PREFIX = "user:"


def index_folder_tags(
    folder: str,
    custom_tags: list[str] | None = None,
    max_tags: int = 10,
    progress=None,
    cancel=None,
) -> int:
    """Background-indexing analog (tagging.rs:251-434): CLIP-tag every
    supported image in `folder` that has no AI tags yet (color:/user:
    prefixed tags don't count), union with existing sidecar tags, sorted.

    `progress(current, total)` mirrors the indexing-progress event;
    `cancel` is an optional CancellationToken. Returns images processed.
    """
    from rapidraw_tpu.library.catalog import add_tags, get_tags, list_images

    paths = list_images(folder)
    done = 0
    for i, p in enumerate(paths):
        if cancel is not None and cancel.cancelled:
            break
        existing = get_tags(p)
        has_ai = any(
            not t.startswith(COLOR_TAG_PREFIX) and not t.startswith(USER_TAG_PREFIX)
            for t in existing
        )
        if not has_ai:
            from rapidraw_tpu.ai.models import ModelUnavailable
            from rapidraw_tpu.io.loader import load_image

            try:
                # fast (thumbnail) load: the reference scores CACHED
                # THUMBNAILS (tagging.rs:345-350), and CLIP resizes to 224
                # anyway — a full-quality RAW develop here is pure waste
                planar, _ = load_image(p, fast=True)
                # thumbnail-scale the scoring input like the reference's
                # cached thumbnail path; downscale once on the long edge
                if max(planar.shape[1:]) > 720:
                    import jax.numpy as jnp

                    from rapidraw_tpu.geometry.resize import downscale_to_long_edge

                    planar = np.asarray(
                        downscale_to_long_edge(jnp.asarray(planar), 720)
                    )
                tags = generate_tags_with_clip(planar, custom_tags, max_tags)
                add_tags(p, tags)
                done += 1
            except ModelUnavailable:
                # a missing checkpoint is a configuration error for the
                # WHOLE walk, not a per-image decode failure — surface it
                raise
            except Exception:
                pass  # per-image isolation, like the reference's logged skip
        if progress is not None:
            progress(i + 1, len(paths))
    return done


def clear_ai_tags(root_path: str) -> int:
    """Walk root for .rrdata sidecars and strip AI tags, keeping color:/
    user: prefixed ones; returns the number of sidecars updated
    (tagging.rs:469-504)."""
    return _sweep_tags(
        root_path,
        keep=lambda t: t.startswith(COLOR_TAG_PREFIX) or t.startswith(USER_TAG_PREFIX),
    )


def clear_all_tags(root_path: str) -> int:
    """Remove every tag from every .rrdata under root (tagging.rs:506-540)."""
    return _sweep_tags(root_path, keep=lambda t: False)


def _sweep_tags(root_path: str, keep) -> int:
    import json
    from pathlib import Path

    root = Path(root_path)
    if not root.exists():
        raise FileNotFoundError(f"Root path does not exist: {root_path}")
    updated = 0
    for p in root.rglob("*.rrdata"):
        try:
            meta = json.loads(p.read_text())
        except (OSError, json.JSONDecodeError):
            continue
        tags = meta.get("tags")
        if not isinstance(tags, list) or not tags:
            continue
        kept = [t for t in tags if isinstance(t, str) and keep(t)]
        if len(kept) < len(tags):
            meta["tags"] = kept or None
            try:
                p.write_text(json.dumps(meta, indent=2))
                updated += 1
            except OSError:
                pass
    return updated
