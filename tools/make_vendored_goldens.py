"""Vendored AI numeric-parity goldens (no network, no env vars).

The reference downloads + sha256-verifies + RUNS real checkpoints
(ai_processing.rs:165-228). This build has zero egress, so true
published-weight parity cannot be generated here; what CAN be pinned
end-to-end is everything on this side of the weight bytes:

    seeded flax init  ->  fabricated torch-layout state dict
        ->  tools/convert_ai_checkpoints.py (shape-stream engine)
        ->  flat-npz save / load (ai/masks._load_variables)
        ->  the PUBLIC inference entry point (preprocess + forward +
            postprocess)  ->  committed golden outputs

tests/test_ai_vendored.py regenerates the same deterministic weights and
asserts the committed goldens on EVERY run — no RAPIDRAW_MODELS needed.
When real converted checkpoints become obtainable, tools/make_ai_goldens.py
layers published-weight parity on top of this mechanism.

Run (regenerates tests/fixtures/ai_vendored/*.json):

    python tools/make_vendored_goldens.py [model ...]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

# goldens are asserted on the CPU test platform (tests/conftest.py); pin
# generation to CPU too, or TPU-vs-CPU numeric drift fails the comparison
import jax  # noqa: E402

try:
    jax.config.update("jax_platforms", "cpu")
except RuntimeError:
    pass  # backend already initialized (e.g. imported from a test)

TOOLS = Path(__file__).resolve().parent
sys.path.insert(0, str(TOOLS))

FIXTURE_DIR = (
    Path(__file__).resolve().parent.parent / "tests" / "fixtures" / "ai_vendored"
)

# models covered by the vendored pipeline (sam_encoder is excluded: a
# 1024x1024 ViT-B forward costs minutes on the CPU test runners; its
# architecture is pinned by test_ai_sam.py and the decoder covers the
# converter path for the SAM tree layout)
VENDORED = (
    "nind_denoise", "u2net_foreground", "sam_decoder", "lama_inpaint",
    "depth_anything_v2",
)


def fabricate_torch_stream(slots):
    """Inverse layout transforms, flax call order -> a synthetic torch
    state-dict stream the shape-stream converter must map back exactly."""
    stream = []
    for i, (path, arr) in enumerate(slots):
        a = np.asarray(arr, np.float32)
        if a.ndim == 4 and "ConvTranspose" in path:
            # inverse of the converter's convT_oihw_to_hwio_flipped:
            # flax (kh, kw, in, out) -> torch (in, out, kh, kw) + spatial flip
            t = a.transpose(2, 3, 0, 1)[:, :, ::-1, ::-1]
        elif a.ndim == 4:
            t = a.transpose(3, 2, 0, 1)  # HWIO -> OIHW
        else:
            t = a
        name = f"layer{i}.weight" if a.ndim > 1 else f"layer{i}.bias"
        stream.append((name, t))
    return stream


def install_vendored_weights(model_key: str, models_dir: Path) -> Path:
    """Deterministic seeded init -> fabricated torch stream -> converter ->
    npz in `models_dir`. Returns the npz path."""
    import convert_ai_checkpoints as cc
    from rapidraw_tpu.ai.models import MODELS

    variables = cc._init_variables(model_key)  # PRNGKey(0): deterministic
    slots = cc._flat_paths(variables)
    stream = fabricate_torch_stream(slots)
    _mapping, converted = cc.match_streams(slots, stream)
    models_dir.mkdir(parents=True, exist_ok=True)
    out = models_dir / MODELS[model_key].weights_file
    np.savez(out, **converted)
    return out


def _input_image(seed: int, h: int = 128, w: int = 128) -> np.ndarray:
    # same deterministic pattern as make_ai_goldens._input_image
    rng = np.random.default_rng(seed)
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    base = np.stack([
        0.5 + 0.4 * np.sin(xs / 17.0) * np.cos(ys / 23.0),
        0.5 + 0.3 * np.cos(xs / 29.0),
        0.5 + 0.35 * np.sin(ys / 13.0),
    ])
    return np.clip(base + rng.normal(0, 0.05, base.shape), 0, 1).astype(np.float32)


def runners():
    """Public-entry runners on fixed inputs (vendored weights installed)."""

    def denoise():
        from rapidraw_tpu.ai.denoise import denoise_ai

        return {"out": denoise_ai(_input_image(1), quality=0.5)}

    def foreground():
        from rapidraw_tpu.ai.masks import generate_foreground_mask

        return {"mask": generate_foreground_mask(_input_image(2))}

    def sam_decoder():
        from rapidraw_tpu.ai.sam import ImageEmbeddings, run_sam_decoder

        rng = np.random.default_rng(5)
        emb = rng.normal(0, 1, (1, 64, 64, 256)).astype(np.float32)
        e = ImageEmbeddings(embeddings=emb, original_size=(128, 128))
        return {"mask": run_sam_decoder(e, (30, 40), (90, 100))}

    def lama():
        from rapidraw_tpu.ai.inpaint import run_lama_inpainting

        img = _input_image(6)
        mask = np.zeros(img.shape[1:], np.float32)
        mask[30:60, 40:80] = 1.0
        return {"out": run_lama_inpainting(img, mask)}

    def depth():
        from rapidraw_tpu.ai.depth import generate_depth_map

        return {"depth": generate_depth_map(_input_image(4))}

    return {
        "nind_denoise": denoise,
        "u2net_foreground": foreground,
        "sam_decoder": sam_decoder,
        "lama_inpaint": lama,
        "depth_anything_v2": depth,
    }


def _sample_grid(a: np.ndarray, n: int = 24) -> list:
    """Deterministic strided sample of up to n*n values (row-major grid)."""
    a = np.asarray(a, np.float32)
    flat = a.reshape(-1)
    idx = np.linspace(0, flat.size - 1, min(n * n, flat.size)).astype(np.int64)
    return [round(float(v), 5) for v in flat[idx]]


def golden_for(arr) -> dict:
    a = np.asarray(arr, np.float32)
    return {
        "shape": list(a.shape),
        "dtype": str(np.asarray(arr).dtype),
        "mean": round(float(a.mean()), 6),
        "std": round(float(a.std()), 6),
        "q01": round(float(np.quantile(a, 0.01)), 6),
        "q99": round(float(np.quantile(a, 0.99)), 6),
        "sample": _sample_grid(a),
    }


def generate(model_key: str, models_dir: Path) -> dict:
    install_vendored_weights(model_key, models_dir)
    outputs = runners()[model_key]()
    return {k: golden_for(v) for k, v in outputs.items()}


def main(argv):
    import os
    import tempfile

    targets = argv[1:] or list(VENDORED)
    FIXTURE_DIR.mkdir(parents=True, exist_ok=True)
    with tempfile.TemporaryDirectory(prefix="rr_vendored_") as td:
        os.environ["RAPIDRAW_MODELS"] = td
        os.environ["RAPIDRAW_MODELS_DIR"] = td
        for name in targets:
            import time

            t0 = time.perf_counter()
            fixture = generate(name, Path(td))
            path = FIXTURE_DIR / f"{name}.json"
            path.write_text(json.dumps(fixture, indent=1))
            print(f"{name}: wrote {path} ({time.perf_counter() - t0:.1f}s)")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
