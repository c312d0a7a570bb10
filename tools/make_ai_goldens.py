"""Generate golden activation fixtures for the AI model ports.

Run AFTER installing converted weights (tools/convert_ai_checkpoints.py):

    python tools/make_ai_goldens.py            # all models with weights
    python tools/make_ai_goldens.py nind_denoise

For each model: a fixed seeded input runs through the PUBLIC entry point
and the output's shape + summary statistics (mean/std/quantiles, and a
sha256 of the float16-rounded bytes) land in
tests/fixtures/ai_goldens/<model>.json. tests/test_ai_goldens.py then
asserts numeric parity on every test run where the weights are present
(and skips cleanly where not) — so a converted checkpoint is pinned
against regressions in the flax ports, and a parity mismatch against the
original model shows up as soon as a fixture generated from the real
weights is committed.
"""

from __future__ import annotations
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import hashlib
import json
import sys
from pathlib import Path

import numpy as np

FIXTURE_DIR = Path(__file__).resolve().parent.parent / "tests" / "fixtures" / "ai_goldens"


def _summary(arr: np.ndarray) -> dict:
    a = np.asarray(arr, np.float32)
    h = hashlib.sha256(np.ascontiguousarray(a.astype(np.float16)).tobytes())
    return {
        "shape": list(a.shape),
        "mean": float(a.mean()),
        "std": float(a.std()),
        "q01": float(np.quantile(a, 0.01)),
        "q99": float(np.quantile(a, 0.99)),
        "f16_sha256": h.hexdigest(),
    }


def _input_image(seed: int, h: int = 128, w: int = 128) -> np.ndarray:
    rng = np.random.default_rng(seed)
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    base = np.stack([
        0.5 + 0.4 * np.sin(xs / 17.0) * np.cos(ys / 23.0),
        0.5 + 0.3 * np.cos(xs / 29.0),
        0.5 + 0.35 * np.sin(ys / 13.0),
    ])
    return np.clip(base + rng.normal(0, 0.05, base.shape), 0, 1).astype(np.float32)


def _runners():
    def denoise():
        from rapidraw_tpu.ai.denoise import denoise_ai

        return {"out": denoise_ai(_input_image(1), quality=0.5)}

    def foreground():
        from rapidraw_tpu.ai.masks import generate_foreground_mask

        return {"mask": generate_foreground_mask(_input_image(2))}

    def sky():
        from rapidraw_tpu.ai.masks import generate_sky_mask

        return {"mask": generate_sky_mask(_input_image(3))}

    def depth():
        from rapidraw_tpu.ai.depth import generate_depth_map

        return {"depth": generate_depth_map(_input_image(4))}

    def sam():
        from rapidraw_tpu.ai.sam import generate_image_embeddings

        emb = generate_image_embeddings(_input_image(5))
        return {"embeddings": np.asarray(emb.embeddings)}

    def lama():
        from rapidraw_tpu.ai.inpaint import run_lama_inpainting

        img = _input_image(6)
        mask = np.zeros(img.shape[1:], np.float32)
        mask[30:60, 40:80] = 1.0
        return {"out": run_lama_inpainting(img, mask)}

    return {
        "nind_denoise": denoise,
        "u2net_foreground": foreground,
        "skyseg": sky,
        "depth_anything_v2": depth,
        "sam_encoder": sam,
        "lama_inpaint": lama,
    }


def main(argv):
    from rapidraw_tpu.ai.models import ModelUnavailable

    runners = _runners()
    targets = argv[1:] or list(runners)
    FIXTURE_DIR.mkdir(parents=True, exist_ok=True)
    for name in targets:
        try:
            outputs = runners[name]()
        except ModelUnavailable as e:
            print(f"{name}: weights absent, skipped ({e})")
            continue
        fixture = {k: _summary(v) for k, v in outputs.items()}
        path = FIXTURE_DIR / f"{name}.json"
        path.write_text(json.dumps(fixture, indent=1))
        print(f"{name}: wrote {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
