"""Per-stage cost profiler for the fused develop kernel (real TPU).

Measures bench-config throughput with individual stages ablated, via the
slope method (axon's block_until_ready does not block; see bench.py).
Prints one line per variant as it completes: name, ms/frame, delta vs full.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u tools/profile_stages.py
"""

from __future__ import annotations
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import copy
import sys
import time

import numpy as np

H, W = 4096, 6144
BATCH = 2
ITERS = 8

FULL = {
    "exposure": 0.3,
    "contrast": 20,
    "highlights": -25,
    "shadows": 20,
    "saturation": 10,
    "vibrance": 18,
    "temperature": 5,
    "hue": 5,
    "vignetteAmount": -35,
    "hsl": {
        "reds": {"hue": 6, "saturation": 10, "luminance": 0},
        "greens": {"hue": -4, "saturation": 8, "luminance": 2},
        "blues": {"hue": -8, "saturation": 14, "luminance": -6},
    },
    "curves": {
        "luma": [{"x": 0, "y": 4}, {"x": 110, "y": 96}, {"x": 255, "y": 252}],
        "red": [{"x": 0, "y": 0}, {"x": 255, "y": 255}],
        "green": [{"x": 0, "y": 0}, {"x": 255, "y": 255}],
        "blue": [{"x": 0, "y": 0}, {"x": 255, "y": 255}],
    },
    "toneMapper": "agx",
}


def variant(name, **removals):
    doc = copy.deepcopy(FULL)
    for k, v in removals.items():
        if v is None:
            doc.pop(k, None)
        else:
            doc[k] = v
    return name, doc


VARIANTS = [
    ("full", copy.deepcopy(FULL)),
    variant("no_exposure", exposure=0),
    variant("no_tonal", contrast=0, shadows=0),
    variant("no_shadows(blur)", shadows=0),
    variant("no_highlights", highlights=0),
    variant("no_creative", saturation=0, vibrance=0),
    variant("no_wb", temperature=0),
    variant("no_hue", hue=0),
    variant("no_vignette", vignetteAmount=0),
    variant("no_hsl", hsl=None),
    variant("no_curves", curves=None),
    variant("tonemap_basic", toneMapper="basic"),
    # minimal: only exposure (floor cost = kernel overhead + IO + dither)
    ("exposure_only", {"exposure": 0.3, "toneMapper": "agx"}),
]


def main() -> None:
    import jax
    import jax.numpy as jnp

    from rapidraw_tpu.cli import _enable_persistent_jit_cache
    from rapidraw_tpu.params.parse import parse_adjustments
    from rapidraw_tpu.pipeline.batch import develop_batch, stack_params

    _enable_persistent_jit_cache()

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((BATCH, 3, H, W), dtype=np.float32))
    _ = float(images[0, 0, 0, 0])  # force the (slow) host->device transfer now

    results = {}
    for name, doc in VARIANTS:
        parsed = [parse_adjustments(doc, is_raw=False) for _ in range(BATCH)]
        params, cfg = stack_params([p for p, _ in parsed], [c for _, c in parsed])
        fn = jax.jit(lambda imgs, p, c=cfg: develop_batch(imgs, p, c))
        t0 = time.perf_counter()
        out = fn(images, params)
        _ = float(out[0, 0, 0, 0])
        compile_s = time.perf_counter() - t0

        def run(iters: int) -> float:
            t0 = time.perf_counter()
            y = images
            for _ in range(iters):
                y = fn(y, params)
            _ = float(y[0, 0, 0, 0])
            return time.perf_counter() - t0

        base = run(2)
        fullt = run(2 + ITERS)
        ms = (fullt - base) / ITERS / BATCH * 1e3
        results[name] = ms
        d = results["full"] - ms if "full" in results and name != "full" else 0.0
        mpix = BATCH * H * W / (ms * BATCH / 1e3) / 1e6
        print(
            f"{name:22s} {ms:8.2f} ms/frame  {mpix:8.1f} MPix/s  "
            f"delta_vs_full {d:+7.2f} ms  (compile {compile_s:.0f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
