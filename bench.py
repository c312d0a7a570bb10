"""Benchmark: batch develop throughput on one TPU chip.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target: 2 GPix/s per chip (BASELINE.json north star) =>
vs_baseline = value_MPix_per_s / 2000.
"""

from __future__ import annotations

import json
import time

import numpy as np

# 24MP-class canonical shape, TPU-tile friendly (8/128-aligned)
H, W = 4096, 6144
BATCH = 2
ITERS = 8

_BENCH_DOC = {
    # BASELINE config 3: full color grade — HSL mixer + hue shift + point
    # curves + vignette, plus the basic tonal set of config 1.
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


def main() -> None:
    import jax
    import jax.numpy as jnp

    from rapidraw_tpu.cli import _enable_persistent_jit_cache
    from rapidraw_tpu.params.parse import parse_adjustments
    from rapidraw_tpu.pipeline.batch import develop_batch, stack_params

    # the fused megakernel's Mosaic compile is expensive; persist executables
    # across processes so repeat runs skip straight to execution
    _enable_persistent_jit_cache()

    parsed = [parse_adjustments(_BENCH_DOC, is_raw=False) for _ in range(BATCH)]
    params, cfg = stack_params([p for p, _ in parsed], [c for _, c in parsed])

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((BATCH, 3, H, W), dtype=np.float32))

    fn = jax.jit(lambda imgs, p: develop_batch(imgs, p, cfg), donate_argnums=())
    out = fn(images, params)
    _ = float(out[0, 0, 0, 0])  # compile + warm (readback forces real sync)

    # Slope method: chain iterations through a data dependency and force a
    # scalar readback, then difference two iteration counts — on the axon
    # tunnel, block_until_ready() returns before execution finishes, so
    # naive timing reports absurd numbers.
    def run(iters: int) -> float:
        t0 = time.perf_counter()
        y = images
        for _ in range(iters):
            y = fn(y, params)
        _ = float(y[0, 0, 0, 0])
        return time.perf_counter() - t0

    base = run(2)
    full = run(2 + ITERS)
    dt = full - base

    mpix = BATCH * H * W * ITERS / dt / 1e6
    print(
        json.dumps(
            {
                "metric": "develop_throughput_full_grade_24mp",
                "value": round(mpix, 1),
                "unit": "MPix/s",
                "vs_baseline": round(mpix / 2000.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
