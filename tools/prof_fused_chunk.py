"""A/B: fused grade megakernel chunking variants at 24MP (config-3 doc).

Context (corrected): grade_opcount.json shows the megakernel sustains
~5.4 G elem-ops/ms (1831 ops/px in 8.5 ms) — ABOVE the serial synthetic
chain's 2.5 G/ms and near the VPU's multi-ALU issue peak, i.e. the
kernel is op-issue-bound at close to hardware peak. This sweep measured
whether the chunk schedule left anything on the table (it did not),
interleaved same-process:

  * _CH in {8, 16, 32} (rows per in-kernel chunk),
  * the statically unrolled chunk loop (_UNROLL_CHUNKS) at each _CH.

The previous _CH=16 choice came from a 48-op SYNTHETIC chain
(tools/prof_chunked.py); the real chain is ~114 ops with different
register pressure, so it deserves its own sweep.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u tools/prof_fused_chunk.py
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import numpy as np

import jax
import jax.numpy as jnp

H, W = 4096, 6144


def slope(step, x0, readback, iters=10):
    def run(n):
        t0 = time.perf_counter()
        y = x0
        for _ in range(n):
            y = step(y)
        readback(y)
        return time.perf_counter() - t0

    run(2)
    base = run(2)
    full = run(2 + iters)
    return (full - base) / iters


DOC = {
    "exposure": 0.3, "contrast": 22, "highlights": -40, "shadows": 30,
    "whites": 10, "blacks": -8, "saturation": 15, "temperature": 8,
    "tint": -4, "vibrance": 25, "hue": 6, "vignetteAmount": -35,
    "hsl": {
        "reds": {"hue": 8, "saturation": 12, "luminance": -4},
        "oranges": {"hue": 0, "saturation": 6, "luminance": 4},
        "blues": {"hue": -10, "saturation": 18, "luminance": -8},
    },
    "colorGrading": {
        "shadows": {"hue": 220, "saturation": 15, "luminance": 0},
        "midtones": {"hue": 0, "saturation": 0, "luminance": 0},
        "highlights": {"hue": 45, "saturation": 10, "luminance": 0},
        "blending": 50, "balance": 10,
    },
    "curves": {
        "luma": [{"x": 0, "y": 6}, {"x": 64, "y": 58}, {"x": 192, "y": 200},
                 {"x": 255, "y": 250}],
        "red": [{"x": 0, "y": 0}, {"x": 255, "y": 255}],
        "green": [{"x": 0, "y": 0}, {"x": 255, "y": 255}],
        "blue": [{"x": 0, "y": 2}, {"x": 255, "y": 253}],
    },
    "toneMapper": "agx",
}


def main():
    from rapidraw_tpu.cli import _enable_persistent_jit_cache
    from rapidraw_tpu.params.parse import parse_adjustments
    from rapidraw_tpu.pipeline import fused
    from rapidraw_tpu.pipeline.batch import develop_batch, stack_params

    _enable_persistent_jit_cache()
    p, c = parse_adjustments(DOC, is_raw=False)
    params, cfg = stack_params([p], [c])
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((1, 3, H, W), dtype=np.float32))
    _ = float(img[0, 0, 0, 0])

    fns = {}
    ref_out = None
    for ch in (8, 16, 32):
        for unroll in (False, True):
            fused._CH = ch
            fused._UNROLL_CHUNKS = unroll
            name = f"ch{ch}{'u' if unroll else ''}"
            t0 = time.perf_counter()
            f = jax.jit(
                lambda x, _v=name: develop_batch(x, params, cfg, fused=True)
            )
            out = f(img)
            _ = float(out[0, 0, 0, 0])
            print(f"{name}: compiled+warm in {time.perf_counter()-t0:.1f}s",
                  flush=True)
            if ref_out is None:
                ref_out = out
            else:
                d = float(jnp.abs(out - ref_out).max())
                assert d == 0.0, f"{name} changed output: max|d|={d:.3e}"
            fns[name] = f
    fused._CH = 16
    fused._UNROLL_CHUNKS = False

    for rep in range(3):
        for name, f in fns.items():
            dt = slope(f, img, lambda y: float(y[0, 0, 0, 0]))
            mpix = H * W / dt / 1e6
            print(f"{name} rep{rep}: {dt*1e3:6.2f} ms  {mpix:7.1f} MPix/s",
                  flush=True)


if __name__ == "__main__":
    main()
