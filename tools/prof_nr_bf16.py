"""A/B: NR static Pallas kernel with f32 vs bf16 tap streaming, at 24MP.

Also measures the exact-jitter slice path (RAPIDRAW_NR_EXACT_JITTER) once,
for the PERFORMANCE.md export-default decision (VERDICT r3 item 4).

Interleaved same-process slope measurements (the only trustworthy A/B on
the axon tunnel — see PERFORMANCE.md).

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u tools/prof_nr_bf16.py
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


def main():
    from rapidraw_tpu.cli import _enable_persistent_jit_cache
    from rapidraw_tpu.ops.colorspace import srgb_to_linear
    from rapidraw_tpu.ops.nr import (
        _apply_nr_jittered_slices,
        _apply_nr_static_pallas,
    )

    _enable_persistent_jit_cache()
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((3, H, W), dtype=np.float32))
    _ = float(img[0, 0, 0])

    # config-5 amounts (lumaNR 30 / colorNR 25 -> 0.3 / 0.25) and max
    for la, ca, tag in [(0.3, 0.25, "c5"), (1.0, 1.0, "max")]:
        fns = {}
        for name, dt in [("f32", jnp.float32), ("bf16", jnp.bfloat16)]:
            f = jax.jit(lambda x, dt=dt, la=la, ca=ca: _apply_nr_static_pallas(
                srgb_to_linear(x), x, la, ca, 1.0, False, tap_dtype=dt
            ) * 0.999)
            f(img)
            _ = float(f(img)[0, 0, 0])
            fns[name] = f
        # numeric delta between modes (device-side max/mean)
        d = jnp.abs(fns["f32"](img) - fns["bf16"](img))
        print(f"[{tag}] bf16-vs-f32 delta: max={float(d.max()):.3e} "
              f"mean={float(d.mean()):.3e}", flush=True)
        for rep in range(3):
            for name, f in fns.items():
                dt_s = slope(f, img, lambda y: float(y[0, 0, 0]))
                print(f"[{tag}] {name} rep{rep}: {dt_s * 1e3:.2f} ms", flush=True)

    # exact-jitter path, config-5 amounts, once (compile is per-band)
    jf = jax.jit(lambda x: _apply_nr_jittered_slices(
        srgb_to_linear(x), x, 0.3, 0.25, 1.0, False) * 0.999)
    t0 = time.perf_counter()
    jf(img)
    _ = float(jf(img)[0, 0, 0])
    print(f"exact-jitter compile+first: {time.perf_counter() - t0:.1f}s", flush=True)
    for rep in range(3):
        dt_s = slope(jf, img, lambda y: float(y[0, 0, 0]), iters=4)
        print(f"exact-jitter rep{rep}: {dt_s * 1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
