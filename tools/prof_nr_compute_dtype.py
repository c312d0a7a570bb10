"""NR static-grid Pallas kernel: f32 vs bf16 compute dtype, real TPU.

Measures the config-5 operating point (luma 0.3 / color 0.25, 24MP,
scale=min(h,w)/1080) with the slope method (axon block_until_ready does
not block; difference two chained iteration counts). Also reports the
deviation of the bf16 path vs f32 on the same frame.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u tools/prof_nr_compute_dtype.py
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import numpy as np
import jax
import jax.numpy as jnp

H, W = 4096, 6144
SCALE = min(H, W) / 1080.0


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
    from rapidraw_tpu.ops.nr import _apply_nr_static_pallas

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((3, H, W), dtype=np.float32))

    fns = {}
    for name, cd in (("bf16", jnp.bfloat16), ("f32", jnp.float32)):
        fns[name] = jax.jit(
            lambda x, cd=cd: _apply_nr_static_pallas(
                x, x, 0.3, 0.25, SCALE, True, compute_dtype=cd
            )
            * 0.999
        )

    results = {}
    for name, fn in fns.items():
        t0 = time.perf_counter()
        fn(img)
        _ = float(fn(img)[0, 0, 0])
        print(f"{name}: compiled+warm in {time.perf_counter()-t0:.1f}s", flush=True)
        ts = sorted(slope(fn, img, lambda y: float(y[0, 0, 0])) for _ in range(3))
        results[name] = ts[1]
        print(f"NR static ({name}): median {ts[1]*1e3:.2f} ms  {[round(t*1e3,2) for t in ts]}",
              flush=True)

    print(f"speedup bf16 vs f32: {results['f32']/results['bf16']:.3f}x", flush=True)

    # deviation on a smaller frame (full-frame diff readback through the
    # tunnel is slow)
    h2, w2 = 512, 768
    sub = img[:, :h2, :w2]
    a = np.asarray(jax.jit(lambda x: _apply_nr_static_pallas(
        x, x, 0.3, 0.25, SCALE, True, compute_dtype=jnp.float32))(sub))
    b = np.asarray(jax.jit(lambda x: _apply_nr_static_pallas(
        x, x, 0.3, 0.25, SCALE, True, compute_dtype=jnp.bfloat16))(sub))
    d = np.abs(a - b)
    print(f"bf16 vs f32 (TPU, 512x768): max {d.max():.2e} "
          f"p999 {np.quantile(d, 0.999):.2e} mean {d.mean():.2e}", flush=True)


if __name__ == "__main__":
    main()
