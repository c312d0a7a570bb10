import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time
import numpy as np
import jax, jax.numpy as jnp
H, W = 4096, 6144
def slope(step, x0, readback, iters=12):
    def run(n):
        t0 = time.perf_counter()
        y = x0
        for _ in range(n):
            y = step(y)
        readback(y)
        return time.perf_counter() - t0
    run(2); base = run(2); full = run(2 + iters)
    return (full - base) / iters
rng = np.random.default_rng(0)
img = jnp.asarray(rng.random((3, H, W), dtype=np.float32))
from rapidraw_tpu.ops.nr import apply_noise_reduction
from rapidraw_tpu.ops.colorspace import srgb_to_linear
nf = jax.jit(lambda x: apply_noise_reduction(srgb_to_linear(x), x, 30.0, 25.0, 1.0, False,
                                             static_luma=30.0, static_color=25.0) * 0.999)
nf(img); _ = float(nf(img)[0,0,0])
ts = sorted(slope(nf, img, lambda y: float(y[0,0,0])) for _ in range(3))
print(f"NR(static): median {ts[1]*1e3:.2f} ms {[round(t*1e3,2) for t in ts]}")
