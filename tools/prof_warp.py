import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time, sys
import numpy as np
import jax, jax.numpy as jnp
from rapidraw_tpu.geometry.params import geometry_params_from_json
from rapidraw_tpu.geometry.warp_fast import plan_warp, warp_with_plan, TH, TW

H, W = 4096, 6144
gp = geometry_params_from_json({"transformRotate": 1.5,
    "lensDistortionParams": {"k1": -0.08, "k2": 0.02, "model": 0, "vig_k1": -0.3},
    "lensDistortionAmount": 100.0, "lensVignetteAmount": 100.0})
plan = plan_warp(gp, H, W)
print(f"TH={TH} TW={TW} spans:", [(v.span, h.span) for _, v, h in plan.static.modes])
pa = {k: jnp.asarray(v) for k, v in plan.arrays.items()}
rng = np.random.default_rng(0)
img = jnp.asarray(rng.random((3, H, W), dtype=np.float32))
wf = jax.jit(lambda x, a: warp_with_plan(x, a, plan.static) * 0.999)
wf(img, pa); _ = float(wf(img, pa)[0,0,0])

def slope(step, x0, readback, iters=16):
    def run(n):
        t0 = time.perf_counter()
        y = x0
        for _ in range(n):
            y = step(y)
        readback(y)
        return time.perf_counter() - t0
    run(2); base = run(2); full = run(2 + iters)
    return (full - base) / iters

ts = sorted(slope(lambda y: wf(y, pa), img, lambda y: float(y[0,0,0])) for _ in range(3))
print(f"TH={TH} TW={TW}: median {ts[1]*1e3:.2f} ms {[round(t*1e3,2) for t in ts]}")
