"""Per-stage profile of the config-5 (stencil export) pipeline on TPU.

Measures each device stage independently at the real 24MP scale factor so
optimization work targets the true hotspots. Run on the real chip.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time
import numpy as np
import jax, jax.numpy as jnp

H, W = 4096, 6144
SCALE = max(0.1, min(H, W) / 1080.0)  # ~3.79, res_factor ~1.95


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


def bench(name, fn, img):
    f = jax.jit(fn)
    f(img); _ = float(f(img)[0, 0, 0])
    dt = slope(f, img, lambda y: float(y[0, 0, 0]))
    print(f"{name}: {dt*1e3:.2f} ms", flush=True)
    return dt


rng = np.random.default_rng(0)
img = jnp.asarray(rng.random((3, H, W), dtype=np.float32))

from rapidraw_tpu.ops.nr import apply_noise_reduction
from rapidraw_tpu.ops.colorspace import srgb_to_linear

lin = jax.jit(srgb_to_linear)(img)
lin.block_until_ready()

bench("NR luma-only (30/0)",
      lambda x: apply_noise_reduction(x, x, 30.0, 0.0, SCALE, True,
                                      static_luma=30.0, static_color=0.0) * 0.999,
      lin)
bench("NR chroma-only (0/25)",
      lambda x: apply_noise_reduction(x, x, 0.0, 25.0, SCALE, True,
                                      static_luma=0.0, static_color=25.0) * 0.999,
      lin)
bench("NR both (30/25)",
      lambda x: apply_noise_reduction(x, x, 30.0, 25.0, SCALE, True,
                                      static_luma=30.0, static_color=25.0) * 0.999,
      lin)
bench("NR both, srgb input (linearize in NR)",
      lambda x: apply_noise_reduction(srgb_to_linear(x), x, 30.0, 25.0, SCALE, False,
                                      static_luma=30.0, static_color=25.0) * 0.999,
      img)

from rapidraw_tpu.ops.ca import apply_ca_correction
bench("CA (12/-8)",
      lambda x: apply_ca_correction(x, 12.0 / 1.0, -8.0 / 1.0,
                                    static_rc=12.0, static_by=-8.0) * 0.999,
      img)

from rapidraw_tpu.ops.blur import gaussian_blur
from rapidraw_tpu.params import scales
r_sharp = scales.blur_radius(scales.BLUR_RADIUS_SHARPNESS, SCALE)
print(f"sharp blur radius: {r_sharp}")
bench(f"blur r{r_sharp}", lambda x: gaussian_blur(x, r_sharp) * 0.999, img)

from rapidraw_tpu.geometry.params import geometry_params_from_json
from rapidraw_tpu.geometry.warp_fast import plan_warp, warp_with_plan
gp = geometry_params_from_json({
    "transformRotate": 1.5,
    "lensDistortionParams": {"k1": -0.08, "k2": 0.02, "model": 0, "vig_k1": -0.3},
    "lensDistortionAmount": 100.0,
    "lensVignetteAmount": 100.0,
})
plan = plan_warp(gp, H, W)
if plan is not None:
    pa = {k: jnp.asarray(v) for k, v in plan.arrays.items()}
    wf = jax.jit(lambda x, a: warp_with_plan(x[None], a, plan.static)[0] * 0.999)
    wf(img, pa); _ = float(wf(img, pa)[0, 0, 0])
    dt = slope(lambda y: wf(y, pa), img, lambda y: float(y[0, 0, 0]))
    print(f"warp (two-pass plan): {dt*1e3:.2f} ms", flush=True)

# full develop (no warp) for reference
from rapidraw_tpu.params.parse import parse_adjustments
from rapidraw_tpu.pipeline.batch import develop_batch, stack_params
doc = {"exposure": 0.2, "sharpness": 40, "lumaNoiseReduction": 30,
       "colorNoiseReduction": 25, "chromaticAberrationRedCyan": 12,
       "chromaticAberrationBlueYellow": -8, "toneMapper": "agx"}
p, cfg = parse_adjustments(doc, is_raw=False)
params, cfgm = stack_params([p], [cfg])
df = jax.jit(lambda x, pp: develop_batch(x[None], pp, cfgm)[0])
df(img, params); _ = float(df(img, params)[0, 0, 0])
dt = slope(lambda y: df(y, params), img, lambda y: float(y[0, 0, 0]))
print(f"develop(c5, no warp): {dt*1e3:.2f} ms", flush=True)
