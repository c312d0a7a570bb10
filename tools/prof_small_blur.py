"""Small-radius blur + CA alternatives, 24MP on the real chip.

Hypotheses:
  1. radius<=8 separable blur: 9-tap shifted-slice VPU sum should beat the
     banded matmul (which pays a full 128-wide band window regardless of
     radius).
  2. CA static axis resample: the column gather is the expensive half;
     a one-hot MXU matmul (resample-as-matmul, like the blur band trick)
     may beat it.
"""
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


def bench(name, fn, img):
    f = jax.jit(fn)
    f(img); _ = float(f(img)[0, 0, 0])
    dt = slope(f, img, lambda y: float(y[0, 0, 0]))
    print(f"{name}: {dt*1e3:.2f} ms", flush=True)
    return dt


rng = np.random.default_rng(0)
img = jnp.asarray(rng.random((3, H, W), dtype=np.float32))

from rapidraw_tpu.ops.blur import gaussian_blur, _gauss_weights

R = 4
bench(f"blur r{R} banded-matmul (current)", lambda x: gaussian_blur(x, R) * 0.999, img)

w = _gauss_weights(R)


def blur_slices(x, radius):
    ws = _gauss_weights(radius)
    # H pass
    xp = jnp.pad(x, ((0, 0), (0, 0), (radius, radius)), mode="edge")
    acc = ws[0] * xp[:, :, 0:W]
    for i in range(1, 2 * radius + 1):
        acc = acc + ws[i] * xp[:, :, i : i + W]
    # V pass
    xp = jnp.pad(acc, ((0, 0), (radius, radius), (0, 0)), mode="edge")
    acc = ws[0] * xp[:, 0:H, :]
    for i in range(1, 2 * radius + 1):
        acc = acc + ws[i] * xp[:, i : i + H, :]
    return acc


bench(f"blur r{R} shifted slices", lambda x: blur_slices(x, R) * 0.999, img)

# correctness vs current
a = jax.jit(lambda x: gaussian_blur(x, R))(img)
b = jax.jit(lambda x: blur_slices(x, R))(img)
print("max|d| slices vs matmul:", float(jnp.max(jnp.abs(a - b))))

# ----------------------------------------------------------------- CA split
from rapidraw_tpu.ops.ca import _axis_indices

ca = 0.004  # ~12px max shift at 6144
ry = jnp.asarray(_axis_indices(H, ca))
rx = jnp.asarray(_axis_indices(W, ca))

bench("CA row gather only", lambda x: x[:, ry, :] * 0.999, img)
bench("CA col gather only", lambda x: x[:, :, rx] * 0.999, img)
bench("CA both axes (current form)", lambda x: x[:, ry, :][:, :, rx] * 0.999, img)

# one-hot matmul for the column pass: out = in @ S, S (W, W) one-hot f32
S = np.zeros((W, W), np.float32)
S[np.asarray(rx), np.arange(W)] = 1.0
Sj = jnp.asarray(S)
bench(
    "CA col one-hot matmul f32 HIGHEST",
    lambda x: jax.lax.dot_general(
        x, Sj, (((2,), (0,)), ((), ())), precision=jax.lax.Precision.HIGHEST
    ) * 0.999,
    img,
)

colm = jax.jit(lambda x: jax.lax.dot_general(
    x, Sj, (((2,), (0,)), ((), ())), precision=jax.lax.Precision.HIGHEST))(img)
colg = jax.jit(lambda x: x[:, :, rx])(img)
print("col matmul bit-exact:", bool(jnp.all(colm == colg)))
