"""Experiment: does row-chunking a long elementwise chain inside a Pallas
kernel (lax.fori_loop over vreg-sized slices) beat whole-tile ops?

Hypothesis: whole-tile elementwise ops stream VMEM at ~12B/elem/op (the
measured 0.08 ms/mul at 24MP = ~10 TB/s), i.e. the kernel is VMEM-bandwidth
bound, not ALU bound. Chunking lets Mosaic keep intermediates in vregs.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u tools/prof_chunked.py
"""

from __future__ import annotations
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import functools
import time

import numpy as np

H, W = 4096, 6144
TH, TW = 256, 512
ITERS = 8
N_OPS = 48  # representative chain length


def chain(x):
    # a mix resembling the grade chain: muls, adds, selects, one exp2/log2
    import jax.numpy as jnp

    for i in range(N_OPS // 6):
        x = x * 1.0001 + 0.0001
        x = jnp.maximum(x, 0.0)
        x = x * x * (3.0 - 2.0 * x)
        x = jnp.where(x > 0.5, x * 0.999, x)
        x = jnp.exp2(x * 0.1) * 0.933
    return x


def make_fn(mode: str, ch: int = 8):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel_whole(x_ref, o_ref):
        o_ref[...] = chain(x_ref[...])

    def kernel_chunked(x_ref, o_ref):
        def body(i, _):
            sub = x_ref[:, pl.ds(i * ch, ch), :]
            o_ref[:, pl.ds(i * ch, ch), :] = chain(sub)
            return 0

        jax.lax.fori_loop(0, TH // ch, body, 0)

    kern = kernel_whole if mode == "whole" else kernel_chunked

    @jax.jit
    def fn(img):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((3, H, W), jnp.float32),
            grid=(H // TH, W // TW),
            in_specs=[pl.BlockSpec((3, TH, TW), lambda i, j: (0, i, j),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((3, TH, TW), lambda i, j: (0, i, j),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=(
                    pltpu.GridDimensionSemantics.PARALLEL,
                    pltpu.GridDimensionSemantics.PARALLEL,
                ),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(img)

    return fn


def main() -> None:
    import jax.numpy as jnp

    from rapidraw_tpu.cli import _enable_persistent_jit_cache

    _enable_persistent_jit_cache()
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((3, H, W), dtype=np.float32))
    _ = float(img[0, 0, 0])

    for name, fn in [
        ("whole", make_fn("whole")),
        ("chunk8", make_fn("chunk", 8)),
        ("chunk16", make_fn("chunk", 16)),
        ("chunk32", make_fn("chunk", 32)),
        ("chunk64", make_fn("chunk", 64)),
    ]:
        t0 = time.perf_counter()
        out = fn(img)
        _ = float(out[0, 0, 0])
        compile_s = time.perf_counter() - t0

        def run(iters):
            t0 = time.perf_counter()
            y = img
            for _ in range(iters):
                y = fn(y)
            _ = float(y[0, 0, 0])
            return time.perf_counter() - t0

        base = run(2)
        full = run(2 + ITERS)
        ms = (full - base) / ITERS * 1e3
        print(f"{name:8s} {ms:7.2f} ms  ({N_OPS} ops, compile {compile_s:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
