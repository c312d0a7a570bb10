"""Probe: can Mosaic efficiently read misaligned 2-D static slices inside a
chunked kernel? (NR taps are static offsets in [-14, 14] on both axes.)

Kernel: full-width row-tile blocks with 16-row halo strips; per 16-row
chunk, accumulate N_TAPS shifted slices with a weight — a stand-in for the
NR gate math. Compares against an XLA shifted-slice implementation.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u tools/prof_nr_slices.py
"""

from __future__ import annotations
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import numpy as np

H, W = 4096, 6144
TH = 64   # rows per tile
CH = 16   # rows per chunk
HALO = 16
TAPS = [(dx, dy) for dy in range(-2, 3) for dx in range(-2, 3) if (dx, dy) != (0, 0)]
STRIDE = 7  # max-ish chroma stride -> offsets up to 14


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from rapidraw_tpu.cli import _enable_persistent_jit_cache

    _enable_persistent_jit_cache()

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((3, H, W), dtype=np.float32))
    _ = float(img[0, 0, 0])

    offs = [(round(dx * STRIDE / 2), round(dy * STRIDE / 2)) for dx, dy in TAPS]

    wp_l = 16
    wp = wp_l + W + 16
    wp += -wp % 128

    def kernel(x_ref, t_ref, b_ref, o_ref, ext_ref):
        # assemble the extended strip (96 rows) in VMEM scratch once per tile
        ext_ref[:, :HALO, :] = t_ref[...]
        ext_ref[:, HALO : HALO + TH, :] = x_ref[...]
        ext_ref[:, HALO + TH :, :] = b_ref[...]

        # statically unrolled chunk loop: Mosaic requires dynamic sublane
        # starts to be provably 8-aligned; tap offsets are arbitrary ints,
        # so keep every slice start a static python int
        for ci in range(TH // CH):
            r0 = ci * CH
            acc = ext_ref[:, HALO + r0 : HALO + r0 + CH, wp_l : wp_l + W] * 0.5
            for k, (dx, dy) in enumerate(offs):
                s = ext_ref[:, HALO + r0 + dy : HALO + r0 + dy + CH, wp_l + dx : wp_l + dx + W]
                acc = acc + s * (0.01 * (k + 1))
            o_ref[:, r0 : r0 + CH, :] = acc

    def pallas_nr(x):
        xp = jnp.pad(x, ((0, 0), (TH, TH + (-H % TH)), (wp_l, wp - wp_l - W)), mode="edge")
        n = (H + (-H % TH)) // TH
        rows16 = TH // HALO
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((3, n * TH, W), jnp.float32),
            grid=(n,),
            in_specs=[
                pl.BlockSpec((3, TH, wp), lambda i: (0, i + 1, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((3, HALO, wp), lambda i: (0, rows16 * (i + 1) - 1, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((3, HALO, wp), lambda i: (0, rows16 * (i + 2), 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((3, TH, W), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((3, TH + 2 * HALO, wp), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=(pltpu.GridDimensionSemantics.PARALLEL,),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(xp, xp, xp)
        return out[:, :H, :]

    def xla_nr(x):
        m = max(max(abs(a), abs(b)) for a, b in offs)
        xp = jnp.pad(x, ((0, 0), (m, m), (m, m)), mode="edge")
        acc = x * 0.5
        for k, (dx, dy) in enumerate(offs):
            acc = acc + xp[:, m + dy : m + dy + H, m + dx : m + dx + W] * (0.01 * (k + 1))
        return acc

    for name, fn in [("pallas", jax.jit(pallas_nr)), ("xla", jax.jit(xla_nr))]:
        t0 = time.perf_counter()
        out = fn(img)
        _ = float(out[0, 0, 0])
        comp = time.perf_counter() - t0

        def run(it):
            t0 = time.perf_counter()
            y = img
            for _ in range(it):
                y = fn(y)
            _ = float(y[0, 0, 0])
            return time.perf_counter() - t0

        b = run(2)
        f = run(8)
        print(f"{name}: {(f - b) / 6 * 1e3:7.2f} ms  (24 taps, compile {comp:.0f}s)", flush=True)

    # correctness cross-check
    a = np.asarray(jax.jit(pallas_nr)(img))
    b = np.asarray(jax.jit(xla_nr)(img))
    print("max diff pallas vs xla:", np.abs(a - b).max(), flush=True)


if __name__ == "__main__":
    main()
