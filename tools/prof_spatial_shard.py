"""Shard-local kernel cost for the fused spatial regime (one real chip).

The spatial mesh (parallel/mesh._sharded_spatial_fused) runs the fused
megakernel + Pallas NR + banded blur on each W-shard's halo-extended slab.
Multi-chip hardware isn't available here, so this measures the SHARD-LOCAL
compute on the one real chip: develop_fused on a (3, H, W/nx + 2*halo)
slab vs the whole (3, H, W) frame — the per-chip work a spatial=nx mesh
would execute, minus the ppermute itself (a ~2*halo*H*4B neighbor copy
over ICI, ~100 us-scale at 24MP halos, overlappable with compute).

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u tools/prof_spatial_shard.py
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import numpy as np
import jax
import jax.numpy as jnp

H, W = 4096, 6144


def slope(step, x0, readback, iters=8):
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
    from rapidraw_tpu.params.parse import parse_adjustments
    from rapidraw_tpu.parallel.mesh import spatial_halo
    from rapidraw_tpu.pipeline.fused import develop_fused

    doc = {
        "exposure": 0.3, "sharpness": 40, "clarity": 30, "structure": 25,
        "lumaNoiseReduction": 30, "colorNoiseReduction": 25,
        "chromaticAberrationRedCyan": 12, "vignetteAmount": -30,
        "toneMapper": "agx",
    }
    params, cfg = parse_adjustments(doc, is_raw=False)
    params = jax.tree.map(jnp.asarray, params)

    rng = np.random.default_rng(0)

    cases = [("full frame (spatial=1)", W, 0)]
    for nx in (2, 4):
        hp = spatial_halo(cfg, H, W)
        cases.append((f"shard slab (spatial={nx}, halo={hp})", W // nx + 2 * hp, hp))

    results = {}
    for name, w_slab, hp in cases:
        img = jnp.asarray(rng.random((3, H, w_slab), dtype=np.float32))
        fn = jax.jit(
            lambda x, hp=hp, w_slab=w_slab: develop_fused(
                x, params, cfg, tile_offset=(2048 - hp, 0),
                full_size=(W, H),
            )[..., :, : w_slab]
            * 0.999
        )
        t0 = time.perf_counter()
        fn(img)
        _ = float(fn(img)[0, 0, 0])
        print(f"{name}: compiled+warm {time.perf_counter()-t0:.1f}s", flush=True)
        ts = sorted(slope(fn, img, lambda y: float(y[0, 0, 0])) for _ in range(3))
        results[name] = ts[1]
        print(f"{name}: median {ts[1]*1e3:.2f} ms  {[round(t*1e3,2) for t in ts]}",
              flush=True)

    full = results[cases[0][0]]
    for name, w_slab, hp in cases[1:]:
        nx = W // (w_slab - 2 * hp)
        t = results[name]
        eff = full / (t * nx)
        print(
            f"spatial={nx}: shard {t*1e3:.2f} ms -> {nx}-chip frame time "
            f"~{t*1e3:.2f} ms, scaling efficiency {eff:.2%} "
            f"(halo overhead {(w_slab / (W/nx) - 1):.1%} of columns)",
            flush=True,
        )


if __name__ == "__main__":
    main()
