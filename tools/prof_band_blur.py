"""Blur-pyramid cost at full size vs band slices (config-4 shapes).

Compares: multi(full), multi(union band), per-level single calls on each
level's own band, and the pad/scatter cost. Informs whether per-level
launches beat the shared union launch for band-restricted levels.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u tools/prof_band_blur.py
"""

from __future__ import annotations
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import numpy as np

H, W = 4096, 6144
R_TONAL, R_CLARITY = 31, 14  # blur_radius(8, 3.79), blur_radius(3.5, 3.79)
TONAL_BAND = (1536, 2944)
CLARITY_BAND = (2560, 3456)
ITERS = 8


def main() -> None:
    import jax
    import jax.numpy as jnp

    from rapidraw_tpu.ops.blur import gaussian_blur, gaussian_blur_multi
    from rapidraw_tpu.params import scales

    print("radii:", scales.blur_radius(scales.BLUR_RADIUS_TONAL, H / 1080),
          scales.blur_radius(scales.BLUR_RADIUS_CLARITY, H / 1080))

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((3, H, W), dtype=np.float32))

    def timed(name, fn):
        f = jax.jit(fn)
        _ = float(f(img)[0])  # D2H forces real completion (tunnel-safe)

        def run(n):
            t0 = time.perf_counter()
            for _ in range(n):
                out = f(img)
            _ = float(out[0])
            return time.perf_counter() - t0

        run(2)
        lo, hi = run(ITERS), run(2 * ITERS)
        ms = (hi - lo) / ITERS * 1e3
        print(f"{name:34s} {ms:7.2f} ms")
        return ms

    timed("multi_full", lambda x: jnp.stack(
        [b.sum() for b in gaussian_blur_multi(x, (R_TONAL, R_CLARITY))]))

    u0 = min(TONAL_BAND[0], CLARITY_BAND[0])
    u1 = max(TONAL_BAND[1], CLARITY_BAND[1])
    lo_u = max(0, u0 - R_TONAL)
    hi_u = min(H, u1 + R_TONAL)

    def union(x):
        levels = gaussian_blur_multi(x[:, lo_u:hi_u], (R_TONAL, R_CLARITY))
        outs = []
        for b in levels:
            band = b[:, u0 - lo_u : u1 - lo_u]
            outs.append(jnp.pad(band, ((0, 0), (u0, H - u1), (0, 0))).sum())
        return jnp.stack(outs)

    timed("multi_union_band+scatter", union)

    def per_level(x):
        outs = []
        for (y0, y1), r in ((TONAL_BAND, R_TONAL), (CLARITY_BAND, R_CLARITY)):
            lo = max(0, y0 - r)
            hi = min(H, y1 + r)
            b = gaussian_blur(x[:, lo:hi], r)
            band = b[:, y0 - lo : y1 - lo]
            outs.append(jnp.pad(band, ((0, 0), (y0, H - y1), (0, 0))).sum())
        return jnp.stack(outs)

    timed("per_level_bands+scatter", per_level)

    def union_noscatter(x):
        levels = gaussian_blur_multi(x[:, lo_u:hi_u], (R_TONAL, R_CLARITY))
        return jnp.stack([b.sum() for b in levels])

    timed("multi_union_band_noscatter", union_noscatter)

    def per_level_noscatter(x):
        outs = []
        for (y0, y1), r in ((TONAL_BAND, R_TONAL), (CLARITY_BAND, R_CLARITY)):
            lo = max(0, y0 - r)
            hi = min(H, y1 + r)
            outs.append(gaussian_blur(x[:, lo:hi], r).sum())
        return jnp.stack(outs)

    timed("per_level_bands_noscatter", per_level_noscatter)


if __name__ == "__main__":
    main()
