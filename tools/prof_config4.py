"""Config-4 (local masks) ablation profiler on the real chip.

Variants: full config-4, clarity removed from the dodge mask (drops the
clarity blur level), mask adjustments emptied (mask bitmaps still stream),
and no masks at all. Slope-timed, interleaved; prints ms/frame per variant.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u tools/prof_config4.py
"""

from __future__ import annotations
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import copy
import time

import numpy as np

H, W = 4096, 6144
ITERS = 10

BASE = {
    "exposure": 0.2,
    "contrast": 10,
    "toneMapper": "agx",
    "masks": [
        {
            "name": "sky", "visible": True,
            "adjustments": {"exposure": -0.8, "saturation": 15, "contrast": 10},
            "subMasks": [{
                "type": "linear", "visible": True, "mode": "additive",
                "parameters": {"startX": 0, "startY": 0, "endX": 0,
                               "endY": H * 0.45, "range": 40},
            }],
        },
        {
            "name": "face", "visible": True,
            "adjustments": {"exposure": 0.6, "shadows": 20},
            "subMasks": [{
                "type": "radial", "visible": True, "mode": "additive",
                "parameters": {"centerX": W * 0.6, "centerY": H * 0.55,
                               "radiusX": W * 0.12, "radiusY": H * 0.16,
                               "rotation": 10.0, "feather": 0.5},
            }],
        },
        {
            "name": "dodge", "visible": True,
            "adjustments": {"exposure": 0.4, "clarity": 20},
            "subMasks": [{
                "type": "brush", "visible": True, "mode": "additive",
                "parameters": {"lines": [{
                    "points": [{"x": W * 0.2, "y": H * 0.7},
                               {"x": W * 0.35, "y": H * 0.75},
                               {"x": W * 0.5, "y": H * 0.72}],
                    "brushSize": 600.0, "feather": 0.5,
                }]},
            }],
        },
    ],
}


def _variants():
    full = copy.deepcopy(BASE)

    no_clarity = copy.deepcopy(BASE)
    no_clarity["masks"][2]["adjustments"] = {"exposure": 0.4}

    empty_adjust = copy.deepcopy(BASE)
    for mk in empty_adjust["masks"]:
        mk["adjustments"] = {}

    no_masks = copy.deepcopy(BASE)
    no_masks.pop("masks")

    return [
        ("full_config4", full),
        ("no_mask_clarity", no_clarity),
        ("empty_mask_adjustments", empty_adjust),
        ("no_masks", no_masks),
    ]


def main() -> None:
    import jax
    import jax.numpy as jnp

    from rapidraw_tpu.masks.rasterize import rasterize_masks
    from rapidraw_tpu.params.parse import parse_adjustments
    from rapidraw_tpu.pipeline.batch import develop_batch, stack_params

    from rapidraw_tpu.pipeline.bands import blur_band_rows

    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.random((1, 3, H, W), dtype=np.float32))

    runs = []
    for name, doc in _variants():
        p, c = parse_adjustments(doc, is_raw=False)
        params, cfg = stack_params([p], [c])
        masks = None
        variants = [(name, None)]
        if "masks" in doc:
            m = rasterize_masks(doc, W, H, scale=1.0)
            masks = jnp.asarray(m)[None]
            if name == "full_config4":
                bands = blur_band_rows(cfg, m)
                print(f"bands: {bands}")
                variants.append((name + "_banded", bands))
        for vname, bands in variants:
            fn = jax.jit(lambda imgs, pp, mk, _c=cfg, _b=bands: develop_batch(
                imgs, pp, _c, masks=mk, blur_bands=_b))
            out = fn(image, params, masks)
            _ = float(out[0, 0, 0, 0])
            runs.append((vname, fn, params, masks))

    def slope(fn, params, masks) -> float:
        def run(n):
            t0 = time.perf_counter()
            y = image
            for _ in range(n):
                y = fn(y, params, masks)
            _ = float(y[0, 0, 0, 0])
            return time.perf_counter() - t0
        run(2)
        lo, hi = run(ITERS), run(2 * ITERS)
        return (hi - lo) / ITERS

    # interleaved: 3 rounds each, keep the median
    acc = {name: [] for name, *_ in runs}
    for _ in range(3):
        for name, fn, params, masks in runs:
            acc[name].append(slope(fn, params, masks))
    base = None
    for name, *_ in runs:
        ms = sorted(acc[name])[1] * 1e3
        if base is None:
            base = ms
        print(f"{name:26s} {ms:7.2f} ms/frame   delta_vs_full {ms - base:+6.2f}")


if __name__ == "__main__":
    main()
