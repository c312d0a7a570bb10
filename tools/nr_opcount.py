"""Op-count artifact for the NR static Pallas kernel (VERDICT r3 #2).

Traces _apply_nr_static_pallas to a jaxpr, extracts the Pallas kernel
jaxpr, and counts vector element-ops per primitive — turning the
PERFORMANCE.md roofline claim ("~900 single-plane vector ops per pixel
after all measured algebraic reductions") into a checkable artifact.

Writes tools/nr_opcount.json:
  * per-primitive element-op histogram for one grid tile,
  * total element-ops for a 24MP frame,
  * ops/pixel,
  * the measured kernel wall time and implied sustained element-op rate,
  * the measured VPU bounds (tools/prof_chunked.py) for comparison.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u tools/nr_opcount.py
(CPU is fine for the trace; pass --measured-ms to embed a TPU time.)
"""

from __future__ import annotations
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import sys
from collections import Counter
from pathlib import Path

import numpy as np

H, W = 4096, 6144  # 24MP bench frame
LUMA_A, COLOR_A = 0.3, 0.25  # BASELINE config 5 amounts

# ops that move/reshape data without VPU arithmetic (not counted as
# element-ops; loads/stores counted separately)
_MEMORY_PRIMS = {
    "get", "swap", "masked_load", "masked_swap", "load", "store",
    "broadcast_in_dim", "reshape", "squeeze", "transpose", "copy",
    "convert_element_type", "slice", "dynamic_slice", "dynamic_update_slice",
    "iota", "concatenate", "pad",
}


def _find_pallas_jaxprs(jaxpr, out=None):
    out = out if out is not None else []
    for eqn in jaxpr.eqns:
        if eqn.primitive.name == "pallas_call":
            out.append(eqn)
        for v in eqn.params.values():
            if hasattr(v, "jaxpr"):  # ClosedJaxpr
                _find_pallas_jaxprs(v.jaxpr, out)
            elif hasattr(v, "eqns"):
                _find_pallas_jaxprs(v, out)
    return out


def _count(jaxpr):
    """(vector element-ops, memory element-moves) histograms by primitive."""
    ops = Counter()
    mem = Counter()
    for eqn in jaxpr.eqns:
        inner = [v for v in eqn.params.values()
                 if hasattr(v, "jaxpr") or hasattr(v, "eqns")]
        if inner:
            for v in inner:
                sub = v.jaxpr if hasattr(v, "jaxpr") else v
                o, m = _count(sub)
                ops.update(o)
                mem.update(m)
            continue
        n = 0
        for ov in eqn.outvars:
            shape = getattr(getattr(ov, "aval", None), "shape", ())
            n += int(np.prod(shape)) if shape else 1
        name = eqn.primitive.name
        if name in _MEMORY_PRIMS:
            mem[name] += n
        else:
            ops[name] += n
    return ops, mem


def main(argv):
    measured_ms = None
    for a in argv[1:]:
        if a.startswith("--measured-ms="):
            measured_ms = float(a.split("=", 1)[1])

    import jax
    import jax.numpy as jnp

    from rapidraw_tpu.ops.colorspace import srgb_to_linear
    from rapidraw_tpu.ops.nr import _apply_nr_static_pallas

    def f(x):
        return _apply_nr_static_pallas(
            srgb_to_linear(x), x, LUMA_A, COLOR_A, 1.0, False,
            tap_dtype=jnp.float32,
        )

    jaxpr = jax.make_jaxpr(f)(
        jax.ShapeDtypeStruct((3, H, W), jnp.float32)
    )
    calls = _find_pallas_jaxprs(jaxpr.jaxpr)
    assert calls, "no pallas_call found — kernel path changed?"
    eqn = calls[-1]  # the NR kernel (srgb_to_linear may fuse upstream)
    kernel_jaxpr = eqn.params["jaxpr"].jaxpr if hasattr(
        eqn.params["jaxpr"], "jaxpr") else eqn.params["jaxpr"]
    grid = eqn.params.get("grid_mapping")
    grid_shape = tuple(grid.grid) if grid is not None else ()
    n_tiles = int(np.prod(grid_shape)) if grid_shape else 1

    ops, mem = _count(kernel_jaxpr)
    tile_ops = sum(ops.values())
    tile_mem = sum(mem.values())
    total_ops = tile_ops * n_tiles
    px = H * W
    report = {
        "frame": [H, W],
        "amounts": {"luma": LUMA_A, "color": COLOR_A},
        "grid": list(grid_shape),
        "per_tile_element_ops": tile_ops,
        "per_tile_memory_moves": tile_mem,
        "total_element_ops_24mp": total_ops,
        "ops_per_pixel": round(total_ops / px, 1),
        "memory_moves_per_pixel": round(tile_mem * n_tiles / px, 1),
        "histogram_element_ops": dict(ops.most_common()),
        "histogram_memory": dict(mem.most_common()),
        "vpu_bounds_measured": {
            "register_resident_Gops_per_ms": 2.5,
            "vmem_streaming_Gops_per_ms": 0.9,
            "source": "tools/prof_chunked.py (PERFORMANCE.md)",
        },
    }
    if measured_ms:
        report["measured_ms_24mp"] = measured_ms
        report["implied_Gops_per_ms"] = round(total_ops / measured_ms / 1e9, 3)
        report["floor_ms_register_resident"] = round(total_ops / 2.5e9, 1)
        report["floor_ms_vmem_streaming"] = round(total_ops / 0.9e9, 1)
    out = Path(__file__).resolve().parent / "nr_opcount.json"
    out.write_text(json.dumps(report, indent=1))
    print(json.dumps({k: v for k, v in report.items()
                      if not k.startswith("histogram")}, indent=1))
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
