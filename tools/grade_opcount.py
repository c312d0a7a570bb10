"""Op-count artifact for the fused grade megakernel (headline config 3).

Companion to tools/nr_opcount.py: traces bench.py's config-3 develop path
(develop_batch -> develop_fused) to a jaxpr and counts vector element-ops
per primitive inside EVERY pallas_call (megakernel + blur matmul kernels),
plus MXU MACs from dot_general. The result localizes where the ~8.5 ms
frame time goes and which primitives would pay for algebraic reduction.

Writes tools/grade_opcount.json.

Run: PYTHONPATH=/root/repo python -u tools/grade_opcount.py
(CPU is fine for the trace; pass --measured-ms= to embed a TPU time.)
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

_MEMORY_PRIMS = {
    "get", "swap", "masked_load", "masked_swap", "load", "store",
    "broadcast_in_dim", "reshape", "squeeze", "transpose", "copy",
    "convert_element_type", "slice", "dynamic_slice", "dynamic_update_slice",
    "iota", "concatenate", "pad",
}


def _find_pallas(jaxpr, out=None):
    out = out if out is not None else []
    for eqn in jaxpr.eqns:
        if eqn.primitive.name == "pallas_call":
            out.append(eqn)
        for v in eqn.params.values():
            if hasattr(v, "jaxpr"):
                _find_pallas(v.jaxpr, out)
            elif hasattr(v, "eqns"):
                _find_pallas(v, out)
    return out


def _count(jaxpr, skip_pallas=False):
    ops = Counter()
    mem = Counter()
    macs = 0
    for eqn in jaxpr.eqns:
        if skip_pallas and eqn.primitive.name == "pallas_call":
            continue  # kernel bodies are counted per-call with their grids
        inner = [v for v in eqn.params.values()
                 if hasattr(v, "jaxpr") or hasattr(v, "eqns")]
        if inner:
            # loop bodies execute once per trip: fori_loop lowers to scan
            # with params['length'] (a single-trace count under-reports the
            # megakernel's 16-chunk loop 16x — caught in review)
            trips = int(eqn.params.get("length", 1)) if eqn.primitive.name == "scan" else 1
            for v in inner:
                sub = v.jaxpr if hasattr(v, "jaxpr") else v
                o, m, d = _count(sub, skip_pallas=skip_pallas)
                for kk, vv in o.items():
                    ops[kk] += vv * trips
                for kk, vv in m.items():
                    mem[kk] += vv * trips
                macs += d * trips
            continue
        name = eqn.primitive.name
        if name == "dot_general":
            a = eqn.invars[0].aval
            b = eqn.invars[1].aval
            dn = eqn.params["dimension_numbers"]
            contract = int(np.prod([a.shape[d] for d in dn[0][0]])) or 1
            out_elems = 0
            for ov in eqn.outvars:
                out_elems += int(np.prod(ov.aval.shape)) or 1
            macs += out_elems * contract
            continue
        n = 0
        for ov in eqn.outvars:
            shape = getattr(getattr(ov, "aval", None), "shape", ())
            n += int(np.prod(shape)) if shape else 1
        if name in _MEMORY_PRIMS:
            mem[name] += n
        else:
            ops[name] += n
    return ops, mem, macs


def main(argv):
    measured_ms = None
    for a in argv[1:]:
        if a.startswith("--measured-ms="):
            measured_ms = float(a.split("=", 1)[1])

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from rapidraw_tpu.params.parse import parse_adjustments
    from rapidraw_tpu.pipeline.batch import develop_batch, stack_params

    # bench.py _CONFIG3_DOC (keep in sync)
    doc = {
        "exposure": 0.3, "contrast": 22, "highlights": -40, "shadows": 30,
        "whites": 10, "blacks": -8, "saturation": 15, "temperature": 8,
        "tint": -4, "vibrance": 25, "hue": 6, "vignetteAmount": -35,
        "hsl": {
            "reds": {"hue": 8, "saturation": 12, "luminance": -4},
            "oranges": {"hue": 0, "saturation": 6, "luminance": 4},
            "blues": {"hue": -10, "saturation": 18, "luminance": -8},
        },
        "colorGrading": {
            "shadows": {"hue": 220, "saturation": 15, "luminance": 0},
            "midtones": {"hue": 0, "saturation": 0, "luminance": 0},
            "highlights": {"hue": 45, "saturation": 10, "luminance": 0},
            "blending": 50, "balance": 10,
        },
        "curves": {
            "luma": [{"x": 0, "y": 6}, {"x": 64, "y": 58}, {"x": 192, "y": 200},
                     {"x": 255, "y": 250}],
            "red": [{"x": 0, "y": 0}, {"x": 255, "y": 255}],
            "green": [{"x": 0, "y": 0}, {"x": 255, "y": 255}],
            "blue": [{"x": 0, "y": 2}, {"x": 255, "y": 253}],
        },
        "toneMapper": "agx",
    }
    p, c = parse_adjustments(doc, is_raw=False)
    params, cfg = stack_params([p], [c])

    def f(imgs):
        # force the fused megakernel path (auto-gating is TPU-only, but the
        # jaxpr trace is backend-independent)
        return develop_batch(imgs, params, cfg, fused=True)

    jaxpr = jax.make_jaxpr(f)(jax.ShapeDtypeStruct((1, 3, H, W), jnp.float32))
    calls = _find_pallas(jaxpr.jaxpr)
    assert calls, "no pallas_call found — kernel path changed?"

    px = H * W
    per_call = []
    total_ops = 0
    total_macs = 0
    for eqn in calls:
        kj = eqn.params["jaxpr"]
        kj = kj.jaxpr if hasattr(kj, "jaxpr") else kj
        grid = eqn.params.get("grid_mapping")
        grid_shape = tuple(grid.grid) if grid is not None else ()
        n_tiles = int(np.prod(grid_shape)) if grid_shape else 1
        ops, mem, macs = _count(kj)
        tile_ops = sum(ops.values())
        call_ops = tile_ops * n_tiles
        call_macs = macs * n_tiles
        total_ops += call_ops
        total_macs += call_macs
        per_call.append({
            "grid": list(grid_shape),
            "element_ops_per_pixel": round(call_ops / px, 1),
            "mxu_macs_per_pixel": round(call_macs / px, 1),
            "memory_moves_per_pixel": round(sum(mem.values()) * n_tiles / px, 1),
            "histogram_element_ops": dict(ops.most_common(20)),
        })
    # MXU MACs issued OUTSIDE pallas (XLA convs/matmuls, e.g. blur fallback);
    # pallas bodies are skipped here — they are counted per-call above
    _, _, xla_macs = _count(jaxpr.jaxpr, skip_pallas=True)

    report = {
        "frame": [H, W],
        "doc": "bench.py _CONFIG3_DOC (headline full grade)",
        "pallas_calls": len(calls),
        "total_vector_element_ops_per_pixel": round(total_ops / px, 1),
        "total_mxu_macs_per_pixel": round((total_macs + xla_macs) / px, 1),
        "per_call": per_call,
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
    out = Path(__file__).resolve().parent / "grade_opcount.json"
    out.write_text(json.dumps(report, indent=1))
    print(json.dumps({k: v for k, v in report.items() if k != "per_call"},
                     indent=1))
    for i, pc in enumerate(report["per_call"]):
        print(f"call {i}: {json.dumps(pc)[:400]}")
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
