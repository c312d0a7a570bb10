"""AI mask inference: U2-Net saliency (foreground/sky) in flax + the
euclidean-distance-transform mask ops.

The reference runs these as ONNX sessions (ai_processing.rs: U2-Net
foreground :1274, skyseg :1193, EDT mask ops :97-164) and embeds the
resulting mask PNGs into the adjustment doc as base64 (patch dedup,
useImageProcessing.ts:129-168). This environment has no onnxruntime and no
egress, so the networks are defined natively in flax and load parameters
from a local npz (RAPIDRAW_MODELS / ~/.cache/rapidraw_tpu/models); a clear
ModelUnavailable names the missing file. The produced masks feed
masks/parametric.generate_ai_mask exactly like the reference's base64 path.

U2-Net (Qin et al., "U2-Net: Going Deeper with Nested U-Structure for
Salient Object Detection", PR 2020): six RSU encoder stages, five RSU
decoder stages, six side outputs fused by a 1x1 conv.
"""

from __future__ import annotations

import base64
import io
import os
from pathlib import Path

import numpy as np

from rapidraw_tpu.ai.models import ModelUnavailable

U2NET_INPUT = 320  # ai_processing.rs U2-Net preprocessing size


# ------------------------------------------------------------- U2-Net (flax)
def _u2net():
    import flax.linen as nn
    import jax.numpy as jnp

    class REBNCONV(nn.Module):
        out_ch: int
        dirate: int = 1

        @nn.compact
        def __call__(self, x):
            x = nn.Conv(
                self.out_ch, (3, 3),
                kernel_dilation=(self.dirate, self.dirate),
                padding=self.dirate,
            )(x)
            x = nn.BatchNorm(use_running_average=True)(x)
            return nn.relu(x)

    def upsample_to(x, ref):
        import jax

        return jax.image.resize(
            x, (x.shape[0], ref.shape[1], ref.shape[2], x.shape[3]), "bilinear"
        )

    def pool(x):
        return nn.max_pool(x, (2, 2), strides=(2, 2), padding="SAME")

    class RSU(nn.Module):
        """RSU-L: height-L nested U-block."""

        height: int
        mid_ch: int
        out_ch: int

        @nn.compact
        def __call__(self, x):
            hxin = REBNCONV(self.out_ch)(x)
            # encoder
            enc = [REBNCONV(self.mid_ch)(hxin)]
            h = enc[0]
            for _ in range(self.height - 2):
                h = REBNCONV(self.mid_ch)(pool(h))
                enc.append(h)
            bottom = REBNCONV(self.mid_ch, dirate=2)(h)
            # decoder
            d = bottom
            for i in range(self.height - 2, 0, -1):
                d = REBNCONV(self.mid_ch)(jnp.concatenate([d, enc[i]], -1))
                d = upsample_to(d, enc[i - 1])
            d = REBNCONV(self.out_ch)(jnp.concatenate([d, enc[0]], -1))
            return d + hxin

    class RSU4F(nn.Module):
        """Dilated RSU (no pooling)."""

        mid_ch: int
        out_ch: int

        @nn.compact
        def __call__(self, x):
            hxin = REBNCONV(self.out_ch)(x)
            h1 = REBNCONV(self.mid_ch, dirate=1)(hxin)
            h2 = REBNCONV(self.mid_ch, dirate=2)(h1)
            h3 = REBNCONV(self.mid_ch, dirate=4)(h2)
            h4 = REBNCONV(self.mid_ch, dirate=8)(h3)
            d3 = REBNCONV(self.mid_ch, dirate=4)(jnp.concatenate([h4, h3], -1))
            d2 = REBNCONV(self.mid_ch, dirate=2)(jnp.concatenate([d3, h2], -1))
            d1 = REBNCONV(self.out_ch, dirate=1)(jnp.concatenate([d2, h1], -1))
            return d1 + hxin

    class U2Net(nn.Module):
        """Full U2-Net; `small=True` gives u2netp channel widths."""

        small: bool = False

        @nn.compact
        def __call__(self, x):  # (B, H, W, 3) -> (B, H, W, 1) logits-sigmoid
            if self.small:
                mids = [16, 16, 16, 16, 16, 16, 16, 16, 16, 16, 16]
                outs = [64, 64, 64, 64, 64, 64, 64, 64, 64, 64, 64]
            else:
                mids = [32, 32, 64, 128, 256, 256, 256, 128, 64, 32, 16]
                outs = [64, 128, 256, 512, 512, 512, 512, 256, 128, 64, 64]

            e1 = RSU(7, mids[0], outs[0])(x)
            e2 = RSU(6, mids[1], outs[1])(pool(e1))
            e3 = RSU(5, mids[2], outs[2])(pool(e2))
            e4 = RSU(4, mids[3], outs[3])(pool(e3))
            e5 = RSU4F(mids[4], outs[4])(pool(e4))
            e6 = RSU4F(mids[5], outs[5])(pool(e5))

            d5 = RSU4F(mids[6], outs[6])(
                jnp.concatenate([upsample_to(e6, e5), e5], -1)
            )
            d4 = RSU(4, mids[7], outs[7])(
                jnp.concatenate([upsample_to(d5, e4), e4], -1)
            )
            d3 = RSU(5, mids[8], outs[8])(
                jnp.concatenate([upsample_to(d4, e3), e3], -1)
            )
            d2 = RSU(6, mids[9], outs[9])(
                jnp.concatenate([upsample_to(d3, e2), e2], -1)
            )
            d1 = RSU(7, mids[10], outs[10])(
                jnp.concatenate([upsample_to(d2, e1), e1], -1)
            )

            sides = []
            for d in (d1, d2, d3, d4, d5, e6):
                s = nn.Conv(1, (3, 3), padding=1)(d)
                sides.append(upsample_to(s, d1))
            fused = nn.Conv(1, (1, 1))(jnp.concatenate(sides, -1))
            return nn.sigmoid(fused)

    return U2Net


def _models_dir() -> Path:
    return Path(
        os.environ.get(
            "RAPIDRAW_MODELS",
            os.environ.get(
                "RAPIDRAW_MODELS_DIR",
                str(Path.home() / ".cache" / "rapidraw_tpu" / "models"),
            ),
        )
    )


_weights_cache: dict = {}


def _load_variables(filename: str, model_name: str = "U2-Net"):
    """Flat npz {'params/...': arr, 'batch_stats/...': arr} -> nested tree.

    Cached per (path, mtime): interactive masking calls inference per
    click, and re-reading a ~170 MB npz each time dwarfs the forward pass
    (the jitted executables are already cached in _jit_cache — the AiState
    session cache analog, ai_processing.rs:88-95).
    """
    import jax.numpy as jnp

    p = _models_dir() / filename
    if not p.exists():
        raise ModelUnavailable(
            f"{model_name} weights not found at {p}. This build has no "
            "network egress; convert the published checkpoint to a flat npz "
            "and place it there, or set RAPIDRAW_MODELS_DIR."
        )
    key = (str(p), p.stat().st_mtime_ns)
    hit = _weights_cache.get(key)
    if hit is not None:
        # LRU, not FIFO: a batch cycling through SAM enc+dec plus
        # fg/sky/depth (5 weight sets) must not evict the still-hot
        # entry it is about to reuse on the next image
        _weights_cache[key] = _weights_cache.pop(key)
        return hit
    flat = dict(np.load(p))
    tree: dict = {}
    for k, v in flat.items():
        node = tree
        parts = k.split("/")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = jnp.asarray(v)
    if len(_weights_cache) >= 5:  # bound device memory (all five mask nets)
        _weights_cache.pop(next(iter(_weights_cache)))
    _weights_cache[key] = tree
    return tree


_jit_cache: dict = {}


def _saliency(image_planar: np.ndarray, weights_file: str, small: bool) -> np.ndarray:
    """Run U2-Net on planar (3, H, W) float32 [0,1]; returns (H, W) u8.

    Preprocessing matches the reference (ai_processing.rs U2-Net path):
    resize to 320x320, normalize by max then ImageNet mean/std; the fused
    sigmoid output is min-max normalized and scaled to u8 at full res.
    """
    import jax
    import jax.numpy as jnp

    variables = _load_variables(weights_file)
    key = ("u2net", small)
    if key not in _jit_cache:
        model = _u2net()(small=small)

        @jax.jit
        def fwd(vars_, x):
            return model.apply(vars_, x)

        _jit_cache[key] = fwd
    fwd = _jit_cache[key]

    _, h, w = image_planar.shape
    x = jnp.asarray(image_planar)[None]  # (1, 3, H, W)
    x = jax.image.resize(x, (1, 3, U2NET_INPUT, U2NET_INPUT), "bilinear")
    x = x.transpose(0, 2, 3, 1)
    mx = jnp.maximum(jnp.max(x), 1e-6)
    mean = jnp.asarray([0.485, 0.456, 0.406])
    std = jnp.asarray([0.229, 0.224, 0.225])
    x = (x / mx - mean) / std

    pred = fwd(variables, x)[0, :, :, 0]
    pred = jax.image.resize(pred, (h, w), "bilinear")
    lo, hi = jnp.min(pred), jnp.max(pred)
    pred = (pred - lo) / jnp.maximum(hi - lo, 1e-6)
    return np.asarray(jnp.clip(pred * 255.0 + 0.5, 0, 255)).astype(np.uint8)


def generate_foreground_mask(image_planar: np.ndarray) -> np.ndarray:
    """U2-Net foreground saliency (ai_processing.rs:1274-1354). (H, W) u8."""
    return _saliency(image_planar, "u2net.npz", small=False)


def generate_sky_mask(image_planar: np.ndarray) -> np.ndarray:
    """Sky segmentation with the skyseg U2-Net (ai_processing.rs:1193-1272)."""
    return _saliency(image_planar, "skyseg.npz", small=False)


def mask_to_data_url(mask: np.ndarray) -> str:
    """Encode an (H, W) u8 mask as the base64 PNG data URL the adjustment
    schema carries (maskDataBase64), so inferred masks flow through
    masks/parametric.generate_ai_mask exactly like reference-precomputed
    ones."""
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(mask, mode="L").save(buf, format="PNG")
    return "data:image/png;base64," + base64.b64encode(buf.getvalue()).decode()


def save_variables_npz(variables, path) -> None:
    """Flatten a flax variables tree to the flat npz layout _load_variables
    reads ('params/.../kernel' keys) — the conversion target for published
    checkpoints."""
    flat = {}

    def walk(node, prefix):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, f"{prefix}/{k}" if prefix else k)
        else:
            flat[prefix] = np.asarray(node)

    walk(variables, "")
    np.savez(path, **flat)


def precompute_ai_submasks(adjustments: dict, image_planar: np.ndarray) -> dict:
    """Fill missing maskDataBase64 on AI sub-masks by running inference —
    the analog of the reference's precompute commands (ai_commands.rs),
    which embed the mask PNG into the doc so the rasterizer (and the
    frontend patch-dedup cache) can reuse it.

    ai-foreground / quick-eraser -> U2-Net; ai-sky -> skyseg U2-Net;
    ai-depth -> Depth-Anything map; ai-subject -> SAM with the sub-mask's
    startX/endX drag prompt (un-transformed back through
    rotation/flip/orientation like ai_commands.rs:248-317; the SAM
    embeddings are computed once and reused across sub-masks). Returns a
    NEW adjustments dict.
    """
    sam_embeddings = None  # lazy; shared by every ai-subject sub-mask
    memo: dict = {}  # fg/sky/depth are prompt-free: one inference per image
    out = dict(adjustments)
    masks_json = [dict(m) if isinstance(m, dict) else m for m in (out.get("masks") or [])]
    for m in masks_json:
        if not isinstance(m, dict):
            continue
        subs = [dict(s) if isinstance(s, dict) else s for s in (m.get("subMasks") or [])]
        for s in subs:
            if not isinstance(s, dict):
                continue
            params = dict(s.get("parameters") or {})
            if params.get("maskDataBase64"):
                continue
            t = s.get("type")
            if t in ("ai-foreground", "quick-eraser"):
                if "fg" not in memo:
                    memo["fg"] = generate_foreground_mask(image_planar)
                mask = memo["fg"]
            elif t == "ai-sky":
                if "sky" not in memo:
                    memo["sky"] = generate_sky_mask(image_planar)
                mask = memo["sky"]
            elif t == "ai-depth":
                from rapidraw_tpu.ai.depth import generate_depth_map

                if "depth" not in memo:
                    memo["depth"] = generate_depth_map(image_planar)
                mask = memo["depth"]
            elif t == "ai-subject":
                from rapidraw_tpu.ai import sam

                if sam_embeddings is None:
                    sam_embeddings = sam.generate_image_embeddings(image_planar)
                _, ih, iw = image_planar.shape
                sp, ep = sam.unproject_prompt_rect(
                    (float(params.get("startX", 0.0)), float(params.get("startY", 0.0))),
                    (float(params.get("endX", 0.0)), float(params.get("endY", 0.0))),
                    iw, ih,
                    rotation=float(params.get("rotation", 0.0) or 0.0),
                    flip_horizontal=bool(params.get("flipHorizontal", False)),
                    flip_vertical=bool(params.get("flipVertical", False)),
                    orientation_steps=int(params.get("orientationSteps", 0) or 0),
                )
                mask = sam.run_sam_decoder(sam_embeddings, sp, ep)
            else:
                continue
            params["maskDataBase64"] = mask_to_data_url(mask)
            s["parameters"] = params
        m["subMasks"] = subs
    out["masks"] = masks_json
    return out


# ----------------------------------------------- euclidean distance transform
def _edt_1d_sq(f: np.ndarray) -> np.ndarray:
    """Felzenszwalb-Huttenlocher 1D squared distance transform along the
    last axis (vectorized over leading axes per-row loop)."""
    n = f.shape[-1]
    out = np.empty_like(f)
    for idx in np.ndindex(f.shape[:-1]):
        row = f[idx]
        v = np.zeros(n, np.int64)  # parabola locations
        z = np.full(n + 1, 0.0)
        z[0], z[1] = -np.inf, np.inf
        k = 0
        for q in range(1, n):
            s = ((row[q] + q * q) - (row[v[k]] + v[k] * v[k])) / (2 * q - 2 * v[k])
            while s <= z[k]:
                k -= 1
                s = ((row[q] + q * q) - (row[v[k]] + v[k] * v[k])) / (2 * q - 2 * v[k])
            k += 1
            v[k] = q
            z[k] = s
            z[k + 1] = np.inf
        k = 0
        d = np.empty(n)
        for q in range(n):
            while z[k + 1] < q:
                k += 1
            d[q] = (q - v[k]) ** 2 + row[v[k]]
        out[idx] = d
    return out


def euclidean_distance_transform(binary: np.ndarray) -> np.ndarray:
    """Exact euclidean distance (float32) from each zero pixel to the
    nearest non-zero pixel (ai_processing.rs:97-164). Non-zero pixels get 0.
    """
    try:
        from scipy.ndimage import distance_transform_edt

        return distance_transform_edt(binary == 0).astype(np.float32)
    except ImportError:
        inf = 1e12
        f = np.where(binary != 0, 0.0, inf)
        d = _edt_1d_sq(f)
        d = _edt_1d_sq(np.ascontiguousarray(d.T)).T
        return np.sqrt(d).astype(np.float32)


def grow_mask(mask: np.ndarray, pixels: float, threshold: int = 127) -> np.ndarray:
    """Grow (pixels > 0) or shrink (< 0) a u8 mask by a euclidean radius —
    the AI-mask grow op (ai_processing.rs:97-164), distinct from the
    percentage-based dilate/erode in masks/parametric."""
    if pixels == 0:
        return mask
    binary = mask > threshold
    if pixels > 0:
        dist = euclidean_distance_transform(binary.astype(np.uint8))
        return np.where(binary | (dist <= pixels), 255, 0).astype(np.uint8)
    dist = euclidean_distance_transform((~binary).astype(np.uint8))
    return np.where(binary & (dist > -pixels), 255, 0).astype(np.uint8)
