"""Monocular depth estimation: Depth-Anything-v2 ViT-S (DINOv2 + DPT) in flax.

The reference runs depth_anything_v2_vits.onnx (ai_processing.rs:1355-1510)
to produce the relative-depth map consumed by the depth band-pass mask
(mask_generation.rs:906-968 == masks/parametric.generate_ai_depth). Here
the network is defined natively; parameters load from a local npz
(depth_anything_v2_vits.npz in RAPIDRAW_MODELS) — ModelUnavailable
otherwise, matching the registry behavior in ai/models.py.

Structure (Yang et al., "Depth Anything V2", 2024; backbone DINOv2 ViT-S),
cross-validated numerically against the independent HuggingFace
`transformers` implementation (tests/test_ai_crossval.py):
  * patch-14 embedding, cls token, learned position embeddings, 12
    transformer blocks (6 heads, dim 384, LayerScale), features tapped
    after blocks (2, 5, 8, 11), each tap normalized by the backbone's ONE
    shared final LayerNorm (DINOv2 `get_intermediate_layers(norm=True)`);
  * DPT reassemble: per-tap 1x1 projection to (48, 96, 192, 384) channels
    then a LEARNED resample — ConvTranspose k4/s4, ConvTranspose k2/s2,
    identity, Conv k3/s2/p1 — followed by a bias-free 3x3 to the fusion
    width (64);
  * refinenet fusion with pre-activation residual units, upsampling to the
    next tap's grid with align_corners=True bilinear, 1x1 projection;
  * head: 3x3 conv to 32, align-corners upsample to patch_grid*14, 3x3
    conv + ReLU, 1x1 conv + ReLU; min-max normalized to [0, 1].
"""

from __future__ import annotations

import numpy as np

from rapidraw_tpu.ai.masks import _load_variables, mask_to_data_url  # noqa: F401

DEPTH_INPUT = 518  # 37 * 14: Depth-Anything-v2 default inference size
_TAPS = (2, 5, 8, 11)


def _ac_weights(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) bilinear interpolation matrix with align_corners=True
    semantics (torch F.interpolate(..., align_corners=True)): output i
    samples input at i*(n_in-1)/(n_out-1)."""
    A = np.zeros((n_out, n_in), np.float32)
    if n_out == 1 or n_in == 1:
        A[:, 0] = 1.0
        return A
    pos = np.arange(n_out, dtype=np.float64) * (n_in - 1) / (n_out - 1)
    i0 = np.clip(np.floor(pos).astype(np.int64), 0, n_in - 2)
    f = pos - i0
    A[np.arange(n_out), i0] = (1.0 - f).astype(np.float32)
    A[np.arange(n_out), i0 + 1] += f.astype(np.float32)
    return A


def _resize_ac(x, nh: int, nw: int):
    """NHWC bilinear resize with align_corners=True, as two small matmuls
    (interpolation matrices are trace-time constants — MXU-friendly)."""
    import jax.numpy as jnp

    _, h, w, _ = x.shape
    if (h, w) == (nh, nw):
        return x
    Ah = jnp.asarray(_ac_weights(h, nh))
    Aw = jnp.asarray(_ac_weights(w, nw))
    x = jnp.einsum("oh,bhwc->bowc", Ah, x)
    return jnp.einsum("ow,bhwc->bhoc", Aw, x)


def _depth_model():
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    EMBED, HEADS, LAYERS = 384, 6, 12
    DPT_FEAT = 64
    DPT_CH = (48, 96, 192, 384)

    class Block(nn.Module):
        @nn.compact
        def __call__(self, x):  # (B, N, C)
            h = nn.LayerNorm()(x)
            h = nn.MultiHeadDotProductAttention(num_heads=HEADS)(h, h)
            ls1 = self.param("ls1", nn.initializers.ones, (EMBED,))
            x = x + h * ls1
            h = nn.LayerNorm()(x)
            h = nn.Dense(EMBED * 4)(h)
            h = nn.gelu(h)
            h = nn.Dense(EMBED)(h)
            ls2 = self.param("ls2", nn.initializers.ones, (EMBED,))
            return x + h * ls2

    class ResidualUnit(nn.Module):
        """DPT pre-activation residual conv unit: relu-conv-relu-conv + x."""

        @nn.compact
        def __call__(self, x):
            r = nn.relu(x)
            r = nn.Conv(DPT_FEAT, (3, 3), name="conv1")(r)
            r = nn.relu(r)
            r = nn.Conv(DPT_FEAT, (3, 3), name="conv2")(r)
            return x + r

    class FeatureFusion(nn.Module):
        """DPT refinenet block (DepthAnythingFeatureFusionLayer): optional
        skip through residual unit 1, residual unit 2, align-corners
        upsample to `out_size` (or 2x), 1x1 projection."""

        @nn.compact
        def __call__(self, x, skip=None, out_size=None):
            if skip is not None:
                if x.shape[1:3] != skip.shape[1:3]:
                    # the reference resizes the RESIDUAL onto the fused grid
                    # (align_corners=False) on mismatch
                    skip = jax.image.resize(
                        skip, (skip.shape[0], x.shape[1], x.shape[2], skip.shape[3]),
                        "bilinear",
                    )
                x = x + ResidualUnit(name="rcu1")(skip)
            x = ResidualUnit(name="rcu2")(x)
            nh, nw = out_size if out_size is not None else (
                x.shape[1] * 2, x.shape[2] * 2
            )
            x = _resize_ac(x, nh, nw)
            return nn.Conv(DPT_FEAT, (1, 1), name="project")(x)

    class DepthAnythingV2S(nn.Module):
        @nn.compact
        def __call__(self, x):  # (B, H, W, 3), H=W=518 -> (B, H, W)
            B, H, W, _ = x.shape
            gh, gw = H // 14, W // 14
            # patch embed
            t = nn.Conv(EMBED, (14, 14), strides=(14, 14), name="patch_embed")(x)
            t = t.reshape(B, gh * gw, EMBED)
            cls = self.param("cls_token", nn.initializers.zeros, (1, 1, EMBED))
            pos = self.param(
                "pos_embed", nn.initializers.zeros, (1, gh * gw + 1, EMBED)
            )
            t = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, EMBED)), t], 1) + pos

            # ONE shared final LayerNorm applied to every tap, like DINOv2's
            # get_intermediate_layers(norm=True)
            norm = nn.LayerNorm(name="norm")
            feats = []
            for i in range(LAYERS):
                t = Block(name=f"block{i}")(t)
                if i in _TAPS:
                    feats.append(norm(t))

            # DPT reassemble: tokens -> grid -> learned resample pyramid
            pyramid = []
            for i, (f, ch) in enumerate(zip(feats, DPT_CH)):
                g = f[:, 1:, :].reshape(B, gh, gw, EMBED)
                g = nn.Conv(ch, (1, 1), name=f"proj{i}")(g)
                if i == 0:  # 4x up (auto name ConvTranspose_0: the
                    # converter keys its weight layout on the class name)
                    g = nn.ConvTranspose(ch, (4, 4), strides=(4, 4))(g)
                elif i == 1:  # 2x up (auto name ConvTranspose_1)
                    g = nn.ConvTranspose(ch, (2, 2), strides=(2, 2))(g)
                elif i == 3:  # 2x down: Conv k3 s2 p1
                    g = nn.Conv(
                        ch, (3, 3), strides=(2, 2), padding=1, name="resize3"
                    )(g)
                g = nn.Conv(
                    DPT_FEAT, (3, 3), use_bias=False, name=f"layer_rn{i}"
                )(g)
                pyramid.append(g)

            p1, p2, p3, p4 = pyramid  # 4x, 2x, 1x, 0.5x of the 1/14 grid
            y = FeatureFusion(name="fusion4")(p4, out_size=p3.shape[1:3])
            y = FeatureFusion(name="fusion3")(y, p3, out_size=p2.shape[1:3])
            y = FeatureFusion(name="fusion2")(y, p2, out_size=p1.shape[1:3])
            y = FeatureFusion(name="fusion1")(y, p1)  # final: plain 2x

            y = nn.Conv(DPT_FEAT // 2, (3, 3), name="head1")(y)
            y = _resize_ac(y, gh * 14, gw * 14)
            y = nn.relu(nn.Conv(32, (3, 3), name="head2")(y))
            y = nn.relu(nn.Conv(1, (1, 1), name="head3")(y))
            return y[..., 0]

    return DepthAnythingV2S


_jit_cache: dict = {}


def generate_depth_map(image_planar: np.ndarray) -> np.ndarray:
    """Relative depth for planar (3, H, W) f32 [0,1] -> (H, W) u8 where 255
    is NEAR (matching the band-pass semantics in generate_ai_depth)."""
    import jax
    import jax.numpy as jnp

    variables = _load_variables("depth_anything_v2_vits.npz", model_name="Depth-Anything-v2-ViT-S")
    if "depth" not in _jit_cache:
        model = _depth_model()()

        @jax.jit
        def fwd(vars_, x):
            return model.apply(vars_, x)

        _jit_cache["depth"] = fwd
    fwd = _jit_cache["depth"]

    _, h, w = image_planar.shape
    x = jnp.asarray(image_planar)[None]
    x = jax.image.resize(x, (1, 3, DEPTH_INPUT, DEPTH_INPUT), "bilinear")
    x = x.transpose(0, 2, 3, 1)
    mean = jnp.asarray([0.485, 0.456, 0.406])
    std = jnp.asarray([0.229, 0.224, 0.225])
    x = (x - mean) / std

    depth = fwd(variables, x)[0]
    depth = jax.image.resize(depth, (h, w), "bilinear")
    lo, hi = jnp.min(depth), jnp.max(depth)
    depth = (depth - lo) / jnp.maximum(hi - lo, 1e-6)
    return np.asarray(jnp.clip(depth * 255.0 + 0.5, 0, 255)).astype(np.uint8)
