"""Monocular depth estimation: Depth-Anything-v2 ViT-S (DINOv2 + DPT) in flax.

The reference runs depth_anything_v2_vits.onnx (ai_processing.rs:1355-1510)
to produce the relative-depth map consumed by the depth band-pass mask
(mask_generation.rs:906-968 == masks/parametric.generate_ai_depth). Here
the network is defined natively; parameters load from a local npz
(depth_anything_v2_vits.npz in RAPIDRAW_MODELS) — ModelUnavailable
otherwise, matching the registry behavior in ai/models.py.

Structure (Yang et al., "Depth Anything V2", 2024; backbone DINOv2 ViT-S):
patch-14 embedding at 518x518, 12 transformer blocks (6 heads, dim 384,
LayerScale), features tapped at blocks [2, 5, 8, 11], DPT head: per-tap
projection + resample to scales {4, 8, 16, 32}, refinenet fusion, 2-conv
depth head with ReLU output, min-max normalized to [0, 1].
"""

from __future__ import annotations

import numpy as np

from rapidraw_tpu.ai.masks import _load_variables, mask_to_data_url  # noqa: F401

DEPTH_INPUT = 518  # 37 * 14: Depth-Anything-v2 default inference size
_TAPS = (2, 5, 8, 11)


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

    class FeatureFusion(nn.Module):
        """DPT refinenet block: residual conv units + upsample + project."""

        @nn.compact
        def __call__(self, x, skip=None):
            act = nn.relu
            if skip is not None:
                # pyramid levels from int(gh*s) can differ by a pixel from
                # a clean 2x chain; resize onto the skip's grid first
                if x.shape[1:3] != skip.shape[1:3]:
                    x = jax.image.resize(
                        x, (x.shape[0], skip.shape[1], skip.shape[2], x.shape[3]),
                        "bilinear",
                    )
                r = act(nn.Conv(DPT_FEAT, (3, 3))(act(skip)))
                r = nn.Conv(DPT_FEAT, (3, 3))(r)
                x = x + (skip + r)
            r = act(nn.Conv(DPT_FEAT, (3, 3))(act(x)))
            r = nn.Conv(DPT_FEAT, (3, 3))(r)
            x = x + r
            x = jax.image.resize(
                x, (x.shape[0], x.shape[1] * 2, x.shape[2] * 2, x.shape[3]),
                "bilinear",
            )
            return nn.Conv(DPT_FEAT, (1, 1))(x)

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

            feats = []
            for i in range(LAYERS):
                t = Block(name=f"block{i}")(t)
                if i in _TAPS:
                    feats.append(nn.LayerNorm(name=f"tapnorm{len(feats)}")(t))

            # DPT reassemble: tokens -> (B, gh, gw, C_i) -> scale pyramid
            pyramid = []
            scales = (4.0, 2.0, 1.0, 0.5)  # relative to the 1/14 grid
            for i, (f, ch, s) in enumerate(zip(feats, DPT_CH, scales)):
                g = f[:, 1:, :].reshape(B, gh, gw, EMBED)
                g = nn.Conv(ch, (1, 1), name=f"proj{i}")(g)
                nh, nw = int(gh * s), int(gw * s)
                g = jax.image.resize(g, (B, nh, nw, ch), "bilinear")
                g = nn.Conv(DPT_FEAT, (3, 3), name=f"layer_rn{i}")(g)
                pyramid.append(g)

            p1, p2, p3, p4 = pyramid  # 1/3.5, 1/7, 1/14, 1/28 of input
            y = FeatureFusion(name="fusion4")(p4)
            y = FeatureFusion(name="fusion3")(y, p3)
            y = FeatureFusion(name="fusion2")(y, p2)
            y = FeatureFusion(name="fusion1")(y, p1)

            y = nn.Conv(DPT_FEAT // 2, (3, 3), name="head1")(y)
            y = jax.image.resize(y, (B, H, W, y.shape[3]), "bilinear")
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
