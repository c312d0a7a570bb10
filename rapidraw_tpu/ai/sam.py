"""Segment-Anything (SAM ViT-B) subject masks in flax.

The reference ships SAM as two ONNX sessions — encoder + prompt decoder —
driven by click/drag prompts (ai_processing.rs:918-1062: 1024-long-side
resize, u8 NCHW encoder input, 2-iteration decoder loop feeding the
low-res mask back, final mask thresholded at 0). onnxruntime does not
exist in this environment, so the network is defined natively (flax) from
the published architecture (Kirillov et al., "Segment Anything", 2023):

  * image encoder: ViT-B/16 — 12 blocks, dim 768, 12 heads, 14x14
    windowed attention with global attention at blocks {2, 5, 8, 11},
    decomposed relative position bias, absolute pos embed, conv neck to
    a (256, 64, 64) embedding;
  * prompt encoder: random-Fourier positional encoding, per-label point
    embeddings (neg / pos / box-corner-1 / box-corner-2), a no-mask
    embedding, and a small conv net for dense (mask) prompts;
  * mask decoder: IoU + 4 mask tokens, a depth-2 two-way transformer
    (token self-attn, token->image and image->token cross-attn with
    128-dim attention downsampling), 4x transposed-conv upscaling, and
    per-token hypernetwork MLPs.

Weights load from local `sam_vit_b_encoder.npz` / `sam_vit_b_decoder.npz`
in RAPIDRAW_MODELS (flat
`params/...` keys, see ai/masks.save_variables_npz) — `ModelUnavailable`
otherwise, exactly like the U2-Net / depth ports.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from rapidraw_tpu.ai.masks import _load_variables

SAM_INPUT = 1024  # encoder square side (ai_processing.rs:25)
_PATCH = 16
_EMBED = 768
_HEADS = 12
_LAYERS = 12
_WINDOW = 14
_GLOBAL = (2, 5, 8, 11)
_PROMPT_DIM = 256


def _models():
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    head_dim = _EMBED // _HEADS

    class LayerNorm2d(nn.Module):
        """Channel-wise LN over NHWC feature maps (SAM's LayerNorm2d)."""

        @nn.compact
        def __call__(self, x):
            w = self.param("weight", nn.initializers.ones, (x.shape[-1],))
            b = self.param("bias", nn.initializers.zeros, (x.shape[-1],))
            mu = x.mean(-1, keepdims=True)
            var = ((x - mu) ** 2).mean(-1, keepdims=True)
            return (x - mu) / jnp.sqrt(var + 1e-6) * w + b

        # eps matches segment_anything/modeling/common.py

    def _rel_bias(q, rel_h, rel_w, h, w):
        """Decomposed relative position: attn += q·Rh + q·Rw, with the
        (2s-1)-row tables indexed by coordinate difference."""
        # q: (B*, h*w, head_dim) per head handled by caller via einsum
        idx = np.arange(h)[:, None] - np.arange(h)[None, :] + (h - 1)
        Rh = rel_h[idx]  # (h, h, head_dim)
        idxw = np.arange(w)[:, None] - np.arange(w)[None, :] + (w - 1)
        Rw = rel_w[idxw]  # (w, w, head_dim)
        r = q.reshape(*q.shape[:-2], h, w, q.shape[-1])
        bh = jnp.einsum("...hwc,hkc->...hwk", r, Rh)
        bw = jnp.einsum("...hwc,wkc->...hwk", r, Rw)
        return (bh[..., :, :, :, None] + bw[..., :, None, :]).reshape(
            *q.shape[:-2], h * w, h * w
        )

    class Attention(nn.Module):
        rel_size: int  # spatial side for the rel-pos tables

        @nn.compact
        def __call__(self, x, h, w):  # (B, N=h*w, C)
            B, N, C = x.shape
            qkv = nn.Dense(3 * C, name="qkv")(x)
            qkv = qkv.reshape(B, N, 3, _HEADS, head_dim).transpose(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]  # (B, heads, N, hd)
            attn = (q * head_dim**-0.5) @ k.transpose(0, 1, 3, 2)
            s = self.rel_size
            rel_h = self.param(
                "rel_pos_h", nn.initializers.zeros, (2 * s - 1, head_dim)
            )
            rel_w = self.param(
                "rel_pos_w", nn.initializers.zeros, (2 * s - 1, head_dim)
            )
            attn = attn + _rel_bias(q, rel_h[: 2 * h - 1], rel_w[: 2 * w - 1], h, w)
            attn = jax.nn.softmax(attn, axis=-1)
            out = (attn @ v).transpose(0, 2, 1, 3).reshape(B, N, C)
            return nn.Dense(C, name="proj")(out)

    class Block(nn.Module):
        windowed: bool

        @nn.compact
        def __call__(self, x):  # (B, H, W, C)
            B, H, W, C = x.shape
            shortcut = x
            x = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
            if self.windowed:
                ws = min(_WINDOW, max(H, W))
                ph, pw = (-H) % ws, (-W) % ws
                xp = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
                Hp, Wp = H + ph, W + pw
                win = xp.reshape(B, Hp // ws, ws, Wp // ws, ws, C)
                win = win.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, C)
                win = Attention(rel_size=ws, name="attn")(win, ws, ws)
                win = win.reshape(B, Hp // ws, Wp // ws, ws, ws, C)
                xp = win.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, C)
                x = xp[:, :H, :W]
            else:
                x = Attention(rel_size=max(H, W), name="attn")(
                    x.reshape(B, H * W, C), H, W
                ).reshape(B, H, W, C)
            x = shortcut + x
            h = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
            h = nn.Dense(4 * C, name="mlp_lin1")(h)
            h = nn.gelu(h)
            h = nn.Dense(C, name="mlp_lin2")(h)
            return x + h

    class SamEncoder(nn.Module):
        """(B, S, S, 3) normalized pixels -> (B, S/16, S/16, 256)."""

        @nn.compact
        def __call__(self, x):
            g = x.shape[1] // _PATCH
            x = nn.Conv(
                _EMBED, (_PATCH, _PATCH), strides=(_PATCH, _PATCH),
                name="patch_embed",
            )(x)
            pos = self.param("pos_embed", nn.initializers.zeros, (1, g, g, _EMBED))
            x = x + pos
            for i in range(_LAYERS):
                x = Block(windowed=i not in _GLOBAL, name=f"block{i}")(x)
            x = nn.Conv(_PROMPT_DIM, (1, 1), use_bias=False, name="neck0")(x)
            x = LayerNorm2d(name="neck1")(x)
            x = nn.Conv(
                _PROMPT_DIM, (3, 3), padding=1, use_bias=False, name="neck2"
            )(x)
            return LayerNorm2d(name="neck3")(x)

    class DecoderAttention(nn.Module):
        """Plain multi-head attention with optional internal downsampling
        (the two-way transformer's 128-dim cross-attention)."""

        heads: int
        down: int = 1

        @nn.compact
        def __call__(self, q, k, v):
            dim = q.shape[-1]
            inner = dim // self.down
            hd = inner // self.heads

            def split(t):
                return t.reshape(*t.shape[:-1], self.heads, hd).swapaxes(-2, -3)

            qh = split(nn.Dense(inner, name="q")(q))
            kh = split(nn.Dense(inner, name="k")(k))
            vh = split(nn.Dense(inner, name="v")(v))
            attn = jax.nn.softmax((qh * hd**-0.5) @ kh.swapaxes(-1, -2), -1)
            out = (attn @ vh).swapaxes(-2, -3)
            out = out.reshape(*out.shape[:-2], inner)
            return nn.Dense(dim, name="out")(out)

    class TwoWayBlock(nn.Module):
        skip_first_pe: bool

        @nn.compact
        def __call__(self, queries, keys, query_pe, key_pe):
            if self.skip_first_pe:
                queries = DecoderAttention(8, name="self_attn")(
                    queries, queries, queries
                )
            else:
                q = queries + query_pe
                queries = queries + DecoderAttention(8, name="self_attn")(
                    q, q, queries
                )
            queries = nn.LayerNorm(name="norm1")(queries)

            q = queries + query_pe
            k = keys + key_pe
            queries = queries + DecoderAttention(8, 2, name="cross_t2i")(q, k, keys)
            queries = nn.LayerNorm(name="norm2")(queries)

            h = nn.Dense(2048, name="mlp_lin1")(queries)
            queries = queries + nn.Dense(_PROMPT_DIM, name="mlp_lin2")(nn.relu(h))
            queries = nn.LayerNorm(name="norm3")(queries)

            q = queries + query_pe
            k = keys + key_pe
            keys = keys + DecoderAttention(8, 2, name="cross_i2t")(k, q, queries)
            keys = nn.LayerNorm(name="norm4")(keys)
            return queries, keys

    class MLP3(nn.Module):
        out: int

        @nn.compact
        def __call__(self, x):
            x = nn.relu(nn.Dense(_PROMPT_DIM, name="lin0")(x))
            x = nn.relu(nn.Dense(_PROMPT_DIM, name="lin1")(x))
            return nn.Dense(self.out, name="lin2")(x)

    class SamDecoder(nn.Module):
        """Prompt encoder + mask decoder.

        Inputs:
          emb        (B, g, g, 256)  image embedding from SamEncoder
          coords     (B, P, 2)       prompt points in SAM_INPUT pixel space
          labels     (B, P)          -1 pad / 0 neg / 1 pos / 2,3 box corners
          mask_in    (B, 4g, 4g, 1)  previous low-res mask logits
          has_mask   ()              0.0 or 1.0
        Returns (masks (B, 4, 4g, 4g) logits, iou (B, 4)).
        """

        @nn.compact
        def __call__(self, emb, coords, labels, mask_in, has_mask):
            B, g = emb.shape[0], emb.shape[1]

            # --- prompt encoder ---
            gauss = self.param(
                "pe_gaussian", nn.initializers.normal(1.0), (2, _PROMPT_DIM // 2)
            )

            def pe_encode(c):  # c in [0,1] -> (..., 256)
                proj = (2.0 * c - 1.0) @ gauss * (2.0 * np.pi)
                return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], -1)

            # dense PE over the embedding grid (pixel centers)
            gy = (jnp.arange(g, dtype=jnp.float32) + 0.5) / g
            grid = jnp.stack(
                jnp.meshgrid(gy, gy, indexing="ij"), -1
            )[..., ::-1]  # (g, g, 2) as (x, y)
            image_pe = pe_encode(grid)[None]  # (1, g, g, 256)

            pt_emb = self.param(
                "point_embeddings", nn.initializers.normal(1.0), (4, _PROMPT_DIM)
            )
            not_a_point = self.param(
                "not_a_point_embed", nn.initializers.normal(1.0), (_PROMPT_DIM,)
            )
            no_mask = self.param(
                "no_mask_embed", nn.initializers.normal(1.0), (_PROMPT_DIM,)
            )

            c = (coords + 0.5) / float(SAM_INPUT)
            sparse = pe_encode(c)  # (B, P, 256)
            lab = labels[..., None]
            sparse = jnp.where(lab == -1, not_a_point, sparse)
            for i in range(4):
                sparse = sparse + jnp.where(lab == i, pt_emb[i], 0.0)

            m = nn.Conv(4, (2, 2), strides=(2, 2), name="mask_down0")(mask_in)
            m = nn.gelu(LayerNorm2d(name="mask_ln0")(m))
            m = nn.Conv(16, (2, 2), strides=(2, 2), name="mask_down1")(m)
            m = nn.gelu(LayerNorm2d(name="mask_ln1")(m))
            m = nn.Conv(_PROMPT_DIM, (1, 1), name="mask_down2")(m)
            dense = has_mask * m + (1.0 - has_mask) * no_mask

            # --- mask decoder ---
            iou_token = self.param(
                "iou_token", nn.initializers.normal(1.0), (1, _PROMPT_DIM)
            )
            mask_tokens = self.param(
                "mask_tokens", nn.initializers.normal(1.0), (4, _PROMPT_DIM)
            )
            tokens = jnp.concatenate(
                [
                    jnp.broadcast_to(iou_token, (B, 1, _PROMPT_DIM)),
                    jnp.broadcast_to(mask_tokens, (B, 4, _PROMPT_DIM)),
                    sparse,
                ],
                axis=1,
            )

            src = (emb + dense).reshape(B, g * g, _PROMPT_DIM)
            pos_src = jnp.broadcast_to(
                image_pe.reshape(1, g * g, _PROMPT_DIM), src.shape
            )
            q, k = tokens, src
            q, k = TwoWayBlock(skip_first_pe=True, name="layer0")(
                q, k, tokens, pos_src
            )
            q, k = TwoWayBlock(skip_first_pe=False, name="layer1")(
                q, k, tokens, pos_src
            )
            q = q + DecoderAttention(8, 2, name="final_t2i")(
                q + tokens, k + pos_src, k
            )
            q = nn.LayerNorm(name="final_norm")(q)

            iou_out = MLP3(4, name="iou_head")(q[:, 0])
            mtok = q[:, 1:5]  # (B, 4, 256)

            up = k.reshape(B, g, g, _PROMPT_DIM)
            up = nn.ConvTranspose(
                _PROMPT_DIM // 4, (2, 2), strides=(2, 2), name="upscale0"
            )(up)
            up = nn.gelu(LayerNorm2d(name="upscale_ln")(up))
            up = nn.ConvTranspose(
                _PROMPT_DIM // 8, (2, 2), strides=(2, 2), name="upscale1"
            )(up)
            up = nn.gelu(up)  # (B, 4g, 4g, 32)

            hyper = jnp.stack(
                [
                    MLP3(_PROMPT_DIM // 8, name=f"hyper{i}")(mtok[:, i])
                    for i in range(4)
                ],
                axis=1,
            )  # (B, 4, 32)
            masks = jnp.einsum("bkc,bhwc->bkhw", hyper, up)
            return masks, iou_out

    return SamEncoder, SamDecoder


@dataclass
class ImageEmbeddings:
    """Mirror of ai_processing.rs ImageEmbeddings: the cached encoder
    output keyed by image, reused across decoder clicks."""

    embeddings: np.ndarray  # (1, g, g, 256) NHWC
    original_size: tuple  # (width, height)


_jit_cache: dict = {}


def _encoder_fwd():
    import jax

    if "enc" not in _jit_cache:
        SamEncoder, _ = _models()
        model = SamEncoder()

        @jax.jit
        def fwd(vars_, x):
            return model.apply(vars_, x)

        _jit_cache["enc"] = fwd
    return _jit_cache["enc"]


def _decoder_fwd():
    import jax

    if "dec" not in _jit_cache:
        _, SamDecoder = _models()
        model = SamDecoder()

        @jax.jit
        def fwd(vars_, emb, coords, labels, mask_in, has_mask):
            return model.apply(vars_, emb, coords, labels, mask_in, has_mask)

        _jit_cache["dec"] = fwd
    return _jit_cache["dec"]


def generate_image_embeddings(image_planar: np.ndarray) -> ImageEmbeddings:
    """Encode planar (3, H, W) f32 [0,1] -> cached SAM embeddings.

    Matches generate_image_embeddings (ai_processing.rs:918-960): resize so
    the long side is SAM_INPUT, zero-pad bottom/right to the square, then
    the standard SAM pixel normalization (the ONNX encoder bakes it in;
    here it is explicit: x*255 minus ImageNet mean/std in pixel units).
    """
    import jax
    import jax.numpy as jnp

    variables = _load_variables("sam_vit_b_encoder.npz", model_name="SAM ViT-B encoder")
    _, h, w = image_planar.shape
    scale = SAM_INPUT / max(h, w)
    nh, nw = round(h * scale), round(w * scale)

    x = jnp.asarray(image_planar)[None]
    x = jax.image.resize(x, (1, 3, nh, nw), "bilinear")
    x = jnp.pad(x, ((0, 0), (0, 0), (0, SAM_INPUT - nh), (0, SAM_INPUT - nw)))
    x = x.transpose(0, 2, 3, 1) * 255.0
    mean = jnp.asarray([123.675, 116.28, 103.53])
    std = jnp.asarray([58.395, 57.12, 57.375])
    emb = _encoder_fwd()(variables, (x - mean) / std)
    return ImageEmbeddings(embeddings=np.asarray(emb), original_size=(w, h))


def run_sam_decoder(
    emb: ImageEmbeddings,
    start_point: tuple,
    end_point: tuple,
    iters: int = 2,
) -> np.ndarray:
    """Click/drag prompt -> (H, W) u8 {0,255} mask.

    Mirrors run_sam_decoder (ai_processing.rs:962-1062): a degenerate drag
    is a single positive point, otherwise the two corners become box
    prompts (labels 2/3); the decoder runs `iters` times feeding the
    low-res mask logits back (has_mask=1 after the first pass); the final
    mask is thresholded at 0 and resized to the original image.
    """
    import jax
    import jax.numpy as jnp

    variables = _load_variables("sam_vit_b_decoder.npz", model_name="SAM ViT-B decoder")
    w, h = emb.original_size
    scale = SAM_INPUT / max(h, w)

    sx, sy = start_point
    ex, ey = end_point
    if abs(sx - ex) < 1e-6 and abs(sy - ey) < 1e-6:
        coords = [(sx * scale, sy * scale), (0.0, 0.0)]
        labels = [1.0, -1.0]  # pad point, per the published ONNX contract
    else:
        x1, x2 = sorted((sx * scale, ex * scale))
        y1, y2 = sorted((sy * scale, ey * scale))
        coords = [(x1, y1), (x2, y2)]
        labels = [2.0, 3.0]

    e = jnp.asarray(emb.embeddings)
    g = e.shape[1]
    coords_a = jnp.asarray([coords], jnp.float32)
    labels_a = jnp.asarray([labels], jnp.float32)
    mask_in = jnp.zeros((1, 4 * g, 4 * g, 1), jnp.float32)
    has_mask = jnp.float32(0.0)

    fwd = _decoder_fwd()
    best = None
    for _ in range(max(1, iters)):
        masks, iou = fwd(variables, e, coords_a, labels_a, mask_in, has_mask)
        # multimask tokens are 1..3; token 0 is the single-mask output
        pick = 1 + jnp.argmax(iou[0, 1:])
        best = masks[0, pick]
        mask_in = best[None, :, :, None]
        has_mask = jnp.float32(1.0)

    # low-res logits -> SAM square -> un-pad -> original size (the ONNX
    # model's mask_postprocessing)
    full = jax.image.resize(best, (SAM_INPUT, SAM_INPUT), "bilinear")
    nh, nw = round(h * scale), round(w * scale)
    full = jax.image.resize(full[:nh, :nw], (h, w), "bilinear")
    return np.asarray((full > 0.0)).astype(np.uint8) * 255


def unproject_prompt_rect(
    start_point: tuple,
    end_point: tuple,
    img_w: float,
    img_h: float,
    rotation: float = 0.0,
    flip_horizontal: bool = False,
    flip_vertical: bool = False,
    orientation_steps: int = 0,
) -> tuple:
    """Map a prompt rectangle from TRANSFORMED display space back to the
    un-transformed image the embeddings were computed on — the corner
    un-rotate / un-flip / un-coarse-rotate + bbox of
    generate_ai_subject_mask (ai_commands.rs:248-317). Returns
    ((min_x, min_y), (max_x, max_y))."""
    if orientation_steps % 2 == 1:
        crw, crh = float(img_h), float(img_w)
    else:
        crw, crh = float(img_w), float(img_h)
    cx, cy = crw / 2.0, crh / 2.0
    a = np.radians(rotation)
    ca, sa = np.cos(a), np.sin(a)

    corners = [
        start_point,
        (start_point[0], end_point[1]),
        end_point,
        (end_point[0], start_point[1]),
    ]

    out = []
    for px, py in corners:
        dx, dy = px - cx, py - cy
        ux = dx * ca + dy * sa + cx
        uy = -dx * sa + dy * ca + cy
        if flip_horizontal:
            ux = crw - ux
        if flip_vertical:
            uy = crh - uy
        if orientation_steps == 1:
            ux, uy = uy, img_h - ux
        elif orientation_steps == 2:
            ux, uy = img_w - ux, img_h - uy
        elif orientation_steps == 3:
            ux, uy = img_w - uy, ux
        out.append((ux, uy))

    xs = [p[0] for p in out]
    ys = [p[1] for p in out]
    return (min(xs), min(ys)), (max(xs), max(ys))
