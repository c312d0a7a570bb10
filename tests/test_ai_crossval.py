"""Architectural cross-validation of the flax AI ports against the
INDEPENDENT HuggingFace `transformers` implementations.

The published checkpoints are unreachable here (zero egress), so weight
parity is pinned by the vendored-golden harness (test_ai_vendored.py).
This file closes the other half of the parity question: the flax module
MATH is validated against a second, independently written implementation
of the published architecture (transformers' SAM reproduces Meta's
segment-anything outputs) — same random weights in, near-identical
activations out. Together: converter+numerics pinned by goldens, and the
architecture pinned against an external reference implementation.

Reference behavior being matched: ai_processing.rs:918-1192 runs the SAM
ViT-B encoder/decoder ONNX graphs exported from the same architecture.
"""

from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _dense(sd, name):
    return {"kernel": sd[f"{name}.weight"].T, "bias": sd[f"{name}.bias"]}


def _ln(sd, name, flax_names=("scale", "bias")):
    return {flax_names[0]: sd[f"{name}.weight"], flax_names[1]: sd[f"{name}.bias"]}


def _conv(sd, name):
    return {"kernel": sd[f"{name}.weight"].transpose(2, 3, 1, 0),
            "bias": sd[f"{name}.bias"]}


def _convT(sd, name):
    # torch (in, out, kh, kw) -> flax (kh, kw, in, out) + spatial flip
    return {"kernel": sd[f"{name}.weight"][:, :, ::-1, ::-1].transpose(2, 3, 0, 1).copy(),
            "bias": sd[f"{name}.bias"]}


def test_depth_anything_v2_matches_transformers():
    """flax DepthAnythingV2S == transformers DepthAnythingForDepthEstimation
    (DINOv2-S backbone + DPT neck/head), same random weights: validates the
    shared tap LayerNorm, the LEARNED reassemble resample layers
    (ConvTranspose 4x/2x, strided-conv 0.5x), the pre-act residual fusion
    and the align_corners=True upsampling chain."""
    import jax.numpy as jnp

    from transformers import (
        DepthAnythingConfig,
        DepthAnythingForDepthEstimation,
        Dinov2Config,
    )

    from rapidraw_tpu.ai import depth as depth_mod

    size = 266  # 19x19 patches: CPU-fast, still exercises every stage
    bb = Dinov2Config(
        image_size=size, patch_size=14, hidden_size=384, num_hidden_layers=12,
        num_attention_heads=6, out_indices=[3, 6, 9, 12],
        apply_layernorm=True, reshape_hidden_states=False,
    )
    cfg = DepthAnythingConfig(
        backbone_config=bb, fusion_hidden_size=64,
        neck_hidden_sizes=[48, 96, 192, 384], head_hidden_size=32,
        head_in_index=-1, patch_size=14, max_depth=1,
    )
    torch.manual_seed(0)
    model = DepthAnythingForDepthEstimation(cfg).eval()
    sd = {k: t.detach().numpy() for k, t in model.state_dict().items()}

    heads, hd = 6, 64
    params = {
        "cls_token": sd["backbone.embeddings.cls_token"],
        "pos_embed": sd["backbone.embeddings.position_embeddings"],
        "patch_embed": _conv(sd, "backbone.embeddings.patch_embeddings.projection"),
        "norm": _ln(sd, "backbone.layernorm"),
        "head1": _conv(sd, "head.conv1"),
        "head2": _conv(sd, "head.conv2"),
        "head3": _conv(sd, "head.conv3"),
    }
    for i in range(12):
        t = f"backbone.encoder.layer.{i}"
        att = f"{t}.attention"
        params[f"block{i}"] = {
            "LayerNorm_0": _ln(sd, f"{t}.norm1"),
            "LayerNorm_1": _ln(sd, f"{t}.norm2"),
            "ls1": sd[f"{t}.layer_scale1.lambda1"],
            "ls2": sd[f"{t}.layer_scale2.lambda1"],
            "MultiHeadDotProductAttention_0": {
                "query": {
                    "kernel": sd[f"{att}.attention.query.weight"].T.reshape(384, heads, hd),
                    "bias": sd[f"{att}.attention.query.bias"].reshape(heads, hd),
                },
                "key": {
                    "kernel": sd[f"{att}.attention.key.weight"].T.reshape(384, heads, hd),
                    "bias": sd[f"{att}.attention.key.bias"].reshape(heads, hd),
                },
                "value": {
                    "kernel": sd[f"{att}.attention.value.weight"].T.reshape(384, heads, hd),
                    "bias": sd[f"{att}.attention.value.bias"].reshape(heads, hd),
                },
                "out": {
                    "kernel": sd[f"{att}.output.dense.weight"].T.reshape(heads, hd, 384),
                    "bias": sd[f"{att}.output.dense.bias"],
                },
            },
            "Dense_0": _dense(sd, f"{t}.mlp.fc1"),
            "Dense_1": _dense(sd, f"{t}.mlp.fc2"),
        }
    for i in range(4):
        r = f"neck.reassemble_stage.layers.{i}"
        params[f"proj{i}"] = _conv(sd, f"{r}.projection")
        params[f"layer_rn{i}"] = {
            "kernel": sd[f"neck.convs.{i}.weight"].transpose(2, 3, 1, 0)
        }
    params["ConvTranspose_0"] = _convT(sd, "neck.reassemble_stage.layers.0.resize")
    params["ConvTranspose_1"] = _convT(sd, "neck.reassemble_stage.layers.1.resize")
    params["resize3"] = _conv(sd, "neck.reassemble_stage.layers.3.resize")
    # transformers fusion layers[0..3] run deepest-first == fusion4..fusion1
    for tf_idx, ours in zip(range(4), ("fusion4", "fusion3", "fusion2", "fusion1")):
        f = f"neck.fusion_stage.layers.{tf_idx}"
        blk = {
            "project": _conv(sd, f"{f}.projection"),
            "rcu2": {
                "conv1": _conv(sd, f"{f}.residual_layer2.convolution1"),
                "conv2": _conv(sd, f"{f}.residual_layer2.convolution2"),
            },
        }
        if ours != "fusion4":  # the deepest layer's rcu1 is unused weights
            blk["rcu1"] = {
                "conv1": _conv(sd, f"{f}.residual_layer1.convolution1"),
                "conv2": _conv(sd, f"{f}.residual_layer1.convolution2"),
            }
        params[ours] = blk

    rng = np.random.default_rng(2)
    x = rng.normal(0.0, 1.0, (1, 3, size, size)).astype(np.float32)
    with torch.no_grad():
        want = model(pixel_values=torch.from_numpy(x)).predicted_depth.numpy()

    Model = depth_mod._depth_model()
    got = Model().apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    got = np.asarray(got)

    assert got.shape == want.shape
    scale = max(np.abs(want).max(), 1e-6)
    diff = np.abs(got - want).max()
    assert diff <= max(2e-4 * scale, 2e-5), (diff, scale)


def test_convtranspose_layout_rule_matches_torch():
    """Pins the converter's transposed-conv weight rule at the op level:
    flax ConvTranspose consumes the SPATIALLY FLIPPED torch weight in
    (kh, kw, in, out) layout, and torch's (k3, s2, p1, op1) decoder shape
    (LaMa/UtNet style) equals flax with explicit ((1,2),(1,2)) padding."""
    import flax.linen as nn
    import jax.numpy as jnp

    torch.manual_seed(5)
    cases = [
        (dict(kernel_size=2, stride=2), dict(strides=(2, 2))),
        (dict(kernel_size=4, stride=4), dict(strides=(4, 4))),
        (dict(kernel_size=3, stride=2, padding=1, output_padding=1),
         dict(strides=(2, 2), padding=((1, 2), (1, 2)))),
    ]
    x = torch.randn(1, 4, 5, 7)
    for t_kw, f_kw in cases:
        ct = torch.nn.ConvTranspose2d(4, 6, **t_kw)
        with torch.no_grad():
            want = ct(x).numpy()
        w = ct.weight.detach().numpy()
        k = w[:, :, ::-1, ::-1].transpose(2, 3, 0, 1).copy()
        ks = t_kw["kernel_size"]
        m = nn.ConvTranspose(6, (ks, ks), **f_kw)
        got = m.apply(
            {"params": {"kernel": jnp.asarray(k),
                        "bias": jnp.asarray(ct.bias.detach().numpy())}},
            jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
        )
        got = np.asarray(got).transpose(0, 3, 1, 2)
        assert got.shape == want.shape, (t_kw, got.shape, want.shape)
        assert np.abs(got - want).max() < 1e-5, t_kw


def _sam_attn(sd, name):
    return {
        "q": _dense(sd, f"{name}.q_proj"),
        "k": _dense(sd, f"{name}.k_proj"),
        "v": _dense(sd, f"{name}.v_proj"),
        "out": _dense(sd, f"{name}.out_proj"),
    }


def _sam_mlp3(sd, name, out_key="proj_out"):
    return {
        "lin0": _dense(sd, f"{name}.proj_in"),
        "lin1": _dense(sd, f"{name}.layers.0"),
        "lin2": _dense(sd, f"{name}.{out_key}"),
    }


def test_sam_decoder_matches_transformers():
    """flax SamDecoder (prompt encoder + two-way mask decoder) ==
    transformers SamModel's prompt_encoder+mask_decoder on identical
    random weights: point/box/padding prompts, dense PE, mask-input
    embedding, two-way transformer, hypernetwork mask heads, IoU head."""
    import jax.numpy as jnp

    from transformers import SamConfig, SamModel
    from transformers.models.sam.configuration_sam import (
        SamPromptEncoderConfig,
        SamVisionConfig,
    )

    from rapidraw_tpu.ai import sam as sam_mod

    g = 16
    v = SamVisionConfig(image_size=256, patch_size=16, num_hidden_layers=1)
    p = SamPromptEncoderConfig(image_size=256, patch_size=16)
    torch.manual_seed(1)
    model = SamModel(
        SamConfig(vision_config=v.to_dict(), prompt_encoder_config=p.to_dict())
    ).eval()
    # real checkpoints TIE the image-wide and prompt positional-encoding
    # gaussians (one pe_layer in the original); random init leaves them
    # independent — tie them like the published weights
    with torch.no_grad():
        model.prompt_encoder.shared_embedding.positional_embedding.copy_(
            model.shared_image_embedding.positional_embedding
        )
    sd = {k: t.detach().numpy() for k, t in model.state_dict().items()}

    params = {
        "pe_gaussian": sd["shared_image_embedding.positional_embedding"],
        "point_embeddings": np.concatenate(
            [sd[f"prompt_encoder.point_embed.{i}.weight"] for i in range(4)], 0
        ),
        "not_a_point_embed": sd["prompt_encoder.not_a_point_embed.weight"][0],
        "no_mask_embed": sd["prompt_encoder.no_mask_embed.weight"][0],
        "mask_down0": _conv(sd, "prompt_encoder.mask_embed.conv1"),
        "mask_ln0": _ln(sd, "prompt_encoder.mask_embed.layer_norm1", ("weight", "bias")),
        "mask_down1": _conv(sd, "prompt_encoder.mask_embed.conv2"),
        "mask_ln1": _ln(sd, "prompt_encoder.mask_embed.layer_norm2", ("weight", "bias")),
        "mask_down2": _conv(sd, "prompt_encoder.mask_embed.conv3"),
        "iou_token": sd["mask_decoder.iou_token.weight"],
        "mask_tokens": sd["mask_decoder.mask_tokens.weight"],
        "final_t2i": _sam_attn(sd, "mask_decoder.transformer.final_attn_token_to_image"),
        "final_norm": _ln(sd, "mask_decoder.transformer.layer_norm_final_attn"),
        "upscale0": _convT(sd, "mask_decoder.upscale_conv1"),
        "upscale_ln": _ln(sd, "mask_decoder.upscale_layer_norm", ("weight", "bias")),
        "upscale1": _convT(sd, "mask_decoder.upscale_conv2"),
        "iou_head": _sam_mlp3(sd, "mask_decoder.iou_prediction_head"),
    }
    for i in range(4):
        params[f"hyper{i}"] = _sam_mlp3(sd, f"mask_decoder.output_hypernetworks_mlps.{i}")
    for li in range(2):
        t = f"mask_decoder.transformer.layers.{li}"
        params[f"layer{li}"] = {
            "self_attn": _sam_attn(sd, f"{t}.self_attn"),
            "norm1": _ln(sd, f"{t}.layer_norm1"),
            "cross_t2i": _sam_attn(sd, f"{t}.cross_attn_token_to_image"),
            "norm2": _ln(sd, f"{t}.layer_norm2"),
            "mlp_lin1": _dense(sd, f"{t}.mlp.lin1"),
            "mlp_lin2": _dense(sd, f"{t}.mlp.lin2"),
            "norm3": _ln(sd, f"{t}.layer_norm3"),
            "cross_i2t": _sam_attn(sd, f"{t}.cross_attn_image_to_token"),
            "norm4": _ln(sd, f"{t}.layer_norm4"),
        }

    rng = np.random.default_rng(3)
    emb = rng.normal(0, 1, (1, g, g, 256)).astype(np.float32)
    emb_t = torch.from_numpy(emb.transpose(0, 3, 1, 2).copy())
    _, SamDecoder = sam_mod._models()
    dec = SamDecoder()
    zero_mask = jnp.zeros((1, 4 * g, 4 * g, 1), jnp.float32)

    def run_ours(coords, labels, mask_in=None):
        return dec.apply(
            {"params": params},
            jnp.asarray(emb),
            jnp.asarray(np.asarray(coords, np.float32)[None]),
            jnp.asarray(np.asarray(labels, np.float32)[None]),
            zero_mask if mask_in is None else jnp.asarray(mask_in),
            jnp.asarray(0.0 if mask_in is None else 1.0),
        )

    def to_t_space(pts):
        # ours normalizes (x+0.5)/1024; transformers (x+0.5)/256 after its
        # own +0.5 shift -> give transformers x' with x'+0.5 == (x+0.5)/4
        return (np.asarray(pts, np.float32) + 0.5) / 4.0 - 0.5

    scale = None

    def compare(got, want, tag):
        nonlocal scale
        got, want = np.asarray(got), np.asarray(want)
        assert got.shape == want.shape, (tag, got.shape, want.shape)
        s = max(np.abs(want).max(), 1e-6)
        d = np.abs(got - want).max()
        assert d <= max(3e-4 * s, 3e-5), (tag, d, s)

    # case A: two points (pos+neg); transformers auto-appends the pad
    # point (label -1) because no boxes are given — mirror it explicitly
    pts = [[312.3, 415.7], [700.2, 300.9]]
    with torch.no_grad():
        out = model(
            image_embeddings=emb_t,
            input_points=torch.from_numpy(to_t_space(pts)[None, None]),
            input_labels=torch.tensor([[[1, 0]]]),
            multimask_output=True,
        )
    masks, iou = run_ours(pts + [[0.0, 0.0]], [1, 0, -1])
    compare(masks[:, 1:4], out.pred_masks[:, 0].numpy(), "points/masks")
    compare(iou[:, 1:4], out.iou_scores[:, 0].numpy(), "points/iou")

    # case B: a box (corner labels 2/3, no pad point), single-mask output,
    # with a mask input driving the dense embedding path
    box = [180.0, 200.0, 760.0, 620.0]
    mask_np = rng.normal(0, 1, (1, 4 * g, 4 * g, 1)).astype(np.float32)
    with torch.no_grad():
        out = model(
            image_embeddings=emb_t,
            input_boxes=torch.from_numpy(
                to_t_space(np.asarray(box).reshape(2, 2)).reshape(1, 1, 4)
            ),
            input_masks=torch.from_numpy(mask_np.transpose(0, 3, 1, 2).copy()),
            multimask_output=False,
        )
    masks, iou = run_ours(
        [box[:2], box[2:]], [2, 3], mask_in=mask_np
    )
    compare(masks[:, 0:1], out.pred_masks[:, 0].numpy(), "box/masks")
    compare(iou[:, 0:1], out.iou_scores[:, 0].numpy(), "box/iou")


def test_sam_encoder_matches_transformers_vit_b():
    """flax SamEncoder == transformers SamVisionEncoder (ViT-B geometry,
    256px input so the test stays CPU-fast; every architectural feature —
    windowed/global decomposed rel-pos attention, neck LayerNorm2d — is
    exercised)."""
    import jax.numpy as jnp

    from transformers import SamConfig, SamModel
    from transformers.models.sam.configuration_sam import SamVisionConfig

    from rapidraw_tpu.ai import sam as sam_mod

    v = SamVisionConfig(
        image_size=256, patch_size=16, hidden_size=768,
        num_attention_heads=12, num_hidden_layers=12,
        global_attn_indexes=[2, 5, 8, 11], window_size=14,
        use_rel_pos=True, output_channels=256, layer_norm_eps=1e-6,
    )
    torch.manual_seed(0)
    model = SamModel(SamConfig(vision_config=v.to_dict())).eval()
    enc = model.vision_encoder
    sd = {k: t.detach().numpy() for k, t in enc.state_dict().items()}
    # zero-init rel-pos tables carry no signal; give them real values so a
    # broken rel-bias implementation cannot pass silently
    rng = np.random.default_rng(1)
    with torch.no_grad():
        for k, t in enc.state_dict().items():
            if "rel_pos" in k:
                t.copy_(torch.from_numpy(
                    rng.normal(0, 0.05, t.shape).astype(np.float32)))
    sd = {k: t.detach().numpy() for k, t in enc.state_dict().items()}

    params = {
        "patch_embed": {
            "kernel": sd["patch_embed.projection.weight"].transpose(2, 3, 1, 0),
            "bias": sd["patch_embed.projection.bias"],
        },
        "pos_embed": sd["pos_embed"],
        "neck0": {"kernel": sd["neck.conv1.weight"].transpose(2, 3, 1, 0)},
        "neck1": _ln(sd, "neck.layer_norm1", ("weight", "bias")),
        "neck2": {"kernel": sd["neck.conv2.weight"].transpose(2, 3, 1, 0)},
        "neck3": _ln(sd, "neck.layer_norm2", ("weight", "bias")),
    }
    for i in range(12):
        t = f"layers.{i}"
        params[f"block{i}"] = {
            "norm1": _ln(sd, f"{t}.layer_norm1"),
            "norm2": _ln(sd, f"{t}.layer_norm2"),
            "attn": {
                "qkv": _dense(sd, f"{t}.attn.qkv"),
                "proj": _dense(sd, f"{t}.attn.proj"),
                "rel_pos_h": sd[f"{t}.attn.rel_pos_h"],
                "rel_pos_w": sd[f"{t}.attn.rel_pos_w"],
            },
            "mlp_lin1": _dense(sd, f"{t}.mlp.lin1"),
            "mlp_lin2": _dense(sd, f"{t}.mlp.lin2"),
        }

    x = rng.normal(0.0, 1.0, (1, 3, 256, 256)).astype(np.float32)
    with torch.no_grad():
        want = enc(torch.from_numpy(x)).last_hidden_state.numpy()  # (1,256,16,16)

    SamEncoder, _ = sam_mod._models()
    got = SamEncoder().apply(
        {"params": params},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
    )
    got = np.asarray(got).transpose(0, 3, 1, 2)

    assert got.shape == want.shape
    scale = np.abs(want).max()
    diff = np.abs(got - want).max()
    assert diff <= max(1e-4 * scale, 2e-5), (diff, scale)
