"""LaMa inpainting (Fast Fourier Convolutions) in flax.

The reference runs a LaMa fp16 ONNX session for local inpainting
(ai_processing.rs:781-917): crop a 1.5x-padded window around the mask
bbox, downscale to <=768, edge-pad to a 64-aligned square, run the model
(image in [0,1] + binary mask -> RGB in [0,255]), then alpha-blend the
result back through the mask. Here the generator is defined natively
(Suvorov et al., "Resolution-robust Large Mask Inpainting with Fourier
Convolutions", WACV 2022):

  * stem: reflection-padded 7x7 conv on (masked image, mask) -> 64ch;
  * 3 stride-2 downsamples to 512ch, the last one splitting channels
    into a 25% local / 75% global FFC pair;
  * 9 FFC residual blocks: local<->global convs plus a spectral
    transform on the global half (rfft2 -> 1x1 conv over stacked
    real/imag -> irfft2) — the global receptive field that lets LaMa
    fill large holes;
  * 3 transposed-conv upsamples back to 64ch, 7x7 out conv, sigmoid.

TPU notes: FFTs lower to XLA's native FFT; all convs are NHWC so they
tile onto the MXU. Weights load from `lama.npz` in RAPIDRAW_MODELS
(flat params/batch_stats keys, ai/masks.save_variables_npz layout) —
`ModelUnavailable` otherwise, like every model port here.
"""

from __future__ import annotations

import numpy as np

from rapidraw_tpu.ai.masks import _load_variables

MAX_DIM = 768  # inference size cap (ai_processing.rs:825)
ALIGN = 64  # tensor padded to a 64-aligned square (:845-851)
_NGF = 64
_N_BLOCKS = 9
_GLOBAL_RATIO = 0.75


def _models():
    import flax.linen as nn
    import jax.numpy as jnp

    class BN(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.BatchNorm(use_running_average=True, momentum=0.9,
                                epsilon=1e-5)(x)

    def refl_pad(x, p):
        return jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")

    class FourierUnit(nn.Module):
        ch: int

        @nn.compact
        def __call__(self, x):  # (B, H, W, C)
            B, H, W, C = x.shape
            f = jnp.fft.rfft2(x, axes=(1, 2), norm="ortho")
            f = jnp.concatenate([f.real, f.imag], axis=-1)  # (B,H,W/2+1,2C)
            f = nn.Conv(2 * self.ch, (1, 1), use_bias=False, name="conv")(f)
            f = nn.relu(BN(name="bn")(f))
            re, im = jnp.split(f, 2, axis=-1)
            out = jnp.fft.irfft2(re + 1j * im, s=(H, W), axes=(1, 2),
                                 norm="ortho")
            return out

    class SpectralTransform(nn.Module):
        ch: int

        @nn.compact
        def __call__(self, x):
            x = nn.Conv(self.ch // 2, (1, 1), use_bias=False, name="conv1")(x)
            x = nn.relu(BN(name="bn1")(x))
            y = FourierUnit(self.ch // 2, name="fu")(x)
            return nn.Conv(self.ch, (1, 1), use_bias=False, name="conv2")(x + y)

    class FFC(nn.Module):
        """Split-channel conv: local/global in -> local/global out.

        in/out channel splits follow ratio_gin/ratio_gout; zero-size paths
        are compiled out (the stem and upsample stages are all-local).
        """

        out_ch: int
        kernel: int
        ratio_gin: float
        ratio_gout: float
        stride: int = 1

        @nn.compact
        def __call__(self, xl, xg):
            out_g = int(self.out_ch * self.ratio_gout)
            out_l = self.out_ch - out_g
            k, s = self.kernel, self.stride
            pad = k // 2

            def conv(name, ch):
                return nn.Conv(ch, (k, k), strides=(s, s), padding="VALID",
                               use_bias=False, name=name)

            def prep(x):
                return refl_pad(x, pad) if pad else x

            yl = 0.0
            yg = 0.0
            if out_l:
                yl = conv("l2l", out_l)(prep(xl))
                if xg is not None:
                    yl = yl + conv("g2l", out_l)(prep(xg))
            if out_g:
                yg = conv("l2g", out_g)(prep(xl))
                if xg is not None:
                    yg = yg + SpectralTransform(out_g, name="g2g")(xg)
            return (yl if out_l else None), (yg if out_g else None)

    class FFCBlockActNorm(nn.Module):
        out_ch: int
        kernel: int
        ratio_gin: float
        ratio_gout: float
        stride: int = 1

        @nn.compact
        def __call__(self, xl, xg):
            yl, yg = FFC(self.out_ch, self.kernel, self.ratio_gin,
                         self.ratio_gout, self.stride, name="ffc")(xl, xg)
            if yl is not None:
                yl = nn.relu(BN(name="bn_l")(yl))
            if yg is not None:
                yg = nn.relu(BN(name="bn_g")(yg))
            return yl, yg

    class FFCResnetBlock(nn.Module):
        ch: int

        @nn.compact
        def __call__(self, xl, xg):
            r = _GLOBAL_RATIO
            yl, yg = FFCBlockActNorm(self.ch, 3, r, r, name="conv1")(xl, xg)
            yl, yg = FFCBlockActNorm(self.ch, 3, r, r, name="conv2")(yl, yg)
            return xl + yl, xg + yg

    class LamaGenerator(nn.Module):
        @nn.compact
        def __call__(self, image, mask):
            """image (B, S, S, 3) in [0,1]; mask (B, S, S, 1) in {0,1}.
            Returns (B, S, S, 3) in [0, 255] (the ONNX contract the
            reference consumes, ai_processing.rs:884-893)."""
            x = jnp.concatenate([image * (1.0 - mask), mask], axis=-1)
            x = refl_pad(x, 3)
            xl, _ = FFCBlockActNorm(_NGF, 7, 0.0, 0.0, name="stem")(x, None)

            ch = _NGF
            xg = None
            for i in range(3):
                ch *= 2
                gout = _GLOBAL_RATIO if i == 2 else 0.0
                xl, xg = FFCBlockActNorm(
                    ch, 3, 0.0, gout, stride=2,  # every downsample input is all-local
                    name=f"down{i}",
                )(xl, xg)

            for i in range(_N_BLOCKS):
                xl, xg = FFCResnetBlock(ch, name=f"block{i}")(xl, xg)

            x = jnp.concatenate([xl, xg], axis=-1)
            for i in range(3):
                ch //= 2
                # torch ConvTranspose2d(k=3, s=2, padding=1, output_padding=1)
                # == flax ConvTranspose with explicit ((1,2),(1,2)) padding
                # and the flipped-kernel layout the converter produces —
                # verified exactly against torch (flax 'SAME' is shifted)
                x = nn.ConvTranspose(ch, (3, 3), strides=(2, 2),
                                     padding=((1, 2), (1, 2)),
                                     name=f"up{i}")(x)
                x = nn.relu(BN(name=f"up_bn{i}")(x))
            x = refl_pad(x, 3)
            x = nn.Conv(3, (7, 7), padding="VALID", name="out")(x)
            return nn.sigmoid(x) * 255.0

    return LamaGenerator


_jit_cache: dict = {}


def _lama_fwd():
    import jax

    if "lama" not in _jit_cache:
        model = _models()()

        @jax.jit
        def fwd(vars_, image, mask):
            return model.apply(vars_, image, mask)

        _jit_cache["lama"] = fwd
    return _jit_cache["lama"]


def run_lama_inpainting(planar: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Inpaint planar (3, H, W) f32 [0,1] where mask (H, W) u8 > 0.

    Host orchestration mirrors run_lama_inpainting
    (ai_processing.rs:781-917): mask-bbox crop with 1.5x padding,
    downscale to MAX_DIM, edge-clamped pad to an ALIGN-aligned square,
    inference, Lanczos-free resize back (bilinear here), alpha-blend by
    the mask value. Returns a new (3, H, W) f32 image.
    """
    import jax
    import jax.numpy as jnp

    variables = _load_variables("lama.npz", model_name="LaMa")
    _, h, w = planar.shape
    ys, xs = np.nonzero(mask > 0)
    if ys.size == 0:
        return planar.copy()
    min_x, max_x = int(xs.min()), int(xs.max())
    min_y, max_y = int(ys.min()), int(ys.max())

    pad_x = max(128, int((max_x - min_x + 1) * 1.5))
    pad_y = max(128, int((max_y - min_y + 1) * 1.5))
    x0 = max(0, min_x - pad_x)
    y0 = max(0, min_y - pad_y)
    x1 = min(max_x + pad_x, w - 1)
    y1 = min(max_y + pad_y, h - 1)
    cw, ch_ = x1 - x0 + 1, y1 - y0 + 1

    crop = planar[:, y0 : y1 + 1, x0 : x1 + 1]
    mcrop = mask[y0 : y1 + 1, x0 : x1 + 1]

    if max(cw, ch_) > MAX_DIM:
        scale = MAX_DIM / max(cw, ch_)
        fw = max(1, round(cw * scale))
        fh = max(1, round(ch_ * scale))
    else:
        fw, fh = cw, ch_

    dim = max(fw, fh)
    dim = ((dim + ALIGN - 1) // ALIGN) * ALIGN

    img = jax.image.resize(jnp.asarray(crop), (3, fh, fw), "bilinear")
    msk = jax.image.resize(
        jnp.asarray((mcrop > 0).astype(np.float32)), (fh, fw), "bilinear"
    )
    # edge-clamp pad to the aligned square (:855-860 clamps sx/sy)
    img = jnp.pad(img, ((0, 0), (0, dim - fh), (0, dim - fw)), mode="edge")
    msk = jnp.pad(msk, ((0, dim - fh), (0, dim - fw)), mode="edge")
    msk = (msk > 0.0).astype(jnp.float32)

    out = _lama_fwd()(
        variables,
        img.transpose(1, 2, 0)[None],
        msk[..., None][None],
    )[0]  # (dim, dim, 3) in [0, 255]
    out = jnp.clip(out, 0.0, 255.0) / 255.0
    out = out[:fh, :fw].transpose(2, 0, 1)
    out = jax.image.resize(out, (3, ch_, cw), "bilinear")

    alpha = (mcrop.astype(np.float32) / 255.0)[None]
    blended = np.asarray(out) * alpha + crop * (1.0 - alpha)
    result = planar.copy()
    result[:, y0 : y1 + 1, x0 : x1 + 1] = blended
    return result


def generate_replace_patch(
    image_planar: np.ndarray,
    patch_definition: dict,
    warped_image: np.ndarray | None = None,
    use_fast_inpaint: bool = True,
    connector_url: str | None = None,
    source_path: str = "",
) -> dict:
    """Generative-replace command (ai_commands.rs:400-580): rasterize the
    patch's sub-masks to a bitmap, inpaint with LaMa (`use_fast_inpaint`)
    or the HTTP connector, and return the aiPatches `patchData` payload:
    {"color": b64 JPEG of the masked result (black outside), "mask":
    b64 JPEG of the mask}, both at source resolution, quality 92.
    """
    import base64
    import io

    from PIL import Image

    from rapidraw_tpu.masks.rasterize import generate_mask_bitmap

    _, h, w = image_planar.shape
    mask_def = {
        "visible": patch_definition.get("visible", True),
        "invert": bool(patch_definition.get("invert", False)),
        "opacity": 100.0,
        "subMasks": patch_definition.get("subMasks") or [],
    }
    mask = generate_mask_bitmap(mask_def, w, h, 1.0, (0.0, 0.0), warped_image)
    if mask is None:
        raise ValueError("patch definition produced no mask bitmap")

    if use_fast_inpaint:
        result = run_lama_inpainting(image_planar, mask)
    elif connector_url:
        from rapidraw_tpu.ai.connector import process_inpainting

        rgba = process_inpainting(
            connector_url, source_path, image_planar,
            mask,  # (H, W) gray — the connector encodes it as an 'L' PNG
            str(patch_definition.get("prompt") or ""),
        )
        a = rgba[3].astype(np.float32) / 255.0
        result = rgba[:3].astype(np.float32) / 255.0 * a + image_planar * (1 - a)
    else:
        raise ValueError(
            "no generative backend configured: pass use_fast_inpaint=True "
            "or a connector_url"
        )

    color = (np.clip(result, 0, 1) * 255.0 + 0.5).astype(np.uint8)
    color = np.where(mask[None] > 0, color, 0)  # black outside (:539-550)

    def jpeg_b64(arr, mode):
        buf = io.BytesIO()
        Image.fromarray(arr, mode=mode).save(buf, format="JPEG", quality=92)
        return base64.b64encode(buf.getvalue()).decode()

    return {
        "color": jpeg_b64(color.transpose(1, 2, 0), "RGB"),
        "mask": jpeg_b64(mask, "L"),
    }
