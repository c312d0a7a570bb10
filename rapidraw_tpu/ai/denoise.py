"""AI denoiser: UtNet (NIND) architecture in flax + tiled execution.

The reference runs the NIND UtNet ONNX model through its tiling harness
(ai_processing.rs denoise path + denoising.rs:51-88 'ai' mode). Zero-egress
environments can't fetch weights, so the network is defined natively
(flax) and loads parameters from RAPIDRAW_MODELS/utnet.npz when present;
`denoise_ai` raises ModelUnavailable otherwise (callers fall back to BM3D,
matching the reference's behavior when the model file is absent).

UtNet (Benoit Brummer, "Natural Image Noise Dataset", CVPRW 2019) is a
U-Net: 4 down levels (conv-conv-pool) widening 32..256, a bottleneck, and
transpose-conv up path with skip concatenation, LeakyReLU activations.
"""

from __future__ import annotations

import numpy as np

from rapidraw_tpu.ai.tiled_inference import run_tiled, select_tile_params


def _utnet():
    import flax.linen as nn

    class UtNet(nn.Module):
        base: int = 32

        @nn.compact
        def __call__(self, x):  # (B, H, W, 3)
            act = lambda v: nn.leaky_relu(v, 0.1)
            skips = []
            f = self.base
            for _ in range(4):
                x = act(nn.Conv(f, (3, 3))(x))
                x = act(nn.Conv(f, (3, 3))(x))
                skips.append(x)
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                f *= 2
            x = act(nn.Conv(f, (3, 3))(x))
            x = act(nn.Conv(f, (3, 3))(x))
            for skip in reversed(skips):
                f //= 2
                import jax.numpy as jnp

                x = nn.ConvTranspose(f, (2, 2), strides=(2, 2))(x)
                x = jnp.concatenate([x[:, : skip.shape[1], : skip.shape[2], :], skip], axis=-1)
                x = act(nn.Conv(f, (3, 3))(x))
                x = act(nn.Conv(f, (3, 3))(x))
            return nn.Conv(3, (3, 3))(x)

    return UtNet()


_jit_cache: dict = {}


def _load_params(model):
    """Load utnet.npz via the shared flat-npz loader (ai/masks.py)."""
    from rapidraw_tpu.ai.masks import _load_variables

    tree = _load_variables("utnet.npz", model_name="NIND UtNet")
    # accept both layouts: bare param paths ('Conv_0/kernel') or the full
    # variables tree ('params/Conv_0/kernel', the converter-tool output)
    return tree if "params" in tree else {"params": tree}


def denoise_ai(image: np.ndarray, quality: float = 0.5) -> np.ndarray:
    """Denoise planar (3, H, W) float32 with UtNet over blended tiles.

    Raises ModelUnavailable when weights are absent (denoising.apply_denoising
    falls back to BM3D, like the reference without its model download).
    """
    import jax

    model = _utnet()
    variables = _load_params(model)
    params = select_tile_params(quality)

    # jit once per process: a per-call @jax.jit closure retraces and
    # recompiles the whole U-Net on every image. Weights are a traced
    # ARGUMENT (not a closure capture) so reloading different weights
    # reuses the same executable instead of serving stale ones.
    if "fwd" not in _jit_cache:

        @jax.jit
        def fwd(vs, batch):  # (B, 3, cs, cs) planar -> same
            import jax.numpy as jnp

            x = batch.transpose(0, 2, 3, 1)
            # the U-Net's 4 pool/upsample levels need 16-divisible dims;
            # the tile context size (504, mirroring the reference's
            # tiling) is not — reflect-pad in, crop out
            h, w = x.shape[1], x.shape[2]
            ph, pw = -h % 16, -w % 16
            x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="reflect")
            y = model.apply(vs, x)[:, :h, :w, :]
            return y.transpose(0, 3, 1, 2)

        _jit_cache["fwd"] = fwd
    fwd = _jit_cache["fwd"]
    return run_tiled(lambda b: fwd(variables, b), image, params)
