"""Device-side image ops (pure jnp / Pallas).

Each module ports one functional cluster of the reference develop megakernel
(src-tauri/src/shaders/shader.wgsl) into vectorized, branch-free JAX ops over
PLANAR (3, H, W) float32 arrays (channel-first keeps W on the TPU lane axis
and makes the blur matmuls transpose-free; see ops/common.py). Per-pixel
`if (param != 0)` early-outs in the shader become `jnp.where` selects so
results are identical; whole-stage skipping happens one level up via static
DevelopConfig flags.

Parameter broadcasting convention: scalar adjustment params arrive as 0-d
arrays; when masks are active they arrive as (H, W) maps. Both broadcast
directly against (3, H, W) pixels (the channel axis leads, so no reshaping
is needed).
"""
