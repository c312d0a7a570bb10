"""Device-side image ops (pure jnp / Pallas).

Each module ports one functional cluster of the reference develop megakernel
(src-tauri/src/shaders/shader.wgsl) into vectorized, branch-free JAX ops over
(..., H, W, 3) float32 arrays. Per-pixel `if (param != 0)` early-outs in the
shader become `jnp.where` selects so results are identical; whole-stage
skipping happens one level up via static DevelopConfig flags.

Parameter broadcasting convention: scalar adjustment params arrive as 0-d
arrays; when masks are active they arrive as (H, W) maps. All ops index
params with `[..., None]` before combining with (..., 3) pixels so both
cases broadcast.
"""
