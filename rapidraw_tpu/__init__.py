"""rapidraw_tpu — a TPU-native batch RAW develop engine.

A from-scratch reimplementation of the capabilities of geneing/RapidRAW's
develop engine (reference: /root/reference) as an idiomatic JAX/XLA/Pallas
pipeline: the reference's per-pixel WGSL megakernel
(src-tauri/src/shaders/shader.wgsl) becomes a fused, jit-compiled function
over HBM-resident images, batch-sharded across a TPU mesh with `jax.sharding`.

The adjustment-JSON document semantics (src-tauri/src/image_processing.rs:
get_all_adjustments_from_json, :2289-2321) are preserved exactly; the
architecture is not: where the reference is latency-oriented (one image, one
GPU, 2048^2 tile loop), this framework is throughput-oriented (pure function
over batches, static-shape specialization, XLA fusion).
"""

__version__ = "0.1.0"

from rapidraw_tpu.params.parse import (  # noqa: F401
    DevelopConfig,
    DevelopParams,
    parse_adjustments,
)
from rapidraw_tpu.pipeline.develop import develop  # noqa: F401
