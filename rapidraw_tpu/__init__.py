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


def __getattr__(name):  # lazy: keep `import rapidraw_tpu` light
    if name == "develop_batch":
        from rapidraw_tpu.pipeline.batch import develop_batch

        return develop_batch
    if name == "export_images":
        from rapidraw_tpu.pipeline.export import export_images

        return export_images
    if name == "RenderService":
        from rapidraw_tpu.pipeline.service import RenderService

        return RenderService
    if name == "develop_fused":
        from rapidraw_tpu.pipeline.fused import develop_fused

        return develop_fused
    raise AttributeError(name)
