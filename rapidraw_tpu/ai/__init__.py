"""AI subsystem: model registry, tagging, mask/inpaint model adapters.

The reference (ai_processing.rs) downloads ONNX models (SAM, U2-Net, skyseg,
Depth-Anything, NIND denoise, LaMa) from HuggingFace at runtime and runs
them with ort. This environment has no network egress and no onnxruntime;
the subsystem keeps the same architecture — a lazy model registry with
sha256-verified local files — and degrades with explicit errors when model
files are absent. Image-side plumbing (base64 mask decode/reprojection, AI
patch compositing, tiled inference windows) lives in rapidraw_tpu.masks and
works without any model.
"""
