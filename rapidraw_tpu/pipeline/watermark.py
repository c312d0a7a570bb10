"""Watermark compositing + adjustments-as-LUT export.

Ports of export_processing.rs:75-158 (9-anchor alpha-composited watermark
scaled to the image's short edge) and :587-635 (render the identity LUT
image through the develop pipeline minus spatial ops to bake a .cube).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import numpy as np

ANCHORS = (
    "topLeft", "topCenter", "topRight",
    "centerLeft", "center", "centerRight",
    "bottomLeft", "bottomCenter", "bottomRight",
)


@dataclass
class WatermarkSettings:
    path: str
    anchor: str = "bottomRight"
    scale: float = 15.0  # percent of the short edge
    spacing: float = 2.0  # percent of the short edge
    opacity: float = 100.0


def apply_watermark(planar: np.ndarray, settings: WatermarkSettings) -> np.ndarray:
    """Composite a watermark onto planar (3, H, W) float [0,1]."""
    from PIL import Image

    wm = Image.open(settings.path).convert("RGBA")
    _, base_h, base_w = planar.shape
    base_min = min(base_w, base_h)
    # f32 scale math + .round() (half away from zero), like the reference
    # (export_processing.rs:109-112); Python round() is half-to-even
    factor = np.float32(base_min * (settings.scale / 100.0)) / np.float32(max(wm.width, 1))
    new_w = int(np.floor(np.float32(wm.width) * factor + 0.5))
    new_h = int(np.floor(np.float32(wm.height) * factor + 0.5))
    if new_w == 0 or new_h == 0:
        return planar
    wm = wm.resize((new_w, new_h), Image.LANCZOS)
    wm_u8 = np.asarray(wm)
    # the reference scales the u8 alpha IN PLACE with a truncating cast
    # (:122-125) before compositing — quantize the same way
    opacity = min(max(settings.opacity / 100.0, 0.0), 1.0)
    alpha_u8 = (wm_u8[..., 3].astype(np.float32) * np.float32(opacity)).astype(np.uint8)
    wm_arr = wm_u8.astype(np.float32) / 255.0
    wm_arr[..., 3] = alpha_u8.astype(np.float32) / 255.0

    spacing = int(base_min * (settings.spacing / 100.0))
    # i64 division truncates toward zero (the reference's `/ 2`), which
    # differs from Python's floor `//` when an oversize watermark makes
    # the centered offset negative
    trunc2 = lambda v: int(v / 2)
    if settings.anchor in ("topLeft", "centerLeft", "bottomLeft"):
        x = spacing
    elif settings.anchor in ("topCenter", "center", "bottomCenter"):
        x = trunc2(base_w - new_w)
    else:
        x = base_w - new_w - spacing
    if settings.anchor in ("topLeft", "topCenter", "topRight"):
        y = spacing
    elif settings.anchor in ("centerLeft", "center", "centerRight"):
        y = trunc2(base_h - new_h)
    else:
        y = base_h - new_h - spacing

    out = planar.copy()
    x0, y0 = max(x, 0), max(y, 0)
    x1, y1 = min(x + new_w, base_w), min(y + new_h, base_h)
    if x1 <= x0 or y1 <= y0:
        return out
    wm_crop = wm_arr[y0 - y : y1 - y, x0 - x : x1 - x]
    alpha = wm_crop[..., 3][None]
    rgb = wm_crop[..., :3].transpose(2, 0, 1)
    region = out[:, y0:y1, x0:x1]
    out[:, y0:y1, x0:x1] = region * (1.0 - alpha) + rgb * alpha
    return out


def export_adjustments_as_lut(adjustments: dict, lut_size: int = 33) -> str:
    """Bake a grade into a .cube by rendering the identity LUT image through
    the develop chain with every spatial/stochastic stage zeroed
    (export_processing.rs:600-617). Returns .cube text."""
    import jax.numpy as jnp

    from rapidraw_tpu.io.lut import identity_lut, lut_to_cube_text
    from rapidraw_tpu.params.parse import parse_adjustments
    from rapidraw_tpu.pipeline.develop import develop

    adj = dict(adjustments)
    # masks are spatial (meaningless for a LUT) — and leaving them in would
    # set cfg.mask_count > 0 and trip develop()'s mask-bitmap assert
    adj.pop("masks", None)
    adj.pop("aiPatches", None)
    for key in (
        "showClipping",
    ):
        adj[key] = False
    for key in (
        "vignetteAmount", "grainAmount", "sharpness", "clarity", "dehaze",
        "structure", "centré", "glowAmount", "halationAmount", "flareAmount",
        "lumaNoiseReduction", "colorNoiseReduction",
        "chromaticAberrationRedCyan", "chromaticAberrationBlueYellow",
    ):
        adj[key] = 0
    params, cfg = parse_adjustments(adj, is_raw=False)
    cfg = dataclasses.replace(cfg, dither_active=False)

    import jax

    # the identity LUT image is tiny (size^2 x size); a TPU compile costs
    # ~90 s for no benefit — pin this job to the host CPU backend
    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        cpu = None

    # identity LUT unrolled to an image: width = size, height = size^2
    # (lut_processing.rs:285-303), sRGB-encoded as a normal input
    ident = identity_lut(lut_size)  # (L, L, L, 3) [r, g, b]
    img = ident.transpose(2, 1, 0, 3).reshape(lut_size * lut_size, lut_size, 3)
    planar = jnp.asarray(img.transpose(2, 0, 1))

    lut = None
    if cfg.has_lut and isinstance(adj.get("lutPath"), str):
        from rapidraw_tpu.io.lut import parse_lut_file

        try:
            lut = jnp.asarray(parse_lut_file(adj["lutPath"]))
        except Exception:
            cfg = dataclasses.replace(cfg, has_lut=False)

    # local jit (not the shared export cache: that one may hold TPU
    # executables for the same cfg): the baked LUT must carry the same
    # compiled-graph numerics the export path renders with — the eager
    # dispatch drifts up to ~4e-3 from the fused graph
    baked_fn = jax.jit(lambda x, p, l: develop(x, p, cfg, lut=l))
    if cpu is not None:
        with jax.default_device(cpu):
            out = np.asarray(baked_fn(planar, params, lut))
    else:
        out = np.asarray(baked_fn(planar, params, lut))
    baked = out.transpose(1, 2, 0).reshape(lut_size, lut_size, lut_size, 3).transpose(2, 1, 0, 3)
    return lut_to_cube_text(baked)
