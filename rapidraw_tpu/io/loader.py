"""Image loading: file -> planar (3, H, W) float32 in input space.

Host equivalent of image_loader.rs:62-150 (RAW vs LDR branch + EXIF
orientation) feeding the device pipeline. LDR decode via PIL; RAW container
decode arrives with io/dng.py (the CFA -> RGB develop itself runs on TPU in
rapidraw_tpu.raw).

Virtual-copy paths ("photo.jpg?vc=2") share the source file
(file_management.rs:165-196).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

# the reference's full RAW extension list, formats.rs:4-71
RAW_EXTENSIONS = {
    "dng", "pro", "ari", "crw", "cr2", "cr3", "bay", "raw", "erf", "raf",
    "3fr", "fff", "iiq", "kdc", "k25", "dcs", "dcr", "mos", "rwl", "mef",
    "mrw", "nef", "nrw", "orf", "rw2", "pef", "ptx", "srw", "x3f", "arw",
    "srf", "sr2",
}


def parse_virtual_path(path: str) -> tuple[str, int | None]:
    """'photo.jpg?vc=2' -> ('photo.jpg', 2) (file_management.rs:165-196)."""
    if "?vc=" in path:
        base, _, vc = path.rpartition("?vc=")
        try:
            return base, int(vc)
        except ValueError:
            return path, None
    return path, None


def is_raw_file(path: str | Path) -> bool:
    return Path(str(path)).suffix.lower().lstrip(".") in RAW_EXTENSIONS


def _apply_exif_orientation(arr: np.ndarray, orientation: int) -> np.ndarray:
    """EXIF orientation 1-8 on (H, W, 3) (image_loader.rs:169-212)."""
    if orientation == 2:
        return arr[:, ::-1]
    if orientation == 3:
        return arr[::-1, ::-1]
    if orientation == 4:
        return arr[::-1, :]
    if orientation == 5:
        return np.rot90(arr, k=-1, axes=(0, 1))[:, ::-1]
    if orientation == 6:
        return np.rot90(arr, k=-1, axes=(0, 1))
    if orientation == 7:
        return np.rot90(arr, k=1, axes=(0, 1))[:, ::-1]
    if orientation == 8:
        return np.rot90(arr, k=1, axes=(0, 1))
    return arr


def load_ldr(path: str | Path):
    """Decode an LDR file to planar (3, H, W) float32 sRGB-encoded [0,1],
    returned as a DEVICE array.

    PIL covers the bulk of NON_RAW_EXTENSIONS (formats.rs:73-79); the
    float/HDR tail (hdr/exr/ff/pam) decodes via io/float_images.py, clamped
    to [0,1] like the reference's DynamicImage->RGB8 conversion.

    The decoded u8 uploads as-is (1/4 the bytes of f32) and the scale +
    transpose run on device — the reference uploads once and keeps pixels
    GPU-resident (gpu_processing.rs:1738-1778)."""
    from PIL import Image

    import jax.numpy as jnp

    ext = Path(str(path)).suffix.lower().lstrip(".")
    if ext in ("hdr", "exr", "ff", "pam"):
        from rapidraw_tpu.io.float_images import load_float_image

        arr = np.clip(load_float_image(path), 0.0, 1.0)
        return jnp.asarray(np.ascontiguousarray(arr.transpose(2, 0, 1)))
    if ext == "jxl":
        # PIL has no JXL plugin in this build — decode via the libjxl
        # ctypes binding (io/jxl.py)
        from rapidraw_tpu.io.jxl import decode_jxl

        arr = decode_jxl(Path(path).read_bytes())[..., :3]
        return _u8_hwc_to_planar_device(np.ascontiguousarray(arr))

    if ext in ("png", "tif", "tiff"):
        # 16-bit sources decode at full depth like the reference's image
        # crate (PIL's convert("RGB") silently truncates them to 8 bits);
        # our own PNG/TIFF exports are 16-bit (export_processing.rs:446-462)
        deep = _load_deep_u16(path, ext)
        if deep is not None:
            arr16, orientation = deep
            arr16 = _apply_exif_orientation(arr16, orientation)
            return _u16_hwc_to_planar_device(np.ascontiguousarray(arr16))

    with Image.open(path) as im:
        try:
            orientation = im.getexif().get(0x0112, 1) or 1
        except Exception:
            orientation = 1
        arr = np.asarray(im.convert("RGB"), np.uint8)
    arr = _apply_exif_orientation(arr, int(orientation))
    return _u8_hwc_to_planar_device(np.ascontiguousarray(arr))


def _load_deep_u16(path, ext: str):
    """((H, W, 3) u16, orientation) for a 16-bit PNG/TIFF, else None."""
    from PIL import Image

    try:
        if ext in ("tif", "tiff"):
            from rapidraw_tpu.io.encode import read_tiff16_rgb

            arr = read_tiff16_rgb(path)
        else:
            with open(path, "rb") as f:
                head = f.read(26)
            if len(head) < 26 or head[24] != 16:
                return None
            try:
                import cv2
            except ImportError:
                return None
            arr = cv2.imread(str(path), cv2.IMREAD_UNCHANGED)
            if arr is None or arr.dtype != np.uint16:
                return None
            if arr.ndim == 2:
                arr = np.stack([arr] * 3, axis=-1)
            elif arr.shape[-1] >= 3:
                arr = arr[..., [2, 1, 0]]  # BGR(A) -> RGB
            else:
                return None
        if arr is None:
            return None
    except Exception:  # noqa: BLE001 — malformed deep file: 8-bit fallback
        return None
    try:
        with Image.open(path) as im:
            orientation = int(im.getexif().get(0x0112, 1) or 1)
    except Exception:
        orientation = 1
    return arr, orientation


_U16_TO_PLANAR_JIT = None


def _u16_hwc_to_planar_device(arr_u16_hwc: np.ndarray):
    """(H, W, 3) u16 host -> (3, H, W) f32 [0,1] device, one jitted
    dispatch (half the upload bytes of f32)."""
    global _U16_TO_PLANAR_JIT
    import jax
    import jax.numpy as jnp

    if _U16_TO_PLANAR_JIT is None:
        _U16_TO_PLANAR_JIT = jax.jit(
            lambda a: jnp.transpose(a.astype(jnp.float32), (2, 0, 1)) / 65535.0
        )
    return _U16_TO_PLANAR_JIT(jnp.asarray(arr_u16_hwc))


_U8_TO_PLANAR_JIT = None


def _u8_hwc_to_planar_device(arr_u8_hwc: np.ndarray):
    """(H, W, 3) u8 host -> (3, H, W) f32 [0,1] device, one jitted dispatch."""
    global _U8_TO_PLANAR_JIT
    import jax
    import jax.numpy as jnp

    if _U8_TO_PLANAR_JIT is None:
        _U8_TO_PLANAR_JIT = jax.jit(
            lambda a: jnp.transpose(a.astype(jnp.float32), (2, 0, 1)) / 255.0
        )
    return _U8_TO_PLANAR_JIT(jnp.asarray(arr_u8_hwc))


_ENHANCE_CACHE: dict = {}


def _enhance_jit(nr_amount: float, sharpening: float):
    """Jitted enhance, cached per (nr, sharpening) — eager per-op dispatch
    of its ~60 device ops is the expensive case on a remote device."""
    import jax

    key = (nr_amount, sharpening)
    fn = _ENHANCE_CACHE.get(key)
    if fn is None:
        from rapidraw_tpu.raw.enhance import remove_raw_artifacts_and_enhance

        fn = jax.jit(
            lambda x: remove_raw_artifacts_and_enhance(x, nr_amount, sharpening)
        )
        _ENHANCE_CACHE[key] = fn
    return fn


def load_image(path: str | Path, app_settings=None, fast: bool = False):
    """Load any supported file. Returns (planar_f32, is_raw: bool).

    planar_f32 is a DEVICE array: the whole load->enhance chain stays on
    device (the reference keeps decoded pixels GPU-resident across renders,
    gpu_processing.rs:1738-1778) so downstream transforms/develop add no
    host round trip — a 24MP frame is ~50 MB of CFA up instead of ~900 MB
    of f32 ping-pong. Host-side consumers convert with np.asarray at
    their edge.

    Mirrors load_base_image_from_bytes (image_loader.rs:62-150):
      * RAW develop honors rawHighlightCompression / linearRawMode;
      * RAW post-develop enhance (chroma NR + gentle sharpen,
        raw/enhance.py) runs per the rawPreprocessing* settings — ON by
        default (0.5 / 0.35, app_settings.rs:517-518) — and also on LDR
        files when applyPreprocessingToNonRaws is set;
      * `fast` is the thumbnail path (use_fast_raw_dev): speed demosaic,
        clamp to 1.0, no enhance.

    app_settings=None uses the reference's shipped defaults.
    """
    from rapidraw_tpu.utils.settings import DEFAULTS, AppSettings

    s = app_settings if app_settings is not None else AppSettings(dict(DEFAULTS))
    real, _vc = parse_virtual_path(str(path))
    nr_amount, sharpening = s.preprocessing_amounts()
    run_enhance = not fast and (nr_amount > 0.0 or sharpening > 0.0)
    if is_raw_file(real):
        from rapidraw_tpu.io.dng import load_raw_file  # noqa: PLC0415

        img = load_raw_file(
            real,
            highlight_compression=s.raw_highlight_compression,
            linear_mode=s.linear_raw_mode,
            fast=fast,
        )
        if run_enhance:
            img = _enhance_jit(nr_amount, sharpening)(img)
        return img, True
    img = load_ldr(real)
    if run_enhance and s.apply_preprocessing_to_non_raws:
        img = _enhance_jit(nr_amount, sharpening)(img)
    return img, False


def to_uint8_hwc(planar: np.ndarray) -> np.ndarray:
    """Planar f32 [0,1] (or already-quantized u8) -> (H, W, 3) u8 for
    encoding. u8 inputs come from device-side quantization (the service /
    export paths download 1/4 the bytes); the device formula matches this
    one exactly, so the encoded bytes are identical either way."""
    planar = np.asarray(planar)
    if planar.dtype == np.uint8:
        return planar.transpose(1, 2, 0)
    return (np.clip(planar, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8).transpose(1, 2, 0)
