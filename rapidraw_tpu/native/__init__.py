"""Native (C++) runtime components, loaded over ctypes.

The reference keeps its performance-critical host code in Rust (rawler RAW
decode, rayon loops); here the native pieces are C++ compiled on first use
with the toolchain baked into the image. Artifacts are cached next to the
source (or in RAPIDRAW_NATIVE_CACHE) keyed by a source hash, so rebuilds
only happen when the .cc changes.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from pathlib import Path

_DIR = Path(__file__).parent


class NativeBuildError(RuntimeError):
    pass


def _cache_dir() -> Path:
    env = os.environ.get("RAPIDRAW_NATIVE_CACHE")
    if env:
        d = Path(env)
    else:
        d = _DIR
        if not os.access(d, os.W_OK):
            d = Path.home() / ".cache" / "rapidraw_tpu" / "native"
    d.mkdir(parents=True, exist_ok=True)
    return d


def _build(name: str) -> Path:
    src = _DIR / f"{name}.cc"
    code = src.read_bytes()
    tag = hashlib.blake2b(code, digest_size=8).hexdigest()
    out = _cache_dir() / f"_{name}_{tag}.so"
    if out.exists():
        return out
    # compile to a process-unique temp name and publish atomically: a
    # concurrent worker seeing out.exists() mid-write would CDLL a
    # half-written ELF (and two g++ runs must not interleave on one path)
    tmp = out.with_name(f"{out.name}.{os.getpid()}.tmp")
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", str(src), "-o", str(tmp)]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired) as e:
        raise NativeBuildError(f"failed to run g++: {e}") from e
    if proc.returncode != 0:
        tmp.unlink(missing_ok=True)
        raise NativeBuildError(f"g++ failed:\n{proc.stderr[:2000]}")
    os.replace(tmp, out)
    return out


_libs: dict[str, ctypes.CDLL] = {}


def load(name: str) -> ctypes.CDLL:
    if name not in _libs:
        _libs[name] = ctypes.CDLL(str(_build(name)))
    return _libs[name]


def nikon_decode(stream: bytes, width: int, height: int, tree: int,
                 split: int, vpred, bits: int):
    """Nikon NEF compression 34713 -> (H, W) uint16 predicted values
    (pre-curve). vpred: 4 uint16 initial vertical predictors."""
    import numpy as np

    lib = load("vendor_huff")
    fn = lib.nikon_decode
    fn.restype = ctypes.c_int
    fn.argtypes = [
        ctypes.c_char_p, ctypes.c_long, ctypes.POINTER(ctypes.c_uint16),
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint16), ctypes.c_int,
    ]
    out = np.empty((height, width), np.uint16)
    vp = np.ascontiguousarray(np.asarray(vpred, np.uint16).reshape(4))
    rc = fn(
        stream, len(stream),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        width, height, tree, split,
        vp.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)), bits,
    )
    if rc != 0:
        raise ValueError(f"nikon decode failed (code {rc})")
    return out


def pentax_decode(stream: bytes, width: int, height: int, bits: int = 16,
                  table=None):
    """Pentax PEF compression 65535 -> (H, W) u16.

    table: optional (codes, lens, syms) sequences from makernote 0x220
    (dcraw builds its Huffman table from that tag unconditionally); None
    uses the format's default table.
    """
    import numpy as np

    lib = load("vendor_huff")
    out = np.empty((height, width), np.uint16)
    out_p = out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16))
    if table is None:
        fn = lib.pentax_decode
        fn.restype = ctypes.c_int
        fn.argtypes = [
            ctypes.c_char_p, ctypes.c_long, ctypes.POINTER(ctypes.c_uint16),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        rc = fn(stream, len(stream), out_p, width, height, bits)
    else:
        codes, lens, syms = table
        n = len(codes)
        if not (0 < n <= 32 and len(lens) == n and len(syms) == n):
            raise ValueError("pentax table must be <=32 (codes, lens, syms)")
        fn = lib.pentax_decode_table
        fn.restype = ctypes.c_int
        fn.argtypes = [
            ctypes.c_char_p, ctypes.c_long, ctypes.POINTER(ctypes.c_uint16),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint16), ctypes.c_char_p, ctypes.c_char_p,
            ctypes.c_int,
        ]
        codes_a = np.ascontiguousarray(codes, np.uint16)
        rc = fn(
            stream, len(stream), out_p, width, height, bits,
            codes_a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
            bytes(bytearray(lens)), bytes(bytearray(syms)), n,
        )
    if rc != 0:
        raise ValueError(f"pentax decode failed (code {rc})")
    return out


def panasonic_decode(stream: bytes, raw_width: int, height: int):
    """Panasonic RW2 12-bit bitstream -> (H, raw_width) uint16."""
    import numpy as np

    lib = load("pana_oly")
    fn = lib.panasonic_decode
    fn.restype = ctypes.c_int
    fn.argtypes = [
        ctypes.c_char_p, ctypes.c_long, ctypes.POINTER(ctypes.c_uint16),
        ctypes.c_int, ctypes.c_int,
    ]
    out = np.empty((height, raw_width), np.uint16)
    rc = fn(
        stream, len(stream),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        raw_width, height,
    )
    if rc != 0:
        raise ValueError(f"panasonic decode failed (code {rc})")
    return out


def olympus_decode(stream: bytes, raw_width: int, width: int, height: int):
    """Olympus ORF predictive codec -> (H, width) uint16 (12-bit range)."""
    import numpy as np

    lib = load("pana_oly")
    fn = lib.olympus_decode
    fn.restype = ctypes.c_int
    fn.argtypes = [
        ctypes.c_char_p, ctypes.c_long, ctypes.POINTER(ctypes.c_uint16),
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    out = np.zeros((height, width), np.uint16)
    rc = fn(
        stream, len(stream),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        raw_width, width, height,
    )
    if rc != 0:
        raise ValueError(f"olympus decode failed (code {rc})")
    return out


def ljpeg_decode(stream: bytes):
    """Decode one lossless-JPEG (SOF3) stream -> uint16 array (h, w*comps).

    Raises NativeBuildError if the toolchain is unavailable and ValueError
    on malformed/unsupported streams.
    """
    import numpy as np

    lib = load("ljpeg")
    fn = lib.ljpeg_decode
    fn.restype = ctypes.c_int
    fn.argtypes = [
        ctypes.c_char_p, ctypes.c_long,
        ctypes.POINTER(ctypes.c_uint16), ctypes.c_long,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    # DNG tiles are <= a few MPix; start at 4M samples and grow on -3
    cap = 1 << 22
    for _ in range(4):
        buf = np.empty(cap, np.uint16)
        w = ctypes.c_int(0)
        h = ctypes.c_int(0)
        nc = ctypes.c_int(0)
        rc = fn(
            stream, len(stream),
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)), cap,
            ctypes.byref(w), ctypes.byref(h), ctypes.byref(nc),
        )
        if rc == -3:
            cap *= 4
            continue
        if rc != 0:
            raise ValueError(f"ljpeg decode failed (code {rc})")
        n = w.value * h.value * nc.value
        return buf[:n].reshape(h.value, w.value * nc.value).copy()
    raise ValueError("ljpeg stream too large")


def phase_one_decode(data: bytes, row_offsets, raw_width: int,
                     raw_height: int, fmt: int, big_endian: bool):
    """Phase One IIQ compressed rows -> (H, W) uint16 pixel values
    (post-prediction, format-5 curve applied, PRE black subtraction).

    row_offsets: per-row byte offsets into `data` (the region starting at
    the container's data_offset)."""
    import numpy as np

    lib = load("phase_one")
    fn = lib.phase_one_decode
    fn.restype = ctypes.c_int
    fn.argtypes = [
        ctypes.c_char_p, ctypes.c_long, ctypes.POINTER(ctypes.c_uint32),
        ctypes.POINTER(ctypes.c_uint16),
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    offs = np.ascontiguousarray(row_offsets, np.uint32)
    if offs.shape != (raw_height,):
        raise ValueError("row_offsets must have raw_height entries")
    out = np.empty((raw_height, raw_width), np.uint16)
    rc = fn(
        data, len(data),
        offs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        raw_width, raw_height, fmt, 1 if big_endian else 0,
    )
    if rc != 0:
        raise ValueError(f"phase one decode failed (code {rc})")
    return out


def crx_decode(sample: bytes, planes: int, pw: int, ph: int):
    """Decode one crx-class tile sample -> uint16 (planes, ph, pw).

    Strictly validates the ff01/ff02/ff03 framing; raises ValueError on any
    mismatch (io/cr3.py treats that as "not our crx dialect" and falls back
    to its precise refusal).
    """
    import numpy as np

    lib = load("crx")
    fn = lib.crx_decode
    fn.restype = ctypes.c_int
    fn.argtypes = [
        ctypes.c_char_p, ctypes.c_longlong,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint16),
    ]
    out = np.empty((planes, ph, pw), np.uint16)
    rc = fn(sample, len(sample), planes, pw, ph,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)))
    if rc != 0:
        raise ValueError(f"crx decode failed (code {rc})")
    return out


def crx_encode(planes_arr) -> bytes:
    """Encode uint16 (planes, ph, pw) as one crx-class tile sample."""
    import numpy as np

    a = np.ascontiguousarray(planes_arr, np.uint16)
    planes, ph, pw = a.shape
    lib = load("crx")
    fn = lib.crx_encode
    fn.restype = ctypes.c_longlong
    fn.argtypes = [
        ctypes.POINTER(ctypes.c_uint16),
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_ubyte), ctypes.c_longlong,
    ]
    cap = a.nbytes * 2 + 4096
    buf = (ctypes.c_ubyte * cap)()
    n = fn(a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
           planes, pw, ph, buf, cap)
    if n < 0:
        raise ValueError(f"crx encode failed (code {n})")
    return bytes(buf[: int(n)])
