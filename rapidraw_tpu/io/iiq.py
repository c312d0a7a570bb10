"""Phase One IIQ container parser.

An IIQ file is a TIFF wrapper (thumbnail/EXIF IFDs) whose raw payload is
addressed by a proprietary directory: the magic "IIII" (little-endian) or
"MMMM" (big-endian) within the first 32 bytes, a 'Raw' signature word, and
a 16-byte-entry directory of (tag, type, len, data) u32s. Semantics are
implemented from the publicly documented dcraw layout (parse_phase_one /
phase_one_load_raw[_c]); the reference app decodes IIQ via the rawler
crate (/root/reference/src-tauri/Cargo.toml:27,
raw_processing.rs:15-30).

Formats: 0/1/2 are plain 16-bit planes (1/2 with the two-key XOR
scramble); 3/4/5/8 are the per-row compressed bitstream decoded by
native/phase_one.cc (format 5 applies the small-value gamma ramp, format
8 skips the final <<2). Other format codes refuse precisely. The
meta-directory sensor corrections (dcraw's phase_one_correct: defect
lists, per-quadrant gain polynomials) are not applied — they are
refinement on top of the decoded plane, not part of the bitstream.
"""

from __future__ import annotations

import struct

import numpy as np

from rapidraw_tpu.io.dng import DngError, RawFile

# ProPhoto (ROMM) -> linear sRGB, the constant dcraw composes the IIQ
# color-matrix tag with (romm_coeff).
_RGB_FROM_ROMM = np.array(
    [
        [2.034193, -0.727420, -0.306766],
        [-0.228811, 1.231729, -0.002922],
        [-0.008565, -0.153273, 1.161839],
    ],
    np.float64,
)

# dcraw maps tag 0x100 (flip) through "0653"[data & 3]; dcraw flip codes
# correspond to EXIF orientations 1/6/8/3.
_FLIP_TO_ORIENTATION = {0: 1, 6: 6, 5: 8, 3: 3}


def _find_base(data: bytes) -> tuple[int, bool]:
    head = data[:32]
    for magic, big in ((b"MMMM", True), (b"IIII", False)):
        idx = head.find(magic)
        if idx >= 0:
            return idx, big
    raise DngError("not an IIQ file (no Phase One magic)")


def _parse_dir(data: bytes, base: int, big: bool) -> dict:
    """tag -> (type, length, data_word, file_pos_of_data_word)."""
    e = ">" if big else "<"
    if len(data) < base + 16:
        raise DngError("truncated IIQ header")
    (sig,) = struct.unpack_from(e + "I", data, base + 4)
    if (sig >> 8) != 0x526177:  # 'Raw'
        raise DngError("IIQ missing Raw signature")
    (dir_off,) = struct.unpack_from(e + "I", data, base + 8)
    pos = base + dir_off
    if pos + 8 > len(data):
        raise DngError("IIQ directory offset out of range")
    (entries,) = struct.unpack_from(e + "I", data, pos)
    pos += 8
    if entries > 4096 or pos + 16 * entries > len(data):
        raise DngError("implausible IIQ directory")
    out = {}
    for _ in range(entries):
        tag, typ, length, word = struct.unpack_from(e + "IIII", data, pos)
        out[tag] = (typ, length, word, pos + 12)
        pos += 16
    return out


def _floats(data: bytes, base: int, big: bool, entry, n: int) -> np.ndarray:
    _, length, word, _ = entry
    off = base + word
    if length < 4 * n or off + 4 * n > len(data):
        raise DngError("truncated IIQ float tag")
    e = ">" if big else "<"
    return np.array(struct.unpack_from(e + f"{n}f", data, off), np.float64)


def iiq_dimensions(data: bytes) -> tuple[int, int]:
    """(width, height) of the active area from directory metadata only."""
    base, big = _find_base(data)
    d = _parse_dir(data, base, big)
    w = d.get(0x10C, (0, 0, 0, 0))[2] or d.get(0x108, (0, 0, 0, 0))[2]
    h = d.get(0x10D, (0, 0, 0, 0))[2] or d.get(0x109, (0, 0, 0, 0))[2]
    if not (w and h):
        raise DngError("IIQ missing dimensions")
    return int(w), int(h)


def parse_iiq(data: bytes) -> RawFile:
    from rapidraw_tpu.io.makers import _shift_pattern

    base, big = _find_base(data)
    d = _parse_dir(data, base, big)
    e = ">" if big else "<"

    def scalar(tag: int, default: int = 0) -> int:
        return int(d[tag][2]) if tag in d else default

    raw_width = scalar(0x108)
    raw_height = scalar(0x109)
    if not (0 < raw_width <= 32768 and 0 < raw_height <= 32768):
        raise DngError("implausible IIQ sensor dimensions")
    if raw_width * raw_height > 150_000_000:
        raise DngError("implausible IIQ sensor size")
    left = scalar(0x10A)
    top = scalar(0x10B)
    width = scalar(0x10C)
    height = scalar(0x10D)
    fmt = scalar(0x10E)
    if 0x10F not in d:
        raise DngError("IIQ missing raw data offset")
    data_offset = base + scalar(0x10F)
    black = scalar(0x21D)
    split_col = scalar(0x222)
    split_row = scalar(0x224)

    if data_offset < 0 or data_offset >= len(data):
        raise DngError("IIQ raw data offset out of range")

    if fmt < 3:
        need = raw_width * raw_height
        region = data[data_offset : data_offset + need * 2]
        if len(region) < need * 2:
            raise DngError("truncated IIQ 16-bit plane")
        plane = np.frombuffer(region, e + "u2", count=need).astype(np.uint16)
        if fmt:
            # two-key XOR scramble over column pairs (dcraw
            # phase_one_load_raw): keys live in tag 0x112's data word
            if 0x112 not in d:
                raise DngError("scrambled IIQ missing key tag 0x112")
            key_pos = d[0x112][3]
            akey, bkey = struct.unpack_from(e + "HH", data, key_pos)
            mask = 0x5555 if fmt == 1 else 0x1354
            inv = ~mask & 0xFFFF
            a = plane[0::2] ^ akey
            b = plane[1::2] ^ bkey
            plane = plane.copy()
            plane[0::2] = (a & mask) | (b & inv)
            plane[1::2] = (b & mask) | (a & inv)
        plane = plane.reshape(raw_height, raw_width)
        black_level = float(black)
        white_level = 65535.0
    elif fmt in (3, 4, 5, 8):
        from rapidraw_tpu.native import phase_one_decode

        if 0x21C not in d:
            raise DngError("compressed IIQ missing strip-offset tag")
        strip_off = base + scalar(0x21C)
        if strip_off + 4 * raw_height > len(data):
            raise DngError("IIQ strip offsets out of range")
        offsets = np.frombuffer(
            data, e + "u4", count=raw_height, offset=strip_off
        ).astype(np.uint32)
        pix = phase_one_decode(
            data[data_offset:], offsets, raw_width, raw_height, fmt, big
        )

        def black_field(tag: int, n: int) -> np.ndarray:
            if tag not in d:
                return np.zeros((n, 2), np.int32)
            off = base + d[tag][2]
            if off + 4 * n > len(data):
                raise DngError("IIQ black-field offset out of range")
            return (
                np.frombuffer(data, e + "u2", count=2 * n, offset=off)
                .astype(np.int16)
                .reshape(n, 2)
                .astype(np.int32)
            )

        cblack = black_field(0x223, raw_height)  # per-row pair, split by col
        rblack = black_field(0x225, raw_width)  # per-col pair, split by row
        shift = 2 if fmt != 8 else 0
        cols = np.arange(raw_width)
        rows = np.arange(raw_height)
        v = (pix.astype(np.int32) << shift) - black
        v = v + cblack[rows[:, None], (cols[None, :] >= split_col).astype(np.int32)]
        v = v + rblack[cols[None, :], (rows[:, None] >= split_row).astype(np.int32)]
        plane = np.clip(v, 0, 65535).astype(np.uint16)
        black_level = 0.0
        white_level = float(0xFFFC - black)
    else:
        from rapidraw_tpu.io.containers import UnsupportedRawFormat

        raise UnsupportedRawFormat("iiq", f"IIQ format code {fmt}")

    pattern = "RGGB"
    if 0 < width <= raw_width - left and 0 < height <= raw_height - top:
        plane = plane[top : top + height, left : left + width]
        pattern = _shift_pattern(pattern, top & 1, left & 1)

    wb = np.ones(3, np.float32)
    if 0x107 in d:
        mul = _floats(data, base, big, d[0x107], 3)
        if np.all(np.isfinite(mul)) and mul[1] > 0:
            wb = (mul / mul[1]).astype(np.float32)

    xyz_to_cam = None
    if 0x106 in d:
        romm_cam = _floats(data, base, big, d[0x106], 9).reshape(3, 3)
        if np.all(np.isfinite(romm_cam)):
            # dcraw romm_coeff: cmatrix = romm_cam @ (sRGB <- ROMM) is the
            # camera -> sRGB matrix; our RawFile carries XYZ -> camera
            from rapidraw_tpu.raw.color import SRGB_TO_XYZ

            cmatrix = romm_cam @ _RGB_FROM_ROMM
            try:
                xyz_to_cam = (
                    np.linalg.inv(cmatrix) @ np.linalg.inv(SRGB_TO_XYZ)
                ).astype(np.float32)
            except np.linalg.LinAlgError:
                xyz_to_cam = None

    flip_code = int("0653"[scalar(0x100) & 3])
    return RawFile(
        cfa=np.ascontiguousarray(plane),
        pattern=pattern,
        black_level=black_level,
        white_level=white_level,
        wb=wb,
        xyz_to_cam=xyz_to_cam,
        orientation=_FLIP_TO_ORIENTATION.get(flip_code, 1),
    )
