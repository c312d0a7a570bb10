"""Canon CR3 container (ISO base media file) parsing.

The reference decodes CR3 through rawler's crx codec (Cargo.toml:27,
formats.rs:14). The crx bitstream is an unpublished format known only
through reverse engineering; without that source available offline a
bit-exact decoder cannot be written responsibly, so this module parses
the CONTAINER completely — box tree, Canon CMT1/CMT2 metadata (TIFF IFDs
holding EXIF), sensor dimensions and track layout — and raises a precise
UnsupportedRawFormat naming the crx payload for the raw image itself.
Callers (thumbnails, library listing, culling) still get dimensions and
full EXIF out of CR3 files.

Layout (public ISO/IEC 14496-12 + Canon's documented uuid):
  ftyp('crx ') / moov [ uuid 85c0...(canon) [ CNCV, CCTP,
  CMT1 (TIFF: IFD0 EXIF), CMT2 (TIFF: ExifIFD), CMT3 (makernotes),
  CMT4 (GPS) ], trak x4 (thumb jpeg / preview jpeg / raw crx / meta) ]
  mdat(payloads).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

CANON_UUID = bytes.fromhex("85c0b687820f11e08111f4ce462b6a48")


@dataclass
class Cr3Info:
    width: int = 0
    height: int = 0
    exif: dict = field(default_factory=dict)
    preview_jpeg: bytes | None = None
    tracks: list = field(default_factory=list)  # (codec, w, h)


def _boxes(data: bytes, start: int, end: int):
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", data, pos)
        btype = data[pos + 4 : pos + 8]
        hdr = 8
        if size == 1:
            (size,) = struct.unpack_from(">Q", data, pos + 8)
            hdr = 16
        elif size == 0:
            size = end - pos
        if size < hdr or pos + size > end:
            return
        yield btype, pos + hdr, pos + size
        pos += size


def _tiff_tags(blob: bytes) -> dict:
    """Flatten one embedded TIFF's IFD0 (+ chained) into {tag: value}."""
    from rapidraw_tpu.io.dng import _read_ifd

    if blob[:2] not in (b"II", b"MM"):
        return {}
    endian = "<" if blob[:2] == b"II" else ">"
    try:
        _, first = struct.unpack_from(endian + "HI", blob, 2)
    except struct.error:
        return {}
    out: dict = {}
    off = first
    seen = set()
    while off and off not in seen and off < len(blob):
        seen.add(off)
        try:
            entries, off = _read_ifd(blob, off, endian)
        except struct.error:
            break
        out.update(entries)
    return out


_EXIF_NAMES = {
    271: "Make", 272: "Model", 306: "DateTime", 315: "Artist",
    33434: "ExposureTime", 33437: "FNumber", 34855: "ISOSpeedRatings",
    36867: "DateTimeOriginal", 36868: "DateTimeDigitized",
    37386: "FocalLength", 42036: "LensModel", 274: "Orientation",
}


def _named(tags: dict) -> dict:
    out = {}
    for tag, name in _EXIF_NAMES.items():
        if tag in tags:
            v = tags[tag]
            if isinstance(v, (bytes, bytearray)):
                v = bytes(v).split(b"\0")[0].decode(errors="replace")
            elif isinstance(v, list) and len(v) == 1:
                v = v[0]
            out[name] = v
    return out


def parse_cr3_info(data: bytes) -> Cr3Info:
    """Walk the box tree; returns container metadata (no raw decode)."""
    info = Cr3Info()
    if len(data) < 16 or data[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF file")

    def walk(start, end, depth=0):
        for btype, b0, b1 in _boxes(data, start, end):
            if btype in (b"moov", b"trak", b"mdia", b"minf", b"stbl"):
                walk(b0, b1, depth + 1)
            elif btype == b"uuid" and data[b0 : b0 + 16] == CANON_UUID:
                walk(b0 + 16, b1, depth + 1)
            elif btype in (b"CMT1", b"CMT2", b"CMT3", b"CMT4"):
                info.exif.update(_named(_tiff_tags(data[b0:b1])))
            elif btype == b"stsd":
                # sample description: version/flags u32, count u32, then
                # entries: size u32, codec 4cc, 6 reserved, data-ref u16,
                # then (video) 16 bytes pre-defined, w u16, h u16
                try:
                    (count,) = struct.unpack_from(">I", data, b0 + 4)
                    pos = b0 + 8
                    for _ in range(min(count, 8)):
                        (esize,) = struct.unpack_from(">I", data, pos)
                        codec = data[pos + 4 : pos + 8].decode("ascii", "replace")
                        if esize >= 0x24:
                            w, h = struct.unpack_from(">HH", data, pos + 0x20)
                        else:
                            w = h = 0
                        info.tracks.append((codec.strip(), w, h))
                        if codec == "CRAW" and w * h > info.width * info.height:
                            info.width, info.height = w, h
                        pos += max(esize, 8)
                except struct.error:
                    pass
            elif btype == b"PRVW":
                # preview box: 4 unknown, u16 unknown, u16 w, u16 h, u16
                # unknown, u32 jpeg_size, jpeg bytes
                try:
                    jl = struct.unpack_from(">I", data, b0 + 12)[0]
                    jpeg = data[b0 + 16 : b0 + 16 + jl]
                    if jpeg[:2] == b"\xff\xd8":
                        info.preview_jpeg = jpeg
                except struct.error:
                    pass
            elif btype == b"uuid":
                walk(b0 + 16, b1, depth + 1)  # other uuid wrappers (PRVW lives in one)

    walk(0, len(data))
    return info


def parse_cr3(data: bytes):
    """Raw decode entry: parses the container, then refuses the crx
    payload precisely (the codec is unpublished; see module docstring)."""
    from rapidraw_tpu.io.containers import UnsupportedRawFormat

    info = parse_cr3_info(data)
    dims = f"{info.width}x{info.height}" if info.width else "unknown dims"
    raise UnsupportedRawFormat(
        "cr3",
        f"Canon crx raw payload ({dims}, tracks: "
        f"{[t[0] for t in info.tracks] or 'none'}) — the crx bitstream is "
        "unpublished; container metadata and the embedded preview are "
        "available via parse_cr3_info",
    )
