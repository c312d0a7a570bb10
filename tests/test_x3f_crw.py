"""X3F (Sigma Foveon) and CRW (Canon CIFF) container support.

Both formats parse for library metadata + embedded previews and refuse
the RAW develop precisely (the reference's rawler fork decodes neither;
formats.rs:12,:66 only lists the extensions). Fixtures are synthetic
containers built per the publicly documented layouts.
"""

import io
import struct

import numpy as np
import pytest
from PIL import Image

from rapidraw_tpu.io.ciff import crw_exif_tags, parse_crw_info
from rapidraw_tpu.io.containers import (
    UnsupportedRawFormat,
    parse_raw,
    raw_dimensions,
    sniff_container,
)
from rapidraw_tpu.io.x3f import parse_x3f_info, x3f_exif_tags


def _jpeg_bytes(w=32, h=24, color=(200, 30, 30)) -> bytes:
    buf = io.BytesIO()
    Image.new("RGB", (w, h), color).save(buf, "JPEG", quality=80)
    return buf.getvalue()


# --------------------------------------------------------------------- X3F


def _prop_section(props: dict) -> bytes:
    names, values, offsets = b"", [], []
    data = ""
    for k, v in props.items():
        offsets.append((len(data), None))
        data += k + "\x00"
        offsets[-1] = (offsets[-1][0], len(data))
        data += str(v) + "\x00"
    table = b"".join(struct.pack("<II", n, v) for n, v in offsets)
    payload = data.encode("utf-16-le")
    head = b"SECp" + struct.pack(
        "<IIIII", 0x00020000, len(props), 0, 0, len(data)
    )
    del names, values
    return head + table + payload


def _image_section(fmt: int, payload: bytes, cols=0, rows=0, img_type=2) -> bytes:
    return (
        b"SECi"
        + struct.pack("<IIIIII", 0x00020000, img_type, fmt, cols, rows, 0)
        + payload
    )


def _build_x3f(cols=64, rows=48, rotation=0, wb="Auto", props=None,
               preview=None, thumb=None, raw_fmt=30) -> bytes:
    head = b"FOVb" + struct.pack("<I", 0x00020003)
    head += b"\x01" * 16  # unique id
    head += struct.pack("<IIII", 0, cols, rows, rotation)
    head += wb.encode().ljust(32, b"\0")

    sections = []
    if props is not None:
        sections.append((b"PROP", _prop_section(props)))
    if thumb is not None:
        sections.append((b"IMAG", _image_section(18, thumb)))
    if preview is not None:
        sections.append((b"IMA2", _image_section(18, preview)))
    sections.append((b"IMA2", _image_section(raw_fmt, b"\0" * 64, cols, rows)))

    out = bytearray(head)
    entries = []
    for typ, payload in sections:
        entries.append((len(out), len(payload), typ))
        out += payload
    dir_off = len(out)
    out += b"SECd" + struct.pack("<II", 0x00020000, len(entries))
    for off, size, typ in entries:
        out += struct.pack("<II4s", off, size, typ)
    out += struct.pack("<I", dir_off)
    return bytes(out)


def test_x3f_parse_info_and_preview():
    small = _jpeg_bytes(16, 12, (10, 200, 10))
    big = _jpeg_bytes(64, 48, (10, 10, 200))
    data = _build_x3f(
        cols=64, rows=48, wb="Sunlight",
        props={"CAMMANUF": "SIGMA", "CAMMODEL": "DP2 Merrill", "ISO": "100"},
        preview=big, thumb=small,
    )
    assert sniff_container(data, "x3f") == "x3f"
    info = parse_x3f_info(data)
    assert (info.columns, info.rows) == (64, 48)
    assert info.white_balance == "Sunlight"
    assert info.props["CAMMODEL"] == "DP2 Merrill"
    assert info.raw_format == 30
    # the LARGEST embedded JPEG is the preview
    assert info.preview_jpeg == big
    assert raw_dimensions(data, "x3f") == (64, 48)

    tags = x3f_exif_tags(data)
    assert tags["Make"] == "SIGMA"
    assert tags["Model"] == "DP2 Merrill"
    assert tags["ISOSpeedRatings"] == "100"


def test_x3f_rotation_swaps_dimensions():
    data = _build_x3f(cols=64, rows=48, rotation=90)
    assert raw_dimensions(data, "x3f") == (48, 64)


def test_x3f_develop_refuses_precisely():
    data = _build_x3f()
    with pytest.raises(UnsupportedRawFormat) as ei:
        parse_raw(data, "x3f")
    assert ei.value.format == "x3f"
    assert "CAMF" in str(ei.value)


def test_x3f_malformed_raises_valueerror():
    good = _build_x3f(preview=_jpeg_bytes())
    for mutant in (
        good[:20],
        good[:-4] + b"\xff\xff\xff\x7f",  # directory offset out of range
        b"FOVb" + b"\0" * 36,  # zero dimensions
    ):
        with pytest.raises(ValueError):
            raw_dimensions(mutant, "x3f")


def test_x3f_thumbnail_from_embedded_preview(tmp_path):
    from rapidraw_tpu.library.thumbnails import generate_thumbnail

    big = _jpeg_bytes(64, 48, (10, 10, 200))
    p = tmp_path / "shot.x3f"
    p.write_bytes(_build_x3f(preview=big))
    data = generate_thumbnail(str(p), resolution=32, cache_dir=tmp_path / "c")
    im = Image.open(io.BytesIO(data))
    assert max(im.size) == 32
    # blue-ish preview content survives
    arr = np.asarray(im.convert("RGB"), np.float32)
    assert arr[..., 2].mean() > arr[..., 0].mean()


# --------------------------------------------------------------------- CRW


def _heap(records: list[tuple[int, bytes | None, int]], base_pad=0) -> bytes:
    """records: (type_word, payload_or_None, inline_value). Returns heap
    bytes (directory at the end, final u32 = dir offset)."""
    out = bytearray(b"\0" * base_pad)
    entries = []
    for typ, payload, inline in records:
        if payload is None:  # in-record storage
            entries.append((typ | 0x4000, inline, 0))
        else:
            entries.append((typ, len(payload), len(out)))
            out += payload
    dir_off = len(out)
    out += struct.pack("<H", len(entries))
    for typ, length, off in entries:
        out += struct.pack("<HII", typ, length, off)
    out += struct.pack("<I", dir_off)
    return bytes(out)


def _build_crw(width=64, height=48, preview=None, thumb=None,
               make=b"Canon", model=b"Canon EOS D30", table=0) -> bytes:
    header = b"II" + struct.pack("<I", 26) + b"HEAPCCDR"
    header += struct.pack("<I", 0x00010002)
    header = header.ljust(26, b"\0")

    sensor = struct.pack("<8H", 8, width, height, 0, 0, 0, 0, 0)
    sub_records = [
        (0x1031, sensor, 0),
        (0x1835, None, table),  # decoder table, in-record
    ]
    sub = _heap(sub_records)

    records = [
        (0x080A, make + b"\0" + model + b"\0", 0),
        (0x300A, sub, 0),  # sub-heap (kind bits 0x3000) -> recurse
    ]
    if preview is not None:
        records.append((0x2007, preview, 0))
    if thumb is not None:
        records.append((0x2008, thumb, 0))
    records.append((0x2005, b"\0" * 128, 0))  # raw payload placeholder
    return header + _heap(records)


def test_crw_parse_info():
    big = _jpeg_bytes(64, 48, (200, 180, 20))
    small = _jpeg_bytes(16, 12)
    data = _build_crw(width=64, height=48, preview=big, thumb=small, table=1)
    assert sniff_container(data, "crw") == "crw"
    info = parse_crw_info(data)
    assert (info.width, info.height) == (64, 48)
    assert info.make == "Canon"
    assert info.model == "Canon EOS D30"
    assert info.preview_jpeg == big
    assert info.thumbnail_jpeg == small
    assert info.decoder_table == 1
    assert info.raw_length == 128
    assert raw_dimensions(data, "crw") == (64, 48)
    tags = crw_exif_tags(data)
    assert tags == {"Make": "Canon", "Model": "Canon EOS D30"}


def test_crw_develop_refuses_precisely():
    data = _build_crw()
    with pytest.raises(UnsupportedRawFormat) as ei:
        parse_raw(data, "crw")
    assert ei.value.format == "crw"


def test_crw_malformed_raises_valueerror():
    good = _build_crw(preview=_jpeg_bytes())
    for mutant in (
        good[:40],
        good[:-4] + b"\xff\xff\xff\x7f",  # directory offset out of range
        good[:2] + struct.pack("<I", 2**20) + good[6:],  # bad header len
    ):
        with pytest.raises(ValueError):
            raw_dimensions(mutant, "crw")


def test_crw_thumbnail_from_embedded_preview(tmp_path):
    from rapidraw_tpu.library.thumbnails import generate_thumbnail

    p = tmp_path / "shot.crw"
    p.write_bytes(_build_crw(preview=_jpeg_bytes(64, 48, (200, 180, 20))))
    data = generate_thumbnail(str(p), resolution=24, cache_dir=tmp_path / "c")
    im = Image.open(io.BytesIO(data))
    assert max(im.size) == 24


def test_crw_missing_dimensions_raises():
    # heap without a sensor-info record
    header = (b"II" + struct.pack("<I", 26) + b"HEAPCCDR").ljust(26, b"\0")
    data = header + _heap([(0x080A, b"Canon\0X\0", 0)])
    with pytest.raises(ValueError):
        raw_dimensions(data, "crw")
