"""EXIF engine: read, copy-through with GPS strip, .rrexif sidecars.

Equivalent of exif_processing.rs: metadata read (kamadak-exif there, PIL
here), write-through on export with GPS stripped (:669-1073), `.rrexif`
preservation sidecars that survive derived files (:1080-1200), and the
oversized-value auto-heal (:16, :40-70).

JPEG EXIF write-through splices the APP1 segment directly into the encoded
file — no re-encode, matching the reference's lossless metadata copy.
"""

from __future__ import annotations

import json
import struct
from pathlib import Path

_GPS_IFD_TAG = 0x8825
_MAX_VALUE_LEN = 500
RREXIF_EXT = ".rrexif"


def read_exif_tags(path: str | Path) -> dict:
    """Human-readable tag dict (auto-healed to <=500 chars per value)."""
    from PIL import Image
    from PIL.ExifTags import TAGS, GPSTAGS

    low = str(path).lower()
    if low.endswith(".cr3"):
        # PIL can't open CR3; the container parser extracts CMT metadata
        try:
            from rapidraw_tpu.io.cr3 import parse_cr3_info

            info = parse_cr3_info(Path(path).read_bytes())
            return {k: str(v)[:_MAX_VALUE_LEN] for k, v in info.exif.items()}
        except Exception:
            return {}
    if low.endswith(".x3f"):
        # PIL can't open X3F; camera metadata lives in the PROP section
        try:
            from rapidraw_tpu.io.x3f import x3f_exif_tags

            return x3f_exif_tags(Path(path).read_bytes())
        except Exception:
            return {}
    if low.endswith(".crw"):
        # PIL can't open CIFF; make/model live in the heap records
        try:
            from rapidraw_tpu.io.ciff import crw_exif_tags

            return crw_exif_tags(Path(path).read_bytes())
        except Exception:
            return {}

    out: dict = {}
    try:
        with Image.open(path) as im:
            exif = im.getexif()
            merged = dict(exif)
            try:
                merged.update(exif.get_ifd(0x8769))
            except Exception:
                pass
            gps = {}
            try:
                gps = dict(exif.get_ifd(_GPS_IFD_TAG))
            except Exception:
                pass
            for tag, value in merged.items():
                name = TAGS.get(tag, f"Tag{tag:04X}")
                sv = _stringify(value)
                if sv is not None:
                    out[name] = sv[:_MAX_VALUE_LEN]
            for tag, value in gps.items():
                name = "GPS" + GPSTAGS.get(tag, f"Tag{tag:04X}")
                sv = _stringify(value)
                if sv is not None:
                    out[name] = sv[:_MAX_VALUE_LEN]
    except Exception:
        pass
    return out


def _stringify(value) -> str | None:
    if isinstance(value, bytes):
        try:
            return value.decode("utf-8", "replace").strip("\x00")
        except Exception:
            return None
    if isinstance(value, (list, tuple)):
        return ", ".join(str(v) for v in value)
    return str(value)


def read_exif_bytes(path: str | Path) -> bytes | None:
    """Raw EXIF TIFF payload from a JPEG/TIFF file (for lossless copy)."""
    from PIL import Image

    try:
        with Image.open(path) as im:
            raw = im.info.get("exif")
            if raw:
                return raw
            exif = im.getexif()
            if len(exif):
                return exif.tobytes()
    except Exception:
        pass
    return None


def _tobytes_raw(exif) -> bytes:
    """Image.Exif.tobytes() with the 'Exif\\x00\\x00' prefix stripped —
    the module convention is raw TIFF payloads (PNG eXIf / WebP EXIF chunks
    are spec-invalid with the prefix; JPEG splice re-adds it)."""
    raw = exif.tobytes()
    return raw[6:] if raw.startswith(b"Exif\x00\x00") else raw


def strip_gps(exif_payload: bytes) -> bytes:
    """Remove the GPS IFD from an EXIF payload (export_processing.rs GPS
    strip behavior). GPS-less payloads return UNCHANGED — re-serializing
    through PIL would lossily rewrite MakerNote offsets and drop tags PIL
    can't round-trip."""
    from PIL import Image

    exif = Image.Exif()
    try:
        exif.load(exif_payload)
    except Exception:
        return exif_payload
    if _GPS_IFD_TAG not in exif:
        return exif_payload
    del exif[_GPS_IFD_TAG]
    try:
        return _tobytes_raw(exif)
    except Exception:
        return exif_payload


def _reset_orientation(exif_payload: bytes) -> bytes:
    """Patch IFD0's Orientation (0x0112) to 1 IN PLACE (byte-level, no
    re-serialization): exported pixels already have the orientation baked
    in (io/loader apply-orientation), so carrying the source value makes
    EXIF-aware viewers rotate a second time. The reference does the same
    (exif_processing.rs:1064 sets Orientation = 1 on every export)."""
    try:
        endian = {"II": "<", "MM": ">"}.get(exif_payload[:2].decode("ascii", "ignore"))
        if endian is None:
            return exif_payload
        (ifd0,) = struct.unpack_from(endian + "I", exif_payload, 4)
        (count,) = struct.unpack_from(endian + "H", exif_payload, ifd0)
        buf = bytearray(exif_payload)
        pos = ifd0 + 2
        for _ in range(count):
            tag, typ, n = struct.unpack_from(endian + "HHI", buf, pos)
            if tag == 0x0112 and typ == 3 and n == 1:
                struct.pack_into(endian + "H", buf, pos + 8, 1)
                return bytes(buf)
            pos += 12
        return exif_payload
    except (struct.error, IndexError):
        return exif_payload


def splice_exif_into_jpeg(jpeg_path: str | Path, exif_payload: bytes) -> None:
    """Insert/replace the APP1 Exif segment of an encoded JPEG in place —
    lossless metadata write-through."""
    p = Path(jpeg_path)
    data = p.read_bytes()
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG file")
    if not exif_payload.startswith(b"Exif\x00\x00"):
        exif_payload = b"Exif\x00\x00" + exif_payload
    if len(exif_payload) + 2 > 0xFFFF:  # APP1 16-bit length limit
        raise ValueError(
            f"EXIF payload {len(exif_payload)}B exceeds the 64KB APP1 limit"
        )
    seg = b"\xff\xe1" + struct.pack(">H", len(exif_payload) + 2) + exif_payload

    # walk segments after SOI; drop any existing APP1-Exif, insert ours first
    out = [data[:2], seg]
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            break
        marker = data[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xDA:  # start of scan: copy the rest verbatim
            break
        (ln,) = struct.unpack_from(">H", data, pos + 2)
        segment = data[pos : pos + 2 + ln]
        is_exif_app1 = marker == 0xE1 and segment[4:10] == b"Exif\x00\x00"
        if not is_exif_app1:
            out.append(segment)
        pos += 2 + ln
    out.append(data[pos:])
    p.write_bytes(b"".join(out))


def splice_exif_into_png(png_path: str | Path, exif_payload: bytes) -> None:
    """Insert/replace the PNG eXIf chunk (PNG 1.5 extension) in place —
    chunk payload is the raw TIFF EXIF structure."""
    import zlib

    p = Path(png_path)
    data = p.read_bytes()
    sig = b"\x89PNG\r\n\x1a\n"
    if data[:8] != sig:
        raise ValueError("not a PNG file")
    chunk = b"eXIf" + exif_payload
    exif_chunk = (
        struct.pack(">I", len(exif_payload)) + chunk
        + struct.pack(">I", zlib.crc32(chunk) & 0xFFFFFFFF)
    )
    out = [sig]
    pos = 8
    inserted = False
    while pos + 8 <= len(data):
        (ln,) = struct.unpack_from(">I", data, pos)
        ctype = data[pos + 4 : pos + 8]
        seg = data[pos : pos + 12 + ln]
        if ctype != b"eXIf":  # drop any existing eXIf
            out.append(seg)
        pos += 12 + ln
        if ctype == b"IHDR" and not inserted:
            out.append(exif_chunk)
            inserted = True
    p.write_bytes(b"".join(out))


def splice_exif_into_webp(webp_path: str | Path, exif_payload: bytes) -> None:
    """Insert/replace the RIFF 'EXIF' chunk in place, creating/patching the
    VP8X header with the EXIF flag (WebP container spec) — no re-encode."""
    p = Path(webp_path)
    data = p.read_bytes()
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP file")

    # collect existing chunks
    chunks = []
    pos = 12
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (ln,) = struct.unpack_from("<I", data, pos + 4)
        payload = data[pos + 8 : pos + 8 + ln]
        chunks.append((tag, payload))
        pos += 8 + ln + (ln & 1)

    chunks = [(t, c) for t, c in chunks if t != b"EXIF"]
    vp8x = None
    rest = []
    for t, c in chunks:
        if t == b"VP8X":
            vp8x = bytearray(c)
        else:
            rest.append((t, c))
    if vp8x is None:
        from PIL import Image

        with Image.open(p) as im:
            w, h = im.size
            has_alpha = im.mode in ("RGBA", "LA", "PA")
        vp8x = bytearray(10)
        vp8x[4:7] = struct.pack("<I", w - 1)[:3]
        vp8x[7:10] = struct.pack("<I", h - 1)[:3]
        if has_alpha or any(t == b"ALPH" for t, _ in rest):
            # preserve transparency visibility when synthesizing the
            # header (readers trust the VP8X alpha bit)
            vp8x[0] |= 0x10
    vp8x[0] |= 0x08  # EXIF flag
    ordered = [(b"VP8X", bytes(vp8x))] + rest + [(b"EXIF", exif_payload)]

    body = bytearray(b"WEBP")
    for t, c in ordered:
        body += t + struct.pack("<I", len(c)) + c
        if len(c) & 1:
            body += b"\0"
    p.write_bytes(b"RIFF" + struct.pack("<I", len(body)) + bytes(body))


def merge_exif_into_tiff(tiff_path: str | Path, exif_payload: bytes) -> None:
    """Write EXIF tags into an exported TIFF with a merged IFD0. Main-IFD
    and Exif-IFD tags are flattened into IFD0 (legal per TIFF/EP; the
    reference writes through little_exif, exif_processing.rs:669-1073).

    16-bit exports (the default TIFF depth, export_processing.rs:455-459)
    are rewritten through io.encode.write_tiff16 — a PIL re-save would
    silently truncate the pixels to 8 bits. 8-bit TIFFs keep the lossless
    PIL re-encode."""
    from PIL import Image

    exif = Image.Exif()
    exif.load(exif_payload)
    p = Path(tiff_path)
    merged = dict(exif)
    try:
        merged.update(exif.get_ifd(0x8769))
    except Exception:
        pass
    # never carry over structural tags describing the SOURCE encoding
    skip = {0x8769, _GPS_IFD_TAG, 0x0100, 0x0101, 0x0102, 0x0103,
            0x0106, 0x0111, 0x0115, 0x0116, 0x0117, 0x011C}
    tags = {
        tag: value
        for tag, value in merged.items()
        if tag not in skip and not isinstance(value, dict)
    }
    tags[0x0112] = 1  # pixels are upright (exif_processing.rs:1064)

    from rapidraw_tpu.io.encode import read_tiff16_rgb, write_tiff16

    arr16 = read_tiff16_rgb(p)
    if arr16 is not None:
        write_tiff16(p, arr16, extra_tags=tags)
        return

    from PIL.TiffImagePlugin import ImageFileDirectory_v2

    with Image.open(p) as im:
        im.load()
        ifd = ImageFileDirectory_v2()
        for tag, value in tags.items():
            try:
                ifd[tag] = value
            except Exception:
                continue
        out = im.copy()
        out.save(p, "TIFF", tiffinfo=ifd)


def _coerce_tag_value(tag_id: int, value):
    """Convert a sidecar-stringified value back to the tag's declared TIFF
    type so PIL can serialize it (read_exif_tags stores everything through
    _stringify: ints as "6", rationals as "1/100", tuples as "a, b")."""
    if not isinstance(value, str):
        return value
    from PIL.TiffTags import TAGS_V2

    info = TAGS_V2.get(tag_id)
    if info is None or info.type == 2:  # ASCII / unknown: keep the string
        return value
    s = value.strip()
    parts = [p.strip() for p in s.split(",")] if "," in s else [s]
    t = info.type
    if t in (1, 3, 4, 6, 8, 9):  # BYTE/SHORT/LONG/SBYTE/SSHORT/SLONG
        vals = tuple(int(float(p)) for p in parts)
    elif t in (5, 10):  # RATIONAL / SRATIONAL
        from PIL.TiffImagePlugin import IFDRational

        def rat(p: str):
            if "/" in p:
                num, den = p.split("/", 1)
                return IFDRational(int(num), int(den))
            return IFDRational(float(p))

        vals = tuple(rat(p) for p in parts)
    elif t in (11, 12):  # FLOAT / DOUBLE
        vals = tuple(float(p) for p in parts)
    elif t == 7:  # UNDEFINED
        return s.encode("utf-8", "replace")
    else:
        return value
    return vals[0] if len(vals) == 1 else vals


def _payload_from_tag_dict(tags: dict) -> bytes | None:
    """Serialize a human-readable tag dict (the sidecar's exif block) into
    a binary EXIF payload via PIL — the export write-through for
    user-EDITED metadata (the reference prefers the sidecar map over the
    file's own EXIF, exif_processing.rs:708). Values are coerced back to
    their declared TIFF types and probed per-tag, so one untypable value
    (a stringified numeric PIL refuses) drops THAT tag, not the whole
    edited payload."""
    from PIL import Image
    from PIL.ExifTags import TAGS

    name_to_id = {v: k for k, v in TAGS.items()}
    exif = Image.Exif()
    wrote = False
    for name, value in tags.items():
        tag_id = name_to_id.get(str(name))
        if tag_id is None:
            continue
        try:
            coerced = _coerce_tag_value(tag_id, value)
        except (ValueError, TypeError, ZeroDivisionError):
            coerced = value
        probe = Image.Exif()
        try:
            probe[tag_id] = coerced
            probe.tobytes()
        except Exception:  # noqa: BLE001 — untypable value for this tag
            continue
        exif[tag_id] = coerced
        wrote = True
    if not wrote:
        return None
    try:
        return _tobytes_raw(exif)
    except Exception:  # noqa: BLE001
        return None


def copy_exif(
    src: str | Path, dst: str | Path, strip_gps_data: bool = True, software: str | None = None
) -> bool:
    """Copy EXIF from src onto an exported dst: lossless segment/chunk
    splice for JPEG/PNG/WebP, merged-IFD re-save for TIFF; Orientation is
    reset to 1 (the pixels are upright — exif_processing.rs:1064).

    Mirrors export_processing.rs:297-303 + :669-1073. AVIF/JXL return
    False (no metadata writer; the .rrexif sidecar still preserves the
    source EXIF for derived files).
    """
    payload = read_exif_bytes(src)
    # user-EDITED metadata lives in the sidecar's exif dict (update_exif_
    # fields); when it differs from the file's own tags, the edited values
    # win on export (exif_processing.rs:708 prefers the sidecar map). The
    # lossless verbatim splice remains the path for unedited sources.
    try:
        from rapidraw_tpu.io.sidecar import load_sidecar

        side = load_sidecar(src).get("exif")
        if isinstance(side, dict) and side and side != read_exif_tags(src):
            built = _payload_from_tag_dict(side)
            if built is not None:
                payload = built
    except Exception:  # noqa: BLE001 — sidecar issues never fail the copy
        pass
    if payload is None:
        return False
    if payload.startswith(b"Exif\x00\x00"):
        payload = payload[6:]
    if strip_gps_data:
        payload = strip_gps(payload)
    payload = _reset_orientation(payload)
    if software:
        from PIL import Image

        exif = Image.Exif()
        try:
            exif.load(payload)
            exif[0x0131] = software  # Software tag
            payload = _tobytes_raw(exif)
        except Exception:
            pass
    dstp = Path(dst)
    ext = dstp.suffix.lower()
    try:
        if ext in (".jpg", ".jpeg"):
            splice_exif_into_jpeg(dstp, payload)
        elif ext == ".png":
            splice_exif_into_png(dstp, payload)
        elif ext == ".webp":
            splice_exif_into_webp(dstp, payload)
        elif ext in (".tif", ".tiff"):
            merge_exif_into_tiff(dstp, payload)
        else:
            return False
        return True
    except Exception:
        return False


def persist_exif_if_missing(image_path: str | Path) -> None:
    """Store the source's EXIF tag dict into its .rrdata sidecar on first
    load (exif_processing.rs:1151-1200 / image_loader.rs:81): EXIF then
    survives even if another tool later strips the source. Migrates a
    legacy .rrexif sidecar when present; no-op when the sidecar already
    carries exif or the source has none. Never raises (read-only dirs,
    malformed files)."""
    try:
        from rapidraw_tpu.io.sidecar import load_sidecar, save_sidecar

        meta = load_sidecar(image_path)
        if meta.get("exif"):
            return
        legacy = load_rrexif_sidecar(image_path)
        tags = (legacy or {}).get("exif") or read_exif_tags(image_path)
        if not tags:
            return
        meta["exif"] = tags
        save_sidecar(image_path, meta)
        if legacy is not None:
            Path(str(image_path) + RREXIF_EXT).unlink(missing_ok=True)
    except Exception:  # noqa: BLE001 — preservation is best-effort
        return


def write_rrexif_sidecar(src_image: str | Path, derived_file: str | Path) -> None:
    """Preserve source EXIF next to a derived file (exif_processing.rs:
    1080-1200): '<derived>.rrexif' with the tag dict + raw payload ref."""
    tags = read_exif_tags(src_image)
    sidecar = Path(str(derived_file) + RREXIF_EXT)
    sidecar.write_text(
        json.dumps({"source": str(src_image), "exif": tags}, indent=2, ensure_ascii=False)
    )


def load_rrexif_sidecar(derived_file: str | Path) -> dict | None:
    sidecar = Path(str(derived_file) + RREXIF_EXT)
    if not sidecar.exists():
        return None
    try:
        return json.loads(sidecar.read_text())
    except (OSError, json.JSONDecodeError):
        return None


def get_creation_date(path: str | Path):
    """Capture datetime: EXIF DateTimeOriginal, falling back through
    DateTimeDigitized/DateTime to the filesystem mtime
    (exif_processing.rs get_creation_date_from_path)."""
    import datetime as _dt

    tags = read_exif_tags(path)
    for key in ("DateTimeOriginal", "DateTimeDigitized", "DateTime"):
        raw = tags.get(key)
        if not raw:
            continue
        try:
            return _dt.datetime.strptime(raw.strip(), "%Y:%m:%d %H:%M:%S")
        except ValueError:
            continue
    try:
        return _dt.datetime.fromtimestamp(Path(path).stat().st_mtime)
    except OSError:
        return _dt.datetime.now()


def effective_exif_tags(path: str | Path) -> dict:
    """The tags a user actually sees: the sidecar's exif block (where
    update_exif_fields persists edits, file_management.rs:235-277) takes
    precedence, then the .rrexif companion, then the file's own EXIF —
    the same seeding order update_exif_fields uses."""
    from rapidraw_tpu.io.sidecar import load_sidecar

    exif = load_sidecar(path).get("exif")
    if isinstance(exif, dict):
        return dict(exif)
    rr = load_rrexif_sidecar(path)
    if rr and isinstance(rr.get("exif"), dict):
        return dict(rr["exif"])
    return read_exif_tags(path)


def update_exif_fields(paths: list[str | Path], updates: dict[str, str]) -> None:
    """Field-level EXIF edits persisted to the .rrdata sidecar
    (file_management.rs:235-277): seed the dict from the sidecar's exif
    block, else the .rrexif companion, else the file's own EXIF; apply
    `updates` (trimmed; an empty value deletes the key); write back."""
    from rapidraw_tpu.io.sidecar import load_sidecar, save_sidecar

    for path in paths:
        meta = load_sidecar(path)
        exif = meta.get("exif")
        if not isinstance(exif, dict):
            rr = load_rrexif_sidecar(path)
            if rr and isinstance(rr.get("exif"), dict):
                exif = dict(rr["exif"])
            else:
                exif = read_exif_tags(path)
        for k, v in updates.items():
            trimmed = str(v).strip()
            if not trimmed:
                exif.pop(k, None)
            else:
                exif[k] = trimmed
        meta["exif"] = exif
        save_sidecar(path, meta)
