"""Library services: catalog, presets, thumbnails, EXIF."""

import numpy as np
from PIL import Image

from rapidraw_tpu.io.exif import copy_exif, read_exif_tags, write_rrexif_sidecar
from rapidraw_tpu.io.sidecar import load_sidecar, save_sidecar
from rapidraw_tpu.library.catalog import (
    Albums,
    create_virtual_copy,
    delete_image,
    folder_children,
    get_rating,
    list_images,
    move_image,
    rename_image,
    set_color_label,
    set_rating,
)
from rapidraw_tpu.library.presets import PresetStore, apply_preset
from rapidraw_tpu.library.thumbnails import generate_thumbnail, thumbnail_cache_key


def _jpg(path, h=32, w=48, exif=None):
    arr = (np.random.default_rng(0).random((h, w, 3)) * 255).astype(np.uint8)
    im = Image.fromarray(arr)
    kw = {"quality": 92}
    if exif is not None:
        kw["exif"] = exif
    im.save(path, **kw)
    return path


def test_catalog_listing_and_vc(tmp_path):
    (tmp_path / "sub").mkdir()
    _jpg(tmp_path / "a.jpg")
    _jpg(tmp_path / "sub" / "b.jpg")
    (tmp_path / "notes.txt").write_text("x")
    assert [n.name for n in folder_children(tmp_path)] == ["sub"]
    flat = list_images(tmp_path)
    assert [p.split("/")[-1] for p in flat] == ["a.jpg"]
    rec = list_images(tmp_path, recursive=True)
    assert len(rec) == 2

    vc = create_virtual_copy(str(tmp_path / "a.jpg"))
    assert vc.endswith("?vc=1")
    assert len(list_images(tmp_path)) == 2  # virtual copy shows up


def test_catalog_file_ops_keep_sidecars(tmp_path):
    src = _jpg(tmp_path / "a.jpg")
    save_sidecar(src, {"rating": 3, "adjustments": {"exposure": 1}})
    dst_dir = tmp_path / "out"
    moved = move_image(src, dst_dir)
    assert (dst_dir / "a.jpg.rrdata").exists()
    renamed = rename_image(moved, "b")
    assert renamed.endswith("b.jpg")
    assert (dst_dir / "b.jpg.rrdata").exists()
    assert get_rating(renamed) == 3
    delete_image(renamed)
    assert not (dst_dir / "b.jpg").exists()
    assert not (dst_dir / "b.jpg.rrdata").exists()


def test_ratings_labels(tmp_path):
    p = _jpg(tmp_path / "a.jpg")
    set_rating(p, 9)
    assert get_rating(p) == 5  # clamped
    set_color_label(p, "red")
    assert load_sidecar(p)["colorLabel"] == "red"


def test_albums(tmp_path):
    a = Albums(tmp_path / "albums.json")
    a.create("trip")
    a.add("trip", ["x.jpg", "y.jpg"])
    a.add("trip", ["x.jpg"])  # dedup
    assert a.images("trip") == ["x.jpg", "y.jpg"]
    a2 = Albums(tmp_path / "albums.json")  # persistence
    assert a2.images("trip") == ["x.jpg", "y.jpg"]
    a2.remove("trip", ["x.jpg"])
    assert a2.images("trip") == ["y.jpg"]


def test_presets(tmp_path):
    store = PresetStore(tmp_path / "presets.json")
    store.add("Punchy", {"contrast": 30, "vibrance": 20, "curves": {"luma": []}})
    assert store.get("Punchy")["adjustments"]["contrast"] == 30

    merged = apply_preset({"exposure": 1.0}, store.get("Punchy")["adjustments"])
    assert merged["contrast"] == 30 and merged["exposure"] == 1.0

    # section-restricted apply: only 'color' keys
    merged2 = apply_preset({}, store.get("Punchy")["adjustments"], sections=["color"])
    assert "vibrance" in merged2 and "contrast" not in merged2

    # community import
    (tmp_path / "community.json").write_text(
        '[{"name": "Film", "adjustments": {"grainAmount": 40}}]'
    )
    imported = store.import_file(tmp_path / "community.json")
    assert imported[0]["name"] == "Film"
    assert store.get("Film")


def test_thumbnail_cache(tmp_path):
    p = _jpg(tmp_path / "a.jpg", h=64, w=96)
    save_sidecar(p, {"adjustments": {"exposure": 1.0}})
    cache = tmp_path / "cache"
    key1 = thumbnail_cache_key(str(p), {"exposure": 1.0})
    data1 = generate_thumbnail(str(p), resolution=48, cache_dir=cache)
    assert data1[:2] == b"\xff\xd8"  # JPEG
    assert (cache / f"{key1}.jpg").exists() or list(cache.glob("*.jpg"))
    data2 = generate_thumbnail(str(p), resolution=48, cache_dir=cache)
    assert data1 == data2  # cache hit
    im = Image.open(__import__("io").BytesIO(data1))
    assert max(im.size) == 48


def test_exif_copy_with_gps_strip(tmp_path):
    exif = Image.Exif()
    exif[0x010F] = "AcmeCam"  # Make
    exif[0x8825] = {1: "N", 16: "T"}  # GPS IFD (latitude ref / img direction ref)
    src = _jpg(tmp_path / "src.jpg", exif=exif)
    tags = read_exif_tags(src)
    assert tags.get("Make") == "AcmeCam"

    dst = _jpg(tmp_path / "dst.jpg")
    assert copy_exif(src, dst, strip_gps_data=True)
    tags2 = read_exif_tags(dst)
    assert tags2.get("Make") == "AcmeCam"
    assert not any(k.startswith("GPS") for k in tags2)
    # image pixels untouched by the splice
    assert np.asarray(Image.open(dst)).shape == (32, 48, 3)

    write_rrexif_sidecar(src, dst)
    assert (tmp_path / "dst.jpg.rrexif").exists()


def test_is_image_edited():
    from rapidraw_tpu.params.parse import is_image_edited

    assert not is_image_edited({})
    assert not is_image_edited(None)
    # defaults written out explicitly are still unedited
    assert not is_image_edited({"exposure": 0, "contrast": 0})
    assert is_image_edited({"exposure": 0.5})
    assert is_image_edited({"orientationSteps": 1})
    assert is_image_edited({"flipHorizontal": True})
    assert is_image_edited({"rotation": 1.0})
    assert is_image_edited({"crop": {"x": 10, "y": 0, "width": 5, "height": 5}})
    assert is_image_edited({"masks": [{"visible": True}]})
    assert is_image_edited({"transformRotate": 2.0})
    # sectionVisibility off neutralizes the section's sliders
    assert not is_image_edited(
        {"exposure": 1.0, "sectionVisibility": {"basic": False}}
    )


def test_unedited_thumbnail_skips_develop(tmp_path, monkeypatch):
    import numpy as np
    from PIL import Image

    from rapidraw_tpu.library.thumbnails import generate_thumbnail

    p = tmp_path / "plain.jpg"
    rng = np.random.default_rng(0)
    Image.fromarray((rng.random((48, 64, 3)) * 255).astype(np.uint8)).save(p)

    import rapidraw_tpu.pipeline.develop as dev

    def boom(*a, **k):  # pragma: no cover - fails the test if reached
        raise AssertionError("develop must not run for unedited LDR thumbnails")

    monkeypatch.setattr(dev, "develop", boom)
    data = generate_thumbnail(str(p), resolution=32)
    assert data[:2] == b"\xff\xd8"


def test_exif_write_through_all_formats(tmp_path):
    """PNG (eXIf chunk), WebP (RIFF EXIF + VP8X), TIFF (merged IFD0) all
    round-trip EXIF from the source with GPS stripped
    (exif_processing.rs:669-1073 writes through every encode format)."""
    exif = Image.Exif()
    exif[0x010F] = "AcmeCam"  # Make
    exif[0x0110] = "Model-X"  # Model
    exif[0x8825] = {1: "N", 16: "T"}  # GPS IFD
    src = _jpg(tmp_path / "src.jpg", exif=exif)

    arr = (np.random.default_rng(0).random((32, 48, 3)) * 255).astype(np.uint8)
    for ext, fmt in (("png", "PNG"), ("webp", "WEBP"), ("tif", "TIFF")):
        dst = tmp_path / f"out.{ext}"
        Image.fromarray(arr).save(dst, fmt)
        assert copy_exif(src, dst, strip_gps_data=True), ext
        tags = read_exif_tags(dst)
        assert tags.get("Make") == "AcmeCam", (ext, tags)
        assert tags.get("Model") == "Model-X", (ext, tags)
        assert not any(k.startswith("GPS") for k in tags), (ext, tags)
        # pixels survive the metadata write (TIFF re-save is lossless)
        back = np.asarray(Image.open(dst).convert("RGB"))
        if ext != "webp":  # webp encode was already lossy before the splice
            np.testing.assert_array_equal(back, arr)
        else:
            assert back.shape == arr.shape


def test_cr3_thumbnail_from_embedded_preview(tmp_path):
    """CR3 raw decode is refused (crx unpublished), but the thumbnail path
    serves the container's embedded PRVW JPEG so library browsing works."""
    import io as _io
    import struct
    import sys

    sys.path.insert(0, str(tmp_path.parent))  # noqa: keep local imports sane
    from rapidraw_tpu.io.cr3 import CANON_UUID
    from rapidraw_tpu.library.thumbnails import generate_thumbnail

    # preview JPEG
    buf = _io.BytesIO()
    Image.fromarray(
        (np.random.default_rng(0).random((120, 160, 3)) * 255).astype(np.uint8)
    ).save(buf, "JPEG")
    jpeg = buf.getvalue()

    def box(btype, payload):
        return struct.pack(">I", 8 + len(payload)) + btype + payload

    # PRVW payload: 4 unknown + u16 unknown + u16 w + u16 h + u16 unknown
    # + u32 jpeg length at offset 12, jpeg at 16 (io/cr3.py)
    payload = (b"\0" * 4 + struct.pack(">HHH", 0, 160, 120) + b"\0\0"
               + struct.pack(">I", len(jpeg)) + jpeg)
    prvw = box(b"PRVW", payload)
    canon = box(b"uuid", CANON_UUID + prvw)
    moov = box(b"moov", canon)
    ftyp = box(b"ftyp", b"crx " + b"\0\0\0\x01" + b"crx isom")
    p = tmp_path / "shot.cr3"
    p.write_bytes(ftyp + moov)

    data = generate_thumbnail(str(p), resolution=64, cache_dir=tmp_path / "c")
    assert data[:2] == b"\xff\xd8"
    im = Image.open(_io.BytesIO(data))
    assert max(im.size) == 64


def test_png_exif_chunk_is_raw_tiff_even_after_gps_strip(tmp_path):
    """PNG eXIf chunk data must start with the raw TIFF header, never the
    JPEG-only 'Exif\\x00\\x00' prefix — including when the GPS strip
    re-serializes the payload (the spec-invalid prefix broke conforming
    readers)."""
    import struct

    exif = Image.Exif()
    exif[0x010F] = "AcmeCam"
    exif[0x8825] = {1: "N", 16: "T"}  # GPS present: strip path re-encodes
    src = _jpg(tmp_path / "src.jpg", exif=exif)
    arr = (np.random.default_rng(1).random((16, 16, 3)) * 255).astype(np.uint8)
    dst = tmp_path / "o.png"
    Image.fromarray(arr).save(dst, "PNG")
    assert copy_exif(src, dst, strip_gps_data=True)
    data = dst.read_bytes()
    pos = 8
    payload = None
    while pos + 8 <= len(data):
        (ln,) = struct.unpack_from(">I", data, pos)
        if data[pos + 4 : pos + 8] == b"eXIf":
            payload = data[pos + 8 : pos + 8 + ln]
            break
        pos += 12 + ln
    assert payload is not None
    assert payload[:2] in (b"II", b"MM"), payload[:8]
    assert not payload.startswith(b"Exif\x00\x00")


def test_gps_less_copy_is_byte_lossless(tmp_path):
    """strip_gps on a GPS-less payload must be the identity — PIL
    re-serialization would corrupt MakerNote offsets."""
    from rapidraw_tpu.io.exif import strip_gps

    exif = Image.Exif()
    exif[0x010F] = "AcmeCam"
    src = _jpg(tmp_path / "src.jpg", exif=exif)
    from rapidraw_tpu.io.exif import read_exif_bytes

    payload = read_exif_bytes(src)
    if payload.startswith(b"Exif\x00\x00"):
        payload = payload[6:]
    assert strip_gps(payload) == payload


def test_thumbnail_cache_key_includes_resolution(tmp_path):
    p = _jpg(tmp_path / "r.jpg")
    assert thumbnail_cache_key(p, {}, 240) != thumbnail_cache_key(p, {}, 1440)
    # and generate_thumbnail at two sizes returns two different renders
    d = tmp_path / "cache"
    small = generate_thumbnail(p, resolution=16, cache_dir=d)
    big = generate_thumbnail(p, resolution=32, cache_dir=d)
    from PIL import Image as _I
    import io as _io
    assert max(_I.open(_io.BytesIO(small)).size) == 16
    assert max(_I.open(_io.BytesIO(big)).size) == 32


def test_raw_thumbnail_crop_uses_loaded_scale(tmp_path):
    """The fast RAW decode is 2x2-binned (half resolution); the sidecar's
    full-res crop rect must be scaled into the loaded space or the
    thumbnail frames the wrong half of the image
    (file_management.rs:1184-1215 raw_scale_factor)."""
    import io as _io

    import numpy as np
    from PIL import Image

    from tests.test_raw_containers import Ifd, _cfa_ifd, _pack_msb, build_tiff
    from rapidraw_tpu.io.sidecar import save_sidecar
    from rapidraw_tpu.library.thumbnails import generate_thumbnail

    # left half dark, right half bright (full-res 32x64)
    cfa = np.full((32, 64), 200, np.uint16)
    cfa[:, 32:] = 3800
    p = tmp_path / "t.dng"
    p.write_bytes(build_tiff([_cfa_ifd(64, 32, 12, 1, _pack_msb(cfa, 12))]))

    save_sidecar(p, {"adjustments": {
        "crop": {"x": 32, "y": 0, "width": 32, "height": 32},
        "exposure": 0.01,  # force the edited (develop) path
    }})
    data = generate_thumbnail(str(p), resolution=64)
    thumb = np.asarray(Image.open(_io.BytesIO(data)), np.float32) / 255.0
    # the right (bright) half was cropped: the thumb must be bright overall
    assert thumb.mean() > 0.5, f"thumb mean {thumb.mean():.3f} — wrong crop half"


def test_preset_export_import_roundtrip(tmp_path):
    """import_file must unwrap the {"creator", "presets": [...]} document
    export_presets_to_file writes (a round-trip silently imported zero
    presets before)."""
    from rapidraw_tpu.library.presets import PresetStore, export_presets_to_file

    store = PresetStore(tmp_path / "a.json")
    store.add("warm", {"temperature": 20, "exposure": 0.3})
    store.add("cool", {"temperature": -15})
    out = tmp_path / "shared.json"
    export_presets_to_file(store.list(), out)

    store2 = PresetStore(tmp_path / "b.json")
    imported = store2.import_file(out)
    assert sorted(p["name"] for p in imported) == ["cool", "warm"]


def test_copy_image_carries_sidecars(tmp_path):
    """copy_files/duplicate_file counterpart (COMMANDS.md): copying brings
    the .rrdata sidecar along."""
    from PIL import Image

    from rapidraw_tpu.io.sidecar import load_adjustments, save_sidecar
    from rapidraw_tpu.library.catalog import copy_image

    src = tmp_path / "a" / "pic.jpg"
    src.parent.mkdir()
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(src)
    save_sidecar(src, {"adjustments": {"exposure": 0.7}})

    from pathlib import Path

    dst_dir = tmp_path / "b"
    out = copy_image(str(src), dst_dir)
    assert Path(out).exists()
    assert load_adjustments(out) == {"exposure": 0.7}
    assert src.exists()  # copy, not move


def test_generate_thumbnails_batch_isolation_and_cancel(tmp_path):
    """Batch thumbnails: per-image failure isolation (a corrupt file keeps
    the completed results) and cancellation between items."""
    from PIL import Image

    from rapidraw_tpu.library.thumbnails import generate_thumbnails
    from rapidraw_tpu.utils.recovery import CancellationToken

    good1 = tmp_path / "g1.jpg"
    good2 = tmp_path / "g2.jpg"
    bad = tmp_path / "bad.jpg"
    for p in (good1, good2):
        Image.fromarray(np.full((16, 24, 3), 128, np.uint8)).save(p)
    bad.write_bytes(b"not a jpeg at all")

    out = generate_thumbnails([str(good1), str(bad), str(good2)], resolution=16)
    assert set(out) == {str(good1), str(good2)}
    assert all(isinstance(v, bytes) and v for v in out.values())

    tok = CancellationToken()
    seen = []

    def progress(done, n, p):
        # progress is completion-based: cancel after the FIRST finished
        # thumbnail — the walk must stop before the second one
        seen.append((done, p))
        if done == 1:
            tok.cancel()

    out2 = generate_thumbnails([str(good1), str(good2)], resolution=16,
                               cancel=tok, progress=progress)
    assert len(out2) == 1 and len(seen) == 1


def test_generate_thumbnails_batched_matches_serial(tmp_path):
    """Round 5 (VERDICT r4 #5): generate_thumbnails groups same-shape,
    same-bucket jobs through ONE develop_batch launch — outputs must be
    byte-identical to the per-path generate_thumbnail serial renders, with
    odd shapes and LUT docs falling back to singles in the same call."""
    from PIL import Image

    from rapidraw_tpu.library.thumbnails import (
        generate_thumbnail,
        generate_thumbnails,
    )

    rng = np.random.default_rng(3)
    same_shape = []
    for i in range(3):
        p = tmp_path / f"b{i}.jpg"
        Image.fromarray(
            (rng.random((48, 64, 3)) * 255).astype(np.uint8)
        ).save(p, quality=95)
        save_sidecar(p, {"adjustments": {"exposure": 0.3 + 0.2 * i,
                                         "contrast": 10 * i,
                                         "toneMapper": "agx"}})
        same_shape.append(str(p))
    # a different aspect lands in its own bucket (and a batch of one)
    odd = tmp_path / "odd.jpg"
    Image.fromarray((rng.random((64, 40, 3)) * 255).astype(np.uint8)).save(
        odd, quality=95
    )
    save_sidecar(odd, {"adjustments": {"exposure": 0.5, "toneMapper": "agx"}})
    paths = same_shape + [str(odd)]

    serial = {p: generate_thumbnail(p, resolution=32) for p in paths}
    ticks = []
    batched = generate_thumbnails(
        paths, resolution=32,
        progress=lambda done, n, p: ticks.append((done, n)),
    )
    assert set(batched) == set(paths)
    for p in paths:
        assert batched[p] == serial[p], f"batched != serial for {p}"
    # per-image progress must survive batching: one completion tick per
    # image (monotone) + the terminal signal — not one tick per bucket
    assert ticks == [(1, 4), (2, 4), (3, 4), (4, 4), (4, 4)]


def test_thumbnail_honors_app_settings(tmp_path):
    """Thumbnails render under the user's app settings like the reference
    (file_management.rs:1092,:1317 load settings per call): flipping the
    tonemapper override changes the rendered bytes, and the cache key
    includes the settings so the old render is not served back."""
    import json as _json
    import os

    p = _jpg(tmp_path / "a.jpg", h=64, w=96)
    save_sidecar(p, {"adjustments": {"exposure": 0.8, "contrast": 30}})
    cache = tmp_path / "cache"

    default = generate_thumbnail(str(p), resolution=48, cache_dir=cache)

    data_dir = tmp_path / "_appdata"  # conftest points RAPIDRAW_DATA_DIR here
    assert os.environ["RAPIDRAW_DATA_DIR"] == str(data_dir)
    data_dir.mkdir(parents=True, exist_ok=True)
    (data_dir / "settings.json").write_text(_json.dumps({
        "tonemapperOverrideEnabled": True,
        "defaultNonRawTonemapper": "agx",
    }))
    overridden = generate_thumbnail(str(p), resolution=48, cache_dir=cache)
    assert overridden != default  # AgX vs basic changes the pixels

    # same settings again: cache hit returns identical bytes
    again = generate_thumbnail(str(p), resolution=48, cache_dir=cache)
    assert again == overridden
