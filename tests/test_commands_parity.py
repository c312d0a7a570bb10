"""Host-side command parity: the long tail of reference Tauri commands.

Each test pins one of the small file_management.rs / tagging.rs / lib.rs
commands whose counterpart lives in library/catalog.py, library/presets.py,
ai/tagging.py, io/exif.py or masks/rasterize.py.
"""

import base64
import json
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from rapidraw_tpu.io.sidecar import load_sidecar, save_sidecar
from rapidraw_tpu.library.catalog import (
    Albums,
    clear_all_sidecars,
    create_folder,
    delete_folder,
    get_image_dimensions,
    get_supported_file_types,
    internal_library_root,
    pinned_folder_trees,
    rename_folder,
    save_temp_file,
)


def test_create_folder_case_insensitive_duplicate(tmp_path):
    create_folder(tmp_path / "Shoots")
    assert (tmp_path / "Shoots").is_dir()
    with pytest.raises(FileExistsError):
        create_folder(tmp_path / "shoots")


def test_rename_folder_syncs_albums(tmp_path):
    src = tmp_path / "old"
    src.mkdir()
    (src / "a.jpg").write_bytes(b"x")
    albums = Albums(tmp_path / "albums.json")
    albums.add("trip", [str(src / "a.jpg")])
    new_path = rename_folder(src, "new", albums=albums)
    assert Path(new_path).is_dir() and not src.exists()
    assert albums.images("trip") == [str(tmp_path / "new" / "a.jpg")]
    (tmp_path / "New2").mkdir()
    with pytest.raises(FileExistsError):
        rename_folder(new_path, "new2")


def test_delete_folder_and_clear_all_sidecars(tmp_path):
    d = tmp_path / "lib" / "sub"
    d.mkdir(parents=True)
    (d / "img.jpg").write_bytes(b"x")
    (d / "img.jpg.rrdata").write_text("{}")
    (d / "out.png.rrexif").write_text("{}")
    assert clear_all_sidecars(tmp_path / "lib") == 2
    assert (d / "img.jpg").exists()
    delete_folder(tmp_path / "lib")
    assert not (tmp_path / "lib").exists()
    with pytest.raises(FileNotFoundError):
        clear_all_sidecars(tmp_path / "missing")


def test_pinned_folder_trees_skips_unreadable(tmp_path):
    (tmp_path / "a").mkdir()
    (tmp_path / "b").mkdir()
    trees = pinned_folder_trees([tmp_path / "a", tmp_path / "missing", tmp_path / "b"])
    assert [Path(t.path).name for t in trees] == ["a", "b"]


def test_get_supported_file_types_shape():
    types = get_supported_file_types()
    assert "dng" in types["raw"] and "cr3" in types["raw"]
    assert "jpg" in types["nonRaw"] and not set(types["raw"]) & set(types["nonRaw"])


def test_get_image_dimensions_ldr_and_virtual(tmp_path):
    p = tmp_path / "im.png"
    Image.new("RGB", (33, 21)).save(p)
    assert get_image_dimensions(p) == (33, 21)
    assert get_image_dimensions(str(p) + "?vc=2") == (33, 21)


def test_save_temp_file_roundtrip():
    path = save_temp_file(b"payload", suffix=".bin")
    try:
        assert Path(path).read_bytes() == b"payload"
    finally:
        Path(path).unlink()


def test_internal_library_root_created(tmp_path):
    root = internal_library_root(base=tmp_path)
    assert Path(root) == tmp_path / "library" and Path(root).is_dir()


# ------------------------------------------------------------------- tags


def test_clear_ai_tags_keeps_user_and_color(tmp_path):
    from rapidraw_tpu.ai.tagging import clear_ai_tags, clear_all_tags

    img = tmp_path / "x.jpg"
    img.write_bytes(b"x")
    save_sidecar(img, {"tags": ["sunset", "color:red", "user:fav"], "rating": 3})
    img2 = tmp_path / "y.jpg"
    img2.write_bytes(b"x")
    save_sidecar(img2, {"tags": ["color:blue"]})

    assert clear_ai_tags(str(tmp_path)) == 1  # only x.jpg had AI tags
    assert load_sidecar(img)["tags"] == ["color:red", "user:fav"]
    assert load_sidecar(img)["rating"] == 3
    assert load_sidecar(img2)["tags"] == ["color:blue"]

    assert clear_all_tags(str(tmp_path)) == 2
    assert load_sidecar(img)["tags"] in ([], None)


# ------------------------------------------------------------------- exif


def test_update_exif_fields_merge_and_delete(tmp_path):
    from rapidraw_tpu.io.exif import update_exif_fields

    img = tmp_path / "x.jpg"
    Image.new("RGB", (4, 4)).save(img)
    save_sidecar(img, {"exif": {"Artist": "Old", "Copyright": "c"}})
    update_exif_fields([img], {"Artist": "  New  ", "Copyright": "", "Rating": "5"})
    exif = load_sidecar(img)["exif"]
    assert exif["Artist"] == "New" and exif["Rating"] == "5"
    assert "Copyright" not in exif


def test_update_exif_fields_seeds_from_file(tmp_path):
    from PIL import Image as PILImage

    from rapidraw_tpu.io.exif import update_exif_fields

    img = tmp_path / "cam.jpg"
    im = PILImage.new("RGB", (4, 4))
    exif = PILImage.Exif()
    exif[271] = "CamMaker"  # Make
    im.save(img, exif=exif)
    update_exif_fields([img], {"Artist": "Me"})
    stored = load_sidecar(img)["exif"]
    assert stored["Make"] == "CamMaker" and stored["Artist"] == "Me"


# ---------------------------------------------------------------- presets


def test_export_presets_to_file(tmp_path):
    from rapidraw_tpu.library.presets import PresetStore, export_presets_to_file

    store = PresetStore(tmp_path / "presets.json")
    p = store.add("warm", {"temperature": 20})
    out = tmp_path / "share.json"
    export_presets_to_file([p], out)
    doc = json.loads(out.read_text())
    assert doc["creator"] == "Anonymous"
    assert doc["presets"][0]["name"] == "warm"
    # round-trips through import_file
    store2 = PresetStore(tmp_path / "p2.json")
    # import accepts a list of preset objects
    (tmp_path / "plain.json").write_text(json.dumps(doc["presets"]))
    imported = store2.import_file(tmp_path / "plain.json")
    assert imported[0]["adjustments"] == {"temperature": 20}


def test_apply_and_reset_adjustments_for_paths(tmp_path):
    from rapidraw_tpu.library.presets import (
        apply_adjustments_to_paths,
        reset_adjustments_for_paths,
    )

    img = tmp_path / "x.jpg"
    img.write_bytes(b"x")
    save_sidecar(img, {"adjustments": {"exposure": 1.0, "contrast": 5}, "rating": 2})
    apply_adjustments_to_paths([str(img)], {"contrast": 30, "saturation": 10})
    adj = load_sidecar(img)["adjustments"]
    assert adj == {"exposure": 1.0, "contrast": 30, "saturation": 10}
    assert load_sidecar(img)["rating"] == 2

    reset_adjustments_for_paths([str(img)])
    assert load_sidecar(img)["adjustments"] == {}
    assert load_sidecar(img)["rating"] == 2


def test_apply_auto_adjustments_to_paths(tmp_path):
    from rapidraw_tpu.library.presets import apply_auto_adjustments_to_paths

    img = tmp_path / "x.png"
    rng = np.random.default_rng(0)
    Image.fromarray((rng.random((32, 48, 3)) * 255).astype(np.uint8)).save(img)
    apply_auto_adjustments_to_paths([str(img)])
    adj = load_sidecar(img)["adjustments"]
    assert adj and "exposure" in adj
    # unreadable paths are skipped, not fatal
    apply_auto_adjustments_to_paths([str(tmp_path / "missing.png")])


# ------------------------------------------------------------ mask overlay


def test_generate_mask_overlay_data_url():
    from rapidraw_tpu.masks.rasterize import generate_mask_overlay

    mask_def = {
        "visible": True,
        "subMasks": [{
            "type": "radial", "visible": True, "mode": "additive",
            "parameters": {"centerX": 32, "centerY": 24, "radiusX": 20,
                           "radiusY": 16, "rotation": 0.0, "feather": 0.5},
        }],
    }
    url = generate_mask_overlay(mask_def, 64, 48)
    assert url.startswith("data:image/png;base64,")
    png = base64.b64decode(url.split(",", 1)[1])
    import io

    im = Image.open(io.BytesIO(png))
    assert im.size == (64, 48) and im.mode == "RGBA"
    a = np.asarray(im)
    # red everywhere, alpha peaked at the mask center, zero at corners
    assert a[24, 32, 0] == 255 and a[24, 32, 3] > 100
    assert a[0, 0, 3] == 0
    # alpha = intensity // 2, never above 127
    assert a[..., 3].max() <= 127

    # invisible mask -> empty string
    assert generate_mask_overlay({"visible": False, "subMasks": []}, 8, 8) == ""


def test_is_image_cached_and_clear(tmp_path):
    from rapidraw_tpu.pipeline.service import RenderService

    img = tmp_path / "x.png"
    Image.fromarray(np.zeros((16, 24, 3), np.uint8)).save(img)
    svc = RenderService()
    assert not svc.is_image_cached(str(img))
    svc.load(str(img))
    assert svc.is_image_cached(str(img))
    svc.clear_caches()
    assert not svc.is_image_cached(str(img))


def test_clear_thumbnail_cache(tmp_path):
    from rapidraw_tpu.library.thumbnails import clear_thumbnail_cache

    d = tmp_path / "thumbs"
    d.mkdir()
    (d / "aa.jpg").write_bytes(b"x")
    clear_thumbnail_cache(str(d))
    assert d.is_dir() and not list(d.iterdir())


def test_save_collage_and_makers(tmp_path):
    import base64
    import io

    from rapidraw_tpu.lens.db import parse_lensfun_xml
    from rapidraw_tpu.library.catalog import save_collage

    first = tmp_path / "IMG_001.jpg"
    first.write_bytes(b"x")
    buf = io.BytesIO()
    Image.new("RGB", (8, 8)).save(buf, format="PNG")
    url = "data:image/png;base64," + base64.b64encode(buf.getvalue()).decode()
    out = save_collage(url, str(first) + "?vc=2")
    assert Path(out).name == "IMG_001_Collage.png" and Path(out).exists()
    with pytest.raises(ValueError):
        save_collage("data:image/jpeg;base64,xxxx", str(first))

    db = parse_lensfun_xml("""<lensdatabase>
      <lens><maker>Canon</maker><model>EF 50mm</model><mount>EF</mount>
        <cropfactor>1.0</cropfactor></lens>
      <lens><maker>Nikon</maker><model>AF 35mm</model><mount>F</mount>
        <cropfactor>1.0</cropfactor></lens>
    </lensdatabase>""")
    assert db.makers() == ["Canon", "Nikon"]


# --------------------------------------------------------------------- cli


def test_cli_lib_and_preset_and_exif(tmp_path, capsys):
    from rapidraw_tpu.cli import main

    img = tmp_path / "a.jpg"
    Image.new("RGB", (12, 8)).save(img)

    assert main(["lib", "rate", "4", str(img)]) == 0
    assert load_sidecar(img)["rating"] == 4
    assert main(["lib", "tag-add", "--tags", "fav", str(img)]) == 0
    assert load_sidecar(img)["tags"] == ["user:fav"]
    assert main(["lib", "dims", str(img)]) == 0
    assert "12x8" in capsys.readouterr().out
    assert main(["lib", "types"]) == 0
    assert "dng" in capsys.readouterr().out
    assert main(["lib", "ls", str(tmp_path)]) == 0
    assert str(img) in capsys.readouterr().out

    store = tmp_path / "store.json"
    pj = tmp_path / "one.json"
    pj.write_text(json.dumps({"name": "punch", "adjustments": {"contrast": 40}}))
    assert main(["preset", "--store", str(store), "import", str(pj)]) == 0
    assert main(["preset", "--store", str(store), "apply", "punch", str(img)]) == 0
    assert load_sidecar(img)["adjustments"]["contrast"] == 40
    capsys.readouterr()
    assert main(["preset", "--store", str(store), "show", "punch"]) == 0
    assert json.loads(capsys.readouterr().out)["contrast"] == 40
    assert main(["preset", "--store", str(store), "reset", str(img)]) == 0
    assert load_sidecar(img)["adjustments"] == {}
    out_file = tmp_path / "share.json"
    assert main(["preset", "--store", str(store), "export", str(out_file)]) == 0
    assert json.loads(out_file.read_text())["presets"][0]["name"] == "punch"

    capsys.readouterr()
    assert main(["exif", str(img), "--set", "Artist=Me"]) == 0
    assert load_sidecar(img)["exif"]["Artist"] == "Me"


def test_get_image_dimensions_raw_metadata_only(tmp_path):
    """Dimension queries must not decode pixels (lib.rs:232-238): a DNG
    whose strip payload is CORRUPT still reports header dims."""
    import struct

    from tests.test_raw_containers import Ifd, build_tiff

    ifd = Ifd()
    ifd.add(256, 4, [48]).add(257, 4, [32]).add(258, 3, [16])
    ifd.add(259, 3, [1]).add(262, 3, [32803]).add(277, 3, [1])
    ifd.add(273, 4, [0xFFFFFF]).add(279, 4, [12])  # bogus strip offset
    ifd.add(50706, 1, bytes([1, 4, 0, 0]))
    p = tmp_path / "broken.dng"
    p.write_bytes(build_tiff([ifd]))
    assert get_image_dimensions(p) == (48, 32)

    # MRW: PRD header dims without touching the plane
    from tests.test_raw_containers import _build_mrw
    import numpy as np

    q = tmp_path / "old.mrw"
    q.write_bytes(_build_mrw(np.zeros((6, 8), np.uint16), packed=False))
    assert get_image_dimensions(q) == (8, 6)


def test_group_similar_transitive_any_order():
    """A-C and B-C similar, A-B not: grouping must be one group regardless
    of index order (the BFS previously only scanned forward indices)."""
    import numpy as np

    from rapidraw_tpu.compositions.culling import ImageAnalysis, group_similar

    def mk(bits):
        arr = np.zeros(64, np.uint8)
        arr[:bits] = 1
        return ImageAnalysis(
            path="x", quality_score=1.0, sharpness_metric=1.0,
            center_focus_metric=1.0, exposure_metric=1.0, width=8, height=8,
            hash_bits=arr,
        )

    a = mk(0)
    b = mk(40)                     # 40 bits from a
    c = mk(20)                     # 20 bits from both a and b
    groups = group_similar([a, b, c], similarity_threshold=24)
    assert sorted(len(g) for g in groups) == [3]
    groups2 = group_similar([a, c, b], similarity_threshold=24)
    assert sorted(len(g) for g in groups2) == [3]


def test_auto_analysis_u8_large_image():
    """A >1024px uint8 image must not saturate after the float downscale."""
    import numpy as np

    from rapidraw_tpu.analysis.auto_adjust import perform_auto_analysis

    rng = np.random.default_rng(9)
    img = rng.integers(40, 200, (3, 1100, 1400), dtype=np.uint8)
    res_u8 = perform_auto_analysis(img)
    res_f = perform_auto_analysis(img.astype(np.float32) / 255.0)
    # dtype must not change the analysis (u8 previously saturated to white)
    for k, v in res_f.items():
        assert abs(res_u8[k] - v) < 1e-4, (k, res_u8[k], v)


def test_rename_refuses_existing_target(tmp_path):
    from PIL import Image
    import numpy as np

    from rapidraw_tpu.library.catalog import rename_image

    for n in ("a.jpg", "b.jpg"):
        Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(tmp_path / n)
    with pytest.raises(FileExistsError):
        rename_image(tmp_path / "a.jpg", "b")
    assert (tmp_path / "a.jpg").exists() and (tmp_path / "b.jpg").exists()


def test_virtual_copy_sidecars_travel_with_file(tmp_path):
    from PIL import Image
    import numpy as np

    from rapidraw_tpu.io.sidecar import save_sidecar
    from rapidraw_tpu.library.catalog import (
        create_virtual_copy, move_image, rename_image,
    )

    p = tmp_path / "img.jpg"
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(p)
    vc = create_virtual_copy(p)
    save_sidecar(vc, {"adjustments": {"exposure": 1.5}})
    assert (tmp_path / "img.jpg.1.rrdata").exists()

    dst_dir = tmp_path / "moved"
    moved = move_image(p, dst_dir)
    assert (dst_dir / "img.jpg.1.rrdata").exists(), "VC sidecar must move"
    assert not (tmp_path / "img.jpg.1.rrdata").exists()

    renamed = rename_image(moved, "renamed")
    assert (dst_dir / "renamed.jpg.1.rrdata").exists()


def test_albums_remove_does_not_create_phantom(tmp_path):
    from rapidraw_tpu.library.catalog import Albums

    al = Albums(tmp_path / "albums.json")
    al.remove("nope", ["x.jpg"])
    assert "nope" not in al.names() if hasattr(al, "names") else True
    assert al.images("nope") == []
    import json as _json
    if (tmp_path / "albums.json").exists():
        assert "nope" not in _json.loads((tmp_path / "albums.json").read_text())


def test_encode_image_hwc_float_scales(tmp_path):
    import numpy as np
    from PIL import Image

    from rapidraw_tpu.io.encode import encode_image

    hwc = np.full((8, 8, 3), 0.5, np.float32)
    out = tmp_path / "o.png"
    encode_image(hwc, out, "png")
    back = np.asarray(Image.open(out))
    assert 120 <= int(back.mean()) <= 135, back.mean()
