"""IO (LUT/sidecar/DNG), analysis (scopes/auto-adjust), negative conversion."""

import json

import numpy as np
import jax.numpy as jnp
import pytest

from rapidraw_tpu.analysis.auto_adjust import calculate_auto_adjustments
from rapidraw_tpu.analysis.scopes import calculate_histogram, calculate_waveform
from rapidraw_tpu.compositions.negative import convert_negative
from rapidraw_tpu.io.lut import identity_lut, lut_to_cube_text, parse_3dl, parse_cube, parse_hald
from rapidraw_tpu.io.sidecar import load_adjustments, load_sidecar, save_sidecar, sidecar_path


def _img(h=64, w=96, seed=0):
    rng = np.random.default_rng(seed)
    return rng.random((3, h, w), dtype=np.float32)


def test_cube_roundtrip_and_identity():
    lut = identity_lut(5)
    text = lut_to_cube_text(lut)
    back = parse_cube(text)
    np.testing.assert_allclose(back, lut, atol=1e-6)
    # identity lut applied through the sampler is identity
    from rapidraw_tpu.ops.lut3d import apply_lut

    img = jnp.asarray(_img(16, 16))
    out = np.asarray(apply_lut(img, jnp.asarray(lut), 1.0))
    np.testing.assert_allclose(out, np.asarray(img), atol=1e-5)


def test_cube_errors():
    with pytest.raises(ValueError):
        parse_cube("0.1 0.2 0.3\n")  # no size
    with pytest.raises(ValueError):
        parse_cube("LUT_3D_SIZE 2\n0 0 0\n")  # incomplete data


def test_3dl_and_hald():
    lut = identity_lut(4)
    # .3dl entry order is BLUE fastest / red slowest (OCIO FileFormat3DL)
    # = lut[r][g][b] flattened directly
    text = "\n".join(f"{r} {g} {b}" for r, g, b in lut.reshape(-1, 3))
    back = parse_3dl(text)
    np.testing.assert_allclose(back, lut, atol=1e-6)

    # integer 10-bit .3dl with the input-mesh header: normalized by the
    # mesh's full scale, axes NOT transposed
    mesh = " ".join(str(v) for v in range(0, 1024, 64)) + " 1023"
    ints = np.round(lut.reshape(-1, 3) * 1023).astype(int)
    text10 = mesh + "\n" + "\n".join(f"{r} {g} {b}" for r, g, b in ints)
    back10 = parse_3dl(text10)
    np.testing.assert_allclose(back10, lut, atol=1 / 1023 + 1e-6)

    # HALD: 8px cube -> image 64x64... use size 4 -> total 64 pixels -> 8x8
    data = (lut.transpose(2, 1, 0, 3).reshape(-1, 3) * 255).astype(np.uint8)
    hald_img = data.reshape(8, 8, 3)
    back2 = parse_hald(hald_img)
    np.testing.assert_allclose(back2, lut, atol=1 / 255 + 1e-6)


def test_sidecar_roundtrip(tmp_path):
    img_path = tmp_path / "photo.jpg"
    img_path.write_bytes(b"")
    meta = {"rating": 4, "adjustments": {"exposure": 1.2}, "tags": ["sky"]}
    save_sidecar(img_path, meta)
    assert sidecar_path(img_path).name == "photo.jpg.rrdata"
    loaded = load_sidecar(img_path)
    assert loaded["rating"] == 4
    assert load_adjustments(img_path) == {"exposure": 1.2}


def test_histogram_properties():
    img = np.zeros((3, 32, 32), np.float32)
    img[:, :, 16:] = 1.0
    h = calculate_histogram(img)
    for k in ("red", "green", "blue", "luma"):
        assert h[k].shape == (256,)
        assert h[k].max() <= 1.0
        # mass concentrated at the ends (smoothed)
        assert h[k][:10].sum() + h[k][-10:].sum() > h[k][100:156].sum()


def test_waveform_shapes():
    wf = calculate_waveform(_img())
    for k in ("rgb", "luma", "parade", "vectorscope"):
        assert wf[k].shape == (256, 256, 4)
        assert wf[k].dtype == np.uint8
    # gray image -> vectorscope mass at center
    gray = np.full((3, 32, 32), 0.5, np.float32)
    wfg = calculate_waveform(gray, "vectorscope")
    v = wfg["vectorscope"]
    assert v[128, 128, 3] > 0


def test_auto_adjust_dark_image_boosts_exposure():
    dark = _img() * 0.15
    adj = calculate_auto_adjustments(dark)
    assert adj["exposure"] > 0.5
    bright = np.clip(_img() * 0.8 + 0.5, 0, 1)
    adj2 = calculate_auto_adjustments(bright)
    assert adj2["exposure"] <= adj["exposure"]
    assert "sectionVisibility" in adj
    json.dumps(adj)  # must be serializable


def test_auto_adjust_rounds_halves_away_from_zero():
    # Rust's f32/f64 .round() rounds halves AWAY from zero (2.5 -> 3);
    # np.round rounds half-to-even (2.5 -> 2). Both histogram passes of
    # perform_auto_analysis bin with the Rust semantics
    # (image_processing.rs:3074 luma_f.round(), :3203 luma.round()).
    from rapidraw_tpu.analysis.auto_adjust import _round_half_up

    x = np.array([0.5, 1.5, 2.5, 3.49, 3.5, 254.5], np.float64)
    assert (_round_half_up(x) == [1, 2, 3, 3, 4, 255]).all()
    # np.round would give [0, 2, 2, 3, 4, 254] — the divergence being pinned
    assert (np.round(x) != _round_half_up(x)).any()


def test_negative_conversion_inverts():
    # a film negative's dark areas become bright
    neg = np.full((3, 64, 64), 0.8, np.float32)  # thin (bright) negative
    neg[:, 16:48, 16:48] = 0.15  # dense area
    out = np.asarray(convert_negative(jnp.asarray(neg)))
    assert np.isfinite(out).all()
    inside = out[:, 30:34, 30:34].mean()
    outside = out[:, :8, :8].mean()
    assert inside > outside  # dense negative -> bright positive


def test_dng_roundtrip(tmp_path):
    """Write a tiny uncompressed CFA DNG by hand and read it back."""
    import struct

    h, w = 8, 12
    rng = np.random.default_rng(0)
    cfa = (rng.random((h, w)) * 4000 + 100).astype(np.uint16)

    # minimal little-endian TIFF: header + one IFD + data
    entries = []
    data_offset = 8 + 2 + 13 * 12 + 4  # header + count + entries + next
    cfa_bytes = cfa.astype("<u2").tobytes()

    def entry(tag, typ, count, value):
        return struct.pack("<HHI4s", tag, typ, count, value)

    def short(v):
        return struct.pack("<HH", v, 0)

    def long(v):
        return struct.pack("<I", v)

    extra = b""
    extra_offset = data_offset + len(cfa_bytes)

    # CFAPattern (4 bytes fits inline): RGGB = 0,1,1,2
    entries.append(entry(256, 3, 1, short(w)))
    entries.append(entry(257, 3, 1, short(h)))
    entries.append(entry(258, 3, 1, short(16)))
    entries.append(entry(259, 3, 1, short(1)))
    entries.append(entry(262, 3, 1, short(32803)))
    entries.append(entry(273, 4, 1, long(data_offset)))
    entries.append(entry(277, 3, 1, short(1)))
    entries.append(entry(278, 3, 1, short(h)))
    entries.append(entry(279, 4, 1, long(len(cfa_bytes))))
    entries.append(entry(33421, 3, 2, struct.pack("<HH", 2, 2)))
    entries.append(entry(33422, 1, 4, bytes([0, 1, 1, 2])))
    entries.append(entry(50714, 3, 1, short(100)))
    entries.append(entry(50717, 3, 1, short(4200)))

    buf = struct.pack("<2sHI", b"II", 42, 8)
    buf += struct.pack("<H", len(entries)) + b"".join(entries) + struct.pack("<I", 0)
    assert len(buf) == data_offset
    buf += cfa_bytes + extra
    _ = extra_offset

    p = tmp_path / "test.dng"
    p.write_bytes(buf)

    from rapidraw_tpu.io.dng import parse_dng

    raw = parse_dng(buf)
    assert raw.pattern == "RGGB"
    assert raw.black_level == 100.0
    assert raw.white_level == 4200.0
    np.testing.assert_array_equal(raw.cfa, cfa)

    from rapidraw_tpu.io.loader import load_image

    img, is_raw = load_image(str(p))
    assert is_raw
    assert img.shape == (3, h, w)
    assert np.isfinite(img).all()


def test_parse_3dl_normalizes_integer_code_values():
    """Real .3dl files store 10/12-bit integers; white must map to 1.0
    (documented divergence from the reference, which feeds raw integers
    to the sampler — lut_processing.rs:120-155)."""
    from rapidraw_tpu.io.lut import parse_3dl

    size = 2
    lines = []
    for r in range(size):
        for g in range(size):
            for b in range(size):
                lines.append(f"{r * 4095} {g * 4095} {b * 4095}")
    lut = parse_3dl("\n".join(lines))
    assert lut.shape == (2, 2, 2, 3)
    assert float(lut.max()) == 1.0 and float(lut.min()) == 0.0


def test_copy_exif_resets_orientation(tmp_path):
    """Exported pixels are upright; carrying the source Orientation makes
    viewers rotate twice. The reference writes Orientation=1 on every
    export (exif_processing.rs:1064)."""
    from PIL import Image

    from rapidraw_tpu.io.exif import copy_exif

    src = tmp_path / "src.jpg"
    im = Image.fromarray(np.zeros((8, 12, 3), np.uint8))
    ex = Image.Exif()
    ex[0x0112] = 6  # rotate-90 source
    ex[0x010F] = "CamCo"
    im.save(src, exif=ex)

    dst = tmp_path / "out.jpg"
    Image.fromarray(np.zeros((12, 8, 3), np.uint8)).save(dst)
    assert copy_exif(src, dst)
    out = Image.open(dst).getexif()
    assert out.get(0x0112) == 1, "orientation must be reset to 1"
    assert out.get(0x010F) == "CamCo", "other tags carried over"


def test_persist_exif_if_missing(tmp_path):
    """First load stores the source EXIF into the .rrdata sidecar so it
    survives later stripping (exif_processing.rs:1151-1200); an existing
    exif field is left untouched."""
    from PIL import Image

    from rapidraw_tpu.io.exif import persist_exif_if_missing
    from rapidraw_tpu.io.sidecar import load_sidecar, save_sidecar

    p = tmp_path / "x.jpg"
    im = Image.fromarray(np.zeros((8, 8, 3), np.uint8))
    ex = Image.Exif()
    ex[0x010F] = "CamCo"
    im.save(p, exif=ex)

    persist_exif_if_missing(p)
    meta = load_sidecar(p)
    assert meta["exif"] and meta["exif"].get("Make") == "CamCo"

    # an already-persisted exif dict is not overwritten
    save_sidecar(p, {**meta, "exif": {"Make": "Other"}})
    persist_exif_if_missing(p)
    assert load_sidecar(p)["exif"]["Make"] == "Other"


def test_copy_exif_prefers_edited_sidecar_tags(tmp_path):
    """EXIF edits stored in the sidecar (exif --set) must reach exports —
    the reference prefers the sidecar map over the file's own EXIF
    (exif_processing.rs:708)."""
    from PIL import Image

    from rapidraw_tpu.io.exif import copy_exif, update_exif_fields

    src = tmp_path / "s.jpg"
    im = Image.fromarray(np.zeros((8, 8, 3), np.uint8))
    ex = Image.Exif()
    ex[0x010F] = "OldMake"
    im.save(src, exif=ex)

    update_exif_fields([str(src)], {"Make": "NewMake", "Artist": "Me"})

    dst = tmp_path / "o.jpg"
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(dst)
    assert copy_exif(src, dst)
    out = Image.open(dst).getexif()
    assert out.get(0x010F) == "NewMake"
    assert out.get(0x013B) == "Me"  # Artist


def test_copy_exif_sidecar_edit_with_numeric_tags(tmp_path):
    """A sidecar edit must survive when the source EXIF carries ordinary
    numeric tags (Orientation/XResolution/ExposureTime): the serialized
    payload is built per-tag with TIFF-type coercion, so stringified
    numerics don't silently drop the whole edited payload."""
    from PIL import Image

    from rapidraw_tpu.io.exif import copy_exif, read_exif_tags, update_exif_fields

    src = tmp_path / "s.jpg"
    im = Image.fromarray(np.zeros((8, 8, 3), np.uint8))
    ex = Image.Exif()
    ex[0x010F] = "OldMake"
    ex[0x0112] = 6  # Orientation (SHORT)
    ex[0x011A] = 72  # XResolution (RATIONAL)
    im.save(src, exif=ex)

    update_exif_fields([str(src)], {"Make": "NewMake"})

    dst = tmp_path / "o.jpg"
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(dst)
    assert copy_exif(src, dst)
    tags = read_exif_tags(dst)
    assert tags.get("Make") == "NewMake"
    # numeric tags round-trip through the coercion (orientation is reset
    # to 1 by design — the exported pixels are upright)
    assert tags.get("Orientation") == "1"
    assert tags.get("XResolution", "").startswith("72")
