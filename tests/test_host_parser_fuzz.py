"""Malformed-input contract for the host-side *file* parsers.

Companion to test_raw_fuzz.py (RAW containers) and test_native_fuzz.py
(C++ decoders): the LUT parsers, the Lightroom XMP preset converter, the
community-preset manifest, and the EXIF payload helpers must either
succeed or raise ValueError-family errors on arbitrary text/bytes — never
IndexError/KeyError/struct.error/UnboundLocalError, and never hang.
The reference gets the same guarantee from serde's typed parsing.
"""

import numpy as np
import pytest

OK_ERRORS = (ValueError,)  # LutError subclasses ValueError


def _mutations(seed: str, n: int, salt: int) -> list[str]:
    rng = np.random.default_rng(salt)
    out = []
    for _ in range(n):
        buf = list(seed)
        kind = rng.integers(0, 4)
        if kind == 0 and buf:
            for _ in range(int(rng.integers(1, 6))):
                buf[int(rng.integers(0, len(buf)))] = chr(int(rng.integers(32, 127)))
        elif kind == 1 and len(buf) > 2:
            buf = buf[: int(rng.integers(1, len(buf)))]
        elif kind == 2:
            pos = int(rng.integers(0, len(buf) + 1))
            junk = "".join(chr(int(c)) for c in rng.integers(32, 127, 12))
            buf = buf[:pos] + list(junk) + buf[pos:]
        else:
            lines = "".join(buf).splitlines()
            if len(lines) > 1:
                i = int(rng.integers(0, len(lines)))
                j = int(rng.integers(0, len(lines)))
                lines[i], lines[j] = lines[j], lines[i]
            buf = list("\n".join(lines))
        out.append("".join(buf))
    return out


CUBE_SEED = """TITLE "t"
LUT_3D_SIZE 2
0.0 0.0 0.0
1.0 0.0 0.0
0.0 1.0 0.0
1.0 1.0 0.0
0.0 0.0 1.0
1.0 0.0 1.0
0.0 1.0 1.0
1.0 1.0 1.0
"""

THREEDL_SEED = """0 128 256 384 512 640 768 896 1023
0 0 0
1023 0 0
0 1023 0
1023 1023 0
0 0 1023
1023 0 1023
0 1023 1023
1023 1023 1023
"""


def test_cube_parser_contract():
    from rapidraw_tpu.io.lut import parse_cube

    assert parse_cube(CUBE_SEED).shape == (2, 2, 2, 3)
    for text in _mutations(CUBE_SEED, 300, 1):
        try:
            lut = parse_cube(text)
            assert np.isfinite(lut).all() or True  # values may be anything finite-parsed
        except OK_ERRORS:
            pass


def test_3dl_parser_contract():
    from rapidraw_tpu.io.lut import parse_3dl

    assert parse_3dl(THREEDL_SEED).shape == (2, 2, 2, 3)
    for text in _mutations(THREEDL_SEED, 300, 2):
        try:
            parse_3dl(text)
        except OK_ERRORS:
            pass


def test_hald_parser_contract():
    from rapidraw_tpu.io.lut import parse_hald

    rng = np.random.default_rng(3)
    for _ in range(100):
        h = int(rng.integers(1, 20))
        w = int(rng.integers(1, 20))
        img = rng.random((h, w, 3)).astype(np.float32)
        try:
            parse_hald(img)
        except OK_ERRORS:
            pass


XMP_SEED = """<x:xmpmeta xmlns:x="adobe:ns:meta/">
 <rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#">
  <rdf:Description xmlns:crs="http://ns.adobe.com/camera-raw-settings/1.0/"
    crs:Name="Test Preset" crs:Exposure2012="+0.50" crs:Contrast2012="+25"
    crs:Highlights2012="-30" crs:Shadows2012="+40" crs:Saturation="+10"
    crs:Temperature="5500" crs:Tint="+5" crs:Sharpness="40">
  </rdf:Description>
 </rdf:RDF>
</x:xmpmeta>
"""


def test_xmp_converter_contract():
    from rapidraw_tpu.library.preset_converter import convert_xmp_to_preset

    p = convert_xmp_to_preset(XMP_SEED)
    assert p["name"] and isinstance(p["adjustments"], dict)
    for text in _mutations(XMP_SEED, 300, 4):
        try:
            out = convert_xmp_to_preset(text)
            assert isinstance(out, dict)
        except OK_ERRORS:
            pass


MANIFEST_SEED = """[
 {"name": "Punchy", "creator": "a", "adjustments": {"contrast": 30}},
 {"name": "Soft", "adjustments": {"exposure": -0.3, "masks": []}}
]
"""


def test_community_manifest_contract():
    from rapidraw_tpu.library.community import parse_manifest

    assert len(parse_manifest(MANIFEST_SEED)) == 2
    for text in _mutations(MANIFEST_SEED, 300, 5):
        try:
            parse_manifest(text)
        except OK_ERRORS:
            pass


def test_exif_payload_helpers_contract(tmp_path):
    """strip_gps and the per-format splicers on mutated EXIF payloads and
    container bytes."""
    from PIL import Image

    from rapidraw_tpu.io.exif import read_exif_bytes, splice_exif_into_png, strip_gps

    img = tmp_path / "e.jpg"
    im = Image.new("RGB", (4, 4))
    exif = Image.Exif()
    exif[271] = "M"
    exif[272] = "Model"
    im.save(img, exif=exif)
    payload = read_exif_bytes(img)
    assert payload

    rng = np.random.default_rng(6)
    png = tmp_path / "t.png"
    for trial in range(200):
        buf = bytearray(payload)
        for _ in range(int(rng.integers(1, 6))):
            buf[int(rng.integers(0, len(buf)))] = int(rng.integers(0, 256))
        mutated = bytes(buf[: int(rng.integers(8, len(buf) + 1))])
        try:
            strip_gps(mutated)
        except OK_ERRORS:
            pass
        Image.new("RGB", (2, 2)).save(png)
        try:
            splice_exif_into_png(png, mutated)
        except OK_ERRORS:
            pass


def test_lut_parse_file_unknown_extension(tmp_path):
    from rapidraw_tpu.io.lut import parse_lut_file

    bad = tmp_path / "weird.lut3d"
    bad.write_text("not a lut")
    with pytest.raises(ValueError):
        parse_lut_file(bad)
