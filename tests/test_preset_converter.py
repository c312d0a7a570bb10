"""Lightroom XMP -> preset conversion (preset_converter.rs parity)."""

from __future__ import annotations

from rapidraw_tpu.library.preset_converter import convert_xmp_to_preset

_XMP = """<?xpacket begin="" id="W5M0MpCehiHzreSzNTczkc9d"?>
<x:xmpmeta xmlns:x="adobe:ns:meta/">
 <rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#">
  <rdf:Description rdf:about=""
    xmlns:crs="http://ns.adobe.com/camera-raw-settings/1.0/"
   crs:Exposure2012="+0.55"
   crs:Contrast2012="+18"
   crs:Shadows2012="+40"
   crs:Sharpness="75"
   crs:Temperature="6500"
   crs:AsShotTemperature="5500"
   crs:Tint="+30"
   crs:HueAdjustmentRed="-20"
   crs:SaturationAdjustmentRed="+15"
   crs:LuminanceAdjustmentBlue="-10"
   crs:SplitToningShadowHue="220"
   crs:SplitToningShadowSaturation="25"
   crs:ColorGradeGlobalLum="+5"
   crs:SplitToningBalance="-10"
   crs:ColorGradeBlending="50"
   crs:PostCropVignetteAmount="-30">
   <crs:Name>
    <rdf:Alt>
     <rdf:li xml:lang="x-default">Moody Teal</rdf:li>
    </rdf:Alt>
   </crs:Name>
   <crs:ToneCurvePV2012>
    <rdf:Seq>
     <rdf:li>0, 20</rdf:li>
     <rdf:li>32, 60</rdf:li>
     <rdf:li>128, 128</rdf:li>
     <rdf:li>255, 255</rdf:li>
    </rdf:Seq>
   </crs:ToneCurvePV2012>
  </rdf:Description>
 </rdf:RDF>
</x:xmpmeta>
"""


def test_basic_mappings_and_scalings():
    p = convert_xmp_to_preset(_XMP)
    a = p["adjustments"]
    assert p["name"] == "Moody Teal"
    assert a["exposure"] == 0.55
    assert a["contrast"] == 18
    assert a["shadows"] == 60.0  # 40 * 1.5 (preset_converter.rs:155-158)
    assert a["sharpness"] == 50.0  # 75/150*100 (:160-166)
    # mired-space temperature: 1e6/6500 - 1e6/5500 = -27.97 mired -> +18.65
    assert abs(a["temperature"] - 18.648) < 0.01
    assert a["tint"] == 20.0
    assert a["vignetteAmount"] == -30


def test_hsl_and_color_grading():
    a = convert_xmp_to_preset(_XMP)["adjustments"]
    assert a["hsl"]["reds"]["hue"] == -15.0  # -20 * 0.75 (:199-203)
    assert a["hsl"]["reds"]["saturation"] == 15
    assert a["hsl"]["blues"]["luminance"] == -10
    cg = a["colorGrading"]
    assert cg["shadows"] == {"hue": 220, "saturation": 25}
    assert cg["global"] == {"luminance": 5}
    assert cg["balance"] == -10 and cg["blending"] == 50


def test_tone_curve_shadow_dampening():
    a = convert_xmp_to_preset(_XMP)["adjustments"]
    luma = a["curves"]["luma"]
    # x=0 lift 20 -> damp 0.8 -> 16; x=32 lift 28 -> damp 0.9 -> 57
    assert luma[0] == {"x": 0, "y": 16}
    assert luma[1] == {"x": 32, "y": 57}
    assert luma[2] == {"x": 128, "y": 128}  # no lift, untouched
    assert luma[3] == {"x": 255, "y": 255}


def test_store_imports_xmp(tmp_path):
    from rapidraw_tpu.library.presets import PresetStore

    f = tmp_path / "moody.xmp"
    f.write_text(_XMP)
    store = PresetStore(tmp_path / "presets.json")
    out = store.import_file(f)
    assert len(out) == 1 and out[0]["name"] == "Moody Teal"
    assert store.get("Moody Teal")["adjustments"]["contrast"] == 18
