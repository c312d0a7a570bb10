"""RAW develop settings wiring: rawPreprocessing* / rawHighlightCompression /
linearRawMode must reach the develop + enhance chain exactly as the
reference threads them (image_loader.rs:62-150, raw_processing.rs:81-86,
app_settings.rs:517-518 defaults)."""

from __future__ import annotations

import struct

import numpy as np

from rapidraw_tpu.io.loader import load_image
from rapidraw_tpu.utils.settings import DEFAULTS, AppSettings

from tests.test_raw_containers import Ifd, _cfa_ifd, _pack_msb, build_tiff


def _noise_cfa(h=16, w=32, seed=0, bits=12):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 1 << bits, size=(h, w), dtype=np.uint16)


def _write_dng(tmp_path, cfa, name="x.dng", extra_tags=()):
    h, w = cfa.shape
    data = build_tiff([_cfa_ifd(w, h, 12, 1, _pack_msb(cfa, 12),
                                extra_tags=extra_tags)])
    p = tmp_path / name
    p.write_bytes(data)
    return str(p)


def _settings(**over):
    d = dict(DEFAULTS)
    d.update(over)
    return AppSettings(d)


def test_preprocessing_enhance_on_by_default(tmp_path):
    path = _write_dng(tmp_path, _noise_cfa())
    default_img, is_raw = load_image(path)
    assert is_raw
    off = _settings(rawPreprocessingColorNr=0.0, rawPreprocessingSharpening=0.0)
    plain_img, _ = load_image(path, app_settings=off)
    # reference defaults (0.5 / 0.35) run the chroma-NR + sharpen enhance
    assert np.abs(default_img - plain_img).max() > 1e-4

    # with preprocessing off, load_image == the bare develop
    from rapidraw_tpu.io.dng import load_raw_file

    np.testing.assert_array_equal(plain_img, load_raw_file(path))


def test_fast_path_skips_enhance_and_clamps(tmp_path):
    # fast (thumbnail) path: speed demosaic, clamp 1.0, no enhance —
    # raw_processing.rs:113-115,130-134
    # AsShotNeutral 0.5, 1, 0.5 -> WB gains 2, 1, 2
    wb_tags = [(50728, 5, struct.pack("<6I", 1, 2, 1, 1, 1, 2))]
    path = _write_dng(tmp_path, _noise_cfa(seed=1), extra_tags=wb_tags)
    fast_img, _ = load_image(path, fast=True)
    assert fast_img.max() <= 1.0 + 1e-6
    full_img, _ = load_image(path, app_settings=_settings(
        rawPreprocessingColorNr=0.0, rawPreprocessingSharpening=0.0))
    # WB gains of 2.0 push highlights past 1.0 on the full path
    assert full_img.max() > 1.0


def test_highlight_compression_setting_threads(tmp_path):
    wb_tags = [(50728, 5, struct.pack("<6I", 1, 2, 1, 1, 1, 2))]
    path = _write_dng(tmp_path, _noise_cfa(seed=2), extra_tags=wb_tags)
    lo, _ = load_image(path, app_settings=_settings(
        rawHighlightCompression=1.2, rawPreprocessingColorNr=0.0,
        rawPreprocessingSharpening=0.0))
    hi, _ = load_image(path, app_settings=_settings(
        rawHighlightCompression=2.5, rawPreprocessingColorNr=0.0,
        rawPreprocessingSharpening=0.0))
    assert lo.max() <= 1.2 + 1e-5
    assert hi.max() > 1.2
    assert np.abs(lo - hi).max() > 1e-3


def test_linear_raw_mode_gamma(tmp_path):
    # linear DNG (Photometric 34892, spp 3): linearRawMode='gamma' must
    # ungamma the normalized values (raw_processing.rs:81-86,148-158)
    rng = np.random.default_rng(3)
    h, w = 8, 16
    rgb = rng.integers(0, 4096, size=(h, w * 3), dtype=np.uint16)
    ifd = Ifd()
    ifd.add(256, 4, [w]).add(257, 4, [h]).add(258, 3, [12, 12, 12])
    ifd.add(259, 3, [1]).add(262, 3, [34892]).add(277, 3, [3])
    payload = _pack_msb(rgb, 12)
    ifd.add(273, 4, ("blob", payload)).add(278, 4, [h]).add(279, 4, [len(payload)])
    p = tmp_path / "lin.dng"
    p.write_bytes(build_tiff([ifd]))

    base = dict(rawPreprocessingColorNr=0.0, rawPreprocessingSharpening=0.0)
    default_img, _ = load_image(str(p), app_settings=_settings(**base))
    gamma_img, _ = load_image(str(p), app_settings=_settings(
        linearRawMode="gamma", **base))
    assert np.abs(default_img - gamma_img).max() > 1e-3
    # ungamma of [0,1] data keeps it in [0,1] and strictly below the input
    assert gamma_img.max() <= 1.0 + 1e-6
    assert float(gamma_img.mean()) < float(default_img.mean())
