"""Band-restricted blur levels for mask-only consumers (pipeline.bands).

When every GLOBAL consumer of a blur-pyramid level is statically zero and
only masks drive it, the level is computed over the masks' row band only —
outside, the effective amounts are exactly zero and every consumer is
exactly identity (ops/local.py, ops/tone.py `where(amount == 0, rgb, ...)`),
so the restriction is output-exact within float reassociation noise.
"""

from __future__ import annotations

import numpy as np
import pytest

from rapidraw_tpu.masks.rasterize import rasterize_masks
from rapidraw_tpu.params.parse import merge_configs, parse_adjustments
from rapidraw_tpu.pipeline.bands import blur_band_rows

H, W = 512, 640


def _doc(global_clarity=0.0, mask_clarity=25.0, mask_shadows=30.0):
    return {
        "exposure": 0.3,
        "contrast": 12,
        "clarity": global_clarity,
        "toneMapper": "agx",
        "masks": [
            {
                "name": "band", "visible": True,
                "adjustments": {"clarity": mask_clarity, "shadows": mask_shadows,
                                "exposure": 0.5},
                "subMasks": [{
                    "type": "radial", "visible": True, "mode": "additive",
                    "parameters": {"centerX": W * 0.5, "centerY": H * 0.3,
                                   "radiusX": W * 0.2, "radiusY": H * 0.1,
                                   "rotation": 0.0, "feather": 0.3},
                }],
            },
        ],
    }


def test_parse_band_eligibility():
    _, cfg = parse_adjustments(_doc(), is_raw=False)
    d = dict(cfg.blur_band_masks)
    assert d.get("clarity") == (0,)
    assert d.get("tonal") == (0,)

    # a non-zero GLOBAL clarity forces the full level
    _, cfg_g = parse_adjustments(_doc(global_clarity=15.0), is_raw=False)
    assert "clarity" not in dict(cfg_g.blur_band_masks)
    # tonal stays band-eligible (global shadows/blacks still zero)
    assert "tonal" in dict(cfg_g.blur_band_masks)


def test_merge_configs_band_rule():
    _, cfg_a = parse_adjustments(_doc(), is_raw=False)
    _, cfg_b = parse_adjustments(_doc(global_clarity=10.0), is_raw=False)
    merged = merge_configs([cfg_a, cfg_b])
    d = dict(merged.blur_band_masks)
    # one doc's global clarity kills the clarity band for the whole batch
    assert "clarity" not in d
    # both docs keep tonal mask-only
    assert d.get("tonal") == (0,)

    # a doc that doesn't need the level at all imposes no constraint
    _, cfg_plain = parse_adjustments(
        {"exposure": 0.1, "toneMapper": "agx"}, is_raw=False
    )
    merged2 = merge_configs([cfg_a, cfg_plain])
    assert dict(merged2.blur_band_masks).get("clarity") == (0,)


def test_blur_band_rows_quantization():
    _, cfg = parse_adjustments(_doc(), is_raw=False)
    masks = np.zeros((1, H, W), np.float32)
    masks[0, 130:220, :] = 1.0
    bands = dict_bands(blur_band_rows(cfg, masks))
    assert bands["clarity"] == (128, 256)
    assert bands["tonal"] == (128, 256)

    # batched bitmaps: union over the batch
    mb = np.zeros((2, 1, H, W), np.float32)
    mb[0, 0, 130:220, :] = 1.0
    mb[1, 0, 300:310, :] = 1.0
    bands_b = dict_bands(blur_band_rows(cfg, mb))
    assert bands_b["clarity"] == (128, 384)

    # near-full support: restriction skipped (not worth a jit variant)
    full = np.ones((1, H, W), np.float32)
    assert blur_band_rows(cfg, full) is None

    # empty support: minimal band, still valid
    empty = np.zeros((1, H, W), np.float32)
    bands_e = dict_bands(blur_band_rows(cfg, empty))
    assert bands_e["clarity"][0] == 0 and bands_e["clarity"][1] <= 128


def dict_bands(bands):
    assert bands is not None
    return {k: (y0, y1) for k, y0, y1 in bands}


@pytest.mark.parametrize("fused", [False, True])
def test_banded_develop_matches_full(fused):
    import jax.numpy as jnp

    from rapidraw_tpu.pipeline.batch import develop_batch, stack_params

    doc = _doc()
    p, c = parse_adjustments(doc, is_raw=False)
    params, cfg = stack_params([p], [c])
    masks_np = rasterize_masks(doc, W, H, scale=1.0)
    bands = blur_band_rows(cfg, masks_np)
    assert bands is not None and len(bands) == 2

    rng = np.random.default_rng(7)
    img = jnp.asarray(rng.random((1, 3, H, W), dtype=np.float32))
    masks = jnp.asarray(masks_np)[None]

    full = np.asarray(develop_batch(img, params, cfg, masks=masks, fused=fused))
    banded = np.asarray(
        develop_batch(img, params, cfg, masks=masks, fused=fused,
                      blur_bands=bands)
    )
    # identical outside the band (both paths are exact identity there);
    # inside, only matmul-blocking reassociation noise
    np.testing.assert_allclose(banded, full, atol=3e-5, rtol=0)

    y0 = min(b[1] for b in bands)
    y1 = max(b[2] for b in bands)
    outside = np.ones(H, bool)
    outside[y0:y1] = False
    assert np.array_equal(banded[:, :, outside], full[:, :, outside])
