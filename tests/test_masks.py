"""Mask rasterizer tests (port of mask_generation.rs semantics)."""

import numpy as np

from rapidraw_tpu.masks.rasterize import (
    generate_brush,
    generate_linear,
    generate_mask_bitmap,
    generate_radial,
    rasterize_masks,
)


def test_radial_center_full_edge_zero():
    params = {"centerX": 32, "centerY": 32, "radiusX": 16, "radiusY": 16, "rotation": 0, "feather": 0.5}
    m = generate_radial(params, 64, 64, 1.0, (0.0, 0.0))
    assert m[32, 32] == 255
    assert m[0, 0] == 0
    # feather: halfway between inner bound and edge is partial
    assert 0 < m[32, 32 + 12] < 255


def test_radial_rotation_changes_ellipse():
    params = {"centerX": 32, "centerY": 32, "radiusX": 24, "radiusY": 6, "rotation": 90, "feather": 0.0}
    m = generate_radial(params, 64, 64, 1.0, (0.0, 0.0))
    # with 90° rotation the long axis is vertical
    assert m[32 + 20, 32] == 255  # along y
    assert m[32, 32 + 20] == 0  # along x


def test_linear_gradient_perpendicular_to_drawn_line():
    # the gradient axis is the PERPENDICULAR of the drawn line
    # (mask_generation.rs:607-618): a vertical drag makes a horizontal ramp
    params = {"startX": 32, "startY": 32, "endX": 32, "endY": 48, "range": 16}
    m = generate_linear(params, 64, 64, 1.0, (0.0, 0.0))
    assert abs(int(m[32, 32]) - 127) <= 1  # 0.5 on the drawn line
    assert m[10, 48] == 255 or m[10, 16] == 255  # full on one side
    assert (m[:, 48] == m[0, 48]).all()  # constant along the drag direction
    assert m[32, 16] + m[32, 48] in (254, 255, 256)  # symmetric ramp


def test_brush_stroke_coverage_and_eraser():
    params = {
        "lines": [
            {"tool": "brush", "brushSize": 16, "feather": 0.0,
             "points": [{"x": 10, "y": 32}, {"x": 54, "y": 32}]},
        ]
    }
    m = generate_brush(params, 64, 64, 1.0, (0.0, 0.0))
    assert m[32, 32] == 255
    assert m[10, 10] == 0
    params["lines"].append(
        {"tool": "eraser", "brushSize": 16, "feather": 0.0,
         "points": [{"x": 30, "y": 32}, {"x": 34, "y": 32}]}
    )
    m2 = generate_brush(params, 64, 64, 1.0, (0.0, 0.0))
    assert m2[32, 32] == 0
    assert m2[32, 12] == 255


def test_submask_modes():
    full = {"type": "all", "visible": True, "mode": "additive", "opacity": 100.0, "invert": False}
    radial = {
        "type": "radial",
        "visible": True,
        "mode": "subtractive",
        "opacity": 100.0,
        "invert": False,
        "parameters": {"centerX": 16, "centerY": 16, "radiusX": 8, "radiusY": 8, "feather": 0.0, "rotation": 0},
    }
    mask_def = {"visible": True, "invert": False, "opacity": 100.0, "subMasks": [full, radial]}
    m = generate_mask_bitmap(mask_def, 32, 32, 1.0, (0.0, 0.0))
    assert m[16, 16] == 0  # subtracted circle
    assert m[0, 0] == 255

    mask_def["invert"] = True
    m = generate_mask_bitmap(mask_def, 32, 32, 1.0, (0.0, 0.0))
    assert m[16, 16] == 255
    assert m[0, 0] == 0

    mask_def["invert"] = False
    mask_def["opacity"] = 50.0
    m = generate_mask_bitmap(mask_def, 32, 32, 1.0, (0.0, 0.0))
    assert m[0, 0] == 127


def test_rasterize_masks_aligns_with_parse():
    doc = {
        "masks": [
            {"visible": False, "subMasks": [{"type": "all", "visible": True, "mode": "additive"}], "adjustments": {}},
            {"visible": True, "subMasks": [{"type": "all", "visible": True, "mode": "additive"}], "adjustments": {"exposure": 1.0}},
        ]
    }
    out = rasterize_masks(doc, 16, 16)
    assert out.shape == (1, 16, 16)  # only the visible mask
    np.testing.assert_allclose(out[0], 1.0)

    from rapidraw_tpu.params.parse import parse_adjustments

    _, cfg = parse_adjustments(doc)
    assert cfg.mask_count == out.shape[0]


def test_stroke_distance_chunking_equivalent():
    """The chunked segment-axis SDF must equal the per-segment running
    min (the memory-bounded path is pure restructuring)."""
    import numpy as np

    import rapidraw_tpu.masks.rasterize as rz

    rng = np.random.default_rng(0)
    pts = (rng.random((40, 2)) * 60).astype(np.float32)
    bb = (0, 0, 63, 47)
    full = rz._stroke_distance_sq(pts, bb)
    best = np.full(full.shape, np.inf, np.float32)
    for i in range(len(pts) - 1):
        np.minimum(best, rz._stroke_distance_sq(pts[i : i + 2], bb), out=best)
    np.testing.assert_allclose(full, best, rtol=1e-5, atol=1e-4)
