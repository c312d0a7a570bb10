"""Panorama stitching tests: overlapping crops of one textured scene."""

import numpy as np
import pytest

from rapidraw_tpu.compositions.panorama import PanoramaError, stitch_panorama


def _scene(h=320, w=640, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = np.stack(
        [
            0.4 + 0.3 * np.sin(xx / 17.0) * np.cos(yy / 23.0),
            0.5 + 0.2 * np.sin((xx + yy) / 31.0),
            0.45 + 0.25 * np.cos(xx / 13.0),
        ]
    )
    # strong random texture so ORB finds features
    base += rng.random((3, h, w), dtype=np.float32) * 0.3
    return np.clip(base, 0, 1).astype(np.float32)


def test_stitch_two_overlapping_crops():
    scene = _scene()
    left = scene[:, :, :400]
    right = scene[:, :, 240:]
    pano = stitch_panorama([left, right])
    assert pano.shape[0] == 3
    # output should cover roughly the union width (640) at scene height
    assert pano.shape[2] > 560
    assert abs(pano.shape[1] - scene.shape[1]) < 40
    assert np.isfinite(pano).all()


def test_stitch_rejects_single_and_unrelated():
    scene = _scene()
    with pytest.raises(PanoramaError):
        stitch_panorama([scene])
    rng = np.random.default_rng(9)
    unrelated = rng.random((3, 200, 200), dtype=np.float32)
    flat = np.zeros((3, 200, 200), np.float32)
    with pytest.raises(PanoramaError):
        stitch_panorama([unrelated, flat])


def test_panorama_root_not_frame_zero(tmp_path):
    """An unrelated first frame must not block stitching the others."""
    import numpy as np
    import pytest

    cv2 = pytest.importorskip("cv2")
    from rapidraw_tpu.compositions.panorama import stitch_panorama

    rng = np.random.default_rng(11)
    base = (rng.random((240, 520, 3)) * 255).astype(np.uint8)
    left = base[:, :320].astype(np.float32).transpose(2, 0, 1) / 255.0
    right = base[:, 200:].astype(np.float32).transpose(2, 0, 1) / 255.0
    noise = (rng.random((3, 240, 320)).astype(np.float32))  # unrelated
    pano = stitch_panorama([noise, left, right])
    assert pano.shape[2] >= 400  # wider than either input
