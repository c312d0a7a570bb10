"""BM3D denoiser tests."""

import numpy as np

from rapidraw_tpu.compositions.bm3d import Bm3dParams, _hadamard, run_bm3d


def test_params_from_intensity():
    p = Bm3dParams.from_intensity(0.5)
    assert p.sigma == 40.0
    assert p.hard_th_lambda == 3.25
    assert p.max_dist_hard == 13000.0


def test_hadamard_orthonormal():
    for n in (1, 2, 4, 8, 16):
        h = _hadamard(n)
        np.testing.assert_allclose(h @ h.T, np.eye(n), atol=1e-6)


def test_bm3d_reduces_noise():
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:72, 0:96].astype(np.float32)
    clean = np.stack(
        [
            0.4 + 0.3 * np.sin(xx / 11.0),
            0.5 + 0.2 * np.cos(yy / 9.0),
            0.45 + 0.25 * np.sin((xx + yy) / 14.0),
        ]
    )
    noisy = np.clip(clean + rng.normal(0, 0.08, clean.shape).astype(np.float32), 0, 1)
    out = run_bm3d(noisy, intensity=0.5)
    assert out.shape == clean.shape
    assert np.isfinite(out).all()
    mse_before = float(((noisy - clean) ** 2).mean())
    mse_after = float(((out - clean) ** 2).mean())
    assert mse_after < mse_before * 0.5, (mse_before, mse_after)


def test_bm3d_flat_image_stable():
    flat = np.full((3, 64, 64), 0.5, np.float32)
    out = run_bm3d(flat, intensity=0.3)
    np.testing.assert_allclose(out, 0.5, atol=0.02)


def test_bm3d_tiny_frame_is_identity():
    """Frames <= one block return unchanged, like the reference's
    saturating_sub loop yielding zero reference blocks."""
    import numpy as np

    from rapidraw_tpu.compositions.bm3d import run_bm3d

    img = np.random.default_rng(1).random((3, 6, 6)).astype(np.float32)
    np.testing.assert_allclose(run_bm3d(img, 0.8), img, atol=1e-5)


def test_block_match_distance_is_ref_vs_candidate():
    """The match distance for (ref, ref+off) must be the SSD between THOSE
    two patches — a regression test for indexing the shifted-difference
    integral image at the candidate position (which compares the candidate
    against a patch one further offset away)."""
    import numpy as np

    from rapidraw_tpu.compositions.bm3d import (
        Bm3dParams,
        _block_match,
    )

    rng = np.random.default_rng(7)
    img = rng.random((26, 26)).astype(np.float32)
    # plant an exact duplicate of the (0,0) patch at (0,8), and a wildly
    # different patch at (0,16): with correct indexing, ref (0,0) pairs
    # with (0,8) at distance ~0; the buggy candidate-indexed read returns
    # SSD((0,8), (0,16)) instead, which is huge
    img[0:8, 8:16] = img[0:8, 0:8]
    img[0:8, 16:24] = 50.0
    guide = [img, img, img]
    p = Bm3dParams.from_intensity(0.5)
    refs, locs, sizes = _block_match(guide, True, p)
    i = int(np.flatnonzero((refs[:, 0] == 0) & (refs[:, 1] == 0))[0])
    group = {tuple(x) for x in locs[i][: sizes[i]]}
    assert (0, 8) in group, f"duplicate patch must match its ref: {group}"
    assert (0, 16) not in group, "the 50.0 patch cannot be a match"
