"""Cross-check three independent AgX implementations:

  A. tests/cpu_anchor.py — transcribed from the reference's RUST CPU path
     (LUT-based, image_processing.rs:1686-1794)
  B. tests/oracle.py     — transcribed from the WGSL megakernel
  C. rapidraw_tpu ops    — the shipped TPU kernels (params/agx.py matrices
     + ops/tone.agx_tonemap)

A misreading of the matrix derivation, log encoding or sigmoid constants
in any ONE source shows up as a pairwise disagreement beyond the LUT
quantization bound (the CPU LUT floor-indexes 4096 entries; worst-case
step ~1.4e-3 through the gamma slope).
"""

from __future__ import annotations

import numpy as np

import cpu_anchor


def test_anchor_matrices_match_shipped_derivation():
    from rapidraw_tpu.params.agx import compute_agx_matrices

    p2r_a, r2p_a = cpu_anchor.agx_matrices()
    p2r_s, r2p_s = compute_agx_matrices()
    np.testing.assert_allclose(p2r_a, np.asarray(p2r_s), atol=2e-6)
    np.testing.assert_allclose(r2p_a, np.asarray(r2p_s), atol=2e-6)


def _test_colors():
    rng = np.random.default_rng(0)
    cols = rng.random((3, 40, 50)).astype(np.float32) * 2.0  # incl. >1 HDR
    cols[:, 0, 0] = 0.0
    cols[:, 0, 1] = 1.0
    cols[0, 0, 2] = -0.2  # negative channel: exercises the min-c lift
    cols[:, 0, 3] = 0.18  # mid grey
    return cols


def test_cpu_anchor_vs_wgsl_oracle():
    import oracle

    from rapidraw_tpu.params.agx import compute_agx_matrices

    p2r, r2p = compute_agx_matrices()
    cols = _test_colors()
    a = cpu_anchor.apply_cpu_agx_tonemap(cols)

    b = np.zeros_like(cols)
    for i in range(cols.shape[1]):
        for j in range(cols.shape[2]):
            b[:, i, j] = np.clip(
                oracle.agx_tonemap(cols[:, i, j].astype(np.float64),
                                   np.asarray(p2r), np.asarray(r2p)),
                0.0, 1.0,
            )
    d = np.abs(a - b)
    assert d.max() < 2.5e-3, d.max()  # LUT floor-index quantization bound
    assert np.quantile(d, 0.99) < 1.5e-3


def test_cpu_anchor_vs_tpu_kernel():
    import jax.numpy as jnp

    from rapidraw_tpu.ops.tone import agx_tonemap
    from rapidraw_tpu.params.agx import compute_agx_matrices

    p2r, r2p = compute_agx_matrices()
    cols = _test_colors()
    a = cpu_anchor.apply_cpu_agx_tonemap(cols)
    c = np.clip(np.asarray(
        agx_tonemap(jnp.asarray(cols), jnp.asarray(p2r), jnp.asarray(r2p))
    ), 0.0, 1.0)
    d = np.abs(a - c)
    assert d.max() < 2.5e-3, d.max()


def test_unedited_thumbnail_semantic_vs_anchor():
    """The null-adjustments LDR AgX semantic (srgb->linear->AgX,
    file_management.rs:1346-1363) through the shipped ops matches the
    Rust-derived anchor."""
    import jax.numpy as jnp

    from rapidraw_tpu.ops.colorspace import srgb_to_linear
    from rapidraw_tpu.ops.tone import agx_tonemap
    from rapidraw_tpu.params.agx import compute_agx_matrices

    rng = np.random.default_rng(1)
    srgb = rng.random((3, 24, 32)).astype(np.float32)
    want = cpu_anchor.unedited_ldr_thumbnail_cpu(srgb)
    p2r, r2p = compute_agx_matrices()
    got = np.clip(np.asarray(
        agx_tonemap(srgb_to_linear(jnp.asarray(srgb)),
                    jnp.asarray(p2r), jnp.asarray(r2p))
    ), 0.0, 1.0)
    d = np.abs(got - want)
    assert d.max() < 2.5e-3, d.max()
