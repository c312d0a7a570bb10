"""Noise reduction: robust bilateral luma NR + chroma bilateral NR.

Port of shader.wgsl:889-1075 (`apply_noise_reduction`): a 5x5 sampling
window whose stride grows with amount and resolution, hash-jittered tap
positions, two-pass robust (bisquare) weighted luma mean, and a joint
spatial/luma/chroma bilateral filter on the R-Y / B-Y chroma planes.

The tap positions are data-dependent (per-pixel jitter), so this version
uses XLA gathers over precomputed per-channel planes. NR is statically
gated (DevelopConfig.nr_active); a Pallas halo-tile kernel is the planned
fast path.

Note the sampling-source asymmetry preserved from the reference: the center
value is the CA-corrected, linearized pixel, while neighbor taps re-read the
*original* input texture (shader.wgsl:951, 1040). Planar (3, H, W) layout.
"""

from __future__ import annotations

import jax.numpy as jnp

from rapidraw_tpu.ops import colorspace as cs
from rapidraw_tpu.ops.common import LUMA_COEFF, luma, mix, smoothstep
from rapidraw_tpu.ops.grain import hash2

_OFFSETS = [(dx, dy) for dy in range(-2, 3) for dx in range(-2, 3) if not (dx == 0 and dy == 0)]


def _gather_plane(plane_flat: jnp.ndarray, cx: jnp.ndarray, cy: jnp.ndarray, w: int):
    idx = cy * w + cx
    return jnp.take(plane_flat, idx.reshape(-1), axis=0).reshape(idx.shape + plane_flat.shape[1:])


def _shift_plane(padded: jnp.ndarray, off_x: int, off_y: int, pad: int, h: int, w: int):
    """Static edge-clamped shift: a slice of the edge-padded plane."""
    return padded[..., pad + off_y : pad + off_y + h, pad + off_x : pad + off_x + w]


def apply_noise_reduction(
    center_linear: jnp.ndarray,
    input_rgb: jnp.ndarray,
    luma_amount,
    color_amount,
    scale: float,
    is_raw: bool,
    static_luma: float | None = None,
    static_color: float | None = None,
) -> jnp.ndarray:
    """Args:
      center_linear: (3, H, W) linearized (and CA-corrected) pixel values.
      input_rgb: (3, H, W) original input-space texture (neighbor source).
      luma_amount / color_amount: scalar or (H, W) effective amounts.
      scale: resolution scale (static float).
      static_luma / static_color: when the amounts are document constants
        (DevelopConfig.nr_static_*), the tap grid is static: taps become
        edge-clamped SLICES instead of gathers (24 fused shifts, ~3 ms vs
        15.6 s of gathers for 24MP on v5e). The per-pixel hash jitter is
        dropped on this path — it exists to break up grid aliasing, and
        its displacement is below the filter's own smoothing radius.
    """
    if static_luma is not None and static_color is not None:
        return _apply_nr_static(
            center_linear, input_rgb, static_luma, static_color, scale, is_raw
        )
    _, h, w = input_rgb.shape
    luma_a = jnp.clip(luma_amount, 0.0, 1.0)
    color_a = jnp.clip(color_amount, 0.0, 1.0)

    neighbor_linear = input_rgb if is_raw else cs.srgb_to_linear(input_rgb)
    n_luma = luma(jnp.maximum(neighbor_linear, 0.0))
    n_luma_flat = n_luma.reshape(-1)
    # chroma planes for the color pass: r - Y and b - Y of the *signed* linear
    n_r_y = neighbor_linear[0] - n_luma
    n_b_y = neighbor_linear[2] - n_luma
    n_color_flat = jnp.stack([n_luma, n_r_y, n_b_y], axis=-1).reshape(-1, 3)

    center_safe = jnp.maximum(center_linear, 0.0)
    center_luma = luma(center_safe)
    center_chroma = center_linear - center_luma

    res_factor = float(min(max(scale**0.5, 0.5), 2.0))

    ys = jnp.arange(h, dtype=jnp.float32)[:, None] * jnp.ones((1, w), jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)[None, :] * jnp.ones((h, 1), jnp.float32)
    xi = xs.astype(jnp.int32)
    yi = ys.astype(jnp.int32)

    # ------------------------------------------------------------- luma pass
    l_curve = jnp.sqrt(luma_a)
    stride_f = mix(1.0, 2.0, smoothstep(0.45, 0.95, luma_a)) * res_factor
    extra = jnp.clip(stride_f - 1.0, 0.0, 1.0)
    l_spatial = mix(1.0, 1.5, l_curve)
    l_spat_n = -1.0 / jnp.maximum(2.0 * l_spatial * l_spatial, 1e-6)

    h1 = hash2(xs, ys)
    h2 = hash2(xs + 17.31, ys + 71.13)
    jx = (h1 - 0.5) * 2.0 * extra
    jy = (h2 - 0.5) * 2.0 * extra

    samp_luma = [center_luma]
    samp_spat = [jnp.ones_like(center_luma)]
    lmin = center_luma
    lmax = center_luma
    for dx, dy in _OFFSETS:
        ring = max(abs(dx), abs(dy))
        ring_factor = 1.0 if ring == 2 else 0.5
        grow = 1.0 + extra * ring_factor
        off_x = jnp.round(dx * grow + jx).astype(jnp.int32)
        off_y = jnp.round(dy * grow + jy).astype(jnp.int32)
        cx = jnp.clip(xi + off_x, 0, w - 1)
        cy = jnp.clip(yi + off_y, 0, h - 1)
        s_luma = _gather_plane(n_luma_flat, cx, cy, w)
        samp_luma.append(s_luma)
        samp_spat.append(jnp.exp(float(dx * dx + dy * dy) * l_spat_n))
        lmin = jnp.minimum(lmin, s_luma)
        lmax = jnp.maximum(lmax, s_luma)

    luma_range = lmax - lmin
    edge_strength = smoothstep(0.04, 0.20, luma_range)
    edge_midpoint = (lmin + lmax) * 0.5
    center_side = center_luma > edge_midpoint
    l_range_tol = mix(
        mix(0.025, 0.075, l_curve), mix(0.010, 0.025, l_curve), edge_strength
    )

    sum_a = jnp.zeros_like(center_luma)
    w_a = jnp.zeros_like(center_luma)
    gates = []
    for s_luma, s_spat in zip(samp_luma, samp_spat):
        diff = jnp.abs(s_luma - center_luma)
        g_range = 1.0 - smoothstep(l_range_tol * 0.6, l_range_tol, diff)
        s_side = s_luma > edge_midpoint
        g_side = jnp.where(s_side == center_side, 1.0, 0.0)
        g_edge = mix(1.0, g_side, edge_strength)
        wgt = s_spat * g_range * g_edge
        gates.append(wgt)
        sum_a = sum_a + s_luma * wgt
        w_a = w_a + wgt
    initial_mean = sum_a / jnp.maximum(w_a, 1e-4)

    outlier_tol = mix(0.07, 0.025, edge_strength)
    sum_b = jnp.zeros_like(center_luma)
    w_b = jnp.zeros_like(center_luma)
    for s_luma, init_w in zip(samp_luma, gates):
        d = s_luma - initial_mean
        r = jnp.abs(d) / outlier_tol
        bisq = jnp.maximum(0.0, 1.0 - r * r)
        wgt = init_w * bisq * bisq
        wgt = jnp.where(init_w > 0.0001, wgt, 0.0)
        sum_b = sum_b + s_luma * wgt
        w_b = w_b + wgt
    robust_luma = jnp.where(w_b > 0.01, sum_b / jnp.maximum(w_b, 1e-6), initial_mean)

    strength = luma_a * mix(1.0, 0.6, edge_strength)
    new_luma = mix(center_luma, robust_luma, strength)
    new_luma = jnp.where(luma_a > 0.001, new_luma, center_luma)

    # ------------------------------------------------------------ color pass
    center_r_y = center_linear[0] - center_luma
    center_b_y = center_linear[2] - center_luma
    c_curve = jnp.sqrt(color_a)
    c_stride = mix(2.0, 3.5, c_curve) * res_factor
    c_spatial = mix(2.0, 3.5, c_curve)
    c_spat_n = -1.0 / jnp.maximum(2.0 * c_spatial * c_spatial, 1e-6)
    luma_tol = mix(0.12, 0.04, c_curve)
    luma_n = -1.0 / jnp.maximum(2.0 * luma_tol * luma_tol, 1e-6)
    chroma_tol = mix(0.20, 0.08, c_curve)
    chroma_n = -1.0 / jnp.maximum(2.0 * chroma_tol * chroma_tol, 1e-6)

    jh1 = hash2(xs + 43.7, ys + 91.1)
    jh2 = hash2(xs + 73.3, ys + 17.9)
    cjx = (jh1 - 0.5) * c_stride * 0.5
    cjy = (jh2 - 0.5) * c_stride * 0.5

    sum_r = center_r_y
    sum_bv = center_b_y
    w_sum = jnp.ones_like(center_r_y)
    for dx, dy in _OFFSETS:
        off_x = jnp.round(dx * c_stride + cjx).astype(jnp.int32)
        off_y = jnp.round(dy * c_stride + cjy).astype(jnp.int32)
        cx = jnp.clip(xi + off_x, 0, w - 1)
        cy = jnp.clip(yi + off_y, 0, h - 1)
        s = _gather_plane(n_color_flat, cx, cy, w)  # (..., 3): luma, r_y, b_y
        s_luma, s_r_y, s_b_y = s[..., 0], s[..., 1], s[..., 2]
        w_s = jnp.exp(float(dx * dx + dy * dy) * c_spat_n)
        dl = s_luma - center_luma
        w_l = jnp.exp(dl * dl * luma_n)
        dr = s_r_y - center_r_y
        db = s_b_y - center_b_y
        w_c = jnp.exp((dr * dr + db * db) * chroma_n)
        wgt = w_s * w_l * w_c
        sum_r = sum_r + s_r_y * wgt
        sum_bv = sum_bv + s_b_y * wgt
        w_sum = w_sum + wgt

    filtered_r_y = sum_r / jnp.maximum(w_sum, 1e-6)
    filtered_b_y = sum_bv / jnp.maximum(w_sum, 1e-6)
    new_r_y = mix(center_r_y, filtered_r_y, color_a)
    new_b_y = mix(center_b_y, filtered_b_y, color_a)
    new_g_y = -(LUMA_COEFF[0] * new_r_y + LUMA_COEFF[2] * new_b_y) / LUMA_COEFF[1]
    new_chroma = jnp.stack([new_r_y, new_g_y, new_b_y])
    new_chroma = jnp.where(jnp.asarray(color_a > 0.001), new_chroma, center_chroma)

    out = new_luma + new_chroma
    skip = (luma_a < 0.001) & (color_a < 0.001)
    return jnp.where(jnp.asarray(skip), center_linear, out)


def _smoothstep_f(e0: float, e1: float, x: float) -> float:
    t = min(max((x - e0) / (e1 - e0), 0.0), 1.0)
    return t * t * (3.0 - 2.0 * t)


def _apply_nr_static(
    center_linear: jnp.ndarray,
    input_rgb: jnp.ndarray,
    luma_a: float,
    color_a: float,
    scale: float,
    is_raw: bool,
) -> jnp.ndarray:
    """Static-grid NR: identical weighting math to the gather path with the
    tap positions fixed at the jitter-free grid (doc-constant amounts)."""
    import math

    _, h, w = input_rgb.shape
    luma_a = min(max(luma_a, 0.0), 1.0)
    color_a = min(max(color_a, 0.0), 1.0)
    if luma_a < 0.001 and color_a < 0.001:
        return center_linear

    neighbor_linear = input_rgb if is_raw else cs.srgb_to_linear(input_rgb)
    n_luma = luma(jnp.maximum(neighbor_linear, 0.0))
    n_r_y = neighbor_linear[0] - n_luma
    n_b_y = neighbor_linear[2] - n_luma

    center_safe = jnp.maximum(center_linear, 0.0)
    center_luma = luma(center_safe)
    center_chroma = center_linear - center_luma

    res_factor = float(min(max(scale**0.5, 0.5), 2.0))

    # ------------------------------------------------------------- luma pass
    l_curve = math.sqrt(luma_a)
    stride_f = (1.0 + _smoothstep_f(0.45, 0.95, luma_a)) * res_factor
    extra = min(max(stride_f - 1.0, 0.0), 1.0)
    l_spatial = 1.0 + 0.5 * l_curve
    l_spat_n = -1.0 / max(2.0 * l_spatial * l_spatial, 1e-6)

    c_curve = math.sqrt(color_a)
    c_stride = (2.0 + 1.5 * c_curve) * res_factor
    max_off = int(
        max(
            round(2 * (1.0 + extra)) if luma_a > 0.001 else 0,
            round(2 * c_stride) if color_a > 0.001 else 0,
            1,
        )
    )
    pad_l = jnp.pad(n_luma, ((max_off, max_off),) * 2, mode="edge")
    pad_r = jnp.pad(n_r_y, ((max_off, max_off),) * 2, mode="edge")
    pad_b = jnp.pad(n_b_y, ((max_off, max_off),) * 2, mode="edge")

    new_luma = center_luma
    if luma_a > 0.001:
        samp_luma = [center_luma]
        samp_spat = [jnp.ones_like(center_luma)]
        lmin = center_luma
        lmax = center_luma
        for dx, dy in _OFFSETS:
            ring = max(abs(dx), abs(dy))
            grow = 1.0 + extra * (1.0 if ring == 2 else 0.5)
            ox, oy = int(round(dx * grow)), int(round(dy * grow))
            s_luma = _shift_plane(pad_l, ox, oy, max_off, h, w)
            samp_luma.append(s_luma)
            samp_spat.append(
                jnp.full_like(center_luma, math.exp(float(dx * dx + dy * dy) * l_spat_n))
            )
            lmin = jnp.minimum(lmin, s_luma)
            lmax = jnp.maximum(lmax, s_luma)

        luma_range = lmax - lmin
        edge_strength = smoothstep(0.04, 0.20, luma_range)
        edge_midpoint = (lmin + lmax) * 0.5
        center_side = center_luma > edge_midpoint
        l_range_tol = mix(
            mix(0.025, 0.075, l_curve), mix(0.010, 0.025, l_curve), edge_strength
        )

        sum_a = jnp.zeros_like(center_luma)
        w_a = jnp.zeros_like(center_luma)
        gates = []
        for s_luma, s_spat in zip(samp_luma, samp_spat):
            diff = jnp.abs(s_luma - center_luma)
            g_range = 1.0 - smoothstep(l_range_tol * 0.6, l_range_tol, diff)
            s_side = s_luma > edge_midpoint
            g_side = jnp.where(s_side == center_side, 1.0, 0.0)
            g_edge = mix(1.0, g_side, edge_strength)
            wgt = s_spat * g_range * g_edge
            gates.append(wgt)
            sum_a = sum_a + s_luma * wgt
            w_a = w_a + wgt
        initial_mean = sum_a / jnp.maximum(w_a, 1e-4)

        outlier_tol = mix(0.07, 0.025, edge_strength)
        sum_b = jnp.zeros_like(center_luma)
        w_b = jnp.zeros_like(center_luma)
        for s_luma, init_w in zip(samp_luma, gates):
            d = s_luma - initial_mean
            r = jnp.abs(d) / outlier_tol
            bisq = jnp.maximum(0.0, 1.0 - r * r)
            wgt = init_w * bisq * bisq
            wgt = jnp.where(init_w > 0.0001, wgt, 0.0)
            sum_b = sum_b + s_luma * wgt
            w_b = w_b + wgt
        robust_luma = jnp.where(w_b > 0.01, sum_b / jnp.maximum(w_b, 1e-6), initial_mean)

        strength = luma_a * mix(1.0, 0.6, edge_strength)
        new_luma = mix(center_luma, robust_luma, strength)

    # ------------------------------------------------------------ color pass
    new_chroma = center_chroma
    if color_a > 0.001:
        center_r_y = center_linear[0] - center_luma
        center_b_y = center_linear[2] - center_luma
        c_spatial = 2.0 + 1.5 * c_curve
        c_spat_n = -1.0 / max(2.0 * c_spatial * c_spatial, 1e-6)
        luma_tol = 0.12 + (0.04 - 0.12) * c_curve
        luma_n = -1.0 / max(2.0 * luma_tol * luma_tol, 1e-6)
        chroma_tol = 0.20 + (0.08 - 0.20) * c_curve
        chroma_n = -1.0 / max(2.0 * chroma_tol * chroma_tol, 1e-6)

        sum_r = center_r_y
        sum_bv = center_b_y
        w_sum = jnp.ones_like(center_r_y)
        for dx, dy in _OFFSETS:
            ox, oy = int(round(dx * c_stride)), int(round(dy * c_stride))
            s_luma = _shift_plane(pad_l, ox, oy, max_off, h, w)
            s_r_y = _shift_plane(pad_r, ox, oy, max_off, h, w)
            s_b_y = _shift_plane(pad_b, ox, oy, max_off, h, w)
            w_s = math.exp(float(dx * dx + dy * dy) * c_spat_n)
            dl = s_luma - center_luma
            w_l = jnp.exp(dl * dl * luma_n)
            dr = s_r_y - center_r_y
            db = s_b_y - center_b_y
            w_c = jnp.exp((dr * dr + db * db) * chroma_n)
            wgt = w_s * w_l * w_c
            sum_r = sum_r + s_r_y * wgt
            sum_bv = sum_bv + s_b_y * wgt
            w_sum = w_sum + wgt

        filtered_r_y = sum_r / jnp.maximum(w_sum, 1e-6)
        filtered_b_y = sum_bv / jnp.maximum(w_sum, 1e-6)
        new_r_y = mix(center_r_y, filtered_r_y, color_a)
        new_b_y = mix(center_b_y, filtered_b_y, color_a)
        new_g_y = -(LUMA_COEFF[0] * new_r_y + LUMA_COEFF[2] * new_b_y) / LUMA_COEFF[1]
        new_chroma = jnp.stack([new_r_y, new_g_y, new_b_y])

    return new_luma + new_chroma
