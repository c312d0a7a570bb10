"""Noise reduction: robust bilateral luma NR + chroma bilateral NR.

Port of shader.wgsl:889-1075 (`apply_noise_reduction`): a 5x5 sampling
window whose stride grows with amount and resolution, hash-jittered tap
positions, two-pass robust (bisquare) weighted luma mean, and a joint
spatial/luma/chroma bilateral filter on the R-Y / B-Y chroma planes.

The jittered (per-pixel data-dependent) path uses XLA gathers over
precomputed per-channel planes; the static-grid path (doc-constant
amounts — every real document) runs the chunked-halo Pallas kernel below,
with an XLA shifted-slice escape (FORCE_XLA) for spatial SPMD sharding.

Note the sampling-source asymmetry preserved from the reference: the center
value is the CA-corrected, linearized pixel, while neighbor taps re-read the
*original* input texture (shader.wgsl:951, 1040). Planar (3, H, W) layout.
"""

from __future__ import annotations

import contextvars

import jax.numpy as jnp

from rapidraw_tpu.ops import colorspace as cs
from rapidraw_tpu.ops.common import LUMA_COEFF, luma, mix, smoothstep
from rapidraw_tpu.ops.grain import hash2

# When set, static-grid NR lowers to the XLA shifted-slice path instead of
# the Pallas halo kernel — used by the spatially-sharded multi-chip path
# (parallel/mesh.py), where SPMD partitions slices but not pallas_calls.
FORCE_XLA = contextvars.ContextVar("rapidraw_nr_force_xla", default=False)

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
    tile_offset=(0, 0),
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
      tile_offset: absolute (x, y) of this array's origin when it is one
        tile of a larger image (pipeline.tiled) — the hash tap jitter is a
        function of absolute pixel coordinates, so tile-local coordinates
        would produce a different tap pattern per tile (and seams). The
        static-grid paths have no coordinate dependence and ignore it.
    """
    if static_luma is not None and static_color is not None:
        import os as _os_

        if _os_.environ.get("RAPIDRAW_NR_EXACT_JITTER") == "1":
            # exact-jitter opt-in: the per-pixel hash tap jitter
            # (shader.wgsl:944-948) reproduced via static candidate-mask
            # enumeration over shifted slices — no gathers, SPMD-safe,
            # ~3x the static-grid cost. Default stays the jitter-free
            # static grid (statistically identical denoising; see
            # PERFORMANCE.md scope caveat). Requires static tile offsets
            # (the candidate masks constant-fold the coordinate hash).
            x_off, y_off = tile_offset
            if not (isinstance(x_off, (int, float)) and isinstance(y_off, (int, float))):
                raise ValueError(
                    "RAPIDRAW_NR_EXACT_JITTER needs static tile offsets; "
                    "the tiled dispatch passes them statically when the "
                    "exact-jitter path is active"
                )
            return _apply_nr_jittered_slices(
                center_linear, input_rgb, static_luma, static_color, scale,
                is_raw, x_abs=int(x_off), y_abs0=int(y_off),
            )
        if FORCE_XLA.get():
            # spatially-sharded path: the XLA shifted-slice formulation
            # partitions under SPMD (halo exchanges inserted over ICI); an
            # opaque pallas_call would be all-gathered + replicated — the
            # same escape hatch as ops/blur.FORCE_CONV
            return _apply_nr_static(
                center_linear, input_rgb, static_luma, static_color, scale,
                is_raw,
            )
        return _apply_nr_static_pallas(
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
    # hash coordinates are ABSOLUTE (tile-local xs/ys stay the gather base)
    x_off, y_off = tile_offset
    xs = xs + jnp.asarray(x_off, jnp.float32)
    ys = ys + jnp.asarray(y_off, jnp.float32)

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


def _apply_nr_jittered_slices(
    center_linear: jnp.ndarray,
    input_rgb: jnp.ndarray,
    luma_a: float,
    color_a: float,
    scale: float,
    is_raw: bool,
    x_abs: int = 0,
    y_abs0: int = 0,
) -> jnp.ndarray:
    """EXACT-jitter NR without gathers (RAPIDRAW_NR_EXACT_JITTER=1).

    The hash tap jitter (shader.wgsl:944-948) depends only on pixel
    COORDINATES, so with doc-constant amounts each tap's integer offset
    ranges over a small static candidate set: every sample becomes
    sum over candidates of (offset == candidate) * edge-clamped shift —
    identical values to the gather formulation (verified bit-equal in
    tests), expressed as static slices that XLA fuses and SPMD partitions.
    Costs a few x the static-grid path; the default stays jitter-free.

    Large frames run in row BANDS with a tap-radius halo (the whole-image
    formulation holds ~350 full-res temps and OOMs 24MP on one chip); the
    hash uses absolute coordinates so banding is value-exact.
    """
    import math

    _, h, w = input_rgb.shape
    band = 768
    if h > band:
        res_factor_ = float(min(max(scale**0.5, 0.5), 2.0))
        cc = math.sqrt(min(max(float(color_a), 0.0), 1.0))
        stride_f_ = (1.0 + _smoothstep_f(0.45, 0.95, float(luma_a))) * res_factor_
        extra_ = min(max(stride_f_ - 1.0, 0.0), 1.0)
        c_stride_ = (2.0 + 1.5 * cc) * res_factor_
        halo = int(math.ceil(max(
            2.0 * (1.0 + extra_) + extra_, 2.0 * c_stride_ + c_stride_ * 0.5))) + 2
        # NOTE: a python loop (one XLA subgraph per band, CONSTANT
        # coordinates) is load-bearing for exactness: the coordinate hash
        # must constant-fold the same way as the gather formulation — a
        # traced band offset (lax.map) evaluates hash2 at runtime, where
        # --xla_allow_excess_precision folds fract/mul chains differently
        # and flips ~20% of the jittered tap offsets. The cost is one
        # compile per band position (cached persistently).
        outs = []
        for y0 in range(0, h, band):
            y1 = min(y0 + band, h)
            lo = max(0, y0 - halo)
            hi = min(h, y1 + halo)
            sub = _nr_jittered_band(
                center_linear[:, lo:hi], input_rgb[:, lo:hi],
                luma_a, color_a, scale, is_raw, y_abs=y_abs0 + lo, x_abs=x_abs,
            )
            outs.append(sub[:, y0 - lo : y0 - lo + (y1 - y0)])
        return jnp.concatenate(outs, axis=1)
    return _nr_jittered_band(
        center_linear, input_rgb, luma_a, color_a, scale, is_raw,
        y_abs=y_abs0, x_abs=x_abs,
    )


def _nr_jittered_band(
    center_linear: jnp.ndarray,
    input_rgb: jnp.ndarray,
    luma_a: float,
    color_a: float,
    scale: float,
    is_raw: bool,
    y_abs: int,
    x_abs: int = 0,
) -> jnp.ndarray:
    import math

    _, h, w = input_rgb.shape
    luma_a = min(max(float(luma_a), 0.0), 1.0)
    color_a = min(max(float(color_a), 0.0), 1.0)
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
    ys = (
        jnp.arange(h, dtype=jnp.float32)[:, None] + float(y_abs)
    ) * jnp.ones((1, w), jnp.float32)
    xs = (
        jnp.arange(w, dtype=jnp.float32)[None, :] + float(x_abs)
    ) * jnp.ones((h, 1), jnp.float32)

    l_curve = math.sqrt(luma_a)
    stride_f = (1.0 + _smoothstep_f(0.45, 0.95, luma_a)) * res_factor
    extra = min(max(stride_f - 1.0, 0.0), 1.0)
    l_spat_n = -1.0 / max(2.0 * (1.0 + 0.5 * l_curve) ** 2, 1e-6)
    c_curve = math.sqrt(color_a)
    c_stride = (2.0 + 1.5 * c_curve) * res_factor

    pad = int(math.ceil(max(
        2.0 * (1.0 + extra) + extra, 2.0 * c_stride + c_stride * 0.5))) + 2
    pad_l = jnp.pad(n_luma, pad, mode="edge")
    pad_r = jnp.pad(n_r_y, pad, mode="edge")
    pad_b = jnp.pad(n_b_y, pad, mode="edge")

    def select_taps(planes, off_x, off_y, lo_x, hi_x, lo_y, hi_y):
        outs = [jnp.zeros((h, w), jnp.float32) for _ in planes]
        for oy in range(lo_y, hi_y + 1):
            my = off_y == oy
            for ox in range(lo_x, hi_x + 1):
                m = (my & (off_x == ox)).astype(jnp.float32)
                for i, p in enumerate(planes):
                    outs[i] = outs[i] + m * _shift_plane(p, ox, oy, pad, h, w)
        return outs

    def cand(center: float, amp: float) -> tuple[int, int]:
        return (
            int(math.floor(center - amp + 0.5)) - 1,
            int(math.floor(center + amp + 0.5)) + 1,
        )

    # ------------------------------------------------------------- luma pass
    new_luma = center_luma
    if luma_a > 0.001:
        h1 = hash2(xs, ys)
        h2 = hash2(xs + 17.31, ys + 71.13)
        jx = (h1 - 0.5) * 2.0 * extra
        jy = (h2 - 0.5) * 2.0 * extra

        samp_luma = [center_luma]
        samp_spat = [1.0]
        lmin = center_luma
        lmax = center_luma
        for dx, dy in _OFFSETS:
            ring = max(abs(dx), abs(dy))
            grow = 1.0 + extra * (1.0 if ring == 2 else 0.5)
            off_x = jnp.round(dx * grow + jx).astype(jnp.int32)
            off_y = jnp.round(dy * grow + jy).astype(jnp.int32)
            lo_x, hi_x = cand(dx * grow, extra)
            lo_y, hi_y = cand(dy * grow, extra)
            (s_luma,) = select_taps([pad_l], off_x, off_y, lo_x, hi_x, lo_y, hi_y)
            samp_luma.append(s_luma)
            samp_spat.append(math.exp(float(dx * dx + dy * dy) * l_spat_n))
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
        robust_luma = jnp.where(
            w_b > 0.01, sum_b / jnp.maximum(w_b, 1e-6), initial_mean
        )
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

        jh1 = hash2(xs + 43.7, ys + 91.1)
        jh2 = hash2(xs + 73.3, ys + 17.9)
        cjx = (jh1 - 0.5) * c_stride * 0.5
        cjy = (jh2 - 0.5) * c_stride * 0.5
        amp = c_stride * 0.5 * 0.5  # |cj| < c_stride/4

        sum_r = center_r_y
        sum_bv = center_b_y
        w_sum = jnp.ones_like(center_r_y)
        for dx, dy in _OFFSETS:
            off_x = jnp.round(dx * c_stride + cjx).astype(jnp.int32)
            off_y = jnp.round(dy * c_stride + cjy).astype(jnp.int32)
            lo_x, hi_x = cand(dx * c_stride, amp)
            lo_y, hi_y = cand(dy * c_stride, amp)
            s_luma, s_r_y, s_b_y = select_taps(
                [pad_l, pad_r, pad_b], off_x, off_y, lo_x, hi_x, lo_y, hi_y
            )
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


# ---------------------------------------------------------------------------
# Chunked Pallas kernel for the static-grid path.
#
# The XLA shifted-slice formulation above pays an HBM round-trip per fused
# group (~64 ms for 24MP); this kernel streams full-width row tiles with
# 16-row halo strips through VMEM and runs all ~50 taps' gate math on
# 16-row chunks (measured pattern: tools/prof_nr_slices.py — 24 weighted
# taps 14.3 ms XLA vs 6.3 ms chunked kernel, bit-exact). Mosaic requires
# dynamic sublane starts to be 8-aligned, and tap offsets are arbitrary
# ints, so the chunk loop is statically unrolled (all slice starts python
# ints).
#
# Inputs: `planes` = stacked (luma, R-Y, B-Y) of the linearized *original*
# texture (the neighbor source, shader.wgsl:951,1040) and `center_linear`
# (the CA-corrected linearized pixel). The halo never exceeds 14 px:
# res_factor = clamp(sqrt(scale), .5, 2) caps the chroma stride at 7 and
# taps at 2*stride (see _NR_HALO assert).
# ---------------------------------------------------------------------------

import os as _os

_NR_TH = int(_os.environ.get("RAPIDRAW_NR_TH", "16"))  # rows per tile (swept: 16 won)
_NR_CH = 16   # rows per chunk (= halo, = sublane alignment unit)
_NR_HALO = 16
if _NR_TH < _NR_CH or _NR_TH % _NR_CH:
    # a tile height that is not a positive multiple of the 16-row chunk
    # leaves output rows unwritten and mis-indexes the halo BlockSpecs
    raise ValueError(
        f"RAPIDRAW_NR_TH={_NR_TH} must be a positive multiple of {_NR_CH}"
    )
_NR_CW = int(_os.environ.get("RAPIDRAW_NR_CW", "3072"))  # max block width (swept: 3072 = 26.9 ms, 2048 = 31.2,
               # 512 = 49.4, full-width 6144 = 37.7 for 24MP on v5e)


def _nr_static_meta(luma_a: float, color_a: float, scale: float):
    """Static tap grids + gate constants shared by kernel and XLA paths."""
    import math

    res_factor = float(min(max(scale**0.5, 0.5), 2.0))
    l_curve = math.sqrt(luma_a)
    stride_f = (1.0 + _smoothstep_f(0.45, 0.95, luma_a)) * res_factor
    extra = min(max(stride_f - 1.0, 0.0), 1.0)
    c_curve = math.sqrt(color_a)
    c_stride = (2.0 + 1.5 * c_curve) * res_factor
    luma_taps = []
    for dx, dy in _OFFSETS:
        ring = max(abs(dx), abs(dy))
        grow = 1.0 + extra * (1.0 if ring == 2 else 0.5)
        l_spatial = 1.0 + 0.5 * l_curve
        l_spat_n = -1.0 / max(2.0 * l_spatial * l_spatial, 1e-6)
        luma_taps.append(
            (int(round(dx * grow)), int(round(dy * grow)),
             math.exp(float(dx * dx + dy * dy) * l_spat_n))
        )
    chroma_taps = []
    c_spatial = 2.0 + 1.5 * c_curve
    c_spat_n = -1.0 / max(2.0 * c_spatial * c_spatial, 1e-6)
    for dx, dy in _OFFSETS:
        chroma_taps.append(
            (int(round(dx * c_stride)), int(round(dy * c_stride)),
             math.exp(float(dx * dx + dy * dy) * c_spat_n))
        )
    return {
        "l_curve": l_curve,
        "c_curve": c_curve,
        "luma_taps": luma_taps,
        "chroma_taps": chroma_taps,
    }


def _apply_nr_static_pallas(
    center_linear: jnp.ndarray,
    input_rgb: jnp.ndarray,
    luma_a: float,
    color_a: float,
    scale: float,
    is_raw: bool,
    tap_dtype=None,
    compute_dtype=None,
) -> jnp.ndarray:
    import functools

    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if compute_dtype is None:
        # bf16 GATE/WEIGHT math was MEASURED and rejected as a default
        # (round 5, tools/prof_nr_compute_dtype.py, 24MP v5e): 35.2 ->
        # 35.7 ms (0.985x) — the v5e VPU runs bf16 ALU ops at the f32
        # rate, so halving operand width moves nothing, exactly as
        # halving streamed bytes didn't in round 4 (bf16 taps, 3.5%).
        # Together these close the roofline case: the kernel is bound by
        # lane rotates + scratch DMA (Mosaic-level), not by op count or
        # bytes. RAPIDRAW_NR_COMPUTE=bf16 keeps the measured variant
        # reachable; tests/test_nr_bf16.py pins its deviation bounds.
        compute_dtype = (
            jnp.bfloat16 if _os.environ.get("RAPIDRAW_NR_COMPUTE") == "bf16"
            else jnp.float32
        )
    if tap_dtype is None:
        # bf16-compute streams taps in bf16 too; for f32 compute, bf16 tap
        # streaming alone was MEASURED and rejected (tools/prof_nr_bf16.py,
        # 24MP v5e: 38.5 -> 37.2 ms, ~3.5% — op issue, not bytes, is the
        # bound). RAPIDRAW_NR_TAPS=bf16 keeps that variant reachable.
        tap_dtype = (
            jnp.bfloat16
            if (compute_dtype == jnp.bfloat16
                or _os.environ.get("RAPIDRAW_NR_TAPS") == "bf16")
            else jnp.float32
        )

    _, h, w = input_rgb.shape
    luma_a = min(max(luma_a, 0.0), 1.0)
    color_a = min(max(color_a, 0.0), 1.0)
    meta = _nr_static_meta(luma_a, color_a, scale)
    offs = []
    if luma_a > 0.001:
        offs += [abs(o) for t in meta["luma_taps"] for o in t[:2]]
    if color_a > 0.001:
        offs += [abs(o) for t in meta["chroma_taps"] for o in t[:2]]
    max_off = max(offs) if offs else 0
    assert max_off <= _NR_HALO, f"NR tap offset {max_off} exceeds halo {_NR_HALO}"

    neighbor_linear = input_rgb if is_raw else cs.srgb_to_linear(input_rgb)
    n_luma = luma(jnp.maximum(neighbor_linear, 0.0))
    planes = jnp.stack(
        [n_luma, neighbor_linear[0] - n_luma, neighbor_linear[2] - n_luma]
    ).astype(tap_dtype)

    # 2-D tile grid with a 9-piece halo: center (16, 512) blocks plus N/S
    # row strips (16, 512) and W/E/corner col strips (16, 128) of the SAME
    # padded planes array, assembled into a (3, 48, 768) VMEM scratch. The
    # kernel body is then ONE register-resident chunk with ~50 static tap
    # slices — small enough for Mosaic's compile budget (a statically
    # unrolled full-width variant compiled for >10 minutes).
    ch, hs, th = _NR_CH, _NR_HALO, _NR_TH
    # block width: widest candidate <= _NR_CW that minimizes column padding
    # (cw=4096 at w=6144 pads 2048 dead columns and measured 1.8x slower
    # than the zero-pad cw=3072)
    w128 = -(-w // 128) * 128
    cands = [
        c for c in (3072, 2560, 2048, 1536, 1024, 512)
        if c <= max(w128, 512) and c <= max(_NR_CW, 512)
    ]
    cw = min(cands, key=lambda c: ((-w128) % c, -c)) if cands else w128
    cw = min(cw, w128)
    h16 = h + (-h % th)
    w512 = w + (-w % cw)
    planes_p = jnp.pad(
        planes,
        ((0, 0), (th, (h16 - h) + th), (cw, (w512 - w) + cw)),
        mode="edge",
    )
    center_p = jnp.pad(
        center_linear, ((0, 0), (0, h16 - h), (0, w512 - w)), mode="edge"
    )
    n_i = h16 // th
    n_j = w512 // cw
    cpb = cw // 128   # 128-col units per center block
    rpb = th // hs    # 16-row units per center block

    lt = meta["luma_taps"]
    ct = meta["chroma_taps"]
    l_curve = meta["l_curve"]
    c_curve = meta["c_curve"]

    cd = compute_dtype
    f32 = jnp.float32

    def kernel(c_ref, n_ref, c0_ref, s_ref, nw_ref, w_ref, sw_ref,
               ne_ref, e_ref, se_ref, o_ref, ext_ref, gate_ref):
        ext_ref[:, 0:hs, 128 : 128 + cw] = n_ref[...]
        ext_ref[:, hs : hs + th, 128 : 128 + cw] = c0_ref[...]
        ext_ref[:, hs + th :, 128 : 128 + cw] = s_ref[...]
        ext_ref[:, 0:hs, 0:128] = nw_ref[...]
        ext_ref[:, hs : hs + th, 0:128] = w_ref[...]
        ext_ref[:, hs + th :, 0:128] = sw_ref[...]
        ext_ref[:, 0:hs, 128 + cw :] = ne_ref[...]
        ext_ref[:, hs : hs + th, 128 + cw :] = e_ref[...]
        ext_ref[:, hs + th :, 128 + cw :] = se_ref[...]

        out_chunks = []
        for ci in range(th // ch):
            r0 = ci * ch

            # Load one lane-shifted BAND per distinct (plane, dx) and slice
            # taps out of it by row: a dx-shifted read is a cross-lane
            # rotate of every vreg it touches, so 25 per-tap shifted loads
            # (x3 streaming passes) pay ~75 rotates of (ch, cw) — one
            # (ch+2*hs, cw) band per dx cuts that to the distinct-dx count.
            # Row slices of the loaded band are sublane ops (cheap).
            bands: dict = {}

            def band(plane: int, dx: int, want, r0=r0, bands=bands):
                key = (plane, dx, want)
                if key not in bands:
                    # cast ONCE per distinct (plane, dx, dtype): taps
                    # stream through VMEM in tap_dtype; the bf16 copy
                    # feeds the packed gate math (two elements per VPU
                    # lane) and the f32 copy the comparisons, diffs and
                    # accumulations (v5e Mosaic has no bf16 vector
                    # compare, and f32 diffs kill the knife-edge
                    # quantization error at the gate transitions)
                    bands[key] = ext_ref[
                        plane, r0 : r0 + ch + 2 * hs, 128 + dx : 128 + cw + dx
                    ].astype(want)
                return bands[key]

            def tap(plane: int, dx: int, dy: int, want=cd, r0=r0):
                # band rows start at ext row r0 == chunk row -hs
                b = band(plane, dx, want)
                return b[hs + dy : hs + dy + ch, :]

            c = c_ref[:, r0 : r0 + ch, :]
            center_safe = jnp.maximum(c, 0.0)
            center_luma = luma(center_safe)          # f32

            new_luma = center_luma
            if luma_a > 0.001:
                # min/max scan at the compute dtype (bf16: half issue; the
                # edge statistics feed only SMOOTH gates, so quantization
                # there is benign — the sharp per-tap quantities below stay
                # f32)
                lmin = center_luma.astype(cd)
                lmax = lmin
                for dx, dy, _spat in lt:
                    s_luma = tap(0, dx, dy)
                    lmin = jnp.minimum(lmin, s_luma)
                    lmax = jnp.maximum(lmax, s_luma)

                luma_range = lmax - lmin
                edge_strength = smoothstep(0.04, 0.20, luma_range)
                edge_midpoint32 = ((lmin + lmax) * jnp.asarray(0.5, cd)).astype(f32)
                center_side = center_luma > edge_midpoint32
                l_range_tol = mix(
                    mix(0.025, 0.075, l_curve),
                    mix(0.010, 0.025, l_curve),
                    edge_strength,
                )

                # hoist the per-pixel smoothstep edge divide out of the tap
                # loops: t = (diff - 0.6*tol) * inv_d, one reciprocal per
                # chunk instead of one divide per tap per pass
                g_e0 = l_range_tol * jnp.asarray(0.6, cd)
                g_inv = jnp.asarray(1.0, cd) / (l_range_tol * jnp.asarray(0.4, cd))
                # mix(1, where(side_eq,1,0), es) lowers to (1-es) + g*es:
                # g=1 gives (1-es)+es, g=0 gives 1-es. Precompute both per
                # chunk and select — bit-exact, 3 fewer vector ops per tap
                # per pass.
                g_ne = jnp.asarray(1.0, cd) - edge_strength
                g_eq = g_ne + edge_strength

                one_cd = jnp.asarray(1.0, cd)
                zero_cd = jnp.asarray(0.0, cd)

                def gate(s32, s_spat):
                    # f32 difference + compare (precision at the gate
                    # transition + v5e Mosaic has no bf16 vector compare),
                    # bf16 for the smooth polynomial
                    diff = jnp.abs(s32 - center_luma).astype(cd)
                    t = jnp.clip((diff - g_e0) * g_inv, zero_cd, one_cd)
                    g_range = one_cd - t * t * (jnp.asarray(3.0, cd) - jnp.asarray(2.0, cd) * t)
                    g_edge = jnp.where(
                        (s32 > edge_midpoint32) == center_side, g_eq, g_ne
                    )
                    return jnp.asarray(s_spat, cd) * g_range * g_edge

                # pass A: accumulate (f32) and SPILL each tap's PRE-MASKED
                # gate to a VMEM scratch plane; pass B reloads it instead
                # of recomputing the ~13-op gate (an SSA-value spill gets
                # rematerialized by Mosaic — an explicit scratch store
                # does not). Pre-masking (w if w > 1e-4 else 0) is
                # bit-equal to masking w*bisq^2 in pass B and drops the
                # per-tap threshold compare there. The center tap's gate
                # is exactly g_eq (diff=0 -> g_range=1, sides equal).
                g_eq32 = g_eq.astype(f32)
                sum_a = center_luma * g_eq32
                w_a = g_eq32
                for t_i, (dx, dy, s_spat) in enumerate(lt):
                    s32 = tap(0, dx, dy, f32)
                    wgt32 = gate(s32, s_spat).astype(f32)
                    gate_ref[t_i, r0 : r0 + ch, :] = jnp.where(
                        wgt32 > 0.0001, wgt32, 0.0
                    ).astype(cd)
                    sum_a = sum_a + s32 * wgt32
                    w_a = w_a + wgt32
                initial_mean = sum_a / jnp.maximum(w_a, 1e-4)

                outlier_tol = mix(0.07, 0.025, edge_strength)
                inv_outlier = jnp.asarray(1.0, cd) / outlier_tol

                def bisq2(s32):
                    # f32 difference vs the robust mean, bf16 bisquare
                    r = jnp.abs(s32 - initial_mean).astype(cd) * inv_outlier
                    bisq = jnp.maximum(zero_cd, one_cd - r * r)
                    return bisq * bisq

                g_eq_masked = jnp.where(g_eq32 > 0.0001, g_eq32, 0.0).astype(cd)
                w_c0 = (g_eq_masked * bisq2(center_luma)).astype(f32)
                sum_b = center_luma * w_c0
                w_b = w_c0
                for t_i, (dx, dy, _spat) in enumerate(lt):
                    s32 = tap(0, dx, dy, f32)
                    wgt32 = (gate_ref[t_i, r0 : r0 + ch, :] * bisq2(s32)).astype(f32)
                    sum_b = sum_b + s32 * wgt32
                    w_b = w_b + wgt32
                robust = jnp.where(w_b > 0.01, sum_b / jnp.maximum(w_b, 1e-6), initial_mean)
                strength = (luma_a * mix(1.0, 0.6, edge_strength)).astype(f32)
                new_luma = mix(center_luma, robust, strength)

            cr = c[0] - center_luma
            cg = c[1] - center_luma
            cb = c[2] - center_luma
            if color_a > 0.001:
                luma_tol = 0.12 + (0.04 - 0.12) * c_curve
                luma_n = -1.0 / max(2.0 * luma_tol * luma_tol, 1e-6)
                chroma_tol = 0.20 + (0.08 - 0.20) * c_curve
                chroma_n = -1.0 / max(2.0 * chroma_tol * chroma_tol, 1e-6)
                # the chroma pass runs ENTIRELY at the compute dtype
                # (including accumulators): R-Y/B-Y magnitudes are small
                # and the result is mixed by color_a, so bf16 rounding
                # lands ~1e-4 on the output (tests/test_nr_bf16.py)
                cl = center_luma.astype(cd)
                cr_c = cr.astype(cd)
                cb_c = cb.astype(cd)
                ln_c = jnp.asarray(luma_n, cd)
                cn_c = jnp.asarray(chroma_n, cd)
                sum_r = cr_c
                sum_bv = cb_c
                w_sum = jnp.ones_like(cr_c)
                for dx, dy, w_s in ct:
                    s_luma = tap(0, dx, dy)
                    s_r_y = tap(1, dx, dy)
                    s_b_y = tap(2, dx, dy)
                    dl = s_luma - cl
                    dr = s_r_y - cr_c
                    db = s_b_y - cb_c
                    # one exp for both gates: exp(a)*exp(b) == exp(a+b)
                    wgt = jnp.asarray(w_s, cd) * jnp.exp(
                        dl * dl * ln_c + (dr * dr + db * db) * cn_c
                    )
                    sum_r = sum_r + s_r_y * wgt
                    sum_bv = sum_bv + s_b_y * wgt
                    w_sum = w_sum + wgt
                inv_w = jnp.asarray(1.0, cd) / jnp.maximum(w_sum, jnp.asarray(1e-6, cd))
                ca_c = jnp.asarray(color_a, cd)
                new_r = mix(cr_c, sum_r * inv_w, ca_c).astype(f32)
                new_b = mix(cb_c, sum_bv * inv_w, ca_c).astype(f32)
                new_g = -(LUMA_COEFF[0] * new_r + LUMA_COEFF[2] * new_b) / LUMA_COEFF[1]
            else:
                new_r, new_g, new_b = cr, cg, cb

            o_ref[0, r0 : r0 + ch, :] = new_luma + new_r
            o_ref[1, r0 : r0 + ch, :] = new_luma + new_g
            o_ref[2, r0 : r0 + ch, :] = new_luma + new_b

    interpret = jax.devices()[0].platform != "tpu"
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((3, h16, w512), jnp.float32),
        grid=(n_i, n_j),
        in_specs=[
            pl.BlockSpec((3, th, cw), lambda i, j: (0, i, j), memory_space=pltpu.VMEM),
            # planes: N (16-row strip), C (tile), S (16-row strip), cw wide
            pl.BlockSpec((3, hs, cw), lambda i, j, r=rpb: (0, r * (i + 1) - 1, j + 1), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, th, cw), lambda i, j: (0, i + 1, j + 1), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, hs, cw), lambda i, j, r=rpb: (0, r * (i + 2), j + 1), memory_space=pltpu.VMEM),
            # planes: NW, W, SW / NE, E, SE col strips (128 wide)
            pl.BlockSpec((3, hs, 128), lambda i, j, r=rpb, c=cpb: (0, r * (i + 1) - 1, c * (j + 1) - 1), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, th, 128), lambda i, j, c=cpb: (0, i + 1, c * (j + 1) - 1), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, hs, 128), lambda i, j, r=rpb, c=cpb: (0, r * (i + 2), c * (j + 1) - 1), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, hs, 128), lambda i, j, r=rpb, c=cpb: (0, r * (i + 1) - 1, c * (j + 2)), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, th, 128), lambda i, j, c=cpb: (0, i + 1, c * (j + 2)), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, hs, 128), lambda i, j, r=rpb, c=cpb: (0, r * (i + 2), c * (j + 2)), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, th, cw), lambda i, j: (0, i, j), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((3, th + 2 * hs, cw + 256), tap_dtype),
            pltpu.VMEM((len(lt), th, cw), cd),
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=(
                pltpu.GridDimensionSemantics.PARALLEL,
                pltpu.GridDimensionSemantics.PARALLEL,
            ),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(center_p, *([planes_p] * 9))
    return out[:, :h, :w]
