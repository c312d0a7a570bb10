"""Scalar transcription anchor for the geometry warp / lens stack.

This module transcribes /root/reference/src-tauri/src/image_processing.rs
:356-938 into literal per-pixel Python, the way tests/oracle.py transcribes
the WGSL megakernel and tests/cpu_anchor.py the Rust AgX path. It is the
independent source of truth the vectorized implementations
(rapidraw_tpu/geometry/warp.py and warp_fast.py) are asserted against: a
mistranslated coefficient anywhere in the warp stack fails the comparison.

Transcription map (all lines in image_processing.rs):
  interpolate_pixel            :356-406  -> _interpolate_pixel
  build_transform_matrices     :408-455  -> build_transform_matrices
  interpolate_pixel_with_tca   :465-532  -> _sample_channel_clamped
  solve_generic_distortion_inv :534-555  -> _solve_generic_distortion_inv
  compute_lens_auto_crop_scale :557-643  -> compute_lens_auto_crop_scale
  warp_image_geometry          :645-803  -> warp_image_geometry_scalar
  unwarp_image_geometry        :805-938  -> unwarp_image_geometry_scalar

Precision notes mirrored from the Rust: homography matrices and the
per-pixel coordinate walk are f32 (including the row-incremental
`current_vec += step_vec_x` accumulation, :716-801); lens-distortion /
manual-distortion / vignetting radius math runs in f64 and is cast back to
f32 (:726-771).
"""

from __future__ import annotations

import math

import numpy as np

from rapidraw_tpu.geometry.params import GeometryParams

F32 = np.float32


def _interpolate_pixel(src: np.ndarray, x: float, y: float) -> np.ndarray:
    """Bilinear sample, black outside [0, W-1) x [0, H-1) (:356-406)."""
    h, w, _ = src.shape
    x = F32(x)
    y = F32(y)
    if math.isnan(x) or math.isnan(y) or x < 0.0 or y < 0.0 or x >= w - 1.0 or y >= h - 1.0:
        return np.zeros(3, F32)
    x0 = int(math.floor(x))
    y0 = int(math.floor(y))
    wx = F32(x - F32(x0))
    wy = F32(y - F32(y0))
    p00 = src[y0, x0]
    p10 = src[y0, x0 + 1]
    p01 = src[y0 + 1, x0]
    p11 = src[y0 + 1, x0 + 1]
    top = p00 * (F32(1.0) - wx) + p10 * wx
    bot = p01 * (F32(1.0) - wx) + p11 * wx
    return (top * (F32(1.0) - wy) + bot * wy).astype(F32)


def _sample_channel_clamped(src: np.ndarray, x: float, y: float, ch: int) -> float:
    """TCA-path per-channel sample, clamped to borders (:488-527)."""
    h, w, _ = src.shape
    if math.isnan(x) or math.isnan(y):
        return 0.0
    xc = F32(min(max(F32(x), F32(0.0)), F32(w - 1.0)))
    yc = F32(min(max(F32(y), F32(0.0)), F32(h - 1.0)))
    x0 = int(math.floor(xc))
    y0 = int(math.floor(yc))
    if x0 >= w - 1:
        x0 = max(w - 2, 0)
    if y0 >= h - 1:
        y0 = max(h - 2, 0)
    wx = F32(xc - F32(x0))
    wy = F32(yc - F32(y0))
    p00 = src[y0, x0, ch]
    p10 = src[y0, x0 + 1, ch]
    p01 = src[y0 + 1, x0, ch]
    p11 = src[y0 + 1, x0 + 1, ch]
    top = p00 * (F32(1.0) - wx) + p10 * wx
    bot = p01 * (F32(1.0) - wx) + p11 * wx
    return float(top * (F32(1.0) - wy) + bot * wy)


def build_transform_matrices(p: GeometryParams, width: float, height: float):
    """Forward homography + (cx, cy, half_diagonal) (:408-455), f32 math."""
    width = F32(width)
    height = F32(height)
    cx = F32(width / F32(2.0))
    cy = F32(height / F32(2.0))
    ref_dim = F32(2000.0)

    p_vert = F32(F32(p.vertical) / F32(100000.0)) * F32(ref_dim / height)
    p_horiz = F32(F32(-p.horizontal) / F32(100000.0)) * F32(ref_dim / width)
    theta = F32(math.radians(p.rotate))

    if p.aspect >= 0.0:
        aspect_factor = F32(1.0 + p.aspect / 100.0)
    else:
        aspect_factor = F32(1.0 / (1.0 + abs(p.aspect) / 100.0))
    scale_factor = F32(p.scale / 100.0)
    off_x = F32(F32(p.x_offset / 100.0) * width)
    off_y = F32(F32(p.y_offset / 100.0) * height)

    def m(*rows):
        return np.array(rows, F32)

    t_center = m([1, 0, cx], [0, 1, cy], [0, 0, 1])
    t_uncenter = m([1, 0, -cx], [0, 1, -cy], [0, 0, 1])
    m_persp = m([1, 0, 0], [0, 1, 0], [p_horiz, p_vert, 1])
    sin_t = F32(math.sin(theta))
    cos_t = F32(math.cos(theta))
    m_rot = m([cos_t, -sin_t, 0], [sin_t, cos_t, 0], [0, 0, 1])
    m_scale = m(
        [F32(scale_factor * aspect_factor), 0, 0], [0, scale_factor, 0], [0, 0, 1]
    )
    m_off = m([1, 0, off_x], [0, 1, off_y], [0, 0, 1])
    forward = (
        t_center.astype(F32)
        @ m_off
        @ m_persp
        @ m_rot
        @ m_scale
        @ t_uncenter
    ).astype(F32)
    half_diagonal = math.sqrt(float(width) ** 2 + float(height) ** 2) / 2.0
    return forward, float(cx), float(cy), half_diagonal


def _solve_generic_distortion_inv(r_target: float, k_scaled: float) -> float:
    """Newton inverse of r + k r^3 (:534-555), f64."""
    if abs(k_scaled) < 1e-9:
        return r_target
    r = r_target
    for _ in range(10):
        r2 = r * r
        val = k_scaled * r2 * r + r - r_target
        slope = 3.0 * k_scaled * r2 + 1.0
        if abs(slope) < 1e-9:
            break
        delta = val / slope
        r -= delta
        if abs(delta) < 1e-6:
            break
    return r


def _rd_norm(ru_norm: float, lk1: float, lk2: float, lk3: float, is_ptlens: bool) -> float:
    """Distorted radius polynomial, ptlens or poly3/5 form (:601-616, f64)."""
    ru_norm2 = ru_norm * ru_norm
    if is_ptlens:
        a, b, c = lk1, lk2, lk3
        d = 1.0 - a - b - c
        return ru_norm * (a * ru_norm2 * ru_norm + b * ru_norm2 + c * ru_norm + d)
    return ru_norm * (
        1.0 + lk1 * ru_norm2 + lk2 * (ru_norm2 * ru_norm2) + lk3 * (ru_norm2 ** 3)
    )


def compute_lens_auto_crop_scale(p: GeometryParams, width: float, height: float) -> float:
    """8-border-sample auto-crop factor (:557-643), f64."""
    cx = width / 2.0
    cy = height / 2.0
    half_diagonal = math.sqrt(cx * cx + cy * cy)
    max_radius_sq_inv = 1.0 / (cx * cx + cy * cy)
    lk1, lk2, lk3 = float(p.lens_dist_k1), float(p.lens_dist_k2), float(p.lens_dist_k3)
    lens_dist_amt = float(p.lens_distortion_amount) * 2.5
    k_distortion = (float(p.distortion) / 100.0) * 2.5
    has_lens = p.lens_distortion_enabled and (
        abs(lk1) > 1e-6 or abs(lk2) > 1e-6 or abs(lk3) > 1e-6
    )
    is_ptlens = p.lens_model == 1
    sample_points = [
        (cx, 0.0), (cx, height), (0.0, cy), (width, cy),
        (0.0, 0.0), (width, 0.0), (0.0, height), (width, height),
    ]
    max_scale = 1.0
    for px, py in sample_points:
        dx = px - cx
        dy = py - cy
        ru = math.sqrt(dx * dx + dy * dy)
        if ru < 1e-6:
            continue
        mapped_dx, mapped_dy = dx, dy
        if has_lens:
            ru_norm = ru / half_diagonal
            rd_norm = _rd_norm(ru_norm, lk1, lk2, lk3, is_ptlens)
            effective = ru_norm + (rd_norm - ru_norm) * lens_dist_amt
            scale = effective / ru_norm
            mapped_dx *= scale
            mapped_dy *= scale
        if abs(k_distortion) > 1e-5:
            r2_norm = (mapped_dx * mapped_dx + mapped_dy * mapped_dy) * max_radius_sq_inv
            f = 1.0 + k_distortion * r2_norm
            mapped_dx *= f
            mapped_dy *= f
        scale = math.sqrt(mapped_dx * mapped_dx + mapped_dy * mapped_dy) / ru
        if scale > max_scale:
            max_scale = scale
    return max_scale * 1.002 if max_scale > 1.0 else max_scale


def _effective_tca(p: GeometryParams):
    """Blended TCA factors + activity flag (:679-688)."""
    vr = (
        p.tca_vr + (1.0 - p.tca_vr) * (1.0 - p.lens_tca_amount)
        if abs(p.tca_vr - 1.0) > 1e-5
        else 1.0
    )
    vb = (
        p.tca_vb + (1.0 - p.tca_vb) * (1.0 - p.lens_tca_amount)
        if abs(p.tca_vb - 1.0) > 1e-5
        else 1.0
    )
    has_tca = p.lens_tca_enabled and (abs(vr - 1.0) > 1e-5 or abs(vb - 1.0) > 1e-5)
    return vr, vb, has_tca


def warp_image_geometry_scalar(image_hwc: np.ndarray, p: GeometryParams) -> np.ndarray:
    """Literal per-pixel transcription of warp_image_geometry (:645-803).

    image_hwc: (H, W, 3) float32. Returns (H, W, 3) float32.
    """
    src = np.ascontiguousarray(image_hwc, F32)
    h, w, _ = src.shape
    out = np.zeros_like(src)

    forward, cx, cy, hd = build_transform_matrices(p, w, h)
    try:
        inv = np.linalg.inv(forward.astype(F32)).astype(F32)
    except np.linalg.LinAlgError:
        inv = np.eye(3, F32)
    # column vectors of the inverse, exactly as :749-752
    step_vec_x = inv[:, 0].astype(F32)
    step_vec_y = inv[:, 1].astype(F32)
    origin_vec = inv[:, 2].astype(F32)

    max_radius_sq_inv = 1.0 / (cx * cx + cy * cy)
    k_distortion = (float(p.distortion) / 100.0) * 2.5
    lk1, lk2, lk3 = float(p.lens_dist_k1), float(p.lens_dist_k2), float(p.lens_dist_k3)
    lens_dist_amt = float(p.lens_distortion_amount) * 2.5
    has_lens = p.lens_distortion_enabled and (
        abs(lk1) > 1e-6 or abs(lk2) > 1e-6 or abs(lk3) > 1e-6
    )
    is_ptlens = p.lens_model == 1
    auto_crop_scale = (
        F32(compute_lens_auto_crop_scale(p, w, h))
        if (has_lens or abs(k_distortion) > 1e-5)
        else F32(1.0)
    )
    vr, vb, has_tca = _effective_tca(p)
    vk1, vk2, vk3 = float(p.vig_k1), float(p.vig_k2), float(p.vig_k3)
    lens_vig_amt = float(p.lens_vignette_amount) * 0.8
    has_vignetting = (
        p.lens_vignette_enabled
        and (abs(vk1) > 1e-6 or abs(vk2) > 1e-6 or abs(vk3) > 1e-6)
        and lens_vig_amt > 0.01
    )

    for y in range(h):
        current_vec = (origin_vec + step_vec_y * F32(y)).astype(F32)
        for x in range(w):
            if abs(current_vec[2]) > 1e-6:
                inv_z = F32(1.0) / current_vec[2]
                src_x = F32(current_vec[0] * inv_z)
                src_y = F32(current_vec[1] * inv_z)

                if auto_crop_scale > 1.0:
                    src_x = F32(cx + (src_x - F32(cx)) / auto_crop_scale)
                    src_y = F32(cy + (src_y - F32(cy)) / auto_crop_scale)

                if has_lens:
                    dx = float(src_x) - cx
                    dy = float(src_y) - cy
                    ru = math.sqrt(dx * dx + dy * dy)
                    if ru > 1e-6:
                        ru_norm = ru / hd
                        rd_norm = _rd_norm(ru_norm, lk1, lk2, lk3, is_ptlens)
                        effective = ru_norm + (rd_norm - ru_norm) * lens_dist_amt
                        scale = effective / ru_norm
                        src_x = F32(cx + dx * scale)
                        src_y = F32(cy + dy * scale)

                if abs(k_distortion) > 1e-5:
                    dx = float(src_x) - cx
                    dy = float(src_y) - cy
                    r2_norm = (dx * dx + dy * dy) * max_radius_sq_inv
                    f = 1.0 + k_distortion * r2_norm
                    src_x = F32(cx + dx * f)
                    src_y = F32(cy + dy * f)

                if has_tca:
                    rx = F32(cx + (float(src_x) - cx) * vr)
                    ry = F32(cy + (float(src_y) - cy) * vr)
                    bx = F32(cx + (float(src_x) - cx) * vb)
                    by = F32(cy + (float(src_y) - cy) * vb)
                    px = np.array(
                        [
                            _sample_channel_clamped(src, rx, ry, 0),
                            _sample_channel_clamped(src, src_x, src_y, 1),
                            _sample_channel_clamped(src, bx, by, 2),
                        ],
                        F32,
                    )
                else:
                    px = _interpolate_pixel(src, src_x, src_y)

                if has_vignetting:
                    dx = float(src_x) - cx
                    dy = float(src_y) - cy
                    ru = math.sqrt(dx * dx + dy * dy)
                    ru_norm = ru / hd
                    ru_norm2 = ru_norm * ru_norm
                    v_factor = (
                        1.0
                        + vk1 * ru_norm2
                        + vk2 * (ru_norm2 * ru_norm2)
                        + vk3 * (ru_norm2 ** 3)
                    )
                    if v_factor > 1e-6:
                        correction_gain = 1.0 / v_factor
                        final_gain = 1.0 + (correction_gain - 1.0) * lens_vig_amt
                        px = px * F32(final_gain)
                out[y, x] = px
            current_vec = (current_vec + step_vec_x).astype(F32)
    return out


def unwarp_image_geometry_scalar(image_hwc: np.ndarray, p: GeometryParams) -> np.ndarray:
    """Literal per-pixel transcription of unwarp_image_geometry (:805-938)."""
    src = np.ascontiguousarray(image_hwc, F32)
    h, w, _ = src.shape
    out = np.zeros_like(src)

    forward, cx, cy, hd = build_transform_matrices(p, w, h)
    max_radius_sq_inv = 1.0 / (cx * cx + cy * cy)
    k_distortion = (float(p.distortion) / 100.0) * 2.5
    lk1, lk2, lk3 = float(p.lens_dist_k1), float(p.lens_dist_k2), float(p.lens_dist_k3)
    lens_dist_amt = float(p.lens_distortion_amount) * 2.5
    has_lens = p.lens_distortion_enabled and (
        abs(lk1) > 1e-6 or abs(lk2) > 1e-6 or abs(lk3) > 1e-6
    )
    is_ptlens = p.lens_model == 1
    auto_crop_scale = (
        F32(compute_lens_auto_crop_scale(p, w, h))
        if (has_lens or abs(k_distortion) > 1e-5)
        else F32(1.0)
    )

    for y in range(h):
        for x in range(w):
            current_x = F32(x)
            current_y = F32(y)

            if abs(k_distortion) > 1e-5:
                dx = float(current_x) - cx
                dy = float(current_y) - cy
                r_distorted = math.sqrt(dx * dx + dy * dy)
                if r_distorted > 1e-6:
                    k_effective = k_distortion * max_radius_sq_inv
                    r_straight = _solve_generic_distortion_inv(r_distorted, k_effective)
                    scale = r_straight / r_distorted
                    current_x = F32(cx + dx * scale)
                    current_y = F32(cy + dy * scale)

            if has_lens:
                dx = float(current_x) - cx
                dy = float(current_y) - cy
                rd = math.sqrt(dx * dx + dy * dy)
                if rd > 1e-6:
                    ru = rd
                    for _ in range(8):
                        ru_norm = ru / hd
                        ru_norm2 = ru_norm * ru_norm
                        if is_ptlens:
                            a, b, c = lk1, lk2, lk3
                            d = 1.0 - a - b - c
                            poly = a * ru_norm2 * ru_norm + b * ru_norm2 + c * ru_norm + d
                            f_val = ru * poly
                            f_prime = (
                                4.0 * a * ru_norm2 * ru_norm
                                + 3.0 * b * ru_norm2
                                + 2.0 * c * ru_norm
                                + d
                            )
                        else:
                            poly = (
                                1.0
                                + lk1 * ru_norm2
                                + lk2 * (ru_norm2 * ru_norm2)
                                + lk3 * (ru_norm2 ** 3)
                            )
                            f_val = ru * poly
                            poly_prime = (
                                2.0 * lk1 * ru_norm
                                + 4.0 * lk2 * ru_norm2 * ru_norm
                                + 6.0 * lk3 * (ru_norm2 * ru_norm2) * ru_norm
                            )
                            f_prime = poly + ru_norm * poly_prime
                        g_val = ru + (f_val - ru) * lens_dist_amt - rd
                        g_prime = 1.0 + (f_prime - 1.0) * lens_dist_amt
                        if abs(g_prime) < 1e-7:
                            break
                        delta = g_val / g_prime
                        ru -= delta
                        if abs(delta) < 1e-4:
                            break
                    scale = ru / rd
                    current_x = F32(cx + dx * scale)
                    current_y = F32(cy + dy * scale)

            if auto_crop_scale > 1.0:
                current_x = F32(cx + (current_x - F32(cx)) * auto_crop_scale)
                current_y = F32(cy + (current_y - F32(cy)) * auto_crop_scale)

            tv = forward @ np.array([current_x, current_y, 1.0], F32)
            if abs(tv[2]) > 1e-6:
                inv_z = F32(1.0) / tv[2]
                out[y, x] = _interpolate_pixel(src, tv[0] * inv_z, tv[1] * inv_z)
    return out
