"""Inverse-mapped geometry warp: perspective/rotate/scale/aspect/offset
homography fused with lens distortion, TCA and vignetting.

Port of warp_image_geometry (image_processing.rs:645-803):
  * forward homography built as T_center*Offset*Perspective*Rotate*Scale*
    T_uncenter (:408-455), inverted once; output pixels inverse-map into the
    source.
  * lens auto-crop scale from 8 border samples (:557-643).
  * lensfun-style distortion: ptlens (a,b,c) or poly (k1,k2,k3) on the
    half-diagonal-normalized radius, blended by amount*2.5 (:728-757).
  * manual distortion: r^2-scaled push (:759-767).
  * TCA: red/blue sampled at radially scaled coords (:465-532) — note the
    TCA sampler clamps at borders while the plain path returns black
    outside [0, W-1) (:365-373 vs :493-509); both behaviors are preserved.
  * lens vignetting polynomial gain applied after sampling (:775-795).

Device side is a vectorized gather; shapes and params are static per
compile (geometry changes force a retrace, like every shape change in XLA).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from rapidraw_tpu.geometry.params import GeometryParams


def build_transform_matrix(p: GeometryParams, width: float, height: float) -> np.ndarray:
    """Forward homography (image_processing.rs:408-455), float32."""
    cx, cy = width / 2.0, height / 2.0
    ref_dim = 2000.0
    p_vert = (p.vertical / 100000.0) * (ref_dim / height)
    p_horiz = (-p.horizontal / 100000.0) * (ref_dim / width)
    theta = np.deg2rad(p.rotate)
    if p.aspect >= 0.0:
        aspect = 1.0 + p.aspect / 100.0
    else:
        aspect = 1.0 / (1.0 + abs(p.aspect) / 100.0)
    scale = p.scale / 100.0
    off_x = (p.x_offset / 100.0) * width
    off_y = (p.y_offset / 100.0) * height

    t_center = np.array([[1, 0, cx], [0, 1, cy], [0, 0, 1]], np.float32)
    t_uncenter = np.array([[1, 0, -cx], [0, 1, -cy], [0, 0, 1]], np.float32)
    m_persp = np.array([[1, 0, 0], [0, 1, 0], [p_horiz, p_vert, 1]], np.float32)
    s, c = np.sin(theta), np.cos(theta)
    m_rot = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
    m_scale = np.array(
        [[scale * aspect, 0, 0], [0, scale, 0], [0, 0, 1]], np.float32
    )
    m_off = np.array([[1, 0, off_x], [0, 1, off_y], [0, 0, 1]], np.float32)
    return t_center @ m_off @ m_persp @ m_rot @ m_scale @ t_uncenter


def _distort_radius_norm(ru_norm, p: GeometryParams):
    """Distorted radius (normalized), ptlens or poly model (:737-749)."""
    r2 = ru_norm * ru_norm
    if p.lens_model == 1:
        a, b, c = p.lens_dist_k1, p.lens_dist_k2, p.lens_dist_k3
        d = 1.0 - a - b - c
        return ru_norm * (a * r2 * ru_norm + b * r2 + c * ru_norm + d)
    k1, k2, k3 = p.lens_dist_k1, p.lens_dist_k2, p.lens_dist_k3
    return ru_norm * (1.0 + k1 * r2 + k2 * r2 * r2 + k3 * r2 * r2 * r2)


def compute_lens_auto_crop_scale(p: GeometryParams, width: float, height: float) -> float:
    """8-border-sample auto-crop factor (image_processing.rs:557-643)."""
    cx, cy = width / 2.0, height / 2.0
    half_diag = np.sqrt(cx * cx + cy * cy)
    max_radius_sq_inv = 1.0 / (cx * cx + cy * cy)
    lens_amt = p.lens_distortion_amount * 2.5
    k_distortion = (p.distortion / 100.0) * 2.5
    has_lens = p.lens_distortion_enabled and (
        abs(p.lens_dist_k1) > 1e-6 or abs(p.lens_dist_k2) > 1e-6 or abs(p.lens_dist_k3) > 1e-6
    )
    samples = [
        (cx, 0.0), (cx, height), (0.0, cy), (width, cy),
        (0.0, 0.0), (width, 0.0), (0.0, height), (width, height),
    ]
    max_scale = 1.0
    for px, py in samples:
        dx, dy = px - cx, py - cy
        ru = np.sqrt(dx * dx + dy * dy)
        if ru < 1e-6:
            continue
        mdx, mdy = dx, dy
        if has_lens:
            ru_norm = ru / half_diag
            rd_norm = _distort_radius_norm(ru_norm, p)
            eff = ru_norm + (rd_norm - ru_norm) * lens_amt
            s = eff / ru_norm
            mdx *= s
            mdy *= s
        if abs(k_distortion) > 1e-5:
            r2n = (mdx * mdx + mdy * mdy) * max_radius_sq_inv
            f = 1.0 + k_distortion * r2n
            mdx *= f
            mdy *= f
        s = np.sqrt(mdx * mdx + mdy * mdy) / ru
        max_scale = max(max_scale, s)
    return float(max_scale * 1.002) if max_scale > 1.0 else float(max_scale)


def _bilinear_zero_outside(plane_flat, xq, yq, w, h):
    """Plain-path sampling: black outside [0, W-1) x [0, H-1) (:365-373)."""
    valid = (xq >= 0.0) & (yq >= 0.0) & (xq < w - 1.0) & (yq < h - 1.0) & jnp.isfinite(xq) & jnp.isfinite(yq)
    xs = jnp.where(valid, xq, 0.0)
    ysv = jnp.where(valid, yq, 0.0)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y0 = jnp.floor(ysv).astype(jnp.int32)
    wx = xs - x0
    wy = ysv - y0
    x0 = jnp.clip(x0, 0, w - 2)
    y0 = jnp.clip(y0, 0, h - 2)

    def g(yy, xx):
        return jnp.take(plane_flat, (yy * w + xx).reshape(-1), axis=0).reshape(xx.shape)

    p00 = g(y0, x0)
    p10 = g(y0, x0 + 1)
    p01 = g(y0 + 1, x0)
    p11 = g(y0 + 1, x0 + 1)
    top = p00 * (1 - wx) + p10 * wx
    bot = p01 * (1 - wx) + p11 * wx
    return jnp.where(valid, top * (1 - wy) + bot * wy, 0.0)


def _bilinear_clamped(plane_flat, xq, yq, w, h):
    """TCA-path sampling: clamped to borders (:488-527)."""
    xc = jnp.clip(jnp.nan_to_num(xq), 0.0, w - 1.0)
    yc = jnp.clip(jnp.nan_to_num(yq), 0.0, h - 1.0)
    x0 = jnp.minimum(jnp.floor(xc).astype(jnp.int32), w - 2)
    y0 = jnp.minimum(jnp.floor(yc).astype(jnp.int32), h - 2)
    x0 = jnp.maximum(x0, 0)
    y0 = jnp.maximum(y0, 0)
    wx = xc - x0
    wy = yc - y0

    def g(yy, xx):
        return jnp.take(plane_flat, (yy * w + xx).reshape(-1), axis=0).reshape(xx.shape)

    p00 = g(y0, x0)
    p10 = g(y0, x0 + 1)
    p01 = g(y0 + 1, x0)
    p11 = g(y0 + 1, x0 + 1)
    top = p00 * (1 - wx) + p10 * wx
    bot = p01 * (1 - wx) + p11 * wx
    return top * (1 - wy) + bot * wy


def source_coords(xp, p: GeometryParams, h: int, w: int):
    """Inverse-map source coordinates for every output pixel.

    `xp` is the array namespace (jnp on device, np for host-side use —
    identical formulas, so the two-pass planner in geometry/warp_fast.py
    cannot drift from the exact path).

    Returns (src_x, src_y, z_ok, meta) where meta carries the TCA/vignette
    specialization flags and constants.
    """
    f32 = np.float32 if xp is np else jnp.float32
    ys = xp.arange(h, dtype=f32)[:, None] * xp.ones((1, w), f32)
    xs = xp.arange(w, dtype=f32)[None, :] * xp.ones((h, 1), f32)
    return source_coords_at(xp, p, h, w, xs, ys)


def geometry_values(p: GeometryParams, h: int, w: int) -> dict:
    """Dynamic scalar bundle for the TRACED coordinate math
    (source_coords_values): inverse homography, auto-crop, effective
    distortion/TCA/vignette coefficients. Letting these be jit *inputs*
    (instead of static) means the two-pass warp planner compiles once per
    image shape, not once per slider value."""
    forward = build_transform_matrix(p, float(w), float(h))
    try:
        inv = np.linalg.inv(forward)
    except np.linalg.LinAlgError:
        inv = np.eye(3, dtype=np.float32)
    has_lens = p.lens_distortion_enabled and (
        abs(p.lens_dist_k1) > 1e-6 or abs(p.lens_dist_k2) > 1e-6 or abs(p.lens_dist_k3) > 1e-6
    )
    k_distortion = (p.distortion / 100.0) * 2.5
    auto_crop = (
        compute_lens_auto_crop_scale(p, float(w), float(h))
        if (has_lens or abs(k_distortion) > 1e-5)
        else 1.0
    )
    vr = p.tca_vr + (1.0 - p.tca_vr) * (1.0 - p.lens_tca_amount) if abs(p.tca_vr - 1.0) > 1e-5 else 1.0
    vb = p.tca_vb + (1.0 - p.tca_vb) * (1.0 - p.lens_tca_amount) if abs(p.tca_vb - 1.0) > 1e-5 else 1.0
    return {
        "inv": inv.astype(np.float32),
        "auto_crop": np.float32(auto_crop),
        "lens_amt": np.float32(p.lens_distortion_amount * 2.5 if has_lens else 0.0),
        "k1": np.float32(p.lens_dist_k1 if has_lens else 0.0),
        "k2": np.float32(p.lens_dist_k2 if has_lens else 0.0),
        "k3": np.float32(p.lens_dist_k3 if has_lens else 0.0),
        "k_distortion": np.float32(k_distortion if abs(k_distortion) > 1e-5 else 0.0),
        "vr": np.float32(vr if p.lens_tca_enabled else 1.0),
        "vb": np.float32(vb if p.lens_tca_enabled else 1.0),
    }


def source_coords_values(vals: dict, h: int, w: int, xs, ys, lens_model: int):
    """Traced (jnp) variant of source_coords_at driven by geometry_values.

    Every stage is applied UNCONDITIONALLY with neutral coefficients when
    inactive (k=0 => rd_norm == ru_norm => scale exactly 1.0; auto_crop
    clamped to >= 1), which matches the branchy exact path to float
    rounding. Only `lens_model` stays a static arg (structural branch).
    """
    cx, cy = w / 2.0, h / 2.0
    half_diag = float(np.sqrt(cx * cx + cy * cy))
    max_radius_sq_inv = 1.0 / (cx * cx + cy * cy)
    inv = vals["inv"]

    hx = inv[0, 0] * xs + inv[0, 1] * ys + inv[0, 2]
    hy = inv[1, 0] * xs + inv[1, 1] * ys + inv[1, 2]
    hz = inv[2, 0] * xs + inv[2, 1] * ys + inv[2, 2]
    z_ok = jnp.abs(hz) > 1e-6
    inv_z = 1.0 / jnp.where(z_ok, hz, 1.0)
    src_x = hx * inv_z
    src_y = hy * inv_z

    ac = jnp.where(vals["auto_crop"] > 1.0, vals["auto_crop"], 1.0)
    src_x = cx + (src_x - cx) / ac
    src_y = cy + (src_y - cy) / ac

    dx = src_x - cx
    dy = src_y - cy
    ru = jnp.sqrt(dx * dx + dy * dy)
    ru_norm = ru / half_diag
    r2 = ru_norm * ru_norm
    if lens_model == 1:
        a, b, c = vals["k1"], vals["k2"], vals["k3"]
        d = 1.0 - a - b - c
        rd_norm = ru_norm * (a * r2 * ru_norm + b * r2 + c * ru_norm + d)
    else:
        rd_norm = ru_norm * (1.0 + vals["k1"] * r2 + vals["k2"] * r2 * r2
                             + vals["k3"] * r2 * r2 * r2)
    safe_ru = jnp.where(ru_norm > 1e-9, ru_norm, 1.0)
    eff = ru_norm + (rd_norm - ru_norm) * vals["lens_amt"]
    s = eff / safe_ru
    apply = ru > 1e-6
    src_x = jnp.where(apply, cx + dx * s, src_x)
    src_y = jnp.where(apply, cy + dy * s, src_y)

    dx = src_x - cx
    dy = src_y - cy
    r2n = (dx * dx + dy * dy) * max_radius_sq_inv
    f = 1.0 + vals["k_distortion"] * r2n
    src_x = cx + dx * f
    src_y = cy + dy * f
    return src_x, src_y, z_ok


def source_coords_at(xp, p: GeometryParams, h: int, w: int, xs, ys):
    """source_coords evaluated at ARBITRARY (fractional) output coordinates
    — the map is analytic, which is what lets the two-pass planner invert
    it by Newton iteration instead of per-row table interpolation."""
    cx, cy = w / 2.0, h / 2.0
    forward = build_transform_matrix(p, float(w), float(h))
    try:
        inv = np.linalg.inv(forward)
    except np.linalg.LinAlgError:
        inv = np.eye(3, dtype=np.float32)
    half_diag = float(np.sqrt((w / 2.0) ** 2 + (h / 2.0) ** 2))
    max_radius_sq_inv = 1.0 / (cx * cx + cy * cy)

    k_distortion = (p.distortion / 100.0) * 2.5
    lens_amt = p.lens_distortion_amount * 2.5
    has_lens = p.lens_distortion_enabled and (
        abs(p.lens_dist_k1) > 1e-6 or abs(p.lens_dist_k2) > 1e-6 or abs(p.lens_dist_k3) > 1e-6
    )
    auto_crop = (
        compute_lens_auto_crop_scale(p, float(w), float(h))
        if (has_lens or abs(k_distortion) > 1e-5)
        else 1.0
    )
    # effective TCA scale factors blended by amount (:679-688)
    vr = p.tca_vr + (1.0 - p.tca_vr) * (1.0 - p.lens_tca_amount) if abs(p.tca_vr - 1.0) > 1e-5 else 1.0
    vb = p.tca_vb + (1.0 - p.tca_vb) * (1.0 - p.lens_tca_amount) if abs(p.tca_vb - 1.0) > 1e-5 else 1.0
    has_tca = p.lens_tca_enabled and (abs(vr - 1.0) > 1e-5 or abs(vb - 1.0) > 1e-5)
    lens_vig_amt = p.lens_vignette_amount * 0.8
    has_vig = p.lens_vignette_enabled and (
        abs(p.vig_k1) > 1e-6 or abs(p.vig_k2) > 1e-6 or abs(p.vig_k3) > 1e-6
    ) and lens_vig_amt > 0.01

    hx = inv[0, 0] * xs + inv[0, 1] * ys + inv[0, 2]
    hy = inv[1, 0] * xs + inv[1, 1] * ys + inv[1, 2]
    hz = inv[2, 0] * xs + inv[2, 1] * ys + inv[2, 2]
    z_ok = xp.abs(hz) > 1e-6
    inv_z = 1.0 / xp.where(z_ok, hz, 1.0)
    src_x = hx * inv_z
    src_y = hy * inv_z

    if auto_crop > 1.0:
        src_x = cx + (src_x - cx) / auto_crop
        src_y = cy + (src_y - cy) / auto_crop

    if has_lens:
        dx = src_x - cx
        dy = src_y - cy
        ru = xp.sqrt(dx * dx + dy * dy)
        ru_norm = ru / half_diag
        rd_norm = _distort_radius_norm(ru_norm, p)
        safe_ru = xp.where(ru_norm > 1e-9, ru_norm, 1.0)
        eff = ru_norm + (rd_norm - ru_norm) * lens_amt
        s = eff / safe_ru
        apply = ru > 1e-6
        src_x = xp.where(apply, cx + dx * s, src_x)
        src_y = xp.where(apply, cy + dy * s, src_y)

    if abs(k_distortion) > 1e-5:
        dx = src_x - cx
        dy = src_y - cy
        r2n = (dx * dx + dy * dy) * max_radius_sq_inv
        f = 1.0 + k_distortion * r2n
        src_x = cx + dx * f
        src_y = cy + dy * f

    meta = {
        "has_tca": has_tca, "vr": vr, "vb": vb,
        "has_vig": has_vig, "lens_vig_amt": lens_vig_amt,
        "half_diag": half_diag, "cx": cx, "cy": cy,
    }
    return src_x, src_y, z_ok, meta


def apply_lens_vignette(xp, out, src_x, src_y, p: GeometryParams, meta):
    """Lens vignetting polynomial gain at the source coords (:775-795)."""
    dx = src_x - meta["cx"]
    dy = src_y - meta["cy"]
    ru_norm2 = (dx * dx + dy * dy) / (meta["half_diag"] * meta["half_diag"])
    v = 1.0 + p.vig_k1 * ru_norm2 + p.vig_k2 * ru_norm2**2 + p.vig_k3 * ru_norm2**3
    gain = 1.0 + (1.0 / xp.where(v > 1e-6, v, 1.0) - 1.0) * meta["lens_vig_amt"]
    return out * xp.where(v > 1e-6, gain, 1.0)


def warp_image_geometry(image: jnp.ndarray, p: GeometryParams) -> jnp.ndarray:
    """Warp planar (3, H, W) by GeometryParams. Same-size output."""
    _, h, w = image.shape
    cx, cy = w / 2.0, h / 2.0
    src_x, src_y, z_ok, meta = source_coords(jnp, p, h, w)
    has_tca, vr, vb = meta["has_tca"], meta["vr"], meta["vb"]

    flat = [image[c].reshape(-1) for c in range(3)]
    if has_tca:
        rx = cx + (src_x - cx) * vr
        ry = cy + (src_y - cy) * vr
        bx = cx + (src_x - cx) * vb
        by = cy + (src_y - cy) * vb
        out = jnp.stack(
            [
                _bilinear_clamped(flat[0], rx, ry, w, h),
                _bilinear_clamped(flat[1], src_x, src_y, w, h),
                _bilinear_clamped(flat[2], bx, by, w, h),
            ]
        )
    else:
        out = jnp.stack([_bilinear_zero_outside(f, src_x, src_y, w, h) for f in flat])

    if meta["has_vig"]:
        out = apply_lens_vignette(jnp, out, src_x, src_y, p, meta)

    # pixels whose homography z ~ 0 stay black (:718)
    return jnp.where(z_ok, out, 0.0)


def unwarp_image_geometry(image: jnp.ndarray, p: GeometryParams) -> jnp.ndarray:
    """Exact inverse of warp_image_geometry (image_processing.rs:805-938).

    Used by the crop tool path: undoes manual distortion (closed-form cubic
    Newton, :534-555), lensfun distortion (8-step Newton on the blended
    radius, :869-910), auto-crop and the forward homography.
    """
    _, h, w = image.shape
    cx, cy = w / 2.0, h / 2.0
    forward = jnp.asarray(build_transform_matrix(p, float(w), float(h)))
    half_diag = float(np.sqrt(cx * cx + cy * cy))
    max_radius_sq_inv = 1.0 / (cx * cx + cy * cy)
    k_distortion = (p.distortion / 100.0) * 2.5
    lens_amt = p.lens_distortion_amount * 2.5
    has_lens = p.lens_distortion_enabled and (
        abs(p.lens_dist_k1) > 1e-6 or abs(p.lens_dist_k2) > 1e-6 or abs(p.lens_dist_k3) > 1e-6
    )
    auto_crop = (
        compute_lens_auto_crop_scale(p, float(w), float(h))
        if (has_lens or abs(k_distortion) > 1e-5)
        else 1.0
    )

    ys = jnp.arange(h, dtype=jnp.float32)[:, None] * jnp.ones((1, w), jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)[None, :] * jnp.ones((h, 1), jnp.float32)
    cur_x, cur_y = xs, ys

    if abs(k_distortion) > 1e-5:
        dx = cur_x - cx
        dy = cur_y - cy
        r_dist = jnp.sqrt(dx * dx + dy * dy)
        k_eff = k_distortion * max_radius_sq_inv
        # Newton on k*r^3 + r = r_target (:534-555)
        r = r_dist
        for _ in range(10):
            val = k_eff * r**3 + r - r_dist
            slope = 3.0 * k_eff * r * r + 1.0
            r = r - jnp.where(jnp.abs(slope) > 1e-9, val / slope, 0.0)
        s = r / jnp.where(r_dist > 1e-6, r_dist, 1.0)
        apply = r_dist > 1e-6
        cur_x = jnp.where(apply, cx + dx * s, cur_x)
        cur_y = jnp.where(apply, cy + dy * s, cur_y)

    if has_lens:
        dx = cur_x - cx
        dy = cur_y - cy
        rd = jnp.sqrt(dx * dx + dy * dy)
        ru = rd
        k1, k2, k3 = p.lens_dist_k1, p.lens_dist_k2, p.lens_dist_k3
        for _ in range(8):
            ru_n = ru / half_diag
            ru_n2 = ru_n * ru_n
            if p.lens_model == 1:
                a, b, c = k1, k2, k3
                d = 1.0 - a - b - c
                poly = a * ru_n2 * ru_n + b * ru_n2 + c * ru_n + d
                f_val = ru * poly
                f_prime = 4.0 * a * ru_n2 * ru_n + 3.0 * b * ru_n2 + 2.0 * c * ru_n + d
            else:
                poly = 1.0 + k1 * ru_n2 + k2 * ru_n2**2 + k3 * ru_n2**3
                f_val = ru * poly
                poly_prime = 2.0 * k1 * ru_n + 4.0 * k2 * ru_n2 * ru_n + 6.0 * k3 * ru_n2**2 * ru_n
                f_prime = poly + ru_n * poly_prime
            g_val = ru + (f_val - ru) * lens_amt - rd
            g_prime = 1.0 + (f_prime - 1.0) * lens_amt
            ru = ru - jnp.where(jnp.abs(g_prime) > 1e-7, g_val / g_prime, 0.0)
        s = ru / jnp.where(rd > 1e-6, rd, 1.0)
        apply = rd > 1e-6
        cur_x = jnp.where(apply, cx + dx * s, cur_x)
        cur_y = jnp.where(apply, cy + dy * s, cur_y)

    if auto_crop > 1.0:
        cur_x = cx + (cur_x - cx) * auto_crop
        cur_y = cy + (cur_y - cy) * auto_crop

    hx = forward[0, 0] * cur_x + forward[0, 1] * cur_y + forward[0, 2]
    hy = forward[1, 0] * cur_x + forward[1, 1] * cur_y + forward[1, 2]
    hz = forward[2, 0] * cur_x + forward[2, 1] * cur_y + forward[2, 2]
    z_ok = jnp.abs(hz) > 1e-6
    inv_z = 1.0 / jnp.where(z_ok, hz, 1.0)
    src_x = hx * inv_z
    src_y = hy * inv_z

    flat = [image[c].reshape(-1) for c in range(3)]
    out = jnp.stack([_bilinear_zero_outside(f, src_x, src_y, w, h) for f in flat])
    return jnp.where(z_ok, out, 0.0)
