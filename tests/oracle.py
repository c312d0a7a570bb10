"""Scalar NumPy oracle: an independent, loop-level transcription of the
reference shader's per-pixel math (shader.wgsl), used as the executable spec
to validate the vectorized JAX ops against (SURVEY.md §4 test strategy).

Deliberately written in naive per-value style (no vectorization tricks) so
it visually matches the WGSL source line by line.
"""

from __future__ import annotations

import numpy as np

LUMA = np.array([0.2126, 0.7152, 0.0722], np.float32)


def get_luma(c):
    return float(np.dot(c, LUMA))


def mix(a, b, t):
    return a * (1.0 - t) + b * t


def smoothstep(e0, e1, x):
    if e1 == e0:
        return 0.0 if x < e1 else 1.0
    t = np.clip((x - e0) / (e1 - e0), 0.0, 1.0)
    return float(t * t * (3.0 - 2.0 * t))


def srgb_to_linear(c):
    c = np.asarray(c, np.float32)
    out = np.empty_like(c)
    for i, v in np.ndenumerate(c):
        if v <= 0.04045:
            out[i] = v / 12.92
        else:
            out[i] = ((v + 0.055) / 1.055) ** 2.4
    return out


def linear_to_srgb(c):
    c = np.clip(np.asarray(c, np.float32), 0.0, 1.0)
    out = np.empty_like(c)
    for i, v in np.ndenumerate(c):
        if v <= 0.0031308:
            out[i] = v * 12.92
        else:
            out[i] = 1.055 * v ** (1.0 / 2.4) - 0.055
    return out


def linear_to_srgb_extended(c):
    c = np.maximum(np.asarray(c, np.float32), 0.0)
    out = np.empty_like(c)
    for i, v in np.ndenumerate(c):
        if v <= 0.0031308:
            out[i] = v * 12.92
        else:
            out[i] = 1.055 * v ** (1.0 / 2.4) - 0.055
    return out


def rgb_to_hsv(c):
    r, g, b = (float(x) for x in c)
    c_max = max(r, g, b)
    c_min = min(r, g, b)
    delta = c_max - c_min
    h = 0.0
    if delta > 0.0:
        if c_max == r:
            h = 60.0 * np.fmod((g - b) / delta, 6.0)
        elif c_max == g:
            h = 60.0 * ((b - r) / delta + 2.0)
        else:
            h = 60.0 * ((r - g) / delta + 4.0)
    if h < 0.0:
        h += 360.0
    s = delta / c_max if c_max > 0.0 else 0.0
    return np.array([h, s, c_max], np.float32)


def hsv_to_rgb(hsv):
    h, s, v = (float(x) for x in hsv)
    c = v * s
    x = c * (1.0 - abs(np.fmod(h / 60.0, 2.0) - 1.0))
    m = v - c
    if h < 60.0:
        rgb = (c, x, 0.0)
    elif h < 120.0:
        rgb = (x, c, 0.0)
    elif h < 180.0:
        rgb = (0.0, c, x)
    elif h < 240.0:
        rgb = (0.0, x, c)
    elif h < 300.0:
        rgb = (x, 0.0, c)
    else:
        rgb = (c, 0.0, x)
    return np.array(rgb, np.float32) + m


def apply_curve(val, points):
    """shader.wgsl:340-378. points: list of (x, y) in 0..255."""
    count = len(points)
    if count < 2:
        return val
    x = val * 255.0
    if x <= points[0][0]:
        return points[0][1] / 255.0
    if x >= points[count - 1][0]:
        return points[count - 1][1] / 255.0
    for i in range(min(15, count - 1)):
        p1, p2 = points[i], points[i + 1]
        if x <= p2[0]:
            p0 = points[max(0, i - 1)]
            p3 = points[min(count - 1, i + 2)]
            delta_before = (p1[1] - p0[1]) / max(0.001, p1[0] - p0[0])
            delta_current = (p2[1] - p1[1]) / max(0.001, p2[0] - p1[0])
            delta_after = (p3[1] - p2[1]) / max(0.001, p3[0] - p2[0])
            if i == 0:
                t1 = delta_current
            else:
                t1 = 0.0 if delta_before * delta_current <= 0.0 else (delta_before + delta_current) / 2.0
            if i + 1 == count - 1:
                t2 = delta_current
            else:
                t2 = 0.0 if delta_current * delta_after <= 0.0 else (delta_current + delta_after) / 2.0
            if delta_current != 0.0:
                alpha = t1 / delta_current
                beta = t2 / delta_current
                if alpha * alpha + beta * beta > 9.0:
                    tau = 3.0 / np.sqrt(alpha * alpha + beta * beta)
                    t1 *= tau
                    t2 *= tau
            dx = p2[0] - p1[0]
            if dx <= 0.0:
                return float(np.clip(p1[1] / 255.0, 0.0, 1.0))
            t = (x - p1[0]) / dx
            h00 = 2 * t**3 - 3 * t**2 + 1
            h10 = t**3 - 2 * t**2 + t
            h01 = -2 * t**3 + 3 * t**2
            h11 = t**3 - t**2
            ry = h00 * p1[1] + h10 * t1 * dx + h01 * p2[1] + h11 * t2 * dx
            return float(np.clip(ry / 255.0, 0.0, 1.0))
    return points[count - 1][1] / 255.0


def apply_filmic_exposure(color, brightness):
    """shader.wgsl:518-547."""
    if brightness == 0.0:
        return color
    RCM, MS, TA = 0.95, 1.2, 1.06
    ol = get_luma(color)
    if abs(ol) < 0.00001:
        return color
    direct = brightness * (1 - RCM)
    rational = brightness * RCM
    scale = 2.0**direct
    k = 2.0 ** (-rational * MS)
    la = abs(ol)
    lf = np.floor(la / TA) * TA
    ln = (la - lf) / TA
    sn = ln / (ln + (1 - ln) * k)
    sla = lf + sn * TA
    nl = np.sign(ol) * sla * scale
    chroma = color - ol
    tls = nl / ol
    lw = np.clip(nl, 0, 2) * 0.5
    de = mix(0.95, 0.65, lw)
    bcs = max(tls, 0.0) ** de
    hr = 1.0 / (1.0 + max(0.0, nl - 0.9) * 2.0)
    return nl + chroma * (bcs * hr)


def get_shadow_mult(l, sh, bl):
    mult = 1.0
    sl = max(l, 0.0001)
    if bl != 0.0 and sl < 0.05:
        x = sl / 0.05
        mask = (1 - x) ** 2
        factor = min(2.0 ** (bl * 0.75), 3.9)
        mult *= mix(1.0, factor, mask)
    if sh != 0.0 and sl < 0.1:
        x = sl / 0.1
        mask = (1 - x) ** 2
        factor = min(2.0 ** (sh * 1.5), 3.9)
        mult *= mix(1.0, factor, mask)
    return mult


def apply_tonal(color, blurred_input, is_raw, con, sh, wh, bl):
    """shader.wgsl:405-464."""
    rgb = np.array(color, np.float32)
    blurred = np.array(blurred_input, np.float32)
    bl_lin = blurred if is_raw else srgb_to_linear(blurred)
    if wh != 0.0:
        wl = 1.0 - wh * 0.25
        wm = 1.0 / max(wl, 0.01)
        rgb = rgb * wm
        bl_lin = bl_lin * wm
    pl = get_luma(np.maximum(rgb, 0))
    blm = get_luma(np.maximum(bl_lin, 0))
    spl, sbl = max(pl, 0.0001), max(blm, 0.0001)
    halo = smoothstep(0.05, 0.25, abs(spl**0.5 - sbl**0.5))
    if sh != 0.0 or bl != 0.0:
        sm = get_shadow_mult(sbl, sh, bl)
        pm = get_shadow_mult(spl, sh, bl)
        rgb = rgb * mix(sm, pm, halo)
    if con != 0.0:
        g = 2.2
        out = np.empty(3, np.float32)
        strength = 2.0 ** (con * 1.25)
        for i in range(3):
            sr = max(rgb[i], 0.0)
            p = np.clip(sr ** (1 / g), 0.0, 1.0)
            if p < 0.5:
                cp = 0.5 * (2 * p) ** strength
            else:
                cp = 1.0 - 0.5 * (2 * (1 - p)) ** strength
            ca = cp**g
            mf = smoothstep(1.0, 1.01, sr)
            out[i] = mix(ca, rgb[i], mf)
        rgb = out
    return rgb


def apply_highlights(color, adj):
    """shader.wgsl:466-509."""
    color = np.array(color, np.float32)
    if adj == 0.0:
        return color
    pl = get_luma(np.maximum(color, 0))
    spl = max(pl, 0.0001)
    hm = smoothstep(0.3, 0.95, np.tanh(spl * 1.5))
    if hm < 0.001:
        return color
    l = pl
    if adj < 0.0:
        if l <= 1.0:
            gamma = 1.0 - adj * 1.75
            nl = l**gamma
        else:
            le = l - 1.0
            cs = -adj * 6.0
            nl = 1.0 + le / (1.0 + le * cs)
        ta = color * (nl / max(l, 0.0001))
        desat = smoothstep(1.0, 10.0, l)
        fin = mix(ta, np.full(3, nl, np.float32), desat)
    else:
        fin = color * 2.0 ** (adj * 1.75)
    return mix(color, fin, hm)


def apply_creative_color(color, sat, vib):
    """shader.wgsl:595-626."""
    processed = np.array(color, np.float32)
    l = get_luma(processed)
    if sat != 0.0:
        processed = mix(np.full(3, l, np.float32), processed, 1.0 + sat)
    if vib == 0.0:
        return processed
    c_max = processed.max()
    c_min = processed.min()
    delta = c_max - c_min
    if delta < 0.02:
        return processed
    cur = delta / max(c_max, 0.001)
    if vib > 0.0:
        sm = 1.0 - smoothstep(0.4, 0.9, cur)
        h = rgb_to_hsv(processed)[0]
        hd = min(abs(h - 25.0), 360.0 - abs(h - 25.0))
        skin = smoothstep(35.0, 10.0, hd)
        damp = mix(1.0, 0.6, skin)
        amount = vib * sm * damp * 3.0
    else:
        dm = 1.0 - smoothstep(0.2, 0.8, cur)
        amount = vib * dm
    return mix(np.full(3, l, np.float32), processed, 1.0 + amount)


HSL_RANGES = [
    (358.0, 35.0), (25.0, 45.0), (60.0, 40.0), (115.0, 90.0),
    (180.0, 60.0), (225.0, 60.0), (280.0, 55.0), (330.0, 50.0),
]


def apply_hsl_panel(color, hsl):
    """shader.wgsl:628-684. hsl: (8,3) [hue, sat, lum]."""
    safe = np.maximum(np.array(color, np.float32), 0.0)
    if abs(safe[0] - safe[1]) < 0.001 and abs(safe[1] - safe[2]) < 0.001:
        return safe
    hsv = rgb_to_hsv(safe)
    ol = get_luma(safe)
    sat_mask = smoothstep(0.05, 0.20, hsv[1])
    lum_w = smoothstep(0.0, 1.0, hsv[1])
    if sat_mask < 0.001 and lum_w < 0.001:
        return safe
    raw = []
    for c, w in HSL_RANGES:
        dist = min(abs(hsv[0] - c), 360.0 - abs(hsv[0] - c))
        fall = dist / (w * 0.5)
        raw.append(np.exp(-1.5 * fall * fall))
    total_raw = sum(raw)
    th = ts = tl = 0.0
    for i in range(8):
        ni = raw[i] / total_raw
        th += hsl[i][0] * 2.0 * ni * sat_mask
        ts += hsl[i][1] * ni * sat_mask
        tl += hsl[i][2] * ni * lum_w
    if hsv[1] * (1.0 + ts) < 0.0001:
        return np.full(3, ol * (1.0 + tl), np.float32)
    h = np.fmod(hsv[0] + th + 360.0, 360.0)
    s = np.clip(hsv[1] * (1.0 + ts), 0.0, 1.0)
    shifted = hsv_to_rgb([h, s, hsv[2]])
    nl = get_luma(shifted)
    target = ol * (1.0 + tl)
    if nl < 0.0001:
        return np.full(3, max(0.0, target), np.float32)
    return shifted * (target / nl)


def apply_color_grading(color, cg, blending, balance):
    """shader.wgsl:686-717. cg: (4,3) shadows/midtones/highlights/global."""
    color = np.array(color, np.float32)
    l = get_luma(np.maximum(color, 0))
    sc = 0.1 + max(0.0, -balance) * 0.5
    hc = 0.5 - max(0.0, balance) * 0.5
    feather = 0.2 * blending
    fsc = min(sc, hc - 0.01)
    sm = 1.0 - smoothstep(fsc - feather, fsc + feather, l)
    hm = smoothstep(hc - feather, hc + feather, l)
    mm = max(0.0, 1.0 - sm - hm)
    graded = color.copy()
    strengths = [(0.3, 0.5), (0.6, 0.8), (0.8, 1.0), (1.0, 1.0)]
    masks = [sm, mm, hm, 1.0]
    for i in range(4):
        hue, sat, lum = cg[i]
        if sat > 0.001:
            tint = hsv_to_rgb([hue, 1.0, 1.0])
            graded = graded + (tint - 0.5) * sat * masks[i] * strengths[i][0]
        graded = graded + lum * masks[i] * strengths[i][1]
    return graded


# --- AgX ---------------------------------------------------------------
AGX_MIN_EV, AGX_MAX_EV = -15.2, 5.0
AGX_SLOPE = 2.3843
AGX_TX, AGX_TY = 0.6060606, 0.43446
AGX_INTERCEPT = -1.0112
AGX_TOE_SCALE, AGX_SHOULDER_SCALE = -1.0359, 1.3475


def _agx_sigmoid(x, power):
    return x / (1.0 + x**power) ** (1.0 / power)


def _agx_scaled(x, scale, power):
    return scale * _agx_sigmoid(AGX_SLOPE * (x - AGX_TX) / scale, power) + AGX_TY


def agx_curve(x):
    if x < AGX_TX:
        r = _agx_scaled(x, AGX_TOE_SCALE, 1.5)
    elif x <= AGX_TX:
        r = AGX_SLOPE * x + AGX_INTERCEPT
    else:
        r = _agx_scaled(x, AGX_SHOULDER_SCALE, 1.5)
    return np.clip(r, 0.0, 1.0)


def agx_tonemap(color, p2r, r2p):
    c = np.array(color, np.float32)
    mn = c.min()
    if mn < 0.0:
        c = c - mn
    c = p2r @ c
    out = np.empty(3, np.float32)
    for i in range(3):
        x = max(c[i] / 0.18, 1e-6)
        le = (np.log2(x) - AGX_MIN_EV) / (AGX_MAX_EV - AGX_MIN_EV)
        out[i] = max(agx_curve(np.clip(le, 0.0, 1.0)), 0.0) ** 2.4
    return r2p @ out


# --- Linear exposure (shader.wgsl:511-516) -------------------------------
def apply_linear_exposure(color, exposure_adj):
    color = np.array(color, np.float32)
    if exposure_adj == 0.0:
        return color
    return color * 2.0**exposure_adj


# --- White balance (shader.wgsl:587-593) ---------------------------------
def apply_white_balance(color, temp, tnt):
    color = np.array(color, np.float32)
    temp_mult = np.array([1.0 + temp * 0.2, 1.0 + temp * 0.05, 1.0 - temp * 0.2], np.float32)
    tint_mult = np.array([1.0 + tnt * 0.25, 1.0 - tnt * 0.25, 1.0 + tnt * 0.25], np.float32)
    return color * temp_mult * tint_mult


# --- Color calibration (shader.wgsl:549-585) ------------------------------
def apply_color_calibration(color, cal):
    """cal: 7-tuple [shadows_tint, r_hue, r_sat, g_hue, g_sat, b_hue, b_sat]."""
    st, h_r, s_r, h_g, s_g, h_b, s_b = (float(x) for x in cal)
    r_prime = np.array([1.0 - abs(h_r), max(0.0, h_r), max(0.0, -h_r)], np.float32)
    g_prime = np.array([max(0.0, -h_g), 1.0 - abs(h_g), max(0.0, h_g)], np.float32)
    b_prime = np.array([max(0.0, h_b), max(0.0, -h_b), 1.0 - abs(h_b)], np.float32)
    # WGSL mat3x3(c0,c1,c2) * v = v.x*c0 + v.y*c1 + v.z*c2 (columns)
    hue_matrix = np.stack([r_prime, g_prime, b_prime], axis=1)
    c = hue_matrix @ np.array(color, np.float32)

    l = get_luma(np.maximum(c, 0.0))
    sat_vector = c - l
    color_sum = float(c.sum())
    masks = c / color_sum if color_sum > 0.001 else np.zeros(3, np.float32)
    total_sat_adjustment = masks[0] * s_r + masks[1] * s_g + masks[2] * s_b
    c = c + sat_vector * total_sat_adjustment

    if abs(st) > 0.001:
        shadow_luma = get_luma(np.maximum(c, 0.0))
        mask = 1.0 - smoothstep(0.0, 0.3, shadow_luma)
        tint_mult = np.array([1.0 + st * 0.25, 1.0 - st * 0.25, 1.0 + st * 0.25], np.float32)
        c = mix(c, c * tint_mult, mask)
    return c


# --- Local contrast (shader.wgsl:719-778) ---------------------------------
def apply_local_contrast(color_linear, blurred_input_space, amount, is_raw, mode, threshold):
    color_linear = np.array(color_linear, np.float32)
    if amount == 0.0:
        return color_linear
    blurred_linear = (
        np.array(blurred_input_space, np.float32)
        if is_raw
        else srgb_to_linear(blurred_input_space)
    )
    if amount < 0.0:
        blur_amount = -amount
        if mode == 0:
            blur_amount *= 0.5
        return mix(color_linear, blurred_linear, blur_amount)

    center_luma = get_luma(color_linear)
    shadow_threshold = 0.1 if is_raw else 0.03
    shadow_protection = smoothstep(0.0, shadow_threshold, center_luma)
    highlight_protection = 1.0 - smoothstep(0.9, 1.0, center_luma)
    midtone_mask = shadow_protection * highlight_protection
    if midtone_mask < 0.001:
        return color_linear

    blurred_luma = get_luma(blurred_linear)
    log_ratio = np.log2(max(center_luma, 0.0001) / max(blurred_luma, 0.0001))
    if mode == 0:
        edge_magnitude = abs(log_ratio)
        normalized_edge = np.clip(edge_magnitude / 3.0, 0.0, 1.0)
        edge_dampener = 1.0 - normalized_edge**0.5
        edge_mask = smoothstep(threshold * 0.5, threshold * 1.5, edge_magnitude)
        effective_amount = amount * edge_dampener * edge_mask * 0.8
    else:
        effective_amount = amount
    contrast_factor = 2.0 ** (log_ratio * effective_amount)
    return mix(color_linear, color_linear * contrast_factor, midtone_mask)


def _centre_mask(coord, dims):
    """shader.wgsl:790-798 / :822-830: 1 - radial vignette mask."""
    midpoint, feather = 0.4, 0.375
    aspect = dims[1] / dims[0]  # full_dims.y / full_dims.x
    ux = (coord[0] / dims[0] - 0.5) * 2.0
    uy = (coord[1] / dims[1] - 0.5) * 2.0
    d = np.sqrt(ux * ux + (uy * aspect) ** 2) * 0.5
    return 1.0 - smoothstep(midpoint - feather, midpoint + feather, d)


# --- Centre local contrast (shader.wgsl:780-809) ---------------------------
def apply_centre_local_contrast(color, centre_amount, coord, dims, blurred_srgb, is_raw):
    color = np.array(color, np.float32)
    if centre_amount == 0.0:
        return color
    centre_mask = _centre_mask(coord, dims)
    clarity_strength = centre_amount * (2.0 * centre_mask - 1.0) * 0.9
    if abs(clarity_strength) > 0.001:
        return apply_local_contrast(color, blurred_srgb, clarity_strength, is_raw, 1, 0.0)
    return color


# --- Centre tonal and color (shader.wgsl:811-846) --------------------------
def apply_centre_tonal_and_color(color, centre_amount, coord, dims):
    color = np.array(color, np.float32)
    if centre_amount == 0.0:
        return color
    centre_mask = _centre_mask(coord, dims)
    exposure_boost = centre_mask * centre_amount * 0.5
    out = apply_filmic_exposure(color, exposure_boost)
    vib_boost = centre_mask * centre_amount * 0.4
    sat_centre = centre_mask * centre_amount * 0.3
    sat_edge = -(1.0 - centre_mask) * centre_amount * 0.8
    return apply_creative_color(out, sat_centre + sat_edge, vib_boost)


# --- Dehaze (shader.wgsl:848-887) ------------------------------------------
def apply_dehaze(color, blurred_input_space, is_raw, amount):
    color = np.array(color, np.float32)
    if amount == 0.0:
        return color
    blurred_linear = (
        np.array(blurred_input_space, np.float32)
        if is_raw
        else srgb_to_linear(blurred_input_space)
    )
    atmospheric_light = np.array([0.95, 0.97, 1.0], np.float32)
    if amount > 0.0:
        pixel_dark = float(color.min())
        regional_dark = float(blurred_linear.min())
        pixel_luma = get_luma(np.maximum(color, 0.0))
        blurred_luma = get_luma(np.maximum(blurred_linear, 0.0))
        edge_diff = abs(max(pixel_luma, 0.0) ** 0.5 - max(blurred_luma, 0.0) ** 0.5)
        halo_protection = smoothstep(0.02, 0.15, edge_diff)
        spatial_dark = mix(regional_dark, pixel_dark, halo_protection)
        safe_dark = max(spatial_dark - 0.02, 0.0)
        mapped_haze = safe_dark / (safe_dark + 0.2)
        t = max(1.0 - amount * mapped_haze * 0.85, 0.15)
        recovered = (color - atmospheric_light) / t + atmospheric_light
        rec_luma = get_luma(np.maximum(recovered, 0.0))
        shadow_lift = smoothstep(0.1, 0.0, rec_luma) * (1.0 - t) * 0.15
        recovered = recovered + shadow_lift
        sat_boost = (1.0 - t) * 0.5
        final_luma = get_luma(np.maximum(recovered, 0.0))
        recovered = mix(np.full(3, final_luma, np.float32), recovered, 1.0 + sat_boost)
        return np.maximum(recovered, 0.0)
    regional_dark = float(blurred_linear.min())
    safe_dark = max(regional_dark - 0.02, 0.0)
    mapped_depth = safe_dark / (safe_dark + 0.2)
    depth_factor = mix(0.4, 1.0, mapped_depth)
    return mix(color, atmospheric_light, abs(amount) * 0.7 * depth_factor)


def _perceptual_luma(linear_luma):
    """Gamma-2.2 with linear extension above 1.0 (shader.wgsl:1337-1343)."""
    if linear_luma <= 1.0:
        return max(linear_luma, 0.0) ** (1.0 / 2.2)
    return 1.0 + (linear_luma - 1.0) ** (1.0 / 2.2)


def _graded_blur(blurred_input_space, is_raw, exp, bright, wh):
    """Shared glow/halation blur preconditioning (shader.wgsl:1324-1335)."""
    blurred_linear = (
        np.array(blurred_input_space, np.float32)
        if is_raw
        else srgb_to_linear(blurred_input_space)
    )
    blurred_linear = apply_linear_exposure(blurred_linear, exp)
    blurred_linear = apply_filmic_exposure(blurred_linear, bright)
    # the shader passes the raw blur texture and re-linearizes inside
    # apply_tonal_adjustments; passing the linear copy with is_raw semantics
    # is identical, but transcribe it literally for independence:
    blurred_linear = apply_tonal(blurred_linear, blurred_input_space if not is_raw else blurred_linear, is_raw, 0.0, 0.0, wh, 0.0)
    return np.array(blurred_linear, np.float32)


# --- Glow / bloom (shader.wgsl:1313-1381) ----------------------------------
def apply_glow_bloom(color, blurred_input_space, amount, is_raw, exp, bright, con, wh):
    color = np.array(color, np.float32)
    if amount <= 0.0:
        return color
    blurred_linear = _graded_blur(blurred_input_space, is_raw, exp, bright, wh)
    linear_luma = get_luma(np.maximum(blurred_linear, 0.0))
    perceptual_luma = _perceptual_luma(linear_luma)
    luma_cutoff = mix(0.75, 0.08, np.clip(amount, 0.0, 1.0))
    cutoff_fade = smoothstep(luma_cutoff, luma_cutoff + 0.15, perceptual_luma)
    excess = max(perceptual_luma - luma_cutoff, 0.0)
    normalized = excess / 5.5
    bloom_intensity = smoothstep(0.0, 1.0, normalized) ** 0.45
    if linear_luma > 0.01:
        color_ratio = blurred_linear / linear_luma
        bloom_color = color_ratio * np.array([1.03, 1.0, 0.97], np.float32)
    else:
        bloom_color = np.array([1.0, 0.99, 0.98], np.float32)
    luma_factor = linear_luma**0.6
    black_gate = smoothstep(0.0, 0.5, linear_luma) ** 0.5
    bloom_color = bloom_color * (bloom_intensity * luma_factor * cutoff_fade * black_gate)
    current_luma = get_luma(np.maximum(color, 0.0))
    protection = 1.0 - smoothstep(1.0, 2.2, current_luma)
    return color + bloom_color * amount * 3.8 * protection


# --- Halation (shader.wgsl:1383-1436) --------------------------------------
def apply_halation(color, blurred_input_space, amount, is_raw, exp, bright, con, wh):
    color = np.array(color, np.float32)
    if amount <= 0.0:
        return color
    blurred_linear = _graded_blur(blurred_input_space, is_raw, exp, bright, wh)
    linear_luma = get_luma(np.maximum(blurred_linear, 0.0))
    perceptual_luma = _perceptual_luma(linear_luma)
    luma_cutoff = mix(0.85, 0.1, np.clip(amount, 0.0, 1.0))
    if perceptual_luma <= luma_cutoff:
        return color
    excess = perceptual_luma - luma_cutoff
    rng = max(1.5 - luma_cutoff, 0.1)
    halation_mask = smoothstep(0.0, rng * 0.6, excess)
    core = np.array([1.0, 0.15, 0.03], np.float32)
    fringe = np.array([1.0, 0.32, 0.10], np.float32)
    intensity_blend = smoothstep(0.0, 0.7, halation_mask)
    halation_tint = mix(fringe, core, intensity_blend)
    glow_intensity = halation_mask * linear_luma
    halation_glow = halation_tint * glow_intensity
    color_luma = get_luma(np.maximum(color, 0.0))
    desat_strength = halation_mask * 0.12
    affected = mix(color, np.full(3, color_luma, np.float32), desat_strength)
    contrast_reduced = mix(np.full(3, 0.5, np.float32), affected, 1.0 - halation_mask * 0.06)
    return contrast_reduced + halation_glow * amount * 2.5


# --- Vignette (shader.wgsl:1645-1662) --------------------------------------
def apply_vignette(color, coord, dims, amount, midpoint, roundness, feather):
    color = np.array(color, np.float32)
    if amount == 0.0:
        return color
    v_round = 1.0 - roundness
    v_feather = feather * 0.5
    aspect = dims[1] / dims[0]
    ux = (coord[0] / dims[0] - 0.5) * 2.0
    uy = (coord[1] / dims[1] - 0.5) * 2.0
    rx = np.sign(ux) * abs(ux) ** v_round
    ry = np.sign(uy) * abs(uy) ** v_round
    d = np.sqrt(rx * rx + (ry * aspect) ** 2) * 0.5
    mask = smoothstep(midpoint - v_feather, midpoint + v_feather, d)
    if amount < 0.0:
        return color * (1.0 + amount * mask)
    return mix(color, np.ones(3, np.float32), amount * mask)


# --- Hash / gradient noise / grain (shader.wgsl:295-320, 1704-1717) ---------
def _f32(x):
    return np.float32(x)


def _fract32(x):
    x = _f32(x)
    return _f32(x - np.floor(x))


def hash2(px, py):
    """Strict-f32 transcription (shader.wgsl:295-299) so values agree
    bitwise with the f32 JAX path (ops/grain.py hash2)."""
    px, py = _f32(px), _f32(py)
    p3x = _fract32(px * _f32(0.1031))
    p3y = _fract32(py * _f32(0.1031))
    p3z = p3x
    c = _f32(33.33)
    d = _f32(_f32(p3x * _f32(p3y + c)) + _f32(p3y * _f32(p3z + c)) + _f32(p3z * _f32(p3x + c)))
    p3x, p3y, p3z = _f32(p3x + d), _f32(p3y + d), _f32(p3z + d)
    return float(_fract32(_f32(p3x + p3y) * p3z))


def gradient_noise(px, py):
    """Strict-f32 Perlin-style noise (shader.wgsl:301-320)."""
    px, py = _f32(px), _f32(py)
    ix, iy = _f32(np.floor(px)), _f32(np.floor(py))
    fx, fy = _f32(px - ix), _f32(py - iy)
    ux = fx * fx * fx * (fx * (fx * 6.0 - 15.0) + 10.0)
    uy = fy * fy * fy * (fy * (fy * 6.0 - 15.0) + 10.0)

    def grad_dot(ox, oy):
        gx = hash2(_f32(ix + _f32(ox)), _f32(iy + _f32(oy))) * 2.0 - 1.0
        gy = hash2(_f32(ix + _f32(ox) + _f32(11.0)), _f32(iy + _f32(oy) + _f32(37.0))) * 2.0 - 1.0
        return gx * (fx - ox) + gy * (fy - oy)

    bottom = mix(grad_dot(0.0, 0.0), grad_dot(1.0, 0.0), ux)
    top = mix(grad_dot(0.0, 1.0), grad_dot(1.0, 1.0), ux)
    return float(mix(bottom, top, uy))


def apply_grain(color, coord, amount, size, roughness, scale):
    """shader.wgsl:1704-1717. coord = (x, y) absolute pixel coordinates."""
    color = np.array(color, np.float32)
    if amount <= 0.0:
        return color
    amt = amount * 0.5
    freq = (1.0 / max(size, 0.1)) / scale
    l = max(0.0, get_luma(color))
    luma_mask = smoothstep(0.0, 0.15, l) * (1.0 - smoothstep(0.6, 1.0, l))
    noise_base = gradient_noise(coord[0] * freq, coord[1] * freq)
    noise_rough = gradient_noise(coord[0] * freq * 0.6 + 5.2, coord[1] * freq * 0.6 + 1.3)
    noise_val = mix(noise_base, noise_rough, roughness)
    return color + noise_val * amt * luma_mask


# --- CA correction (shader.wgsl:1077-1105) — whole-image -------------------
def apply_ca_correction(input_rgb, ca_rc, ca_by):
    """input_rgb: (3, H, W) input-space texture -> (3, H, W)."""
    _, h, w = input_rgb.shape
    out = np.array(input_rgb, np.float32).copy()
    cx, cy = w / 2.0, h / 2.0
    for y in range(h):
        for x in range(w):
            tx, ty = x - cx, y - cy
            if tx == 0.0 and ty == 0.0:
                continue
            rx = int(np.clip(round(x - tx * ca_rc), 0, w - 1))
            ry = int(np.clip(round(y - ty * ca_rc), 0, h - 1))
            bx = int(np.clip(round(x - tx * ca_by), 0, w - 1))
            by = int(np.clip(round(y - ty * ca_by), 0, h - 1))
            out[0, y, x] = input_rgb[0, ry, rx]
            out[2, y, x] = input_rgb[2, by, bx]
    return out


# --- Noise reduction (shader.wgsl:889-1075) — whole-image ------------------
def apply_noise_reduction(center_linear, input_rgb, coord, luma_amount, color_amount,
                          scale, is_raw, jitter=True):
    """One pixel of NR. center_linear: (3,) linearized center; input_rgb:
    (3, H, W) input-space texture (neighbor source); coord = (x, y).

    jitter=False reproduces the TPU static-grid approximation (the per-pixel
    hash jitter of the tap positions is dropped; see ops/nr.py docstring).
    """
    luma_a = float(np.clip(luma_amount, 0.0, 1.0))
    color_a = float(np.clip(color_amount, 0.0, 1.0))
    center_linear = np.array(center_linear, np.float32)
    if luma_a < 0.001 and color_a < 0.001:
        return center_linear
    _, h, w = input_rgb.shape
    x, y = coord

    def load_linear(cx, cy):
        cx = int(np.clip(cx, 0, w - 1))
        cy = int(np.clip(cy, 0, h - 1))
        s = np.array(input_rgb[:, cy, cx], np.float32)
        return s if is_raw else srgb_to_linear(s)

    center_safe = np.maximum(center_linear, 0.0)
    center_luma = get_luma(center_safe)
    center_chroma = center_linear - center_luma
    res_factor = float(np.clip(scale**0.5, 0.5, 2.0))

    new_luma = center_luma
    new_chroma = center_chroma

    offsets = [(dx, dy) for dy in range(-2, 3) for dx in range(-2, 3) if (dx, dy) != (0, 0)]

    if luma_a > 0.001:
        l_curve = luma_a**0.5
        stride_f = mix(1.0, 2.0, smoothstep(0.45, 0.95, luma_a)) * res_factor
        extra = float(np.clip(stride_f - 1.0, 0.0, 1.0))
        l_spatial = mix(1.0, 1.5, l_curve)
        l_spat_n = -1.0 / max(2.0 * l_spatial * l_spatial, 1e-6)
        h1 = hash2(float(x), float(y)) if jitter else 0.5
        h2 = hash2(float(x) + 17.31, float(y) + 71.13) if jitter else 0.5
        jx = (h1 - 0.5) * 2.0 * extra
        jy = (h2 - 0.5) * 2.0 * extra

        samp_luma = [center_luma]
        samp_spat = [1.0]
        lmin = lmax = center_luma
        for dx, dy in offsets:
            ring = max(abs(dx), abs(dy))
            ring_factor = 1.0 if ring == 2 else 0.5
            grow = 1.0 + extra * ring_factor
            ox = int(round(dx * grow + jx))
            oy = int(round(dy * grow + jy))
            s = load_linear(x + ox, y + oy)
            s_luma = get_luma(np.maximum(s, 0.0))
            samp_luma.append(s_luma)
            samp_spat.append(float(np.exp((dx * dx + dy * dy) * l_spat_n)))
            lmin, lmax = min(lmin, s_luma), max(lmax, s_luma)

        luma_range = lmax - lmin
        edge_strength = smoothstep(0.04, 0.20, luma_range)
        edge_midpoint = (lmin + lmax) * 0.5
        center_side = center_luma > edge_midpoint
        l_range_tol = mix(mix(0.025, 0.075, l_curve), mix(0.010, 0.025, l_curve), edge_strength)

        gates, sum_a, w_a = [], 0.0, 0.0
        for sl, ss in zip(samp_luma, samp_spat):
            diff = abs(sl - center_luma)
            g_range = 1.0 - smoothstep(l_range_tol * 0.6, l_range_tol, diff)
            g_side = 1.0 if (sl > edge_midpoint) == center_side else 0.0
            g_edge = mix(1.0, g_side, edge_strength)
            wgt = ss * g_range * g_edge
            gates.append(wgt)
            sum_a += sl * wgt
            w_a += wgt
        initial_mean = sum_a / max(w_a, 1e-4)

        outlier_tol = mix(0.07, 0.025, edge_strength)
        sum_b = w_b = 0.0
        for sl, init_w in zip(samp_luma, gates):
            if init_w > 0.0001:
                r = abs(sl - initial_mean) / outlier_tol
                bisq = max(0.0, 1.0 - r * r)
                wgt = init_w * bisq * bisq
                sum_b += sl * wgt
                w_b += wgt
        robust_luma = sum_b / max(w_b, 1e-6) if w_b > 0.01 else initial_mean
        strength = luma_a * mix(1.0, 0.6, edge_strength)
        new_luma = mix(center_luma, robust_luma, strength)

    if color_a > 0.001:
        center_r_y = center_linear[0] - center_luma
        center_b_y = center_linear[2] - center_luma
        c_curve = color_a**0.5
        stride_f = mix(2.0, 3.5, c_curve) * res_factor
        c_spatial = mix(2.0, 3.5, c_curve)
        c_spat_n = -1.0 / max(2.0 * c_spatial * c_spatial, 1e-6)
        luma_tol = mix(0.12, 0.04, c_curve)
        luma_n = -1.0 / max(2.0 * luma_tol * luma_tol, 1e-6)
        chroma_tol = mix(0.20, 0.08, c_curve)
        chroma_n = -1.0 / max(2.0 * chroma_tol * chroma_tol, 1e-6)
        jh1 = hash2(float(x) + 43.7, float(y) + 91.1) if jitter else 0.5
        jh2 = hash2(float(x) + 73.3, float(y) + 17.9) if jitter else 0.5
        jx = (jh1 - 0.5) * stride_f * 0.5
        jy = (jh2 - 0.5) * stride_f * 0.5

        sum_r, sum_b2, w_sum = center_r_y, center_b_y, 1.0
        for dx, dy in offsets:
            ox = int(round(dx * stride_f + jx))
            oy = int(round(dy * stride_f + jy))
            s = load_linear(x + ox, y + oy)
            s_safe = np.maximum(s, 0.0)
            s_luma = get_luma(s_safe)
            s_r_y = s[0] - s_luma
            s_b_y = s[2] - s_luma
            w_s = float(np.exp((dx * dx + dy * dy) * c_spat_n))
            dl = s_luma - center_luma
            w_l = float(np.exp(dl * dl * luma_n))
            dr, db = s_r_y - center_r_y, s_b_y - center_b_y
            w_c = float(np.exp((dr * dr + db * db) * chroma_n))
            wgt = w_s * w_l * w_c
            sum_r += s_r_y * wgt
            sum_b2 += s_b_y * wgt
            w_sum += wgt
        filtered_r_y = sum_r / max(w_sum, 1e-6)
        filtered_b_y = sum_b2 / max(w_sum, 1e-6)
        new_r_y = mix(center_r_y, filtered_r_y, color_a)
        new_b_y = mix(center_b_y, filtered_b_y, color_a)
        new_g_y = -(LUMA[0] * new_r_y + LUMA[2] * new_b_y) / LUMA[1]
        new_chroma = np.array([new_r_y, new_g_y, new_b_y], np.float32)

    return new_luma + new_chroma


# --- Separable Gaussian blur (blur.wgsl:22-83) — whole-image ----------------
def gaussian_blur(img, radius):
    """img: (3, H, W) input-space; radius: integer (ceil(base*scale), min 1,
    gpu_processing.rs:1327). sigma = radius/2; clamp-to-edge; samples clamped
    to [0, 65504] (rgba16f textures, blur.wgsl:17,35,44)."""
    img = np.clip(np.array(img, np.float32), 0.0, 65504.0)
    _, h, w = img.shape
    sigma = radius / 2.0
    offs = np.arange(-radius, radius + 1)
    wts = np.exp(-(offs * offs) / (2.0 * sigma * sigma)).astype(np.float32)
    total = wts.sum()

    tmp = np.empty_like(img)
    for x in range(w):
        xs = np.clip(x + offs, 0, w - 1)
        tmp[:, :, x] = (img[:, :, xs] * wts).sum(axis=-1) / total
    out = np.empty_like(tmp)
    for y in range(h):
        ys = np.clip(y + offs, 0, h - 1)
        out[:, y, :] = (tmp[:, ys, :] * wts[:, None]).sum(axis=-2) / total
    return out


# --- Curve set application (shader.wgsl:1197-1238) --------------------------
def is_default_curve(points):
    if len(points) < 2:
        return False
    if any(abs(x - y) > 0.5 for x, y in points):
        return False
    p0, pl = points[0], points[-1]
    return abs(p0[0]) < 0.1 and abs(p0[1]) < 0.1 and abs(pl[0] - 255.0) < 0.1 and abs(pl[1] - 255.0) < 0.1


def apply_all_curves(color, luma_curve, red_curve, green_curve, blue_curve):
    color = np.array(color, np.float32)
    rgb_active = not (
        is_default_curve(red_curve) and is_default_curve(green_curve) and is_default_curve(blue_curve)
    )
    if rgb_active:
        graded = np.array(
            [
                apply_curve(float(color[0]), red_curve),
                apply_curve(float(color[1]), green_curve),
                apply_curve(float(color[2]), blue_curve),
            ],
            np.float32,
        )
        luma_target = apply_curve(get_luma(color), luma_curve)
        luma_graded = get_luma(graded)
        if luma_graded > 0.001:
            final = graded * (luma_target / luma_graded)
        else:
            final = np.full(3, luma_target, np.float32)
        mx = final.max()
        if mx > 1.0:
            final = final / mx
        return final
    return np.array([apply_curve(float(v), luma_curve) for v in color], np.float32)


# --- Full-chain develop (shader.wgsl main :1438-1735) ----------------------
def develop_image(image, p, is_raw=False, tonemapper="agx",
                  agx_p2r=None, agx_r2p=None, nr_jitter=True):
    """Whole-image oracle develop. image: (3, H, W) input-space f32.

    p: dict of already-normalized parameter values (the output of
    params.parse, i.e. post-SCALES), with keys matching params['glob'] —
    exposure, brightness, contrast, ..., hsl (8,3), cg (4,3), curves as raw
    point lists {luma/red/green/blue: [(x, y), ...]}, calibration (7,),
    vignette_*, grain_*, ca_rc, ca_by, sharpness, sharpness_threshold,
    centre, luma_nr, color_nr, dehaze, glow, halation, hue, saturation,
    vibrance, temperature, tint, highlights, shadows, whites, blacks.
    Masks/LUT/flare are not exercised here (covered by dedicated tests).
    """
    image = np.array(image, np.float32)
    _, h, w = image.shape
    scale = max(0.1, min(h, w) / 1080.0)
    dims = (float(w), float(h))

    # CA (shader.wgsl:1453-1456)
    if abs(p.get("ca_rc", 0.0)) > 1e-6 or abs(p.get("ca_by", 0.0)) > 1e-6:
        color_from_texture = apply_ca_correction(image, p.get("ca_rc", 0.0), p.get("ca_by", 0.0))
    else:
        color_from_texture = image
    initial_linear = color_from_texture if is_raw else srgb_to_linear(color_from_texture)

    # blur pyramid (gpu_processing.rs:1326-1405), input space
    def rad(base):
        return max(1, int(np.ceil(base * scale)))

    blur_sharp = gaussian_blur(image, rad(1.0))
    blur_tonal = gaussian_blur(image, rad(3.5))
    blur_clarity = gaussian_blur(image, rad(8.0))
    blur_structure = gaussian_blur(image, rad(40.0))

    out = np.empty_like(image)
    curves = p.get("curves", {})
    for y in range(h):
        for x in range(w):
            px = initial_linear[:, y, x]
            if p.get("luma_nr", 0.0) > 0.001 or p.get("color_nr", 0.0) > 0.001:
                px = apply_noise_reduction(
                    px, image, (x, y), p.get("luma_nr", 0.0), p.get("color_nr", 0.0),
                    scale, is_raw, jitter=nr_jitter,
                )
            sb = blur_sharp[:, y, x]
            tb = blur_tonal[:, y, x]
            cb = blur_clarity[:, y, x]
            stb = blur_structure[:, y, x]

            c = apply_local_contrast(px, sb, p.get("sharpness", 0.0), is_raw, 0,
                                     p.get("sharpness_threshold", 0.0))
            c = apply_local_contrast(c, cb, p.get("clarity", 0.0), is_raw, 1, 0.0)
            c = apply_local_contrast(c, stb, p.get("structure", 0.0), is_raw, 1, 0.0)
            c = apply_centre_local_contrast(c, p.get("centre", 0.0), (x, y), dims, cb, is_raw)
            c = apply_linear_exposure(c, p.get("exposure", 0.0))
            if p.get("glow", 0.0) > 0.0:
                c = apply_glow_bloom(c, stb, p["glow"], is_raw, p.get("exposure", 0.0),
                                     p.get("brightness", 0.0), p.get("contrast", 0.0),
                                     p.get("whites", 0.0))
            if p.get("halation", 0.0) > 0.0:
                c = apply_halation(c, cb, p["halation"], is_raw, p.get("exposure", 0.0),
                                   p.get("brightness", 0.0), p.get("contrast", 0.0),
                                   p.get("whites", 0.0))
            c = apply_dehaze(c, stb, is_raw, p.get("dehaze", 0.0))
            c = apply_centre_tonal_and_color(c, p.get("centre", 0.0), (x, y), dims)
            c = apply_white_balance(c, p.get("temperature", 0.0), p.get("tint", 0.0))
            c = apply_filmic_exposure(c, p.get("brightness", 0.0))
            c = apply_tonal(c, tb, is_raw, p.get("contrast", 0.0), p.get("shadows", 0.0),
                            p.get("whites", 0.0), p.get("blacks", 0.0))
            c = apply_highlights(c, p.get("highlights", 0.0))
            if "calibration" in p:
                c = apply_color_calibration(c, p["calibration"])
            if "hsl" in p:
                c = apply_hsl_panel(c, p["hsl"])
            hue = p.get("hue", 0.0)
            if abs(hue) >= 0.01:
                # apply_hue_shift (shader.wgsl:276-286)
                ext = linear_to_srgb_extended(c)
                hsv = rgb_to_hsv(ext)
                hsv[0] = np.fmod(hsv[0] + hue + 360.0, 360.0)
                c = srgb_to_linear(hsv_to_rgb(hsv))
            c = apply_creative_color(c, p.get("saturation", 0.0), p.get("vibrance", 0.0))
            if "cg" in p:
                c = apply_color_grading(c, p["cg"], p.get("cg_blending", 0.5),
                                        p.get("cg_balance", 0.0))
            c = apply_vignette(c, (x, y), dims, p.get("vignette_amount", 0.0),
                               p.get("vignette_midpoint", 0.5),
                               p.get("vignette_roundness", 0.0),
                               p.get("vignette_feather", 0.5))
            # tonemap (shader.wgsl:1663-1676)
            if tonemapper == "agx":
                c = agx_tonemap(c, agx_p2r, agx_r2p)
            elif is_raw:
                se = linear_to_srgb(c)
                se = se ** (1.0 / 1.1)
                cc = se * se * (3.0 - 2.0 * se)
                c = mix(se, cc, 0.75)
            else:
                c = linear_to_srgb(c)
            if curves:
                c = apply_all_curves(
                    c,
                    curves.get("luma", [(0.0, 0.0), (255.0, 255.0)]),
                    curves.get("red", [(0.0, 0.0), (255.0, 255.0)]),
                    curves.get("green", [(0.0, 0.0), (255.0, 255.0)]),
                    curves.get("blue", [(0.0, 0.0), (255.0, 255.0)]),
                )
            if p.get("grain_amount", 0.0) > 0.0:
                c = apply_grain(c, (float(x), float(y)), p["grain_amount"],
                                p.get("grain_size", 1.0), p.get("grain_roughness", 0.5), scale)
            # output dither (shader.wgsl:1730-1732; TPU uses the fract-hash
            # in place of the GPU-vendor-defined sin one-liner)
            c = c + (hash2(float(x), float(y)) - 0.5) * (1.0 / 255.0)
            out[:, y, x] = c
    return np.clip(out, 0.0, 1.0)
