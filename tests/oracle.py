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
