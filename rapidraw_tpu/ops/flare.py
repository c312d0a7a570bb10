"""Lens flare map generation (512x512).

Port of flare.wgsl: a soft-knee bright-pass of the image (threshold_main,
:73-116) feeds a ghosts pass (:291-410) compositing a 6-spike starburst,
inner burst, radial glow, iris rings, 7 inverted-UV ghosts, 3 halos and a
64-tap anamorphic streak. The map is fixed 512^2 (gpu_processing.rs:552),
sampled back into the develop chain at shader.wgsl:1596-1610.

All sampling here is bilinear gathers over the 512^2 threshold map; the
whole generator is a few hundred vectorized taps on a 0.26 MPix grid —
negligible next to the main image.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from rapidraw_tpu.ops import colorspace as cs
from rapidraw_tpu.ops.common import luma, mix, smoothstep

FLARE_MAP_SIZE = 512


def _filmic_exposure_flare(rgb, brightness):
    """flare.wgsl:37-61 — simpler variant than the main kernel's."""
    original_luma = luma(rgb)
    direct = brightness * 0.05
    rational = brightness * 0.95
    scale = jnp.exp2(direct)
    k = jnp.exp2(-rational * 1.2)
    la = jnp.abs(original_luma)
    lf = jnp.floor(la)
    fr = la - lf
    shaped = fr / (fr + (1.0 - fr) * k)
    new_luma = jnp.sign(original_luma) * (lf + shaped) * scale
    chroma = rgb - original_luma
    safe = jnp.where(jnp.abs(original_luma) < 1e-20, 1.0, original_luma)
    chroma_scale = jnp.power(jnp.maximum(new_luma / safe, 0.0), 0.8)
    out = new_luma + chroma * chroma_scale
    skip = (jnp.asarray(brightness) == 0.0) | (jnp.abs(original_luma) < 0.00001)
    return jnp.where(skip, rgb, out)


def _bilinear_uv(tex: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Clamped bilinear sample of planar (3, H, W) at uv in [0,1] (flare.wgsl:121-135)."""
    _, h, w = tex.shape
    uc = jnp.clip(u, 0.0, 1.0)
    vc = jnp.clip(v, 0.0, 1.0)
    x = uc * w - 0.5
    y = vc * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    xi0 = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    yi0 = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    xi1 = jnp.clip(xi0 + 1, 0, w - 1)
    yi1 = jnp.clip(yi0 + 1, 0, h - 1)
    flat = tex.reshape(3, -1)

    def g(yy, xx):
        return jnp.take(flat, (yy * w + xx).reshape(-1), axis=1).reshape((3,) + xx.shape)

    top = mix(g(yi0, xi0), g(yi0, xi1), fx)
    bot = mix(g(yi1, xi0), g(yi1, xi1), fx)
    return mix(top, bot, fy)


def flare_threshold_map(
    image: jnp.ndarray, amount, exposure, brightness, whites, is_raw: bool
) -> jnp.ndarray:
    """Soft-knee bright extraction at 512^2 (flare.wgsl:73-116)."""
    n = FLARE_MAP_SIZE
    uv = (jnp.arange(n, dtype=jnp.float32) + 0.5) / n
    u = uv[None, :] * jnp.ones((n, 1), jnp.float32)
    v = uv[:, None] * jnp.ones((1, n), jnp.float32)
    raw_sample = _bilinear_uv(image, u, v)

    lin = raw_sample if is_raw else cs.srgb_to_linear(raw_sample)
    lin = jnp.where(jnp.asarray(exposure) != 0.0, lin * jnp.exp2(exposure), lin)
    lin = _filmic_exposure_flare(lin, brightness)
    white_level = 1.0 - whites * 0.25
    lin = jnp.where(
        jnp.asarray(whites) != 0.0, lin / jnp.maximum(white_level, 0.01), lin
    )

    true_luma = luma(lin)
    lt = jnp.minimum(true_luma, 1.0)
    threshold = mix(0.88, 0.50, jnp.clip(amount, 0.0, 1.0))
    knee = 0.15
    x = lt - threshold + knee
    contrib = jnp.where(
        x <= 0.0,
        0.0,
        jnp.where(x < knee * 2.0, (x * x) / (knee * 4.0), x - knee),
    )
    return lin * (contrib / jnp.maximum(true_luma, 0.001))


def generate_flare_map(
    image: jnp.ndarray,
    amount,
    exposure,
    brightness,
    whites,
    is_raw: bool,
) -> jnp.ndarray:
    """Full flare map -> (512, 512, 3) as sampled by the develop chain."""
    n = FLARE_MAP_SIZE
    _, h, w = image.shape
    aspect = w / h  # FlareParams.aspect_ratio
    thr = flare_threshold_map(image, amount, exposure, brightness, whites, is_raw)

    uv1 = (jnp.arange(n, dtype=jnp.float32) + 0.5) / n
    u = uv1[None, :] * jnp.ones((n, 1), jnp.float32)
    v = uv1[:, None] * jnp.ones((1, n), jnp.float32)
    fu = 1.0 - u
    fv = 1.0 - v

    def sample(uu, vv):
        return _bilinear_uv(thr, uu, vv)

    def in_bounds(uu, vv):
        return (uu >= 0.0) & (uu <= 1.0) & (vv >= 0.0) & (vv <= 1.0)

    flare = jnp.zeros((3, n, n), jnp.float32)

    # --- 6-spike starburst (:137-192)
    rot = 0.5236
    spread = 0.01
    star = jnp.zeros((3, n, n), jnp.float32)
    for spike in range(6):
        angle = spike * np.pi / 6 + rot
        dx, dy = np.cos(angle), np.sin(angle)
        dx /= aspect
        norm = np.hypot(dx, dy)
        dx, dy = dx / norm, dy / norm
        acc = jnp.zeros((3, n, n), jnp.float32)
        wsum = jnp.zeros((n, n), jnp.float32)
        for i in range(1, 25):
            t = i / 24.0
            dist = t * t * 0.65
            falloff = float(np.exp(-dist * 2.5) + 0.4 * np.exp(-dist * 0.8))
            for sgn in (1.0, -1.0):
                uu = u + sgn * dx * dist
                vv = v + sgn * dy * dist
                ok = in_bounds(uu, vv)
                ur = u + sgn * dx * dist * (1.0 + spread)
                vr = v + sgn * dy * dist * (1.0 + spread)
                ub = u + sgn * dx * dist * (1.0 - spread)
                vb = v + sgn * dy * dist * (1.0 - spread)
                rch = sample(ur, vr)[0]
                gch = sample(uu, vv)[1]
                bch = sample(ub, vb)[2]
                tap = jnp.stack([rch, gch, bch])
                acc = acc + jnp.where(ok, tap * falloff, 0.0)
                wsum = wsum + jnp.where(ok, falloff, 0.0)
        star = star + jnp.where(wsum > 0.0, acc / jnp.maximum(wsum, 1e-9), 0.0)
    star = star / 6.0 * 3.0
    flare = flare + star * jnp.array([1.0, 0.95, 0.85]).reshape(3, 1, 1) * 3.5

    # --- inner starburst (:194-235)
    inner = jnp.zeros((3, n, n), jnp.float32)
    for spike in range(6):
        angle = spike * np.pi / 6 + rot
        dx, dy = np.cos(angle), np.sin(angle)
        dx /= aspect
        norm = np.hypot(dx, dy)
        dx, dy = dx / norm, dy / norm
        acc = jnp.zeros((3, n, n), jnp.float32)
        wsum = jnp.zeros((n, n), jnp.float32)
        for i in range(1, 17):
            dist = (i / 16.0) * 0.2
            falloff = float(np.exp(-dist * 8.0))
            for sgn in (1.0, -1.0):
                uu = u + sgn * dx * dist
                vv = v + sgn * dy * dist
                ok = in_bounds(uu, vv)
                acc = acc + jnp.where(ok, sample(uu, vv) * falloff, 0.0)
                wsum = wsum + jnp.where(ok, falloff, 0.0)
        inner = inner + jnp.where(wsum > 0.0, acc / jnp.maximum(wsum, 1e-9), 0.0)
    inner = inner / 6.0 * 2.0
    flare = flare + inner * jnp.array([1.0, 0.9, 0.8]).reshape(3, 1, 1) * 1.5

    # --- radial glow (:237-267)
    glow = sample(u, v) * 2.0
    gw = jnp.full((n, n), 2.0, jnp.float32)
    for ring in range(1, 4):
        radius = ring / 3.0 * 0.08
        ring_weight = float(np.exp(-radius * radius * 200.0))
        for s in range(12):
            angle = s * 6.28318 / 12.0 + ring * 0.5
            ox = np.cos(angle) * radius / aspect
            oy = np.sin(angle) * radius
            uu, vv = u + ox, v + oy
            ok = in_bounds(uu, vv)
            glow = glow + jnp.where(ok, sample(uu, vv) * ring_weight, 0.0)
            gw = gw + jnp.where(ok, ring_weight, 0.0)
    flare = flare + (glow / gw) * jnp.array([1.0, 0.95, 0.9]).reshape(3, 1, 1) * 0.4

    # --- iris rings (:269-289)
    center_dist = jnp.sqrt(((u - 0.5) * aspect) ** 2 + (v - 0.5) ** 2)
    src = sample(fu, fv)
    angle = jnp.arctan2(v - 0.5, (u - 0.5) * aspect)
    hex_mod = 0.9 + 0.1 * jnp.power(jnp.abs(jnp.cos(angle * 3.0)), 4.0)
    iris = jnp.zeros((3, n, n), jnp.float32)
    for rr, wd, inten in ((0.15, 0.02, 0.4), (0.25, 0.025, 0.3), (0.35, 0.03, 0.2), (0.48, 0.035, 0.15)):
        ring_factor = jnp.exp(-(((center_dist - rr) / wd) ** 2))
        iris = iris + src * ring_factor * inten * hex_mod
    flare = flare + iris * jnp.array([0.7, 0.8, 1.0]).reshape(3, 1, 1) * 0.2

    # --- ghosts (:315-364)
    ghosts = (
        (fu, fv, 0.75, (0.15, 0.6), (1.0, 0.92, 0.85), 0.05, False),
        (fu, fv, 0.4, (0.1, 0.45), (0.92, 1.0, 0.95), 0.07, False),
        (fu, fv, 0.2, (0.08, 0.35), (0.95, 0.97, 1.0), 0.08, False),
        (fu, fv, 0.12, (0.05, 0.25), (1.0, 1.0, 0.97), 0.07, False),
        (u, v, 1.8, (0.25, 0.75), (0.85, 0.9, 1.0), 0.03, True),
        (fu, fv, 1.3, (0.2, 0.55), (1.0, 0.9, 0.95), 0.03, True),
        (fu, fv, 0.55, (0.2, 0.5), (0.97, 0.95, 1.0), 0.04, False),
    )
    for gu, gv, sc, (e0, e1), tint, mult, gated in ghosts:
        gx = 0.5 + (gu - 0.5) * sc
        gy = 0.5 + (gv - 0.5) * sc
        ghost = sample(gx, gy)
        dist = jnp.sqrt(((gx - 0.5) * aspect) ** 2 + (gy - 0.5) ** 2)
        vig = 1.0 - smoothstep(e0, e1, dist)
        term = ghost * jnp.asarray(tint).reshape(3, 1, 1) * mult * vig
        if gated:
            ok = (gx > 0.0) & (gx < 1.0) & (gy > 0.0) & (gy < 1.0)
            term = jnp.where(ok, term, 0.0)
        flare = flare + term

    # --- halos (:366-382)
    halo_sample = sample(fu, fv)
    for radius, wd, tint, mult in (
        (0.4, 0.05, (0.85, 0.92, 1.0), 0.07),
        (0.22, 0.035, (0.92, 0.88, 1.0), 0.05),
        (0.55, 0.06, (0.85, 0.95, 0.97), 0.03),
    ):
        hf = jnp.exp(-(((center_dist - radius) / wd) ** 2))
        flare = flare + halo_sample * jnp.asarray(tint).reshape(3, 1, 1) * hf * mult

    # --- anamorphic streak (:384-407)
    streak_len = 0.4 / aspect
    acc = jnp.zeros((3, n, n), jnp.float32)
    total_w = 0.0
    for i in range(64):
        t = (i / 63.0) * 2.0 - 1.0
        offset = t * streak_len
        weight = float(np.exp(-t * t * 3.5))
        total_w += weight
        su = u + offset
        ok = (su > 0.0) & (su < 1.0)
        rch = sample(u + offset * 1.015, v)[0]
        gch = sample(su, v)[1]
        bch = sample(u + offset * 0.985, v)[2]
        acc = acc + jnp.where(ok, jnp.stack([rch, gch, bch]) * weight, 0.0)
    streak = acc / total_w
    flare = flare + streak * jnp.array([0.85, 0.92, 1.0]).reshape(3, 1, 1) * 1.0

    out = flare * jnp.asarray(amount) * 1.5
    # develop samples an (H, W, C) map (shader binds a texture)
    return jnp.moveaxis(out, 0, -1)
