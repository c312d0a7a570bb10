"""X-Trans (Fujifilm 6x6 CFA) demosaic — directional green + color-diff R/B.

The reference decodes RAF through rawler and demosaics with its X-Trans
path (raw_processing.rs:15-30 via Cargo.toml:27). TPU-first design: the
6x6 pattern is static at trace time, so demosaic lowers to edge-clamped
SHIFTED ADDS with per-color distance-weighted kernels — no gathers, no
data-dependent control flow; XLA fuses the ~150 shifted FMAs into a few
passes. Quality is Markesteijn-direction (see demosaic_xtrans): green is
reconstructed by blending horizontal/vertical neighbor means with local
inverse-gradient weights, then R/B interpolate as color differences
against the green plane (removing the chroma fringing of raw-value
interpolation); the green-site density of X-Trans (20/36) keeps luma
detail high.

Weight maps are 6x6-periodic, so the normalizing denominators are
computed once per pattern on the host and tiled; edges reuse the same
clamp-to-edge shifts for numerator and denominator so normalization
stays exact everywhere.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

# canonical X-Trans layout (Fujifilm X-T/X-Pro series), 0=R 1=G 2=B —
# used when the RAF CFA header lacks tag 0x0131
DEFAULT_XTRANS = np.array(
    [
        [1, 2, 1, 1, 0, 1],
        [0, 1, 0, 2, 1, 2],
        [1, 2, 1, 1, 0, 1],
        [1, 0, 1, 1, 2, 1],
        [2, 1, 2, 0, 1, 0],
        [1, 0, 1, 1, 2, 1],
    ],
    np.int32,
)

# distance-weighted kernels: green sites are dense (orthogonal neighbors
# suffice); red/blue need a 5x5 reach (max distance to a same-color site
# in X-Trans is 2)
_K_G = {(0, 0): 1.0, (0, 1): 1.0, (0, -1): 1.0, (1, 0): 1.0, (-1, 0): 1.0,
        (1, 1): 0.5, (1, -1): 0.5, (-1, 1): 0.5, (-1, -1): 0.5}
_K_RB = {}
for _dy in range(-2, 3):
    for _dx in range(-2, 3):
        _d = (_dy * _dy + _dx * _dx) ** 0.5
        _K_RB[(_dy, _dx)] = 1.0 / (1.0 + _d * _d)


def _shift(padded: jnp.ndarray, dy: int, dx: int, pad: int, h: int, w: int):
    return padded[pad + dy : pad + dy + h, pad + dx : pad + dx + w]


@functools.lru_cache(maxsize=8)
def _plan(xtrans_key: tuple):
    """Per-color (mask, kernel, periodic check) for a 6x6 pattern."""
    xt = np.asarray(xtrans_key, np.int32).reshape(6, 6)
    plans = []
    for c, kern in ((0, _K_RB), (1, _K_G), (2, _K_RB)):
        mask = (xt == c).astype(np.float32)
        # interior weight sum per phase must be positive everywhere
        wsum = np.zeros((6, 6), np.float64)
        for (dy, dx), kw in kern.items():
            wsum += kw * np.roll(np.roll(mask, -dy, 0), -dx, 1)
        if not (wsum > 1e-6).all():
            raise ValueError(f"X-Trans pattern leaves channel {c} uncovered")
        plans.append((mask, tuple(sorted(kern.items()))))
    return plans


def _masked_interp(x, mask, kern, pad, h, w):
    """Distance-weighted interpolation of `x*mask` normalized by the
    kernel's mask coverage (shared edge-clamped shifts)."""
    num_src = jnp.pad(x * mask, pad, mode="edge")
    den_src = jnp.pad(mask, pad, mode="edge")
    num = jnp.zeros_like(x)
    den = jnp.zeros_like(x)
    for (dy, dx), kw in kern:
        num = num + kw * _shift(num_src, dy, dx, pad, h, w)
        den = den + kw * _shift(den_src, dy, dx, pad, h, w)
    return num, den


def demosaic_xtrans(x: jnp.ndarray, xtrans: np.ndarray) -> jnp.ndarray:
    """(H, W) white-balanced CFA -> planar (3, H, W), X-Trans pattern.

    xtrans: (6, 6) int array of 0/1/2 describing the sensor layout at
    pixel (0, 0).

    Two-stage (Markesteijn-direction, expressed as static shifted adds):
      1. GREEN everywhere, blending per-direction neighbor means by local
         inverse-gradient weights (X-Trans green sites are dense enough
         that every non-G site has row and column G neighbors within 2).
         Direction availability per 6x6 phase is static; the gradient
         weights are per-pixel elementwise — no gathers, SPMD-safe.
      2. R/B as COLOR DIFFERENCES against the green plane: interpolate
         (R - G) from R sites with the distance kernel and add G back,
         which removes the chroma fringing of raw-value interpolation.
    """
    h, w = x.shape
    xt = np.asarray(xtrans, np.int32)
    plans = _plan(tuple(xt.reshape(-1).tolist()))
    reps = (h + 5) // 6 + 1, (w + 5) // 6 + 1
    pad = 2

    masks = [
        jnp.asarray(np.tile(m, reps)[:h, :w]) for m, _ in plans
    ]

    # ---- stage 1: green, directionally weighted -------------------------
    g_mask = masks[1]
    kern_g = dict(plans[1][1])
    kern_h = tuple((o, kw) for o, kw in kern_g.items() if o[0] == 0)
    kern_v = tuple((o, kw) for o, kw in kern_g.items() if o[1] == 0)
    kern_a = tuple(kern_g.items())

    xp = jnp.pad(x, pad, mode="edge")
    grad_h = jnp.abs(
        _shift(xp, 0, 1, pad, h, w) - _shift(xp, 0, -1, pad, h, w)
    ) + jnp.abs(
        2.0 * x - _shift(xp, 0, 2, pad, h, w) - _shift(xp, 0, -2, pad, h, w)
    )
    grad_v = jnp.abs(
        _shift(xp, 1, 0, pad, h, w) - _shift(xp, -1, 0, pad, h, w)
    ) + jnp.abs(
        2.0 * x - _shift(xp, 2, 0, pad, h, w) - _shift(xp, -2, 0, pad, h, w)
    )

    num_h, den_h = _masked_interp(x, g_mask, kern_h, pad, h, w)
    num_v, den_v = _masked_interp(x, g_mask, kern_v, pad, h, w)
    num_a, den_a = _masked_interp(x, g_mask, kern_a, pad, h, w)
    eps = 1e-4
    # direction weight: inverse gradient, zeroed where the phase has no
    # samples in that direction (den == 0)
    w_h = jnp.where(den_h > 1e-6, 1.0 / (eps + grad_h), 0.0)
    w_v = jnp.where(den_v > 1e-6, 1.0 / (eps + grad_v), 0.0)
    # isotropic stabilizer RELATIVE to the winning direction: a constant
    # would swamp the directional weights as soon as gradients exceed its
    # reciprocal (exactly the textured/colored edges where direction
    # selection matters); phases with no directional samples fall back to
    # the isotropic estimate entirely
    w_dir = jnp.maximum(w_h, w_v)
    w_a = jnp.where(w_dir > 0.0, 0.1 * w_dir, 1.0)
    est_h = num_h / jnp.maximum(den_h, 1e-6)
    est_v = num_v / jnp.maximum(den_v, 1e-6)
    est_a = num_a / jnp.maximum(den_a, 1e-6)
    g_interp = (w_h * est_h + w_v * est_v + w_a * est_a) / jnp.maximum(
        w_h + w_v + w_a, 1e-9
    )
    green = jnp.where(g_mask > 0, x, g_interp)

    # ---- stage 2: R/B via color differences -----------------------------
    out = [None, green, None]
    for c in (0, 2):
        mask = masks[c]
        kern = plans[c][1]
        diff = x - green  # valid at this channel's sites
        num, den = _masked_interp(diff, mask, kern, pad, h, w)
        interp = green + num / jnp.maximum(den, 1e-6)
        out[c] = jnp.where(mask > 0, x, interp)
    return jnp.stack(out)


def shift_xtrans(xt: np.ndarray, top: int, left: int) -> np.ndarray:
    """Pattern after cropping `top` rows / `left` cols."""
    return np.roll(np.roll(np.asarray(xt, np.int32), -top % 6, 0), -left % 6, 1)
