"""TPU-fast geometry warp: two-pass resample with Pallas shift-select kernels.

The exact path (geometry/warp.py) evaluates the inverse map per output
pixel and bilinearly gathers — a 24M-element 2D gather that XLA scalarizes
on TPU (measured ~2 s per 24MP frame; even a whole-row `take` costs
seconds). This module is the TPU-native redesign:

  * The inverse map is STATIC at trace time (a pure function of
    GeometryParams + shape), so a host-side planner (numpy, the SAME
    `source_coords` formulas as the exact path) decomposes the warp into a
    vertical resample followed by a horizontal resample (Catmull-Smith
    two-pass: the vertical pass samples src at (Yv(y,c), c) where
    Yv(y, ·) = Y(y, X⁻¹(y, ·)) via per-row monotone inversion).
  * Each 1D pass runs as a Pallas kernel: per output tile, one DMA fetches
    the source band at a per-tile base offset (scalar-prefetched), then the
    per-pixel fractional offsets — whose in-tile SPAN is small because the
    map is smooth — are resolved by a static shift-and-select loop over
    the span. Gathers never happen; everything is slices, compares and
    FMAs on the VPU.
  * Degenerate maps (perspective folds, spans past MAX_SPAN, NaNs) make
    the planner return None and callers fall back to the exact path.

Quality: two sequential bilinear resamples instead of one — the standard
mesh-warp tradeoff (sub-pixel-exact coordinates, slightly softer than a
single resample). Axis-aligned maps (pure shear/scale per axis) reduce to
a single interpolation and match the exact path to float tolerance.

Reference anchor: warp_image_geometry (image_processing.rs:645-803); the
reference runs this on CPU with rayon — there is no GPU warp to mirror, so
the TPU design is free to differ structurally.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rapidraw_tpu.geometry.params import GeometryParams
from rapidraw_tpu.geometry.warp import warp_image_geometry

import os

# swept on v5e with double-buffered DMA + dynamic group loop (24MP,
# rotate 1.5deg + k1/k2 distortion): (16,256) 11.45 ms, (32,256) 9.39,
# (64,256) 11.26, pre-double-buffer (16,256) was 18.2
TH = int(os.environ.get("RAPIDRAW_WARP_TH", "32"))
TW = int(os.environ.get("RAPIDRAW_WARP_TW", "256"))
MAX_SPAN = 128  # fall back to the exact path past this per-tile span
_SENTINEL = -1e6


@dataclass(frozen=True)
class _PassStatic:
    span: int  # shift-select loop length
    band: int  # DMA band size along the resample axis (TH|TW + span + 1)
    pad_lo: int  # zero padding before the source along the resample axis
    extent: int  # total padded source extent along the resample axis
    nty: int
    ntx: int


@dataclass(frozen=True)
class WarpStatic:
    p: GeometryParams
    h: int
    w: int
    hp: int
    wp: int
    modes: tuple  # per channel-set: (channels tuple, _PassStatic v, _PassStatic h)
    has_post: bool = False  # arrays carry a (h, w) post multiplier


@dataclass
class WarpPlan:
    static: WarpStatic
    # name -> array (device-resident jnp; ~100-600 MB per 24MP plan — see
    # _cached_plan's maxsize). Pass as runtime jit args, NOT closures.
    arrays: dict


@functools.partial(jax.jit, static_argnames=("h", "w", "hp", "wp", "lens_model", "mode"))
def _invert_stage(vals, tca_v, h, w, hp, wp, lens_model, mode):
    """Jitted planner core: evaluate the map, Newton-invert each row, and
    produce the two passes' coordinate fields. Geometry values are traced
    INPUTS, so this compiles once per image shape — not per slider value.
    """
    from rapidraw_tpu.geometry.warp import source_coords_values

    cx, cy = w / 2.0, h / 2.0
    rows2d = jnp.arange(h, dtype=jnp.float32)[:, None] * jnp.ones((1, w), jnp.float32)
    cols2d = jnp.arange(w, dtype=jnp.float32)[None, :] * jnp.ones((h, 1), jnp.float32)

    def eval_xy(xh):
        sx, sy, zk = source_coords_values(vals, h, w, xh, rows2d, lens_model)
        # TCA channel scale (exact *1.0 no-op for the plain set)
        sx = cx + (sx - cx) * tca_v
        sy = cy + (sy - cy) * tca_v
        return sx, sy, zk

    X, Y, z_ok = eval_xy(cols2d)
    in_frame = (
        z_ok & (X >= 0.0) & (Y >= 0.0) & (X < w - 1.0) & (Y < h - 1.0)
        & jnp.isfinite(X) & jnp.isfinite(Y)
    )
    if mode == "clamp":
        X = jnp.clip(jnp.nan_to_num(X), 0.0, w - 1.0)
        Y = jnp.clip(jnp.nan_to_num(Y), 0.0, h - 1.0)
        valid = jnp.ones((h, w), bool)
    else:
        valid = in_frame
        X = jnp.where(valid, X, 0.0)
        Y = jnp.where(valid, Y, 0.0)
    # fold detection: count only pairs where BOTH pixels land in frame on
    # the RAW (pre-clamp) map — the zeroed out-of-frame band is not a fold
    # (it made small images with a boundary band always fall back), and in
    # clamp mode the border clamp plateaus (diff == 0) are edge sampling,
    # not folds (they rejected every TCA+rotation plan)
    pair_ok = in_frame[:, 1:] & in_frame[:, :-1]
    bad = ((jnp.diff(X, axis=1) <= 0) & pair_ok).sum()
    mono_bad = bad / jnp.maximum(pair_ok.sum(), 1)

    # per-row inversion, Newton on the ANALYTIC map: find xhat with
    # X(y, xhat) = c, then Yv(y, c) = Y(y, xhat)
    slope = eval_xy(cols2d + 0.5)[0] - eval_xy(cols2d - 0.5)[0]
    slope = jnp.where(jnp.abs(slope) > 0.05, slope, 0.05)
    xhat = cols2d
    for _ in range(8):
        xhat = xhat - (eval_xy(xhat)[0] - cols2d) / slope
    Yv = eval_xy(xhat)[1]

    # two-pass quality limit: the vertical-pass shear |dYv/dx| bounds the
    # bottleneck error of the Catmull-Smith decomposition (≈ sin of the
    # rotation angle). Measured: 0.5 shear -> ~5e-3 max error on smooth
    # data, 0.98 (80°) -> ~0.1; plan_warp rejects past 0.55.
    shear = jnp.max(jnp.where(pair_ok, jnp.abs(jnp.diff(Yv, axis=1)), 0.0))

    def padded(a, fill):
        return jnp.pad(a, ((0, hp - h), (0, wp - w)), constant_values=fill)

    # vertical coords: always clamped-sample (invalidity is carried by the
    # horizontal pass so tmp stays finite where X points)
    coord_v = padded(jnp.clip(jnp.nan_to_num(Yv), 0.0, h - 1.0), _SENTINEL)
    x_for_h = jnp.where(valid, X, _SENTINEL) if mode == "zero" else X
    coord_h_t = padded(x_for_h, _SENTINEL).T
    return coord_v, coord_h_t, mono_bad, shear


@functools.partial(jax.jit, static_argnames=("h", "w", "lens_model", "has_vig"))
def _post_stage(vals, vig, h, w, lens_model, has_vig):
    """(h, w) post multiplier: z_ok gate x lens-vignette gain, both pure
    functions of the geometry — baked into the plan so warp_with_plan does
    not re-derive the full-res coordinate field eagerly per frame
    (apply_lens_vignette semantics, geometry/warp.py:329-336)."""
    from rapidraw_tpu.geometry.warp import source_coords_values

    rows2d = jnp.arange(h, dtype=jnp.float32)[:, None] * jnp.ones((1, w), jnp.float32)
    cols2d = jnp.arange(w, dtype=jnp.float32)[None, :] * jnp.ones((h, 1), jnp.float32)
    src_x, src_y, z_ok = source_coords_values(vals, h, w, cols2d, rows2d, lens_model)
    post = z_ok.astype(jnp.float32)
    if has_vig:
        cx, cy = w / 2.0, h / 2.0
        half_diag2 = cx * cx + cy * cy
        dx = src_x - cx
        dy = src_y - cy
        ru_norm2 = (dx * dx + dy * dy) / half_diag2
        v = 1.0 + vig["k1"] * ru_norm2 + vig["k2"] * ru_norm2**2 + vig["k3"] * ru_norm2**3
        gain = 1.0 + (1.0 / jnp.where(v > 1e-6, v, 1.0) - 1.0) * vig["amt"]
        post = post * jnp.where(v > 1e-6, gain, 1.0)
    return post


# bases are planned at HALF-tile (TW/2-lane) granularity: two independent
# DMA bases per output tile halve the in-tile span (the k-loop length)
# without doubling the grid — narrower whole tiles measured slower from
# per-tile overhead ((16,128): 24.6 ms vs (16,256): 23.5 ms).
TWH = TW // 2


@jax.jit
def _tile_minmax_j(coord):
    hp, wp = coord.shape
    nty, nhx = hp // TH, wp // TWH
    axis = jnp.arange(hp, dtype=jnp.float32)[:, None]
    valid = coord > _SENTINEL / 2
    big = jnp.where(valid, coord - axis, jnp.inf)
    small = jnp.where(valid, coord - axis, -jnp.inf)
    return (
        big.reshape(nty, TH, nhx, TWH).min(axis=(1, 3)),
        small.reshape(nty, TH, nhx, TWH).max(axis=(1, 3)),
        valid.any(),
    )


@jax.jit
def _emap_j(coord, bases_f32, pad_lo):
    hp, wp = coord.shape
    nty, nhx = hp // TH, wp // TWH
    in_tile = (jnp.arange(hp, dtype=jnp.int32) % TH).astype(jnp.float32)[:, None]
    valid = coord > _SENTINEL / 2
    rep = jnp.repeat(jnp.repeat(bases_f32, TH, axis=0), TWH, axis=1)
    e = jnp.where(valid, coord + pad_lo - rep - in_tile, _SENTINEL)
    emin = jnp.min(jnp.where(valid, e, jnp.inf))
    emax = jnp.max(jnp.where(valid, e, -jnp.inf))
    # per-half-tile local e maximum -> the kernel's dynamic k-loop bound
    e_t = jnp.where(valid, e, -jnp.inf).reshape(nty, TH, nhx, TWH)
    emax_t = e_t.max(axis=(1, 3))
    return e, emin, emax, emax_t


def _plan_pass(coord, nty: int, ntx: int):
    """Plan one VERTICAL (row-axis) resample pass — the horizontal pass
    reuses this on the transposed image, so DMA offsets only ever need the
    sublane (8-row) alignment Mosaic can slice at.

    coord: (hp, wp) absolute source ROW coordinate per output pixel;
    `_SENTINEL` marks pixels that must come out black. Returns
    (e_local f32, bases i32 flat, _PassStatic) or None when the in-tile
    span exceeds MAX_SPAN.

    Scheme: for each output tile, base = floor(min displacement) rounded
    DOWN to a multiple of 8 (Mosaic sublane alignment) so the per-pixel
    local offset e = coord + pad - base - in_tile lands in [0, span). The
    source is zero-padded by exactly the amount needed for every base to
    be >= 0 (padding rows are never selected by the e-match).
    """
    t_min, t_max, any_valid = _tile_minmax_j(coord)  # (nty, 2*ntx) halves
    if not bool(any_valid):
        return None
    dmin = np.asarray(t_min, np.float64)
    dmax = np.asarray(t_max, np.float64)
    empty = ~np.isfinite(dmin)
    dmin = np.where(empty, 0.0, dmin)
    dmax = np.where(empty, 0.0, dmax)

    # 8-aligned bases: quantization adds up to 7 to the span
    span = int(np.max(np.ceil(dmax) - np.floor(dmin))) + 1 + 7
    if span > MAX_SPAN:
        return None

    first = (np.arange(nty) * TH)[:, None]
    base_unc = (np.floor(first + dmin).astype(np.int64) // 8) * 8
    pad_lo = int(max(0, -base_unc.min()))
    pad_lo = -(-pad_lo // 8) * 8
    bases = base_unc + pad_lo
    # the dynamic k-loop reads blk rows [g*8, g*8+TH+8) for g*8 <= emax+1
    # <= span: size the band for the worst case
    band = -(-(TH + span + 9) // 8) * 8
    extent = int(bases.max()) + band

    e, emin, emax, emax_t = _emap_j(
        coord, jnp.asarray(bases, jnp.float32), float(pad_lo)
    )
    emin, emax = float(emin), float(emax)
    assert emin >= 0.0 and emax < span, (emin, emax, span)
    # per-half-tile trip count for the kernel's dynamic shift-select loop:
    # masks are nonzero only for k <= ceil(emax_local)+1, so interior tiles
    # scan ~1-2 8-groups while only worst-case tiles scan span/8 (the base
    # normalization makes the local minimum land in [0, 8))
    et = np.asarray(emax_t, np.float64)
    et = np.where(np.isfinite(et), et, 0.0)
    n_groups = (np.floor(np.ceil(et) + 1.0) // 8 + 1).astype(np.int32)
    return (
        e,
        # store base/8: the kernel multiplies back so Mosaic can PROVE the
        # dynamic DMA start is sublane-aligned (a raw SMEM scalar can't be)
        jnp.asarray((bases // 8).astype(np.int32).reshape(-1)),
        jnp.asarray(n_groups.reshape(-1)),
        _PassStatic(span=span, band=band, pad_lo=pad_lo, extent=extent,
                    nty=nty, ntx=ntx),
    )


def plan_warp(p: GeometryParams, h: int, w: int) -> WarpPlan | None:
    """Host-side planner (cache via _cached_plan). None => use exact path."""
    # both dims padded to 256: each is a lane dim (TW) in one pass and a
    # row dim (TH | 16) in the other (the horizontal pass runs transposed)
    hp = -(-h // 256) * 256
    wp = -(-w // 256) * 256
    nty, ntx = hp // TH, wp // TW
    from rapidraw_tpu.geometry.warp import geometry_values

    # planner array math runs in JITTED jnp on the accelerator (this host
    # has ONE CPU core — numpy at 24MP costs seconds per op — and eager
    # dispatch over the axon tunnel pays per-op latency). Geometry values
    # are traced inputs: one compile per image shape, shared by all slider
    # values.
    gv = geometry_values(p, h, w)
    vals = {k: jnp.asarray(v) for k, v in gv.items()}

    vr, vb = float(gv["vr"]), float(gv["vb"])
    has_tca = p.lens_tca_enabled and (abs(vr - 1.0) > 1e-5 or abs(vb - 1.0) > 1e-5)
    if has_tca:
        sets = [((0,), "clamp", vr), ((1,), "clamp", 1.0), ((2,), "clamp", vb)]
    else:
        sets = [((0, 1, 2), "zero", 1.0)]

    arrays: dict = {}
    modes = []
    for si, (channels, mode, tca_v) in enumerate(sets):
        coord_v, coord_h_t, mono_bad, shear = _invert_stage(
            vals, jnp.float32(tca_v), h, w, hp, wp, p.lens_model, mode
        )
        if float(mono_bad) > 0.01:
            return None  # folded map (strong perspective) — exact path
        if float(shear) > 0.55:
            return None  # past the two-pass quality envelope — exact path

        v = _plan_pass(coord_v, nty, ntx)
        if v is None:
            return None
        ev, bases_v, ng_v, vstat = v
        # horizontal pass runs on the TRANSPOSED intermediate (rows are the
        # original columns), so it shares the row-axis kernel and its
        # 8-row DMA alignment
        hplan = _plan_pass(coord_h_t, wp // TH, hp // TW)
        if hplan is None:
            return None
        eh, bases_h, ng_h, hstat = hplan

        arrays[f"ev{si}"] = ev
        arrays[f"bv{si}"] = bases_v
        arrays[f"gv{si}"] = ng_v
        arrays[f"eh{si}"] = eh
        arrays[f"bh{si}"] = bases_h
        arrays[f"gh{si}"] = ng_h
        modes.append((tuple(channels), vstat, hstat))

    # z_ok gate / lens-vignette gain, baked once per plan (see _post_stage)
    lens_vig_amt = p.lens_vignette_amount * 0.8
    has_vig = (
        p.lens_vignette_enabled
        and (abs(p.vig_k1) > 1e-6 or abs(p.vig_k2) > 1e-6 or abs(p.vig_k3) > 1e-6)
        and lens_vig_amt > 0.01
    )
    has_persp = (
        abs(float(gv["inv"][2, 0])) > 0.0
        or abs(float(gv["inv"][2, 1])) > 0.0
        or abs(float(gv["inv"][2, 2])) <= 1e-6  # z_ok false everywhere
    )
    has_post = has_vig or has_persp
    if has_post:
        vig = {
            "k1": jnp.float32(p.vig_k1), "k2": jnp.float32(p.vig_k2),
            "k3": jnp.float32(p.vig_k3), "amt": jnp.float32(lens_vig_amt),
        }
        arrays["post"] = _post_stage(vals, vig, h, w, p.lens_model, has_vig)

    return WarpPlan(
        static=WarpStatic(p=p, h=h, w=w, hp=hp, wp=wp, modes=tuple(modes),
                          has_post=has_post),
        arrays=arrays,
    )


def _interpret() -> bool:
    return jax.devices()[0].platform != "tpu"


def _resample_rows(img: jnp.ndarray, e_arr: jnp.ndarray, bases: jnp.ndarray,
                   groups: jnp.ndarray, st: _PassStatic) -> jnp.ndarray:
    """Row-axis shift-select resample over (C, R, L) planar data:
    out[c, r, x] = lerp of img rows at e[r, x] + base(tile) (+ its own row).

    The horizontal pass calls this on the transposed image — one kernel,
    and DMA offsets only ever need Mosaic's 8-row sublane alignment
    (bases are planned 8-aligned; lane starts are the static j*TW).

    The select loop's trip count is DYNAMIC per half-tile (`groups`, the
    planner's per-tile 8-group count): the global span is set by worst-case
    corner tiles (lens distortion gradients), while interior tiles only
    need 1-2 groups — a fori_loop over 8-aligned row blocks cuts the k-loop
    work ~3-4x vs a static span-length unroll.
    """
    c = img.shape[0]
    band, span = st.band, st.span
    pad_hi = max(0, st.extent - st.pad_lo - img.shape[1])
    img = jnp.pad(img, ((0, 0), (st.pad_lo, pad_hi), (0, 0)))

    total = st.nty * st.ntx

    def kernel(b_ref, g_ref, e_ref, img_ref, out_ref, scr0, scr1, sems):
        i = pl.program_id(0)
        j = pl.program_id(1)
        t = i * st.ntx + j
        slot = jax.lax.rem(t, 2)

        # two half-tile DMAs with independent 8-aligned bases (the in-half
        # span is ~half the whole-tile span), DOUBLE-BUFFERED across grid
        # steps: tile t+1's copies are issued before tile t is processed,
        # hiding the per-tile DMA latency that dominated the fixed cost
        # (measured 6.3 ms floor at a 1-group select loop).
        def copies(tt, sl):
            jj = jax.lax.rem(tt, st.ntx)
            base0 = b_ref[tt * 2] * 8
            base1 = b_ref[tt * 2 + 1] * 8
            return (
                pltpu.make_async_copy(
                    img_ref.at[:, pl.ds(base0, band), pl.ds(jj * TW, TWH)],
                    scr0.at[sl], sems.at[sl, 0],
                ),
                pltpu.make_async_copy(
                    img_ref.at[:, pl.ds(base1, band), pl.ds(jj * TW + TWH, TWH)],
                    scr1.at[sl], sems.at[sl, 1],
                ),
            )

        @pl.when(t == 0)
        def _():
            for cp in copies(t, slot):
                cp.start()

        @pl.when(t + 1 < total)
        def _():
            for cp in copies(t + 1, jax.lax.rem(t + 1, 2)):
                cp.start()

        for cp in copies(t, slot):
            cp.wait()

        bi = t * 2
        for half, scr in ((0, scr0), (1, scr1)):
            e = e_ref[:, half * TWH : (half + 1) * TWH]
            e0 = jnp.floor(e)
            frac = (e - e0)[None]
            e0i = e0.astype(jnp.int32)

            # two-accumulator select over dynamic 8-groups: within a group
            # the hi slice of step k IS the lo slice of step k+1, and the
            # boundary mask is carried across groups; masks for k past the
            # local maximum are all-zero, so the early exit is exact
            def group(g, carry):
                s0, s1, m_prev = carry
                blk = scr[slot, :, pl.ds(g * 8, TH + 8), :]
                for kk in range(8):
                    sl = blk[:, kk : kk + TH, :]
                    m = (e0i == g * 8 + kk).astype(jnp.float32)[None]
                    s0 = s0 + m * sl
                    s1 = s1 + m_prev * sl
                    m_prev = m
                return s0, s1, m_prev

            # n_g covers k = ceil(local emax)+1 inside the loop (planner
            # guarantee), so the carried boundary mask is zero on exit and
            # no tail step is needed
            z = jnp.zeros((c, TH, TWH), jnp.float32)
            n_g = g_ref[bi + half]
            s0, s1, _ = jax.lax.fori_loop(
                0, n_g, group, (z, z, jnp.zeros((1, TH, TWH), jnp.float32))
            )
            out_ref[:, :, half * TWH : (half + 1) * TWH] = s0 + frac * (s1 - s0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(st.nty, st.ntx),
        in_specs=[
            pl.BlockSpec((TH, TW), lambda i, j, b, g: (i, j)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((c, TH, TW), lambda i, j, b, g: (0, i, j)),
        scratch_shapes=[
            pltpu.VMEM((2, c, band, TWH), jnp.float32),
            pltpu.VMEM((2, c, band, TWH), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((c, st.nty * TH, st.ntx * TW), jnp.float32),
        interpret=_interpret(),
    )(bases, groups, e_arr, img)


def warp_with_plan(image: jnp.ndarray, arrays: dict, static: WarpStatic) -> jnp.ndarray:
    """Apply a planned two-pass warp to (3, H, W) or a batch (B, 3, H, W).

    `arrays` must be passed as runtime jit arguments (they are (H, W)-sized
    — closing over them would bake ~100 MB constants into the executable
    and blow the remote-compile payload). Batches fold into the kernel's
    leading (channel) axis — do NOT vmap this function: a batched
    pallas_call over an ANY-memory-space operand fails Mosaic lowering.
    """
    batched = image.ndim == 4
    imgs = image if batched else image[None]
    b = imgs.shape[0]
    p, h, w, hp, wp = static.p, static.h, static.w, static.hp, static.wp
    imgs = jnp.pad(imgs, ((0, 0), (0, 0), (0, hp - h), (0, wp - w)))

    outs = []
    order = []
    for si, (channels, vstat, hstat) in enumerate(static.modes):
        part = imgs[:, np.asarray(channels)] if len(channels) < 3 else imgs
        nc = part.shape[1]
        part = part.reshape(b * nc, hp, wp)
        tmp = _resample_rows(part, arrays[f"ev{si}"], arrays[f"bv{si}"],
                             arrays[f"gv{si}"], vstat)
        tmp_t = tmp.transpose(0, 2, 1)  # horizontal pass runs transposed
        res_t = _resample_rows(tmp_t, arrays[f"eh{si}"], arrays[f"bh{si}"],
                               arrays[f"gh{si}"], hstat)
        outs.append(res_t.transpose(0, 2, 1).reshape(b, nc, hp, wp))
        order.extend(channels)
    out = jnp.concatenate(outs, axis=1)
    if order != [0, 1, 2]:
        out = out[:, np.argsort(order)]
    out = out[:, :, :h, :w]

    if static.has_post:
        # plan-baked z_ok gate x vignette gain (z_ok is exactly 0/1, so the
        # product reproduces where(z_ok, out * gain, 0) bit-for-bit)
        out = out * arrays["post"]
    return out if batched else out[0]


@functools.lru_cache(maxsize=4)
def _cached_plan(p: GeometryParams, h: int, w: int):
    # a 24MP plan holds ~200 MB (plain) to ~600 MB (TCA) of device-resident
    # e-maps; 4 slider positions is the HBM-safe working set (the reference
    # analog, the geometry cache, caps at 30 CPU-side entries —
    # file_management.rs:1216-1219)
    return plan_warp(p, h, w)


def warp_image_fast(image: jnp.ndarray, p: GeometryParams) -> jnp.ndarray:
    """Drop-in fast warp: planned two-pass on TPU, exact path fallback.

    Call OUTSIDE jit (eager), or thread plan arrays as jit arguments via
    plan_warp/warp_with_plan yourself.
    """
    _, h, w = image.shape
    plan = _cached_plan(p, int(h), int(w))
    if plan is None:
        return warp_image_geometry(image, p)
    arrays = {k: jnp.asarray(v) for k, v in plan.arrays.items()}
    return warp_with_plan(image, arrays, plan.static)
