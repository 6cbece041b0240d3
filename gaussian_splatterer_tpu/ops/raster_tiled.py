"""Fast tiled differentiable rasterizer: Pallas TPU compositing kernels.

TPU-native replacement for the INRIA ``CudaRasterizer::Rasterizer::forward/
backward`` pair the reference links against (call sites
src/Trainer.cu:334-412).  Pipeline:

  project_splat_components (dense jnp, transforms.py)
    -> bin_splats  (depth sort + stable tile sort + work list, binning.py)
    -> feature gather (differentiable; its transpose is the scatter-add that
       accumulates duplicate gradients back per-splat)
    -> Pallas compositing kernel over a 1-D work list of (tile, chunk) items
       with scalar-prefetched block indices — the TPU analog of the CUDA
       per-tile loop, with the sequential front-to-back product replaced by
       log-shift (roll-ladder) cumulative sums along the 128-lane axis.

Compositing math (identical to the oracle, ops/raster_reference.py):
    T_k = prod_{j<k} (1 - a_j);  out = sum_k c_k a_k T_k + bg * T_final
with INRIA masking: skip when power > 0 or alpha < 1/255, clamp alpha at
0.99, and permanently terminate a pixel when T would drop below 1e-4.

The backward pass is an analytic forward-order replay (no per-splat state
saved):  with S_k = sum_{j>k} c_j a_j T_j = C_total - C_{<=k},
    dL/dc_k     = g * a_k T_k
    dL/da_k     = sum_ch g_ch (c_k T_k - S_k/(1-a_k)) - g_T T_N/(1-a_k)
then chain to opacity / conic / mean2d.

TRAIN-PATH WINDOWING (round 3): the fused train kernel processes each
tile's duplicate segment in ceil(seg/chunk) WINDOWS that start at the
tile's own tile_start, not at global chunk-aligned block boundaries.  The
kernel assembles each window from the two covering aligned feature blocks
with one dynamic lane roll (trivial on a (9, chunk) block), and splits the
window's gradient slab back onto those blocks (pre-rolled + masked lo/hi
pair, segment-summed outside).  Before windowing, a tile whose segment
merely straddled a block boundary cost 4 work items (2 chunks x 2 passes)
instead of 1 fused item — ~64% of tiles at the headline 50k/1024^2 scene,
~2.7x the (pixel, splat) pair work.  The dense duplicate buffer, sorts,
gathers, and the scatter-free per-splat gradient reduction are unchanged;
jax.vjp through the projection finishes the chain to the model
parameters.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gaussian_splatterer_tpu.ops.binning import (
    TileBins,
    bin_splats,
    emit_capacity,
    work_capacity,
)
from gaussian_splatterer_tpu.ops.transforms import (
    ALPHA_MAX,
    ALPHA_MIN,
    T_EPS,
    project_splat_components,
)

# feature row layout in the packed (16, D) array
_F_MX, _F_MY, _F_CA, _F_CB, _F_CC, _F_CR, _F_CG, _F_CB2, _F_OP = range(9)
_F_ROWS = 16  # padded to a full sublane tile
_F_ROWS_T = 9  # train path: Mosaic allows a block dim EQUAL to the array
# dim (no 8-divisibility pad), so feature/gradient-slab HBM traffic stays
# at the true 9 rows instead of 16 (-44%)
_C_ROWS = 8  # channel-major truth/residual tiles: (T, 8, P) with rgb in
# rows 0-2 (truth) / rgb+t_final in rows 0-3 (residual).  Pixel-minor
# (T, P, 3/4) layouts are POISON at scale: XLA materializes them tiled
# T(8,128), padding the 3/4-wide minor dim to 128 lanes — a measured 42.7x
# expansion (8 GB for 16 frames of 1024^2 truth tiles, HBM OOM at 16.7 G).
# With P on lanes and 8 channel sublanes the tiled layout is exactly dense.


# Perf-ablation switches (scripts/kernel_ablate.py): comma-separated set in
# GSPLAT_ABLATE replaces a kernel stage with a cheap stand-in to attribute
# runtime.  NUMERICALLY WRONG — timing experiments only, never training.
_ABLATE = frozenset(
    filter(None, os.environ.get("GSPLAT_ABLATE", "").split(","))
)


def _exp_v(x: jax.Array, fast: bool = False) -> jax.Array:
    if "exp" in _ABLATE:
        return x
    if not fast:
        return jnp.exp(x)
    # exp(x) = 2^k * 2^r with t = x*log2(e), k = floor(t), r = t - k:
    # 2^r by a degree-4 polynomial (max rel err ~2e-7 on [0,1]), 2^k by
    # assembling the float exponent bits directly.  ~30% fewer VPU ops
    # than the library exp; inputs here are always <= 0 (gaussian
    # exponents / log-transmittances) and the k < -126 underflow clamps
    # to 0, which the alpha/transmittance cutoffs mask anyway.
    t = x * 1.4426950408889634
    k = jnp.floor(t)
    r = t - k
    p = 1.00000728 + r * (
        0.692931289
        + r * (0.241710262 + r * (0.0516668774 + r * 0.0136765311))
    )
    ki = jnp.clip(k.astype(jnp.int32) + 127, 0, 255) << 23
    return p * jax.lax.bitcast_convert_type(ki, jnp.float32)


def _log1p_neg(a: jax.Array) -> jax.Array:
    return -a if "log" in _ABLATE else jnp.log1p(-a)


def _should_interpret() -> bool:
    try:
        return jax.devices()[0].platform != "tpu"
    except RuntimeError:  # no backend at all
        return True


def _upper_tri(chunk: int) -> jax.Array:
    """(chunk, chunk) upper-triangular ones (incl. diagonal): x @ U = cumsum."""
    r = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
    return (r <= c).astype(jnp.float32)


def _cumsum_lanes(x: jax.Array, bf16: bool = False) -> jax.Array:
    """Inclusive cumulative sum along the last (lane) axis as a triangular
    matmul.  Measured FASTER than a pltpu.roll log-shift ladder for the f32
    transmittance sums: the MXU matmul overlaps with the kernel's VPU work
    while lane-rotates contend for the vector unit.  (jnp.cumsum does not
    lower in Pallas TPU.)

    bf16=True casts the operands to bfloat16 explicitly (f32 MXU
    accumulation either way).  MEASURED (prec probe, round 3): inside
    Pallas a default-precision f32 dot lowers to a SINGLE bf16 MXU pass
    anyway, so on TPU both paths are bit-identical; the flag only changes
    interpret-mode (CPU) numerics and documents the intended contract.
    With a 0/1 triangular matrix the products are exact, so the only
    error is the one-time bf16 rounding of each INPUT element: |err| <=
    2^-9 relative per summand (~0.2%) — far below the MC noise of the
    truth images the train path consumes, and the source of the measured
    ~5e-3 on-chip forward deviation the bench numerics gate allows.
    precision=HIGHEST here would cost ~30% kernel time for ~1e-6 parity
    (PERF.md); training does not need it."""
    if "cumsum" in _ABLATE:
        return x
    dt = jnp.bfloat16 if bf16 else jnp.float32
    return jnp.dot(
        x.astype(dt),
        _upper_tri(x.shape[-1]).astype(dt),
        preferred_element_type=jnp.float32,
    )


def _chunk_state(feat_ref, t, in_range, tile: int, tx_tiles: int, chunk: int,
                 fexp: bool = False, mm_power: bool = False):
    """Shared forward replay for one (tile, chunk) work item.

    ``feat_ref`` may be a VMEM ref or an assembled (rows, chunk) array
    (the window kernel assembles its feature window from two aligned
    blocks first); ``in_range`` is the caller-computed (1, chunk) mask of
    columns that belong to this tile's duplicate segment.

    Returns per-(pixel, splat) tensors of shape (P, chunk).

    ``mm_power=True`` evaluates the Gaussian exponent as ONE (P, 8) x
    (8, C) MXU matmul instead of ~10 VPU ops per (pixel, splat) pair:
    power is a quadratic in the pixel coordinates, so expanding it over
    the per-tile polynomial basis [x^2, xy, y^2, x, y, 1] (TILE-LOCAL
    coordinates — in global coordinates the expansion cancels
    catastrophically in f32) with per-splat coefficient rows folds the
    whole evaluation onto the MXU, which this kernel's VPU-bound items
    have to spare.  Expansion rounding is ~|coef| * 2^-23 in the exponent
    (worst case ~1e-3 for sub-pixel splats) — train-path only; serve and
    parity paths keep the exact two-difference form."""
    f32 = jnp.float32
    p_count = tile * tile
    ox = (t % tx_tiles) * tile
    oy = (t // tx_tiles) * tile

    mx = feat_ref[_F_MX : _F_MX + 1, :]
    my = feat_ref[_F_MY : _F_MY + 1, :]
    ca = feat_ref[_F_CA : _F_CA + 1, :]
    cb = feat_ref[_F_CB : _F_CB + 1, :]
    cc = feat_ref[_F_CC : _F_CC + 1, :]
    op = feat_ref[_F_OP : _F_OP + 1, :]

    p = jax.lax.broadcasted_iota(jnp.int32, (p_count, 1), 0)
    if mm_power:
        pxl = (p % tile).astype(f32)  # tile-local pixel coords
        pyl = (p // tile).astype(f32)
        mxl = mx - ox.astype(f32)  # (1, C) tile-local splat centers
        myl = my - oy.astype(f32)
        coef = jnp.concatenate(
            [
                -0.5 * ca,
                -cb,
                -0.5 * cc,
                ca * mxl + cb * myl,
                cc * myl + cb * mxl,
                -0.5 * (ca * mxl * mxl + cc * myl * myl) - cb * mxl * myl,
                jnp.zeros((2, chunk), f32),
            ],
            axis=0,
        )  # (8, C) — padded to a full sublane tile
        ones_p = jnp.ones((p_count, 1), f32)
        basis = jnp.concatenate(
            [pxl * pxl, pxl * pyl, pyl * pyl, pxl, pyl, ones_p,
             jnp.zeros((p_count, 2), f32)],
            axis=1,
        )  # (P, 8)
        # precision=HIGHEST is REQUIRED: Pallas lowers default-precision
        # f32 dots as a single bf16 MXU pass (measured; BENCH_r02's gate
        # caught residuals off by 1.0), and single-pass bf16 destroys the
        # cancellation between the quadratic terms.
        # the exact two-difference power is <= 0 everywhere (PSD conic);
        # expansion rounding (~|coef| * 2^-23) must not push a splat's
        # brightest pixel to +eps and trip the `power <= 0` contrib gate
        # into dropping its full alpha
        power = jnp.minimum(
            jnp.dot(basis, coef, preferred_element_type=f32,
                    precision=jax.lax.Precision.HIGHEST),
            0.0,
        )
        dx = dy = None
    else:
        px = (ox + p % tile).astype(f32)
        py = (oy + p // tile).astype(f32)
        dx = px - mx  # (P, chunk)
        dy = py - my
        power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    expp = _exp_v(power, fexp)
    alpha_raw = op * expp
    alpha = jnp.minimum(ALPHA_MAX, alpha_raw)
    contrib = (power <= 0.0) & (alpha >= ALPHA_MIN) & in_range
    a = jnp.where(contrib, alpha, 0.0)
    return a, contrib, alpha_raw, expp, dx, dy, (ca, cb, cc)


def _mm_t(lhs: jax.Array, rhs: jax.Array) -> jax.Array:
    """(K, P) x (P, C) -> (K, C) via dot_general contracting the SHARED
    leading P axis of a (P, K) lhs — the MXU takes the transpose as a
    dimension-numbers flag, so no XLU relayout of the (P, K) column data."""
    return jax.lax.dot_general(
        lhs, rhs, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _grad_rows_moments(
    weight, d_alpha, alpha_raw, op, mx, my, ca, cb, cc,
    g_r, g_g, g_b, t, tile: int, tx_tiles: int,
):
    """The nine per-splat gradient rows of one chunk as TWO small MXU
    matmuls instead of ~20 full (P, C) VPU passes.

    Every geometry gradient is a pixel sum of d_power times a quadratic in
    (dx, dy), and dx = px - mx is SEPARABLE, so all five collapse into six
    moments  S = B @ d_power  with B the (6, P) basis [1, x, x^2, y, y^2,
    xy] in TILE-LOCAL coordinates (local x keeps |x| < tile — in global
    pixel coordinates the mx-shift subtractions below would cancel
    catastrophically).  Colors are likewise one (3, P) x (P, C) matmul.
    The moment matmul runs at precision=HIGHEST: Pallas lowers default-
    precision f32 dots as ONE bf16 MXU pass (measured — NOT the chained-
    bf16 "f32" passes XLA documents for jnp ops), and that input rounding
    amplifies through the shift subtractions by the (tile / splat
    extent)^2 condition number — measured 57% relative error on scale/
    rotation gradients at the bench gate scene before the fix.  Cost is
    negligible: even at ~6 passes the matmul is ~6/128 of one compositing
    cumsum.  The color matmul has no cancellation (0.2% bf16 rounding on
    color gradients only), so it stays on the fast single-pass path."""
    f32 = jnp.float32
    p_count = tile * tile
    d_power = d_alpha * alpha_raw
    pi = jax.lax.broadcasted_iota(jnp.int32, (1, p_count), 1)
    lx = (pi % tile).astype(f32)
    ly = (pi // tile).astype(f32)
    basis = jnp.concatenate(
        [jnp.ones((1, p_count), f32), lx, lx * lx, ly, ly * ly, lx * ly],
        axis=0,
    )  # (6, P)
    s = jnp.dot(
        basis, d_power, preferred_element_type=f32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (6, C)
    s0, sx, sxx, sy, syy, sxy = (s[k : k + 1, :] for k in range(6))

    ox = ((t % tx_tiles) * tile).astype(f32)
    oy = ((t // tx_tiles) * tile).astype(f32)
    mxl = mx - ox  # (1, C) tile-local splat centers
    myl = my - oy
    dx_m = sx - mxl * s0
    dy_m = sy - myl * s0
    d_ca = -0.5 * (sxx - 2.0 * mxl * sx + mxl * mxl * s0)
    d_cc = -0.5 * (syy - 2.0 * myl * sy + myl * myl * s0)
    d_cb = -(sxy - mxl * sy - myl * sx + mxl * myl * s0)
    d_mx = ca * dx_m + cb * dy_m
    d_my = cc * dy_m + cb * dx_m
    # sum d_alpha*expp == sum(d_power)/op exactly (op is constant per lane)
    d_op = s0 * jnp.where(op > 1e-20, 1.0 / jnp.maximum(op, 1e-20), 0.0)

    g3 = jnp.concatenate([g_r, g_g, g_b], axis=1)  # (P, 3) columns
    d_c3 = _mm_t(g3, weight)  # (3, C): [d_cr; d_cg; d_cb2]
    return jnp.concatenate(
        [d_mx, d_my, d_ca, d_cb, d_cc, d_c3, d_op], axis=0
    )  # (9, C)


def _composite_chunk(a, t_in, alive, bf16: bool = False, fexp: bool = False):
    """Front-to-back compositing of one chunk given entry transmittance.

    Returns (weight, t_k, a_eff, keep, t_out, alive_out):
      weight (P,C) = a_eff * T at each splat;  t_k (P,C) transmittance at k.

    ONE cumsum suffices (the kernel is MXU-bound on these triangular
    matmuls; this replaced a 3-cumsum formulation for a ~57% FLOP cut):
    the INRIA early-termination test at splat k is T_k*(1-a_k) >= eps with
    T monotone non-increasing, so the first failure terminates the pixel
    permanently and ``keep`` is a PREFIX mask — computable directly from
    the raw inclusive prefix T without a trigger-prefix cumsum.  On the
    kept prefix raw == effective transmittance, so weights use the raw
    prefix too, and the effective carry-out T is the raw T at the last
    kept splat — a cheap lane-min instead of a second log-cumsum."""
    logs = _log1p_neg(a)
    cum_excl = _cumsum_lanes(logs, bf16) - logs
    t_excl = t_in * _exp_v(cum_excl, fexp)
    # t_incl = t_in * exp(cum_incl) algebraically; one exp + one multiply —
    # exp is the kernel's hottest VPU op, one (P, C) exp saved per item
    t_incl = t_excl * (1.0 - a)
    keep = (t_incl >= T_EPS) & (alive > 0.0)
    a_eff = jnp.where(keep, a, 0.0)
    weight = a_eff * t_excl
    # terminal T: raw T at the last kept splat (t_in when none kept)
    t_out = jnp.min(jnp.where(keep, t_incl, t_in), axis=1, keepdims=True)
    alive_out = alive * (t_incl[:, -1:] >= T_EPS).astype(jnp.float32)
    return weight, t_excl, a_eff, keep, t_out, alive_out


def _fwd_kernel(
    work_tile,
    work_block,
    is_first,
    is_last,
    is_pad,
    block_first,
    tstart_arr,
    tend_arr,
    feat_ref,
    out_ref,
    acc,
    *,
    tile: int,
    tx_tiles: int,
    chunk: int,
):
    w = pl.program_id(0)
    t = work_tile[w]
    blk = work_block[w]
    p_count = tile * tile

    # padding items (w_cap is a worst-case bound, typically ~1/3 slack) skip
    # all compute; their out block repeats the final tile's and never flushes
    # new content
    @pl.when(is_pad[w] == 0)
    def _():
        @pl.when(is_first[w] == 1)
        def _():
            acc[:, :] = jnp.zeros((p_count, 8), jnp.float32)
            acc[:, 3:4] = jnp.ones((p_count, 1), jnp.float32)
            acc[:, 4:5] = jnp.ones((p_count, 1), jnp.float32)

        # skip the compositing body for EMPTY tiles (their single item's
        # composite is exactly the C=0/T=1 init — most tiles at real
        # scene coverage) and once every pixel hit the INRIA T < eps
        # cutoff (weight == 0, carries unchanged — exact, same skip as
        # the fused train kernel)
        @pl.when((tstart_arr[t] < tend_arr[t]) & (jnp.max(acc[:, 4]) > 0.0))
        def _():
            li = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
            gidx = blk * chunk + li
            in_range = (gidx >= tstart_arr[t]) & (gidx < tend_arr[t])
            a, _, _, _, _, _, _ = _chunk_state(
                feat_ref, t, in_range, tile, tx_tiles, chunk
            )
            t_in = acc[:, 3:4]
            alive = acc[:, 4:5]
            weight, _, _, _, t_out, alive_out = _composite_chunk(a, t_in, alive)

            c3 = jnp.concatenate(
                [feat_ref[_F_CR : _F_CR + 1, :],
                 feat_ref[_F_CG : _F_CG + 1, :],
                 feat_ref[_F_CB2 : _F_CB2 + 1, :]], axis=0,
            )
            acc[:, 0:3] += jax.lax.dot_general(
                weight, c3, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc[:, 3:4] = t_out
            acc[:, 4:5] = alive_out

        @pl.when(is_last[w] == 1)
        def _():
            out_ref[0] = acc[:, 0:4]


def _bwd_kernel(
    work_tile,
    work_block,
    is_first,
    is_last,
    is_pad,
    block_first,
    tstart_arr,
    tend_arr,
    feat_ref,
    gin_ref,  # (1, P, 4): d color_splat rgb + d t_final
    fwd_ref,  # (1, P, 4): forward color_splat rgb + t_final
    dfeat_ref,  # (1, 16, chunk) per-work-item gradient slab
    acc,
    *,
    tile: int,
    tx_tiles: int,
    chunk: int,
):
    w = pl.program_id(0)
    t = work_tile[w]
    blk = work_block[w]
    p_count = tile * tile

    # pads AND empty tiles write zero slabs and skip the replay body (an
    # empty tile's only item would compute all-masked gradients == 0)
    empty = tstart_arr[t] >= tend_arr[t]

    @pl.when((is_pad[w] == 1) | empty)
    def _():
        dfeat_ref[0] = jnp.zeros((_F_ROWS, chunk), jnp.float32)

    @pl.when((is_pad[w] == 0) & ~empty)
    def _():
        _bwd_body(
            t, blk, is_first[w], tstart_arr[t], tend_arr[t],
            feat_ref, gin_ref, fwd_ref, dfeat_ref, acc,
            tile=tile, tx_tiles=tx_tiles, chunk=chunk,
        )


def _bwd_body(
    t,
    blk,
    first,
    tstart,
    tend,
    feat_ref,
    gin_ref,
    fwd_ref,
    dfeat_ref,
    acc,
    *,
    tile: int,
    tx_tiles: int,
    chunk: int,
):
    p_count = tile * tile

    @pl.when(first == 1)
    def _():
        acc[:, :] = jnp.zeros((p_count, 8), jnp.float32)
        acc[:, 3:4] = jnp.ones((p_count, 1), jnp.float32)
        acc[:, 4:5] = jnp.ones((p_count, 1), jnp.float32)

    li = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
    gidx = blk * chunk + li
    in_range = (gidx >= tstart) & (gidx < tend)
    a, contrib, alpha_raw, expp, dx, dy, (ca, cb, cc) = _chunk_state(
        feat_ref, t, in_range, tile, tx_tiles, chunk
    )
    t_in = acc[:, 3:4]
    alive = acc[:, 4:5]
    weight, t_k, a_eff, keep, t_out, alive_out = _composite_chunk(a, t_in, alive)

    cr = feat_ref[_F_CR : _F_CR + 1, :]
    cg = feat_ref[_F_CG : _F_CG + 1, :]
    cb2 = feat_ref[_F_CB2 : _F_CB2 + 1, :]

    g_r = gin_ref[0, :, 0:1]
    g_g = gin_ref[0, :, 1:2]
    g_b = gin_ref[0, :, 2:3]
    g_t = gin_ref[0, :, 3:4]
    c_tot_r = fwd_ref[0, :, 0:1]
    c_tot_g = fwd_ref[0, :, 1:2]
    c_tot_b = fwd_ref[0, :, 2:3]
    t_n = fwd_ref[0, :, 3:4]

    # S_k = C_total - C_{<=k}; the pixel gradient g is constant per pixel,
    # so sum_ch g_ch S_k,ch collapses the three per-channel cumulative sums
    # into ONE cumsum of g.(weight*c) — the bwd kernel is MXU-bound on
    # these triangular matmuls.  g.C_in is carried in acc col 0.
    gc = g_r * cr + g_g * cg + g_b * cb2  # (P, C): g . c_k
    cum_gwc = _cumsum_lanes(weight * gc)
    g_ctot = g_r * c_tot_r + g_g * c_tot_g + g_b * c_tot_b  # (P, 1)
    g_s = g_ctot - (acc[:, 0:1] + cum_gwc)  # (P, C): g . S_k

    inv1ma = 1.0 / (1.0 - a_eff)
    d_alpha = gc * t_k - (g_s + g_t * t_n) * inv1ma
    grad_mask = keep & contrib & (alpha_raw < ALPHA_MAX)
    d_alpha = jnp.where(grad_mask, d_alpha, 0.0)

    rows9 = _grad_rows_moments(
        weight, d_alpha, alpha_raw,
        feat_ref[_F_OP : _F_OP + 1, :],
        feat_ref[_F_MX : _F_MX + 1, :],
        feat_ref[_F_MY : _F_MY + 1, :],
        ca, cb, cc, g_r, g_g, g_b, t, tile, tx_tiles,
    )
    (d_mx, d_my, d_ca, d_cb, d_cc, d_cr, d_cg, d_cb2, d_op) = (
        rows9[k : k + 1, :] for k in range(9)
    )

    zero_rows = jnp.zeros((_F_ROWS - 9, chunk), jnp.float32)
    dfeat_ref[0] = jnp.concatenate(
        [d_mx, d_my, d_ca, d_cb, d_cc, d_cr, d_cg, d_cb2, d_op, zero_rows],
        axis=0,
    )

    acc[:, 0:1] += cum_gwc[:, -1:]
    acc[:, 3:4] = t_out
    acc[:, 4:5] = alive_out


# work-item flag bits for the fused train kernel (packed into ONE prefetch
# array — scalar-prefetch operands live in SMEM, which is small, and the
# frame-batched path carries frames x work-capacity items).  Layout of the
# packed word:  (global tile id << (_FL_BITS + _NV_BITS))
#             | (window valid-count << _FL_BITS) | flags
_FL_FIRST = 1  # tile's first pass-1 window
_FL_LAST_P1 = 2  # tile's last pass-1 window (residual forms here)
_FL_PASS2 = 4  # gradient-replay pass
_FL_PAD = 8  # padding item: skip all compute
_FL_FUSED = 16  # single-window tile: fwd + residual + bwd in one item
_FL_BITS = 5  # flag field width
_FL_MASK = (1 << _FL_BITS) - 1
_NV_BITS = 9  # window valid-count field (requires chunk <= 256); the
# global tile id rides in the remaining 17 high bits (frame_group *
# num_tiles < 2^17 — checked at launch)
_NV_MASK = (1 << _NV_BITS) - 1
# NOTE (measured dead end): caching pass-1's masked alphas in VMEM scratch
# so the replay pass skips the _chunk_state recompute SLOWED the kernel
# (110.3 -> 119.0 ms/step at K=2/1 MB-per-chunk scratch; K=4 OOM'd the
# 16 MB scoped VMEM) — the recompute overlaps fine with the MXU cumsums,
# while the extra scratch steals double-buffering headroom.


def _assemble_window(featA_ref, featB_ref, r):
    """Gather the (rows, chunk) feature WINDOW starting at dynamic offset
    ``r`` inside aligned block A (continuing into block B): one dynamic
    lane roll over the concatenated pair.  This is what lets every tile's
    windows start at its own tile_start instead of at global block
    boundaries — on a (9, 2*chunk) array the roll is noise next to the
    (P, chunk) pair math it saves."""
    ab = jnp.concatenate([featA_ref[:, :], featB_ref[:, :]], axis=1)
    return pltpu.roll(ab, -r, 1)[:, : featA_ref.shape[1]]


def _emit_window_slabs(dlo_ref, dhi_ref, s9, r, chunk: int):
    """Split a window-coordinate gradient slab back onto its two covering
    ALIGNED blocks: lo gets window columns [0, chunk-r) at block columns
    [r, chunk), hi gets window columns [chunk-r, chunk) at block columns
    [0, r).  Out-of-part columns are zero, so the XLA-side segment_sum
    over (lo, hi) slabs rebuilds the dense per-duplicate gradients
    exactly."""
    zc = jnp.zeros_like(s9)
    sh = chunk - r
    dt = dlo_ref.dtype
    dlo_ref[0] = pltpu.roll(
        jnp.concatenate([zc, s9], axis=1), -sh, 1
    )[:, :chunk].astype(dt)
    dhi_ref[0] = pltpu.roll(
        jnp.concatenate([s9, zc], axis=1), -sh, 1
    )[:, :chunk].astype(dt)


def _train_kernel(
    work_tf,  # (W,) packed (tile << 14) | (nvalid << 5) | _FL_* flags
    work_start,  # (W,) GLOBAL duplicate column of the window start
    slab_pos,  # (W,) compacted out-slot ids (consumed by the out index map)
    featA_ref,  # (rows, chunk) aligned feature block containing the start
    featB_ref,  # (rows, chunk) next aligned block (clamped at the end)
    truth_ref,  # (1, 8, P) channel-major pre-tiled truth for this tile
    bg_ref,  # (F, 4) SMEM per-frame background rgb
    res_ref,  # out (1, 8, P) channel-major: rows [residual rgb, t_final]
    dlo_ref,  # out (1, rows, chunk) gradient slab, low aligned block part
    dhi_ref,  # out (1, rows, chunk) gradient slab, high aligned block part
    acc,  # (P, 8): pass1 C rgb + T + alive; pass2 gC_in + T + alive
    acc2,  # (P, 8): [residual rgb, g_t, g_ctot, t_n]
    *,
    tile: int,
    tx_tiles: int,
    chunk: int,
    tiles_frame: int,
    mm_bf16: bool = False,
    fexp: bool = False,
    mm_power: bool = False,
):
    """Window-fused per-tile forward + residual + backward replay.

    Each work item covers the duplicate WINDOW [w_start, w_start + chunk)
    with w_start = tile_start + c*chunk — windows start at the tile's own
    segment, not at global block boundaries, so the common single-window
    tile is ONE fused item (fwd + residual + gradient replay) regardless
    of how its segment straddles aligned blocks.  The feature window is
    assembled from the two covering aligned blocks by a dynamic lane roll;
    gradient slabs are split back onto those blocks (pre-rolled + masked)
    and segment-summed outside.  Pass 1 composites into acc; at the tile's
    last pass-1 window the signed residual against the truth tile is
    formed IN VMEM and stashed in acc2 (reference semantics
    src/Trainer.cu:33-44); pass 2 replays the windows computing gradient
    slabs.

    Frame-batched operation: ``work_tf`` carries GLOBAL tile ids over a
    (frame, tile) flattening packed with the window valid-count and item
    flags (scalar-prefetch SMEM is the frame-group limiter — see
    max_frame_group); ``tiles_frame`` recovers the in-image tile (pixel
    origin) and the frame (bg row)."""
    w = pl.program_id(0)
    tf = work_tf[w]
    fl = tf & _FL_MASK
    nvalid = (tf >> _FL_BITS) & _NV_MASK
    t = tf >> (_FL_BITS + _NV_BITS)
    t_img = t % tiles_frame
    frame = t // tiles_frame
    r = work_start[w] % chunk  # dynamic window shift inside block A
    p_count = tile * tile
    li = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
    in_range = li < nvalid

    # NOTE: pad and pass-1 items do NOT write their gradient slabs — their
    # slab_pos routes to the dump slot, which the segment_sum drops, so
    # whatever the revolving out buffers hold is discarded unread.

    @pl.when(((fl & (_FL_PAD | _FL_FUSED)) == _FL_FUSED) & (nvalid == 0))
    def _():
        # EMPTY tile (fused item, zero in-range duplicates): the composite
        # is exactly C = 0 / T = 1, so skip the entire window body —
        # residual = truth - bg, zero gradient slabs (the slab slot is a
        # real emitting slot; stale buffer content would segment-sum into
        # real feature blocks).  At the bench scene >50% of tiles are
        # empty (the 50k-splat blob covers under half the 1024 tiles) and
        # at real training scenes 80-90% are (the object covers a few
        # percent of pixels) — each previously burned a full
        # (1024 px, chunk) pair-slot body on all-masked splats.
        bg_r = bg_ref[frame, 0]
        bg_g = bg_ref[frame, 1]
        bg_b = bg_ref[frame, 2]
        truc = jnp.transpose(truth_ref[0])  # (P, 8)
        ones_p = jnp.ones((p_count, 1), jnp.float32)
        res_ref[0] = jnp.transpose(
            jnp.concatenate(
                [truc[:, 0:1] - bg_r, truc[:, 1:2] - bg_g,
                 truc[:, 2:3] - bg_b, ones_p,
                 jnp.zeros((p_count, _C_ROWS - 4), jnp.float32)],
                axis=1,
            )
        )
        dlo_ref[0] = jnp.zeros((_F_ROWS_T, chunk), dlo_ref.dtype)
        dhi_ref[0] = jnp.zeros((_F_ROWS_T, chunk), dhi_ref.dtype)

    @pl.when(((fl & (_FL_PAD | _FL_FUSED)) == _FL_FUSED) & (nvalid > 0))
    def _():
        # Single-window tile: forward + residual + gradient replay in ONE
        # item, REUSING the live window state (the replay's entry state is
        # T=1/alive=1, identical to this fresh pass-1 state, so weight/t_k/
        # keep carry over — the whole second _chunk_state+_composite_chunk
        # is elided along with the pass-2 work item).
        feat = _assemble_window(featA_ref, featB_ref, r)
        a, contrib, alpha_raw, expp, dx, dy, (ca, cb, cc) = _chunk_state(
            feat, t_img, in_range, tile, tx_tiles, chunk, fexp, mm_power,
        )
        ones_p = jnp.ones((p_count, 1), jnp.float32)
        weight, t_k, a_eff, keep, t_out, _alive = _composite_chunk(
            a, ones_p, ones_p, mm_bf16, fexp
        )
        c3 = jnp.concatenate(
            [feat[_F_CR : _F_CR + 1, :],
             feat[_F_CG : _F_CG + 1, :],
             feat[_F_CB2 : _F_CB2 + 1, :]], axis=0,
        )
        c_tot = jax.lax.dot_general(
            weight, c3, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (P, 3)
        bg_r = bg_ref[frame, 0]
        bg_g = bg_ref[frame, 1]
        bg_b = bg_ref[frame, 2]
        t_n = t_out
        truc = jnp.transpose(truth_ref[0])  # (P, 8)
        res_r = truc[:, 0:1] - (c_tot[:, 0:1] + t_n * bg_r)
        res_g = truc[:, 1:2] - (c_tot[:, 1:2] + t_n * bg_g)
        res_b = truc[:, 2:3] - (c_tot[:, 2:3] + t_n * bg_b)
        res_ref[0] = jnp.transpose(
            jnp.concatenate(
                [res_r, res_g, res_b, t_n,
                 jnp.zeros((p_count, _C_ROWS - 4), jnp.float32)],
                axis=1,
            )
        )
        g_t = res_r * bg_r + res_g * bg_g + res_b * bg_b
        gc = (
            res_r * feat[_F_CR : _F_CR + 1, :]
            + res_g * feat[_F_CG : _F_CG + 1, :]
            + res_b * feat[_F_CB2 : _F_CB2 + 1, :]
        )
        g_ctot = (
            res_r * c_tot[:, 0:1]
            + res_g * c_tot[:, 1:2]
            + res_b * c_tot[:, 2:3]
        )
        cum_gwc = _cumsum_lanes(weight * gc, mm_bf16)
        g_s = g_ctot - cum_gwc
        inv1ma = 1.0 / (1.0 - a_eff)
        d_alpha = gc * t_k - (g_s + g_t * t_n) * inv1ma
        grad_mask = keep & contrib & (alpha_raw < ALPHA_MAX)
        d_alpha = jnp.where(grad_mask, d_alpha, 0.0)
        rows9 = _grad_rows_moments(
            weight, d_alpha, alpha_raw,
            feat[_F_OP : _F_OP + 1, :],
            feat[_F_MX : _F_MX + 1, :],
            feat[_F_MY : _F_MY + 1, :],
            ca, cb, cc, res_r, res_g, res_b, t_img, tile, tx_tiles,
        )
        _emit_window_slabs(dlo_ref, dhi_ref, rows9, r, chunk)

    @pl.when((fl & (_FL_PAD | _FL_PASS2 | _FL_FUSED)) == 0)
    def _():
        @pl.when(fl & _FL_FIRST != 0)
        def _():
            acc[:, :] = jnp.zeros((p_count, 8), jnp.float32)
            acc[:, 3:4] = jnp.ones((p_count, 1), jnp.float32)
            acc[:, 4:5] = jnp.ones((p_count, 1), jnp.float32)

        # Early-termination skip: once every pixel in the tile has hit the
        # INRIA T < eps cutoff (alive == 0 for all), later windows cannot
        # change the composite (weight == 0, t/alive carry through), so the
        # skip is exact — the window-granular analog of the CUDA per-thread
        # `done` early exit in the reference rasterizer's forward loop.
        @pl.when(jnp.max(acc[:, 4]) > 0.0)
        def _():
            feat = _assemble_window(featA_ref, featB_ref, r)
            a, _, _, _, _, _, _ = _chunk_state(
                feat, t_img, in_range, tile, tx_tiles, chunk, fexp, mm_power,
            )
            t_in = acc[:, 3:4]
            alive = acc[:, 4:5]
            weight, _, _, _, t_out, alive_out = _composite_chunk(
                a, t_in, alive, mm_bf16, fexp
            )
            c3 = jnp.concatenate(
                [feat[_F_CR : _F_CR + 1, :],
                 feat[_F_CG : _F_CG + 1, :],
                 feat[_F_CB2 : _F_CB2 + 1, :]], axis=0,
            )  # (3, C)
            # per-pixel color accumulation as ONE (P,C)x(C,3) MXU matmul
            # (contract the shared C axis) instead of three lane-reduces
            acc[:, 0:3] += jax.lax.dot_general(
                weight, c3, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc[:, 3:4] = t_out
            acc[:, 4:5] = alive_out

        @pl.when(fl & _FL_LAST_P1 != 0)
        def _():
            bg_r = bg_ref[frame, 0]
            bg_g = bg_ref[frame, 1]
            bg_b = bg_ref[frame, 2]
            t_n = acc[:, 3:4]
            # truth/res tiles are channel-major (8, P) — see _C_ROWS; the
            # compositing state is pixel-major (P, c) columns, so transpose
            # at the boundary (2 small XLU transposes per TILE, amortized
            # over its windows) rather than padding P-minor buffers 32-43x
            # in HBM
            truc = jnp.transpose(truth_ref[0])  # (P, 8)
            res_r = truc[:, 0:1] - (acc[:, 0:1] + t_n * bg_r)
            res_g = truc[:, 1:2] - (acc[:, 1:2] + t_n * bg_g)
            res_b = truc[:, 2:3] - (acc[:, 2:3] + t_n * bg_b)
            acc2[:, 0:1] = res_r
            acc2[:, 1:2] = res_g
            acc2[:, 2:3] = res_b
            acc2[:, 3:4] = res_r * bg_r + res_g * bg_g + res_b * bg_b  # g_t
            acc2[:, 4:5] = (
                res_r * acc[:, 0:1] + res_g * acc[:, 1:2] + res_b * acc[:, 2:3]
            )  # g . C_total
            acc2[:, 5:6] = t_n
            res_ref[0] = jnp.transpose(
                jnp.concatenate(
                    [res_r, res_g, res_b, t_n,
                     jnp.zeros((p_count, _C_ROWS - 4), jnp.float32)],
                    axis=1,
                )
            )
            # re-arm acc for the replay pass
            acc[:, 0:1] = jnp.zeros((p_count, 1), jnp.float32)
            acc[:, 3:4] = jnp.ones((p_count, 1), jnp.float32)
            acc[:, 4:5] = jnp.ones((p_count, 1), jnp.float32)

    @pl.when((fl & (_FL_PAD | _FL_PASS2)) == _FL_PASS2)
    def _():
        dlo_ref[0] = jnp.zeros((_F_ROWS_T, chunk), dlo_ref.dtype)
        dhi_ref[0] = jnp.zeros((_F_ROWS_T, chunk), dhi_ref.dtype)

        # Same early-termination skip as pass 1: with every pixel dead,
        # keep == False everywhere, so every gradient row and every acc
        # update is a no-op — skipping the whole replay window is exact.
        @pl.when(jnp.max(acc[:, 4]) > 0.0)
        def _():
            feat = _assemble_window(featA_ref, featB_ref, r)
            a, contrib, alpha_raw, expp, dx, dy, (ca, cb, cc) = _chunk_state(
                feat, t_img, in_range, tile, tx_tiles, chunk, fexp, mm_power,
            )
            t_in = acc[:, 3:4]
            alive = acc[:, 4:5]
            weight, t_k, a_eff, keep, t_out, alive_out = _composite_chunk(
                a, t_in, alive, mm_bf16, fexp
            )

            cr = feat[_F_CR : _F_CR + 1, :]
            cg = feat[_F_CG : _F_CG + 1, :]
            cb2 = feat[_F_CB2 : _F_CB2 + 1, :]
            g_r = acc2[:, 0:1]
            g_g = acc2[:, 1:2]
            g_b = acc2[:, 2:3]
            g_t = acc2[:, 3:4]
            g_ctot = acc2[:, 4:5]
            t_n = acc2[:, 5:6]

            gc = g_r * cr + g_g * cg + g_b * cb2
            cum_gwc = _cumsum_lanes(weight * gc, mm_bf16)
            g_s = g_ctot - (acc[:, 0:1] + cum_gwc)

            inv1ma = 1.0 / (1.0 - a_eff)
            d_alpha = gc * t_k - (g_s + g_t * t_n) * inv1ma
            grad_mask = keep & contrib & (alpha_raw < ALPHA_MAX)
            d_alpha = jnp.where(grad_mask, d_alpha, 0.0)

            rows9 = _grad_rows_moments(
                weight, d_alpha, alpha_raw,
                feat[_F_OP : _F_OP + 1, :],
                feat[_F_MX : _F_MX + 1, :],
                feat[_F_MY : _F_MY + 1, :],
                ca, cb, cc, g_r, g_g, g_b, t_img, tile, tx_tiles,
            )
            _emit_window_slabs(dlo_ref, dhi_ref, rows9, r, chunk)

            acc[:, 0:1] += cum_gwc[:, -1:]
            acc[:, 3:4] = t_out
            acc[:, 4:5] = alive_out


_SMEM_BUDGET_BYTES = 700 * 1024  # v5e SMEM is 1 MB; leave headroom for the
# kernel's own scalars (measured OOM at 1.63M used / 1.00M available)


def max_frame_group(
    width: int, height: int, tile: int, max_dup: int, chunk: int = 128
) -> int:
    """Largest frame count per fused launch whose scalar-prefetch arrays
    (THREE w2-length work-list vectors — packed tile+nvalid+flags, window
    starts, slab slots — all int32 in SMEM) fit the budget.  Exceeding
    SMEM is a hard compile error on TPU.  The packed tile field is 17
    bits, so the group is also capped at 2^17 / num_tiles."""
    tx_tiles = -(-width // tile)
    ty_tiles = -(-height // tile)
    num_tiles = tx_tiles * ty_tiles
    w2 = 2 * work_capacity(num_tiles, max_dup, chunk)
    per_frame = (3 * w2) * 4
    smem_cap = max(1, _SMEM_BUDGET_BYTES // per_frame)
    # the launch check rejects f * num_tiles >= 2^17 (strict), so the
    # largest admissible product is 2^17 - 1
    pack_cap = max(1, ((1 << (31 - _FL_BITS - _NV_BITS)) - 1) // num_tiles)
    return min(smem_cap, pack_cap)


def _worklist_flags(w2) -> jax.Array:
    """Pack the WindowWork booleans into one int32 bitfield array
    (scalar-prefetch operands live in small SMEM; frame batching multiplies
    the work-list length by the group size)."""
    return (
        w2.is_first * _FL_FIRST
        + w2.is_last_p1 * _FL_LAST_P1
        + w2.is_pass2 * _FL_PASS2
        + w2.is_pad * _FL_PAD
        + w2.is_fused * _FL_FUSED
    ).astype(jnp.int32)


def _composite_train_flat(
    feat9: jax.Array,  # (9, num_blocks_total * chunk)
    truth_tiles: jax.Array,  # (T_total, 8, P) channel-major, frames flattened
    bg_f4: jax.Array,  # (F, 4) per-frame background
    work_tf: jax.Array,  # (W,) GLOBAL (tile << 14) | (nvalid << 5) | flags
    work_start: jax.Array,  # (W,) GLOBAL window-start duplicate columns
    slab_pos: jax.Array,  # (W,) COMPACTED global slab slot; dump = n_slots-1
    seg_lo: jax.Array,  # (n_slots,) aligned block id per slot's LO slab
    seg_hi: jax.Array,  # (n_slots,) aligned block id per slot's HI slab
    num_blocks_total: int,
    tile: int,
    tx_tiles: int,
    chunk: int,
    tiles_frame: int,
    interpret: bool,
    mm_bf16: bool = False,
    fexp: bool = False,
    mm_power: bool = False,
):
    """Run the window-fused train kernel over a flat (possibly multi-frame)
    work list.  Returns (res8 (T_total, 8, P), d_feat9 (9, B_total*chunk)).

    The feature input is passed TWICE with adjacent-block index maps (the
    kernel rolls the pair into the tile's unaligned window); the gradient
    output is a (lo, hi) slab PAIR per emitting item, segment-summed back
    onto the aligned blocks.  Slab outputs are indexed by the COMPACTED
    ``slab_pos`` (not the grid step): non-emitting items (pads, pass-1
    windows) all target one dump slot, so the revolving out blocks only
    fetch/flush on emitting items."""
    p_count = tile * tile
    num_tiles_total = truth_tiles.shape[0]
    w_cap = work_tf.shape[0]
    n_slots = seg_lo.shape[0]
    nb_tot = num_blocks_total
    kw = dict(
        tile=tile, tx_tiles=tx_tiles, chunk=chunk, tiles_frame=tiles_frame,
        mm_bf16=mm_bf16, fexp=fexp, mm_power=mm_power,
    )
    tshift = _FL_BITS + _NV_BITS

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(w_cap,),
        in_specs=[
            pl.BlockSpec(
                (_F_ROWS_T, chunk),
                lambda w, wtf, ws, sp: (0, ws[w] // chunk),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (_F_ROWS_T, chunk),
                lambda w, wtf, ws, sp: (
                    0, jnp.minimum(ws[w] // chunk + 1, nb_tot - 1),
                ),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, _C_ROWS, p_count),
                lambda w, wtf, ws, sp: (wtf[w] >> tshift, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, _C_ROWS, p_count),
                lambda w, wtf, ws, sp: (wtf[w] >> tshift, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, _F_ROWS_T, chunk),
                lambda w, wtf, ws, sp: (sp[w], 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, _F_ROWS_T, chunk),
                lambda w, wtf, ws, sp: (sp[w], 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        scratch_shapes=[
            pltpu.VMEM((p_count, 8), jnp.float32),
            pltpu.VMEM((p_count, 8), jnp.float32),
        ],
    )
    # bf16 slab storage (opt-in, GSPLAT_BF16_SLABS=1): halves the slab
    # HBM write + segment-sum read traffic (~42 MB/step at the bench
    # shape).  Rounding is one bf16 quantization per slab element BEFORE
    # the f32 segment accumulation (~2^-9 relative per duplicate
    # contribution) — far under the truth images' MC noise, but gated
    # off until the bench grad-parity gate clears it on chip.
    slab_dt = (
        jnp.bfloat16
        if os.environ.get("GSPLAT_BF16_SLABS", "0") == "1"
        else jnp.float32
    )
    res8, dlo_slabs, dhi_slabs = pl.pallas_call(
        functools.partial(_train_kernel, **kw),
        out_shape=(
            jax.ShapeDtypeStruct((num_tiles_total, _C_ROWS, p_count), jnp.float32),
            jax.ShapeDtypeStruct((n_slots, _F_ROWS_T, chunk), slab_dt),
            jax.ShapeDtypeStruct((n_slots, _F_ROWS_T, chunk), slab_dt),
        ),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(work_tf, work_start, slab_pos, feat9, feat9, truth_tiles, bg_f4)
    dfeat_blocks = jax.ops.segment_sum(
        jnp.concatenate(
            [dlo_slabs.astype(jnp.float32), dhi_slabs.astype(jnp.float32)],
            axis=0,
        ),
        jnp.concatenate([seg_lo, seg_hi], axis=0),
        num_segments=num_blocks_total + 1,
    )[:num_blocks_total]
    d_feat9 = jnp.transpose(dfeat_blocks, (1, 0, 2)).reshape(
        _F_ROWS_T, num_blocks_total * chunk
    )
    return res8, d_feat9


def _worklists_global(bins, f, num_tiles, max_dup, chunk, work_cap, num_blocks):
    """Build per-frame window work lists and flatten them to the global
    (frame-major) id spaces the fused kernel consumes.  Shared by the
    from-parameters (render_train_grads_batch) and from-projected-rows
    (render_train_grads_rows) entry points."""
    from gaussian_splatterer_tpu.ops.binning import make_window_worklist

    i32 = jnp.int32
    w2 = jax.vmap(
        lambda ts, te: make_window_worklist(
            ts, te, num_tiles, max_dup, chunk, work_cap
        )
    )(bins.tile_start, bins.tile_end)

    # flatten to global (frame-major) ids
    f_col = jnp.arange(f, dtype=i32)[:, None]
    wt_g = w2.work_tile + f_col * num_tiles
    wtf_g = (
        (wt_g << (_FL_BITS + _NV_BITS))
        | (w2.nvalid << _FL_BITS)
        | _worklist_flags(w2)
    ).reshape(-1)
    ws_g = (w2.w_start + f_col * max_dup).reshape(-1)
    # compacted slab slots: frame-local slots stack, ONE global dump at
    # the end; per-slot segment ids globalize the same way (shared helper
    # keeps this bit-identical to make_window_worklist's slot count)
    emit_cap = emit_capacity(num_tiles, max_dup, chunk, work_cap)
    sp_g = jnp.where(
        w2.slab_pos == emit_cap,
        f * emit_cap,
        w2.slab_pos + f_col * emit_cap,
    ).reshape(-1)

    def seg_globalize(seg):
        return jnp.concatenate([
            jnp.where(
                seg[:, :emit_cap] == num_blocks,
                f * num_blocks,
                seg[:, :emit_cap] + f_col * num_blocks,
            ).reshape(-1),
            jnp.full((1,), f * num_blocks, i32),
        ])

    seg_lo_g = seg_globalize(w2.seg_lo)
    seg_hi_g = seg_globalize(w2.seg_hi)
    return w2, wtf_g, ws_g, sp_g, seg_lo_g, seg_hi_g


def _cumsum_pick_blk(d: int) -> int | None:
    """Largest lane-block size for the carry-cumsum kernel: a divisor of
    ``d`` that is a multiple of 128 (Mosaic lane-dim rule).  None -> fall
    back to jnp.cumsum (tiny test shapes)."""
    for blk in (2048, 1024, 512, 384, 256, 128):
        if d % blk == 0:
            return blk
    return None


def _cumsum_carry_kernel(x_ref, o_ref, carry, *, blk: int, rows: int,
                         frames: int):
    """One grid step of the per-frame carry cumsum: the block holds the
    SAME lane range of every frame, (rows, F, blk) — the frame axis rides
    sublanes (Mosaic requires the sublane block dim be 8-divisible or
    array-equal; a (rows, 1, blk) per-frame block violates it).  In-block
    inclusive log-shift scan along lanes + a (rows, F) running carry in
    VMEM scratch, zeroed at the first block.  All f32 adds — no MXU/bf16
    rounding (the gradient reduction feeding the SGD step must match
    jnp.cumsum up to association order)."""
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        carry[:, :] = jnp.zeros((rows, frames), jnp.float32)

    x = x_ref[:, :, :]  # (rows, F, blk)
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, frames, blk), 2)
    s = 1
    while s < blk:
        x = x + jnp.where(lane >= s, pltpu.roll(x, s, 2), 0.0)
        s *= 2
    x = x + carry[:, :][:, :, None]
    o_ref[:, :, :] = x
    carry[:, :] = x[:, :, blk - 1]


def cumsum_frames(x: jax.Array, interpret: bool) -> jax.Array:
    """Per-frame inclusive cumsum of (K, F, D) along D as ONE sequential
    Pallas pass (log-shift scan per block + a running carry), replacing
    XLA's cumsum whose TPU lowering is a multi-pass associative scan over
    the full 52 MB array at the bench shape.  Numerics: pure f32 adds —
    same dtype path as jnp.cumsum, differing only in association order
    (~1e-7 relative).  Opt-in via GSPLAT_PALLAS_CUMSUM=1 until the
    on-chip A/B lands; falls back to jnp.cumsum when D has no
    128-multiple divisor."""
    k, f, d = x.shape
    blk = _cumsum_pick_blk(d)
    if blk is None or os.environ.get("GSPLAT_PALLAS_CUMSUM", "0") != "1":
        return jnp.cumsum(x, axis=2)
    return pl.pallas_call(
        functools.partial(_cumsum_carry_kernel, blk=blk, rows=k, frames=f),
        grid=(d // blk,),
        in_specs=[
            pl.BlockSpec((k, f, blk), lambda b: (0, 0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k, f, blk), lambda b: (0, 0, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k, f, d), jnp.float32),
        scratch_shapes=[pltpu.VMEM((k, f), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(x)


def _dup_grads_to_rows(d_feat9, bins, f, n_cap, max_dup, interpret=True):
    """Scatter-free duplicate-gradient reduction: (9, F*D) per-tile-sorted
    duplicate gradients -> (F, 9, N) per-splat row gradients.

    d_feat9 is per TILE-SORTED duplicate; carry it back to depth/presort
    order (where each splat's duplicates are CONTIGUOUS) as PAYLOADS of a
    batched key sort — measured ~5.5 ms vs ~13 ms for the equivalent
    inverse-permutation column gather plus ~5 ms for the inverse-perm
    sort it replaces (scripts/gather_probe.py).  Then cumsum per frame,
    take per-splat segment differences, and gather back to original row
    order.  Sorts/gathers/cumsums only — XLA's TPU scatter lowering
    measured 19 ms/frame and pathological compiles."""
    d_3d = d_feat9.reshape(9, f, max_dup)  # tile-sorted per frame
    sorted_ops = jax.lax.sort(
        (bins.presort_pos,) + tuple(d_3d[k] for k in range(9)),
        num_keys=1,
        is_stable=False,  # keys are a permutation of 0..D-1: unique
    )
    d_pre9 = jnp.stack(sorted_ops[1:])  # (9, F, D)
    # PER-FRAME cumsums (axis=2), flattened back to global ids.  A single
    # global cumsum over the concatenated F*D axis accumulates across
    # frames, so late frames' segment differences subtract two large
    # running sums — measured 5.5e-3 absolute noise on the densify
    # variance signal at 8 frames x 75k duplicates (found by the
    # realistic-shape DP exactness test: the camera-sharded step, which
    # necessarily cumsums per frame, was the ACCURATE one).  Per-frame
    # cumsums cost the same and make single-device == camera-DP to
    # reassociation noise.
    # (round 5: an optimization_barrier here — forcing one cs9
    # materialization in case XLA duplicated the cumsum into its two
    # consumer fusions — measured NEUTRAL at the bench scene, 18.75 vs
    # 18.74 ms/frame; reverted to the plain form)
    cs9 = cumsum_frames(d_pre9, interpret).reshape(9, f * max_dup)
    fD = f * max_dup
    # a segment starting at its OWN frame's first dup column has zero
    # prefix (frame-local cumsum).  The frame must come from the slot id,
    # not from seg_start % max_dup: when a frame's duplicates exactly
    # fill max_dup, its empty tail slots start at (j+1)*max_dup — a
    # modulo test would zero their prefix and dump the whole frame sum
    # onto the last slot's splat.
    slot_frame = jnp.arange(f * n_cap, dtype=jnp.int32) // n_cap
    frame_first = bins.seg_start_g == slot_frame * max_dup
    lo9 = jnp.where(
        ~frame_first[None, :],
        cs9[:, jnp.clip(bins.seg_start_g - 1, 0, fD - 1)],
        0.0,
    )
    # Depth-order segments tile the dup axis CONTIGUOUSLY (offs_excl[k+1]
    # == offs[k]; overflow-gated and empty segments collapse to equal
    # boundaries, and the cumsum is constant over each frame's tail slack
    # because out-of-range dup columns contribute exactly zero), so
    # hi9[k] == lo9[k+1] — a lane shift replaces the second 512k-column
    # gather (measured 24 ms/step at 16 frames) — EXCEPT each frame's
    # LAST depth slot, whose hi is its own frame's cumsum total (the
    # shifted lo9 there is the next frame's zero prefix).
    hi9 = jnp.concatenate([lo9[:, 1:], jnp.zeros((9, 1), jnp.float32)], axis=1)
    frame_totals = cs9.reshape(9, f, max_dup)[:, :, max_dup - 1]  # (9, F)
    hi9 = hi9.at[:, n_cap - 1 :: n_cap].set(frame_totals)
    seg9 = hi9 - lo9  # (9, F*N) per global depth slot
    d_rows9 = seg9[:, bins.inv_depth_flat]  # per original row id
    return jnp.moveaxis(d_rows9.reshape(9, f, n_cap), 0, 1)  # (F, 9, N)


def render_train_grads_batch(
    means, shs, scales, opacities, rotations, active,
    views, proj_views, cam_posns, tan_fovxs, tan_fovys,  # (F, ...) stacks
    width: int, height: int,
    truth_tiles,  # (F, T, 8, P) channel-major pre-tiled truths
    backgrounds,  # (F, 3)
    sh_degree: int,
    *,
    tile: int = 32,
    chunk: int = 128,
    max_dup: int = 2**18,
    interpret: bool | None = None,
    mm_bf16: bool = False,
    band: tuple | None = None,
    frame_loc_grads: bool = False,
    work_cap: int | None = None,
    aa: bool = False,
    fast_exp: bool = False,
    mm_power: bool = False,
):
    """Frame-BATCHED fused training core: bin all F frames with one vmapped
    (batched-sort) pass and composite them in ONE Pallas launch over a
    frame-flattened work list — no per-frame launch/glue (the reference's
    per-frame loop is src/Trainer.cu:311-425; here the whole truth batch is
    a single device program).

    ``band=(y_offset_px, band_height)`` restricts rasterization to the
    horizontal image band [y_offset_px, y_offset_px + band_height): the
    projection stays full-image, the projected centers are shifted by
    -y_offset_px (a traced scalar — under shard_map it can derive from
    ``lax.axis_index``), and binning/compositing run on the
    ``band_height``-tall local tile grid.  ``truth_tiles`` must then hold
    ONLY the band's tiles, (F, T_band, 8, P).  Tile-axis model parallelism
    (parallel/tp.py) builds on this; band_height must be tile-aligned.

    Returns (loss_sum, grads, var_loc, res4, num_dup) where
      loss_sum = sum over frames of per-frame mean squared residual,
      grads    = per-parameter SUMS over frames of J^T residual (the
                 reference's negative-L2 convention, src/Trainer.cu:33-44),
      var_loc  = (C,) sum over frames of per-frame |location-grad| norms
                 (the densify "variance" signal, src/Trainer.cu:52-54),
      res8     = (F, T, 8, P) channel-major rows [residual rgb, t_final],
      num_dup  = () int32 MAX duplicates generated by any frame's binning —
                 > max_dup means the deepest splats were dropped (the
                 reference radix-sorts the exact count and cannot truncate,
                 src/Trainer.cu:334-360; callers should grow max_dup).
    """
    from gaussian_splatterer_tpu.ops.binning import bin_splats_batch

    if interpret is None:
        interpret = _should_interpret()
    chunk = min(chunk, max_dup)  # tiny dup buffers (tests) cap the chunk
    if chunk > _NV_MASK:
        raise ValueError(
            f"chunk={chunk} exceeds the packed window valid-count field "
            f"(chunk <= {_NV_MASK})"
        )
    if band is not None:
        y_off, bin_height = band
        y_off = jnp.asarray(y_off, jnp.float32)
    else:
        y_off, bin_height = None, height
    tx_tiles = -(-width // tile)
    ty_tiles = -(-bin_height // tile)
    num_tiles = tx_tiles * ty_tiles
    num_blocks = max_dup // chunk
    f = views.shape[0]
    if f * num_tiles >= (1 << (31 - _FL_BITS - _NV_BITS)):
        raise ValueError(
            f"frame_group x num_tiles = {f * num_tiles} exceeds the packed "
            f"tile-id field ({1 << (31 - _FL_BITS - _NV_BITS)}); lower the "
            "frame group or raise the tile size"
        )
    i32 = jnp.int32
    p_count = tile * tile

    # binning on the stop-gradient projection (integer bookkeeping only)
    def project_one(mns, view, pv, pos, tx, ty):
        return project_splat_components(
            mns, shs, scales, opacities, rotations, active,
            view, pv, pos, tx, ty, width, height, sh_degree, 1.0, aa=aa,
        )

    proj_sg = jax.lax.stop_gradient(
        jax.vmap(lambda v, pv, pos, tx, ty: project_one(means, v, pv, pos, tx, ty))(
            views, proj_views, cam_posns, tan_fovxs, tan_fovys
        )
    )
    if y_off is not None:
        proj_sg = proj_sg._replace(my=proj_sg.my - jax.lax.stop_gradient(y_off))
    bins = bin_splats_batch(proj_sg, width, bin_height, tile, max_dup, chunk)
    w2, wtf_g, ws_g, sp_g, seg_lo_g, seg_hi_g = _worklists_global(
        bins, f, num_tiles, max_dup, chunk, work_cap, num_blocks
    )

    # Differentiable feature build.  means are broadcast to (F, C, 3) so the
    # pullback returns PER-FRAME location gradients — the densify variance
    # signal needs per-frame norms, not just the sum (src/Trainer.cu:52-54).
    # The vjp covers ONLY the projection (rows); the duplicate gather's
    # transpose is done explicitly below as a scatter-FREE reduction (XLA's
    # TPU scatter expansion measured 19 ms/frame and blew up compile times).
    means_b = jnp.broadcast_to(means, (f,) + means.shape)

    def build_rows(means_b, shs_, scales_, opac_, rot_):
        def one(mb, view, pv, pos, tx, ty):
            pr = project_splat_components(
                mb, shs_, scales_, opac_, rot_, active,
                view, pv, pos, tx, ty, width, height, sh_degree, 1.0, aa=aa,
            )
            my = pr.my if y_off is None else pr.my - y_off
            return jnp.stack(
                [pr.mx, my, pr.ca, pr.cb, pr.cc,
                 pr.cr, pr.cg, pr.cb2, pr.opacity], axis=0,
            )  # (9, N)

        return jax.vmap(one)(
            means_b, views, proj_views, cam_posns, tan_fovxs, tan_fovys
        )  # (F, 9, N)

    rows, pull_rows = jax.vjp(
        build_rows, means_b, shs, scales, opacities, rotations
    )
    n_cap = means.shape[0]
    rows9 = jnp.moveaxis(rows, 0, 1).reshape(9, f * n_cap)
    feat9 = rows9[:, bins.gather_flat]  # (9, F*D) flat column gather
    bg4 = jnp.zeros((f, 4), jnp.float32).at[:, :3].set(
        jnp.asarray(backgrounds, jnp.float32)
    )
    truth_flat = truth_tiles.reshape(f * num_tiles, _C_ROWS, p_count)
    res8, d_feat9 = _composite_train_flat(
        feat9, truth_flat, bg4, wtf_g, ws_g, sp_g, seg_lo_g, seg_hi_g,
        f * num_blocks, tile, tx_tiles, chunk, num_tiles, interpret,
        mm_bf16, fast_exp, mm_power,
    )
    d_rows = _dup_grads_to_rows(d_feat9, bins, f, n_cap, max_dup, interpret)
    d_means_b, d_shs, d_scales, d_opac, d_rot = pull_rows(d_rows)
    g_means = jnp.sum(d_means_b, axis=0)
    # densify "variance" signal = sum of per-frame |location-grad| norms
    # (src/Trainer.cu:52-54).  The norm is nonlinear, so band-sharded
    # callers (parallel/tp.py) need the RAW per-frame gradients to psum
    # over bands BEFORE the norm — frame_loc_grads returns them instead.
    var_loc = (
        d_means_b
        if frame_loc_grads
        else jnp.sum(jnp.sqrt(jnp.sum(jnp.square(d_means_b), axis=-1)), axis=0)
    )
    res8_frames = res8.reshape(f, num_tiles, _C_ROWS, p_count)
    loss_sum = jnp.sum(
        jnp.mean(jnp.square(res8_frames[:, :, 0:3, :]), axis=(1, 2, 3))
    )
    # overflow telemetry: num_dup > max_dup or num_work > the work_cap
    # budget means the frame was truncated — callers grow + recompile
    num_dup = jnp.max(bins.num_dup)
    num_work = jnp.max(w2.num_work)
    return (
        loss_sum, (g_means, d_shs, d_scales, d_opac, d_rot), var_loc,
        res8_frames, num_dup, num_work,
    )


def render_train_grads_rows(
    comps,  # SplatComponents, every field (F, M) — PRE-PROJECTED splats
    width: int,
    height: int,
    truth_tiles,  # (F, T, 8, P) channel-major tiles for the local grid
    backgrounds,  # (F, 3)
    *,
    tile: int = 32,
    chunk: int = 128,
    max_dup: int = 2**18,
    work_cap: int | None = None,
    interpret: bool | None = None,
    mm_bf16: bool = False,
    fast_exp: bool = False,
    mm_power: bool = False,
):
    """Composite-stage-only fused training core: bin + rasterize + backward
    from PRE-PROJECTED screen-space components, returning gradients w.r.t.
    the nine differentiable feature rows instead of model parameters.

    This is the receiving half of SUB-TRANSIENT distributed binning
    (parallel/routed3.py): a tile/band shard receives only the projected
    rows of splats that actually touch its band (routed via
    parallel/route.bucket_route), composites them, and routes the returned
    ``d_rows`` back to the splat shards that own the parameters — no
    device ever materializes the full model (the reference's single-GPU
    rasterizer never needs this; its analog is the global radix sort in
    the diff-gaussian-rasterization submodule, src/Trainer.cu:334-360).

    ``comps`` fields are (F, M): M "virtual splats" per local frame —
    projected rows with GRID-LOCAL ``my`` (callers subtract the band's
    y-offset before calling; ``width``/``height`` describe the local bin
    grid, e.g. (W, band_height)).  Invalid slots (bucket padding) must
    have ``valid=False``.

    Returns (loss_sum, d_rows (F, 9, M), res8 (F, T, 8, P), num_dup,
    num_work) — loss_sum is the sum over local frames of the mean squared
    residual over the local grid; d_rows rows are ordered [mx, my, ca,
    cb, cc, cr, cg, cb2, opacity] (the build_rows order of
    render_train_grads_batch)."""
    from gaussian_splatterer_tpu.ops.binning import bin_splats_batch

    if interpret is None:
        interpret = _should_interpret()
    chunk = min(chunk, max_dup)
    if chunk > _NV_MASK:
        raise ValueError(
            f"chunk={chunk} exceeds the packed window valid-count field "
            f"(chunk <= {_NV_MASK})"
        )
    tx_tiles = -(-width // tile)
    ty_tiles = -(-height // tile)
    num_tiles = tx_tiles * ty_tiles
    num_blocks = max_dup // chunk
    f, n_cap = comps.mx.shape
    if f * num_tiles >= (1 << (31 - _FL_BITS - _NV_BITS)):
        raise ValueError(
            f"frame_group x num_tiles = {f * num_tiles} exceeds the packed "
            f"tile-id field ({1 << (31 - _FL_BITS - _NV_BITS)}); lower the "
            "frame group or raise the tile size"
        )
    p_count = tile * tile

    bins = bin_splats_batch(
        jax.lax.stop_gradient(comps), width, height, tile, max_dup, chunk
    )
    w2, wtf_g, ws_g, sp_g, seg_lo_g, seg_hi_g = _worklists_global(
        bins, f, num_tiles, max_dup, chunk, work_cap, num_blocks
    )

    rows = jnp.stack(
        [comps.mx, comps.my, comps.ca, comps.cb, comps.cc,
         comps.cr, comps.cg, comps.cb2, comps.opacity], axis=1,
    )  # (F, 9, M)
    rows9 = jnp.moveaxis(rows, 0, 1).reshape(9, f * n_cap)
    feat9 = rows9[:, bins.gather_flat]  # (9, F*D) flat column gather
    bg4 = jnp.zeros((f, 4), jnp.float32).at[:, :3].set(
        jnp.asarray(backgrounds, jnp.float32)
    )
    truth_flat = truth_tiles.reshape(f * num_tiles, _C_ROWS, p_count)
    res8, d_feat9 = _composite_train_flat(
        feat9, truth_flat, bg4, wtf_g, ws_g, sp_g, seg_lo_g, seg_hi_g,
        f * num_blocks, tile, tx_tiles, chunk, num_tiles, interpret,
        mm_bf16, fast_exp, mm_power,
    )
    # the duplicate gather's transpose, scatter-free; no projection vjp
    # here — the d_rows go back over the wire to the projecting shard
    d_rows = _dup_grads_to_rows(d_feat9, bins, f, n_cap, max_dup, interpret)
    res8_frames = res8.reshape(f, num_tiles, _C_ROWS, p_count)
    loss_sum = jnp.sum(
        jnp.mean(jnp.square(res8_frames[:, :, 0:3, :]), axis=(1, 2, 3))
    )
    num_dup = jnp.max(bins.num_dup)
    num_work = jnp.max(w2.num_work)
    return loss_sum, d_rows, res8_frames, num_dup, num_work


def render_train_grads(
    means, shs, scales, opacities, rotations, active,
    view, proj_view, cam_pos, tan_fovx, tan_fovy,
    width: int, height: int, truth_tiles, background, sh_degree: int,
    *,
    tile: int = 32,
    chunk: int = 128,
    max_dup: int = 2**18,
    interpret: bool | None = None,
    mm_bf16: bool = False,
):
    """Fused training step core for ONE frame: returns
    (loss_mean, grads tuple, residual_tiles (T, 8, P) channel-major).

    grads follow the reference convention (J^T residual — the *negative*
    L2 gradient, applied with += by the SGD step, src/Trainer.cu:81-101).
    Thin wrapper over render_train_grads_batch with F=1."""
    loss, grads, _var, res4, _nd, _nw = render_train_grads_batch(
        means, shs, scales, opacities, rotations, active,
        view[None], proj_view[None], jnp.asarray(cam_pos)[None],
        jnp.asarray(tan_fovx, jnp.float32)[None],
        jnp.asarray(tan_fovy, jnp.float32)[None],
        width, height, truth_tiles[None],
        jnp.asarray(background, jnp.float32)[None],
        sh_degree, tile=tile, chunk=chunk, max_dup=max_dup,
        interpret=interpret, mm_bf16=mm_bf16,
    )
    return loss, grads, res4[0]


def _make_composite(
    bins: TileBins,
    num_tiles: int,
    tile: int,
    tx_tiles: int,
    chunk: int,
    max_dup: int,
    interpret: bool,
):
    """Build the custom-VJP compositing op over the packed feature array.

    feat16: (16, max_dup) -> out (num_tiles, tile*tile, 4) where channels are
    [r, g, b, t_final] (background applied by the caller)."""
    p_count = tile * tile
    w_cap = work_capacity(num_tiles, max_dup, chunk)
    num_blocks = max_dup // chunk
    kw = dict(tile=tile, tx_tiles=tx_tiles, chunk=chunk)
    scalars = (
        bins.work_tile,
        bins.work_block,
        bins.is_first,
        bins.is_last,
        bins.is_pad,
        bins.block_first,
        bins.tile_start,
        bins.tile_end,
    )

    def run_fwd(feat16):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=8,
            grid=(w_cap,),
            in_specs=[
                pl.BlockSpec(
                    (_F_ROWS, chunk),
                    lambda w, wt, wb, *_: (0, wb[w]),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, p_count, 4),
                lambda w, wt, wb, *_: (wt[w], 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[pltpu.VMEM((p_count, 8), jnp.float32)],
        )
        return pl.pallas_call(
            functools.partial(_fwd_kernel, **kw),
            out_shape=jax.ShapeDtypeStruct((num_tiles, p_count, 4), jnp.float32),
            grid_spec=grid_spec,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
            interpret=interpret,
        )(*scalars, feat16)

    def run_bwd(feat16, out_fwd, gin):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=8,
            grid=(w_cap,),
            in_specs=[
                pl.BlockSpec(
                    (_F_ROWS, chunk),
                    lambda w, wt, wb, *_: (0, wb[w]),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, p_count, 4),
                    lambda w, wt, wb, *_: (wt[w], 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, p_count, 4),
                    lambda w, wt, wb, *_: (wt[w], 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, _F_ROWS, chunk),
                lambda w, wt, wb, *_: (w, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[pltpu.VMEM((p_count, 8), jnp.float32)],
        )
        dfeat_slabs = pl.pallas_call(
            functools.partial(_bwd_kernel, **kw),
            out_shape=jax.ShapeDtypeStruct((w_cap, _F_ROWS, chunk), jnp.float32),
            grid_spec=grid_spec,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
            interpret=interpret,
        )(*scalars, feat16, gin, out_fwd)
        # two adjacent tiles can share a boundary block: segment-sum slabs
        dfeat_blocks = jax.ops.segment_sum(
            dfeat_slabs, bins.work_block, num_segments=num_blocks
        )  # (B, 16, chunk)
        return jnp.transpose(dfeat_blocks, (1, 0, 2)).reshape(_F_ROWS, max_dup)

    @jax.custom_vjp
    def composite(feat16):
        return run_fwd(feat16)

    def composite_fwd(feat16):
        out = run_fwd(feat16)
        return out, (feat16, out)

    def composite_bwd(res, gin):
        feat16, out = res
        return (run_bwd(feat16, out, gin),)

    composite.defvjp(composite_fwd, composite_bwd)
    return composite


def image_to_tiles(img: jax.Array, tile: int) -> jax.Array:
    """(H, W, 3) -> (T, tile*tile, 3) in the kernel's tile-major pixel order.

    Requires tile | H and tile | W.  Used to pre-tile truth images once so
    training losses stay in tile space (no per-step image assembly)."""
    h, w, c = img.shape
    ty, txx = h // tile, w // tile
    return (
        img.reshape(ty, tile, txx, tile, c)
        .transpose(0, 2, 1, 3, 4)
        .reshape(ty * txx, tile * tile, c)
    )


def image_to_tiles_cm(img: jax.Array, tile: int) -> jax.Array:
    """(H, W, 3) -> (T, 8, tile*tile) CHANNEL-MAJOR truth tiles: rgb in
    rows 0-2, rows 3-7 zero (see _C_ROWS).

    The train path stores truths and residuals channel-major so the pixel
    axis lands on the 128-lane dim — (T, P, 3) puts 3 channels on lanes and
    XLA's tiled HBM layouts pad that to 128 (42.7x memory, OOM at 16
    frames of 1024^2)."""
    h, w, c = img.shape
    ty, txx = h // tile, w // tile
    pm = (
        img.reshape(ty, tile, txx, tile, c)
        .transpose(0, 2, 4, 1, 3)
        .reshape(ty * txx, c, tile * tile)
    )
    return jnp.concatenate(
        [pm, jnp.zeros((ty * txx, _C_ROWS - c, tile * tile), pm.dtype)], axis=1
    )


def tiles_cm_to_image(
    tiles_cm: jax.Array, width: int, height: int, tile: int, rows: int = 3
) -> jax.Array:
    """(T, 8, tile*tile) channel-major -> (H, W, rows) (inverse of
    image_to_tiles_cm, cropping tile padding; rows=4 recovers t_final
    from residual tiles)."""
    tx_tiles = -(-width // tile)
    ty_tiles = -(-height // tile)
    img = (
        tiles_cm[:, :rows, :]
        .reshape(ty_tiles, tx_tiles, rows, tile, tile)
        .transpose(0, 3, 1, 4, 2)
        .reshape(ty_tiles * tile, tx_tiles * tile, rows)
    )
    return img[:height, :width, :]


def tiles_to_image(img_tiles: jax.Array, width: int, height: int, tile: int) -> jax.Array:
    """(T, tile*tile, 3) -> (H, W, 3) (inverse of image_to_tiles, cropping
    any tile padding)."""
    tx_tiles = -(-width // tile)
    ty_tiles = -(-height // tile)
    img = (
        img_tiles.reshape(ty_tiles, tx_tiles, tile, tile, 3)
        .transpose(0, 2, 1, 3, 4)
        .reshape(ty_tiles * tile, tx_tiles * tile, 3)
    )
    return img[:height, :width, :]


def render_tiled_tiles(
    means,
    shs,
    scales,
    opacities,
    rotations,
    active,
    view,
    proj_view,
    cam_pos,
    tan_fovx,
    tan_fovy,
    width: int,
    height: int,
    background,
    sh_degree: int,
    scale_mod=1.0,
    *,
    tile: int = 16,
    chunk: int = 128,
    max_dup: int = 2**19,
    interpret: bool | None = None,
    aa: bool = False,
):
    """Tile-space render: (T, tile*tile, 3) image tiles, background applied.

    The training fast path: losses against pre-tiled truths skip the
    tile->image assembly entirely (see image_to_tiles).  ``aa`` enables
    mip-splat anti-aliasing (transforms.project_splat_components)."""
    if interpret is None:
        interpret = _should_interpret()
    tx_tiles = -(-width // tile)
    ty_tiles = -(-height // tile)
    num_tiles = tx_tiles * ty_tiles

    proj = project_splat_components(
        means, shs, scales, opacities, rotations, active,
        view, proj_view, cam_pos, tan_fovx, tan_fovy,
        width, height, sh_degree, scale_mod, aa=aa,
    )
    bins = bin_splats(
        jax.lax.stop_gradient(proj), width, height, tile, max_dup, chunk
    )

    # rows = splats so the gather AND its autodiff transpose (a row
    # scatter-add of duplicate gradients back per splat) take the fast
    # row-wise DMA path
    feat_rows = jnp.stack(
        [
            proj.mx,
            proj.my,
            proj.ca,
            proj.cb,
            proj.cc,
            proj.cr,
            proj.cg,
            proj.cb2,
            proj.opacity,
        ],
        axis=-1,
    )  # (N, 9)
    gathered = feat_rows[bins.gather_idx]  # (D, 9)
    feat16 = (
        jnp.zeros((max_dup, _F_ROWS), jnp.float32).at[:, :9].set(gathered).T
    )

    composite = _make_composite(
        bins, num_tiles, tile, tx_tiles, chunk, max_dup, interpret
    )
    out = composite(feat16)  # (T, P, 4)

    background = jnp.asarray(background, jnp.float32)
    return out[..., 0:3] + out[..., 3:4] * background[None, None, :]


def render_tiled(
    means,
    shs,
    scales,
    opacities,
    rotations,
    active,
    view,
    proj_view,
    cam_pos,
    tan_fovx,
    tan_fovy,
    width: int,
    height: int,
    background,
    sh_degree: int,
    scale_mod=1.0,
    *,
    tile: int = 16,
    chunk: int = 128,
    max_dup: int = 2**19,
    interpret: bool | None = None,
    aa: bool = False,
):
    """Render (H, W, 3) float32 with the tiled Pallas fast path.

    Differentiable w.r.t. all splat parameters and the background; numerics
    match render_oracle(tile_cull=tile) (tile-granular splat cutoff is the
    INRIA-reference semantic — SURVEY §7 hard part 5)."""
    img_tiles = render_tiled_tiles(
        means, shs, scales, opacities, rotations, active,
        view, proj_view, cam_pos, tan_fovx, tan_fovy,
        width, height, background, sh_degree, scale_mod,
        tile=tile, chunk=chunk, max_dup=max_dup, interpret=interpret, aa=aa,
    )
    return tiles_to_image(img_tiles, width, height, tile)


def render_tiled_model(
    model, camera, width, height, background, scale_mod=1.0,
    train_fov: bool = True, **kw
):
    """Convenience wrapper taking a SplatModel + Camera (host-side matrices)."""
    view = jnp.asarray(camera.get_view())
    proj_view = jnp.asarray(camera.get_proj_view(width / height))
    tan_fovx, tan_fovy = camera.tan_fov(width, height, train=train_fov)
    return render_tiled(
        model.means, model.shs, model.scales, model.opacities, model.rotations,
        model.active_mask(), view, proj_view, jnp.asarray(camera.location),
        tan_fovx, tan_fovy, width, height, background, model.sh_degree, scale_mod,
        **kw,
    )
