"""Tile binning: screen-space splats -> per-tile depth-ordered work lists.

This is the TPU replacement for the INRIA rasterizer's duplicate-with-keys +
GPU radix sort + per-tile ranges stages (reference call site
src/Trainer.cu:334-360; SURVEY §2.3 pins the upstream pipeline).  Instead of
a 64-bit (tileID|depth) radix sort we:

  1. depth-sort the splats once (N keys, stable argsort),
  2. enumerate (splat, covered-tile) duplicate pairs *in depth order* into a
     fixed-capacity buffer (static shapes for XLA).  The pair -> splat
     mapping is a scatter of each splat's first-duplicate position followed
     by a cummax — O(D) instead of a searchsorted whose 17 sequential
     512k-wide gathers measured ~66 ms on a v5e,
  3. stable-sort the pairs by tile id only — stability preserves the depth
     order within each tile, so one cheap int32 single-key sort replaces the
     packed 64-bit sort,
  4. compute per-tile [start, end) ranges by binary search (T queries), and
  5. flatten (tile, chunk-of-CHUNK-splats) work items into one 1-D work list
     whose per-item block indices are scalar-prefetched by the Pallas
     compositing kernel.

Layout rule (see SplatComponents): every per-splat/per-duplicate quantity is
a flat vector so the data axis rides the 128-lane dimension.  Integer
div/mod on wide vectors is done in f32 (exact below 2^24).

Everything here is integer bookkeeping — gradients flow only through the
feature gather done by the caller.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gaussian_splatterer_tpu.ops.transforms import SplatComponents


class TileBins(NamedTuple):
    """Static-shape binning result.

    D = max_dup (duplicate capacity), T = number of tiles,
    W = work-list capacity, B = D // chunk feature blocks.
    """

    gather_idx: jax.Array  # (D,) int32 original splat id per sorted duplicate
    tile_start: jax.Array  # (T,) int32 first duplicate index of each tile
    tile_end: jax.Array  # (T,) int32 one-past-last duplicate index
    work_tile: jax.Array  # (W,) int32 tile id per work item
    work_block: jax.Array  # (W,) int32 feature-block index per work item
    is_first: jax.Array  # (W,) int32 1 when item is its tile's first chunk
    is_last: jax.Array  # (W,) int32 1 when item is its tile's last chunk
    is_pad: jax.Array  # (W,) int32 1 for padding items (skip all compute)
    block_first: jax.Array  # (W,) int32 1 when first item touching work_block
    num_dup: jax.Array  # () int32 total duplicates generated (may exceed D!)


def work_capacity(num_tiles: int, max_dup: int, chunk: int) -> int:
    """Static upper bound on the work-list length: every tile contributes at
    least one item plus at most one extra due to start-alignment, and the
    duplicate buffer contributes at most D/chunk full chunks."""
    return 2 * num_tiles + max_dup // chunk


class TwoPassWork(NamedTuple):
    """Work list for the fused train kernel: each tile's chunks appear twice
    back-to-back — a forward compositing pass, then a gradient replay pass.

    W2 = 2 * work_capacity."""

    work_tile: jax.Array  # (W2,) int32
    work_block: jax.Array  # (W2,) int32
    is_first: jax.Array  # (W2,) 1 on the tile's first pass-1 chunk
    is_last_p1: jax.Array  # (W2,) 1 on the tile's last pass-1 chunk
    is_pass2: jax.Array  # (W2,) 1 during the gradient replay pass
    is_pad: jax.Array  # (W2,) 1 for padding items
    slab_segment: jax.Array  # (W2,) feature-block id for pass-2 slabs, else B


def make_two_pass_worklist(
    bins: TileBins, num_tiles: int, max_dup: int, chunk: int
) -> TwoPassWork:
    i32 = jnp.int32
    num_blocks = max_dup // chunk
    start_blk = bins.tile_start // chunk
    n_chunks = jnp.maximum(1, -(-bins.tile_end // chunk) - start_blk)
    n2 = 2 * n_chunks
    w_offs = jnp.cumsum(n2)
    w_actual = w_offs[-1]
    w_cap2 = 2 * work_capacity(num_tiles, max_dup, chunk)
    w = jnp.arange(w_cap2, dtype=i32)
    wt = jnp.minimum(
        jnp.searchsorted(w_offs, w, side="right").astype(i32), num_tiles - 1
    )
    l = w - (w_offs - n2)[wt]
    npass = n_chunks[wt]
    is_pass2 = l >= npass
    c = l - jnp.where(is_pass2, npass, 0)
    wb = jnp.clip(start_blk[wt] + c, 0, num_blocks - 1)
    pad = w >= w_actual
    is_first = (~pad) & (~is_pass2) & (c == 0)
    is_last_p1 = (~pad) & (~is_pass2) & (c == npass - 1)
    slab_segment = jnp.where((~pad) & is_pass2, wb, num_blocks)
    return TwoPassWork(
        work_tile=wt,
        work_block=wb.astype(i32),
        is_first=is_first.astype(i32),
        is_last_p1=is_last_p1.astype(i32),
        is_pass2=(is_pass2 & ~pad).astype(i32),
        is_pad=pad.astype(i32),
        slab_segment=slab_segment.astype(i32),
    )


def tile_aabb(mx, my, radius, tile: int, tx_tiles: int, ty_tiles: int):
    """Per-splat covered tile rectangle [x0, x1) x [y0, y1), INRIA getRect
    semantics (floor((p - r)/tile) .. floor((p + r + tile - 1)/tile), clipped).

    All args/results are flat (N,) vectors."""
    ftile = jnp.float32(tile)
    x0 = jnp.clip(jnp.floor((mx - radius) / ftile), 0, tx_tiles).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor((my - radius) / ftile), 0, ty_tiles).astype(jnp.int32)
    x1 = jnp.clip(jnp.floor((mx + radius + ftile - 1.0) / ftile), 0, tx_tiles).astype(
        jnp.int32
    )
    y1 = jnp.clip(jnp.floor((my + radius + ftile - 1.0) / ftile), 0, ty_tiles).astype(
        jnp.int32
    )
    return x0, y0, x1, y1


def bin_splats(
    comps: SplatComponents,
    width: int,
    height: int,
    tile: int,
    max_dup: int,
    chunk: int,
) -> TileBins:
    n = comps.mx.shape[0]
    tx_tiles = -(-width // tile)
    ty_tiles = -(-height // tile)
    num_tiles = tx_tiles * ty_tiles
    num_blocks = max_dup // chunk
    i32 = jnp.int32

    # 1. depth order (invalid splats last; stable for deterministic ties)
    order = jnp.argsort(jnp.where(comps.valid, comps.depth, jnp.inf)).astype(i32)
    mx = comps.mx[order]
    my = comps.my[order]
    rad = comps.radius[order]
    vld = comps.valid[order]

    # 2. duplicate enumeration in depth order
    x0, y0, x1, y1 = tile_aabb(mx, my, rad, tile, tx_tiles, ty_tiles)
    spans_x = jnp.maximum(x1 - x0, 0)
    ntiles = jnp.where(vld, spans_x * jnp.maximum(y1 - y0, 0), 0)
    offs = jnp.cumsum(ntiles)  # inclusive, int32
    offs_excl = offs - ntiles
    # The int32 cumsum can wrap past 2^31 duplicates (wide splats x many
    # tiles).  A parallel f32 cumsum is monotone and accurate to ~2^-24
    # relative, so it gates which prefixes are trusted: splats whose true
    # start is < max_dup have an exact (un-wrapped) int32 prefix; everything
    # past max_dup is dropped anyway.  num_dup telemetry saturates instead
    # of wrapping negative.
    offs_f = jnp.cumsum(ntiles.astype(jnp.float32))
    total = jnp.minimum(offs_f[-1], jnp.float32(2**31 - 2**8)).astype(i32)

    # pair d -> depth-ordered splat: scatter each non-empty splat's index+1 at
    # its first duplicate position, then a running max fills the gaps.
    splat_idx = jnp.arange(n, dtype=i32)
    nonempty = (ntiles > 0) & (offs_f - ntiles.astype(jnp.float32) < max_dup)
    starts = jnp.where(nonempty, offs_excl, max_dup)  # dropped when == max_dup
    seed = (
        jnp.zeros((max_dup,), i32).at[starts].max(splat_idx + 1, mode="drop")
    )
    sid = jax.lax.cummax(seed) - 1  # (D,) in [-1, n-1]
    sid_c = jnp.maximum(sid, 0)

    # ONE batched row-gather for all per-splat lookup tables: 1-D int gathers
    # each lowered to a ~4 ms serial fusion on v5e, while a (K, N)[:, idx]
    # gather runs at memory speed.
    tables = jnp.stack([offs_excl, spans_x, x0, y0, order])  # (5, N)
    g = tables[:, sid_c]  # (5, D)
    oe, wdt, gx0, gy0, orig = g[0], g[1], g[2], g[3], g[4]

    d = jnp.arange(max_dup, dtype=i32)
    local = (d - oe).astype(jnp.float32)
    wf = jnp.maximum(wdt, 1).astype(jnp.float32)
    # reciprocal-multiply floor can undershoot by exactly 1 at exact
    # multiples (e.g. floor(41 * f32(1/41)) == 0); it can never overshoot
    # for local < 2^24 and row < 2^16, so one conditional correction after
    # computing the remainder makes the quotient exact.
    row = jnp.floor(local * (1.0 / wf))
    col = local - row * wf
    under = col >= wf
    row = row + under.astype(jnp.float32)
    col = col - jnp.where(under, wf, 0.0)
    tyv = gy0 + row.astype(i32)
    txv = gx0 + col.astype(i32)
    dup_valid = d < jnp.minimum(total, max_dup)
    tid = jnp.where(dup_valid, tyv * tx_tiles + txv, num_tiles).astype(i32)

    # 3. stable single-key sort by tile id (depth order preserved within tile)
    tid_sorted, pos_sorted = jax.lax.sort((tid, orig), num_keys=1, is_stable=True)
    gather_idx = pos_sorted

    # 4. per-tile ranges
    tids = jnp.arange(num_tiles, dtype=i32)
    tile_start = jnp.searchsorted(tid_sorted, tids, side="left").astype(i32)
    tile_end = jnp.searchsorted(tid_sorted, tids, side="right").astype(i32)

    # 5. flat work list (tile-major, chunk-aligned blocks, >=1 item per tile)
    start_blk = tile_start // chunk
    n_chunks = jnp.maximum(1, -(-tile_end // chunk) - start_blk)
    w_offs = jnp.cumsum(n_chunks)  # inclusive
    w_actual = w_offs[-1]
    w_cap = work_capacity(num_tiles, max_dup, chunk)
    w = jnp.arange(w_cap, dtype=i32)
    wtile = jnp.minimum(
        jnp.searchsorted(w_offs, w, side="right").astype(i32), num_tiles - 1
    )
    c_local = w - (w_offs - n_chunks)[wtile]
    work_block = jnp.clip(start_blk[wtile] + c_local, 0, num_blocks - 1)
    pad = w >= w_actual
    is_first = (~pad) & (c_local == 0)
    is_last = (~pad) & (c_local == n_chunks[wtile] - 1)
    prev_block = jnp.concatenate([jnp.full((1,), -1, i32), work_block[:-1]])
    block_first = (~pad) & (work_block != prev_block)

    return TileBins(
        gather_idx=gather_idx,
        tile_start=tile_start,
        tile_end=tile_end,
        work_tile=wtile,
        work_block=work_block.astype(i32),
        is_first=is_first.astype(i32),
        is_last=is_last.astype(i32),
        is_pad=pad.astype(i32),
        block_first=block_first.astype(i32),
        num_dup=total.astype(i32),
    )
