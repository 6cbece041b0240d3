"""Unit tests for tile binning (ops/binning.py).

Binning is the TPU replacement for the reference rasterizer's
duplicate-with-keys + radix-sort stage (reference call site
src/Trainer.cu:334-360); unlike the reference it works on a fixed-capacity
duplicate buffer, so its edge cases (wide AABBs, overflow) need direct
coverage.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from gaussian_splatterer_tpu.ops.binning import bin_splats
from gaussian_splatterer_tpu.ops.transforms import SplatComponents


def _comps(mx, my, radius, depth=None, n_pad=0):
    n = len(mx)
    depth = depth if depth is not None else np.arange(1, n + 1, dtype=np.float32)
    z = np.zeros(n + n_pad, np.float32)

    def pad(v):
        out = z.copy()
        out[:n] = v
        return jnp.asarray(out)

    valid = np.zeros(n + n_pad, bool)
    valid[:n] = True
    return SplatComponents(
        mx=pad(mx), my=pad(my), ca=pad(np.ones(n)), cb=pad(np.zeros(n)),
        cc=pad(np.ones(n)), cr=pad(np.zeros(n)), cg=pad(np.zeros(n)),
        cb2=pad(np.zeros(n)), opacity=pad(np.ones(n)), depth=pad(depth),
        radius=pad(radius), rx=pad(radius), ry=pad(radius),
        valid=jnp.asarray(valid),
    )


@pytest.mark.parametrize("span_cols", [41, 47, 55, 61])
def test_wide_aabb_exact_decomposition(span_cols):
    """Row/col decomposition of duplicate indices must be exact for AABB
    widths where f32 reciprocal-multiply undershoots at exact multiples
    (floor(41 * f32(1/41)) == 0).  Every covered tile must get exactly one
    duplicate of the splat — no holes, no out-of-AABB spills."""
    tile = 16
    tx_tiles = 64
    width = height = tile * tx_tiles  # 1024; 64x64 tile grid
    rows = 3
    # a splat centered so its AABB is exactly span_cols x rows tiles
    radius = (span_cols * tile) / 2.0 - 1.0
    cx = span_cols * tile / 2.0  # AABB cols [0, span_cols)
    cy = tile * 1.5  # rows [0, rows) when radius_y matches
    comps = _comps([cx], [cy], [radius])
    bins = bin_splats(comps, width, height, tile, max_dup=4096, chunk=128)

    start = np.asarray(bins.tile_start)
    end = np.asarray(bins.tile_end)
    counts = (end - start).reshape(tx_tiles, tx_tiles)  # (ty, tx)

    # the AABB derives from the same tile_aabb the binner uses; recompute
    x0 = max(int(np.floor((cx - radius) / tile)), 0)
    x1 = min(int(np.floor((cx + radius + tile - 1) / tile)), tx_tiles)
    y0 = max(int(np.floor((cy - radius) / tile)), 0)
    y1 = min(int(np.floor((cy + radius + tile - 1) / tile)), tx_tiles)
    assert x1 - x0 == span_cols, "test setup: AABB width must hit span_cols"

    expected = np.zeros_like(counts)
    expected[y0:y1, x0:x1] = 1
    np.testing.assert_array_equal(counts, expected)
    assert int(bins.num_dup) == span_cols * (y1 - y0)


def test_multi_splat_counts_and_depth_order():
    tile = 16
    width = height = 128  # 8x8 tiles
    # splat 0: deep, covers tiles (0..1, 0..1); splat 1: shallow, tile (0,0)
    comps = _comps(
        mx=[16.0, 8.0], my=[16.0, 8.0], radius=[15.0, 4.0],
        depth=np.array([5.0, 1.0], np.float32), n_pad=2,
    )
    bins = bin_splats(comps, width, height, tile, max_dup=256, chunk=128)
    start = np.asarray(bins.tile_start)
    end = np.asarray(bins.tile_end)
    counts = (end - start).reshape(8, 8)
    expected = np.zeros((8, 8), int)
    expected[0:2, 0:2] = 1
    expected[0, 0] = 2
    np.testing.assert_array_equal(counts, expected)
    # depth order within tile (0,0): shallow splat (id 1) composites first
    gather = np.asarray(bins.gather_idx)
    t00 = gather[start[0] : end[0]]
    np.testing.assert_array_equal(t00, [1, 0])


def test_overflow_saturates_and_drops_tail():
    """Duplicates past max_dup are dropped (deepest last) and num_dup
    reports the true total rather than wrapping."""
    tile = 16
    width = height = 128
    comps = _comps(
        mx=[8.0, 64.0, 64.0], my=[8.0, 64.0, 64.0], radius=[4.0, 128.0, 128.0],
        depth=np.array([1.0, 2.0, 3.0], np.float32),
    )
    # splats 1 and 2 cover all 64 tiles each; total = 1 + 64 + 64 = 129
    bins = bin_splats(comps, width, height, tile, max_dup=64, chunk=128)
    assert int(bins.num_dup) == 129
    # only the first 64 duplicates survive: splat 0 then 63 tiles of splat 1
    start = np.asarray(bins.tile_start)
    end = np.asarray(bins.tile_end)
    assert int((end - start).sum()) == 64
