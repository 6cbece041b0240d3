"""TPU microbenchmark: alternatives for the 1M-column feature gathers.

The frame-batched train path does three (K, N)[:, idx] column gathers at
~1M indices (raster_tiled.py:707/725, binning.py:225); the profiler shows
each costing 12-25 ms — far off memory speed.  Candidates:

  a. xla_gather      — current: tab[:, idx]
  b. xla_gather_rows — row-major (N, K)[idx, :] row gather
  c. sort_payload    — carry K f32 payloads through the tile sort instead
                       of gathering afterwards (binning already pays one
                       key sort; this measures the marginal payload cost)
  d. take_pallas     — in-VMEM dynamic gather inside a Pallas kernel
                       (jnp.take along the lane axis; Mosaic support is
                       version-dependent — may fail to lower)
  e. onehot_matmul   — (D,128) alignment trick: gather via per-block
                       one-hot matmuls is O(D*N) FLOPs — skipped, sanity
                       bound only.

Timing per the axon-tunnel rules: pipelined dispatch, one block, median of
reps inside ONE process.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

N = 1 << 19  # table columns (f * n_cap at the bench config)
D = 1 << 21  # indices (f * max_dup)
K = 9


def timeit(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(reps)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32))
    tab_rows = jnp.asarray(np.ascontiguousarray(np.asarray(tab).T))
    idx = jnp.asarray(rng.integers(0, N, size=(D,)).astype(np.int32))
    # sorted (tile-ordered) indices — the real gathers use sort outputs,
    # which are far from random but not sorted either
    idx_sorted = jnp.sort(idx)

    @jax.jit
    def xla_gather(tab, idx):
        return tab[:, idx]

    @jax.jit
    def xla_gather_rows(tab_rows, idx):
        return tab_rows[idx, :]

    @jax.jit
    def sort_payload(idx, tab):
        # marginal cost probe: one s32 key sort carrying 9 f32 payloads of
        # length D (the real key is the dup tile id).  Payload rows must be
        # length-D, so gather-free: use broadcasted slices of tab rows.
        pay = [jnp.tile(tab[k, : D // 8], 8)[:D] for k in range(K)]
        out = jax.lax.sort((idx,) + tuple(pay), num_keys=1, is_stable=True)
        return out[1]

    @jax.jit
    def key_sort_only(idx):
        return jax.lax.sort((idx, idx), num_keys=1, is_stable=True)[0]

    for name, fn, args in [
        ("xla_gather      (9,N)[:,idx]", xla_gather, (tab, idx)),
        ("xla_gather_sort (9,N)[:,sorted]", xla_gather, (tab, idx_sorted)),
        ("xla_gather_rows (N,9)[idx,:]", xla_gather_rows, (tab_rows, idx)),
        ("key_sort_only   1 payload", key_sort_only, (idx,)),
        ("sort_payload    9 f32 payloads", sort_payload, (idx, tab)),
    ]:
        try:
            ms = timeit(fn, *args)
            print(f"{name:36s} {ms:8.2f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:36s} FAILED: {type(e).__name__}: {e}", flush=True)

    # d. Pallas in-VMEM dynamic gather: table resident in VMEM, grid over
    # output blocks of 8x128 indices, jnp.take along the flattened table.
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    BLK = 4096  # indices per grid step (32 sublane rows of 128)

    def take_kernel(idx_ref, tab_ref, out_ref):
        ids = idx_ref[...]  # (BLK//128, 128) i32
        tab = tab_ref[...]  # (K8, N) f32 — resident
        out_ref[...] = jnp.take(tab, ids, axis=1)  # (K8, BLK//128, 128)

    K8 = 16

    tab16 = jnp.zeros((K8, N), jnp.float32).at[:K].set(tab)
    idx2d = idx.reshape(D // 128, 128)

    @jax.jit
    def take_pallas(tab16, idx2d):
        return pl.pallas_call(
            take_kernel,
            grid=(D // BLK,),
            in_specs=[
                pl.BlockSpec((BLK // 128, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K8, N), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (K8, BLK // 128, 128), lambda i: (0, i, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((K8, D // 128, 128), jnp.float32),
        )(idx2d, tab16)

    try:
        ms = timeit(take_pallas, tab16, idx2d)
        print(f"{'take_pallas     in-VMEM table':36s} {ms:8.2f} ms", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"take_pallas FAILED: {type(e).__name__}: {e}", flush=True)

    # f. packed-cummax core cost: 6 cummaxes of D int32 (replaces the
    # binning (5,D) gather if chosen)
    @jax.jit
    def cummaxes(x):
        return [jax.lax.cummax(x + k) for k in range(6)]

    ms = timeit(cummaxes, idx)
    print(f"{'6x cummax D':36s} {ms:8.2f} ms", flush=True)


if __name__ == "__main__":
    sys.exit(main())
