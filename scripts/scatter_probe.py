"""TPU microbenchmark: seed-scatter + cummax costs for packed binning.

Evaluates replacing the binning (5, D) table gather (~25 ms at 1M dups)
with bit-packed seed words: W scatters of N values into D-length buffers
followed by W cummaxes.  Decision data:

  scatter1      — one .at[idx].max into (D,), the current seed build
  scatterW_rows — one batched .at[:, idx].max into (W, D) (shared indices)
  scatterW_sep  — W separate 1-D scatters
  cummaxW_rows  — batched cummax over (W, D) axis=1
  cummaxW_sep   — W separate 1-D cummaxes
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

N = 1 << 19  # seeds (f * n_cap)
D = 1 << 21  # buffer (f * max_dup)
W = 4


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
    idx = jnp.asarray(np.sort(rng.choice(D, size=N, replace=False)).astype(np.int32))
    vals = jnp.asarray(rng.integers(1, 1 << 30, size=(N,)).astype(np.int32))
    valsW = jnp.asarray(rng.integers(1, 1 << 30, size=(W, N)).astype(np.int32))
    bufW = jnp.asarray(rng.integers(0, 1 << 30, size=(W, D)).astype(np.int32))

    @jax.jit
    def scatter1(idx, vals):
        return jnp.zeros((D,), jnp.int32).at[idx].max(vals, mode="drop")

    @jax.jit
    def scatterW_rows(idx, valsW):
        return jnp.zeros((W, D), jnp.int32).at[:, idx].max(valsW, mode="drop")

    @jax.jit
    def scatterW_sep(idx, valsW):
        return [
            jnp.zeros((D,), jnp.int32).at[idx].max(valsW[k], mode="drop")
            for k in range(W)
        ]

    @jax.jit
    def cummaxW_rows(bufW):
        return jax.lax.cummax(bufW, axis=1)

    @jax.jit
    def cummaxW_sep(bufW):
        return [jax.lax.cummax(bufW[k]) for k in range(W)]

    for name, fn, args in [
        ("scatter1      (D,)", scatter1, (idx, vals)),
        ("scatterW_rows (W,D)", scatterW_rows, (idx, valsW)),
        ("scatterW_sep  Wx(D,)", scatterW_sep, (idx, valsW)),
        ("cummaxW_rows  (W,D)", cummaxW_rows, (bufW,)),
        ("cummaxW_sep   Wx(D,)", cummaxW_sep, (bufW,)),
    ]:
        try:
            ms = timeit(fn, *args)
            print(f"{name:24s} {ms:8.2f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:24s} FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
