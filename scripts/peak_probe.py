"""Measured machine ceilings for the PERF.md roofline (v5e, D2H-fenced).

- VPU f32 FMA throughput: Horner-chain polynomial (data-dependent, not
  constant-foldable), K FMAs per element on a large array.
- VPU transcendental throughput: chained exp.
- MXU f32 matmul throughput at default and HIGHEST precision.

Run alone (one TPU process at a time; block_until_ready through the axon
tunnel is not a fence — every timing closes with np.asarray).
"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

N = 2048 * 2048  # elements
K = 256  # chain length


def timeit(label, fn, *args, flops=None, reps=5):
    f = jax.jit(fn)
    out = f(*args)
    np.asarray(out)  # warm + fence
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    s = np.asarray(jnp.sum(out))  # single D2H fence of a scalar reduce
    del s
    dt = (time.perf_counter() - t0) / reps
    rate = (flops / dt / 1e12) if flops else 0.0
    print(f"{label}: {dt*1e3:.2f} ms" + (f"  -> {rate:.2f} TFLOP/s" if flops else ""))
    return dt


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0.5, 0.6, (N,)).astype(np.float32))
    c = jnp.float32(0.3)

    def horner(x):
        y = x
        for _ in range(K):
            y = y * x + c  # not foldable: depends on per-element x
        return y

    timeit(f"VPU f32 Horner chain (K={K}, {N/1e6:.0f}M elems)",
           horner, x, flops=2.0 * K * N)

    def exp_chain(x):
        y = x * 0.001
        for _ in range(32):
            y = jnp.exp(-y) * 0.5  # stays bounded
        return y

    timeit(f"VPU exp chain (32 exps, {N/1e6:.0f}M elems)",
           exp_chain, x, flops=32.0 * N)  # 'flops' = exp/s here

    m = 4096
    a = jnp.asarray(rng.normal(size=(m, m)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(m, m)).astype(np.float32))
    for prec, label in [
        (jax.lax.Precision.DEFAULT, "MXU f32 matmul DEFAULT (1-pass bf16)"),
        (jax.lax.Precision.HIGHEST, "MXU f32 matmul HIGHEST"),
    ]:
        timeit(
            f"{label} ({m}^3)",
            lambda a, b, p=prec: jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())), precision=p
            ),
            a, b, flops=2.0 * m**3,
        )

    bf = a.astype(jnp.bfloat16), b.astype(jnp.bfloat16)
    timeit(
        f"MXU bf16 matmul ({m}^3)",
        lambda a, b: jax.lax.dot_general(a, b, (((1,), (0,)), ((), ()))),
        *bf, flops=2.0 * m**3,
    )


if __name__ == "__main__":
    main()
