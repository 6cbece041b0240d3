"""Measured machine ceilings for the PERF.md roofline (v5e).

Run ONE probe per process (`--which ...`): cross-program timings inside a
single process are unreliable through the axon tunnel, and
block_until_ready is not a fence — every timing ends with a D2H copy
(PERF.md round 4).

Probes:
  horner      serial dependent FMA chain (latency-bound lower bound)
  horner_ilp  8 independent interleaved chains (throughput estimate)
  exp         serial dependent exp chain
  exp_ilp     8 independent exp chains
  mm_default / mm_highest / mm_bf16   4096^3 matmuls per precision
  pallas_fma  K FMAs on a VMEM-resident (P, C) block inside a Pallas
              kernel at the train kernel's block shape — the honest VPU
              ceiling for the rasterizer roofline (XLA elementwise probes
              are HBM-bound and undershoot ~4x)
  pallas_exp  same shape, chained exp
"""

import argparse
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

N = 2048 * 2048
K = 256


def bench(fn, *args, work, unit, reps=5, label=""):
    f = jax.jit(fn)
    np.asarray(jnp.sum(f(*args)))  # compile + fence
    t0 = time.perf_counter()
    for _ in range(reps):
        o = f(*args)
    np.asarray(jnp.sum(o))
    dt = (time.perf_counter() - t0) / reps
    print(f"{label}: {dt*1e3:.2f} ms -> {work/dt/1e12:.2f} T{unit}/s")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--which", required=True)
    w = ap.parse_args().which
    rng = np.random.default_rng(0)

    if w in ("pallas_fma", "pallas_exp", "pallas_fma_ilp", "pallas_exp_ilp",
             "pallas_exp_bf16", "pallas_log", "pallas_log_bf16"):
        from jax.experimental import pallas as pl

        P, C, G, KK = 1024, 256, 256, 64  # train-kernel block shape
        ILP = 8  # independent chains: throughput, not FMA-latency
        dtype = jnp.bfloat16 if w.endswith("bf16") else jnp.float32

        def kern(x_ref, o_ref):
            y = x_ref[...]
            x = y
            if w == "pallas_fma":
                for _ in range(KK):
                    y = y * x + 0.3
            elif w == "pallas_fma_ilp":
                # ILP independent accumulator chains interleaved: measures
                # issue THROUGHPUT (the dependent chain above is pure
                # latency and undershoots the kernel's own achieved rate)
                acc = [y * (0.9 + 0.01 * i) for i in range(ILP)]
                for _ in range(KK // ILP):
                    acc = [a * x + 0.3 for a in acc]
                y = acc[0]
                for a in acc[1:]:
                    y = y + a
            elif w == "pallas_exp_ilp":
                acc = [y * (0.9 + 0.01 * i) for i in range(4)]
                for _ in range(4):
                    acc = [jnp.exp(-a) * 0.5 for a in acc]
                y = acc[0] + acc[1] + acc[2] + acc[3]
            elif w in ("pallas_log", "pallas_log_bf16"):
                # log throughput at the kernel's other transcendental
                # (log1p(-alpha) in the transmittance path)
                for _ in range(16):
                    y = jnp.log(y * 0.5 + 0.8)
            else:
                # pallas_exp / pallas_exp_bf16: the bf16 variant asks
                # whether the VPU has a cheaper half-precision
                # transcendental path (it would let the train kernel cast
                # the Gaussian power to bf16 before exp)
                for _ in range(16):
                    y = jnp.exp(-y) * 0.5
            o_ref[...] = y

        x = jnp.asarray(
            rng.uniform(0.5, 0.6, (G, P, C)).astype(np.float32)
        ).astype(dtype)

        def run(x):
            return pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((G, P, C), dtype),
                grid=(G,),
                in_specs=[pl.BlockSpec((1, P, C), lambda g: (g, 0, 0))],
                out_specs=pl.BlockSpec((1, P, C), lambda g: (g, 0, 0)),
            )(x)

        ops = {
            "pallas_fma": 2.0 * KK,
            "pallas_fma_ilp": 2.0 * (KK // ILP) * ILP,
            "pallas_exp": 16.0,
            "pallas_exp_ilp": 16.0,
            "pallas_exp_bf16": 16.0,
            "pallas_log": 16.0,
            "pallas_log_bf16": 16.0,
        }[w] * G * P * C
        unit = "FLOP" if "fma" in w else ("log" if "log" in w else "exp")
        bench(run, x, work=ops, unit=unit, label=f"Pallas {w} ({G}x{P}x{C})")
    elif w in ("horner", "horner_ilp"):
        lanes = 8 if w == "horner_ilp" else 1
        x = jnp.asarray(rng.uniform(0.5, 0.6, (lanes, N // lanes)).astype(np.float32))
        c = jnp.float32(0.3)

        def horner(x):
            # lanes independent chains: the compiler can interleave them,
            # hiding the FMA latency the serial variant exposes
            y = x
            for _ in range(K):
                y = y * x + c
            return y

        bench(horner, x, work=2.0 * K * N, unit="FLOP",
              label=f"VPU f32 Horner K={K} lanes={lanes}")
    elif w in ("exp", "exp_ilp"):
        lanes = 8 if w == "exp_ilp" else 1
        x = jnp.asarray(rng.uniform(0.5, 0.6, (lanes, N // lanes)).astype(np.float32))

        def ec(x):
            y = x * 0.001
            for _ in range(32):
                y = jnp.exp(-y) * 0.5
            return y

        bench(ec, x, work=32.0 * N, unit="exp",
              label=f"VPU exp chain 32x lanes={lanes}")
    else:
        m = 4096
        a = jnp.asarray(rng.normal(size=(m, m)).astype(np.float32))
        b = jnp.asarray(rng.normal(size=(m, m)).astype(np.float32))
        if w == "mm_bf16":
            a, b = a.astype(jnp.bfloat16), b.astype(jnp.bfloat16)
            bench(lambda a, b: a @ b, a, b, work=2.0 * m**3, unit="FLOP",
                  label="MXU bf16 4096^3")
        else:
            prec = {
                "mm_default": jax.lax.Precision.DEFAULT,
                "mm_highest": jax.lax.Precision.HIGHEST,
            }[w]
            bench(
                lambda a, b, p=prec: jax.lax.dot_general(
                    a, b, (((1,), (0,)), ((), ())), precision=p
                ),
                a, b, work=2.0 * m**3, unit="FLOP",
                label=f"MXU f32 {w} 4096^3",
            )


if __name__ == "__main__":
    main()
