"""Compile-probe: does a dynamic gather lower inside a Pallas TPU kernel?

The train path's glue is dominated by XLA column gathers that cost ~7 ns
per index (serial row fetches) — feature gather 8.9 ms/step, d_rows 2.4,
lo9 boundary ~3, binning g5 ~3 (PERF.md round-3/5 profiles).  A Pallas
kernel with the lookup TABLE resident in VMEM and `jnp.take` along the
lane axis would run them at memory speed IF Mosaic lowers the gather.
This script answers that with compile-only probes (no timing — run the
bench A/B for that): each form either compiles for the TPU backend or
raises the Mosaic lowering error.

Forms probed:
  a. jnp.take(tab, ids2d, axis=1)          tab (16, N), ids (B//128, 128)
  b. jnp.take_along_axis(tab, ids, axis=1) tab (16, N), ids (16, B)
  c. same as (a) but table blocked over a frame axis

Usage: python scripts/vmem_gather_probe.py   (needs the TPU backend)
"""

import functools
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 4096  # table columns (compile probe only; production uses 65536)
D = 8192
K8 = 16
BLK = 2048


def probe(name, fn, *args):
    try:
        jax.jit(fn).lower(*args).compile()
        print(f"{name:28s} COMPILES", flush=True)
        return True
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:160]
        print(f"{name:28s} FAILED: {type(e).__name__}: {msg}", flush=True)
        return False


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    tab = jnp.ones((K8, N), jnp.float32)
    ids = jnp.zeros((D,), jnp.int32)

    def take_kernel(idx_ref, tab_ref, out_ref):
        ids2 = idx_ref[...]  # (BLK//128, 128)
        out_ref[...] = jnp.take(tab_ref[...], ids2, axis=1)

    def take_axis1(tab, ids):
        return pl.pallas_call(
            take_kernel,
            grid=(D // BLK,),
            in_specs=[
                pl.BlockSpec((BLK // 128, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K8, N), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((K8, BLK // 128, 128), lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((K8, D // 128, 128), jnp.float32),
        )(ids.reshape(D // 128, 128), tab)

    def tala_kernel(idx_ref, tab_ref, out_ref):
        ids2 = idx_ref[...]  # (1, BLK) i32
        idsb = jnp.broadcast_to(ids2, (K8, BLK))
        out_ref[...] = jnp.take_along_axis(tab_ref[...], idsb, axis=1)

    def take_along(tab, ids):
        return pl.pallas_call(
            tala_kernel,
            grid=(D // BLK,),
            in_specs=[
                pl.BlockSpec((1, BLK), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K8, N), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((K8, BLK), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((K8, D), jnp.float32),
        )(ids.reshape(1, D), tab)

    ok_a = probe("a. take axis=1 3d-out", take_axis1, tab, ids)
    ok_b = probe("b. take_along_axis 2d", take_along, tab, ids)
    return 0 if (ok_a or ok_b) else 1


if __name__ == "__main__":
    sys.exit(main())
