"""AOT-precompile the bench programs into the persistent compile cache.

The measurement window on the one tunneled chip is scarce; compiles are
server-side and (observed round 5b) coexist with a running TPU process,
while device EXECUTION does not.  This warms every program bench.py will
trace across the A/B env-flag variants so each bench invocation is a
cache hit:

  - fwdbwd at the headline shape (50k/1024^2, the 2-10 min compile)
  - the grad-gate + kernel-options-gate train programs (128^2)

for each combination of GSPLAT_PALLAS_CUMSUM x GSPLAT_BF16_SLABS.  The
env flags are read at TRACE time inside render_train_grads_batch, so one
process can compile all variants by mutating os.environ between traces.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import (  # noqa: E402
    CAPACITY, CHUNK, FRAMES, GATE_RES, GATE_SPLATS, H, MAX_DUP, N_SPLATS,
    W, WORK_CAP, build_scene,
)
from gaussian_splatterer_tpu.ops.raster_tiled import (  # noqa: E402
    image_to_tiles_cm,
    render_train_grads_batch,
)


def compile_one(label, fn, *args):
    t0 = time.perf_counter()
    try:
        jax.jit(fn).lower(*args).compile()
        print(f"  {label}: compiled in {time.perf_counter() - t0:.0f}s",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"  {label}: FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)


def main():
    big = build_scene(N_SPLATS, CAPACITY, W, H, FRAMES)
    params_b, active_b, views_b, pvs_b, poss_b, txs_b, tys_b, _ = big
    rng = np.random.default_rng(1)
    truths = jnp.asarray(rng.uniform(0, 1, (FRAMES, H, W, 3)).astype(np.float32))
    tt_b = jax.vmap(lambda im: image_to_tiles_cm(im, 32))(truths)
    bgs_b = jnp.zeros((FRAMES, 3), jnp.float32)

    gate = build_scene(GATE_SPLATS, 256, GATE_RES, GATE_RES, 2, seed=11)
    params_g, active_g, views_g, pvs_g, poss_g, txs_g, tys_g, _ = gate
    rng = np.random.default_rng(3)
    tr_g = jnp.asarray(
        rng.uniform(0, 1, (2, GATE_RES, GATE_RES, 3)).astype(np.float32)
    )
    tt_g = jax.vmap(lambda im: image_to_tiles_cm(im, 32))(tr_g)
    bgs_g = jnp.zeros((2, 3), jnp.float32)

    def fwdbwd(p, tt):
        return render_train_grads_batch(
            *p, active_b, views_b, pvs_b, poss_b, txs_b, tys_b, W, H, tt,
            bgs_b, 1, tile=32, max_dup=MAX_DUP, chunk=CHUNK,
            work_cap=WORK_CAP, mm_bf16=True,
        )

    def gate_run(**kw):
        def f(p, t):
            return render_train_grads_batch(
                *p, active_g, views_g, pvs_g, poss_g, txs_g, tys_g,
                GATE_RES, GATE_RES, t, bgs_g, 1, tile=32, max_dup=2**13, **kw,
            )
        return f

    for pc in ("0", "1"):
        for bs in ("0", "1"):
            os.environ["GSPLAT_PALLAS_CUMSUM"] = pc
            os.environ["GSPLAT_BF16_SLABS"] = bs
            print(f"variant cumsum={pc} bf16slabs={bs}:", flush=True)
            compile_one("fwdbwd 50k/1024^2", fwdbwd, params_b, tt_b)
            compile_one("grad-gate", gate_run(mm_bf16=True), params_g, tt_g)
            compile_one("opt-gate default", gate_run(), params_g, tt_g)
            compile_one(
                "opt-gate power+fexp",
                gate_run(mm_power=True, fast_exp=True), params_g, tt_g,
            )
            compile_one(
                "opt-gate bf16+power+fexp",
                gate_run(mm_bf16=True, mm_power=True, fast_exp=True),
                params_g, tt_g,
            )


if __name__ == "__main__":
    main()
