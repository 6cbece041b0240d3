"""Debug the bench kernel_options_gate loss mismatch on the real chip.

Runs the gate scene with each optional kernel flag separately and reports
loss + max grad deviation vs the default path, plus the residual-image
deviation, to attribute the BENCH_r02 failure (0.6507 vs 0.6436)."""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import build_scene, GATE_RES, GATE_SPLATS
from gaussian_splatterer_tpu.ops.raster_tiled import (
    image_to_tiles_cm,
    render_train_grads_batch,
)


def main():
    params, active, views, pvs, poss, txs, tys, _ = build_scene(
        GATE_SPLATS, 256, GATE_RES, GATE_RES, 2, seed=11
    )
    rng = np.random.default_rng(3)
    truths = jnp.asarray(
        rng.uniform(0, 1, (2, GATE_RES, GATE_RES, 3)).astype(np.float32)
    )
    tt = jax.vmap(lambda im: image_to_tiles_cm(im, 32))(truths)
    bgs = jnp.zeros((2, 3), jnp.float32)

    def run(**kw):
        loss, grads, _, res8, _, _ = jax.jit(
            lambda p, t: render_train_grads_batch(
                *p, active, views, pvs, poss, txs, tys,
                GATE_RES, GATE_RES, t, bgs, 1,
                tile=32, max_dup=2**13, **kw,
            )
        )(params, tt)
        return float(loss), jax.tree.map(np.asarray, grads), np.asarray(res8)

    l0, g0, r0 = run()
    print(f"default: loss={l0!r}  platform={jax.devices()[0].platform}")
    for name, kw in [
        ("fast_exp", dict(fast_exp=True)),
        ("mm_power", dict(mm_power=True)),
        ("both", dict(mm_power=True, fast_exp=True)),
        ("mm_bf16", dict(mm_bf16=True)),
    ]:
        l1, g1, r1 = run(**kw)
        gdev = max(
            float(np.max(np.abs(a - b)) / max(1e-3, float(np.max(np.abs(a)))))
            for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1))
        )
        rdev = float(np.max(np.abs(r0 - r1)))
        print(
            f"{name:10s}: loss={l1!r}  dloss_rel={abs(l1-l0)/abs(l0):.2e}  "
            f"max_grad_dev={gdev:.2e}  max_res_dev={rdev:.2e}"
        )


if __name__ == "__main__":
    main()
