"""Sweep tile/chunk/max_dup over the headline bench scene.

Usage: python scripts/bench_sweep.py --tile 16 --chunk 128 [--max-dup 524288]
Prints ms/frame + the true duplicate count (to size max_dup per config).
"""

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from bench import CAPACITY, FRAMES, H, N_SPLATS, W, build_scene
from gaussian_splatterer_tpu.ops.raster_tiled import (
    image_to_tiles_cm,
    render_train_grads_batch,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tile", type=int, default=32)
    ap.add_argument("--chunk", type=int, default=256)
    ap.add_argument("--max-dup", type=int, default=2**18)
    ap.add_argument("--frames", type=int, default=FRAMES)
    ap.add_argument("--reps", type=int, default=30)
    ap.add_argument("--work-cap", type=int, default=None)
    ap.add_argument("--trace", type=str, default=None)
    ap.add_argument("--fast-exp", action="store_true")
    ap.add_argument("--mm-power", action="store_true")
    ap.add_argument("--n-splats", type=int, default=N_SPLATS,
                    help="scene scale (capacity rounds up to a power of two)")
    args = ap.parse_args()

    capacity = max(CAPACITY, 1 << (args.n_splats - 1).bit_length())
    params, active, views, pvs, poss, txs, tys, cams = build_scene(
        args.n_splats, capacity, W, H, args.frames
    )
    rng = np.random.default_rng(1)
    truths = jnp.asarray(
        rng.uniform(0, 1, (args.frames, H, W, 3)).astype(np.float32)
    )
    truth_tiles = jax.vmap(lambda im: image_to_tiles_cm(im, args.tile))(truths)
    bgs = jnp.zeros((args.frames, 3), jnp.float32)

    @jax.jit
    def fwdbwd(p, tt):
        loss, grads, var, _, nd, nw = render_train_grads_batch(
            *p, active, views, pvs, poss, txs, tys, W, H, tt, bgs, 1,
            tile=args.tile, max_dup=args.max_dup, chunk=args.chunk,
            mm_bf16=True, work_cap=args.work_cap, fast_exp=args.fast_exp,
            mm_power=args.mm_power,
        )
        return loss, grads, nd, nw

    t0 = time.perf_counter()
    out = fwdbwd(params, truth_tiles)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    nd = int(out[2])
    nw = int(out[3])
    t0 = time.perf_counter()
    outs = [fwdbwd(params, truth_tiles) for _ in range(args.reps)]
    jax.block_until_ready(outs)
    ms = (time.perf_counter() - t0) * 1e3 / (args.reps * args.frames)
    if args.trace:
        import sys as _sys
        _sys.path.insert(0, "scripts")
        from profile_train import summarize_trace
        with jax.profiler.trace(args.trace):
            o = [fwdbwd(params, truth_tiles) for _ in range(3)]
            jax.block_until_ready(o)
        summarize_trace(args.trace, steps=3)
    print(
        f"tile={args.tile} chunk={args.chunk} max_dup={args.max_dup} "
        f"frames={args.frames}: {ms:.2f} ms/frame  num_dup={nd} "
        f"(overflow={nd > args.max_dup})  num_work={nw} cap={args.work_cap}  compile={compile_s:.1f}s"
    )


if __name__ == "__main__":
    main()
