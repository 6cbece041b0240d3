"""Splat-count scaling bench: fwd+bwd ms/frame at 50k -> 1M active splats
(VERDICT r3 #2 — the reference's SPLATS_LIMIT envelope, src/Config.h:17).

Scene realism: total screen coverage is held roughly constant by shrinking
splat scales ~ sqrt(50k/N) (a converged densified model covers the object
with more, smaller splats — reference README's own recipe trains 0 -> 50k+
by splitting).  Duplicate counts then grow ~linearly with N (every visible
splat owns >= 1 tile), which is exactly the regime that stresses the
D-sized gradient reduction (sorts/cumsums over f x max_dup) and the window
work list.

Two-phase per size: a probe run with generous buffers reads the true
num_dup/num_work, then the timed run uses tightly-sized buffers (the same
discipline production runs use via calibrate_work_cap / pinned buffers).

Run on the real TPU: python scripts/bench_scale.py [--sizes 50000,200000,...]
Prints one JSON line per size.
"""

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import build_scene  # noqa: E402
from gaussian_splatterer_tpu.ops.raster_tiled import (  # noqa: E402
    image_to_tiles_cm,
    max_frame_group,
    render_train_grads_batch,
)

W = H = 1024
TILE = 32
CHUNK = 256
REPS = 10


def round_chunk(x: int) -> int:
    return -(-int(x) // CHUNK) * CHUNK


def run_size(n_splats: int, frames: int, verbose: bool = True):
    capacity = max(65_536, -(-n_splats // 4096) * 4096)
    params, active, views, pvs, poss, txs, tys, _ = build_scene(
        n_splats, capacity, W, H, frames
    )
    # constant-coverage scaling: radius ~ sqrt(50k/N)
    shrink = np.sqrt(50_000 / n_splats)
    params = (params[0], params[1], params[2] * shrink, params[3], params[4])
    rng = np.random.default_rng(1)
    truths = jnp.asarray(rng.uniform(0, 1, (frames, H, W, 3)).astype(np.float32))
    tt = jax.vmap(lambda im: image_to_tiles_cm(im, TILE))(truths)
    bgs = jnp.zeros((frames, 3), jnp.float32)

    def make(max_dup, work_cap, f):
        @jax.jit
        def fwdbwd(p, t):
            loss, grads, var, _, nd, nw = render_train_grads_batch(
                *p, active, views[:f], pvs[:f], poss[:f], txs[:f], tys[:f],
                W, H, t, bgs[:f], 1,
                tile=TILE, max_dup=max_dup, chunk=CHUNK,
                work_cap=work_cap, mm_bf16=True,
            )
            return loss, grads, nd, nw

        return fwdbwd

    # probe with generous buffers at F=1 to read true counts
    probe_dup = round_chunk(max(2**18, int(n_splats * 2.5)))
    probe = make(probe_dup, None, 1)
    out = probe(params, tt[:1])
    nd, nw = int(out[2]), int(out[3])
    if nd > probe_dup:
        print(f"probe overflowed: {nd} > {probe_dup}", file=sys.stderr)
        probe_dup = round_chunk(int(nd * 1.25))
        probe = make(probe_dup, None, 1)
        out = probe(params, tt[:1])
        nd, nw = int(out[2]), int(out[3])

    max_dup = round_chunk(int(nd * 1.25))
    work_cap = -(-int(nw * 1.5) // 256) * 256
    group = min(frames, max_frame_group(W, H, TILE, max_dup, CHUNK))
    if verbose:
        print(
            f"n={n_splats}: num_dup={nd} num_work={nw} -> max_dup={max_dup} "
            f"work_cap={work_cap} frame_group={group}",
            file=sys.stderr, flush=True,
        )

    fwdbwd = make(max_dup, work_cap, group)
    out = fwdbwd(params, tt[:group])  # compile
    np.asarray(out[0])
    assert int(out[2]) <= max_dup and int(out[3]) <= work_cap
    t0 = time.perf_counter()
    outs = [fwdbwd(params, tt[:group]) for _ in range(REPS)]
    # D2H fence on every rep's loss: block_until_ready through the axon
    # tunnel is not a reliable fence (PERF.md round 4)
    for o in outs:
        np.asarray(o[0])
    ms_per_frame = (time.perf_counter() - t0) * 1e3 / (REPS * group)

    row = {
        "n_splats": n_splats,
        "capacity": capacity,
        "ms_per_frame": round(ms_per_frame, 2),
        "num_dup": nd,
        "max_dup": max_dup,
        "num_work": nw,
        "frame_group": group,
    }
    print(json.dumps(row), flush=True)

    # densify cycle at this capacity (the other scale-sensitive op);
    # guarded so a densify failure still leaves the fwd+bwd row printed
    try:
        from gaussian_splatterer_tpu.config import Project
        from gaussian_splatterer_tpu.models.splats import SplatModel
        from gaussian_splatterer_tpu.train.densify import DensifyParams, densify

        model = SplatModel(
            means=params[0], shs=params[1], scales=params[2],
            opacities=params[3], rotations=params[4],
            count=jnp.asarray(n_splats, jnp.int32), sh_degree=1,
        )
        var = jnp.abs(out[1][0]).sum(-1)
        avg = out[1][0]
        dp = DensifyParams.from_project(Project())
        dfn = jax.jit(lambda m, v, a: densify(m, v, a, dp))
        model2 = dfn(model, var, avg)  # compile
        np.asarray(model2.means)
        t0 = time.perf_counter()
        for _ in range(3):
            model2 = dfn(model, var, avg)
        np.asarray(model2.means)
        row["densify_ms"] = round((time.perf_counter() - t0) * 1e3 / 3, 2)
    except Exception as e:  # noqa: BLE001
        row["densify_error"] = f"{type(e).__name__}: {e}"[:160]
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="50000,200000,500000,1000000")
    ap.add_argument("--frames", type=int, default=8)
    args = ap.parse_args()
    for s in args.sizes.split(","):
        r = run_size(int(s), args.frames)
        if "densify_ms" in r or "densify_error" in r:
            print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
