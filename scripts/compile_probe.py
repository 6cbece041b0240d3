"""Staged compile-time probe for the batched fused train path on TPU.

Isolates which configuration dimension makes the server-side compile slow:
runs render_train_grads_batch at increasing sizes, reporting wall-clock
compile time for each.  Usage: python scripts/compile_probe.py [stage...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_splatterer_tpu.ops.raster_tiled import (
    image_to_tiles_cm,
    render_train_grads_batch,
)

STAGES = {
    # name: (res, tile, frames, n_splats, cap, max_dup[, chunk])
    "tiny": (64, 16, 2, 100, 128, 2**10),
    "small": (256, 32, 4, 5_000, 8_192, 2**14),
    "mid": (256, 32, 8, 30_000, 32_768, 2**17),
    "mid16": (256, 32, 16, 30_000, 32_768, 2**17),
    "big": (1024, 32, 8, 50_000, 65_536, 2**18),
    "big16": (1024, 32, 16, 50_000, 65_536, 2**18),
    "big_t16": (1024, 16, 2, 50_000, 65_536, 2**19),
    "big_t8": (1024, 8, 1, 50_000, 65_536, 2**20),
    "big_c64": (1024, 32, 8, 50_000, 65_536, 2**18, 64),
    "big_c256": (1024, 32, 8, 50_000, 65_536, 2**18, 256),
    "big_c512": (1024, 32, 8, 50_000, 65_536, 2**18, 512),
}


def run_stage(name):
    cfg = STAGES[name]
    res, tile, f, n, cap, max_dup = cfg[:6]
    chunk = cfg[6] if len(cfg) > 6 else 128
    rng = np.random.default_rng(0)
    means = np.zeros((cap, 3), np.float32)
    means[:n] = rng.uniform(-2, 2, (n, 3))
    shs = np.zeros((cap, 4, 3), np.float32)
    shs[:n] = rng.normal(0, 0.4, (n, 4, 3))
    scales = np.zeros((cap, 3), np.float32)
    scales[:n] = rng.uniform(0.02, 0.1, (n, 3))
    opac = np.zeros((cap,), np.float32)
    opac[:n] = rng.uniform(0.3, 1.0, n)
    rot = np.zeros((cap, 4), np.float32)
    rot[:, 0] = 1.0
    active = jnp.asarray(np.arange(cap) < n)

    from gaussian_splatterer_tpu.models.camera import Camera

    cams = [
        Camera(np.array([0.3 * i, -0.2, -8.0 - i], np.float32),
               np.zeros(3, np.float32), 60.0)
        for i in range(f)
    ]
    views = jnp.stack([jnp.asarray(c.get_view()) for c in cams])
    pvs = jnp.stack([jnp.asarray(c.get_proj_view(1.0)) for c in cams])
    poss = jnp.stack([jnp.asarray(c.location) for c in cams])
    tans = np.array([c.tan_fov(res, res, train=True) for c in cams], np.float32)
    truths = jnp.asarray(rng.uniform(0, 1, (f, res, res, 3)).astype(np.float32))
    truth_tiles = jax.vmap(lambda im: image_to_tiles_cm(im, tile))(truths)
    bgs = jnp.zeros((f, 3), jnp.float32)
    params = tuple(map(jnp.asarray, (means, shs, scales, opac, rot)))

    @jax.jit
    def step(params, truth_tiles):
        loss, grads, var, _, nd, nw = render_train_grads_batch(
            *params, active, views, pvs, poss,
            jnp.asarray(tans[:, 0]), jnp.asarray(tans[:, 1]),
            res, res, truth_tiles, bgs, 1,
            tile=tile, max_dup=max_dup, chunk=chunk,
        )
        return loss, grads, var, nd

    t0 = time.perf_counter()
    out = step(params, truth_tiles)
    np.asarray(out[0])  # D2H fence (block_until_ready lies, PERF.md r4)
    t_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    reps = 5
    # dispatch all reps back-to-back (pipelined), then D2H-fence each in
    # order — block_until_ready through the axon tunnel is not a fence
    outs = [step(params, truth_tiles) for _ in range(reps)]
    for o in outs:
        np.asarray(o[0])
    t_run = (time.perf_counter() - t0) / reps
    print(
        f"[{name}] res={res} F={f} max_dup={max_dup}: compile+1st "
        f"{t_compile:.1f}s, step {t_run*1e3:.1f} ms "
        f"({t_run*1e3/f:.2f} ms/frame), loss={float(out[0]):.4f}, "
        f"num_dup={int(out[3])}",
        flush=True,
    )


if __name__ == "__main__":
    names = sys.argv[1:] or ["tiny", "small", "mid", "big"]
    print("platform:", jax.devices()[0].platform, flush=True)
    for nm in names:
        run_stage(nm)
