"""Path-tracer throughput sweep at 1024^2 (NEXT #2).

The Morton-chunk AABB march was tuned at 256^2 (ray_chunk=16384,
tri_chunk=512); this measures ms per 1-sample 1024^2 frame over the
(ray_chunk, tri_chunk) grid on the mushroom workload, pipelined (dispatch
all samples, block once — the tunnel's ~30 ms per-call latency lies
otherwise).  Run on the real TPU.
"""

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
from quality_run import mushroom_mesh, mushroom_texture  # noqa: E402

from gaussian_splatterer_tpu.models.camera import Camera  # noqa: E402
from gaussian_splatterer_tpu.rt.tracer import RtxHost  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=1024)
    ap.add_argument("--mesh-res", type=int, default=24)
    ap.add_argument("--samples", type=int, default=2)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--ray-chunks", type=str, default="16384,65536,262144")
    ap.add_argument("--tri-chunks", type=str, default="512,1024")
    args = ap.parse_args()

    mesh = mushroom_mesh(args.mesh_res, max(args.mesh_res // 2, 6))
    cam = Camera(
        np.array([0.5, -0.3, -6.0], np.float32), np.zeros(3, np.float32), 60.0
    )
    res = args.res
    for tri_chunk in (int(x) for x in args.tri_chunks.split(",")):
        for ray_chunk in (int(x) for x in args.ray_chunks.split(",")):
            if (res * res) % ray_chunk:
                continue
            rtx = RtxHost(tri_chunk=tri_chunk, ray_chunk=ray_chunk,
                          sample_batch=args.samples)
            rtx.load_model(mesh)
            rtx.load_texture_diffuse(mushroom_texture())
            # warm up / compile with the TIMED sample count: samples is a
            # static jit arg, so a different warmup count would leave a
            # fresh compile inside the timed region
            img = rtx.render(cam, np.zeros(3, np.float32), args.samples,
                             res, res)
            jax.block_until_ready(img)
            t0 = time.perf_counter()
            for _ in range(args.reps):
                img = rtx.render(
                    cam, np.zeros(3, np.float32), args.samples, res, res
                )
            jax.block_until_ready(img)
            dt = time.perf_counter() - t0
            ms = dt * 1e3 / (args.reps * args.samples)
            print(
                f"tri_chunk={tri_chunk} ray_chunk={ray_chunk}: "
                f"{ms:.1f} ms per 1-sample {res}^2 frame "
                f"(mean img {float(np.mean(img)):.4f})",
                flush=True,
            )


if __name__ == "__main__":
    main()
