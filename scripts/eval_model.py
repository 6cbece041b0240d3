"""Re-evaluate a trained checkpoint's held-out PSNR/SSIM without retraining.

quality_run.py saves ``final.npz`` (model + project) in its --out dir;
this script reloads it, re-captures fresh randomized truth views at an
arbitrary sample count (training truths are MC-noisy — a cleaner eval
ground truth stops the metric from being capped by truth noise), and
reports per-view PSNR/SSIM.

    python scripts/eval_model.py /tmp/ns_r4c [--samples 128] [--views 4]
        [--res 1024] [--scene mushroom --mesh-res 32]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir", help="quality_run --out dir with final.npz")
    ap.add_argument("--samples", type=int, default=128)
    ap.add_argument("--views", type=int, default=4)
    ap.add_argument("--res", type=int, default=1024)
    ap.add_argument("--scene", choices=["cross", "mushroom"],
                    default="mushroom")
    ap.add_argument("--mesh-res", type=int, default=32)
    ap.add_argument("--seed", type=int, default=123,
                    help="rig-rotation seed for the held-out views")
    args = ap.parse_args()

    from quality_run import (
        CROSS_OBJ_VERTS,
        CROSS_TRIS,
        CROSS_UV,
        checker_texture,
        mushroom_mesh,
        mushroom_texture,
    )

    from gaussian_splatterer_tpu.config import RuntimeConfig
    from gaussian_splatterer_tpu.io.checkpoint import load_checkpoint
    from gaussian_splatterer_tpu.io.obj import TriangleMesh
    from gaussian_splatterer_tpu.models.camera import Camera
    from gaussian_splatterer_tpu.rt.tracer import RtxHost
    from gaussian_splatterer_tpu.train.trainer import (
        Trainer,
        randomize_rig_rotations,
    )
    from gaussian_splatterer_tpu.utils.metrics import psnr, ssim

    model, project = load_checkpoint(
        os.path.join(args.run_dir, "final.npz")
    )
    assert project is not None, "final.npz carries no project settings"
    runtime = RuntimeConfig(
        render_resolution_x=args.res, render_resolution_y=args.res,
        splats_capacity=model.capacity, sh_degree=model.sh_degree,
        sh_coeffs=model.shs.shape[1],
    )
    trainer = Trainer(project, runtime, model, renderer="tiled")

    rtx = RtxHost()
    if args.scene == "mushroom":
        rtx.load_model(mushroom_mesh(args.mesh_res,
                                     max(args.mesh_res // 2, 6)))
        rtx.load_texture_diffuse(mushroom_texture())
    else:
        rtx.load_model(TriangleMesh(CROSS_OBJ_VERTS, CROSS_TRIS, CROSS_UV))
        rtx.load_texture_diffuse(checker_texture())

    import random as _random

    randomize_rig_rotations(project, _random.Random(args.seed))
    cams = Camera.get_cameras(project)[: args.views]
    psnrs, ssims = [], []
    for cam in cams:
        truth = rtx.render(cam, (0, 0, 0), args.samples, args.res, args.res)
        pred = trainer.render(cam, args.res, args.res)
        psnrs.append(float(psnr(truth, jnp.clip(pred, 0, 1))))
        ssims.append(float(ssim(truth, jnp.clip(pred, 0, 1))))

    result = {
        "splats": int(model.count),
        "eval_samples": args.samples,
        "psnr_mean": round(float(np.mean(psnrs)), 2),
        "psnr_per_view": [round(p, 2) for p in psnrs],
        "ssim_mean": round(float(np.mean(ssims)), 4),
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
