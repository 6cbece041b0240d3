"""Data parallelism over truth cameras: shard_map + psum over the mesh.

The reference is strictly single-GPU (SURVEY §2.4) — this is new capability,
designed TPU-first: truth frames are embarrassingly parallel (the reference
proves order doesn't matter because gradients are averaged over all frames,
src/Trainer.cu:416-419), so we shard the frame axis across a ``('camera',)``
device mesh.  Each device scans its local frames through the rasterizer VJP,
the per-splat gradient sums are ``psum``-reduced over ICI, and every device
applies the identical SGD update to its replicated model copy.

Scaling model (How-to-Scale-Your-Model recipe): pick the mesh, annotate
shardings, let XLA place the collectives.  The psum payload is one gradient
set (capacity x ~23 floats) per step — at 50k splats that's ~4.6 MB, far
below ICI bandwidth at any realistic step time; scaling efficiency is
gated by per-device frame count balance, so keep 2F divisible by the mesh
size.

Splat-axis (tensor-parallel analog) sharding for >1M-splat models is the
next axis planned on the same mesh (SURVEY §2.4); the gradient math here
already works per-shard since the update is elementwise.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gaussian_splatterer_tpu.models.splats import SplatModel
from gaussian_splatterer_tpu.train.trainer import (
    CameraBatch,
    LearningRates,
    RenderFn,
    TrainMetrics,
    _default_render,
)

CAMERA_AXIS = "camera"


def make_camera_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (CAMERA_AXIS,))


def make_dp_train_step(
    mesh: Mesh,
    width: int,
    height: int,
    sh_degree: int,
    renderer: str = "tiled",
    render_fn: Optional[RenderFn] = None,
    row_chunk: int = 32,
):
    """Build the sharded (model, truths, cams, lrs) -> (model', metrics) step.

    truths: (2F, H, W, 3) with 2F divisible by the mesh size; white-background
    frames first, then black (src/Trainer.cu:311-314).  Model and learning
    rates are replicated; only the frame axis is sharded.
    """
    render = render_fn if render_fn is not None else _default_render(renderer, row_chunk)
    n_dev = mesh.devices.size

    def local_accumulate(model: SplatModel, truths, cams: CameraBatch, bgs):
        """Sum (not mean) of per-frame gradients over this device's frames."""
        active = model.active_mask()
        params = (model.means, model.shs, model.scales, model.opacities, model.rotations)

        def frame_fn(carry, xs):
            g_sum, var_sum, loss_sum = carry
            truth, view, pv, pos, tx, ty, bg = xs

            def fwd(p):
                means, shs, scales, opac, rot = p
                return render(
                    means, shs, scales, opac, rot, active,
                    view, pv, pos, tx, ty, width, height, bg, sh_degree, 1.0,
                )

            img, pull = jax.vjp(fwd, params)
            residual = truth - img
            g = pull(residual)[0]
            g_sum = jax.tree.map(jnp.add, g_sum, g)
            var_sum = var_sum + jnp.linalg.norm(g[0], axis=-1)
            loss_sum = loss_sum + jnp.mean(jnp.square(residual))
            return (g_sum, var_sum, loss_sum), None

        g0 = jax.tree.map(jnp.zeros_like, params)
        var0 = jnp.zeros((model.capacity,), jnp.float32)
        (g_sum, var_sum, loss_sum), _ = jax.lax.scan(
            frame_fn,
            (g0, var0, jnp.float32(0.0)),
            (truths, cams.view, cams.proj_view, cams.cam_pos,
             cams.tan_fovx, cams.tan_fovy, bgs),
        )
        return g_sum, var_sum, loss_sum

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(CAMERA_AXIS), P(CAMERA_AXIS), P(CAMERA_AXIS), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def step_sharded(model, truths, cams, bgs, lrs):
        g_sum, var_sum, loss_sum = local_accumulate(model, truths, cams, bgs)
        # single fused all-reduce over ICI for every gradient tensor
        g_sum, var_sum, loss_sum = jax.lax.psum(
            (g_sum, var_sum, loss_sum), CAMERA_AXIS
        )
        samples = jnp.float32(truths.shape[0] * n_dev)
        g_means, g_shs, g_scales, g_opac, g_rot = jax.tree.map(
            lambda g: g / samples, g_sum
        )
        new_model = model.replace(
            means=model.means + g_means * lrs.location,
            shs=model.shs + g_shs * lrs.sh,
            scales=jnp.clip(model.scales + g_scales * lrs.scale, 0.0, lrs.scale_max),
            opacities=jnp.clip(model.opacities + g_opac * lrs.opacity, 0.0, 1.0),
            rotations=model.rotations + g_rot * lrs.rotation,
        )
        metrics = TrainMetrics(
            loss=loss_sum / samples, var_loc=var_sum / samples, avg_grad_loc=g_means
        )
        return new_model, metrics

    @jax.jit
    def step(model: SplatModel, truths, cams: CameraBatch, lrs: LearningRates):
        f = cams.num_frames
        assert truths.shape[0] == 2 * f, "need white+black frame per camera"
        assert (2 * f) % n_dev == 0, "2*num_cameras must divide the mesh size"
        cams2 = jax.tree.map(lambda x: jnp.concatenate([x, x], 0), cams)
        bgs = jnp.concatenate(
            [jnp.ones((f, 3), jnp.float32), jnp.zeros((f, 3), jnp.float32)], 0
        )
        return step_sharded(model, truths, cams2, bgs, lrs)

    return step


def shard_truths(mesh: Mesh, truths: jax.Array) -> jax.Array:
    """Place the frame axis of a truth batch across the camera mesh."""
    return jax.device_put(truths, NamedSharding(mesh, P(CAMERA_AXIS)))
