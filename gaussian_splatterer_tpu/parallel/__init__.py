from gaussian_splatterer_tpu.parallel.dp import (
    CAMERA_AXIS,
    make_camera_mesh,
    make_dp_train_step,
    shard_truths,
)
from gaussian_splatterer_tpu.parallel.fsdp import (
    SPLAT_AXIS,
    make_2d_mesh,
    make_fsdp_train_step,
    shard_model,
    shard_truths_2d,
)
from gaussian_splatterer_tpu.parallel.mesh3 import (
    make_3d_mesh,
    make_3d_train_step,
    shard_model_3d,
    shard_truths_3d,
)
from gaussian_splatterer_tpu.parallel.tp import (
    TILE_AXIS,
    make_tile_mesh,
    make_tp_train_step,
    shard_truths_tp,
)

__all__ = [
    "CAMERA_AXIS",
    "SPLAT_AXIS",
    "TILE_AXIS",
    "make_camera_mesh",
    "make_dp_train_step",
    "make_2d_mesh",
    "make_fsdp_train_step",
    "make_3d_mesh",
    "make_3d_train_step",
    "make_tile_mesh",
    "make_tp_train_step",
    "shard_model_3d",
    "shard_truths_3d",
    "shard_model",
    "shard_truths",
    "shard_truths_2d",
    "shard_truths_tp",
    "init_distributed",
]


def init_distributed(**kwargs) -> int:
    """Initialize multi-host JAX (the reference has no distributed backend
    at all — SURVEY §2.4; this is our NCCL/MPI equivalent, riding ICI within
    a slice and DCN across slices).  Returns the global device count.

    Call once per host before building meshes; on a single host it is a
    no-op.  kwargs forward to jax.distributed.initialize (coordinator
    address, num_processes, process_id) for non-TPU or manual setups.
    """
    import jax

    if kwargs or int(__import__("os").environ.get("JAX_NUM_PROCESSES", "1")) > 1:
        jax.distributed.initialize(**kwargs)
    return jax.device_count()
