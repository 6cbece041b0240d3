"""gaussian_splatterer_tpu — a TPU-native (JAX/XLA/Pallas) Gaussian-splat training framework.

A from-scratch rebuild of the capabilities of osreboot/Gaussian-Splatterer
(mesh + texture -> path-traced truth photographs -> differentiable splat
rasterization -> per-feature SGD -> densify), re-designed for TPU:

* All training state is a pytree of fixed-capacity padded arrays
  (XLA-friendly static shapes; the reference's ``capacity``/``count`` model,
  see reference src/ModelSplatsHost.h:11-21, maps directly onto padding +
  a validity count).
* The differentiable rasterizer is tile-binned with scan-free alpha
  compositing (cumulative log-transmittance) instead of a sequential
  front-to-back loop — fully vectorizable on the VPU/MXU.
* The truth "photographer" is a batched JAX path tracer (no RT cores on
  TPU; rays are just data).
* Multi-chip scaling is expressed with jax.sharding meshes + shard_map —
  data-parallel over truth cameras, splat-sharded for large models.

Package layout:
  models/    splat model pytree, cameras
  ops/       rasterization math (SH, covariance, EWA), oracle + tiled rasterizer
  rt/        JAX path tracer for truth generation (mesh, BVH, tracer)
  train/     trainer (capture/train/densify), schedules
  parallel/  device-mesh helpers, sharded train step
  io/        .gobj / OBJ / image / settings-JSON round-trips
  utils/     metrics, logging
  native/    C++ host-side runtime (fast parsers, BVH build)
"""

__version__ = "0.1.0"

import os as _os

# Persistent XLA compile cache by default (first Pallas compiles are slow,
# especially through remote-device tunnels). Opt out: GSPLAT_TPU_NO_CACHE=1.
if not _os.environ.get("GSPLAT_TPU_NO_CACHE"):
    _os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        _os.path.expanduser("~/.cache/jax_gsplat"),
    )

from gaussian_splatterer_tpu.config import Project, CameraSphere, RuntimeConfig  # noqa: F401
from gaussian_splatterer_tpu.models.splats import SplatModel, SplatModelHost  # noqa: F401
from gaussian_splatterer_tpu.models.camera import Camera  # noqa: F401
