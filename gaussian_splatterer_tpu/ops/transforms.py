"""Per-splat rasterization math: SH color, covariance, EWA projection.

These are the vectorized (N-splat) building blocks shared by the oracle
rasterizer and the tiled fast path.  Semantics follow the INRIA
diff-gaussian-rasterization pipeline that the reference links as
`CudaRasterizer::Rasterizer::forward/backward` (call sites
src/Trainer.cu:334-412; the submodule itself is not checked out — SURVEY
§2.3 pins the public semantics: EWA projection with 0.3-pixel dilation,
3-sigma radius, SH->RGB with +0.5 offset and zero clamp, near cull at
view-space depth 0.2).

Everything is pure jnp on static shapes; gradients come from jax.grad.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

# Real spherical-harmonics basis constants (bands 0-3).
SH_C0 = 0.28209479177387814
SH_C1 = 0.4886025119029199
SH_C2 = (
    1.0925484305920792,
    -1.0925484305920792,
    0.31539156525252005,
    -1.0925484305920792,
    0.5462742152960396,
)
SH_C3 = (
    -0.5900435899266435,
    2.890611442640554,
    -0.4570457994644658,
    0.3731763325901154,
    -0.4570457994644658,
    1.445305721320277,
    -0.5900435899266435,
)

NEAR_CULL_Z = 0.2  # view-space near cull
DILATION = 0.3  # screen-space covariance dilation (anti-aliasing floor)
ALPHA_MIN = 1.0 / 255.0  # contribution threshold
ALPHA_MAX = 0.99  # per-splat alpha clamp
T_EPS = 1e-4  # transmittance early-termination threshold


def quat_to_rotmat(q: jax.Array) -> jax.Array:
    """(..., 4) scalar-first quaternion -> (..., 3, 3) rotation matrix.

    Quaternions are normalized here; the reference app never renormalizes
    after SGD (src/Trainer.cu:97-99) and relies on the rasterizer doing it.
    """
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    row0 = jnp.stack(
        [1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y)], -1
    )
    row1 = jnp.stack(
        [2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x)], -1
    )
    row2 = jnp.stack(
        [2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y)], -1
    )
    return jnp.stack([row0, row1, row2], -2)


def build_cov3d(scales: jax.Array, rotations: jax.Array, scale_mod) -> jax.Array:
    """(N, 3) scales + (N, 4) quats -> (N, 3, 3) world covariance R S^2 R^T."""
    R = quat_to_rotmat(rotations)
    s2 = jnp.square(scales * scale_mod)  # (N, 3)
    return jnp.einsum("nij,nj,nkj->nik", R, s2, R)


def sh_to_rgb(shs: jax.Array, dirs: jax.Array, sh_degree: int) -> jax.Array:
    """Evaluate SH color: (N, K, 3) coeffs, (N, 3) unit view dirs -> (N, 3).

    Matches the INRIA computeColorFromSH semantics: band sum + 0.5,
    clamped at zero (clamp kills the gradient, which jax.grad reproduces).
    """
    x, y, z = dirs[..., 0:1], dirs[..., 1:2], dirs[..., 2:3]
    c = SH_C0 * shs[:, 0]
    if sh_degree >= 1:
        c = c - SH_C1 * y * shs[:, 1] + SH_C1 * z * shs[:, 2] - SH_C1 * x * shs[:, 3]
    if sh_degree >= 2:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        c = (
            c
            + SH_C2[0] * xy * shs[:, 4]
            + SH_C2[1] * yz * shs[:, 5]
            + SH_C2[2] * (2.0 * zz - xx - yy) * shs[:, 6]
            + SH_C2[3] * xz * shs[:, 7]
            + SH_C2[4] * (xx - yy) * shs[:, 8]
        )
    if sh_degree >= 3:
        c = (
            c
            + SH_C3[0] * y * (3.0 * xx - yy) * shs[:, 9]
            + SH_C3[1] * xy * z * shs[:, 10]
            + SH_C3[2] * y * (4.0 * zz - xx - yy) * shs[:, 11]
            + SH_C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy) * shs[:, 12]
            + SH_C3[4] * x * (4.0 * zz - xx - yy) * shs[:, 13]
            + SH_C3[5] * z * (xx - yy) * shs[:, 14]
            + SH_C3[6] * x * (xx - yy) * shs[:, 15]
        )
    return jnp.maximum(c + 0.5, 0.0)


class ProjectedSplats(NamedTuple):
    """Screen-space splats, padded to N with ``valid`` masking."""

    mean2d: jax.Array  # (N, 2) pixel coordinates
    conic: jax.Array  # (N, 3) inverse 2D covariance (a, b, c): ax^2+2bxy+cy^2
    color: jax.Array  # (N, 3)
    opacity: jax.Array  # (N,)
    depth: jax.Array  # (N,) view-space z (positive in front)
    radius: jax.Array  # (N,) float 3-sigma pixel radius (0 when culled)
    valid: jax.Array  # (N,) bool


def project_splats(
    means: jax.Array,
    shs: jax.Array,
    scales: jax.Array,
    opacities: jax.Array,
    rotations: jax.Array,
    active: jax.Array,
    view: jax.Array,
    proj_view: jax.Array,
    cam_pos: jax.Array,
    tan_fovx,
    tan_fovy,
    width: int,
    height: int,
    sh_degree: int,
    scale_mod=1.0,
) -> ProjectedSplats:
    """The per-splat 'preprocess' stage: 3D gaussians -> 2D screen splats.

    Entirely dense/vectorized: this is pure VPU work that XLA fuses into a
    handful of kernels; culled/padded splats just carry radius 0.
    """
    f32 = jnp.float32
    means = means.astype(f32)
    n = means.shape[0]
    ones = jnp.ones((n, 1), f32)
    hom = jnp.concatenate([means, ones], -1)  # (N, 4)

    p_view = hom @ view.T  # (N, 4)
    depth = p_view[:, 2]
    in_front = depth > NEAR_CULL_Z

    p_hom = hom @ proj_view.T
    p_w = 1.0 / (p_hom[:, 3] + 1e-7)
    p_proj = p_hom[:, :3] * p_w[:, None]

    # 3D covariance -> EWA 2D covariance
    cov3d = build_cov3d(scales.astype(f32), rotations.astype(f32), scale_mod)
    focal_x = width / (2.0 * tan_fovx)
    focal_y = height / (2.0 * tan_fovy)
    tz = depth
    lim_x, lim_y = 1.3 * tan_fovx, 1.3 * tan_fovy
    tzs = jnp.where(jnp.abs(tz) < 1e-12, 1e-12, tz)
    tx = jnp.clip(p_view[:, 0] / tzs, -lim_x, lim_x) * tz
    ty = jnp.clip(p_view[:, 1] / tzs, -lim_y, lim_y) * tz
    zero = jnp.zeros_like(tz)
    # J: (N, 2, 3) Jacobian of the perspective projection at the splat center
    j_row0 = jnp.stack([focal_x / tzs, zero, -focal_x * tx / (tzs * tzs)], -1)
    j_row1 = jnp.stack([zero, focal_y / tzs, -focal_y * ty / (tzs * tzs)], -1)
    J = jnp.stack([j_row0, j_row1], -2)
    Wr = view[:3, :3]  # view rotation (the -lookAt sign rides along, squares away)
    A = J @ Wr  # (N, 2, 3)
    cov2d = jnp.einsum("nij,njk,nlk->nil", A, cov3d, A)  # (N, 2, 2)
    cxx = cov2d[:, 0, 0] + DILATION
    cyy = cov2d[:, 1, 1] + DILATION
    cxy = cov2d[:, 0, 1]

    det = cxx * cyy - cxy * cxy
    det_ok = det != 0.0
    det_safe = jnp.where(det_ok, det, 1.0)
    conic = jnp.stack([cyy / det_safe, -cxy / det_safe, cxx / det_safe], -1)

    mid = 0.5 * (cxx + cyy)
    disc = jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    lambda1 = mid + disc
    radius = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lambda1, 1e-12)))

    # NDC -> pixel centers: ((v + 1) * S - 1) / 2
    px = ((p_proj[:, 0] + 1.0) * width - 1.0) * 0.5
    py = ((p_proj[:, 1] + 1.0) * height - 1.0) * 0.5
    mean2d = jnp.stack([px, py], -1)

    # visible on screen at all?
    on_screen = (
        (px + radius >= 0)
        & (px - radius < width)
        & (py + radius >= 0)
        & (py - radius < height)
    )

    valid = active & in_front & det_ok & on_screen & (radius > 0)

    dirs = means - cam_pos[None, :]
    dirs = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12)
    color = sh_to_rgb(shs.astype(f32), dirs, sh_degree)

    return ProjectedSplats(
        mean2d=mean2d,
        conic=conic,
        color=color,
        opacity=opacities.astype(f32),
        depth=depth,
        radius=jnp.where(valid, radius, 0.0),
        valid=valid,
    )
