"""Batched JAX Monte-Carlo path tracer — the truth-photograph generator.

TPU-native replacement for the reference's OptiX/OWL ray tracer
(src/rtx/RtxDevice.cu + src/rtx/RtxHost.cpp).  No RT cores on TPU, so
instead of a BVH + divergent per-ray traversal this evaluates
Möller-Trumbore intersection as dense (ray-chunk x triangle-chunk)
component planes on the VPU — rays on sublanes, triangles on lanes — with
a lax.scan min-reduction over triangle chunks and a bounce while-loop that
exits as soon as every ray in the chunk has terminated.

Semantics preserved from the reference device program:
  * primary rays: sub-pixel jitter ``pixel + rand2 + 0.5``, NDC point at
    the far plane pushed through the inverse proj-view matrix
    (src/rtx/RtxDevice.cu:75-82)
  * up to 50 bounces; exceeding the cap returns black (:23,57)
  * stochastic alpha transparency: the surface is hit when
    ``texture.w > rand()``, otherwise the ray passes through unchanged
    with color attenuation 1 (:128-143)
  * lambertian scatter ``normal + randomUnitSphere()`` (reflectivity
    constant is 0, so the mirror branch never runs) (:8-14,130-133)
  * flat shading from the raw triangle cross-product normal (:113-114)
  * nearest-neighbor diffuse texture lookup with flipped V (:119-123)
  * miss: white/gray sky ``min(1, 1 + dir.y)``; a primary ray that never
    reflected returns the background color instead (:50,149-158)
  * truth-camera indicator orbs: a primary ray passing within 0.025 of a
    camera location (not occluded by a nearer hit) inverts the final
    averaged pixel color (:36-47,97)
  * per-sample clamp to [0, 1], then average (:85-95)
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_splatterer_tpu.io.image import blank_texture, load_texture_rgba
from gaussian_splatterer_tpu.io.obj import TriangleMesh, load_obj
from gaussian_splatterer_tpu.models.camera import Camera

SPLAT_CAMERA_DOT_SIZE = 0.025  # reference src/rtx/RtxDevice.cuh:8
RAY_TMIN = 1e-3  # bounce ray offset (src/rtx/RtxDevice.cu:53)
MAX_BOUNCES = 50  # src/rtx/RtxDevice.cu:23


def _intersect_chunked(ox, oy, oz, dx, dy, dz, tris, tri_chunk: int):
    """Möller-Trumbore over all triangles for a flat ray batch.

    Rays as (R,) component vectors; ``tris`` is a dict of (Tc_total,)
    per-triangle component vectors padded to a multiple of tri_chunk.
    Returns (t, tri_idx, bu, bv) per ray; t = inf for misses.
    """
    r = ox.shape[0]
    n_chunks = tris["ax"].shape[0] // tri_chunk

    def chunk_body(carry, ck):
        best_t, best_i, best_u, best_v = carry
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, ck * tri_chunk, tri_chunk)
        ax, ay, az = sl(tris["ax"]), sl(tris["ay"]), sl(tris["az"])
        e1x, e1y, e1z = sl(tris["e1x"]), sl(tris["e1y"]), sl(tris["e1z"])
        e2x, e2y, e2z = sl(tris["e2x"]), sl(tris["e2y"]), sl(tris["e2z"])
        valid = sl(tris["valid"])

        # broadcast rays (R, 1) against triangles (1, Tc): one shared
        # Möller-Trumbore predicate for both intersectors
        t, u, v = _mt_hit(
            ox[:, None], oy[:, None], oz[:, None],
            dx[:, None], dy[:, None], dz[:, None],
            ax[None], ay[None], az[None],
            e1x[None], e1y[None], e1z[None],
            e2x[None], e2y[None], e2z[None],
            valid[None],
        )
        j = jnp.argmin(t, axis=1)  # (R,)
        rr = jnp.arange(r)
        tj = t[rr, j]
        closer = tj < best_t
        best_t = jnp.where(closer, tj, best_t)
        best_i = jnp.where(closer, ck * tri_chunk + j, best_i)
        best_u = jnp.where(closer, u[rr, j], best_u)
        best_v = jnp.where(closer, v[rr, j], best_v)
        return (best_t, best_i, best_u, best_v), None

    init = (
        jnp.full((r,), jnp.inf, jnp.float32),
        jnp.zeros((r,), jnp.int32),
        jnp.zeros((r,), jnp.float32),
        jnp.zeros((r,), jnp.float32),
    )
    (t, i, u, v), _ = jax.lax.scan(
        chunk_body, init, jnp.arange(n_chunks, dtype=jnp.int32)
    )
    return t, i, u, v


def _mt_hit(ox, oy, oz, dx, dy, dz, ax, ay, az, e1x, e1y, e1z, e2x, e2y, e2z,
            valid):
    """Möller-Trumbore for (R, Tc) ray x triangle component planes."""
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    tx = ox - ax
    ty = oy - ay
    tz = oz - az
    u = (tx * px + ty * py + tz * pz) * inv_det
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv_det
    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
    hit = valid & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (t > RAY_TMIN)
    return jnp.where(hit, t, jnp.inf), u, v


def _intersect_culled(ox, oy, oz, dx, dy, dz, tris, tri_chunk: int):
    """Acceleration-structure intersection: Morton-ordered triangle chunks
    with AABBs, visited per ray in entry-distance order with early exit.

    No RT cores and no divergent BVH stacks on TPU — instead every ray slab-
    tests all chunk AABBs at once (cheap (R, NC) planes), sorts its passing
    chunks by t_entry, and the batch marches the sorted lists in lockstep,
    stopping when every ray's best hit precedes its next chunk entry.  The
    chunk data loads are per-ray row gathers (the fast TPU gather path).
    """
    r = ox.shape[0]
    nc = tris["bb_minx"].shape[0]

    invx = 1.0 / jnp.where(jnp.abs(dx) < 1e-12, 1e-12, dx)
    invy = 1.0 / jnp.where(jnp.abs(dy) < 1e-12, 1e-12, dy)
    invz = 1.0 / jnp.where(jnp.abs(dz) < 1e-12, 1e-12, dz)

    def slab(mn, mx, o, inv):
        t0 = (mn[None, :] - o[:, None]) * inv[:, None]
        t1 = (mx[None, :] - o[:, None]) * inv[:, None]
        return jnp.minimum(t0, t1), jnp.maximum(t0, t1)

    ax0, ax1 = slab(tris["bb_minx"], tris["bb_maxx"], ox, invx)
    ay0, ay1 = slab(tris["bb_miny"], tris["bb_maxy"], oy, invy)
    az0, az1 = slab(tris["bb_minz"], tris["bb_maxz"], oz, invz)
    t_enter = jnp.maximum(jnp.maximum(ax0, ay0), jnp.maximum(az0, jnp.float32(RAY_TMIN)))
    t_exit = jnp.minimum(jnp.minimum(ax1, ay1), az1)
    key = jnp.where(t_enter <= t_exit, t_enter, jnp.inf)  # (R, NC)
    key_sorted, order = jax.lax.sort_key_val(
        key, jnp.broadcast_to(jnp.arange(nc, dtype=jnp.int32), (r, nc)), dimension=1
    )

    li = jnp.arange(tri_chunk, dtype=jnp.int32)[None, :]  # (1, Tc)
    rr = jnp.arange(r)

    def cond(state):
        s, best_t, *_ = state
        se = jnp.where(s < nc, key_sorted[:, jnp.minimum(s, nc - 1)], jnp.inf)
        return (s < nc) & jnp.any(se < best_t)

    def body(state):
        s, best_t, best_i, best_u, best_v = state
        sc = jnp.minimum(s, nc - 1)
        se = key_sorted[:, sc]  # (R,) this step's chunk entry distance
        ck = order[:, sc]  # (R,) chunk id per ray
        idx = ck[:, None] * tri_chunk + li  # (R, Tc) triangle indices
        g = lambda name: tris[name][idx]
        t, u, v = _mt_hit(
            ox[:, None], oy[:, None], oz[:, None],
            dx[:, None], dy[:, None], dz[:, None],
            g("ax"), g("ay"), g("az"),
            g("e1x"), g("e1y"), g("e1z"),
            g("e2x"), g("e2y"), g("e2z"),
            g("valid"),
        )
        # rays whose best hit already precedes this chunk skip it
        useful = se < best_t
        t = jnp.where(useful[:, None], t, jnp.inf)
        j = jnp.argmin(t, axis=1)
        tj = t[rr, j]
        closer = tj < best_t
        best_t = jnp.where(closer, tj, best_t)
        best_i = jnp.where(closer, idx[rr, j], best_i)
        best_u = jnp.where(closer, u[rr, j], best_u)
        best_v = jnp.where(closer, v[rr, j], best_v)
        return s + 1, best_t, best_i, best_u, best_v

    state = (
        jnp.int32(0),
        jnp.full((r,), jnp.inf, jnp.float32),
        jnp.zeros((r,), jnp.int32),
        jnp.zeros((r,), jnp.float32),
        jnp.zeros((r,), jnp.float32),
    )
    _, t, i, u, v = jax.lax.while_loop(cond, body, state)
    return t, i, u, v


def _intersect(ox, oy, oz, dx, dy, dz, tris, tri_chunk: int):
    if "bb_minx" in tris:
        return _intersect_culled(ox, oy, oz, dx, dy, dz, tris, tri_chunk)
    return _intersect_chunked(ox, oy, oz, dx, dy, dz, tris, tri_chunk)


def _unit_sphere(key, shape):
    """Uniform sample inside the unit ball (gaussian direction x cbrt radius;
    same distribution as the reference's rejection loop, vectorized)."""
    kd, kr = jax.random.split(key)
    g = jax.random.normal(kd, shape + (3,))
    g = g / jnp.maximum(jnp.linalg.norm(g, axis=-1, keepdims=True), 1e-12)
    rad = jax.random.uniform(kr, shape) ** (1.0 / 3.0)
    return g * rad[..., None]


def trace_rays(tris, texture, origins, dirs, bounces, background, key,
               tri_chunk: int, env=None):
    """Trace one batch of primary rays to completion.

    origins/dirs: (R, 3).  Returns (color (R, 3), primary_t (R,)) where
    primary_t is the first-hit distance (inf on miss) for the orb overlay.

    ``env``: optional (He, We, 3) equirectangular environment map replacing
    the reference's hard-coded white-gradient sky for BOUNCED miss rays
    (the RtxDevice.cu:155 TODO; primary misses keep the background color
    per the reference semantic).  Nearest-neighbor lookup."""
    r = origins.shape[0]
    ox, oy, oz = origins[:, 0], origins[:, 1], origins[:, 2]
    dx, dy, dz = dirs[:, 0], dirs[:, 1], dirs[:, 2]
    th, tw = texture.shape[0], texture.shape[1]

    atten = jnp.ones((r, 3), jnp.float32)
    result = jnp.zeros((r, 3), jnp.float32)
    alive = jnp.ones((r,), bool)
    reflected = jnp.zeros((r,), bool)
    primary_t = jnp.full((r,), jnp.inf, jnp.float32)

    def cond(state):
        i, _, _, _, _, alive, _, _, _ = state
        return (i < bounces) & jnp.any(alive)

    def body(state):
        i, (ox, oy, oz), (dx, dy, dz), atten, result, alive, reflected, primary_t, key = state
        key, kalpha, kscatter = jax.random.split(key, 3)
        t, tri, bu, bv = _intersect(ox, oy, oz, dx, dy, dz, tris, tri_chunk)
        hit = alive & jnp.isfinite(t)
        primary_t = jnp.where((i == 0) & jnp.isfinite(t), t, primary_t)

        # miss: sky color; never-reflected primary rays get the background
        if env is None:
            sky = jnp.minimum(1.0, 1.0 + dy)[:, None]
        else:
            eh, ew = env.shape[0], env.shape[1]
            u = jnp.arctan2(dz, dx) * (0.5 / jnp.pi) + 0.5
            v = jnp.arccos(jnp.clip(dy, -1.0, 1.0)) * (1.0 / jnp.pi)
            exi = jnp.clip((u * ew).astype(jnp.int32), 0, ew - 1)
            eyi = jnp.clip((v * eh).astype(jnp.int32), 0, eh - 1)
            sky = env[eyi, exi]
        miss_color = atten * sky
        miss_out = jnp.where(reflected[:, None], miss_color, background[None, :])
        missed = alive & ~jnp.isfinite(t)
        result = jnp.where(missed[:, None], miss_out, result)

        # surface data at the hit
        uvx = (1.0 - bu - bv) * tris["uv0x"][tri] + bu * tris["uv1x"][tri] + bv * tris["uv2x"][tri]
        uvy = (1.0 - bu - bv) * tris["uv0y"][tri] + bu * tris["uv1y"][tri] + bv * tris["uv2y"][tri]
        # nearest-neighbor, wrap addressing, flipped V
        px = jnp.mod(jnp.floor(uvx * tw), tw).astype(jnp.int32)
        py = jnp.mod(jnp.floor((1.0 - uvy) * th), th).astype(jnp.int32)
        texel = texture[py, px]  # (R, 4)

        # stochastic alpha: texture.w > rand -> material hit
        u_alpha = jax.random.uniform(kalpha, (r,))
        solid = hit & (texel[:, 3] > u_alpha)
        passthrough = hit & ~solid

        nx, ny, nz = tris["nx"][tri], tris["ny"][tri], tris["nz"][tri]
        scatter = jnp.stack([nx, ny, nz], -1) + _unit_sphere(kscatter, (r,))

        tsafe = jnp.where(jnp.isfinite(t), t, 0.0)
        hx = ox + tsafe * dx
        hy = oy + tsafe * dy
        hz = oz + tsafe * dz
        ox = jnp.where(hit, hx, ox)
        oy = jnp.where(hit, hy, oy)
        oz = jnp.where(hit, hz, oz)
        dx = jnp.where(solid, scatter[:, 0], dx)
        dy = jnp.where(solid, scatter[:, 1], dy)
        dz = jnp.where(solid, scatter[:, 2], dz)
        atten = jnp.where(solid[:, None], atten * texel[:, 0:3], atten)
        reflected = reflected | solid
        alive = alive & hit  # miss rays are done; hit rays continue

        return (i + 1, (ox, oy, oz), (dx, dy, dz), atten, result, alive,
                reflected, primary_t, key)

    state = (jnp.int32(0), (ox, oy, oz), (dx, dy, dz), atten, result, alive,
             reflected, primary_t, key)
    state = jax.lax.while_loop(cond, body, state)
    _, _, _, _, result, alive, _, primary_t, _ = state
    # rays still alive after the bounce cap return black (already zeros)
    result = jnp.where(alive[:, None], 0.0, result)
    return result, primary_t


def render_rtx_sums(
    tris,
    texture,
    cam_location,
    inv_proj_view,
    width: int,
    height: int,
    samples: int,
    background,
    key,
    splat_cameras: Optional[jax.Array] = None,
    bounces: int = MAX_BOUNCES,
    ray_chunk: int = 16384,
    tri_chunk: int = 512,
    env: Optional[jax.Array] = None,
):
    """One dispatch of ``samples`` paths per pixel: returns the flat
    (n_pix, 3) color SUM and (n_pix,) orb-overlay mask, so the host can
    split a capture across several bounded dispatches (one giant
    all-samples program wedged/killed the tunneled TPU worker at
    1024^2 x 32 samples — ~19 minutes of queued device time)."""
    background = jnp.asarray(background, jnp.float32)
    cam_location = jnp.asarray(cam_location, jnp.float32)
    n_pix = width * height
    # pad the flat pixel list to a chunk multiple (odd resolutions would
    # otherwise need a pathological chunk size); pad rays re-trace pixel 0
    # and are cropped on return
    n_pad = -(-n_pix // ray_chunk) * ray_chunk

    pix = jnp.minimum(jnp.arange(n_pad, dtype=jnp.int32), n_pix - 1)
    pxi = (pix % width).astype(jnp.float32)
    pyi = (pix // width).astype(jnp.float32)

    def sample_pass(carry, k):
        color_acc, orb_acc = carry
        kj, kt = jax.random.split(k)

        def chunk_fn(c):
            px = jax.lax.dynamic_slice_in_dim(pxi, c * ray_chunk, ray_chunk)
            py = jax.lax.dynamic_slice_in_dim(pyi, c * ray_chunk, ray_chunk)
            kk = jax.random.fold_in(kj, c)
            j = jax.random.uniform(kk, (ray_chunk, 2))
            fx = px + j[:, 0] + 0.5
            fy = py + j[:, 1] + 0.5
            nx = fx * 2.0 / width - 1.0
            ny = fy * 2.0 / height - 1.0
            # component-wise 4x4 apply at z=w=1: a jnp matmul here runs at
            # the TPU's default bf16 matmul precision, and the projective w
            # (~near/far cancellation, e.g. 4.995 - 5.005) cancels to garbage
            # -> inf/NaN ray directions.  FMA chains stay f32 on the VPU.
            m = inv_proj_view
            fwx = m[0, 0] * nx + m[0, 1] * ny + m[0, 2] + m[0, 3]
            fwy = m[1, 0] * nx + m[1, 1] * ny + m[1, 2] + m[1, 3]
            fwz = m[2, 0] * nx + m[2, 1] * ny + m[2, 2] + m[2, 3]
            fww = m[3, 0] * nx + m[3, 1] * ny + m[3, 2] + m[3, 3]
            inv_w = 1.0 / fww
            dx = fwx * inv_w - cam_location[0]
            dy = fwy * inv_w - cam_location[1]
            dz = fwz * inv_w - cam_location[2]
            dn = 1.0 / jnp.maximum(jnp.sqrt(dx * dx + dy * dy + dz * dz), 1e-12)
            d = jnp.stack([dx * dn, dy * dn, dz * dn], -1)
            o = jnp.broadcast_to(cam_location, (ray_chunk, 3))
            color, primary_t = trace_rays(
                tris, texture, o, d, bounces, background,
                jax.random.fold_in(kt, c), tri_chunk, env,
            )
            color = jnp.clip(color, 0.0, 1.0)
            # orb overlay: primary ray passes near a truth camera, not occluded
            if splat_cameras is not None and splat_cameras.shape[0] > 0:
                rel = splat_cameras[None, :, :] - o[:, None, :]  # (R, K, 3)
                tproj = jnp.sum(d[:, None, :] * rel, -1)  # (R, K)
                closest = o[:, None, :] + d[:, None, :] * tproj[..., None]
                delta = splat_cameras[None, :, :] - closest
                near = jnp.sum(delta * delta, -1) < SPLAT_CAMERA_DOT_SIZE**2
                # orbs only IN FRONT of the eye: a rig camera at the eye
                # itself (previewTruth) gives tproj = 0 / delta = 0 for
                # every ray and would invert the whole image; cameras
                # behind the eye would draw phantom dots on the ray's
                # backward extension
                visible = (tproj > 1e-6) & (tproj <= primary_t[:, None])
                orb = jnp.any(near & visible, axis=1)
            else:
                orb = jnp.zeros((ray_chunk,), bool)
            return color, orb

        cols, orbs = jax.lax.map(chunk_fn, jnp.arange(n_pad // ray_chunk))
        return (
            color_acc + cols.reshape(n_pad, 3)[:n_pix],
            orb_acc | orbs.reshape(n_pad)[:n_pix],
        ), None

    keys = jax.random.split(key, samples)
    (color, orb), _ = jax.lax.scan(
        sample_pass,
        (jnp.zeros((n_pix, 3), jnp.float32), jnp.zeros((n_pix,), bool)),
        keys,
    )
    return color, orb


def finish_rtx(color_sum, orb, samples: int, width: int, height: int):
    """Combine (possibly multi-dispatch) sample sums into the final image."""
    color = color_sum / samples
    color = jnp.where(orb[:, None], 1.0 - color, color)
    return color.reshape(height, width, 3)


def render_rtx(*args, samples: int = None, width: int = None,
               height: int = None, **kwargs):
    """Render one truth photograph: (H, W, 3) float32 in [0, 1].

    Single-dispatch convenience over render_rtx_sums + finish_rtx (the
    RtxHost production path batches dispatches instead)."""
    if samples is None or width is None or height is None:
        raise TypeError("render_rtx requires width=, height=, samples=")
    color_sum, orb = render_rtx_sums(
        *args, width=width, height=height, samples=samples, **kwargs
    )
    return finish_rtx(color_sum, orb, samples, width, height)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _morton3(q: np.ndarray) -> np.ndarray:
    """(T, 3) int64 coords in [0, 1024) -> interleaved Morton codes."""
    def spread(x):
        x = (x | (x << 16)) & 0x030000FF
        x = (x | (x << 8)) & 0x0300F00F
        x = (x | (x << 4)) & 0x030C30C3
        x = (x | (x << 2)) & 0x09249249
        return x

    return spread(q[:, 0]) | (spread(q[:, 1]) << 1) | (spread(q[:, 2]) << 2)


class RtxHost:
    """Host-side scene owner: mesh + texture upload, render dispatch.

    Mirror of the reference RtxHost (src/rtx/RtxHost.{h,cpp}): owns the
    scene, rebuilds device buffers when geometry or texture changes, renders
    black with no model loaded, mid-gray fallback texture."""

    def __init__(self, tri_chunk: int = 512, ray_chunk: int = 16384,
                 sample_batch: int = 8):
        self.tri_chunk = tri_chunk
        self.ray_chunk = ray_chunk
        # samples per DISPATCH: one all-samples program at 1024^2 x 32
        # queued ~19 min of device work and killed the tunneled worker;
        # batching bounds each dispatch and syncs between them
        self.sample_batch = sample_batch
        self.mesh: Optional[TriangleMesh] = None
        self._tris = None
        self._texture = jnp.asarray(blank_texture())
        self._env = None  # optional equirect sky (load_environment)
        self._render = jax.jit(
            render_rtx_sums,
            static_argnames=("width", "height", "samples", "bounces",
                            "ray_chunk", "tri_chunk"),
        )
        self._seed = 0

    # -- scene management (reference RtxHost::loadModel / loadTextureDiffuse)
    def load_model(self, source, progress=None, accel_min: int = 2 * 512) -> None:
        mesh = source if isinstance(source, TriangleMesh) else load_obj(source, progress)
        self.mesh = mesh
        t = mesh.num_triangles
        tc = max(self.tri_chunk, _round_up(t, self.tri_chunk))
        v = mesh.vertices
        tri = mesh.triangles
        tri_uv_src = mesh.tri_uv
        # Morton-order the triangles so fixed-size chunks are spatially
        # coherent; per-chunk AABBs then cull most chunks per ray (the BVH
        # substitute — SURVEY §7 hard part 4)
        use_accel = t >= accel_min
        if use_accel and t > 0:
            cent = (v[tri[:, 0]] + v[tri[:, 1]] + v[tri[:, 2]]) / 3.0
            lo, hi = cent.min(0), cent.max(0)
            q = np.clip(
                ((cent - lo) / np.maximum(hi - lo, 1e-12) * 1023.0), 0, 1023
            ).astype(np.int64)
            order = np.argsort(_morton3(q), kind="stable")
            tri = tri[order]
            tri_uv_src = tri_uv_src[order]
        a = np.zeros((tc, 3), np.float32)
        e1 = np.zeros((tc, 3), np.float32)
        e2 = np.zeros((tc, 3), np.float32)
        a[:t] = v[tri[:, 0]]
        e1[:t] = v[tri[:, 1]] - v[tri[:, 0]]
        e2[:t] = v[tri[:, 2]] - v[tri[:, 0]]
        n = np.cross(e1[:t], e2[:t])
        n = n / np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
        nrm = np.zeros((tc, 3), np.float32)
        nrm[:t] = n
        uv = np.zeros((tc, 3, 2), np.float32)
        uv[:t] = tri_uv_src
        valid = np.zeros((tc,), bool)
        valid[:t] = True
        self._tris = {
            "ax": jnp.asarray(a[:, 0]), "ay": jnp.asarray(a[:, 1]), "az": jnp.asarray(a[:, 2]),
            "e1x": jnp.asarray(e1[:, 0]), "e1y": jnp.asarray(e1[:, 1]), "e1z": jnp.asarray(e1[:, 2]),
            "e2x": jnp.asarray(e2[:, 0]), "e2y": jnp.asarray(e2[:, 1]), "e2z": jnp.asarray(e2[:, 2]),
            "nx": jnp.asarray(nrm[:, 0]), "ny": jnp.asarray(nrm[:, 1]), "nz": jnp.asarray(nrm[:, 2]),
            "uv0x": jnp.asarray(uv[:, 0, 0]), "uv0y": jnp.asarray(uv[:, 0, 1]),
            "uv1x": jnp.asarray(uv[:, 1, 0]), "uv1y": jnp.asarray(uv[:, 1, 1]),
            "uv2x": jnp.asarray(uv[:, 2, 0]), "uv2y": jnp.asarray(uv[:, 2, 1]),
            "valid": jnp.asarray(valid),
        }
        if use_accel:
            nc = tc // self.tri_chunk
            corners = np.stack([a, a + e1, a + e2])  # (3, tc, 3)
            big = np.float32(np.inf)
            mn = np.where(valid[None, :, None], corners, big).min(0)
            mx = np.where(valid[None, :, None], corners, -big).max(0)
            mn = mn.reshape(nc, self.tri_chunk, 3).min(1)
            mx = mx.reshape(nc, self.tri_chunk, 3).max(1)
            self._tris.update({
                "bb_minx": jnp.asarray(mn[:, 0]), "bb_miny": jnp.asarray(mn[:, 1]),
                "bb_minz": jnp.asarray(mn[:, 2]),
                "bb_maxx": jnp.asarray(mx[:, 0]), "bb_maxy": jnp.asarray(mx[:, 1]),
                "bb_maxz": jnp.asarray(mx[:, 2]),
            })

    def load_texture_diffuse(self, source) -> None:
        tex = source if isinstance(source, np.ndarray) else load_texture_rgba(source)
        self._texture = jnp.asarray(tex, jnp.float32)

    def load_environment(self, source) -> None:
        """Equirectangular sky map for bounced miss rays (None resets to
        the reference's white-gradient sky): (H, W, 3) float array in
        [0, 1] or an image path."""
        if source is None:
            self._env = None
            return
        if isinstance(source, (str, bytes)):
            rgba = load_texture_rgba(source)
            self._env = jnp.asarray(rgba[..., :3], jnp.float32)
        else:
            self._env = jnp.asarray(source, jnp.float32)

    def reset(self) -> None:
        self.mesh = None
        self._tris = None
        self._texture = jnp.asarray(blank_texture())
        self._env = None

    # -- render (reference RtxHost::render) -----------------------------
    def render(
        self,
        camera: Camera,
        background,
        samples: int,
        width: int = 1024,
        height: int = 1024,
        splat_cameras=None,
        bounces: int = MAX_BOUNCES,
        seed: Optional[int] = None,
    ):
        if self._tris is None:
            return jnp.zeros((height, width, 3), jnp.float32)  # no model: black
        inv_pv = jnp.asarray(
            np.linalg.inv(camera.get_proj_view(width / height).astype(np.float64))
            .astype(np.float32)
        )
        if seed is None:
            self._seed += 1
            seed = self._seed
        cams = None
        if splat_cameras is not None and len(splat_cameras):
            cams = jnp.asarray(np.stack([np.asarray(c, np.float32) for c in splat_cameras]))
        rc = self.ray_chunk  # render_rtx_sums pads W*H up to a multiple
        key = jax.random.PRNGKey(seed)
        color_sum, orb = None, None
        done = 0
        while done < samples:
            b = min(self.sample_batch, samples - done)
            c, o = self._render(
                self._tris, self._texture, camera.location, inv_pv,
                width=width, height=height, samples=b,
                background=jnp.asarray(background, jnp.float32),
                key=jax.random.fold_in(key, done), splat_cameras=cams,
                bounces=bounces, ray_chunk=rc, tri_chunk=self.tri_chunk,
                env=self._env,
            )
            color_sum = c if color_sum is None else color_sum + c
            orb = o if orb is None else orb | o
            # sync per batch: bound the queued device work (see
            # sample_batch) and surface worker faults at the right spot
            jax.block_until_ready(color_sum)
            done += b
        return finish_rtx(color_sum, orb, samples, width, height)
