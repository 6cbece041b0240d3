"""Batched JAX Monte-Carlo path tracer — the truth-photograph generator.

TPU-native replacement for the reference's OptiX/OWL ray tracer
(src/rtx/RtxDevice.cu + src/rtx/RtxHost.cpp).  No RT cores on TPU, so
instead of a BVH + divergent per-ray traversal this evaluates
Möller-Trumbore intersection as dense (ray-chunk x triangle-chunk)
component planes — rays on sublanes, triangles on lanes — with a lax.scan
min-reduction over triangle chunks and a bounce while-loop that exits as
soon as every ray in the chunk has terminated.

The PRIMARY pass (every ray shares the eye origin — the bulk of all
intersection work once misses terminate at bounce 0) runs on the MXU:
shared-origin Möller-Trumbore collapses to one (R, 3) x (3, 3*Tc) matmul
per triangle chunk (_intersect_shared; measured 684 -> 1.3 ms per 1-sample
1024² frame — the old per-ray chunk gathers, not the arithmetic, were the
cost).  Scattered bounce rays keep the VPU component form, either brute
force or Morton-chunk AABB culling (_intersect_culled).

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


def _intersect_shared(o3, dx, dy, dz, tris, tri_chunk: int):
    """Möller-Trumbore for a SHARED-origin ray batch (the primary pass:
    every camera ray starts at the eye) as one MXU matmul per tri chunk.

    With a common origin the four MT quantities are all 3-term dots of the
    ray DIRECTION against per-triangle vectors (w = o - a; cyclic triple
    products):
        det   = e1 . (d x e2) = d . (e2 x e1)
        u_num = w  . (d x e2) = d . (e2 x w)
        v_num = d  . (w x e1)
        t_num = e2 . (w x e1)          (per-triangle scalar: no ray term)
    so one (R, 3) x (3, 3*Tc) matmul evaluates det/u_num/v_num for every
    (ray, triangle) pair — ~40 VPU ops/pair in the component form collapse
    to 18 MXU FLOPs/pair + a ~12-op epilogue.  The cancellation-sensitive
    t_num = e2.((o-a) x e1) stays in exact per-triangle f32 (same
    conditioning as the component path), and the matmul runs at
    precision=HIGHEST — the TPU's default single-pass bf16 matmul is
    measured poison for geometry (PERF.md).

    Returns (t, tri_idx, bu, bv) per ray; t = inf on miss — the same
    contract as _intersect_chunked, with u/v/t differing only by f32
    rounding between algebraically equal formulas."""
    r = dx.shape[0]
    n_chunks = tris["ax"].shape[0] // tri_chunk

    wx = o3[0] - tris["ax"]
    wy = o3[1] - tris["ay"]
    wz = o3[2] - tris["az"]
    e1x, e1y, e1z = tris["e1x"], tris["e1y"], tris["e1z"]
    e2x, e2y, e2z = tris["e2x"], tris["e2y"], tris["e2z"]
    # column blocks of the (3, 3T) feature matrix: [e2 x e1 | e2 x w | w x e1]
    fdx = e2y * e1z - e2z * e1y
    fdy = e2z * e1x - e2x * e1z
    fdz = e2x * e1y - e2y * e1x
    fux = e2y * wz - e2z * wy
    fuy = e2z * wx - e2x * wz
    fuz = e2x * wy - e2y * wx
    fvx = wy * e1z - wz * e1y
    fvy = wz * e1x - wx * e1z
    fvz = wx * e1y - wy * e1x
    t_num = e2x * fvx + e2y * fvy + e2z * fvz
    feats = jnp.stack(
        [fdx, fux, fvx, fdy, fuy, fvy, fdz, fuz, fvz]
    )  # (9, T): three rows (d component) x three column blocks
    d_mat = jnp.stack([dx, dy, dz], axis=1)  # (R, 3)

    def chunk_body(carry, ck):
        best_t, best_i, best_u, best_v = carry
        g9 = jax.lax.dynamic_slice_in_dim(
            feats, ck * tri_chunk, tri_chunk, axis=1
        )  # (9, Tc)
        g = g9.reshape(3, 3 * tri_chunk)
        tn = jax.lax.dynamic_slice_in_dim(t_num, ck * tri_chunk, tri_chunk)
        valid = jax.lax.dynamic_slice_in_dim(
            tris["valid"], ck * tri_chunk, tri_chunk
        )
        nums = jax.lax.dot_general(
            d_mat, g, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )  # (R, 3Tc): [det | u_num | v_num] column blocks
        det = nums[:, 0:tri_chunk]
        u_num = nums[:, tri_chunk : 2 * tri_chunk]
        v_num = nums[:, 2 * tri_chunk :]
        inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
        u = u_num * inv_det
        v = v_num * inv_det
        t = tn[None, :] * inv_det
        hit = (
            valid[None, :]
            & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (t > RAY_TMIN)
        )
        t = jnp.where(hit, t, jnp.inf)
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


def _bounce_step(tris, texture, background, env, tri_chunk: int,
                 ox, oy, oz, dx, dy, dz, atten, result, alive, reflected,
                 key, shared_origin=None):
    """One path-tracing bounce for a flat ray batch (the reference device
    loop body, RtxDevice.cu:105-158).  Returns the updated state tuple plus
    this step's raw intersection distance (inf on miss — the primary pass
    uses it for the orb overlay).

    ``env``: optional (He, We, 3) equirectangular environment map replacing
    the reference's hard-coded white-gradient sky for BOUNCED miss rays
    (the RtxDevice.cu:155 TODO; primary misses keep the background color
    per the reference semantic).  Nearest-neighbor lookup."""
    r = ox.shape[0]
    th, tw = texture.shape[0], texture.shape[1]
    kalpha, kscatter = jax.random.split(key)
    if shared_origin is not None:
        # primary pass: all rays share the eye — MXU matmul intersector
        t, tri, bu, bv = _intersect_shared(
            shared_origin, dx, dy, dz, tris, tri_chunk
        )
    else:
        t, tri, bu, bv = _intersect(ox, oy, oz, dx, dy, dz, tris, tri_chunk)
    hit = alive & jnp.isfinite(t)

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

    nx, ny, nz = tris["nx"][tri], tris["ny"][tri], tris["nz"][tri]
    scatter = jnp.stack([nx, ny, nz], -1) + _unit_sphere(kscatter, (r,))

    tsafe = jnp.where(jnp.isfinite(t), t, 0.0)
    ox = jnp.where(hit, ox + tsafe * dx, ox)
    oy = jnp.where(hit, oy + tsafe * dy, oy)
    oz = jnp.where(hit, oz + tsafe * dz, oz)
    dx = jnp.where(solid, scatter[:, 0], dx)
    dy = jnp.where(solid, scatter[:, 1], dy)
    dz = jnp.where(solid, scatter[:, 2], dz)
    atten = jnp.where(solid[:, None], atten * texel[:, 0:3], atten)
    reflected = reflected | solid
    alive = alive & hit  # miss rays are done; hit rays continue

    return (ox, oy, oz, dx, dy, dz, atten, result, alive, reflected), t


def trace_rays(tris, texture, origins, dirs, bounces, background, key,
               tri_chunk: int, env=None):
    """Trace one batch of primary rays to completion.

    origins/dirs: (R, 3).  Returns (color (R, 3), primary_t (R,)) where
    primary_t is the first-hit distance (inf on miss) for the orb overlay.

    The production capture path (render_rtx_sums) instead traces primaries
    for the WHOLE frame, compacts the surviving rays, and only bounce-loops
    the compacted chunks — same math, ~an order of magnitude less device
    work when most primaries miss or terminate early."""
    r = origins.shape[0]
    background = jnp.asarray(background, jnp.float32)
    state = (
        origins[:, 0], origins[:, 1], origins[:, 2],
        dirs[:, 0], dirs[:, 1], dirs[:, 2],
        jnp.ones((r, 3), jnp.float32),   # atten
        jnp.zeros((r, 3), jnp.float32),  # result
        jnp.ones((r,), bool),            # alive
        jnp.zeros((r,), bool),           # reflected
    )
    primary_t = jnp.full((r,), jnp.inf, jnp.float32)

    def cond(s):
        i, state, _, _ = s
        return (i < bounces) & jnp.any(state[8])

    def body(s):
        i, state, primary_t, key = s
        key, kb = jax.random.split(key)
        state, t = _bounce_step(
            tris, texture, background, env, tri_chunk, *state, kb
        )
        primary_t = jnp.where((i == 0) & jnp.isfinite(t), t, primary_t)
        return i + 1, state, primary_t, key

    _, state, primary_t, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), state, primary_t, key)
    )
    result, alive = state[7], state[8]
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

    n_chunks = n_pad // ray_chunk

    def sample_pass(carry, k):
        """One path-traced sample for every pixel, in two phases:

        1. PRIMARY: generate + intersect camera rays for all chunks (one
           bounce step each — no loop).
        2. BOUNCE: compact the surviving rays to the front of the frame
           (stable sort on the dead flag — deterministic, so the culled
           and brute-force intersectors still agree bit-for-bit), then
           run the bounce while-loop per chunk.  All-dead chunks exit
           their loop at iteration 0, so the tail-latency cost of "march
           every chunk until its LAST ray dies" is only paid by the few
           chunks that still hold live rays (typically <10% of rays
           survive the primary bounce: misses die immediately).  Same
           math, ~10x less device work on real captures."""
        color_acc, orb_acc = carry
        kj, kt, kb = jax.random.split(k, 3)

        def primary_chunk(c):
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
            state = (
                o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
                jnp.ones((ray_chunk, 3), jnp.float32),
                jnp.zeros((ray_chunk, 3), jnp.float32),
                jnp.ones((ray_chunk,), bool),
                jnp.zeros((ray_chunk,), bool),
            )
            state, primary_t = _bounce_step(
                tris, texture, background, env, tri_chunk, *state,
                jax.random.fold_in(kt, c), shared_origin=cam_location,
            )
            (sox, soy, soz, sdx, sdy, sdz, atten, result, alive, refl) = state
            rows = jnp.stack([
                sox, soy, soz, sdx, sdy, sdz,
                atten[:, 0], atten[:, 1], atten[:, 2],
                alive.astype(jnp.float32), refl.astype(jnp.float32),
            ])  # (11, ray_chunk)
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
            return rows, jnp.transpose(result), orb

        rows_c, pres_c, orbs = jax.lax.map(
            primary_chunk, jnp.arange(n_chunks, dtype=jnp.int32)
        )  # (NC, 11, R), (NC, 3, R), (NC, R)
        rows = jnp.moveaxis(rows_c, 0, 1).reshape(11, n_pad)
        pres = jnp.moveaxis(pres_c, 0, 1).reshape(3, n_pad)
        alive_primary = rows[9] > 0.5

        # ---- compact: survivors first (one row-gather — the fast path) --
        iota = jnp.arange(n_pad, dtype=jnp.int32)
        _, perm = jax.lax.sort_key_val(
            (~alive_primary).astype(jnp.int32), iota, is_stable=True
        )
        _, inv_perm = jax.lax.sort_key_val(perm, iota, is_stable=False)
        srows = rows[:, perm].reshape(11, n_chunks, ray_chunk)

        def bounce_chunk(args):
            st, c = args  # (11, ray_chunk), ()
            state = (
                st[0], st[1], st[2], st[3], st[4], st[5],
                jnp.transpose(st[6:9]),
                jnp.zeros((ray_chunk, 3), jnp.float32),
                st[9] > 0.5,
                st[10] > 0.5,
            )

            def cond(s):
                i, state, _ = s
                return (i < bounces) & jnp.any(state[8])

            def body(s):
                i, state, key = s
                key, kk = jax.random.split(key)
                state, _ = _bounce_step(
                    tris, texture, background, env, tri_chunk, *state, kk
                )
                return i + 1, state, key

            _, state, _ = jax.lax.while_loop(
                cond, body,
                (jnp.int32(1), state, jax.random.fold_in(kb, c)),
            )
            result, alive = state[7], state[8]
            # rays alive past the bounce cap return black (reference :57)
            result = jnp.where(alive[:, None], 0.0, result)
            return jnp.transpose(result)  # (3, ray_chunk)

        bres_c = jax.lax.map(
            bounce_chunk,
            (jnp.moveaxis(srows, 1, 0), jnp.arange(n_chunks, dtype=jnp.int32)),
        )  # (NC, 3, R)
        bres = jnp.moveaxis(bres_c, 0, 1).reshape(3, n_pad)[:, inv_perm]
        color = jnp.where(alive_primary[None, :], bres, pres)
        color = jnp.clip(jnp.transpose(color), 0.0, 1.0)  # (n_pad, 3)
        return (
            color_acc + color[:n_pix],
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
