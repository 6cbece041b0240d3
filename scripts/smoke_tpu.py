"""TPU smoke test + quick timing for the tiled rasterizer (not a unit test)."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from gaussian_splatterer_tpu.models.camera import Camera
from gaussian_splatterer_tpu.ops.raster_tiled import render_tiled

print("devices:", jax.devices())

W = H = 1024
N = 50_000
CAP = 65_536

rng = np.random.default_rng(0)
means = np.zeros((CAP, 3), np.float32)
means[:N] = rng.uniform(-3, 3, (N, 3))
shs = np.zeros((CAP, 4, 3), np.float32)
shs[:N] = rng.normal(0, 0.5, (N, 4, 3))
scales = np.zeros((CAP, 3), np.float32)
scales[:N] = rng.uniform(0.01, 0.08, (N, 3))
opac = np.zeros((CAP,), np.float32)
opac[:N] = rng.uniform(0.2, 1.0, N)
rot = np.zeros((CAP, 4), np.float32)
rot[:, 0] = 1.0
rot[:N] = rng.normal(0, 1, (N, 4))
active = np.arange(CAP) < N

cam = Camera(np.array([0.3, -0.2, -10.0], np.float32), np.zeros(3, np.float32), 60.0)
view = jnp.asarray(cam.get_view())
pv = jnp.asarray(cam.get_proj_view(1.0))
tx, ty = cam.tan_fov(W, H, train=True)
pos = jnp.asarray(cam.location)
bg = jnp.zeros(3, jnp.float32)

params = tuple(map(jnp.asarray, (means, shs, scales, opac, rot)))
active = jnp.asarray(active)
MAX_DUP = 2**19


@jax.jit
def fwd(p):
    return render_tiled(*p, active, view, pv, pos, tx, ty, W, H, bg, 1, 1.0,
                        max_dup=MAX_DUP)


@jax.jit
def fwdbwd(p):
    def loss(p):
        img = render_tiled(*p, active, view, pv, pos, tx, ty, W, H, bg, 1, 1.0,
                           max_dup=MAX_DUP)
        return jnp.sum(jnp.square(img))
    l, g = jax.value_and_grad(loss)(p)
    return l, g


t0 = time.perf_counter()
img = fwd(params)
img.block_until_ready()
print(f"fwd compile+run: {time.perf_counter()-t0:.2f}s, img mean {float(img.mean()):.4f}")

# pipelined timing amortizes the axon tunnel's per-call dispatch latency
t0 = time.perf_counter()
jax.block_until_ready([fwd(params) for _ in range(20)])
print(f"fwd pipelined: {(time.perf_counter()-t0)*1e3/20:.1f} ms/frame")

t0 = time.perf_counter()
l, g = fwdbwd(params)
jax.block_until_ready((l, g))
print(f"fwd+bwd compile+run: {time.perf_counter()-t0:.2f}s, loss {float(l):.3f}")

t0 = time.perf_counter()
jax.block_until_ready([fwdbwd(params) for _ in range(20)])
print(f"fwd+bwd pipelined: {(time.perf_counter()-t0)*1e3/20:.1f} ms/frame")
print("grad norm means:", float(jnp.linalg.norm(g[0])))
