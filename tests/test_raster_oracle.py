import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussian_splatterer_tpu.models.camera import Camera
from gaussian_splatterer_tpu.models.splats import SplatModelHost
from gaussian_splatterer_tpu.ops.raster_reference import (
    composite_pixels,
    render_oracle_model,
    sort_splats_front_to_back,
)
from gaussian_splatterer_tpu.ops.transforms import (
    ALPHA_MAX,
    ALPHA_MIN,
    SH_C0,
    T_EPS,
    ProjectedSplats,
    build_cov3d,
    project_splats,
    quat_to_rotmat,
    sh_to_rgb,
)


def make_camera(dist=5.0, fov=60.0):
    return Camera(np.array([0, 0, dist], np.float32), np.zeros(3, np.float32), fov)


def make_model(n_cap=8):
    return SplatModelHost(n_cap, 1, 4)


def rgb_sh(rgb):
    """SH coeffs that produce a given base color: c = SH_C0*sh0 + 0.5."""
    sh = np.zeros((4, 3), np.float32)
    sh[0] = (np.asarray(rgb) - 0.5) / SH_C0
    return sh


# ---------------------------------------------------------------- transforms

def test_quat_to_rotmat_identity_and_z90():
    np.testing.assert_allclose(
        np.asarray(quat_to_rotmat(jnp.array([1.0, 0, 0, 0]))), np.eye(3), atol=1e-6
    )
    # 90 deg about z: x -> y
    q = jnp.array([np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4)])
    r = np.asarray(quat_to_rotmat(q))
    np.testing.assert_allclose(r @ np.array([1, 0, 0]), [0, 1, 0], atol=1e-6)
    # unnormalized quaternion gets normalized
    r2 = np.asarray(quat_to_rotmat(2.0 * q))
    np.testing.assert_allclose(r, r2, atol=1e-6)


def test_build_cov3d_axis_aligned():
    scales = jnp.array([[1.0, 2.0, 3.0]])
    quats = jnp.array([[1.0, 0, 0, 0]])
    cov = np.asarray(build_cov3d(scales, quats, 1.0))[0]
    np.testing.assert_allclose(cov, np.diag([1.0, 4.0, 9.0]), atol=1e-6)
    # scale modifier is applied before squaring
    cov2 = np.asarray(build_cov3d(scales, quats, 2.0))[0]
    np.testing.assert_allclose(cov2, np.diag([4.0, 16.0, 36.0]), atol=1e-5)


def test_build_cov3d_rotated():
    # 90 deg about z swaps x and y variances
    q = jnp.array([[np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4)]])
    scales = jnp.array([[1.0, 2.0, 0.5]])
    cov = np.asarray(build_cov3d(scales, q, 1.0))[0]
    np.testing.assert_allclose(cov, np.diag([4.0, 1.0, 0.25]), atol=1e-5)


def test_sh_to_rgb_deg0_and_clamp():
    shs = jnp.zeros((2, 4, 3)).at[0, 0, 0].set(1.0).at[1, 0, :].set(-10.0)
    dirs = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (2, 1))
    c = np.asarray(sh_to_rgb(shs, dirs, 0))
    np.testing.assert_allclose(c[0], [SH_C0 + 0.5, 0.5, 0.5], atol=1e-6)
    np.testing.assert_allclose(c[1], 0.0, atol=1e-6)  # clamped at zero


def test_sh_to_rgb_deg1_direction_dependence():
    shs = jnp.zeros((1, 4, 3)).at[0, 3, :].set(1.0)  # x-coefficient
    c_px = np.asarray(sh_to_rgb(shs, jnp.array([[1.0, 0, 0]]), 1))[0]
    c_nx = np.asarray(sh_to_rgb(shs, jnp.array([[-1.0, 0, 0]]), 1))[0]
    # c = 0.5 -+ SH_C1 * x * sh3
    np.testing.assert_allclose(c_px, 0.5 - 0.4886025, atol=1e-5)
    np.testing.assert_allclose(c_nx, 0.5 + 0.4886025, atol=1e-5)


# ---------------------------------------------------------------- projection

def project_host(host, cam, w=64, h=64, scale_mod=1.0):
    m = host.to_device()
    return project_splats(
        m.means, m.shs, m.scales, m.opacities, m.rotations, m.active_mask(),
        jnp.asarray(cam.get_view()), jnp.asarray(cam.get_proj_view(w / h)),
        jnp.asarray(cam.location), *cam.tan_fov(w, h), w, h, m.sh_degree, scale_mod,
    )


def test_project_center_splat():
    host = make_model()
    host.push_back([0, 0, 0], rgb_sh([1, 0, 0]), [0.5] * 3, 1.0, [1, 0, 0, 0])
    cam = make_camera(dist=5.0, fov=60.0)
    pr = project_host(host, cam)
    assert bool(pr.valid[0])
    # center of a 64px image in INRIA pixel coords: ((0+1)*64-1)/2 = 31.5
    np.testing.assert_allclose(np.asarray(pr.mean2d[0]), [31.5, 31.5], atol=1e-3)
    # depth equals camera distance (positive, -lookAt convention)
    np.testing.assert_allclose(float(pr.depth[0]), 5.0, rtol=1e-5)
    # expected screen sigma: focal * s / z with dilation
    focal = 32.0 / np.tan(np.radians(30.0))
    var = (focal * 0.5 / 5.0) ** 2 + 0.3
    np.testing.assert_allclose(float(pr.conic[0][0]), 1.0 / var, rtol=1e-4)
    assert float(pr.radius[0]) == np.ceil(3.0 * np.sqrt(var))
    # padded splats are invalid
    assert not bool(pr.valid[1:].any())


def test_project_culls_behind_camera():
    host = make_model()
    host.push_back([0, 0, 20.0], rgb_sh([1, 1, 1]), [0.5] * 3, 1.0, [1, 0, 0, 0])
    cam = make_camera(dist=5.0)  # camera at z=5 looking at origin; splat behind it
    pr = project_host(host, cam)
    assert not bool(pr.valid[0])


def test_project_culls_offscreen():
    host = make_model()
    host.push_back([100.0, 0, 0], rgb_sh([1, 1, 1]), [0.1] * 3, 1.0, [1, 0, 0, 0])
    cam = make_camera(dist=5.0)
    pr = project_host(host, cam)
    assert not bool(pr.valid[0])


# ---------------------------------------------------------------- compositing

def sequential_composite(pix, splats: ProjectedSplats, bg):
    """Independent numpy reimplementation of the INRIA per-pixel loop
    (front-to-back, alpha tests, early termination)."""
    mean2d = np.asarray(splats.mean2d)
    conic = np.asarray(splats.conic)
    color = np.asarray(splats.color)
    opac = np.asarray(splats.opacity)
    valid = np.asarray(splats.valid)
    out = np.zeros((pix.shape[0], 3), np.float32)
    for p in range(pix.shape[0]):
        T = 1.0
        C = np.zeros(3, np.float32)
        for k in range(mean2d.shape[0]):
            if not valid[k]:
                continue
            dx, dy = pix[p, 0] - mean2d[k, 0], pix[p, 1] - mean2d[k, 1]
            power = -0.5 * (conic[k, 0] * dx * dx + conic[k, 2] * dy * dy) - conic[k, 1] * dx * dy
            if power > 0:
                continue
            alpha = min(ALPHA_MAX, opac[k] * np.exp(power))
            if alpha < ALPHA_MIN:
                continue
            test_T = T * (1 - alpha)
            if test_T < T_EPS:
                break
            C += color[k] * alpha * T
            T = test_T
        out[p] = C + T * np.asarray(bg)
    return out


def random_projected(n, rng, force_dense=False):
    mean2d = rng.uniform(0, 16, (n, 2)).astype(np.float32)
    if force_dense:
        mean2d[:] = 8.0 + rng.normal(0, 0.5, (n, 2))
    # random SPD conics
    a = rng.uniform(0.05, 1.0, n).astype(np.float32)
    c = rng.uniform(0.05, 1.0, n).astype(np.float32)
    b = (rng.uniform(-0.9, 0.9, n) * np.sqrt(a * c)).astype(np.float32)
    conic = np.stack([a, b, c], -1)
    color = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    opac = rng.uniform(0, 1, n).astype(np.float32)
    if force_dense:
        opac[:] = 0.995  # exercise the 0.99 clamp and early termination
    depth = np.sort(rng.uniform(1, 10, n)).astype(np.float32)
    valid = rng.uniform(size=n) > 0.1
    rad = jnp.where(jnp.asarray(valid), 5.0, 0.0)
    return ProjectedSplats(
        mean2d=jnp.asarray(mean2d), conic=jnp.asarray(conic), color=jnp.asarray(color),
        opacity=jnp.asarray(opac), depth=jnp.asarray(depth),
        radius=rad, rx=rad, ry=rad, valid=jnp.asarray(valid),
    )


@pytest.mark.parametrize("force_dense", [False, True])
def test_scanfree_matches_sequential(force_dense):
    rng = np.random.default_rng(0)
    splats = random_projected(60, rng, force_dense=force_dense)
    ys, xs = np.mgrid[0:16, 0:16]
    pix = np.stack([xs.ravel(), ys.ravel()], -1).astype(np.float32)
    bg = np.array([0.2, 0.4, 0.6], np.float32)
    got = np.asarray(composite_pixels(jnp.asarray(pix), splats, jnp.asarray(bg)))
    want = sequential_composite(pix, splats, bg)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_composite_no_splats_gives_background():
    splats = random_projected(4, np.random.default_rng(1))
    splats = splats._replace(valid=jnp.zeros(4, bool))
    pix = jnp.zeros((3, 2), jnp.float32)
    bg = jnp.array([0.1, 0.2, 0.3])
    out = np.asarray(composite_pixels(pix, splats, bg))
    np.testing.assert_allclose(out, np.tile([0.1, 0.2, 0.3], (3, 1)), atol=1e-6)


# ---------------------------------------------------------------- full render

def test_render_red_splat_over_background():
    host = make_model()
    host.push_back([0, 0, 0], rgb_sh([1, 0, 0]), [0.5] * 3, 1.0, [1, 0, 0, 0])
    img = np.asarray(
        render_oracle_model(host.to_device(), make_camera(), 64, 64, [0, 0, 1], row_chunk=16)
    )
    assert img.shape == (64, 64, 3)
    center = img[31, 31]
    assert center[0] > 0.9  # red dominates at the center (alpha ~0.99)
    assert center[2] < 0.05
    corner = img[0, 0]
    np.testing.assert_allclose(corner, [0, 0, 1], atol=1e-3)  # pure background


def test_render_occlusion_order_independent_of_input_order():
    cam = make_camera()
    for order in ([0, 1], [1, 0]):
        host = make_model()
        splats = [
            ([0, 0, 1.0], rgb_sh([1, 0, 0])),  # nearer to camera (camera at z=5)
            ([0, 0, -1.0], rgb_sh([0, 1, 0])),
        ]
        for i in order:
            host.push_back(splats[i][0], splats[i][1], [0.4] * 3, 1.0, [1, 0, 0, 0])
        img = np.asarray(render_oracle_model(host.to_device(), cam, 32, 32, [0, 0, 0], row_chunk=16))
        center = img[15, 15]
        assert center[0] > 0.85, f"front red splat must dominate, got {center}"
        assert center[1] < 0.05


def test_render_transparent_splat_blends():
    host = make_model()
    host.push_back([0, 0, 0], rgb_sh([1, 1, 1]), [0.5] * 3, 0.5, [1, 0, 0, 0])
    img = np.asarray(render_oracle_model(host.to_device(), make_camera(), 32, 32, [0, 0, 0], row_chunk=16))
    center = img[15, 15]
    # ~0.5 alpha over black -> ~0.5 white (slightly less at half-pixel offset)
    assert 0.4 < center[0] < 0.55


def test_render_gradients_match_finite_differences():
    host = make_model()
    host.push_back([0.2, -0.1, 0], rgb_sh([0.8, 0.3, 0.2]), [0.3] * 3, 0.7, [1, 0, 0, 0])
    host.push_back([-0.3, 0.2, 0.5], rgb_sh([0.1, 0.9, 0.4]), [0.25] * 3, 0.5,
                   [0.9, 0.1, 0.2, 0.0])
    model = host.to_device()
    cam = make_camera()
    view = jnp.asarray(cam.get_view())
    pv = jnp.asarray(cam.get_proj_view(1.0))
    loc = jnp.asarray(cam.location)
    tx, ty = cam.tan_fov(32, 32)

    from gaussian_splatterer_tpu.ops.raster_reference import render_oracle

    def loss(means, scales, opacities):
        img = render_oracle(
            means, model.shs, scales, opacities, model.rotations, model.active_mask(),
            view, pv, loc, tx, ty, 32, 32, jnp.array([1.0, 1.0, 1.0]), 1, row_chunk=16,
        )
        return jnp.sum(img * img)

    g_means, g_scales, g_op = jax.grad(loss, argnums=(0, 1, 2))(
        model.means, model.scales, model.opacities
    )
    # finite differences on a few coordinates
    eps = 1e-3
    for arr_name, arr, grad, idx in [
        ("means", model.means, g_means, (0, 0)),
        ("means", model.means, g_means, (1, 2)),
        ("scales", model.scales, g_scales, (0, 1)),
        ("opacities", model.opacities, g_op, (0,)),
        ("opacities", model.opacities, g_op, (1,)),
    ]:
        args = {"means": model.means, "scales": model.scales, "opacities": model.opacities}
        up = args[arr_name].at[idx].add(eps)
        dn = args[arr_name].at[idx].add(-eps)
        args_up = dict(args, **{arr_name: up})
        args_dn = dict(args, **{arr_name: dn})
        fd = (loss(**args_up) - loss(**args_dn)) / (2 * eps)
        got = grad[idx]
        np.testing.assert_allclose(got, fd, rtol=0.05, atol=5e-3,
                                   err_msg=f"{arr_name}{idx}")


def test_sort_pushes_invalid_to_end():
    rng = np.random.default_rng(3)
    splats = random_projected(16, rng)
    s = sort_splats_front_to_back(splats)
    v = np.asarray(s.valid)
    d = np.asarray(s.depth)
    nvalid = v.sum()
    assert v[:nvalid].all() and not v[nvalid:].any()
    assert (np.diff(d[:nvalid]) >= 0).all()


def test_sh_channel_impl_matches_vectorized():
    """Component-wise SH evaluation (fast path) == vectorized sh_to_rgb for
    every supported band, including degree-3 coefficients."""
    import numpy as np
    import jax.numpy as jnp
    from gaussian_splatterer_tpu.ops.transforms import (
        _sh_to_rgb_channels,
        sh_to_rgb,
    )

    rng = np.random.default_rng(0)
    n = 64
    dirs = rng.normal(0, 1, (n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    for degree, k in [(0, 1), (1, 4), (2, 9), (3, 16)]:
        shs = jnp.asarray(rng.normal(0, 1, (n, k, 3)).astype(np.float32))
        ref = sh_to_rgb(shs, jnp.asarray(dirs), degree)
        r, g, b = _sh_to_rgb_channels(
            shs, jnp.asarray(dirs[:, 0]), jnp.asarray(dirs[:, 1]),
            jnp.asarray(dirs[:, 2]), degree,
        )
        got = jnp.stack([r, g, b], -1)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=1e-5,
            err_msg=f"degree {degree}",
        )
