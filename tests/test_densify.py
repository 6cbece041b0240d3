import jax.numpy as jnp
import numpy as np

from gaussian_splatterer_tpu.config import Project
from gaussian_splatterer_tpu.models.splats import SplatModelHost
from gaussian_splatterer_tpu.train.densify import DensifyParams, densify


def params(**over):
    p = Project()
    for k, v in over.items():
        setattr(p, k, v)
    return DensifyParams.from_project(p)


def base_model(cap=8):
    h = SplatModelHost(cap, 1, 4)
    return h


def run(h, var=None, grad=None, prm=None):
    m = h.to_device()
    c = m.capacity
    var = jnp.zeros(c) if var is None else jnp.asarray(var, jnp.float32)
    grad = jnp.zeros((c, 3)) if grad is None else jnp.asarray(grad, jnp.float32)
    return densify(m, var, grad, prm or params())


def test_noop_when_stable():
    h = base_model()
    h.push_back([0, 0, 0], np.zeros((4, 3)), [0.1, 0.1, 0.1], 1.0, [1, 0, 0, 0])
    out = run(h)
    assert int(out.count) == 1
    np.testing.assert_allclose(np.asarray(out.means[0]), [0, 0, 0])


def test_cull_transparent_and_tiny_stable_compaction():
    h = base_model()
    h.push_back([1, 0, 0], np.zeros((4, 3)), [0.1] * 3, 1.0, [1, 0, 0, 0])
    h.push_back([2, 0, 0], np.zeros((4, 3)), [0.1] * 3, 0.001, [1, 0, 0, 0])  # transparent
    h.push_back([3, 0, 0], np.zeros((4, 3)), [0.001] * 3, 1.0, [1, 0, 0, 0])  # tiny
    h.push_back([4, 0, 0], np.zeros((4, 3)), [0.1] * 3, 0.5, [1, 0, 0, 0])
    out = run(h)
    assert int(out.count) == 2
    # stable order: survivors keep relative order (src/Trainer.cu:524-534)
    np.testing.assert_allclose(np.asarray(out.means[:2, 0]), [1, 4])
    # tail zeroed
    np.testing.assert_allclose(np.asarray(out.opacities[2:]), 0.0)


def test_split_large_volatile_splat():
    h = base_model()
    # largest axis = y; identity rotation
    h.push_back([0, 0, 0], np.zeros((4, 3)), [0.05, 0.2, 0.1], 1.0, [1, 0, 0, 0])
    prm = params(paramDensifyVariance=0.5, paramSplitSize=0.04,
                 paramSplitDistance=1.5, paramSplitScale=0.8)
    out = run(h, var=[10.0] + [0] * 7, prm=prm)
    assert int(out.count) == 2
    # offset = (0, 0.2, 0) * 1.5/2 = (0, 0.15, 0); original +, appended -
    np.testing.assert_allclose(np.asarray(out.means[0]), [0, 0.15, 0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.means[1]), [0, -0.15, 0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.scales[0]), [0.04, 0.16, 0.08], atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.scales[1]), [0.04, 0.16, 0.08], atol=1e-6)


def test_split_respects_rotation():
    h = base_model()
    # 90 deg about z: largest axis x maps to +y
    q = [np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4)]
    h.push_back([0, 0, 0], np.zeros((4, 3)), [0.2, 0.05, 0.1], 1.0, q)
    prm = params(paramDensifyVariance=0.5)
    out = run(h, var=[10.0] + [0] * 7, prm=prm)
    assert int(out.count) == 2
    np.testing.assert_allclose(np.asarray(out.means[0]), [0, 0.15, 0], atol=1e-6)


def test_clone_small_volatile_splat():
    h = base_model()
    h.push_back([1, 1, 1], np.zeros((4, 3)), [0.02, 0.01, 0.03], 1.0, [1, 0, 0, 0])
    prm = params(paramDensifyVariance=0.5, paramCloneDistance=1.6, paramCullSize=0.004)
    grad = np.zeros((8, 3), np.float32)
    grad[0] = [3.0, 0.0, 4.0]  # direction (0.6, 0, 0.8)
    out = run(h, var=[10.0] + [0] * 7, grad=grad, prm=prm)
    assert int(out.count) == 2
    # original unchanged
    np.testing.assert_allclose(np.asarray(out.means[0]), [1, 1, 1], atol=1e-6)
    # clone offset = (R@scale) * dir * 1.6 (componentwise, src/Trainer.cu:508-511)
    expect = np.array([1, 1, 1]) + np.array([0.02, 0.01, 0.03]) * np.array([0.6, 0, 0.8]) * 1.6
    np.testing.assert_allclose(np.asarray(out.means[1]), expect, rtol=1e-5)
    # clone keeps scale
    np.testing.assert_allclose(np.asarray(out.scales[1]), [0.02, 0.01, 0.03], atol=1e-6)


def test_capacity_caps_appends_splits_before_clones():
    h = SplatModelHost(4, 1, 4)
    h.push_back([0, 0, 0], np.zeros((4, 3)), [0.2] * 3, 1.0, [1, 0, 0, 0])  # split
    h.push_back([1, 0, 0], np.zeros((4, 3)), [0.2] * 3, 1.0, [1, 0, 0, 0])  # split
    h.push_back([2, 0, 0], np.zeros((4, 3)), [0.01] * 3, 1.0, [1, 0, 0, 0])  # clone
    prm = params(paramDensifyVariance=0.5)
    grad = np.zeros((4, 3), np.float32)
    grad[2] = [1, 0, 0]
    out = run(h, var=[10.0, 10.0, 10.0, 0.0], grad=grad, prm=prm)
    # capacity 4: only 1 free slot; first split appends, second split and the
    # clone are dropped (reference per-insert capacity check, src/Trainer.cu:460,500)
    assert int(out.count) == 4
    # dropped split still modified in place? Reference: no in-place change when
    # at capacity — our implementation only applies in-place when the append
    # fits, verify splat 1 is untouched
    np.testing.assert_allclose(np.asarray(out.means[1]), [1, 0, 0], atol=1e-6)


def test_cull_and_split_together():
    h = base_model()
    h.push_back([0, 0, 0], np.zeros((4, 3)), [0.2] * 3, 0.001, [1, 0, 0, 0])  # culled
    h.push_back([1, 0, 0], np.zeros((4, 3)), [0.2, 0.1, 0.1], 1.0, [1, 0, 0, 0])  # split
    prm = params(paramDensifyVariance=0.5)
    out = run(h, var=[10.0, 10.0] + [0] * 6, prm=prm)
    # splat 0 culled (classification precedes split; culled splats never split)
    assert int(out.count) == 2
    got = np.sort(np.asarray(out.means[:2, 0]))
    np.testing.assert_allclose(got, [1 - 0.15, 1 + 0.15], atol=1e-6)


def test_densify_invariants_fuzz():
    """Property fuzz: for random models/signals/params, densify preserves
    0 <= count <= capacity, keeps padded tail inert, never produces
    non-finite values, and conserves splats (new = old + appends - culls)."""
    import numpy as np
    import jax.numpy as jnp
    from gaussian_splatterer_tpu.models.splats import SplatModelHost
    from gaussian_splatterer_tpu.train.densify import DensifyParams, densify

    rng = np.random.default_rng(0)
    for trial in range(8):
        cap = int(rng.choice([16, 32, 64]))
        n = int(rng.integers(1, cap + 1))
        m = SplatModelHost(cap)
        for _ in range(n):
            m.push_back(
                rng.normal(0, 1, 3), rng.normal(0, 1, (4, 3)),
                rng.uniform(0.001, 0.5, 3), rng.uniform(0, 1),
                rng.normal(0, 1, 4),
            )
        model = m.to_device()
        var = jnp.asarray(rng.uniform(0, 3, cap).astype(np.float32))
        avg = jnp.asarray(rng.normal(0, 1, (cap, 3)).astype(np.float32))
        params = DensifyParams(
            cull_opacity=jnp.float32(rng.uniform(0, 0.5)),
            cull_size=jnp.float32(rng.uniform(0, 0.1)),
            densify_variance=jnp.float32(rng.uniform(-1, 2)),
            split_size=jnp.float32(rng.uniform(0, 0.3)),
            split_distance=jnp.float32(rng.uniform(0, 2)),
            split_scale=jnp.float32(rng.uniform(0.2, 1)),
            clone_distance=jnp.float32(rng.uniform(0, 2)),
        )
        out = densify(model, var, avg, params)
        cnt = int(out.count)
        assert 0 <= cnt <= cap, f"trial {trial}: count {cnt} out of range"
        for leaf in (out.means, out.shs, out.scales, out.opacities, out.rotations):
            assert np.all(np.isfinite(np.asarray(leaf))), f"trial {trial}: non-finite"
        # padded tail is inert
        assert np.all(np.asarray(out.opacities)[cnt:] == 0.0)
        assert np.all(np.asarray(out.scales)[cnt:] == 0.0)
