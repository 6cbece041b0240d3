"""Binary .npz checkpoint: bit-exact model + settings round-trip."""

import numpy as np

from gaussian_splatterer_tpu.config import Project
from gaussian_splatterer_tpu.io.checkpoint import load_checkpoint, save_checkpoint
from gaussian_splatterer_tpu.models.splats import SplatModelHost


def test_checkpoint_roundtrip_bit_exact(tmp_path):
    rng = np.random.default_rng(3)
    m = SplatModelHost(128)
    for _ in range(41):
        m.push_back(rng.normal(0, 1, 3), rng.normal(0, 1, (4, 3)),
                    rng.uniform(0.01, 1, 3), rng.uniform(0, 1),
                    rng.normal(0, 1, 4))
    model = m.to_device()
    proj = Project()
    proj.iterations = 1234
    proj.lrLocation = 42e-6

    path = str(tmp_path / "ck.npz")
    save_checkpoint(path, model, proj)
    back, proj2 = load_checkpoint(path)

    for a, b in zip(
        (model.means, model.shs, model.scales, model.opacities, model.rotations),
        (back.means, back.shs, back.scales, back.opacities, back.rotations),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(back.count) == 41
    assert back.sh_degree == model.sh_degree
    assert proj2.iterations == 1234
    assert proj2.lrLocation == 42e-6


def test_checkpoint_without_project(tmp_path):
    m = SplatModelHost(8)
    m.push_back([0, 0, 0], np.zeros((4, 3)), [1, 1, 1], 0.5, [1, 0, 0, 0])
    path = str(tmp_path / "ck.npz")
    save_checkpoint(path, m.to_device())
    back, proj = load_checkpoint(path)
    assert proj is None
    assert int(back.count) == 1


def test_sharded_checkpoint_roundtrip_preserves_sharding(tmp_path):
    """Orbax-backed distributed checkpoints (io/checkpoint.py): a
    splat-sharded model saves WITHOUT host gathering and restores straight
    into the target sharding — the .npz path funnels everything through
    one process, which defeats FSDP-scale training."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from gaussian_splatterer_tpu.io.checkpoint import (
        load_checkpoint_sharded,
        save_checkpoint_sharded,
    )
    from gaussian_splatterer_tpu.parallel.fsdp import make_2d_mesh, shard_model

    mesh = make_2d_mesh(2, 4)
    rng = np.random.default_rng(3)
    h = SplatModelHost(32)
    h.means[:16] = rng.uniform(-1, 1, (16, 3))
    h.opacities[:16] = rng.uniform(0.1, 1, 16)
    h.scales[:16] = 0.2
    h.rotations[:, 0] = 1.0
    h.count = 16
    model = h.to_device()
    sharded = shard_model(mesh, model)
    proj = Project.app_default()
    proj.iterations = 123

    d = str(tmp_path / "ckpt")
    save_checkpoint_sharded(d, sharded, proj)
    like = shard_model(mesh, SplatModelHost(32).to_device())
    back, proj2 = load_checkpoint_sharded(d, like=like)

    assert back.sh_degree == model.sh_degree
    assert proj2.iterations == 123
    np.testing.assert_array_equal(np.asarray(back.means), np.asarray(model.means))
    np.testing.assert_array_equal(
        np.asarray(back.opacities), np.asarray(model.opacities)
    )
    assert back.means.sharding == like.means.sharding  # restored IN PLACE
    assert int(back.count) == 16

    # second save over the same directory replaces the previous one
    save_checkpoint_sharded(d, sharded, proj)
    again, _ = load_checkpoint_sharded(d)
    np.testing.assert_array_equal(np.asarray(again.means), np.asarray(model.means))
