"""End-to-end pipeline on CPU: OBJ -> path-traced truths -> tiled-rasterizer
training -> densify -> checkpoint round-trip (BASELINE configs 2-4 shape)."""

import numpy as np
import pytest

from gaussian_splatterer_tpu.app.session import Session
from gaussian_splatterer_tpu.config import Project, RuntimeConfig

OBJ = """\
v -1.2 -1.2 0
v 1.2 -1.2 0
v 1.2 1.2 0
v -1.2 1.2 0
v 0 -1.2 -1.2
v 0 1.2 -1.2
v 0 1.2 1.2
v 0 -1.2 1.2
vt 0 0
vt 1 0
vt 1 1
vt 0 1
f 1/1 2/2 3/3 4/4
f 5/1 6/2 7/3 8/4
"""


@pytest.fixture()
def session(tmp_path):
    p = tmp_path / "cross.obj"
    p.write_text(OBJ)
    proj = Project.app_default()
    proj.sphere1.count = 3
    proj.rtSamples = 6
    proj.intervalCapture = 0  # no random re-capture: deterministic loss curve
    proj.intervalDensify = 0
    runtime = RuntimeConfig(
        render_resolution_x=32, render_resolution_y=32,
        splats_capacity=512, max_dup=2**11, tile_px=16,
    )
    s = Session(project=proj, runtime=runtime, renderer="tiled")
    s.load_model_obj(str(p))
    return s


def test_capture_data_parallel_knob(tmp_path):
    """RuntimeConfig.capture_data_parallel shards Session captures over
    the virtual devices; training proceeds normally on the result."""
    p = tmp_path / "cross.obj"
    p.write_text(OBJ)
    proj = Project.app_default()
    proj.sphere1.count = 3
    proj.rtSamples = 4
    proj.intervalCapture = 0
    proj.intervalDensify = 0
    runtime = RuntimeConfig(
        render_resolution_x=32, render_resolution_y=32,
        splats_capacity=512, max_dup=2**11, tile_px=16,
        capture_data_parallel=True,
    )
    s = Session(project=proj, runtime=runtime, renderer="tiled")
    s.load_model_obj(str(p))
    s.init_field("model")
    s.capture()
    assert s.trainer.truths is not None
    m = s.train(1)
    assert np.isfinite(float(m.loss))


def test_training_reduces_loss(session):
    session.init_field("model")
    session.capture()
    # larger LRs for a steep 25-step signal; the paramScaleMax clamp snaps
    # oversized model-field splats at step 1 (reference semantics,
    # src/Trainer.cu:94), so measure from the post-clamp state
    p = session.project
    p.lrLocation *= 20; p.lrSh *= 20; p.lrScale *= 20
    p.lrOpacity *= 20; p.lrRotation *= 20
    losses = []
    for _ in range(25):
        losses.append(float(session.train(1).loss))
    assert losses[-1] < losses[1], f"no improvement: {losses[1]} -> {losses[-1]}"


def test_densify_step_runs_in_pipeline(session):
    session.init_field("mono")
    session.capture()
    session.train(3)
    n_before = int(session.model.count)
    session.project.paramDensifyVariance = -1.0  # force all splats volatile
    m = session.train(1, densify=True)
    assert np.isfinite(float(m.loss))
    assert int(session.model.count) >= n_before  # split/clone appended


def test_checkpoint_resume_identical(session, tmp_path):
    session.init_field("model")
    session.capture()
    session.train(5)
    d = str(tmp_path / "ckpt")
    session.save_project(d)

    s2 = Session(
        project=Project.app_default(),
        runtime=session.runtime,
        renderer="tiled",
    )
    s2.load_project(d)
    assert s2.project.iterations == session.project.iterations
    n = int(session.model.count)
    assert int(s2.model.count) == n
    np.testing.assert_allclose(
        np.asarray(s2.model.means[:n]), np.asarray(session.model.means[:n]),
        rtol=1e-4, atol=1e-5,
    )


def test_kill_and_resume_bit_exact(session, tmp_path):
    """Crash recovery: a run checkpointed every 2 iters, 'killed' after 6,
    then resumed via the CLI-facing path must reproduce the uninterrupted
    run's model BIT-exactly (the .npz checkpoint stores exact f32;
    deterministic step order — no random re-capture in this fixture)."""
    import jax

    ckpt = str(tmp_path / "ckpt")

    # uninterrupted reference run: 10 steps
    session.init_field("model")
    session.capture()
    ref = Session(project=session.project, runtime=session.runtime,
                  renderer="tiled")
    ref.trainer.model = session.model
    ref.trainer.truths = session.trainer.truths
    ref.trainer.truth_cams = session.trainer.truth_cams
    import copy
    ref.project = copy.deepcopy(session.project)
    ref.trainer.project = ref.project
    for _ in range(10):
        ref.trainer.train()

    # 'crashed' run: 6 steps with checkpointing every 2
    session.auto_train(6, checkpoint_dir=ckpt, checkpoint_every=2,
                       rate_limit=None)
    # the checkpoint cadence fires on iterations 2, 4, 6 -> latest is iter 6
    s2 = Session(project=Project.app_default(), runtime=session.runtime,
                 renderer="tiled")
    s2.resume_from_checkpoint(ckpt)
    assert s2.project.iterations == 6
    # transplant the exact truth buffers (capture is Monte-Carlo and not
    # bit-reproducible across calls; the reference recaptures on load too —
    # the bit-exactness claim is about the RESUME mechanics)
    s2.trainer.truths = session.trainer.truths
    s2.trainer.truth_cams = session.trainer.truth_cams
    for _ in range(4):
        s2.trainer.train()

    assert s2.project.iterations == ref.project.iterations
    for a, b in zip(jax.tree.leaves(s2.model), jax.tree.leaves(ref.model)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
