import json

from gaussian_splatterer_tpu.config import CameraSphere, Project, RuntimeConfig


def test_defaults_match_reference():
    # Defaults pinned at reference src/Project.h:14-62
    p = Project()
    assert p.sphere1.count == 16 and p.sphere1.distance == 10.0
    assert p.sphere1.fovDeg == 60.0
    assert p.rtSamples == 100
    assert p.lrLocation == 0.00005
    assert p.lrSh == 0.0001
    assert p.lrScale == 0.00002
    assert p.lrOpacity == 0.0001
    assert p.lrRotation == 0.000025
    assert p.paramScaleMax == 0.3
    assert p.paramCullOpacity == 0.005
    assert p.paramCullSize == 0.004
    assert p.paramDensifyVariance == 2.0
    assert p.paramSplitSize == 0.04
    assert p.paramSplitDistance == 1.5
    assert p.paramSplitScale == 0.8
    assert p.paramCloneDistance == 1.6
    assert p.intervalCapture == 50 and p.intervalDensify == 200
    assert p.renderResX == 2048 and p.renderResY == 2048


def test_app_default():
    # src/ui/UiFrame.cpp:130-135
    p = Project.app_default()
    assert p.sphere2.count == 0
    assert p.sphere2.fovDeg == 30.0
    assert p.num_cameras == 16


def test_json_roundtrip(tmp_path):
    p = Project()
    p.sphere1.rotX = 123.5
    p.lrSh = 0.5
    p.iterations = 77
    p.previewTruth = True
    path = str(tmp_path / "settings.json")
    p.save(path)
    q = Project.load(path)
    assert q.sphere1.rotX == 123.5
    assert q.lrSh == 0.5
    assert q.iterations == 77
    assert q.previewTruth is True


def test_json_keys_match_reference_schema(tmp_path):
    # Key names must match the nlohmann macro list (src/Project.h:64-73)
    p = Project()
    keys = set(p.to_json().keys())
    expected = {
        "perspective", "pathModel", "pathTextureDiffuse", "sphere1", "sphere2",
        "rtSamples", "lrLocation", "lrSh", "lrScale", "lrOpacity", "lrRotation",
        "paramScaleMax", "paramCullOpacity", "paramCullSize", "paramDensifyVariance",
        "paramSplitSize", "paramSplitDistance", "paramSplitScale", "paramCloneDistance",
        "iterations", "intervalCapture", "intervalDensify",
        "previewTimer", "previewRtSamples", "previewSplatScale", "previewTruth",
        "previewTruthIndex", "previewFreeOrbit", "previewFreeOrbitSpeed",
        "previewFreeDistance", "previewFreeFovDeg", "previewFreeRotX", "previewFreeRotY",
        "renderResX", "renderResY",
    }
    assert keys == expected
    sphere_keys = set(p.to_json()["sphere1"].keys())
    assert sphere_keys == {"count", "distance", "fovDeg", "rotX", "rotY"}


def test_load_ignores_unknown_keys(tmp_path):
    path = tmp_path / "s.json"
    path.write_text(json.dumps({"rtSamples": 7, "someFutureKey": 1}))
    p = Project.load(str(path))
    assert p.rtSamples == 7


def test_runtime_config_roundtrip(tmp_path):
    rc = RuntimeConfig(render_resolution_x=256, render_resolution_y=128)
    path = str(tmp_path / "runtime.json")
    rc.save(path)
    rc2 = RuntimeConfig.load(path)
    assert rc2.render_resolution_x == 256
    assert rc2.render_resolution_y == 128
    assert rc2.splats_capacity == 1_000_000
