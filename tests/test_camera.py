import math

import numpy as np

from gaussian_splatterer_tpu.config import Project
from gaussian_splatterer_tpu.models.camera import Camera, fibonacci_sphere


def test_fibonacci_sphere_on_sphere():
    pts = fibonacci_sphere(32, 10.0)
    assert pts.shape == (32, 3)
    norms = np.linalg.norm(pts, axis=-1)
    np.testing.assert_allclose(norms, 10.0, rtol=1e-5)


def test_fibonacci_matches_reference_formula():
    # Explicit check of i=0 and i=3 against src/Camera.cpp:16-23
    golden = (1.0 + math.sqrt(5.0)) / 2.0
    step = 2.0 * math.pi * golden
    pts = fibonacci_sphere(8, 2.0)
    for i in (0, 3, 7):
        t = i / 8.0
        a1 = math.acos(1.0 - 2.0 * t)
        a2 = step * i
        expect = np.array(
            [math.sin(a1) * math.cos(a2), math.sin(a1) * math.sin(a2), math.cos(a1)]
        ) * 2.0
        np.testing.assert_allclose(pts[i], expect, atol=1e-4)


def test_get_cameras_counts_and_rotation():
    p = Project()
    p.sphere1.count = 4
    p.sphere2.count = 3
    p.sphere2.distance = 5.0
    cams = Camera.get_cameras(p)
    assert len(cams) == 7
    assert Camera.get_cameras_count(p) == 7
    # sphere-2 cameras at distance 5
    np.testing.assert_allclose(np.linalg.norm(cams[5].location), 5.0, rtol=1e-5)
    # rotX rotates about +Y: a camera at +Z with rotX=90 moves to +X
    p2 = Project()
    p2.sphere1.count = 1
    p2.sphere2.count = 0
    cams0 = Camera.get_cameras(p2)
    # first fibonacci point of count=1 is at angle1=acos(1)=0 -> (0, 0, d)
    np.testing.assert_allclose(cams0[0].location, [0, 0, 10], atol=1e-4)
    p2.sphere1.rotX = 90.0
    cams90 = Camera.get_cameras(p2)
    np.testing.assert_allclose(cams90[0].location, [10, 0, 0], atol=1e-4)
    # rotY rotates about +X: +Z goes to -Y under 90 deg about +X
    p2.sphere1.rotX = 0.0
    p2.sphere1.rotY = 90.0
    camsY = Camera.get_cameras(p2)
    np.testing.assert_allclose(camsY[0].location, [0, -10, 0], atol=1e-4)


def test_view_matrix_negated_lookat():
    cam = Camera(np.array([0.0, 0.0, 5.0], np.float32), np.zeros(3, np.float32), 60.0)
    v = cam.get_view()
    # -lookAt: a point in front of the camera gets POSITIVE view-space z
    p = v @ np.array([0.0, 0.0, 0.0, 1.0], np.float32)
    assert p[2] > 0
    # camera center maps to view-space origin
    c = v @ np.array([0.0, 0.0, 5.0, 1.0], np.float32)
    np.testing.assert_allclose(c[:3], 0.0, atol=1e-5)
    # w must be -1 (negated identity row)
    np.testing.assert_allclose(p[3], -1.0, atol=1e-6)


def test_projection_matches_glm_perspective():
    cam = Camera(np.array([0.0, 0.0, 5.0], np.float32), np.zeros(3, np.float32), 90.0)
    m = cam.get_projection(2.0)
    tan_half = math.tan(math.radians(90.0) / 2)
    assert abs(m[0, 0] - 1.0 / (2.0 * tan_half)) < 1e-6
    assert abs(m[1, 1] - 1.0 / tan_half) < 1e-6
    assert abs(m[2, 2] - (-(100.0 + 0.1) / (100.0 - 0.1))) < 1e-6
    assert abs(m[2, 3] - (-(2 * 100.0 * 0.1) / (100.0 - 0.1))) < 1e-6
    assert m[3, 2] == -1.0


def test_projview_center_projects_to_origin():
    cam = Camera(np.array([3.0, 4.0, 5.0], np.float32), np.zeros(3, np.float32), 60.0)
    pv = cam.get_proj_view(1.0)
    h = pv @ np.array([0.0, 0.0, 0.0, 1.0], np.float32)
    ndc = h[:3] / h[3]
    np.testing.assert_allclose(ndc[:2], 0.0, atol=1e-5)


def test_preview_camera_free_orbit():
    p = Project()
    p.previewTruth = False
    p.previewFreeOrbit = False
    p.previewFreeRotX = 0.0
    p.previewFreeRotY = 0.0
    p.previewFreeDistance = 7.0
    cam = Camera.get_preview_camera(p)
    np.testing.assert_allclose(cam.location, [0, 0, -7.0], atol=1e-5)
    assert cam.fov_deg_y == p.previewFreeFovDeg


def test_tan_fov_train_vs_serve():
    cam = Camera(np.zeros(3, np.float32), np.zeros(3, np.float32), 60.0)
    tx, ty = cam.tan_fov(1024, 1024, train=True)
    assert tx == ty
    tx2, ty2 = cam.tan_fov(2048, 1024, train=False)
    # serve path quirk: angle scaled by aspect before tan (src/Trainer.cu:196)
    assert abs(tx2 - math.tan(math.radians(2048 * 60.0 / 1024) * 0.5)) < 1e-9
    assert ty2 == ty
