"""Native C++ parsers agree with the pure-Python implementations."""

import numpy as np
import pytest

from gaussian_splatterer_tpu import native

pytestmark = pytest.mark.skipif(
    native.obj_native is None, reason="native library unavailable (no g++)"
)

OBJ = """\
# comment line
v -1.5 -1.5 0
v 1.5 -1.5 0
v 1.5 1.5 0.25
v -1.5 1.5 0
vt 0 0
vt 1 0
vt 1 1
vt 0 1
f 1/1 2/2 3/3 4/4
f 1/1/9 3/3/9 2/2/9
f 2 3 4
"""


def test_obj_native_matches_python(tmp_path):
    import gaussian_splatterer_tpu.io.obj as objmod

    p = tmp_path / "m.obj"
    p.write_text(OBJ)
    mesh_native = objmod.load_obj(str(p))  # native path (module imported it)
    saved = objmod._native
    objmod._native = None
    try:
        mesh_py = objmod.load_obj(str(p))
    finally:
        objmod._native = saved
    np.testing.assert_allclose(mesh_native.vertices, mesh_py.vertices)
    np.testing.assert_array_equal(mesh_native.triangles, mesh_py.triangles)
    np.testing.assert_allclose(mesh_native.tri_uv, mesh_py.tri_uv)
    assert mesh_native.num_triangles == 4  # quad(2) + tri + tri


def test_gobj_native_roundtrip(tmp_path):
    import gaussian_splatterer_tpu.io.gobj as gobjmod
    from gaussian_splatterer_tpu.models.splats import SplatModelHost

    rng = np.random.default_rng(0)
    m = SplatModelHost(64)
    for _ in range(17):
        m.push_back(rng.normal(0, 1, 3), rng.normal(0, 1, (4, 3)),
                    rng.uniform(0.1, 1, 3), rng.uniform(0, 1), rng.normal(0, 1, 4))
    p = str(tmp_path / "m.gobj")
    gobjmod.save_gobj(m, p)  # native writer
    back_native = gobjmod.load_gobj(p)  # native reader
    saved = gobjmod._native
    gobjmod._native = None
    try:
        back_py = gobjmod.load_gobj(p)
    finally:
        gobjmod._native = saved
    assert back_native.count == back_py.count == 17
    n = 17
    for a, b in [
        (back_native.means[:n], back_py.means[:n]),
        (back_native.shs[:n], back_py.shs[:n]),
        (back_native.scales[:n], back_py.scales[:n]),
        (back_native.opacities[:n], back_py.opacities[:n]),
        (back_native.rotations[:n], back_py.rotations[:n]),
    ]:
        np.testing.assert_allclose(a, b)
    # %g text roundtrip: ~6 significant digits
    np.testing.assert_allclose(back_native.means[:n], m.means[:n], rtol=1e-5)


def test_obj_relative_indices_both_paths(tmp_path):
    """OBJ negative (relative) face indices count back from the latest
    defined vertex/uv; previously they wrapped via numpy negative indexing
    into vertices counted from the END of the file — silently corrupted
    geometry.  Both parsers must resolve them identically; out-of-range
    indices must raise, not wrap."""
    import numpy as np
    import pytest

    from gaussian_splatterer_tpu.io import obj as objmod

    p = tmp_path / "rel.obj"
    p.write_text(
        "v 0 0 0\nv 1 0 0\nv 0 1 0\n"
        "vt 0 0\nvt 1 0\nvt 0 1\n"
        "f -3/-3 -2/-2 -1/-1\n"   # relative == absolute 1/2/3 here
        "v 2 2 2\n"
        "f 1 2 -1\n"              # -1 = the vertex defined just above
    )
    mesh_native = objmod.load_obj(str(p))
    saved = objmod._native
    objmod._native = None
    try:
        mesh_py = objmod.load_obj(str(p))
    finally:
        objmod._native = saved
    for mesh in (mesh_native, mesh_py):
        np.testing.assert_array_equal(mesh.triangles[0], [0, 1, 2])
        np.testing.assert_array_equal(mesh.triangles[1], [0, 1, 3])
        np.testing.assert_allclose(mesh.tri_uv[0, 1], [1, 0])

    bad = tmp_path / "bad.obj"
    bad.write_text("v 0 0 0\nf 1 2 3\n")  # indices past the vertex count
    objmod._native = None
    try:
        with pytest.raises(Exception):
            objmod.load_obj(str(bad))
    finally:
        objmod._native = saved
