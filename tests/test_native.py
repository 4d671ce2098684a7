import os
import subprocess

import numpy as np
import pytest

NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")


@pytest.fixture(scope="session")
def native_lib():
    so = os.path.join(NATIVE_DIR, "libmcpt_loader.so")
    if not os.path.exists(so):
        r = subprocess.run(["make", "-C", NATIVE_DIR], capture_output=True, text=True)
        if r.returncode != 0:
            pytest.skip(f"native build failed: {r.stderr[-500:]}")
    # reset the module's memoised handle in case it was probed pre-build
    from monte_carlo_path_tracing_tpu.scene import native_loader

    native_loader._checked = False
    native_loader._lib = None
    if not native_loader.native_available():
        pytest.skip("native loader unavailable")
    return native_loader


@pytest.mark.parametrize("scene", ["cornell/cornell.obj", "veach-mis/veach-mis.obj"])
def test_native_matches_python_parser(native_lib, scene):
    from monte_carlo_path_tracing_tpu.scene.objparse import parse_obj

    path = os.path.join(os.path.dirname(__file__), "..", "scenes", scene)
    py = parse_obj(path)
    nat = native_lib.parse_obj_native(path)

    np.testing.assert_array_equal(nat.face_v, py.face_v)
    np.testing.assert_array_equal(nat.face_vn, py.face_vn)
    np.testing.assert_array_equal(nat.face_mat, py.face_mat)
    np.testing.assert_allclose(nat.vertices, py.vertices, rtol=1e-6)
    np.testing.assert_allclose(nat.normals, py.normals, rtol=1e-6)
    assert nat.material_names == py.material_names
    assert set(nat.materials) == set(py.materials)
    for name, pm in py.materials.items():
        nm = nat.materials[name]
        np.testing.assert_allclose(nm.kd, pm.kd, rtol=1e-6)
        np.testing.assert_allclose(nm.ks, pm.ks, rtol=1e-6)
        assert abs(nm.ns - pm.ns) < 1e-4


def test_native_error_on_missing_file(native_lib):
    with pytest.raises(IOError):
        native_lib.parse_obj_native("/nonexistent/scene.obj")
