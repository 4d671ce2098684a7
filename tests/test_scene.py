import numpy as np

from monte_carlo_path_tracing_tpu.scene import build_scene
from monte_carlo_path_tracing_tpu.scene.objparse import parse_obj
from monte_carlo_path_tracing_tpu.scene.xmlparse import parse_scene_xml_text


def _write(tmp_path, name, text):
    p = tmp_path / name
    p.write_text(text)
    return str(p)


OBJ = """
mtllib s.mtl
v 0 0 0
v 1 0 0
v 0 1 0
v 1 1 0
vn 0 0 1
usemtl mat_a
f 1//1 2//1 3//1
usemtl Light
f 2//1 4//1 3//1
"""

MTL = """
newmtl mat_a
Kd 0.5 0.25 0.125
Ks 0.1 0.2 0.3
Ns 42
newmtl Light
Kd 0 0 0
"""

XML = """
<camera type="perspective" width="64" height="48" fovy="30">
 <eye x="0" y="0" z="5"/>
 <lookat x="0" y="0" z="0"/>
 <up x="0" y="1" z="0"/>
</camera>
<light mtlname="Light" radiance="10,20,30"/>
"""


def test_parse_obj_mtl(tmp_path):
    _write(tmp_path, "s.mtl", MTL)
    mesh = parse_obj(_write(tmp_path, "s.obj", OBJ))
    assert mesh.face_v.shape == (2, 3)
    assert mesh.material_names == ["mat_a", "Light"]
    assert mesh.materials["mat_a"].ns == 42
    np.testing.assert_allclose(mesh.materials["mat_a"].kd, (0.5, 0.25, 0.125))


def test_parse_xml_fragment():
    sx = parse_scene_xml_text(XML)
    assert sx.camera.width == 64 and sx.camera.fovy == 30.0
    np.testing.assert_allclose(sx.lights["Light"], (10.0, 20.0, 30.0))


def test_build_scene(tmp_path):
    _write(tmp_path, "s.mtl", MTL)
    mesh = parse_obj(_write(tmp_path, "s.obj", OBJ))
    sx = parse_scene_xml_text(XML)
    sc = build_scene(mesh, sx)

    assert sc.num_tris == 2
    assert sc.num_lights == 1
    assert int(sc.light_tri_ids[0]) == 1
    np.testing.assert_allclose(np.asarray(sc.light_area), [0.5], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(sc.light_emission()), [[10, 20, 30]])
    # geometric normal oriented with the vertex normals (+z)
    np.testing.assert_allclose(np.asarray(sc.geo_n), [[0, 0, 1], [0, 0, 1]], atol=1e-6)
    mats = sc.materials
    np.testing.assert_allclose(np.asarray(mats.ns)[np.asarray(sc.tri_mat_id)], [42.0, 1.0])


def test_normal_orientation_vote(tmp_path):
    # Vertex normals pointing -z must flip the geometric normal.
    obj = OBJ.replace("vn 0 0 1", "vn 0 0 -1")
    _write(tmp_path, "s.mtl", MTL)
    mesh = parse_obj(_write(tmp_path, "s2.obj", obj))
    sc = build_scene(mesh, parse_scene_xml_text(XML))
    np.testing.assert_allclose(np.asarray(sc.geo_n)[:, 2], [-1.0, -1.0], atol=1e-6)


def test_authored_scenes(cornell_scene, veach_scene):
    assert cornell_scene.num_tris > 100
    assert cornell_scene.num_lights == 2
    assert int(cornell_scene.num_classes) == 1
    # Veach scale target per reference README.md:212 (~3,092 facets)
    assert 2500 <= veach_scene.num_tris <= 4000
    assert int(veach_scene.num_classes) == 4
    assert veach_scene.num_lights == 320
    # every light triangle has positive area and nonzero emission
    assert np.all(np.asarray(veach_scene.light_area) > 0)
    assert np.all(np.asarray(veach_scene.light_emission()).sum(-1) > 0)
