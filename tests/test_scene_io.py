"""Scene front door: EXR codec, OBJ/PLY/serialized loaders, XML parsing,
scene compilation (SURVEY.md §8.2 phase 0 acceptance)."""
import os

import numpy as np
import pytest

from gradientdomain_mitsuba_tpu.scene import meshes, scene as sc, xml_loader
from gradientdomain_mitsuba_tpu.utils import exr

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CBOX = os.path.join(ROOT, "data/scenes/cbox/cbox.xml")


@pytest.mark.parametrize("compression", [exr.C_NONE, exr.C_ZIPS, exr.C_ZIP])
@pytest.mark.parametrize("half", [True, False])
def test_exr_roundtrip(tmp_path, compression, half):
    rs = np.random.RandomState(0)
    img = rs.gamma(1.0, 1.0, (37, 65, 3)).astype(np.float32)
    p = str(tmp_path / "t.exr")
    exr.write(p, img, half=half, compression=compression)
    back = exr.read_rgb(p)
    tol = 2e-3 if half else 1e-7
    np.testing.assert_allclose(back, img, rtol=tol, atol=tol)


def test_exr_single_channel(tmp_path):
    img = np.linspace(0, 4, 64 * 32).reshape(64, 32).astype(np.float32)
    p = str(tmp_path / "y.exr")
    exr.write(p, img, channels=("Y",), half=False)
    back, _ = exr.read(p)
    np.testing.assert_allclose(back["Y"], img, atol=1e-7)


def test_obj_loader(tmp_path):
    p = str(tmp_path / "m.obj")
    with open(p, "w") as f:
        f.write("v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
                "vt 0 0\nvt 1 0\nvt 1 1\nvt 0 1\n"
                "vn 0 0 1\n"
                "f 1/1/1 2/2/1 3/3/1 4/4/1\n")
    m = meshes.load_obj(p)
    assert m.num_tris == 2
    assert m.positions.shape == (4, 3)
    np.testing.assert_allclose(m.normals, [[0, 0, 1]] * 4)
    np.testing.assert_allclose(m.uvs, [[0, 0], [1, 0], [1, 1], [0, 1]])


def test_ply_ascii(tmp_path):
    p = str(tmp_path / "m.ply")
    with open(p, "w") as f:
        f.write("ply\nformat ascii 1.0\n"
                "element vertex 3\nproperty float x\nproperty float y\n"
                "property float z\nelement face 1\n"
                "property list uchar int vertex_indices\nend_header\n"
                "0 0 0\n1 0 0\n0 1 0\n3 0 1 2\n")
    m = meshes.load_ply(p)
    assert m.num_tris == 1
    assert m.positions.shape == (3, 3)


def test_serialized_roundtrip(tmp_path):
    rs = np.random.RandomState(1)
    mesh = meshes.Mesh(
        positions=rs.normal(size=(10, 3)).astype(np.float32),
        indices=np.array([[0, 1, 2], [3, 4, 5]], np.int32),
        normals=rs.normal(size=(10, 3)).astype(np.float32),
        uvs=rs.uniform(size=(10, 2)).astype(np.float32))
    p = str(tmp_path / "m.serialized")
    meshes.save_serialized(p, [mesh, mesh])
    back = meshes.load_serialized(p, shape_index=1)
    np.testing.assert_allclose(back.positions, mesh.positions)
    np.testing.assert_allclose(back.normals, mesh.normals)
    np.testing.assert_allclose(back.uvs, mesh.uvs)
    np.testing.assert_array_equal(back.indices, mesh.indices)


def test_xml_parse_cbox():
    desc = xml_loader.load(CBOX)
    assert desc.integrator.type == "path"
    assert desc.sensor.type == "perspective"
    assert len(desc.shapes) == 8
    # $var substitution through <default>
    assert desc.integrator.props["maxDepth"] == 6


def test_xml_variable_override():
    desc = xml_loader.load(CBOX, {"integrator": "gpt", "spp": "4"})
    assert desc.integrator.type == "gpt"
    sampler = desc.sensor.child("sampler")
    assert sampler.props["sampleCount"] == 4


def test_xml_undefined_var():
    import tempfile
    with tempfile.NamedTemporaryFile("w", suffix=".xml", delete=False) as f:
        f.write('<scene version="0.5.0"><integrator type="$foo"/></scene>')
    with pytest.raises(xml_loader.SceneParseError):
        xml_loader.load(f.name)


def test_compile_cbox():
    scene, st = sc.load_scene(CBOX)
    assert scene.geom.indices.shape == (32, 3)
    assert st.num_emitters == 1
    assert scene.materials.kind.shape == (4,)
    np.testing.assert_allclose(scene.emitters.total_area, [130 * 105])
    # luminaire normal points down
    e = scene.emitters
    tri = e.tri_index[0]
    i0, i1, i2 = scene.geom.indices[tri]
    p = scene.geom.positions
    n = np.cross(p[i1] - p[i0], p[i2] - p[i0])
    assert n[1] < 0


def test_transform_stack_order(tmp_path):
    p = str(tmp_path / "s.xml")
    with open(p, "w") as f:
        f.write("""<scene version="0.5.0">
          <shape type="rectangle">
            <transform name="toWorld">
              <scale value="2"/>
              <translate x="1" y="0" z="0"/>
            </transform>
          </shape></scene>""")
    desc = xml_loader.load(p)
    m = desc.shapes[0].props["toWorld"]
    # scale first, then translate: point (1,1,0) -> (3,2,0)
    np.testing.assert_allclose(m @ np.array([1, 1, 0, 1.0]), [3, 2, 0, 1])


def test_cylinder_shape_builds():
    from gradientdomain_mitsuba_tpu.scene import meshes as mesh_mod
    m = mesh_mod.make_cylinder(p0=(0, 0, -1), p1=(0, 0, 1), radius=2.0,
                               n_seg=16)
    import numpy as np
    r = np.linalg.norm(m.positions[:, :2], axis=1)
    np.testing.assert_allclose(r, 2.0, rtol=1e-5)
    # normals point radially outward
    nr = m.normals[:, :2] / np.linalg.norm(m.normals[:, :2], axis=1,
                                           keepdims=True)
    pr = m.positions[:, :2] / np.maximum(r[:, None], 1e-9)
    np.testing.assert_allclose(nr, pr, atol=1e-5)
    assert m.indices.shape[0] == 32


def test_mfilm_outputs(tmp_path):
    import numpy as np
    from gradientdomain_mitsuba_tpu.utils import exr
    from gradientdomain_mitsuba_tpu.utils.cli import write_image
    img = np.random.RandomState(0).rand(4, 5, 3).astype(np.float32)
    p_npy = str(tmp_path / "out.npy")
    write_image(exr, p_npy, img)
    np.testing.assert_array_equal(np.load(p_npy), img)
    p_m = str(tmp_path / "out.m")
    write_image(exr, p_m, img)
    txt = open(p_m).read()
    assert txt.startswith("r = [") and "g = [" in txt and "b = [" in txt
