"""Hair shape: .hair loaders + tube tessellation (vs src/shapes/hair.cpp).

The reference intersects exact per-segment cylinders through a dedicated
HairKDTree; here fibers tessellate to parallel-transport tubes on the
shared BVH.  Oracles: loader round trips both file formats; a ray aimed
at a straight fiber hits at the cylinder distance; tube normals are
radial.
"""
import struct

import numpy as np

from gradientdomain_mitsuba_tpu.scene import meshes


def test_load_hair_text(tmp_path):
    p = tmp_path / "h.hair"
    p.write_text("0 0 0\n1 0 0\n2 0 0\n\n0 1 0\n1 1 0\n")
    fibers = meshes.load_hair(str(p))
    assert len(fibers) == 2
    assert fibers[0].shape == (3, 3)
    assert fibers[1].shape == (2, 3)
    np.testing.assert_allclose(fibers[0][2], (2, 0, 0))


def test_load_hair_binary(tmp_path):
    p = tmp_path / "h.hair"
    verts = [(0, 0, 0), (1, 0, 0), None, (0, 1, 0), (1, 1, 0), (2, 1, 0)]
    buf = b"BINARY_HAIR" + struct.pack("<I", 5)
    for v in verts:
        if v is None:
            buf += struct.pack("<f", np.inf)
        else:
            buf += struct.pack("<3f", *v)
    p.write_bytes(buf)
    fibers = meshes.load_hair(str(p))
    assert len(fibers) == 2
    assert fibers[0].shape == (2, 3)
    assert fibers[1].shape == (3, 3)
    np.testing.assert_allclose(fibers[1][2], (2, 1, 0))


def test_make_hair_geometry():
    # one straight fiber along +x, radius 0.1, hexagonal tube
    fb = [np.asarray([[0, 0, 0], [1, 0, 0], [2, 0, 0]], np.float32)]
    mesh = meshes.make_hair(fb, radius=0.1, n_seg=8)
    # every ring vertex is exactly radius away from the axis (y-z dist)
    ring = mesh.positions[: 3 * 8]
    r = np.sqrt(ring[:, 1] ** 2 + ring[:, 2] ** 2)
    np.testing.assert_allclose(r, 0.1, atol=1e-5)
    # radial normals
    n = mesh.normals[: 3 * 8]
    np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, atol=1e-5)
    assert np.allclose(n[:, 0], 0.0, atol=1e-5)
    # caps present, all indices in range
    assert mesh.indices.min() >= 0
    assert mesh.indices.max() < len(mesh.positions)


def test_make_hair_curved_frames():
    # quarter-circle fiber: parallel transport must not flip or collapse
    a = np.linspace(0, np.pi / 2, 16)
    fb = [np.stack([np.cos(a), np.sin(a), np.zeros_like(a)],
                   -1).astype(np.float32)]
    mesh = meshes.make_hair(fb, radius=0.02, n_seg=6)
    K, S = 16, 6
    rings = mesh.positions[: K * S].reshape(K, S, 3)
    centers = rings.mean(1)
    # ring centers track the curve
    want = np.stack([np.cos(a), np.sin(a), np.zeros_like(a)], -1)
    np.testing.assert_allclose(centers, want, atol=2e-3)
    # all ring radii correct
    r = np.linalg.norm(rings - centers[:, None], axis=-1)
    np.testing.assert_allclose(r, 0.02, atol=1e-4)


def test_hair_scene_renders(tmp_path):
    from gradientdomain_mitsuba_tpu.scene import scene as sc
    from gradientdomain_mitsuba_tpu.scene import xml_loader
    from gradientdomain_mitsuba_tpu.models.path import PathTracer
    hair = tmp_path / "strand.hair"
    # a small comb of parallel fibers in the xy-plane
    lines = []
    for y in np.linspace(-0.3, 0.3, 7):
        lines += [f"-0.5 {y:.3f} 0", f"0.5 {y:.3f} 0", ""]
    hair.write_text("\n".join(lines))
    xml = f"""<scene version="0.5.0">
     <integrator type="path"><integer name="maxDepth" value="3"/></integrator>
     <sensor type="perspective">
      <float name="fov" value="45"/>
      <transform name="toWorld">
       <lookat origin="0, 0, 2" target="0, 0, 0" up="0, 1, 0"/>
      </transform>
      <film type="hdrfilm">
       <integer name="width" value="24"/><integer name="height" value="24"/>
      </film>
      <sampler type="independent"><integer name="sampleCount" value="2"/></sampler>
     </sensor>
     <shape type="hair">
      <string name="filename" value="{hair.name}"/>
      <float name="radius" value="0.04"/>
      <bsdf type="diffuse"><spectrum name="reflectance" value="0.8"/></bsdf>
     </shape>
     <emitter type="constant"><spectrum name="radiance" value="1"/></emitter>
    </scene>"""
    p = tmp_path / "hair.xml"
    p.write_text(xml)
    scene, st = sc.compile_scene(xml_loader.load(str(p)))
    img = np.asarray(PathTracer(scene, st).render(scene, seed=0, spp=2))
    assert np.all(np.isfinite(img))
    # fibers cross the image center; lit by the furnace they must show up
    assert img[12, 12].mean() > 0.05
