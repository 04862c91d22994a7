"""vertexcolors + wireframe barycentric-attribute textures.

Reference: src/textures/vertexcolors.cpp (interpolated per-vertex colors)
and src/textures/wireframe.cpp (edge distance test).  Here both are fed
by the Intersection `bary` payload packed into tri_shade (scene.py) —
one extra slice of the same packed-row gather, zero extra memory traffic.
"""
import os
import textwrap

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write_quad_ply(path, colors):
    """[-1,1]^2 quad at z=0, two tris split along the (-1,-1)-(1,1)
    diagonal, uchar vertex colors."""
    verts = [(-1, -1, 0), (1, -1, 0), (1, 1, 0), (-1, 1, 0)]
    lines = [
        "ply", "format ascii 1.0",
        "element vertex 4",
        "property float x", "property float y", "property float z",
        "property uchar red", "property uchar green", "property uchar blue",
        "element face 2",
        "property list uchar int vertex_indices",
        "end_header",
    ]
    for (x, y, z), (r, g, b) in zip(verts, colors):
        lines.append(f"{x} {y} {z} {r} {g} {b}")
    lines += ["3 0 1 2", "3 0 2 3"]
    path.write_text("\n".join(lines) + "\n")


def test_ply_vertex_colors_load(tmp_path):
    from gradientdomain_mitsuba_tpu.scene import meshes
    p = tmp_path / "quad.ply"
    _write_quad_ply(p, [(255, 0, 0), (0, 255, 0), (0, 0, 255),
                        (255, 255, 255)])
    mesh = meshes.load_ply(str(p))
    assert mesh.colors is not None
    np.testing.assert_allclose(mesh.colors[0], [1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(mesh.colors[2], [0, 0, 1], atol=1e-6)
    np.testing.assert_allclose(mesh.colors[3], [1, 1, 1], atol=1e-6)


def test_eval_texture_bary_dispatch():
    import jax.numpy as jnp
    from gradientdomain_mitsuba_tpu.ops import texture as tx
    from gradientdomain_mitsuba_tpu.scene.ir import Plugin
    vc = Plugin(kind="texture", type="vertexcolors", props={})
    wf = Plugin(kind="texture", type="wireframe", props={
        "interiorColor": np.array([0.2, 0.2, 0.2], np.float32),
        "edgeColor": np.array([1.0, 0.0, 0.0], np.float32),
        "lineWidth": 0.1})
    table = tx.build_table([vc, wf], ".")
    uv = jnp.zeros((2, 2), jnp.float32)
    # payload: lane 0 a green-ish vertex color far from any edge,
    # lane 1 sits within lineWidth of an edge
    bary = jnp.asarray([[0.1, 0.9, 0.3, 5.0],
                        [0.5, 0.5, 0.5, 0.05]], jnp.float32)
    out = np.asarray(tx.eval_texture(table, jnp.asarray([0, 1]), uv,
                                     bary=bary))
    np.testing.assert_allclose(out[0], [0.1, 0.9, 0.3], atol=1e-6)
    np.testing.assert_allclose(out[1], [1.0, 0.0, 0.0], atol=1e-6)
    # same ids without a payload: interior colors (bidir fallback)
    out2 = np.asarray(tx.eval_texture(table, jnp.asarray([0, 1]), uv))
    np.testing.assert_allclose(out2[0], [1, 1, 1], atol=1e-6)
    np.testing.assert_allclose(out2[1], [0.2, 0.2, 0.2], atol=1e-6)


def _render_albedo(tmp_path, tex_xml, name):
    xml = textwrap.dedent("""\
        <scene version="0.5.0">
          <integrator type="field">
            <string name="field" value="albedo"/>
          </integrator>
          <sensor type="perspective">
            <float name="fov" value="50"/>
            <transform name="toWorld">
              <lookat origin="0, 0, 3" target="0, 0, 0" up="0, 1, 0"/>
            </transform>
            <sampler type="independent">
              <integer name="sampleCount" value="1"/>
            </sampler>
            <film type="hdrfilm">
              <integer name="width" value="32"/>
              <integer name="height" value="32"/>
              <rfilter type="box"/>
            </film>
          </sensor>
          <shape type="ply">
            <string name="filename" value="quad.ply"/>
            <boolean name="faceNormals" value="true"/>
            <bsdf type="diffuse">
              {tex}
            </bsdf>
          </shape>
        </scene>
    """).format(tex=tex_xml)
    p = tmp_path / f"{name}.xml"
    p.write_text(xml)
    from gradientdomain_mitsuba_tpu.models.factory import make_integrator
    from gradientdomain_mitsuba_tpu.scene import scene as sc
    scene, st = sc.load_scene(str(p))
    img = make_integrator(scene, st).render(scene, seed=0, spp=1)
    return np.asarray(img)


def test_vertexcolors_interpolates(tmp_path):
    _write_quad_ply(tmp_path / "quad.ply",
                    [(255, 0, 0), (0, 255, 0), (0, 0, 255),
                     (255, 255, 255)])
    img = _render_albedo(
        tmp_path, '<texture name="reflectance" type="vertexcolors"/>',
        "vc")
    assert np.isfinite(img).all()
    hit = img.sum(-1) > 0
    assert hit.mean() > 0.2
    # quadrant means must recover three distinct dominant channels
    # (red/green/blue corners) regardless of image orientation
    H, W = img.shape[:2]
    quads = [img[:H // 2, :W // 2], img[:H // 2, W // 2:],
             img[H // 2:, :W // 2], img[H // 2:, W // 2:]]
    dom = {int(np.argmax(q.reshape(-1, 3).mean(0))) for q in quads}
    assert {0, 1, 2} <= dom | {int(np.argmax(img.reshape(-1, 3).mean(0)))}
    # interpolation produces in-gamut values only
    assert img.max() <= 1.0 + 1e-5


def test_wireframe_edges(tmp_path):
    _write_quad_ply(tmp_path / "quad.ply",
                    [(255, 255, 255)] * 4)
    img = _render_albedo(tmp_path, textwrap.dedent("""\
        <texture name="reflectance" type="wireframe">
          <rgb name="interiorColor" value="0, 0, 0"/>
          <rgb name="edgeColor" value="1, 1, 1"/>
          <float name="lineWidth" value="0.08"/>
        </texture>"""), "wf")
    assert np.isfinite(img).all()
    lum = img.mean(-1)
    # the shared diagonal runs through the image center -> edge color
    cy, cx = lum.shape[0] // 2, lum.shape[1] // 2
    assert lum[cy, cx] > 0.5
    # a point deep inside one triangle (quadrant center, off-diagonal)
    assert lum[cy // 2, cx + cx // 2] < 0.1 or \
        lum[cy + cy // 2, cx // 2] < 0.1
    # edge pixels are a minority but present
    frac = (lum > 0.5).mean()
    assert 0.02 < frac < 0.6


def test_vertex_curvature_sphere_analytic():
    """Discrete curvature estimates on a tessellated unit-ish sphere:
    gaussian ~ 1/r^2, mean ~ 1/r (convex positive), both within a few
    percent away from the poles."""
    from gradientdomain_mitsuba_tpu.scene import meshes
    r = 2.0
    mesh = meshes.make_sphere(radius=r, n_theta=48, n_phi=96)
    for mode, want in (("gaussian", 1.0 / r ** 2), ("mean", 1.0 / r)):
        c = meshes.vertex_curvature(mesh.positions, mesh.indices, mode)
        # skip pole fans (degenerate one-ring areas)
        body = np.abs(mesh.positions[:, 2] / r) < 0.9
        got = np.median(c[body])
        assert abs(got - want) / want < 0.05, (mode, got, want)
        # the lat-long seam duplicates one meridian (open one-rings
        # there, boundary-grade estimates) — a ~2% vertex minority
        assert (c[body] > 0).mean() > 0.95, mode


def test_curvature_texture_renders(tmp_path):
    """curvature texture end-to-end (src/textures/curvature.cpp): convex
    sphere renders red-dominant (positive -> red channel)."""
    import textwrap as tw
    from gradientdomain_mitsuba_tpu.models.factory import make_integrator
    from gradientdomain_mitsuba_tpu.scene import scene as sc
    xml = tw.dedent("""\
        <scene version="0.5.0">
          <integrator type="field">
            <string name="field" value="albedo"/>
          </integrator>
          <sensor type="perspective">
            <float name="fov" value="50"/>
            <transform name="toWorld">
              <lookat origin="0, 0, 4" target="0, 0, 0" up="0, 1, 0"/>
            </transform>
            <sampler type="independent">
              <integer name="sampleCount" value="1"/>
            </sampler>
            <film type="hdrfilm">
              <integer name="width" value="32"/>
              <integer name="height" value="32"/>
              <rfilter type="box"/>
            </film>
          </sensor>
          <shape type="sphere">
            <float name="radius" value="1"/>
            <bsdf type="diffuse">
              <texture name="reflectance" type="curvature">
                <string name="curvature" value="mean"/>
                <float name="scale" value="0.5"/>
              </texture>
            </bsdf>
          </shape>
          <shape type="rectangle">
            <transform name="toWorld">
              <scale x="4" y="4" z="1"/><translate z="-3"/>
            </transform>
            <bsdf type="diffuse"><rgb name="reflectance" value="0 1 0"/></bsdf>
          </shape>
        </scene>
    """)
    p = tmp_path / "curv.xml"
    p.write_text(xml)
    scene, st = sc.load_scene(str(p))
    img = np.asarray(make_integrator(scene, st).render(scene, seed=0,
                                                       spp=1))
    assert np.isfinite(img).all()
    # sphere pixels: red ~ scale * H = 0.5 * 1.0, green/blue ~ 0
    sph = img[..., 0] > 0.1
    assert sph.mean() > 0.02
    np.testing.assert_allclose(img[sph][:, 0].mean(), 0.5, rtol=0.1)
    assert img[sph][:, 2].mean() < 1e-3
