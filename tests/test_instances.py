"""shapegroup/instance baking (scene/_expand_instances)."""
import os
import textwrap

import numpy as np

from gradientdomain_mitsuba_tpu.scene import scene as sc

XML = textwrap.dedent("""\
    <scene version="0.5.0">
      <integrator type="path"><integer name="maxDepth" value="2"/></integrator>
      <sensor type="perspective">
        <float name="fov" value="45"/>
        <transform name="toWorld">
          <lookat origin="0, 0, -6" target="0, 0, 0" up="0, 1, 0"/>
        </transform>
        <sampler type="independent"><integer name="sampleCount" value="4"/></sampler>
        <film type="hdrfilm">
          <integer name="width" value="16"/><integer name="height" value="16"/>
          <rfilter type="box"/>
        </film>
      </sensor>
      <emitter type="constant"><rgb name="radiance" value="1, 1, 1"/></emitter>
      <shape type="shapegroup" id="grp">
        <shape type="rectangle">
          <bsdf type="diffuse"><rgb name="reflectance" value="0.8, 0.2, 0.2"/></bsdf>
        </shape>
        <shape type="cube">
          <transform name="toWorld"><scale value="0.25"/><translate x="0" y="1.5" z="0"/></transform>
          <bsdf type="diffuse"><rgb name="reflectance" value="0.2, 0.8, 0.2"/></bsdf>
        </shape>
      </shape><!--endgroup-->
      <shape type="instance">
        <ref id="grp"/>
        <transform name="toWorld"><translate x="-1.5" y="0" z="0"/></transform>
      </shape>
      <shape type="instance">
        <ref id="grp"/>
        <transform name="toWorld"><rotate y="1" angle="30"/><translate x="1.5" y="0" z="0"/></transform>
      </shape>
    </scene>
""")


def _write(tmp_path, text):
    p = tmp_path / "inst.xml"
    p.write_text(text)
    return str(p)


def test_instances_bake_transformed_copies(tmp_path):
    scene, st = sc.load_scene(_write(tmp_path, XML))
    # rectangle = 2 tris, cube = 12 tris, group x2 instances
    assert scene.geom.indices.shape[0] == 2 * (2 + 12)
    # two clusters of geometry, one around x=-1.5 and one around x=+1.5
    verts = np.asarray(scene.geom.positions)
    assert (verts[:, 0] < -1.0).any() and (verts[:, 0] > 1.0).any()


def test_instances_render_matches_manual_duplication(tmp_path):
    from gradientdomain_mitsuba_tpu.models.path import PathTracer
    scene, st = sc.load_scene(_write(tmp_path, XML))
    img_i = np.asarray(PathTracer(scene, st).render(scene, seed=0, spp=4))

    # identical scene with both instances expanded by hand (same shape
    # order -> same BVH and counters -> bitwise-comparable render)
    header, _, _ = XML.partition('<shape type="shapegroup"')
    def group(prefix):
        return f"""
      <shape type="rectangle">
        <transform name="toWorld">{prefix}</transform>
        <bsdf type="diffuse"><rgb name="reflectance" value="0.8, 0.2, 0.2"/></bsdf>
      </shape>
      <shape type="cube">
        <transform name="toWorld"><scale value="0.25"/><translate x="0" y="1.5" z="0"/>{prefix}</transform>
        <bsdf type="diffuse"><rgb name="reflectance" value="0.2, 0.8, 0.2"/></bsdf>
      </shape>"""
    manual = (header +
              group('<translate x="-1.5" y="0" z="0"/>') +
              group('<rotate y="1" angle="30"/><translate x="1.5" y="0" z="0"/>') +
              "\n    </scene>\n")
    scene2, st2 = sc.load_scene(_write(tmp_path, manual))
    assert scene2.geom.indices.shape[0] == scene.geom.indices.shape[0]
    img_m = np.asarray(PathTracer(scene2, st2).render(scene2, seed=0, spp=4))
    np.testing.assert_allclose(img_i, img_m, rtol=1e-4, atol=1e-5)
