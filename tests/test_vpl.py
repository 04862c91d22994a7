"""VPL / instant radiosity (src/integrators/vpl/vpl.cpp analog):
clamped point-to-point transport must reproduce the path tracer's image
up to the documented clamping bias."""
import os
import tempfile

import numpy as np

from gradientdomain_mitsuba_tpu.scene import scene as sc
from gradientdomain_mitsuba_tpu.models.path import PathTracer
from gradientdomain_mitsuba_tpu.models.vpl import VPLTracer

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

XML = """<scene version="0.5.0">
  <integrator type="vpl">
    <integer name="maxDepth" value="3"/>
    <integer name="vplCount" value="2048"/>
    <float name="clamping" value="0.02"/>
  </integrator>
  <sensor type="perspective">
    <float name="fov" value="39.3077"/>
    <transform name="toWorld">
      <lookat origin="278, 273, -800" target="278, 273, -799" up="0, 1, 0"/>
    </transform>
    <sampler type="independent"><integer name="sampleCount" value="8"/></sampler>
    <film type="hdrfilm">
      <integer name="width" value="16"/><integer name="height" value="16"/>
      <rfilter type="box"/>
    </film>
  </sensor>
  <bsdf type="diffuse" id="white"><rgb name="reflectance" value="0.725, 0.71, 0.68"/></bsdf>
  <bsdf type="diffuse" id="red"><rgb name="reflectance" value="0.63, 0.065, 0.05"/></bsdf>
  <shape type="obj"><string name="filename" value="{mesh}/cbox_floor.obj"/><ref id="white"/></shape>
  <shape type="obj"><string name="filename" value="{mesh}/cbox_ceiling.obj"/><ref id="white"/></shape>
  <shape type="obj"><string name="filename" value="{mesh}/cbox_back.obj"/><ref id="white"/></shape>
  <shape type="obj"><string name="filename" value="{mesh}/cbox_redwall.obj"/><ref id="red"/></shape>
  <shape type="obj">
    <string name="filename" value="{mesh}/cbox_luminaire.obj"/>
    <ref id="white"/>
    <emitter type="area"><rgb name="radiance" value="17, 12, 4"/></emitter>
  </shape>
</scene>""".format(mesh=os.path.join(ROOT, "data/scenes/cbox/meshes"))


def _load():
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "s.xml")
        with open(p, "w") as f:
            f.write(XML)
        return sc.load_scene(p)


def test_vpl_matches_path():
    scene, st = _load()
    ref = np.asarray(PathTracer(scene, st).render(scene, seed=2, spp=96))
    img = VPLTracer(scene, st).render(scene, seed=0, spp=8)
    assert np.isfinite(img).all()
    assert img.min() >= 0.0
    # interior mean within clamping bias + MC noise
    a = img[2:14, 2:14].mean()
    b = ref[2:14, 2:14].mean()
    assert abs(a - b) / b < 0.15, (a, b)
    # red wall bleeds onto nearby floor: color ratio sanity (indirect on)
    left = img[6:10, 1:4].mean(axis=(0, 1))
    assert left[0] > left[2]  # red-ish tint from the red wall side


def test_vpl_deterministic():
    scene, st = _load()
    tr = VPLTracer(scene, st)
    a = tr.render(scene, seed=5, spp=2)
    b = tr.render(scene, seed=5, spp=2)
    np.testing.assert_array_equal(a, b)
