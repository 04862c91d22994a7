"""Adaptive sampling wrapper + multichannel integrator
(src/integrators/adaptive/adaptive.cpp, misc/multichannel.cpp)."""
import os
import tempfile

import numpy as np

from gradientdomain_mitsuba_tpu.scene import scene as sc
from gradientdomain_mitsuba_tpu.models.adaptive import AdaptiveTracer
from gradientdomain_mitsuba_tpu.models.multichannel import \
    MultiChannelIntegrator
from gradientdomain_mitsuba_tpu.models.path import PathTracer

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CBOX = os.path.join(ROOT, "data/scenes/cbox/cbox.xml")

ADAPTIVE_XML = """<scene version="0.5.0">
  <integrator type="adaptive">
    <float name="maxError" value="0.08"/>
    <integer name="maxSampleFactor" value="4"/>
    <integrator type="path"><integer name="maxDepth" value="3"/></integrator>
  </integrator>
  <sensor type="perspective">
    <float name="fov" value="45"/>
    <transform name="toWorld">
      <lookat origin="0 0 5" target="0 0 0" up="0 1 0"/>
    </transform>
    <sampler type="independent"><integer name="sampleCount" value="8"/></sampler>
    <film type="hdrfilm">
      <integer name="width" value="16"/><integer name="height" value="16"/>
      <rfilter type="box"/>
    </film>
  </sensor>
  <shape type="rectangle">
    <transform name="toWorld">
      <scale value="3"/><translate z="-1"/>
    </transform>
    <bsdf type="diffuse"><rgb name="reflectance" value="0.7 0.5 0.3"/></bsdf>
  </shape>
  <shape type="rectangle">
    <transform name="toWorld">
      <rotate x="1" angle="130"/><scale value="0.6"/><translate y="2" z="2"/>
    </transform>
    <emitter type="area"><rgb name="radiance" value="12 12 12"/></emitter>
  </shape>
</scene>"""


def _load(xml):
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "s.xml")
        with open(p, "w") as f:
            f.write(xml)
        return sc.load_scene(p)


def test_adaptive_child_inherits_depth():
    scene, st = _load(ADAPTIVE_XML)
    assert st.integrator == "adaptive"
    assert st.integrator_children == [
        ("path", {"maxDepth": 3})]
    assert st.max_depth == 3


def test_adaptive_allocates_and_matches_path():
    scene, st = _load(ADAPTIVE_XML)
    tr = AdaptiveTracer(scene, st)
    img = tr.render(scene, seed=0, spp=8)
    assert np.isfinite(img).all()
    smap = tr.last_sample_map
    assert smap.min() >= 8                      # base pass everywhere
    assert smap.max() <= 8 * tr.max_factor + 1  # cap respected
    assert smap.max() > smap.min()              # actually adaptive
    # unbiased: agrees with a plain path render in the image mean
    ref = np.asarray(PathTracer(scene, st).render(scene, seed=3, spp=128))
    assert abs(img.mean() - ref.mean()) / ref.mean() < 0.1


def test_adaptive_deterministic():
    scene, st = _load(ADAPTIVE_XML)
    a = AdaptiveTracer(scene, st).render(scene, seed=5, spp=4)
    b = AdaptiveTracer(scene, st).render(scene, seed=5, spp=4)
    np.testing.assert_array_equal(a, b)


MULTI_XML = """<scene version="0.5.0">
  <integrator type="multichannel">
    <integrator type="path"><integer name="maxDepth" value="3"/></integrator>
    <integrator type="field"><string name="field" value="distance"/></integrator>
    <integrator type="field"><string name="field" value="shNormal"/></integrator>
  </integrator>
  <sensor type="perspective">
    <float name="fov" value="39.3077"/>
    <transform name="toWorld">
      <lookat origin="278, 273, -800" target="278, 273, -799" up="0, 1, 0"/>
    </transform>
    <sampler type="independent"><integer name="sampleCount" value="4"/></sampler>
    <film type="hdrfilm">
      <integer name="width" value="16"/><integer name="height" value="16"/>
      <rfilter type="box"/>
    </film>
  </sensor>
  <shape type="obj"><string name="filename" value="{mesh}/cbox_floor.obj"/>
    <bsdf type="diffuse"/></shape>
  <shape type="obj"><string name="filename" value="{mesh}/cbox_back.obj"/>
    <bsdf type="diffuse"/></shape>
  <shape type="obj"><string name="filename" value="{mesh}/cbox_luminaire.obj"/>
    <bsdf type="diffuse"/>
    <emitter type="area"><rgb name="radiance" value="17, 12, 4"/></emitter>
  </shape>
</scene>""".format(mesh=os.path.join(ROOT, "data/scenes/cbox/meshes"))


def test_multichannel_renders_all_children():
    scene, st = _load(MULTI_XML)
    mc = MultiChannelIntegrator(scene, st)
    out = mc.render(scene, seed=0, spp=4)
    assert set(out) == {"path", "field_distance", "field_shNormal"}
    for name, img in out.items():
        assert img.shape == (16, 16, 3), name
        assert np.isfinite(img).all(), name
    # distance channel: back wall ~ depth 559+800; nonzero and ordered
    d = out["field_distance"][..., 0]
    assert d.max() > 1000
    # path channel matches a standalone path render exactly (same stream,
    # same depth — the child's maxDepth=3 overrides the parent's)
    import copy
    st2 = copy.deepcopy(st)
    st2.max_depth = 3
    ref = np.asarray(PathTracer(scene, st2).render(scene, seed=0, spp=4))
    np.testing.assert_allclose(out["path"], ref, atol=2e-5)
