"""ERPT (src/integrators/erpt/erpt.cpp analog): finite small-step
redistribution chains must keep the path tracer's image in expectation —
the per-round candidate normalization makes each redistribution round an
unbiased estimator on its own."""
import os
import tempfile

import numpy as np

from gradientdomain_mitsuba_tpu.scene import scene as sc
from gradientdomain_mitsuba_tpu.models.path import PathTracer
from gradientdomain_mitsuba_tpu.models.erpt import ERPTracer

XML = """<scene version="0.5.0">
  <integrator type="erpt">
    <integer name="maxDepth" value="3"/>
    <integer name="chains" value="2048"/>
    <integer name="chainLength" value="16"/>
  </integrator>
  <sensor type="perspective">
    <float name="fov" value="45"/>
    <transform name="toWorld">
      <lookat origin="0 0 5" target="0 0 0" up="0 1 0"/>
    </transform>
    <sampler type="independent"><integer name="sampleCount" value="16"/></sampler>
    <film type="hdrfilm">
      <integer name="width" value="16"/>
      <integer name="height" value="16"/>
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
      <rotate x="1" angle="130"/><scale value="0.8"/><translate y="2" z="2"/>
    </transform>
    <emitter type="area"><rgb name="radiance" value="8 8 8"/></emitter>
  </shape>
</scene>"""


def _load():
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "s.xml")
        with open(p, "w") as f:
            f.write(XML)
        return sc.load_scene(p)


def test_erpt_matches_path_in_expectation():
    scene, st = _load()
    ref = np.asarray(PathTracer(scene, st).render(scene, seed=3, spp=256))
    tr = ERPTracer(scene, st)
    img = np.asarray(tr.render(scene, seed=1, spp=256))

    assert np.isfinite(img).all()
    assert img.min() >= 0.0
    np.testing.assert_allclose(img.mean(), ref.mean(), rtol=0.08)
    rb = ref.reshape(4, 4, 4, 4, 3).mean((1, 3, 4))
    ib = img.reshape(4, 4, 4, 4, 3).mean((1, 3, 4))
    scale = np.abs(rb).max()
    assert np.abs(ib - rb).max() / scale < 0.25, \
        np.abs(ib - rb).max() / scale


def test_erpt_deterministic():
    scene, st = _load()
    tr = ERPTracer(scene, st)
    a = np.asarray(tr.render(scene, seed=7, spp=32))
    b = np.asarray(tr.render(scene, seed=7, spp=32))
    np.testing.assert_array_equal(a, b)
