"""SPPM (src/integrators/photonmapper/sppm.cpp analog): the hash-grid
photon gather with the Knaus-Zwicker global radius schedule must agree
with the path tracer in expectation on diffuse transport, for both area
and point (delta) emitters."""
import os
import tempfile

import numpy as np

from gradientdomain_mitsuba_tpu.scene import scene as sc
from gradientdomain_mitsuba_tpu.models.path import PathTracer
from gradientdomain_mitsuba_tpu.models.sppm import SPPMTracer

AREA_XML = """<scene version="0.5.0">
  <integrator type="sppm">
    <integer name="maxDepth" value="4"/>
    <integer name="photonCount" value="16384"/>
    <float name="initialRadius" value="0.25"/>
  </integrator>
  <sensor type="perspective">
    <float name="fov" value="45"/>
    <transform name="toWorld">
      <lookat origin="0 1.2 4.5" target="0 0.5 0" up="0 1 0"/>
    </transform>
    <sampler type="independent"><integer name="sampleCount" value="8"/></sampler>
    <film type="hdrfilm">
      <integer name="width" value="24"/>
      <integer name="height" value="24"/>
      <rfilter type="box"/>
    </film>
  </sensor>
  <shape type="rectangle">
    <transform name="toWorld">
      <rotate x="1" angle="-90"/><scale value="4"/>
    </transform>
    <bsdf type="diffuse"><rgb name="reflectance" value="0.6 0.5 0.4"/></bsdf>
  </shape>
  <shape type="rectangle">
    <transform name="toWorld">
      <scale value="4"/><translate z="-2"/>
    </transform>
    <bsdf type="diffuse"><rgb name="reflectance" value="0.5 0.5 0.5"/></bsdf>
  </shape>
  <shape type="rectangle">
    <transform name="toWorld">
      <rotate x="1" angle="90"/><scale value="0.8"/><translate y="3"/>
    </transform>
    <emitter type="area"><rgb name="radiance" value="12 12 12"/></emitter>
  </shape>
</scene>"""

POINT_XML = """<scene version="0.5.0">
  <integrator type="sppm">
    <integer name="maxDepth" value="3"/>
    <integer name="photonCount" value="16384"/>
    <float name="initialRadius" value="0.2"/>
  </integrator>
  <sensor type="perspective">
    <float name="fov" value="40"/>
    <transform name="toWorld">
      <lookat origin="0 2 4" target="0 0 0" up="0 1 0"/>
    </transform>
    <sampler type="independent"><integer name="sampleCount" value="8"/></sampler>
    <film type="hdrfilm">
      <integer name="width" value="24"/>
      <integer name="height" value="24"/>
      <rfilter type="box"/>
    </film>
  </sensor>
  <shape type="rectangle">
    <transform name="toWorld">
      <rotate x="1" angle="-90"/><scale value="4"/>
    </transform>
    <bsdf type="diffuse"><rgb name="reflectance" value="0.7 0.6 0.5"/></bsdf>
  </shape>
  <emitter type="point">
    <point name="position" x="0" y="2.5" z="0"/>
    <rgb name="intensity" value="6 6 6"/>
  </emitter>
</scene>"""


def _load(xml, **overrides):
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "s.xml")
        with open(p, "w") as f:
            f.write(xml)
        return sc.load_scene(p, {k: str(v) for k, v in overrides.items()})


def _interior_mean(img):
    """Mean over the interior (skip film borders where the floor ends)."""
    return img[4:20, 4:20].mean(axis=(0, 1))


def test_sppm_matches_path_area_light():
    scene, st = _load(AREA_XML)
    ref = PathTracer(scene, st).render(scene, seed=1, spp=96)
    img = SPPMTracer(scene, st).render(scene, seed=0, spp=10)
    assert not np.isnan(img).any()
    a, b = _interior_mean(img), _interior_mean(ref)
    # density estimation bias at finite radius + MC noise: generous gate
    err = np.abs(a - b) / np.maximum(b, 1e-6)
    assert err.max() < 0.22, (a, b)


def test_sppm_matches_path_point_light():
    """Delta-emitter photon emission path (power = I*4pi/(pdf terms))."""
    scene, st = _load(POINT_XML)
    ref = PathTracer(scene, st).render(scene, seed=1, spp=64)
    img = SPPMTracer(scene, st).render(scene, seed=0, spp=10)
    assert not np.isnan(img).any()
    a, b = _interior_mean(img), _interior_mean(ref)
    err = np.abs(a - b) / np.maximum(b, 1e-6)
    assert err.max() < 0.22, (a, b)


def test_sppm_deterministic():
    scene, st = _load(POINT_XML)
    tr = SPPMTracer(scene, st)
    a = tr.render(scene, seed=5, spp=2)
    b = tr.render(scene, seed=5, spp=2)
    np.testing.assert_array_equal(a, b)


def test_radius_schedule():
    """r2_{i+1} = r2_i (i+alpha)/(i+1) (Knaus-Zwicker memoryless SPPM),
    checked against the tracer's recorded final radius."""
    scene, st = _load(POINT_XML)
    tr = SPPMTracer(scene, st)
    tr.render(scene, seed=0, spp=4)
    r2 = tr.r0 ** 2
    for i in range(4):
        r2 = r2 * (i + 1 + tr.alpha) / (i + 2)
    np.testing.assert_allclose(tr.last_radius, np.sqrt(r2), rtol=1e-6)
