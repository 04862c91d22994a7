"""Sensor family beyond perspective/thinlens (src/sensors/{orthographic,
telecentric,spherical,radiancemeter,fluencemeter}.cpp), the heightfield
shape, and the collimated emitter."""
import os
import tempfile

import numpy as np

from gradientdomain_mitsuba_tpu.scene import scene as sc
from gradientdomain_mitsuba_tpu.scene import meshes as mesh_mod
from gradientdomain_mitsuba_tpu.models.path import PathTracer


def _load(xml, **overrides):
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "s.xml")
        with open(p, "w") as f:
            f.write(xml)
        return sc.load_scene(p, {k: str(v) for k, v in overrides.items()})


def _render(xml, spp=8, seed=0):
    scene, st = _load(xml)
    return PathTracer(scene, st).render(scene, seed=seed, spp=spp)


SPHERICAL_ENV = """<scene version="0.5.0">
  <integrator type="path"><integer name="maxDepth" value="2"/></integrator>
  <sensor type="spherical">
    <sampler type="independent"><integer name="sampleCount" value="4"/></sampler>
    <film type="hdrfilm">
      <integer name="width" value="16"/><integer name="height" value="8"/>
      <rfilter type="box"/>
    </film>
  </sensor>
  <emitter type="constant"><rgb name="radiance" value="2, 2, 2"/></emitter>
  <shape type="sphere">
    <point name="center" x="50" y="0" z="0"/>
    <float name="radius" value="0.1"/>
    <bsdf type="diffuse"/>
  </shape>
</scene>"""


def test_spherical_constant_env():
    """Every direction sees the constant environment -> exactly 2."""
    img = _render(SPHERICAL_ENV, spp=4)
    assert np.isfinite(img).all()
    # ignore the tiny far-away sphere (a couple of pixels at most)
    frac_exact = (np.abs(img - 2.0) < 1e-4).all(-1).mean()
    assert frac_exact > 0.95, frac_exact


SPHERICAL_UP = """<scene version="0.5.0">
  <integrator type="path"><integer name="maxDepth" value="2"/></integrator>
  <sensor type="spherical">
    <sampler type="independent"><integer name="sampleCount" value="8"/></sampler>
    <film type="hdrfilm">
      <integer name="width" value="16"/><integer name="height" value="16"/>
      <rfilter type="box"/>
    </film>
  </sensor>
  <shape type="sphere">
    <point name="center" x="0" y="10" z="0"/>
    <float name="radius" value="4"/>
    <emitter type="area"><rgb name="radiance" value="5, 5, 5"/></emitter>
  </shape>
  <shape type="rectangle">
    <transform name="toWorld"><scale value="50"/><translate z="60"/></transform>
    <bsdf type="diffuse"><rgb name="reflectance" value="0.0 0.0 0.0"/></bsdf>
  </shape>
</scene>"""


def test_spherical_mapping_up_is_row0():
    """theta = pi*y/H: an emitter straight 'up' (+y in camera space) must
    land in the TOP film rows (spherical.cpp lat-long convention)."""
    img = _render(SPHERICAL_UP, spp=8)
    top = img[0:3].mean()
    bottom = img[-3:].mean()
    assert top > 10 * max(bottom, 1e-6), (top, bottom)


ORTHO_T = """<scene version="0.5.0">
  <integrator type="path"><integer name="maxDepth" value="3"/></integrator>
  <sensor type="{kind}">
    <transform name="toWorld">
      <scale x="3" y="3" z="1"/>
      <lookat origin="0 0 -5" target="0 0 0" up="0 1 0"/>
    </transform>
    {extra}
    <sampler type="independent"><integer name="sampleCount" value="4"/></sampler>
    <film type="hdrfilm">
      <integer name="width" value="16"/><integer name="height" value="16"/>
      <rfilter type="box"/>
    </film>
  </sensor>
  <shape type="rectangle">
    <bsdf type="diffuse"><rgb name="reflectance" value="0.5 0.5 0.5"/></bsdf>
  </shape>
  <emitter type="constant"><rgb name="radiance" value="1, 1, 1"/></emitter>
</scene>"""


def test_telecentric_zero_aperture_equals_orthographic():
    a = _render(ORTHO_T.format(kind="orthographic", extra=""), spp=8)
    b = _render(ORTHO_T.format(
        kind="telecentric",
        extra='<float name="apertureRadius" value="0.0"/>'
              '<float name="focusDistance" value="5.0"/>'), spp=8)
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_telecentric_dof_blurs_offplane():
    """With a real aperture, geometry away from the focal plane blurs:
    the edge of the lit rectangle softens vs the pinhole render."""
    sharp = _render(ORTHO_T.format(kind="orthographic", extra=""), spp=32)
    blur = _render(ORTHO_T.format(
        kind="telecentric",
        extra='<float name="apertureRadius" value="0.4"/>'
              '<float name="focusDistance" value="1.0"/>'), spp=32)
    # focal plane at 1 unit in front of the sensor plane; the rectangle
    # sits 5 units away -> blurred silhouette => gradient across the
    # rectangle edge is weaker
    gx_sharp = np.abs(np.diff(sharp.mean(-1), axis=1)).max()
    gx_blur = np.abs(np.diff(blur.mean(-1), axis=1)).max()
    assert gx_blur < 0.7 * gx_sharp, (gx_blur, gx_sharp)


RADMETER = """<scene version="0.5.0">
  <integrator type="path"><integer name="maxDepth" value="2"/></integrator>
  <sensor type="radiancemeter">
    <transform name="toWorld">
      <lookat origin="0 0 3" target="0 0 0" up="0 1 0"/>
    </transform>
    <sampler type="independent"><integer name="sampleCount" value="4"/></sampler>
    <film type="hdrfilm">
      <integer name="width" value="1"/><integer name="height" value="1"/>
      <rfilter type="box"/>
    </film>
  </sensor>
  <shape type="rectangle">
    <emitter type="area"><rgb name="radiance" value="3, 2, 1"/></emitter>
  </shape>
</scene>"""


def test_radiancemeter_reads_emitter_radiance():
    img = _render(RADMETER, spp=4)
    assert img.shape[:2] == (1, 1)
    np.testing.assert_allclose(img[0, 0], [3, 2, 1], rtol=1e-5)


FLUMETER = """<scene version="0.5.0">
  <integrator type="path"><integer name="maxDepth" value="2"/></integrator>
  <sensor type="fluencemeter">
    <sampler type="independent"><integer name="sampleCount" value="64"/></sampler>
    <film type="hdrfilm">
      <integer name="width" value="1"/><integer name="height" value="1"/>
      <rfilter type="box"/>
    </film>
  </sensor>
  <emitter type="constant"><rgb name="radiance" value="2, 2, 2"/></emitter>
  <shape type="sphere">
    <point name="center" x="50" y="0" z="0"/>
    <float name="radius" value="0.1"/>
    <bsdf type="diffuse"/>
  </shape>
</scene>"""


def test_fluencemeter_uniform_env():
    """Uniform-sphere directions in a constant env: the film records the
    direction-averaged radiance (= fluence / 4pi — see ops/sensor.py for
    the documented normalization deviation) -> exactly L."""
    img = _render(FLUMETER, spp=256)
    np.testing.assert_allclose(img[0, 0], [2, 2, 2], rtol=0.02)


# ---------------------------------------------------------------------------
# heightfield
# ---------------------------------------------------------------------------

def test_heightfield_flat_geometry():
    m = mesh_mod.make_heightfield(np.zeros((4, 5), np.float32))
    assert m.positions.shape == (20, 3)
    assert m.num_tris == 2 * 3 * 4
    np.testing.assert_allclose(m.positions[:, 2], 0.0)
    np.testing.assert_allclose(m.normals, [[0, 0, 1]] * 20, atol=1e-6)
    assert m.positions[:, 0].min() == -1 and m.positions[:, 0].max() == 1


def test_heightfield_displacement_normals():
    """A ramp z = x tilts the normals toward -x."""
    xs = np.linspace(-1, 1, 8, dtype=np.float32)
    vals = np.tile(xs[None, :], (8, 1))
    m = mesh_mod.make_heightfield(vals)
    # slope dz/dx = 1 -> normal ~ (-1, 0, 1)/sqrt(2) on interior verts
    inner = m.normals[m.positions[:, 0] ** 2 < 0.5]
    np.testing.assert_allclose(inner[:, 0], -inner[:, 2], atol=0.05)
    assert (np.abs(inner[:, 1]) < 0.05).all()


def test_heightfield_scene_renders():
    xml = """<scene version="0.5.0">
      <integrator type="path"><integer name="maxDepth" value="2"/></integrator>
      <sensor type="perspective">
        <float name="fov" value="45"/>
        <transform name="toWorld">
          <lookat origin="0 2 -3" target="0 0 0" up="0 1 0"/>
        </transform>
        <sampler type="independent"><integer name="sampleCount" value="4"/></sampler>
        <film type="hdrfilm">
          <integer name="width" value="16"/><integer name="height" value="16"/>
          <rfilter type="box"/>
        </film>
      </sensor>
      <shape type="heightfield">
        <integer name="resolution" value="8"/>
        <transform name="toWorld"><rotate x="1" angle="-90"/></transform>
        <bsdf type="diffuse"><rgb name="reflectance" value="0.5 0.5 0.5"/></bsdf>
      </shape>
      <emitter type="constant"><rgb name="radiance" value="1, 1, 1"/></emitter>
    </scene>"""
    img = _render(xml, spp=8)
    assert np.isfinite(img).all()
    assert img.mean() > 0.3  # lit floor + env visible


# ---------------------------------------------------------------------------
# collimated emitter
# ---------------------------------------------------------------------------

COLLIMATED = """<scene version="0.5.0">
  <integrator type="sppm">
    <integer name="maxDepth" value="3"/>
    <integer name="photonCount" value="512"/>
    <integer name="gatherCap" value="600"/>
    <float name="initialRadius" value="0.25"/>
  </integrator>
  <sensor type="perspective">
    <float name="fov" value="45"/>
    <transform name="toWorld">
      <lookat origin="0 2.5 -4" target="0 0 0" up="0 1 0"/>
    </transform>
    <sampler type="independent"><integer name="sampleCount" value="4"/></sampler>
    <film type="hdrfilm">
      <integer name="width" value="16"/><integer name="height" value="16"/>
      <rfilter type="box"/>
    </film>
  </sensor>
  <shape type="rectangle">
    <transform name="toWorld">
      <rotate x="1" angle="-90"/><scale value="4"/>
    </transform>
    <bsdf type="diffuse"><rgb name="reflectance" value="0.7 0.7 0.7"/></bsdf>
  </shape>
  <emitter type="collimated">
    <transform name="toWorld">
      <lookat origin="0 3 0" target="0 0 0" up="1 0 0"/>
    </transform>
    <rgb name="power" value="4, 4, 4"/>
  </emitter>
</scene>"""


def test_collimated_beam_via_photons():
    """The beam is invisible to NEE (doubly delta) but deposits photons:
    the floor shows a bright spot at the beam target under SPPM.
    gatherCap > photonCount so the single-cell concentration of the
    beam's first deposit is never truncated."""
    from gradientdomain_mitsuba_tpu.models.sppm import SPPMTracer
    scene, st = _load(COLLIMATED)
    # path tracing sees nothing (no NEE, no emitter geometry)
    img_pt = PathTracer(scene, st).render(scene, seed=0, spp=4)
    assert img_pt.max() < 1e-6
    img = SPPMTracer(scene, st).render(scene, seed=0, spp=4)
    assert np.isfinite(img).all()
    center = img[5:11, 5:11].max()
    border = img[:2].mean() + img[-2:].mean()
    assert center > 0.05, center
    assert center > 20 * max(border, 1e-9), (center, border)


RDIST = """<scene version="0.5.0">
  <integrator type="path"><integer name="maxDepth" value="2"/></integrator>
  <sensor type="perspective_rdist">
    <float name="fov" value="50"/>
    <string name="kc" value="%s"/>
    <transform name="toWorld">
      <lookat origin="0 0 4" target="0 0 0" up="0 1 0"/>
    </transform>
    <sampler type="independent"><integer name="sampleCount" value="4"/></sampler>
    <film type="hdrfilm">
      <integer name="width" value="32"/><integer name="height" value="32"/>
      <rfilter type="box"/>
    </film>
  </sensor>
  <shape type="rectangle">
    <transform name="toWorld"><scale value="3"/></transform>
    <bsdf type="diffuse"/>
  </shape>
  <emitter type="constant"><rgb name="radiance" value="1, 1, 1"/></emitter>
</scene>"""


def test_rdist_zero_kc_matches_perspective():
    """perspective_rdist with kc=0 must be EXACTLY the perspective sensor
    (src/sensors/perspective_rdist.cpp degenerates to perspective.cpp)."""
    from gradientdomain_mitsuba_tpu.ops import sensor as sensor_ops
    scene, st = _load(RDIST % "0, 0")
    pos = np.array([[16.0, 16.0], [3.0, 28.0], [30.0, 2.0]], np.float32)
    u = np.zeros((3, 2), np.float32)
    o1, d1 = sensor_ops.sample_ray(scene.camera, 32, 32, pos, u)
    cam0 = scene.camera._replace(kc=np.zeros(2, np.float32))
    o0, d0 = sensor_ops.sample_ray(cam0, 32, 32, pos, u)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d0), atol=1e-6)


def test_rdist_roundtrip_projection():
    """sample_ray's inverse distortion and importance_sample_direct's
    forward distortion must be mutually consistent: a point on the
    generated ray projects back to the originating film position."""
    from gradientdomain_mitsuba_tpu.ops import sensor as sensor_ops
    scene, st = _load(RDIST % "0.08, 0.02")
    assert float(np.abs(np.asarray(scene.camera.kc)).sum()) > 0
    pos = np.array([[16.0, 16.0], [5.0, 26.0], [28.0, 4.0], [2.0, 2.0]],
                   np.float32)
    u = np.zeros((4, 2), np.float32)
    o, d = sensor_ops.sample_ray(scene.camera, 32, 32, pos, u)
    p = np.asarray(o) + 2.5 * np.asarray(d)
    film, we, ok = sensor_ops.importance_sample_direct(
        scene.camera, 32, 32, p)
    assert np.asarray(ok).all()
    np.testing.assert_allclose(np.asarray(film), pos, atol=2e-3)
    # and the distortion is actually non-trivial: undistorted projection
    # of the same points must NOT land on pos away from the center
    cam0 = scene.camera._replace(kc=np.zeros(2, np.float32))
    film0, _, _ = sensor_ops.importance_sample_direct(cam0, 32, 32, p)
    assert np.abs(np.asarray(film0)[1:] - pos[1:]).max() > 0.2


def test_rdist_renders():
    img = np.asarray(_render(RDIST % "0.05, 0.01", spp=4))
    assert np.isfinite(img).all() and img.mean() > 0.01
