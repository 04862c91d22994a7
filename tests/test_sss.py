"""Dipole subsurface scattering (vs src/subsurface/dipole.cpp).

Oracles:
  - Rd integrates over the plane to the classical total diffuse
    reflectance closed form (Jensen 2001 eq. 9 structure)
  - eval_mo's chunked matmul sum matches a brute-force numpy loop
  - a subsurface sphere in a lit box renders non-zero, finite, and
    brighter than the same shape as a pure absorber
"""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from gradientdomain_mitsuba_tpu.ops import sss as sss_ops
from gradientdomain_mitsuba_tpu.scene import scene as sc
from gradientdomain_mitsuba_tpu.scene import xml_loader

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _table(sigma_s=(2.19, 2.62, 3.00), sigma_a=(0.0021, 0.0041, 0.0071),
           g=0.0, eta=1.5):
    return sc.SSSTable(
        sigma_s=np.asarray([sigma_s], np.float32),
        sigma_a=np.asarray([sigma_a], np.float32),
        g=np.asarray([g], np.float32),
        eta=np.asarray([eta], np.float32),
        shape=np.zeros(1, np.int32),
        shape_sss=np.zeros(1, np.int32),
        tri_offset=np.zeros(1, np.int32),
        tri_count=np.ones(1, np.int32),
        tri_cdf=np.ones(1, np.float32),
        tri_index=np.zeros(1, np.int32),
        total_area=np.ones(1, np.float32))


def test_rd_total_reflectance():
    """2 pi ∫ r Rd(r) dr == closed-form total diffuse reflectance."""
    table = _table()
    co = sss_ops.dipole_coeffs(table)
    # log-spaced radial quadrature (Rd spans decades)
    r = np.logspace(-4, 2, 4096)
    r2 = jnp.asarray((r * r)[:, None], jnp.float32)
    vals = np.asarray(sss_ops.rd(r2, co.sigma_tr[0], co.zr[0],
                                 co.zv[0], co.alpha_p[0]))
    integrand = 2 * np.pi * r[:, None] * vals
    total = np.trapezoid(integrand, r, axis=0)
    want = sss_ops.rd_total(table, 0)
    np.testing.assert_allclose(total, want, rtol=2e-2)


def test_eval_mo_matches_bruteforce():
    rs = np.random.RandomState(3)
    P, N = 300, 64
    table = _table(sigma_s=(1.0, 2.0, 0.5), sigma_a=(0.05, 0.02, 0.1),
                   eta=1.3)
    co = sss_ops.dipole_coeffs(table)
    cache = dict(
        p=jnp.asarray(rs.randn(P, 3), jnp.float32),
        n=jnp.zeros((P, 3), jnp.float32),
        E=jnp.asarray(rs.rand(P, 3), jnp.float32),
        aw=jnp.asarray(rs.rand(P) + 0.1, jnp.float32),
        row=jnp.zeros(P, jnp.int32))
    q = jnp.asarray(rs.randn(N, 3), jnp.float32)
    q_row = jnp.zeros(N, jnp.int32).at[-3:].set(-1)  # 3 masked lanes
    mo = np.asarray(sss_ops.eval_mo(cache, co, q, q_row, chunk=64))

    # brute force
    st, zr, zv, ap = (np.asarray(co.sigma_tr)[0], np.asarray(co.zr)[0],
                      np.asarray(co.zv)[0], np.asarray(co.alpha_p)[0])
    pc = np.asarray(cache["p"]); Ec = np.asarray(cache["E"])
    awc = np.asarray(cache["aw"])
    want = np.zeros((N, 3))
    for i in range(N):
        r2 = np.sum((np.asarray(q)[i] - pc) ** 2, -1)[:, None]
        dr = np.sqrt(r2 + zr * zr); dv = np.sqrt(r2 + zv * zv)
        rd = ap / (4 * np.pi) * (
            zr * (st * dr + 1) * np.exp(-st * dr) / dr ** 3 +
            zv * (st * dv + 1) * np.exp(-st * dv) / dv ** 3)
        want[i] = np.sum(rd * Ec * awc[:, None], 0)
    want[-3:] = 0.0
    np.testing.assert_allclose(mo, want, rtol=2e-3, atol=1e-5)


SSS_XML = """<scene version="0.5.0">
 <integrator type="path"><integer name="maxDepth" value="4"/></integrator>
 <sensor type="perspective">
  <float name="fov" value="60"/>
  <transform name="toWorld">
   <lookat origin="0, 0.6, 2.6" target="0, 0.4, 0" up="0, 1, 0"/>
  </transform>
  <film type="hdrfilm">
   <integer name="width" value="32"/><integer name="height" value="32"/>
  </film>
  <sampler type="independent"><integer name="sampleCount" value="4"/></sampler>
 </sensor>
 <shape type="sphere">
  <float name="radius" value="0.4"/>
  <point name="center" x="0" y="0.4" z="0"/>
  <subsurface type="dipole">
   <string name="material" value="marble"/>
   <float name="scale" value="10"/>
   <integer name="samples" value="256"/>
   <integer name="irrSamples" value="4"/>
  </subsurface>
 </shape>
 <shape type="rectangle">
  <transform name="toWorld">
   <rotate x="1" angle="-90"/><scale value="4"/>
  </transform>
  <bsdf type="diffuse"><spectrum name="reflectance" value="0.7"/></bsdf>
 </shape>
 <shape type="sphere">
  <float name="radius" value="0.15"/>
  <point name="center" x="1.2" y="1.6" z="1.0"/>
  <emitter type="area"><spectrum name="radiance" value="60"/></emitter>
 </shape>
</scene>"""


@pytest.fixture(scope="module")
def sss_scene(tmp_path_factory):
    d = tmp_path_factory.mktemp("sss")
    p = str(d / "sss.xml")
    open(p, "w").write(SSS_XML)
    desc = xml_loader.load(p)
    return sc.compile_scene(desc)


def test_scene_compiles_sss_table(sss_scene):
    scene, st = sss_scene
    assert st.has_sss
    t = scene.sss
    assert t.sigma_s.shape == (1, 3)
    # marble preset, scale 10
    np.testing.assert_allclose(t.sigma_s[0], np.float32((21.9, 26.2, 30.0)),
                               rtol=1e-5)
    assert t.eta[0] == pytest.approx(1.5)
    # every triangle of the (tessellated) sphere is in the CDF
    assert t.tri_cdf.shape[0] == t.tri_count[0]
    assert t.tri_cdf[-1] == pytest.approx(1.0, abs=1e-5)
    assert st.sss_props["samples"] == 256


def test_surface_points_on_shape(sss_scene):
    scene, st = sss_scene
    pts = sss_ops.sample_surface_points(scene, 512, 9)
    p = np.asarray(pts["p"])
    # all points on the radius-0.4 sphere at (0, 0.4, 0)
    r = np.linalg.norm(p - np.float32((0, 0.4, 0)), axis=-1)
    assert np.all(np.abs(r - 0.4) < 0.02)  # tessellation sag tolerance
    n = np.asarray(pts["n"])
    np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, atol=1e-4)
    # outward normals
    assert np.all(np.sum(n * (p - np.float32((0, 0.4, 0))), -1) > 0)
    # area weights sum to the total surface area
    assert np.asarray(pts["aw"]).sum() == pytest.approx(
        float(scene.sss.total_area[0]) * 1.0, rel=1e-4)


def test_dipole_render(sss_scene):
    from gradientdomain_mitsuba_tpu.models.factory import make_integrator
    scene, st = sss_scene
    tracer = make_integrator(scene, st)
    from gradientdomain_mitsuba_tpu.models.sss import DipoleTracer
    assert isinstance(tracer, DipoleTracer)
    img = np.asarray(tracer.render(scene, seed=1, spp=4))
    assert np.all(np.isfinite(img))
    # the subsurface sphere occupies the image center; translucent marble
    # must scatter light back out
    c = img[12:20, 12:20].mean()
    assert c > 1e-3
