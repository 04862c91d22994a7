"""G-PT half-vector shift validation: gradient consistency on a scene
with a smooth dielectric sphere (specular chains force the H-copy path
instead of reconnection)."""
import os
import textwrap

import numpy as np
import pytest

from gradientdomain_mitsuba_tpu.models import gpt as gpt_mod
from gradientdomain_mitsuba_tpu.models import path as path_mod
from gradientdomain_mitsuba_tpu.scene import scene as sc

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

GLASS_XML = textwrap.dedent("""\
    <scene version="0.5.0">
      <integrator type="gpt"><integer name="maxDepth" value="4"/></integrator>
      <sensor type="perspective">
        <float name="fov" value="39.3077"/>
        <transform name="toWorld">
          <lookat origin="278, 273, -800" target="278, 273, -799" up="0, 1, 0"/>
        </transform>
        <sampler type="independent"><integer name="sampleCount" value="8"/></sampler>
        <film type="hdrfilm">
          <integer name="width" value="20"/><integer name="height" value="20"/>
          <rfilter type="box"/>
        </film>
      </sensor>
      <bsdf type="diffuse" id="white"><rgb name="reflectance" value="0.725, 0.71, 0.68"/></bsdf>
      <shape type="obj"><string name="filename" value="{mesh}/cbox_floor.obj"/><ref id="white"/></shape>
      <shape type="obj"><string name="filename" value="{mesh}/cbox_ceiling.obj"/><ref id="white"/></shape>
      <shape type="obj"><string name="filename" value="{mesh}/cbox_back.obj"/><ref id="white"/></shape>
      <shape type="obj"><string name="filename" value="{mesh}/cbox_greenwall.obj"/><ref id="white"/></shape>
      <shape type="obj"><string name="filename" value="{mesh}/cbox_redwall.obj"/><ref id="white"/></shape>
      <shape type="sphere">
        <point name="center" x="278" y="150" z="250"/>
        <float name="radius" value="120"/>
        <integer name="nTheta" value="12"/><integer name="nPhi" value="24"/>
        <bsdf type="dielectric"><float name="intIOR" value="1.5"/></bsdf>
      </shape>
      <shape type="obj">
        <string name="filename" value="{mesh}/cbox_luminaire.obj"/>
        <ref id="white"/>
        <emitter type="area"><rgb name="radiance" value="17, 12, 4"/></emitter>
      </shape>
    </scene>
""").format(mesh=os.path.join(ROOT, "data/scenes/cbox/meshes"))


@pytest.fixture(scope="module")
def glass_scene(tmp_path_factory):
    d = tmp_path_factory.mktemp("glass")
    p = d / "glass.xml"
    p.write_text(GLASS_XML)
    return sc.load_scene(str(p))


def test_specular_flag(glass_scene):
    scene, st = glass_scene
    g = gpt_mod.GPTracer(scene, st)
    assert g.any_specular  # the dielectric forces the HV machinery on


def test_primal_parity_with_glass(glass_scene):
    scene, st = glass_scene
    g = gpt_mod.GPTracer(scene, st)
    out = g.render(scene, seed=1, spp=2, chunk=2)
    img = path_mod.PathTracer(scene, st).render(scene, seed=1, spp=2)
    comb = out["primal"] + out["very_direct"]
    np.testing.assert_allclose(comb, img, rtol=3e-4, atol=3e-5)
    for k, v in out.items():
        assert np.isfinite(v).all(), k


def test_gradient_consistency_through_glass(glass_scene):
    """E[dx] vs finite differences of a long PT run, with refraction in
    the view — exercises reconnection AND half-vector (eta-scaled) shifts
    plus their Jacobians.  A sign/Jacobian bug shows up as a systematic
    mismatch; MC noise alone keeps the ratio well under 1."""
    scene, st = glass_scene
    g = gpt_mod.GPTracer(scene, st)
    out = g.render(scene, seed=0, spp=128, chunk=16)
    ref = path_mod.PathTracer(scene, st).render(scene, seed=777, spp=3072)
    ref_nd = ref - out["very_direct"]
    fd_x = ref_nd[:, 1:] - ref_nd[:, :-1]
    dx = out["dx"][:, :-1]
    vd = out["very_direct"].sum(-1)
    mx = (vd[:, 1:] + vd[:, :-1]) == 0
    rms_fd = np.sqrt((fd_x[mx] ** 2).mean())
    rms_err = np.sqrt(((dx[mx] - fd_x[mx]) ** 2).mean())
    assert rms_err / rms_fd < 0.7, (rms_err, rms_fd)
    corr = np.corrcoef(dx[mx].ravel(), fd_x[mx].ravel())[0, 1]
    assert corr > 0.8, corr


ROUGH_XML = GLASS_XML.replace(
    '<bsdf type="dielectric"><float name="intIOR" value="1.5"/></bsdf>',
    '<bsdf type="roughdielectric"><float name="intIOR" value="1.5"/>'
    '<float name="alpha" value="0.05"/></bsdf>').replace(
    '<integrator type="gpt"><integer name="maxDepth" value="4"/>'
    '</integrator>',
    '<integrator type="gpt"><integer name="maxDepth" value="4"/>'
    '<float name="shiftThreshold" value="0.1"/></integrator>')


@pytest.fixture(scope="module")
def rough_scene(tmp_path_factory):
    d = tmp_path_factory.mktemp("roughglass")
    p = d / "rough.xml"
    p.write_text(ROUGH_XML)
    return sc.load_scene(str(p))


def test_roughdielectric_classifies_glossy(rough_scene):
    """alpha=0.05 <= shiftThreshold=0.1: the rough glass takes the
    half-vector branch with a NON-delta microfacet lobe (glossy H copy +
    eta-scaled refraction), the case gpt.cpp stresses on the Veach door."""
    scene, st = rough_scene
    g = gpt_mod.GPTracer(scene, st)
    assert g.any_specular
    assert g.shift_threshold == 0.1


def test_primal_parity_roughdielectric(rough_scene):
    scene, st = rough_scene
    g = gpt_mod.GPTracer(scene, st)
    out = g.render(scene, seed=1, spp=2, chunk=2)
    img = path_mod.PathTracer(scene, st).render(scene, seed=1, spp=2)
    comb = out["primal"] + out["very_direct"]
    np.testing.assert_allclose(comb, img, rtol=3e-4, atol=3e-5)
    for k, v in out.items():
        assert np.isfinite(v).all(), k


def test_gradient_consistency_roughdielectric(rough_scene):
    """E[dx] vs finite differences with GLOSSY half-vector shifts: the
    microfacet H copy must carry the |dwo/dH| Jacobian and the offset's
    own rough-lobe pdf (a missing Jacobian shows as slope != 1)."""
    scene, st = rough_scene
    g = gpt_mod.GPTracer(scene, st)
    out = g.render(scene, seed=0, spp=128, chunk=16)
    ref = path_mod.PathTracer(scene, st).render(scene, seed=777, spp=3072)
    ref_nd = ref - out["very_direct"]
    fd_x = ref_nd[:, 1:] - ref_nd[:, :-1]
    dx = out["dx"][:, :-1]
    vd = out["very_direct"].sum(-1)
    mx = (vd[:, 1:] + vd[:, :-1]) == 0
    a, b = dx[mx].ravel(), fd_x[mx].ravel()
    rms_fd = np.sqrt((b ** 2).mean())
    rms_err = np.sqrt(((a - b) ** 2).mean())
    assert rms_err / rms_fd < 0.75, (rms_err, rms_fd)
    assert np.corrcoef(a, b)[0, 1] > 0.75
    slope = (a * b).sum() / (b * b).sum()
    assert 0.75 < slope < 1.25, slope
