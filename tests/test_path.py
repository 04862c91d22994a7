"""End-to-end path tracer validation (SURVEY.md §8.2 phase 2 acceptance)."""
import os
import textwrap

import numpy as np
import pytest

from gradientdomain_mitsuba_tpu.models import path as path_mod
from gradientdomain_mitsuba_tpu.scene import scene as sc

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CBOX = os.path.join(ROOT, "data/scenes/cbox/cbox.xml")

FURNACE_XML = textwrap.dedent("""\
    <scene version="0.5.0">
      <integrator type="path"><integer name="maxDepth" value="3"/></integrator>
      <sensor type="perspective">
        <float name="fov" value="30"/>
        <transform name="toWorld">
          <lookat origin="0, 0, -4" target="0, 0, 0" up="0, 1, 0"/>
        </transform>
        <sampler type="independent"><integer name="sampleCount" value="32"/></sampler>
        <film type="hdrfilm">
          <integer name="width" value="32"/><integer name="height" value="32"/>
          <rfilter type="box"/>
        </film>
      </sensor>
      <emitter type="constant"><rgb name="radiance" value="1, 1, 1"/></emitter>
      <shape type="sphere">
        <float name="radius" value="1"/>
        <integer name="nTheta" value="24"/>
        <integer name="nPhi" value="48"/>
        <bsdf type="diffuse"><rgb name="reflectance" value="0.5, 0.5, 0.5"/></bsdf>
      </shape>
    </scene>
""")


@pytest.fixture(scope="module")
def furnace(tmp_path_factory):
    d = tmp_path_factory.mktemp("furnace")
    p = d / "furnace.xml"
    p.write_text(FURNACE_XML)
    return sc.load_scene(str(p))


def test_furnace(furnace):
    """Convex diffuse sphere (albedo rho) in constant env L0: every sphere
    pixel must equal rho*L0 in expectation; env pixels exactly L0.  Catches
    NEE/MIS double counting, cosine-warp errors, frame bugs, shadow-ray
    offsets — the whole transport loop at once."""
    scene, st = furnace
    pt = path_mod.PathTracer(scene, st)
    img = pt.render(scene, seed=0, spp=32)
    # corners see the environment directly
    np.testing.assert_allclose(img[0, 0], [1, 1, 1], atol=1e-5)
    np.testing.assert_allclose(img[0, -1], [1, 1, 1], atol=1e-5)
    # sphere center region
    center = img[14:18, 14:18].mean()
    assert abs(center - 0.5) < 0.02, center
    assert not np.isnan(img).any()


def test_furnace_unbiased_mean(furnace):
    """Sphere-region mean over many samples converges to 0.5."""
    scene, st = furnace
    pt = path_mod.PathTracer(scene, st)
    img = pt.render(scene, seed=7, spp=64)
    # all pixels fully inside the sphere silhouette (radius ~0.25 of fov)
    region = img[12:20, 12:20]
    assert abs(region.mean() - 0.5) < 0.01, region.mean()


def test_deterministic():
    scene, st = sc.load_scene(
        CBOX, {"width": "16", "height": "16", "spp": "4", "maxDepth": "3"})
    pt = path_mod.PathTracer(scene, st)
    a = pt.render(scene, seed=3, spp=4)
    b = pt.render(scene, seed=3, spp=4)
    np.testing.assert_array_equal(a, b)


def test_seed_consistency():
    """Two independent seeds agree within Monte Carlo error."""
    scene, st = sc.load_scene(
        CBOX, {"width": "32", "height": "32", "spp": "16", "maxDepth": "4"})
    pt = path_mod.PathTracer(scene, st)
    a = pt.render(scene, seed=0, spp=16)
    b = pt.render(scene, seed=100, spp=16)
    # image means should be close (cbox variance at 16 spp is dominated by
    # rare bright light-hits, so the tolerance is generous)
    assert abs(a.mean() - b.mean()) / max(a.mean(), 1e-9) < 0.15
    assert not np.isnan(a).any() and not np.isnan(b).any()


def test_cbox_smoke_colors():
    scene, st = sc.load_scene(
        CBOX, {"width": "64", "height": "64", "spp": "8", "maxDepth": "3"})
    pt = path_mod.PathTracer(scene, st)
    img = pt.render(scene, seed=0, spp=8)
    left = img[28:36, 2:6].mean(axis=(0, 1))
    right = img[28:36, 58:62].mean(axis=(0, 1))
    assert left[0] > 2.5 * left[1], left    # red wall
    assert right[1] > 1.8 * right[0], right  # green wall
    assert img.max() > 5.0  # light source visible
