"""Infrastructure: checkpoint/resume exactness, delta emitters, stratified
sampling variance, direct/ao integrators."""
import os
import textwrap

import numpy as np
import pytest

from gradientdomain_mitsuba_tpu.models import path as path_mod
from gradientdomain_mitsuba_tpu.models.direct import AOIntegrator, DirectIntegrator
from gradientdomain_mitsuba_tpu.scene import scene as sc

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CBOX = os.path.join(ROOT, "data/scenes/cbox/cbox.xml")

POINT_XML = textwrap.dedent("""\
    <scene version="0.5.0">
      <integrator type="path"><integer name="maxDepth" value="3"/></integrator>
      <sensor type="perspective">
        <float name="fov" value="60"/>
        <transform name="toWorld">
          <lookat origin="0, 1, -3" target="0, 0.5, 0" up="0, 1, 0"/>
        </transform>
        <sampler type="independent"><integer name="sampleCount" value="16"/></sampler>
        <film type="hdrfilm">
          <integer name="width" value="24"/><integer name="height" value="24"/>
          <rfilter type="box"/>
        </film>
      </sensor>
      <emitter type="point">
        <point name="position" x="0" y="3" z="0"/>
        <rgb name="intensity" value="20, 18, 15"/>
      </emitter>
      <shape type="rectangle">
        <transform name="toWorld"><scale value="5"/><rotate x="1" angle="-90"/></transform>
        <bsdf type="diffuse"><rgb name="reflectance" value="0.6, 0.6, 0.6"/></bsdf>
      </shape>
      <shape type="sphere">
        <point name="center" x="0" y="0.5" z="0"/>
        <float name="radius" value="0.5"/>
        <integer name="nTheta" value="16"/><integer name="nPhi" value="32"/>
        <bsdf type="diffuse"><rgb name="reflectance" value="0.5, 0.3, 0.2"/></bsdf>
      </shape>
    </scene>
""")


@pytest.fixture(scope="module")
def point_scene(tmp_path_factory):
    d = tmp_path_factory.mktemp("pt")
    p = d / "pt.xml"
    p.write_text(POINT_XML)
    return sc.load_scene(str(p))


def test_checkpoint_resume_exact(tmp_path):
    """A resumed render must be BIT-IDENTICAL to an uninterrupted one
    (counter-based RNG makes the remaining work a pure function of the
    sample cursor) — exceeds the reference, which has no checkpointing."""
    scene, st = sc.load_scene(
        CBOX, {"width": "16", "height": "16", "spp": "8", "maxDepth": "3"})
    pt = path_mod.PathTracer(scene, st)
    straight = pt.render(scene, seed=7, spp=8, chunk=4)

    ck = str(tmp_path / "render.ckpt")
    # phase 1: render half, checkpointing
    from gradientdomain_mitsuba_tpu.parallel import checkpoint as cp
    state, _ = cp.render_accumulate(pt, scene, 7, 4, chunk=4,
                                    checkpoint_path=ck)
    # phase 2: "new process" resumes to the full count
    resumed = pt.render(scene, seed=7, spp=8, chunk=4,
                        checkpoint_path=ck, resume=True)
    np.testing.assert_array_equal(resumed, straight)


def test_checkpoint_seed_mismatch(tmp_path):
    scene, st = sc.load_scene(
        CBOX, {"width": "16", "height": "16", "spp": "4", "maxDepth": "3"})
    pt = path_mod.PathTracer(scene, st)
    ck = str(tmp_path / "c.ckpt")
    pt.render(scene, seed=1, spp=2, chunk=2, checkpoint_path=ck)
    with pytest.raises(ValueError):
        pt.render(scene, seed=2, spp=4, chunk=2, checkpoint_path=ck,
                  resume=True)


def test_point_light_analytic(point_scene):
    """Unshadowed floor under a point light: L = rho/pi * I * cos/d^2."""
    scene, st = point_scene
    assert st.n_delta == 1
    img = path_mod.PathTracer(scene, st).render(scene, seed=0, spp=32)
    assert not np.isnan(img).any()
    # direct-only analytic at a floor point clear of the sphere's shadow:
    # use DirectIntegrator to avoid indirect light in the comparison
    d = DirectIntegrator(scene, st)
    img_d = d.render(scene, seed=0, spp=64)
    # pixel (20, 4) maps to a floor point left of the sphere; compute the
    # expected value from the camera geometry instead of hand-picking:
    # project: floor points x=-1.5, z=0.5 -> L = 0.6/pi*I*cos/d2
    p = np.array([-1.5, 0.0, 0.5])
    lp = np.array([0.0, 3.0, 0.0])
    to_l = lp - p
    d2 = (to_l ** 2).sum()
    cos = to_l[1] / np.sqrt(d2)
    expected = 0.6 / np.pi * np.array([20, 18, 15]) * cos / d2
    # find the pixel for p via the camera transform
    from gradientdomain_mitsuba_tpu.ops import sensor as sensor_ops
    import jax.numpy as jnp
    film, _, valid = sensor_ops.importance_sample_direct(
        scene.camera, st.width, st.height, jnp.asarray(p[None], jnp.float32))
    px, py = int(film[0, 0]), int(film[0, 1])
    got = img_d[py, px]
    np.testing.assert_allclose(got, expected, rtol=0.25)


def test_stratified_lowers_variance():
    """LHS sampling must reduce pixel variance vs independent on the
    directly-lit cbox at equal spp."""
    imgs = {}
    for sampler in ("independent", "stratified"):
        scene, st = sc.load_scene(
            CBOX, {"width": "16", "height": "16", "spp": "16",
                   "maxDepth": "2"})
        st.sampler = sampler
        pt = path_mod.PathTracer(scene, st)
        runs = [pt.render(scene, seed=s, spp=16) for s in range(4)]
        imgs[sampler] = np.var(np.stack(runs), axis=0).mean()
    assert imgs["stratified"] < imgs["independent"], imgs


def test_ao_integrator(point_scene):
    scene, st = point_scene
    ao = AOIntegrator(scene, st)
    img = ao.render(scene, seed=0, spp=8)
    assert img.min() >= 0 and img.max() <= 1.0 + 1e-5
    # floor near the sphere is more occluded than far away
    assert img[20, 2].mean() > img[17, 12].mean() - 1e-3


def test_measured_ray_counters():
    """count_rays must survive the traced bounce fori_loops (the tally is
    threaded through the loop carry — common.drain_tally) and report a
    plausible device-measured total for both the plain path tracer and
    G-PT (all-diffuse suffix-factorized AND specular any_specular paths).
    Regression: bench.py crashed with UnexpectedTracerError when the
    counter instrumentation leaked inner-loop tracers."""
    from gradientdomain_mitsuba_tpu.models.gpt import GPTracer

    W = H = 16
    spp = 2
    for xml, integ, cls in [
            (CBOX, "path", path_mod.PathTracer),
            (CBOX, "gpt", GPTracer),  # all-diffuse: suffix fast path
            (os.path.join(ROOT, "data/scenes/cbox-mats/cbox-mats.xml"),
             "gpt", GPTracer),        # specular: any_specular loop
    ]:
        scene, st = sc.load_scene(xml, {
            "width": str(W), "height": str(H), "spp": str(spp),
            "maxDepth": "4", "integrator": integ})
        tr = cls(scene, st)
        tr.count_rays = True
        out = tr.render(scene, seed=0, spp=spp)
        img = out["primal"] if isinstance(out, dict) else out
        assert np.isfinite(np.asarray(img)).all()
        rays = tr.last_ray_count
        # at least one camera ray per sample; far below the all-lanes-
        # alive-every-bounce x every-traversal-call upper bound
        n_lanes = W * H * spp
        assert rays >= n_lanes, (integ, rays)
        assert rays <= n_lanes * 4 * (2 + 2 + 4 + 4 + 4), (integ, rays)
