"""Hanrahan-Krueger slab BSDF (src/bsdfs/hk.cpp): closed-form single
scattering + delta transmission.  Checks reciprocity, the sampling
estimator against brute-force quadrature of eval, thin/thick slab
limits, and an end-to-end render."""
import os
import tempfile

import numpy as np
import jax.numpy as jnp

from gradientdomain_mitsuba_tpu.ops import bsdf as bsdf_ops
from gradientdomain_mitsuba_tpu.scene.materials import HK


def _params(n, sig_s=(1.0, 0.8, 0.6), sig_a=(0.05, 0.1, 0.2),
            thickness=1.0, g=0.0):
    z3 = jnp.zeros((n, 3))
    return bsdf_ops.MatParams(
        kind=jnp.full(n, HK, jnp.int32),
        twosided=jnp.zeros(n, bool),
        reflectance=jnp.broadcast_to(jnp.asarray(sig_s), (n, 3)),
        specular=jnp.ones((n, 3)),
        transmittance=jnp.broadcast_to(jnp.asarray(sig_a), (n, 3)),
        alpha=jnp.full(n, thickness),
        eta=jnp.ones((n, 3)), k=z3,
        dist=jnp.zeros(n, jnp.int32),
        fdr_int=jnp.zeros(n), spec_weight=jnp.zeros(n),
        alpha_v=jnp.full(n, g), opacity=jnp.ones(n))


KINDS = frozenset({HK})


def _sphere_grid(nt=64, np_=128):
    """(dirs [M,3], weights [M]) midpoint quadrature over the sphere."""
    th = (np.arange(nt) + 0.5) / nt * np.pi
    ph = (np.arange(np_) + 0.5) / np_ * 2 * np.pi
    T, P = np.meshgrid(th, ph, indexing="ij")
    d = np.stack([np.sin(T) * np.cos(P), np.sin(T) * np.sin(P),
                  np.cos(T)], -1).reshape(-1, 3)
    w = (np.sin(T) * (np.pi / nt) * (2 * np.pi / np_)).reshape(-1)
    return d.astype(np.float32), w.astype(np.float32)


def test_hk_reciprocity():
    """f(wi,wo) == f(wo,wi) (the HK BRDF/BTDF is reciprocal); eval
    returns f*|cos_o| so compare eval/|cos_o| both ways."""
    rng = np.random.default_rng(7)
    wi = rng.normal(size=(256, 3)).astype(np.float32)
    wo = rng.normal(size=(256, 3)).astype(np.float32)
    wi /= np.linalg.norm(wi, axis=-1, keepdims=True)
    wo /= np.linalg.norm(wo, axis=-1, keepdims=True)
    p = _params(256, g=0.6)
    f_io = np.asarray(bsdf_ops.eval(p, jnp.asarray(wi), jnp.asarray(wo),
                                    KINDS)) / np.abs(wo[:, 2:])
    f_oi = np.asarray(bsdf_ops.eval(p, jnp.asarray(wo), jnp.asarray(wi),
                                    KINDS)) / np.abs(wi[:, 2:])
    np.testing.assert_allclose(f_io, f_oi, rtol=1e-3, atol=1e-5)


def test_hk_sampling_matches_quadrature():
    """E[sample weight] == integral of eval over the sphere + the delta
    transmittance (the estimator's normalization and the component
    probabilities must agree)."""
    from gradientdomain_mitsuba_tpu.core.rng import uniform_2d, uniform_float
    wi_one = np.array([0.3, -0.2, 0.93], np.float32)
    wi_one /= np.linalg.norm(wi_one)

    d, w = _sphere_grid()
    M = d.shape[0]
    pq = _params(M, g=0.4)
    wiq = jnp.broadcast_to(jnp.asarray(wi_one), (M, 3))
    f = np.asarray(bsdf_ops.eval(pq, wiq, jnp.asarray(d), KINDS))
    integral = (f * w[:, None]).sum(0)
    t_delta = np.asarray(bsdf_ops._hk_delta_t(
        _params(1, g=0.4), jnp.asarray(wi_one[None])))[0]
    want = integral + t_delta

    N = 200_000
    ps = _params(N, g=0.4)
    ids = jnp.arange(N, dtype=jnp.uint32)
    u2 = uniform_2d(3, ids, 0, 0)
    uc = uniform_float(3, ids, 0, 2)
    wiN = jnp.broadcast_to(jnp.asarray(wi_one), (N, 3))
    s = bsdf_ops.sample(ps, wiN, u2, uc, KINDS)
    got = np.asarray(jnp.mean(jnp.where(s.valid[:, None], s.weight, 0.0),
                              axis=0))
    np.testing.assert_allclose(got, want, rtol=0.03)


def test_hk_limits():
    """Thin slab: everything passes through unscattered; thick slab:
    delta transmittance vanishes and single scattering saturates."""
    wi = jnp.asarray([[0.0, 0.0, 1.0]])
    thin = _params(1, thickness=1e-5)
    t_thin = np.asarray(bsdf_ops._hk_delta_t(thin, wi))[0]
    np.testing.assert_allclose(t_thin, 1.0, atol=1e-4)

    thick = _params(1, sig_s=(1, 1, 1), sig_a=(0, 0, 0), thickness=1e3)
    t_thick = np.asarray(bsdf_ops._hk_delta_t(thick, wi))[0]
    assert t_thick.max() < 1e-6
    # conservative thick slab: single-scattered reflection at normal
    # incidence approaches alb*p/(mu_i+mu_o)*mu_o = 1/(4pi)/2
    wo = jnp.asarray([[0.0, 0.0, 1.0]])
    f = np.asarray(bsdf_ops.eval(thick, wi, wo, KINDS))[0]
    np.testing.assert_allclose(f, 1.0 / (8.0 * np.pi), rtol=1e-3)


def test_hk_energy_bounded():
    """Single scattering + delta transmission never exceeds unit energy
    (per channel) for a conservative slab."""
    d, w = _sphere_grid()
    M = d.shape[0]
    for mu in (1.0, 0.6, 0.2):
        wi_one = np.array([np.sqrt(1 - mu * mu), 0.0, mu], np.float32)
        pq = _params(M, sig_s=(1, 1, 1), sig_a=(0, 0, 0), thickness=2.0,
                     g=0.3)
        wiq = jnp.broadcast_to(jnp.asarray(wi_one), (M, 3))
        f = np.asarray(bsdf_ops.eval(pq, wiq, jnp.asarray(d), KINDS))
        total = (f * w[:, None]).sum(0) + np.asarray(
            bsdf_ops._hk_delta_t(_params(1, sig_s=(1, 1, 1),
                                         sig_a=(0, 0, 0), thickness=2.0),
                                 jnp.asarray(wi_one[None])))[0]
        assert (total <= 1.0 + 1e-3).all(), (mu, total)
        assert (total > 0.05).all(), (mu, total)  # single scattering only — the
        # multiple-scattering remainder is not modeled (hk.cpp likewise)


HK_SCENE = """<scene version="0.5.0">
  <integrator type="path"><integer name="maxDepth" value="4"/></integrator>
  <sensor type="perspective">
    <float name="fov" value="45"/>
    <transform name="toWorld">
      <lookat origin="0 0 4" target="0 0 0" up="0 1 0"/>
    </transform>
    <sampler type="independent"><integer name="sampleCount" value="8"/></sampler>
    <film type="hdrfilm">
      <integer name="width" value="24"/><integer name="height" value="24"/>
      <rfilter type="box"/>
    </film>
  </sensor>
  <shape type="rectangle">
    <transform name="toWorld"><scale value="1.5"/></transform>
    <bsdf type="hk">
      <spectrum name="sigmaS" value="1.5, 1.2, 0.8"/>
      <spectrum name="sigmaA" value="0.1, 0.2, 0.4"/>
      <float name="thickness" value="0.6"/>
      <phase type="hg"><float name="g" value="0.5"/></phase>
    </bsdf>
  </shape>
  <shape type="rectangle">
    <transform name="toWorld">
      <scale value="8"/><translate z="-3"/>
    </transform>
    <emitter type="area"><rgb name="radiance" value="3 3 3"/></emitter>
  </shape>
  <emitter type="constant"><rgb name="radiance" value="0.3 0.3 0.3"/></emitter>
</scene>"""


def test_hk_scene_renders():
    from gradientdomain_mitsuba_tpu.scene import scene as sc
    from gradientdomain_mitsuba_tpu.models.path import PathTracer
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "s.xml")
        with open(p, "w") as f:
            f.write(HK_SCENE)
        scene, st = sc.load_scene(p, {})
    img = np.asarray(PathTracer(scene, st).render(scene, seed=0, spp=8))
    assert np.isfinite(img).all()
    assert img.mean() > 0.05  # backlit slab transmits
