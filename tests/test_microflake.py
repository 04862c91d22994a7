"""Microflake phase function (reference: src/phase/microflake.cpp),
realized as closed-form SGGX fiber flakes (ops/medium.py _sggx_*).

Checks: sphere normalization of the phase, pdf == eval for samples,
fiber-plane concentration, and the scattering furnace (a microflake
medium inside a constant-radiance environment must preserve the field —
this exercises normalization + exact visible-normal sampling together).
"""
import numpy as np
import pytest

import jax.numpy as jnp

from gradientdomain_mitsuba_tpu.ops import medium as med_ops
from gradientdomain_mitsuba_tpu.scene import media as media_mod

N = 200_000


def _flake(axis, sigma, n=N):
    a = np.asarray(axis, np.float32)
    a /= np.linalg.norm(a)
    return jnp.broadcast_to(
        jnp.asarray([a[0], a[1], a[2], sigma], jnp.float32), (n, 4))


@pytest.mark.parametrize("axis,sigma,wi", [
    ((0, 0, 1), 0.1, (1, 0, 0)),
    ((0, 0, 1), 0.3, (0.5, 0.2, 0.84)),
    ((1, 1, 0), 0.8, (0, 0, 1)),
])
def test_phase_normalization(axis, sigma, wi):
    """MC over uniform sphere directions: integral of the phase over wo
    must be 1 (specular SGGX flakes are exactly normalized)."""
    rng = np.random.default_rng(3)
    d = rng.normal(size=(N, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    wiv = np.asarray(wi, np.float32)
    wiv /= np.linalg.norm(wiv)
    kinds = jnp.full(N, media_mod.PHASE_MICROFLAKE, jnp.int32)
    p = med_ops.phase_eval(kinds, jnp.zeros(N),
                           jnp.broadcast_to(jnp.asarray(wiv), (N, 3)),
                           jnp.asarray(d), _flake(axis, sigma))
    integral = float(np.asarray(p).mean() * 4 * np.pi)
    assert abs(integral - 1.0) < 0.03, integral


def test_sample_pdf_matches_eval():
    from gradientdomain_mitsuba_tpu.core import rng as rng_mod
    wi = jnp.asarray(np.float32([0.3, -0.2, 0.93]))
    wi = wi / jnp.linalg.norm(wi)
    u2 = rng_mod.uniform_2d(11, jnp.arange(N), 0, 0)
    kinds = jnp.full(N, media_mod.PHASE_MICROFLAKE, jnp.int32)
    fl = _flake((0, 0, 1), 0.15)
    wo, pdf = med_ops.phase_sample(kinds, jnp.zeros(N),
                                   jnp.broadcast_to(wi, (N, 3)), u2, fl)
    assert np.allclose(np.asarray(jnp.linalg.norm(wo, axis=-1)), 1.0,
                       atol=1e-4)
    pdf2 = med_ops.phase_eval(kinds, jnp.zeros(N),
                              jnp.broadcast_to(wi, (N, 3)), wo, fl)
    np.testing.assert_allclose(np.asarray(pdf), np.asarray(pdf2),
                               rtol=1e-3, atol=1e-6)
    # sampled-direction distribution matches eval: compare the first two
    # moments of cos(wo, axis) against an eval-weighted uniform-sphere MC
    rng = np.random.default_rng(5)
    d = rng.normal(size=(N, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    p_ref = np.asarray(med_ops.phase_eval(
        kinds, jnp.zeros(N), jnp.broadcast_to(wi, (N, 3)),
        jnp.asarray(d), fl))
    w_ref = p_ref * 4 * np.pi
    cz_s = np.asarray(wo)[:, 2]
    cz_r = d[:, 2]
    assert abs(cz_s.mean() - (cz_r * w_ref).mean()) < 0.02
    assert abs((cz_s ** 2).mean() - (cz_r ** 2 * w_ref).mean()) < 0.02


def test_fiber_plane_concentration():
    """Thin fiber (sigma -> 0) along z, incidence perpendicular to the
    fiber: flake normals lie in the xy great circle, so scattered
    directions stay near the plane perpendicular to the fiber."""
    from gradientdomain_mitsuba_tpu.core import rng as rng_mod
    wi = jnp.asarray(np.float32([1.0, 0.0, 0.0]))
    u2 = rng_mod.uniform_2d(13, jnp.arange(N), 0, 0)
    kinds = jnp.full(N, media_mod.PHASE_MICROFLAKE, jnp.int32)
    wo, _ = med_ops.phase_sample(kinds, jnp.zeros(N),
                                 jnp.broadcast_to(wi, (N, 3)), u2,
                                 _flake((0, 0, 1), 0.05))
    mean_abs_z = float(np.abs(np.asarray(wo)[:, 2]).mean())
    assert mean_abs_z < 0.12, mean_abs_z


def test_scattering_furnace_microflake():
    """sigma_a = 0 microflake medium inside a constant-radiance
    environment: the radiance field must stay at the environment value
    (an exactly normalized, exactly sampled phase preserves isotropy)."""
    from tests.test_volpath import _HEADER, _render
    xml = _HEADER.replace("$integrator", "volpath") + """
  <shape type="cube">
    <transform name="toWorld">
      <scale value="1.2"/>
    </transform>
    <bsdf type="null"/>
    <medium name="interior" type="homogeneous">
      <rgb name="sigmaA" value="0 0 0"/>
      <rgb name="sigmaS" value="0.8 0.8 0.8"/>
      <phase type="microflake">
        <float name="stddev" value="0.2"/>
        <vector name="orientation" x="0" y="0" z="1"/>
      </phase>
    </medium>
  </shape>
  <emitter type="constant"><rgb name="radiance" value="1 1 1"/></emitter>
</scene>"""
    img, _, _ = _render(xml, "volpath", size=16, spp=32, max_depth=16)
    assert np.isfinite(img).all()
    np.testing.assert_allclose(img.mean((0, 1)), 1.0, rtol=0.03)
