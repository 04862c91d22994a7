"""Device-side participating-media ops: homogeneous free-flight sampling,
transmittance, and phase functions.

TPU-native replacement for Medium::sampleDistance/evalTransmittance and
PhaseFunction::{sample,eval,pdf} (src/medium/homogeneous.cpp,
src/phase/{isotropic,hg,rayleigh}.cpp), as branch-free SoA kernels over
medium-id lanes.  Lanes with mid < 0 are vacuum: no scatter, unit
transmittance.

Channel strategy: the free-flight distance importance-samples one RGB
channel's sigma_t, the channel picked uniformly; success/failure pdfs
average over channels (the spectral-MIS estimator homogeneous.cpp also
uses by default).  Unbiased for any per-channel sigma_t.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..core import math as m
from ..scene.media import PHASE_HG, PHASE_ISOTROPIC, PHASE_RAYLEIGH

INV_4PI = 1.0 / (4.0 * jnp.pi)
F32_BIG = 3e38


def gather(media, mid):
    """Per-lane medium coefficients; vacuum (mid<0) lanes get zeros."""
    idx = jnp.clip(mid, 0, media.sigma_s.shape[0] - 1)
    vac = (mid < 0)[..., None]
    sigma_s = jnp.where(vac, 0.0, media.sigma_s[idx])
    sigma_t = jnp.where(vac, 0.0, media.sigma_t[idx])
    g = jnp.where(mid < 0, 0.0, media.g[idx])
    kind = jnp.where(mid < 0, PHASE_ISOTROPIC, media.phase_kind[idx])
    return sigma_s, sigma_t, kind, g


def transmittance(sigma_t, dist):
    """exp(-sigma_t * dist) per channel; dist may be +inf-ish."""
    return jnp.exp(-sigma_t * jnp.minimum(dist, F32_BIG)[..., None])


class DistanceSample(NamedTuple):
    scattered: jnp.ndarray  # [N] bool: medium event before tmax
    t: jnp.ndarray          # [N] scatter distance (valid when scattered)
    weight: jnp.ndarray     # [N, 3] throughput factor:
    #                         scattered: sigma_s*Tr(t)/pdf_succ
    #                         else:      Tr(tmax)/pdf_fail


def sample_distance(sigma_s, sigma_t, u_chan, u_dist, tmax):
    """Free-flight sampling through a homogeneous slab of length tmax.

    Lanes with sigma_t == 0 (vacuum or pure void) never scatter and get
    unit weight."""
    chan = jnp.clip((u_chan * 3.0).astype(jnp.int32), 0, 2)
    st_c = jnp.take_along_axis(sigma_t, chan[..., None], -1)[..., 0]
    active = st_c > 0
    # t = -ln(1-u)/sigma_t_c in (0, inf)
    t = -jnp.log1p(-jnp.clip(u_dist, 0.0, 1.0 - 1e-7)) / jnp.maximum(
        st_c, 1e-20)
    scattered = active & (t < tmax)

    tr_t = transmittance(sigma_t, t)
    tr_max = transmittance(sigma_t, tmax)
    pdf_succ = jnp.mean(sigma_t * tr_t, -1)
    pdf_fail = jnp.mean(tr_max, -1)
    w_scatter = sigma_s * tr_t / jnp.maximum(pdf_succ, 1e-30)[..., None]
    w_pass = tr_max / jnp.maximum(pdf_fail, 1e-30)[..., None]
    weight = jnp.where(scattered[..., None], w_scatter,
                       jnp.where(active[..., None], w_pass, 1.0))
    return DistanceSample(scattered=scattered, t=t, weight=weight)


# ---------------------------------------------------------------------------
# Phase functions.  All three are exactly importance-sampled, so
# eval == pdf and the sampling weight is 1 (PhaseFunction::sample
# semantics in the reference).
# ---------------------------------------------------------------------------

def _hg_pdf(cos_theta, g):
    denom = 1.0 + g * g + 2.0 * g * cos_theta
    return INV_4PI * (1.0 - g * g) / jnp.maximum(
        denom * jnp.sqrt(jnp.maximum(denom, 1e-12)), 1e-12)


def _rayleigh_pdf(cos_theta):
    return (3.0 / (16.0 * jnp.pi)) * (1.0 + cos_theta * cos_theta)


def phase_eval(kind, g, wi, wo):
    """Phase value == pdf of sampling wo given wi.

    Convention (matches the BSDF layer): wi points back toward the
    previous vertex, wo is the new propagation direction, so the
    scattering angle alpha is measured from the incident propagation
    -wi: cos(alpha) = dot(-wi, wo).  HG with g > 0 peaks forward
    (wo ~ -wi), as in hg.cpp."""
    cos_alpha = m.dot(-wi, wo)
    iso = jnp.full_like(cos_alpha, INV_4PI)
    # _hg_pdf's denominator is 1 + g^2 + 2 g x, so pass x = -cos(alpha)
    hg = _hg_pdf(-cos_alpha, g)
    ray = _rayleigh_pdf(cos_alpha)
    return jnp.where(kind == PHASE_HG, hg,
                     jnp.where(kind == PHASE_RAYLEIGH, ray, iso))


def phase_sample(kind, g, wi, u2):
    """Sample wo from the phase function around the propagation direction
    -wi.  Returns (wo, pdf); weight is 1."""
    prop = -wi  # propagation direction of the incident ray

    # isotropic
    wo_iso = _sphere_dir(u2)

    # Henyey-Greenstein inversion (hg.cpp): cos_theta wrt propagation
    g_safe = jnp.where(jnp.abs(g) < 1e-3, 1e-3, g)
    sqr = (1.0 - g_safe * g_safe) / (1.0 - g_safe + 2.0 * g_safe *
                                     u2[..., 0])
    cos_hg = (1.0 + g_safe * g_safe - sqr * sqr) / (2.0 * g_safe)
    cos_iso = 1.0 - 2.0 * u2[..., 0]
    cos_theta = jnp.where(jnp.abs(g) < 1e-3, cos_iso,
                          jnp.clip(cos_hg, -1.0, 1.0))

    # Rayleigh: solve the cubic CDF inversion (rayleigh.cpp)
    z = 2.0 * (2.0 * u2[..., 0] - 1.0)
    A = jnp.cbrt(z + jnp.sqrt(z * z + 1.0))
    cos_ray = jnp.clip(A - 1.0 / A, -1.0, 1.0)

    cos_t = jnp.where(kind == PHASE_RAYLEIGH, cos_ray, cos_theta)
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    phi = 2.0 * jnp.pi * u2[..., 1]
    s, t = m.build_frame(prop)
    wo_aniso = (s * (sin_t * jnp.cos(phi))[..., None] +
                t * (sin_t * jnp.sin(phi))[..., None] +
                prop * cos_t[..., None])
    wo = jnp.where((kind == PHASE_ISOTROPIC)[..., None], wo_iso, wo_aniso)
    return wo, phase_eval(kind, g, wi, wo)


def _sphere_dir(u2):
    z = 1.0 - 2.0 * u2[..., 0]
    r = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    phi = 2.0 * jnp.pi * u2[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], -1)
