"""Participating media: phase functions, free-flight sampling, and the
volumetric path tracer (vs src/medium/homogeneous.cpp, src/phase/*.cpp,
src/integrators/volpath/volpath.cpp).

Key estimator identities:
  - volpath == path on a media-free scene (same RNG stream, same events)
  - Beer-Lambert: emitter seen through an absorbing null-bounded slab
  - furnace: a purely scattering medium inside a constant-radiance
    environment leaves the radiance field exactly constant
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gradientdomain_mitsuba_tpu.core import rng
from gradientdomain_mitsuba_tpu.ops import medium as med_ops
from gradientdomain_mitsuba_tpu.scene import media as media_mod
from gradientdomain_mitsuba_tpu.scene import scene as sc
from gradientdomain_mitsuba_tpu.models.path import PathTracer
from gradientdomain_mitsuba_tpu.models.volpath import VolPathTracer

N = 1 << 15


# ---------------------------------------------------------------------------
# phase functions
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("kind,g", [
    (media_mod.PHASE_ISOTROPIC, 0.0),
    (media_mod.PHASE_HG, 0.6),
    (media_mod.PHASE_HG, -0.4),
    (media_mod.PHASE_RAYLEIGH, 0.0),
])
def test_phase_chi2(kind, g):
    """Histogram of sampled cos(alpha) vs the analytic phase pdf."""
    wi = jnp.asarray(np.float32([0.3, -0.2, 0.93]))
    wi = wi / jnp.linalg.norm(wi)
    u2 = rng.uniform_2d(7, jnp.arange(N), 0, 0)
    kinds = jnp.full(N, kind, jnp.int32)
    gs = jnp.full(N, g)
    wo, pdf = med_ops.phase_sample(kinds, gs, jnp.broadcast_to(wi, (N, 3)),
                                   u2)
    assert np.allclose(np.asarray(jnp.linalg.norm(wo, axis=-1)), 1.0,
                       atol=1e-5)
    # pdf returned must match phase_eval exactly
    pdf2 = med_ops.phase_eval(kinds, gs, jnp.broadcast_to(wi, (N, 3)), wo)
    np.testing.assert_allclose(np.asarray(pdf), np.asarray(pdf2), rtol=1e-5)

    cos_a = np.asarray(jnp.sum(-wi * wo, -1))
    bins = 24
    counts, edges = np.histogram(cos_a, bins=bins, range=(-1, 1))
    # integrate the pdf over each cos bin (azimuthal symmetry: the pdf
    # times 2*pi in cos measure)
    sub = 64
    cs = -1 + 2 * (np.arange(bins * sub) + 0.5) / (bins * sub)
    if kind == media_mod.PHASE_HG:
        dens = np.asarray(med_ops._hg_pdf(jnp.asarray(-cs), g))
    elif kind == media_mod.PHASE_RAYLEIGH:
        dens = np.asarray(med_ops._rayleigh_pdf(jnp.asarray(cs)))
    else:
        dens = np.full_like(cs, 1.0 / (4 * np.pi))
    probs = (dens.reshape(bins, sub).mean(1)) * 2 * np.pi * (2.0 / bins)
    assert abs(probs.sum() - 1.0) < 5e-3, probs.sum()
    expected = probs * N
    mask = expected > 8
    chi2 = ((counts[mask] - expected[mask]) ** 2 / expected[mask]).sum()
    dof = mask.sum() - 1
    assert chi2 < dof + 5.5 * np.sqrt(2 * dof), (chi2, dof)


def test_free_flight_absorbing_expectation():
    """Pure absorber: E[weight * 1_pass] = Tr(tmax) per channel and
    E[weight * 1_scatter] = 0 (sigma_s = 0)."""
    sigma_a = np.float32([0.5, 1.0, 2.0])
    tmax = 1.3
    u = np.asarray(rng.uniform_float(3, jnp.arange(N), 0, 0))
    uc = np.asarray(rng.uniform_float(3, jnp.arange(N), 0, 1))
    ss = jnp.zeros((N, 3))
    st = jnp.broadcast_to(jnp.asarray(sigma_a), (N, 3))
    ds = med_ops.sample_distance(ss, st, jnp.asarray(uc), jnp.asarray(u),
                                 jnp.full(N, tmax))
    w = np.asarray(ds.weight)
    sca = np.asarray(ds.scattered)
    est = np.where(~sca[:, None], w, 0.0).mean(0)
    np.testing.assert_allclose(est, np.exp(-sigma_a * tmax), rtol=2e-2)


def test_free_flight_scatter_expectation():
    """E[weight * 1_scatter] = integral sigma_s Tr(t) dt = albedo *
    (1 - Tr(tmax)) for constant coefficients."""
    sigma_s = np.float32([0.8, 0.4, 0.2])
    sigma_a = np.float32([0.2, 0.6, 0.1])
    st = sigma_s + sigma_a
    tmax = 0.9
    u = np.asarray(rng.uniform_float(11, jnp.arange(N), 0, 0))
    uc = np.asarray(rng.uniform_float(11, jnp.arange(N), 0, 1))
    ds = med_ops.sample_distance(
        jnp.broadcast_to(jnp.asarray(sigma_s), (N, 3)),
        jnp.broadcast_to(jnp.asarray(st), (N, 3)),
        jnp.asarray(uc), jnp.asarray(u), jnp.full(N, tmax))
    w = np.asarray(ds.weight)
    sca = np.asarray(ds.scattered)
    est = np.where(sca[:, None], w, 0.0).mean(0)
    expect = sigma_s / st * (1.0 - np.exp(-st * tmax))
    np.testing.assert_allclose(est, expect, rtol=3e-2)


# ---------------------------------------------------------------------------
# scene-level
# ---------------------------------------------------------------------------

def _render(xml, integrator, size=24, spp=16, max_depth=-1):
    import os
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "s.xml")
        with open(p, "w") as f:
            f.write(xml)
        scene, st = sc.load_scene(p, {
            "width": str(size), "height": str(size), "spp": str(spp),
            "maxDepth": str(max_depth)})
        st.integrator = integrator
        cls = VolPathTracer if integrator == "volpath" else PathTracer
        tr = cls(scene, st)
        img = tr.render(scene, seed=0, spp=spp)
        return np.asarray(img), scene, st


_HEADER = """<scene version="0.5.0">
  <integrator type="$integrator">
    <integer name="maxDepth" value="$maxDepth"/>
  </integrator>
  <sensor type="perspective">
    <float name="fov" value="45"/>
    <transform name="toWorld">
      <lookat origin="0 0 5" target="0 0 0" up="0 1 0"/>
    </transform>
    <sampler type="independent"><integer name="sampleCount" value="$spp"/></sampler>
    <film type="hdrfilm">
      <integer name="width" value="$width"/>
      <integer name="height" value="$height"/>
      <rfilter type="box"/>
    </film>
  </sensor>
"""


def test_volpath_matches_path_without_media():
    """On a media-free scene volpath consumes the same surface RNG dims
    as path, so the images agree almost exactly (MIS origin epsilon)."""
    xml = _HEADER.replace("$integrator", "path") + """
  <shape type="rectangle">
    <transform name="toWorld">
      <scale value="2"/><translate z="-1"/>
    </transform>
    <bsdf type="diffuse"><rgb name="reflectance" value="0.6 0.4 0.3"/></bsdf>
  </shape>
  <shape type="rectangle">
    <transform name="toWorld">
      <rotate x="1" angle="180"/><translate z="3"/>
    </transform>
    <emitter type="area"><rgb name="radiance" value="2 2 2"/></emitter>
  </shape>
</scene>"""
    a, _, _ = _render(xml, "path", spp=16, max_depth=4)
    b, _, _ = _render(xml, "volpath", spp=16, max_depth=4)
    assert np.isfinite(a).all() and np.isfinite(b).all()
    np.testing.assert_allclose(b, a, rtol=5e-3, atol=5e-4)


def _slab_xml(sigma_a, sigma_s, g=0.0):
    return _HEADER.replace("$integrator", "volpath") + f"""
  <shape type="cube">
    <transform name="toWorld">
      <scale x="4" y="4" z="0.5"/><translate z="1.5"/>
    </transform>
    <bsdf type="null"/>
    <medium name="interior" type="homogeneous">
      <rgb name="sigmaA" value="{sigma_a[0]} {sigma_a[1]} {sigma_a[2]}"/>
      <rgb name="sigmaS" value="{sigma_s[0]} {sigma_s[1]} {sigma_s[2]}"/>
      <phase type="hg"><float name="g" value="{g}"/></phase>
    </medium>
  </shape>
  <shape type="rectangle">
    <transform name="toWorld">
      <scale value="4"/>
    </transform>
    <emitter type="area"><rgb name="radiance" value="3 3 3"/></emitter>
  </shape>
</scene>"""


def test_beer_lambert_absorbing_slab():
    """Camera at z=5 -> slab [1,2] (thickness 1, null boundary, pure
    absorber) -> emitter plane at z=0: center pixels see
    radiance * exp(-sigma_a * 1 / cos) with cos ~ 1."""
    sigma_a = (0.4, 0.9, 1.7)
    img, scene, st = _render(_slab_xml(sigma_a, (0, 0, 0)), "volpath",
                             size=24, spp=64, max_depth=4)
    assert np.isfinite(img).all()
    c = img[10:14, 10:14].mean((0, 1))
    # exact per-pixel cos correction is within ~1% at fov 45 center;
    # tolerance dominated by the binomial pass/absorb noise
    # (16 px * 64 spp ~ 1k samples/channel -> ~4% at 1 sigma)
    expect = 3.0 * np.exp(-np.float32(sigma_a))
    np.testing.assert_allclose(c, expect, rtol=0.12)


def test_scattering_furnace():
    """sigma_a = 0 medium inside a constant-radiance environment: the
    radiance field stays exactly at the environment value (scattering
    preserves an isotropic field) — validates phase normalization,
    free-flight weights, and attenuated NEE together."""
    xml = _HEADER.replace("$integrator", "volpath") + """
  <shape type="cube">
    <transform name="toWorld"><scale value="1.2"/></transform>
    <bsdf type="null"/>
    <medium name="interior" type="homogeneous">
      <rgb name="sigmaA" value="0 0 0"/>
      <rgb name="sigmaS" value="0.8 0.8 0.8"/>
    </medium>
  </shape>
  <emitter type="constant"><rgb name="radiance" value="1.5 1.5 1.5"/></emitter>
</scene>"""
    img, _, _ = _render(xml, "volpath", size=16, spp=32, max_depth=-1)
    assert np.isfinite(img).all()
    np.testing.assert_allclose(img.mean((0, 1)), 1.5, rtol=2.5e-2)
    # and no pixel far off (low variance: every path ends in the env)
    assert np.abs(img - 1.5).max() < 0.35, np.abs(img - 1.5).max()


def test_hg_slab_renders_and_conserves():
    """Forward-scattering slab in front of the emitter: flux reaching the
    camera must lie between the pure-absorption bound exp(-sigma_t L)
    and the no-medium value."""
    img_clear, _, _ = _render(_slab_xml((0, 0, 0), (0, 0, 0)), "volpath",
                              size=16, spp=8, max_depth=6)
    img_sc, _, _ = _render(_slab_xml((0.0, 0.0, 0.0), (1.2, 1.2, 1.2),
                                     g=0.7),
                           "volpath", size=16, spp=32, max_depth=-1)
    assert np.isfinite(img_sc).all()
    lo = img_clear.mean() * np.exp(-1.2)
    hi = img_clear.mean() * 1.02
    assert lo < img_sc.mean() < hi, (lo, img_sc.mean(), hi)


def test_media_builder_materials_and_refs():
    """<medium> table construction: named material presets, sigmaT/albedo
    form, dedup via shared Plugin nodes."""
    from gradientdomain_mitsuba_tpu.scene.ir import Plugin
    mb = media_mod.MediaBuilder()
    n1 = Plugin(kind="medium", type="homogeneous",
                props={"material": "wholemilk", "scale": 2.0})
    n2 = Plugin(kind="medium", type="homogeneous",
                props={"sigmaT": np.float32([1, 2, 3]),
                       "albedo": np.float32([0.5, 0.5, 0.5])})
    a = mb.from_plugin(n1)
    b = mb.from_plugin(n2)
    assert mb.from_plugin(n1) == a  # dedup by node identity
    tab = mb.finalize()
    assert tab.sigma_s.shape == (2, 3)
    np.testing.assert_allclose(tab.sigma_s[a], np.float32(
        [2.55, 3.21, 3.77]) * 2.0, rtol=1e-6)
    np.testing.assert_allclose(tab.sigma_s[b], [0.5, 1.0, 1.5], rtol=1e-6)
    np.testing.assert_allclose(tab.sigma_a[b], [0.5, 1.0, 1.5], rtol=1e-6)
    c = mb.from_plugin(Plugin(kind="medium", type="heterogeneous",
                              props={"scale": 3.0}))
    tab2 = mb.finalize()
    assert tab2.het[c] == 1 and tab2.het[a] == 0
    np.testing.assert_allclose(tab2.sigma_t[c], 3.0, rtol=1e-6)
    with pytest.raises(ValueError):
        mb.from_plugin(Plugin(kind="medium", type="bogus"))
