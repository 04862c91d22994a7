"""BSDF sample/pdf/eval consistency — the chi^2 idea of the reference's
test_chisquare.cpp applied to every smooth material model, plus
weight==eval/pdf agreement and energy conservation."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gradientdomain_mitsuba_tpu.core import rng
from gradientdomain_mitsuba_tpu.core.math import normalize
from gradientdomain_mitsuba_tpu.ops import bsdf
from gradientdomain_mitsuba_tpu.scene import materials as M

N = 1 << 16
CT_BINS, PHI_BINS = 12, 24


def make_params(n, **kw):
    mb = M.MaterialBuilder()
    mb.add_row(**kw)
    mats = mb.finalize()
    return bsdf.gather_params(mats, jnp.zeros(n, jnp.int32))


def draw(par, wi, seed):
    u2 = rng.uniform_2d(seed, jnp.arange(N), 0, 0)
    uc = rng.uniform_float(seed, jnp.arange(N), 0, 2)
    wi_b = jnp.broadcast_to(wi, (N, 3))
    return bsdf.sample(par, wi_b, u2, uc)


def chi2_sphere(par1, wi, bs, int_tol=0.03):
    """Histogram sampled wo over the sphere; compare vs integrated pdf."""
    wo = np.asarray(bs.wo)
    valid = np.asarray(bs.valid)
    ct = np.clip(wo[:, 2], -1, 1)
    phi = np.arctan2(wo[:, 1], wo[:, 0])
    phi = np.where(phi < 0, phi + 2 * np.pi, phi)
    counts, _, _ = np.histogram2d(
        ct[valid], phi[valid], bins=[CT_BINS, PHI_BINS],
        range=[[-1, 1], [0, 2 * np.pi]])

    nsub = 24
    cts = -1 + 2 * (np.arange(CT_BINS * nsub) + 0.5) / (CT_BINS * nsub)
    phs = 2 * np.pi * (np.arange(PHI_BINS * nsub) + 0.5) / (PHI_BINS * nsub)
    CT, PH = np.meshgrid(cts, phs, indexing="ij")
    ST = np.sqrt(np.maximum(0, 1 - CT ** 2))
    dirs = np.stack([ST * np.cos(PH), ST * np.sin(PH), CT], -1)
    dirs = jnp.asarray(dirs.reshape(-1, 3), jnp.float32)
    K = dirs.shape[0]
    par_k = jax.tree.map(
        lambda a: jnp.broadcast_to(a[:1], (K,) + a.shape[1:]), par1)
    vals = np.asarray(bsdf.pdf(par_k, jnp.broadcast_to(wi, (K, 3)), dirs))
    dA = (2.0 / (CT_BINS * nsub)) * (2 * np.pi / (PHI_BINS * nsub))
    probs = vals.reshape(CT_BINS, nsub, PHI_BINS, nsub).sum((1, 3)) * dA
    total = probs.sum()
    expected = probs * valid.sum() / max(total, 1e-9)
    mask = expected > 8
    chi2 = ((counts[mask] - expected[mask]) ** 2 / expected[mask]).sum()
    dof = mask.sum() - 1
    limit = dof + 5.5 * np.sqrt(2.0 * max(dof, 1))
    assert abs(total - valid.mean()) < int_tol, (total, valid.mean())
    assert chi2 < limit, (chi2, dof, limit)


def weight_matches_eval_over_pdf(par, wi, bs, tol=1e-3):
    wo = bs.wo
    f = np.asarray(bsdf.eval(par, jnp.broadcast_to(wi, (N, 3)), wo))
    pdf = np.asarray(bs.pdf)
    w = np.asarray(bs.weight)
    valid = np.asarray(bs.valid) & ~np.asarray(bs.is_delta) & (pdf > 1e-6)
    ratio = f[valid] / np.maximum(pdf[valid, None], 1e-12)
    err = np.abs(ratio - w[valid]) / np.maximum(np.abs(w[valid]), 1e-3)
    assert np.quantile(err, 0.99) < tol, np.quantile(err, 0.99)


CASES = {
    "diffuse": dict(kind=M.DIFFUSE, reflectance=(0.7, 0.5, 0.3)),
    "roughdiffuse": dict(kind=M.ROUGH_DIFFUSE, reflectance=(0.6,) * 3,
                         alpha=0.3),
    "roughconductor_beck": dict(kind=M.ROUGH_CONDUCTOR, alpha=0.3,
                                eta=(0.2, 0.92, 1.1), k=(3.9, 2.45, 2.14),
                                dist=M.DIST_BECKMANN),
    "roughconductor_ggx": dict(kind=M.ROUGH_CONDUCTOR, alpha=0.3,
                               eta=(0.2, 0.92, 1.1), k=(3.9, 2.45, 2.14),
                               dist=M.DIST_GGX),
    "roughplastic": dict(kind=M.ROUGH_PLASTIC, reflectance=(0.5,) * 3,
                         alpha=0.3, eta=(1.49,) * 3, fdr_int=0.58),
    "phong": dict(kind=M.PHONG, reflectance=(0.4,) * 3,
                  specular=(0.3,) * 3, alpha=20.0),
    "roughdielectric": dict(kind=M.ROUGH_DIELECTRIC, alpha=0.35,
                            eta=(1.5,) * 3),
    "ward": dict(kind=M.WARD, reflectance=(0.4,) * 3,
                 specular=(0.3,) * 3, alpha=0.2),
    "ward_aniso": dict(kind=M.WARD, reflectance=(0.3,) * 3,
                       specular=(0.4,) * 3, alpha=0.1, alpha_v=0.3),
    "difftrans": dict(kind=M.DIFFTRANS, reflectance=(0.6, 0.4, 0.2)),
}


@pytest.mark.parametrize("name", list(CASES))
def test_chi2_sample_vs_pdf(name):
    par = make_params(N, **CASES[name])
    wi = normalize(jnp.array([0.4, -0.2, 0.89]))
    bs = draw(par, wi, seed=hash(name) % 1000)
    chi2_sphere(jax.tree.map(lambda a: a[:1], par), wi, bs)


@pytest.mark.parametrize("name", list(CASES))
def test_weight_consistency(name):
    par = make_params(N, **CASES[name])
    wi = normalize(jnp.array([0.3, 0.5, 0.81]))
    bs = draw(par, wi, seed=hash(name) % 997)
    weight_matches_eval_over_pdf(par, wi, bs)


def test_roughdielectric_from_inside():
    """Sampling from the dense side (wi.z < 0) must stay consistent."""
    par = make_params(N, kind=M.ROUGH_DIELECTRIC, alpha=0.35,
                      eta=(1.5,) * 3)
    wi = normalize(jnp.array([0.3, 0.1, -0.94]))
    bs = draw(par, wi, seed=11)
    assert float(np.asarray(bs.valid).mean()) > 0.4
    weight_matches_eval_over_pdf(par, wi, bs)
    # wider integral tolerance: the pdf varies sharply at the TIR critical
    # angle and midpoint quadrature under-resolves it
    chi2_sphere(jax.tree.map(lambda a: a[:1], par), wi, bs, int_tol=0.06)


def test_energy_conservation():
    """E[weight] = integral of f cos <= albedo-ish for every model."""
    for name, cfg in CASES.items():
        par = make_params(N, **cfg)
        wi = normalize(jnp.array([0.2, 0.1, 0.97]))
        bs = draw(par, wi, seed=5)
        w = np.asarray(bs.weight)
        w = np.where(np.asarray(bs.valid)[:, None], w, 0.0)
        assert w.mean() < 1.05, (name, w.mean())
        assert np.isfinite(w).all(), name


def test_mask_opacity_sampling():
    """mask wrapper: pass-through with probability 1-opacity (delta, unit
    weight), nested lobe otherwise; eval/pdf carry the opacity factor so
    weight == eval/pdf still holds on the continuous part."""
    par = make_params(N, kind=M.DIFFUSE, reflectance=(0.6,) * 3,
                      opacity=0.6)
    wi = normalize(jnp.array([0.3, 0.2, 0.93]))
    bs = draw(par, wi, seed=21)
    is_delta = np.asarray(bs.is_delta)
    frac_pass = is_delta.mean()
    assert abs(frac_pass - 0.4) < 0.02, frac_pass
    wo = np.asarray(bs.wo)
    w = np.asarray(bs.weight)
    pdfs = np.asarray(bs.pdf)
    wi_n = np.asarray(jnp.broadcast_to(wi, (N, 3)))
    np.testing.assert_allclose(wo[is_delta], -wi_n[is_delta], atol=1e-6)
    np.testing.assert_allclose(w[is_delta], 1.0, atol=1e-6)
    np.testing.assert_allclose(pdfs[is_delta], 0.4, atol=1e-6)
    # continuous side: pdf scaled by opacity, weight = eval/pdf
    weight_matches_eval_over_pdf(par, wi, bs)
    f = np.asarray(bsdf.eval(par, jnp.broadcast_to(wi, (N, 3)), bs.wo))
    par_plain = make_params(N, kind=M.DIFFUSE, reflectance=(0.6,) * 3)
    f_plain = np.asarray(bsdf.eval(par_plain,
                                   jnp.broadcast_to(wi, (N, 3)), bs.wo))
    np.testing.assert_allclose(f, 0.6 * f_plain, rtol=1e-5)


def test_mask_scene_end_to_end(tmp_path):
    """<bsdf type='mask'> loads from XML (nested BSDF row copied with the
    opacity set), flags the OPACITY pseudo-kind, and renders finite with
    stochastic pass-through (path integrator)."""
    import os
    import textwrap
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    xml = textwrap.dedent("""\
        <scene version="0.5.0">
          <integrator type="path"><integer name="maxDepth" value="4"/></integrator>
          <sensor type="perspective">
            <float name="fov" value="39.3077"/>
            <transform name="toWorld">
              <lookat origin="278, 273, -800" target="278, 273, -799" up="0, 1, 0"/>
            </transform>
            <sampler type="independent"><integer name="sampleCount" value="4"/></sampler>
            <film type="hdrfilm">
              <integer name="width" value="12"/><integer name="height" value="12"/>
              <rfilter type="box"/>
            </film>
          </sensor>
          <shape type="obj"><string name="filename" value="{mesh}/cbox_floor.obj"/>
            <bsdf type="mask">
              <float name="opacity" value="0.3"/>
              <bsdf type="diffuse"><rgb name="reflectance" value="0.6"/></bsdf>
            </bsdf>
          </shape>
          <shape type="obj"><string name="filename" value="{mesh}/cbox_back.obj"/>
            <bsdf type="diffuse"/></shape>
          <shape type="obj"><string name="filename" value="{mesh}/cbox_luminaire.obj"/>
            <emitter type="area"><rgb name="radiance" value="17, 12, 4"/></emitter>
          </shape>
        </scene>
    """).format(mesh=os.path.join(root, "data/scenes/cbox/meshes"))
    p = tmp_path / "mask.xml"
    p.write_text(xml)
    from gradientdomain_mitsuba_tpu.models import path as path_mod
    from gradientdomain_mitsuba_tpu.scene import scene as sc
    scene, st = sc.load_scene(str(p))
    packed = np.asarray(scene.materials.packed)
    assert (np.abs(packed[:, 22] - 0.3) < 1e-6).any()
    assert bsdf.OPACITY in bsdf.scene_kinds(scene)
    img = path_mod.PathTracer(scene, st).render(scene, seed=0, spp=4)
    assert np.isfinite(img).all()
