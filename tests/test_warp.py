"""Chi^2 goodness-of-fit tests: every warp's samples vs its own pdf.

Port of the reference's crown-jewel testing idea (src/tests/test_chisquare.cpp
in stock Mitsuba 0.5): bin sampled directions over the sphere and compare
against numerically integrated cell probabilities.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from gradientdomain_mitsuba_tpu.core import rng, warp

N_SAMPLES = 1 << 17
THETA_BINS, PHI_BINS = 12, 24


def _sphere_histogram(dirs):
    """Bin unit directions into equal-solid-angle-ish (cos theta, phi) grid."""
    ct = np.clip(dirs[:, 2], -1, 1)
    phi = np.arctan2(dirs[:, 1], dirs[:, 0])
    phi = np.where(phi < 0, phi + 2 * np.pi, phi)
    h, _, _ = np.histogram2d(
        ct, phi, bins=[THETA_BINS, PHI_BINS],
        range=[[-1.0, 1.0], [0.0, 2.0 * np.pi]])
    return h


def _cell_probabilities(pdf_fn, n_sub=32):
    """Numerically integrate pdf over each (cos theta, phi) cell (vectorized:
    one pdf evaluation over the full subsample grid, then sum-pool)."""
    nt, np_ = THETA_BINS * n_sub, PHI_BINS * n_sub
    cts = -1.0 + 2.0 * (np.arange(nt) + 0.5) / nt
    phs = 2.0 * np.pi * (np.arange(np_) + 0.5) / np_
    CT, PH = np.meshgrid(cts, phs, indexing="ij")
    ST = np.sqrt(np.maximum(0.0, 1 - CT ** 2))
    dirs = np.stack([ST * np.cos(PH), ST * np.sin(PH), CT], axis=-1)
    vals = np.asarray(pdf_fn(jnp.asarray(dirs.reshape(-1, 3), jnp.float32)))
    vals = vals.reshape(nt, np_)
    dA = (2.0 / nt) * (2.0 * np.pi / np_)
    cell = vals.reshape(THETA_BINS, n_sub, PHI_BINS, n_sub).sum(axis=(1, 3))
    return cell * dA


def _chi2_test(sample_fn, pdf_fn, seed=0):
    u = rng.uniform_2d(seed, jnp.arange(N_SAMPLES), 0, 0)
    dirs = np.asarray(sample_fn(u))
    counts = _sphere_histogram(dirs)
    probs = _cell_probabilities(pdf_fn)
    assert abs(probs.sum() - 1.0) < 1e-2, f"pdf does not integrate to 1: {probs.sum()}"
    expected = probs * N_SAMPLES
    # pool cells with tiny expectation into one
    mask = expected > 5.0
    chi2 = np.sum((counts[mask] - expected[mask]) ** 2 / expected[mask])
    rest_exp = expected[~mask].sum()
    rest_cnt = counts[~mask].sum()
    if rest_exp > 5.0:
        chi2 += (rest_cnt - rest_exp) ** 2 / rest_exp
        dof = mask.sum()
    else:
        dof = mask.sum() - 1
    # generous threshold: 99.99% quantile approx dof + 4*sqrt(2*dof)
    limit = dof + 5.0 * np.sqrt(2.0 * dof)
    assert chi2 < limit, f"chi2={chi2:.1f} dof={dof} limit={limit:.1f}"


def test_cosine_hemisphere():
    _chi2_test(
        warp.square_to_cosine_hemisphere,
        lambda d: warp.square_to_cosine_hemisphere_pdf(d))


def test_uniform_sphere():
    _chi2_test(
        warp.square_to_uniform_sphere,
        lambda d: jnp.full(d.shape[:-1], warp.square_to_uniform_sphere_pdf()))


def test_uniform_hemisphere():
    _chi2_test(
        warp.square_to_uniform_hemisphere,
        lambda d: jnp.where(d[..., 2] > 0, warp.square_to_uniform_hemisphere_pdf(), 0.0))


def test_uniform_cone():
    cc = 1.0 / 3.0  # aligned with a cos-theta bin edge to avoid quadrature bias
    _chi2_test(
        lambda u: warp.square_to_uniform_cone(u, cc),
        lambda d: jnp.where(d[..., 2] > cc, warp.square_to_uniform_cone_pdf(cc), 0.0))


def _chi2_2d_uniform(w, phi_frac, bins=16):
    counts, _, _ = np.histogram2d(w, phi_frac, bins=bins, range=[[0, 1], [0, 1]])
    expected = len(w) / bins ** 2
    chi2 = np.sum((counts - expected) ** 2 / expected)
    dof = bins ** 2 - 1
    assert chi2 < dof + 5.0 * np.sqrt(2.0 * dof), chi2


def _pdf_integrates_to_one(pdf_fn):
    from scipy.integrate import quad
    def g(theta):
        d = jnp.array([[np.sin(theta), 0.0, np.cos(theta)]], jnp.float32)
        return float(pdf_fn(d)[0]) * 2 * np.pi * np.sin(theta)
    val, _ = quad(g, 0, np.pi / 2, limit=200)
    assert abs(val - 1.0) < 5e-3, val


@pytest.mark.parametrize("alpha", [0.1, 0.4])
def test_beckmann(alpha):
    # Exact inverse-CDF check: for full-NDF Beckmann sampling,
    # w = exp(-tan^2(theta)/alpha^2) must be uniform, phi uniform.
    u = rng.uniform_2d(4, jnp.arange(N_SAMPLES), 0, 0)
    d = np.asarray(warp.square_to_beckmann(u, alpha))
    ct = np.clip(d[:, 2], 1e-6, 1)
    tan2 = (1 - ct ** 2) / ct ** 2
    w = np.exp(-tan2 / alpha ** 2)
    phi = np.arctan2(d[:, 1], d[:, 0]) / (2 * np.pi) % 1.0
    _chi2_2d_uniform(w, phi)
    _pdf_integrates_to_one(lambda dd: warp.square_to_beckmann_pdf(dd, alpha))


@pytest.mark.parametrize("alpha", [0.1, 0.4])
def test_ggx(alpha):
    # For GGX full-NDF sampling, w = tan^2/(alpha^2 + tan^2) must be uniform.
    u = rng.uniform_2d(5, jnp.arange(N_SAMPLES), 0, 0)
    d = np.asarray(warp.square_to_ggx(u, alpha))
    ct = np.clip(d[:, 2], 1e-6, 1)
    tan2 = (1 - ct ** 2) / ct ** 2
    w = tan2 / (alpha ** 2 + tan2)
    phi = np.arctan2(d[:, 1], d[:, 0]) / (2 * np.pi) % 1.0
    _chi2_2d_uniform(w, phi)
    _pdf_integrates_to_one(lambda dd: warp.square_to_ggx_pdf(dd, alpha))


def test_disk_concentric_uniform():
    u = rng.uniform_2d(1, jnp.arange(N_SAMPLES), 0, 0)
    p = np.asarray(warp.square_to_uniform_disk_concentric(u))
    r2 = (p ** 2).sum(-1)
    assert r2.max() <= 1.0 + 1e-6
    # area uniformity: r^2 should be uniform in [0,1]
    counts, _ = np.histogram(r2, bins=32, range=(0, 1))
    expected = N_SAMPLES / 32
    chi2 = np.sum((counts - expected) ** 2 / expected)
    assert chi2 < 80.0, chi2


def test_uniform_triangle():
    u = rng.uniform_2d(2, jnp.arange(N_SAMPLES), 0, 0)
    b = np.asarray(warp.square_to_uniform_triangle(u))
    assert (b >= 0).all() and (b.sum(-1) <= 1 + 1e-6).all()
    # uniform in the triangle: the x-coordinate has density 2(1-x)
    counts, edges = np.histogram(b[:, 0], bins=32, range=(0, 1))
    x0, x1 = edges[:-1], edges[1:]
    expected = N_SAMPLES * ((1 - x0) ** 2 - (1 - x1) ** 2)
    chi2 = np.sum((counts - expected) ** 2 / np.maximum(expected, 1))
    assert chi2 < 100.0, chi2
