"""G-PT validation (SURVEY.md §5): primal parity, gradient consistency
E[dx] = finite-difference of E[primal], and end-to-end reconstruction
improvement — the acceptance tests for BASELINE config #1."""
import os

import numpy as np
import pytest

from gradientdomain_mitsuba_tpu.models import gpt as gpt_mod
from gradientdomain_mitsuba_tpu.models import path as path_mod
from gradientdomain_mitsuba_tpu.models import poisson
from gradientdomain_mitsuba_tpu.scene import scene as sc

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CBOX = os.path.join(ROOT, "data/scenes/cbox/cbox.xml")


@pytest.fixture(scope="module")
def cbox_small():
    return sc.load_scene(
        CBOX, {"width": "24", "height": "24", "spp": "8", "maxDepth": "3"})


def test_primal_parity(cbox_small):
    """gpt's primal+very_direct must equal `path` EXACTLY (same counters,
    same estimator) — validates the whole base-path machinery at once."""
    scene, st = cbox_small
    g = gpt_mod.GPTracer(scene, st)
    out = g.render(scene, seed=5, spp=2, chunk=2)
    img = path_mod.PathTracer(scene, st).render(scene, seed=5, spp=2)
    combined = out["primal"] + out["very_direct"]
    np.testing.assert_allclose(combined, img, rtol=2e-4, atol=2e-5)


def test_deterministic(cbox_small):
    scene, st = cbox_small
    g = gpt_mod.GPTracer(scene, st)
    a = g.render(scene, seed=1, spp=2, chunk=2)
    b = g.render(scene, seed=1, spp=2, chunk=2)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k])


def test_gradient_consistency_direct():
    """E[dx] must equal the finite difference of E[primal] (the papers'
    fundamental identity; catches Jacobian/MIS-weight bugs as bias).

    Run at maxDepth=2 (direct lighting) where NEE makes the reference
    nearly noise-free, so the identity is sharply testable.  This covers
    the offset-NEE machinery AND the reconnection shift (BSDF rays that
    hit the area light reconnect the offset vertex to the light vertex).
    """
    scene, st = sc.load_scene(
        CBOX, {"width": "24", "height": "24", "spp": "8", "maxDepth": "2"})
    g = gpt_mod.GPTracer(scene, st)
    out = g.render(scene, seed=0, spp=64, chunk=8)
    ref = path_mod.PathTracer(scene, st).render(scene, seed=777, spp=2048)
    ref_nd = ref - out["very_direct"]  # gradients exclude very direct
    fd_x = ref_nd[:, 1:] - ref_nd[:, :-1]
    fd_y = ref_nd[1:, :] - ref_nd[:-1, :]
    dx = out["dx"][:, :-1]
    dy = out["dy"][:-1, :]
    # mask pixel pairs touching the directly-visible light: there ref_nd
    # inherits the 64-spp noise of the subtracted very_direct buffer, which
    # would swamp the comparison (coverage noise ~ +-1 at radiance 17)
    vd = out["very_direct"].sum(-1)
    mx = (vd[:, 1:] + vd[:, :-1]) == 0
    my = (vd[1:, :] + vd[:-1, :]) == 0
    rms_fd_x = np.sqrt((fd_x[mx] ** 2).mean())
    rms_fd_y = np.sqrt((fd_y[my] ** 2).mean())
    rms_err_x = np.sqrt(((dx[mx] - fd_x[mx]) ** 2).mean())
    rms_err_y = np.sqrt(((dy[my] - fd_y[my]) ** 2).mean())
    # zero/garbage gradients give ratio >= 1; measured ~0.14 when correct
    assert rms_err_x / rms_fd_x < 0.35, (rms_err_x, rms_fd_x)
    assert rms_err_y / rms_fd_y < 0.35, (rms_err_y, rms_fd_y)
    corr = np.corrcoef(dx[mx].ravel(), fd_x[mx].ravel())[0, 1]
    assert corr > 0.95, corr


def test_gradient_consistency_indirect_profiles(cbox_small):
    """At maxDepth=3 the per-pixel reference is firefly-noisy, but the
    row/column mean profiles of dx/dy must track the reference's finite
    differences."""
    scene, st = cbox_small
    g = gpt_mod.GPTracer(scene, st)
    out = g.render(scene, seed=0, spp=96, chunk=8)
    ref = path_mod.PathTracer(scene, st).render(scene, seed=777, spp=768)
    ref_nd = ref - out["very_direct"]
    fd_x = (ref_nd[:, 1:] - ref_nd[:, :-1]).mean(axis=(0, 2))
    dx = out["dx"][:, :-1].mean(axis=(0, 2))
    # robust comparison: median absolute deviation of the profile error
    err = np.median(np.abs(dx - fd_x))
    scale = np.median(np.abs(fd_x)) + 1e-4
    assert err < 0.8 * scale, (err, scale, dx[:8], fd_x[:8])


def relmse(img, ref, eps_scale=1e-2):
    eps = eps_scale * float(ref.mean()) ** 2
    return float(np.mean((img - ref) ** 2 / (ref ** 2 + eps)))


def test_reconstruction_improves(cbox_small):
    """relMSE(final) < relMSE(primal) at equal spp — closes the G-PT loop
    (render + screened-Poisson reconstruction beats plain PT)."""
    scene, st = cbox_small
    g = gpt_mod.GPTracer(scene, st)
    out = g.render(scene, seed=3, spp=32, chunk=8)
    ref = path_mod.PathTracer(scene, st).render(scene, seed=999, spp=1024)
    noisy = out["primal"] + out["very_direct"]
    final_l2 = np.asarray(poisson.reconstruct(out, alpha=0.2, mode="L2"))
    final_l1 = np.asarray(poisson.reconstruct(out, alpha=0.2, mode="L1"))
    e_noisy = relmse(noisy, ref)
    e_l2 = relmse(final_l2, ref)
    e_l1 = relmse(final_l1, ref)
    assert e_l2 < e_noisy, (e_l2, e_noisy)
    assert e_l1 < e_noisy, (e_l1, e_noisy)
