"""BDPT + G-BDPT validation: estimator parity with `path`, exact primal
parity between gbdpt and bdpt, and E[dx]=dE[primal] for gbdpt."""
import os

import numpy as np
import pytest

from gradientdomain_mitsuba_tpu.models import bdpt as bdpt_mod
from gradientdomain_mitsuba_tpu.models import gbdpt as gb_mod
from gradientdomain_mitsuba_tpu.models import path as path_mod
from gradientdomain_mitsuba_tpu.scene import scene as sc

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CBOX = os.path.join(ROOT, "data/scenes/cbox/cbox.xml")


@pytest.fixture(scope="module")
def cbox():
    return sc.load_scene(
        CBOX, {"width": "24", "height": "24", "spp": "8", "maxDepth": "3"})


def test_bdpt_matches_path(cbox):
    """BDPT and PT estimate the same integral; means must agree within MC
    noise (this exercises every strategy + MIS weight at once: any
    double-counting or weight error shifts the mean)."""
    scene, st = cbox
    b = bdpt_mod.BDPTracer(scene, st)
    img = b.render(scene, seed=0, spp=32, chunk=8)
    ref = path_mod.PathTracer(scene, st).render(scene, seed=9, spp=512)
    assert not np.isnan(img).any()
    ratio = img.mean() / ref.mean()
    assert abs(ratio - 1) < 0.03, ratio
    # regional agreement too (catches light-image mis-normalization)
    for sl in [np.s_[0:8], np.s_[8:16], np.s_[16:24]]:
        r = img[sl].mean() / max(ref[sl].mean(), 1e-9)
        assert abs(r - 1) < 0.06, (sl, r)


def test_bdpt_deterministic(cbox):
    scene, st = cbox
    b = bdpt_mod.BDPTracer(scene, st)
    a = b.render(scene, seed=4, spp=2, chunk=2)
    c = b.render(scene, seed=4, spp=2, chunk=2)
    np.testing.assert_array_equal(a, c)


def test_gbdpt_primal_parity(cbox):
    """gbdpt primal (incl. light image) + very_direct == bdpt exactly —
    the gradient machinery must not perturb the primal estimator."""
    scene, st = cbox
    g = gb_mod.GBDPTracer(scene, st)
    out = g.render(scene, seed=0, spp=4, chunk=2)
    b = bdpt_mod.BDPTracer(scene, st)
    img = b.render(scene, seed=0, spp=4, chunk=2)
    comb = out["primal"] + out["very_direct"]
    np.testing.assert_allclose(comb, img, rtol=2e-4, atol=2e-5)


def test_gbdpt_primal_parity_no_lightimage(cbox):
    """Same parity with the lightImage knob off (t=1 family removed from
    sampling AND MIS denominators on both sides)."""
    scene, st = cbox
    import copy
    st2 = copy.deepcopy(st)
    st2.integrator_props["lightImage"] = False
    g = gb_mod.GBDPTracer(scene, st2)
    out = g.render(scene, seed=0, spp=4, chunk=2)
    b = bdpt_mod.BDPTracer(scene, st2)
    img = b.render(scene, seed=0, spp=4, chunk=2)
    comb = out["primal"] + out["very_direct"]
    np.testing.assert_allclose(comb, img, rtol=2e-4, atol=2e-5)


def test_gbdpt_lightimage_grads_knob(cbox):
    """lightImageGradients=false (cost knob: skips the t=1 retrace +
    reconnection shifts) must leave the primal estimator BIT-identical —
    only the gradient buffers lose the light-image share."""
    scene, st = cbox
    import copy
    st2 = copy.deepcopy(st)
    st2.integrator_props["lightImageGradients"] = False
    g_on = gb_mod.GBDPTracer(scene, st)
    g_off = gb_mod.GBDPTracer(scene, st2)
    assert g_on.light_image_grads and not g_off.light_image_grads
    out_on = g_on.render(scene, seed=0, spp=2, chunk=2)
    out_off = g_off.render(scene, seed=0, spp=2, chunk=2)
    for k in ("primal", "very_direct"):
        np.testing.assert_array_equal(out_on[k], out_off[k])
    # gradients differ exactly by the t=1 shift contributions (nonzero
    # somewhere on cbox at spp=2)
    assert np.abs(out_on["dx"] - out_off["dx"]).max() > 0


def test_bdpt_no_lightimage_matches_path(cbox):
    """With lightImage=false the remaining strategies re-weight to a
    complete estimator (camera excluded from MIS denominators too)."""
    scene, st = cbox
    import copy
    st2 = copy.deepcopy(st)
    st2.integrator_props["lightImage"] = False
    b = bdpt_mod.BDPTracer(scene, st2)
    img = b.render(scene, seed=1, spp=32, chunk=8)
    ref = path_mod.PathTracer(scene, st).render(scene, seed=9, spp=512)
    ratio = img.mean() / ref.mean()
    assert abs(ratio - 1) < 0.03, ratio


def test_gbdpt_gradient_consistency():
    """E[dx] must match the finite difference of E[primal] — with the
    light image ON: the t=1 strategies' image-space shifts must supply
    the light-image share of the gradients (a technique present in the
    MIS denominators but missing from the pair sampling biases E[dx])."""
    scene, st = sc.load_scene(
        CBOX, {"width": "16", "height": "16", "spp": "8", "maxDepth": "2"})
    g = gb_mod.GBDPTracer(scene, st)
    out = g.render(scene, seed=0, spp=48, chunk=8)
    ref = g.render(scene, seed=555, spp=256, chunk=8)
    fd_x = ref["primal"][:, 1:] - ref["primal"][:, :-1]
    dx = out["dx"][:, :-1]
    vd = out["very_direct"].sum(-1)
    mx = (vd[:, 1:] + vd[:, :-1]) == 0  # mask light-edge pixels
    rms_fd = np.sqrt((fd_x[mx] ** 2).mean())
    rms_err = np.sqrt(((dx[mx] - fd_x[mx]) ** 2).mean())
    assert rms_err / rms_fd < 0.55, (rms_err, rms_fd)
    corr = np.corrcoef(dx[mx].ravel(), fd_x[mx].ravel())[0, 1]
    assert corr > 0.85, corr


def test_bdpt_scan_matches_unrolled():
    """The scanned dynamic-(s,t) strategy kernel (one compiled body via
    lax.scan, models/bdpt.py _strategy_connect_dyn/_mis_sum_dyn) must be
    bit-identical to the unrolled static strategy loop (GDMT r3: compile
    time of the unrolled loop grows quadratically with depth)."""
    scene, st = sc.load_scene(
        CBOX, {"width": "16", "height": "16", "spp": "4", "maxDepth": "5"})
    os.environ["GDMT_SCAN_STRATEGIES"] = "0"
    try:
        a = bdpt_mod.BDPTracer(scene, st).render(scene, seed=3, spp=4)
        os.environ["GDMT_SCAN_STRATEGIES"] = "1"
        b = bdpt_mod.BDPTracer(scene, st).render(scene, seed=3, spp=4)
    finally:
        del os.environ["GDMT_SCAN_STRATEGIES"]
    assert np.isfinite(a).all() and np.isfinite(b).all()
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-5, atol=2e-6)


def test_gbdpt_scan_matches_unrolled():
    """G-BDPT's scanned s>=2,t>=4 block (suffix-factorized class) must be
    bit-identical to the unrolled loop: primal, gradients, and
    light-image splats all go through the dynamic kernels."""
    scene, st = sc.load_scene(
        CBOX, {"width": "16", "height": "16", "spp": "2", "maxDepth": "6"})
    outs = {}
    for mode in ("0", "1"):
        os.environ["GDMT_SCAN_STRATEGIES"] = mode
        try:
            g = gb_mod.GBDPTracer(scene, st)
            outs[mode] = g.render(scene, seed=5, spp=2)
        finally:
            del os.environ["GDMT_SCAN_STRATEGIES"]
    for k in ("primal", "dx", "dy", "very_direct"):
        a, b = np.asarray(outs["0"][k]), np.asarray(outs["1"][k])
        assert np.isfinite(a).all(), k
        np.testing.assert_allclose(a, b, rtol=3e-5, atol=3e-6,
                                   err_msg=k)
