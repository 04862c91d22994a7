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


def test_slot_overlay_matches_materialized_view(cbox):
    """SlotOverlay (G-BDPT's copy-free t=1 shifted view) must be
    indistinguishable from a materialized `.at[:, k].set()` view for
    every reader: _mis_sum, _eval_at, _pdf_toward_prev and the column
    helper itself."""
    import jax.numpy as jnp
    scene, st = cbox
    tr = bdpt_mod.BDPTracer(scene, st)
    rng = np.random.default_rng(7)
    N, D = 64, 3
    f32 = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32)
    unit = lambda *s: (lambda a: a / np.linalg.norm(a, axis=-1,
                                                   keepdims=True))(
        rng.standard_normal(s)).astype(np.float32)
    sp = bdpt_mod.SubPath(
        p=f32(N, D, 3), ng=jnp.asarray(unit(N, D, 3)),
        ns=jnp.asarray(unit(N, D, 3)), wi=jnp.asarray(unit(N, D, 3)),
        uv=jnp.abs(f32(N, D, 2)) % 1.0,
        bsdf_id=jnp.zeros((N, D), jnp.int32),
        emitter_id=jnp.full((N, D), -1, jnp.int32),
        beta=jnp.abs(f32(N, D, 3)),
        pdf_fwd=jnp.abs(f32(N, D)) + 0.1,
        pdf_rev=jnp.abs(f32(N, D)) + 0.1,
        delta=jnp.zeros((N, D), bool), valid=jnp.ones((N, D), bool))
    y0 = bdpt_mod.LightStart(
        p=f32(N, 3), ng=jnp.asarray(unit(N, 3)),
        rad=jnp.abs(f32(N, 3)), pdf_pos=jnp.abs(f32(N)) + 0.1,
        beta=jnp.abs(f32(N, 3)), ok=jnp.ones(N, bool),
        pdf_rev=jnp.abs(f32(N)) + 0.1)

    kl = 1
    over = {("p", kl): f32(N, 3), ("ns", kl): jnp.asarray(unit(N, 3)),
            ("ng", kl): jnp.asarray(unit(N, 3)),
            ("wi", kl): jnp.asarray(unit(N, 3)),
            ("uv", kl): jnp.abs(f32(N, 2)) % 1.0,
            ("bsdf_id", kl): jnp.zeros((N,), jnp.int32),
            ("beta", kl): jnp.abs(f32(N, 3)),
            ("pdf_fwd", kl): jnp.abs(f32(N)) + 0.1,
            ("pdf_rev", 0): jnp.abs(f32(N)) + 0.1,
            ("delta", kl): jnp.zeros((N,), bool),
            ("valid", kl): jnp.ones((N,), bool)}
    ov = bdpt_mod.SlotOverlay(sp, over)
    mat = sp._replace(
        p=sp.p.at[:, kl].set(over[("p", kl)]),
        ns=sp.ns.at[:, kl].set(over[("ns", kl)]),
        ng=sp.ng.at[:, kl].set(over[("ng", kl)]),
        wi=sp.wi.at[:, kl].set(over[("wi", kl)]),
        uv=sp.uv.at[:, kl].set(over[("uv", kl)]),
        bsdf_id=sp.bsdf_id.at[:, kl].set(over[("bsdf_id", kl)]),
        beta=sp.beta.at[:, kl].set(over[("beta", kl)]),
        pdf_fwd=sp.pdf_fwd.at[:, kl].set(over[("pdf_fwd", kl)]),
        pdf_rev=sp.pdf_rev.at[:, 0].set(over[("pdf_rev", 0)]),
        delta=sp.delta.at[:, kl].set(over[("delta", kl)]),
        valid=sp.valid.at[:, kl].set(over[("valid", kl)]))

    for name in ("p", "ns", "beta", "pdf_fwd", "pdf_rev", "delta"):
        for k in range(D):
            np.testing.assert_array_equal(
                np.asarray(bdpt_mod._col(ov, name, k)),
                np.asarray(getattr(mat, name)[:, k]), err_msg=(name, k))

    # _mis_sum parity over the s=3, t=1 strategy (the overlay's use)
    args = (jnp.abs(f32(N)) + 0.1, jnp.abs(f32(N)) + 0.1,
            jnp.abs(f32(N)) + 0.1, jnp.abs(f32(N)) + 0.1)
    a = np.asarray(tr._mis_sum(ov, ov, y0, 3, 1, *args))
    b = np.asarray(tr._mis_sum(mat, mat, y0, 3, 1, *args))
    np.testing.assert_allclose(a, b, rtol=1e-6)

    # _eval_at / _pdf_toward_prev parity at the overridden slot
    wo = jnp.asarray(unit(N, 3))
    fa, pa = tr._eval_at(scene, ov, kl, wo)
    fb, pb = tr._eval_at(scene, mat, kl, wo)
    np.testing.assert_allclose(np.asarray(fa), np.asarray(fb), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), rtol=1e-6)
    qa = tr._pdf_toward_prev(scene, ov, kl, wo, y0.p, y0.ng)
    qb = tr._pdf_toward_prev(scene, mat, kl, wo, y0.p, y0.ng)
    np.testing.assert_allclose(np.asarray(qa), np.asarray(qb), rtol=1e-6)
