"""Gradient-Domain Bidirectional Path Tracing (G-BDPT).

TPU-native replacement for the fork's gbdpt integrator
(src/integrators/gbdpt/gbdpt.cpp + gbdpt_proc.cpp, Manzi et al., EGSR
2015): per pixel sample, the base BDPT evaluation (models/bdpt.py) is
augmented with FOUR shifted evaluations whose EYE subpath is offset to the
neighboring pixel; the light subpath is shared (SURVEY.md §9.5).

Round-1 shift scope (documented limitations, see SURVEY.md §0):
  - The offset eye subpath reconnects at the FIRST vertex: offset camera
    ray -> z'_1, then reconnect z'_1 -> z_2 (requires z_1, z'_1, z_2 all
    classified diffuse by shiftThreshold).  Specular/glossy prefix replay
    (multi-step half-vector chains) is not yet implemented — offsets die
    on delta first vertices and the MIS weights degrade unbiasedly to the
    valid side, exactly like a failed shift in the reference.
  - light tracing (t=1) is disabled entirely (sampling AND MIS
    denominators): its image-space gradient shift is future work, and a
    technique present in the denominators but absent from the gradient
    sampling biases E[dx] low.  The t>=2 strategies alone reach every
    light path, so the estimator stays complete and unbiased — light
    tracing returns in a later round as an efficiency upgrade.

Estimator: for strategy (s,t) with base technique sum A_b (bdpt._mis_sum)
and offset sum A_o computed on the SHIFTED eye-subpath view, the gradient
pair weight is

    w = 1 / ( (1 + A_b) + r^2 (1 + A_o) ),
    r = prod_i pdf_fwd_offset(z_i) / pdf_fwd_base(z_i),  i <= t-1,

which equals p_base^2 / (sum over {base,offset} x strategies of technique
densities^2) — the extended power heuristic of the paper.  The camera-edge
Jacobian of the shift is folded into the offset view's first pdf_fwd slot
(set to the base camera pdf), making every offset technique density carry
p_offset * |J| exactly.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core import math as m
from ..core.rng import DimAllocator as DA
from ..core.rng import uniform_2d
from ..ops import bsdf as bsdf_ops
from ..ops import common, film as film_ops
from ..ops import sensor as sensor_ops
from .bdpt import (BDPTracer, SubPath, _b3, _dir_to_area, _is_delta_kind,
                   _remap0)
from .gpt import OFFSETS


class GBDPTracer(BDPTracer):
    """G-BDPT: BDPT base + 4 shifted eye-subpath evaluations."""

    def __init__(self, scene, settings):
        self.kinds = bsdf_ops.scene_kinds(scene)
        self._beval = functools.partial(bsdf_ops.eval, kinds=self.kinds)
        self._bpdf = functools.partial(bsdf_ops.pdf, kinds=self.kinds)
        self._bsample = functools.partial(bsdf_ops.sample, kinds=self.kinds)
        super().__init__(scene, settings)
        p = settings.integrator_props
        self.shift_threshold = float(p.get("shiftThreshold", 0.001))
        # ROUND-1 LIMITATION: light tracing (t=1) is disabled for G-BDPT —
        # its image-space gradient shift is not implemented yet, and
        # keeping the technique in the MIS denominators while not sampling
        # its shifts biases E[dx] low (measured slope ~0.5 on cbox).  The
        # t>=2 strategy set still reaches every light path (eye walks pass
        # through delta chains), so the estimator remains complete and
        # unbiased; light tracing returns as an efficiency upgrade with
        # image-space shifts (SURVEY.md §9.5 [G/?]).
        self.light_image = False
        self.camera_connectable = False

    def _classify_diffuse(self, scene, bsdf_id, valid):
        rough = bsdf_ops.roughness(scene.materials, jnp.maximum(bsdf_id, 0))
        return valid & (rough > self.shift_threshold)

    # ------------------------------------------------------------------
    def _offset_primary(self, scene, seed, sample_idx, pixel_id, W, H, o_i):
        """Trace the offset-pixel camera ray; returns its Intersection and
        the camera direction."""
        N = pixel_id.shape[0]
        px = (pixel_id % W).astype(jnp.float32)
        py = (pixel_id // W).astype(jnp.float32)
        jitter = self._u2(seed, pixel_id, sample_idx, DA.PIXEL_JITTER)
        pos = (jnp.stack([px, py], -1) + jitter +
               jnp.asarray(OFFSETS[o_i]))
        u_ap = self._u2(seed, pixel_id, sample_idx, DA.APERTURE)
        o, d = sensor_ops.sample_ray(scene.camera, W, H, pos, u_ap)
        hit = self.closest(o, d, jnp.zeros(N), jnp.full(N, 3e38),
                           scene.geom)
        its = common.fill_intersection(scene, o, d, hit)
        return its, d

    def _build_offset_view(self, scene, eye: SubPath, its1, d_cam, N, eps):
        """Shifted eye-subpath view: slot 0 replaced by the offset primary
        vertex z'_1, slots 1..2 with adjusted pdf/throughput entries, the
        rest shared with the base.  Returns (view, ok_t2, ok_conn,
        ratio_beta2) where ok_t2 gates strategies with t-1 == 1 and
        ok_conn gates t-1 >= 2."""
        # classification
        c_base1 = self._classify_diffuse(scene, eye.bsdf_id[:, 0],
                                         eye.valid[:, 0])
        c_off1 = self._classify_diffuse(scene, its1.bsdf_id, its1.valid)
        c_base2 = self._classify_diffuse(scene, eye.bsdf_id[:, 1],
                                         eye.valid[:, 1])
        ok_t2 = its1.valid & eye.valid[:, 0]
        ok_conn = ok_t2 & c_base1 & c_off1 & c_base2

        # reconnection geometry z'_1 -> z_2
        z2 = eye.p[:, 1]
        to2 = z2 - its1.p
        d2sq = jnp.maximum(m.squared_length(to2), 1e-12)
        dist2v = jnp.sqrt(d2sq)
        dir_rc = to2 / _b3(dist2v)
        occ = self.occluded(
            common.offset_ray_origin(its1.p, its1.ng, dir_rc, eps),
            dir_rc, jnp.zeros(N), dist2v - 2 * eps,
            scene.geom)
        ok_conn = ok_conn & ~occ

        # f and pdf at z'_1 toward z_2
        ss1, ts1 = m.build_frame(its1.ns)
        wi1 = m.to_local(-d_cam, ss1, ts1, its1.ns)
        wo1 = m.to_local(dir_rc, ss1, ts1, its1.ns)
        par1 = common.material_params(scene, self.has_textures,
                                      its1.bsdf_id, its1.uv)
        f1 = self._beval(par1, wi1, wo1)
        pdf1_sa = self._bpdf(par1, wi1, wo1)
        ok_conn = ok_conn & (jnp.max(f1, -1) > 0) & (pdf1_sa > 0)

        # base z_1 -> z_2 edge quantities
        base_wi2 = eye.wi[:, 1]                       # unit z_2 -> z_1
        # base pdf_fwd[1] is the area pdf of z_2 from z_1 (walk-stored)
        pdf_fwd2_off = _dir_to_area(pdf1_sa, dir_rc, d2sq, eye.ng[:, 1])

        # f ratio at z_2: incoming direction changes z_1->z'_1
        ss2, ts2 = m.build_frame(eye.ns[:, 1])
        par2 = common.material_params(scene, self.has_textures,
                                      eye.bsdf_id[:, 1], eye.uv[:, 1])
        wi2_off = m.to_local(-dir_rc, ss2, ts2, eye.ns[:, 1])
        wi2_base = m.to_local(base_wi2, ss2, ts2, eye.ns[:, 1])
        # outgoing toward z_3 (if it exists)
        to3 = eye.p[:, 2] - eye.p[:, 1]
        d3sq = jnp.maximum(m.squared_length(to3), 1e-12)
        dir23 = to3 / _b3(jnp.sqrt(d3sq))
        wo2 = m.to_local(dir23, ss2, ts2, eye.ns[:, 1])
        f2_off = self._beval(par2, wi2_off, wo2)
        f2_base = self._beval(par2, wi2_base, wo2)
        pdf2_off_sa = self._bpdf(par2, wi2_off, wo2)
        pdf_fwd3_off = _dir_to_area(pdf2_off_sa, dir23, d3sq, eye.ng[:, 2])
        ratio_f2 = jnp.where(
            _b3(jnp.max(f2_base, -1) > 0),
            f2_off / jnp.maximum(f2_base, 1e-20), 0.0)

        # reverse pdfs near the junction
        # pdf_rev[0] of the view: z'_1 re-sampled from z_2 (incoming z_3)
        pdf_rev1_sa = self._bpdf(par2, wo2, wi2_off)
        pdf_rev1_off = _dir_to_area(pdf_rev1_sa, -dir_rc, d2sq, its1.ng)

        # beta entries
        # beta'[0] = 1 (camera factors cancel, J folded into pdf_fwd[0])
        # beta'[1] = f(z'_1->z_2) * J_rc / pdf_sa_base(z_1->z_2)
        cos2_off = jnp.abs(m.dot(dir_rc, eye.ng[:, 1]))
        cos2_base = jnp.abs(m.dot(base_wi2, eye.ng[:, 1]))
        d2_base = jnp.maximum(
            m.squared_length(eye.p[:, 1] - eye.p[:, 0]), 1e-12)
        jac_rc = (cos2_off / d2sq) / jnp.maximum(cos2_base / d2_base, 1e-30)
        # pdf_sa of the base z_1->z_2 sample: reconstruct from pdf_fwd[1]
        pdf_base12_sa = eye.pdf_fwd[:, 1] * d2_base / jnp.maximum(
            cos2_base, 1e-9)
        beta1_off = f1 * _b3(jac_rc / jnp.maximum(pdf_base12_sa, 1e-30))
        # beta'[k>=2] = beta_base[k] * (beta'[1]/beta_base[1]) * ratio_f2
        beta1_base = eye.beta[:, 1]
        scale2 = jnp.where(
            _b3(jnp.max(jnp.abs(beta1_base), -1) > 0),
            beta1_off / jnp.maximum(beta1_base, 1e-30), 0.0) * ratio_f2

        # delta-sample prefix: if the base z_1 bounce was delta-sampled the
        # base pdf reconstruction above is meaningless -> offset dies
        ok_conn = ok_conn & ~eye.delta[:, 0] & ~eye.delta[:, 1]

        view = eye._replace(
            p=eye.p.at[:, 0].set(its1.p),
            ng=eye.ng.at[:, 0].set(its1.ng),
            ns=eye.ns.at[:, 0].set(its1.ns),
            uv=eye.uv.at[:, 0].set(its1.uv),
            wi=eye.wi.at[:, 0].set(-d_cam).at[:, 1].set(-dir_rc),
            bsdf_id=eye.bsdf_id.at[:, 0].set(its1.bsdf_id),
            emitter_id=eye.emitter_id.at[:, 0].set(its1.emitter_id),
            # camera-edge J folded: offset slot0 pdf := base slot0 pdf
            pdf_fwd=eye.pdf_fwd
                .at[:, 1].set(jnp.where(ok_conn, pdf_fwd2_off, 0.0))
                .at[:, 2].set(jnp.where(ok_conn, pdf_fwd3_off,
                                        eye.pdf_fwd[:, 2])),
            pdf_rev=eye.pdf_rev
                .at[:, 0].set(jnp.where(ok_conn, pdf_rev1_off, 0.0)),
            delta=eye.delta.at[:, 0].set(
                _is_delta_kind(scene.materials, its1.bsdf_id)),
            beta=(eye.beta * scale2[:, None, :])
                  .at[:, 0].set(jnp.ones((N, 3)))
                  .at[:, 1].set(beta1_off),
            valid=(eye.valid & ok_conn[:, None])
                .at[:, 0].set(ok_t2))
        return view, ok_t2, ok_conn

    # ------------------------------------------------------------------
    def trace_pass(self, scene, seed, sample_idx, pixel_id=None):
        st = self.settings
        W, H = st.width, st.height
        if pixel_id is None:
            pixel_id = jnp.arange(W * H, dtype=jnp.uint32)
        N = pixel_id.shape[0]
        eps = scene.ray_eps

        # env/delta-light family: routed to very_direct (not shifted /
        # differentiated; re-added after reconstruction — unbiased, env
        # gradients are future work like the light image)
        pos_film, eye, aux_L = self._gen_eye_path(scene, seed, sample_idx,
                                                  pixel_id, W, H)
        y0, light = self._gen_light_path(scene, seed, sample_idx, pixel_id)

        views = []
        for o_i in range(4):
            its1, d_cam = self._offset_primary(scene, seed, sample_idx,
                                               pixel_id, W, H, o_i)
            views.append(self._build_offset_view(scene, eye, its1, d_cam,
                                                 N, eps))

        primal = jnp.zeros((N, 3))
        very = aux_L
        grad = jnp.zeros((4, N, 3))
        splat_pos, splat_val = [], []

        def run_strategy(view, s, t):
            if s == 0:
                return self._strategy_s0(scene, view, light, y0, t, N)
            if s == 1:
                return self._strategy_s1(scene, view, light, y0, t, N, eps)
            return self._strategy_connect(scene, view, light, y0, s, t, N,
                                          eps)

        for t in range(1, self.TE + 2):
            for s in range(0, self.SM + 1):
                k_edges = s + t - 1
                if s + t < 2 or k_edges > self.depth:
                    continue
                if t == 1:
                    if s < 2 or not self.light_image:
                        continue
                    pos, val = self._strategy_t1(scene, eye, light, y0, s,
                                                 N, eps, W, H)
                    splat_pos.append(pos)
                    splat_val.append(val)
                    continue

                c_base, sri_base = run_strategy(eye, s, t)
                w_base = 1.0 / (1.0 + sri_base)
                if s == 0 and t == 2:
                    very = very + c_base * _b3(w_base)
                    continue  # very direct: excluded from gradients
                primal = primal + c_base * _b3(w_base)

                # ratio r = prod pdf_fwd_off / pdf_fwd_base over eye slots
                for o_i, (view, ok_t2, ok_conn) in enumerate(views):
                    ok = ok_t2 if t == 2 else ok_conn
                    c_off, sri_off = run_strategy(view, s, t)
                    # invalid offset views can carry inf/NaN technique
                    # sums; r is masked to 0 below but 0*NaN != 0
                    sri_off = jnp.where(ok, sri_off, 0.0)
                    r = jnp.ones(N)
                    for i in range(min(t - 1, 3)):
                        r = r * (_remap0(view.pdf_fwd[:, i]) /
                                 _remap0(eye.pdf_fwd[:, i]))
                    r = jnp.where(ok, r, 0.0)
                    c_off = jnp.where(_b3(ok), c_off, 0.0)
                    # offset technique term: guard the 0*inf corners —
                    # a degenerate offset view can have sri_off=inf while
                    # r^2 underflows to 0 (NaN); r==0 means the offset
                    # technique doesn't exist (weight falls back to base)
                    t_off = r * r * (1.0 + sri_off)
                    t_off = jnp.where(r > 0, t_off, 0.0)
                    t_off = jnp.where(jnp.isnan(t_off), jnp.inf, t_off)
                    w_pair = 1.0 / ((1.0 + sri_base) + t_off)
                    grad = grad.at[o_i].add(
                        _b3(w_pair) * (c_off - c_base))

        if splat_pos:
            splat_pos = jnp.concatenate(splat_pos, axis=0)
            splat_val = jnp.concatenate(splat_val, axis=0)
        else:
            splat_pos = jnp.zeros((0, 2))
            splat_val = jnp.zeros((0, 3))
        return pos_film, primal, very, grad, splat_pos, splat_val

    # ------------------------------------------------------------------
    @functools.partial(jax.jit, static_argnums=(0, 4))
    def render_chunk(self, scene, seed, sample_start, n_samples):
        st = self.settings
        H, W = st.height, st.width
        zero = lambda: jnp.zeros((H, W, 3))
        bufs = dict(primal=zero(), dx=zero(), dy=zero(),
                    very_direct=zero(), light_img=zero(),
                    wsum=jnp.zeros((H, W)))

        def body(i, bufs):
            pos, primal, very, grad, spos, sval = self.trace_pass(
                scene, seed, sample_start + i)
            fb, wb = film_ops.splat(bufs["primal"], bufs["wsum"], pos,
                                    primal, self.filter_kind)
            vd, _ = film_ops.splat(bufs["very_direct"],
                                   jnp.zeros_like(wb), pos, very,
                                   self.filter_kind)
            li = film_ops.splat_unfiltered(bufs["light_img"], spos, sval)
            dx = film_ops.splat_unfiltered(bufs["dx"], pos, grad[0])
            dx = film_ops.splat_unfiltered(
                dx, pos + jnp.asarray(OFFSETS[1]), -grad[1])
            dy = film_ops.splat_unfiltered(bufs["dy"], pos, grad[2])
            dy = film_ops.splat_unfiltered(
                dy, pos + jnp.asarray(OFFSETS[3]), -grad[3])
            return dict(primal=fb, dx=dx, dy=dy, very_direct=vd,
                        light_img=li, wsum=wb)

        return jax.lax.fori_loop(0, n_samples, body, bufs)

    def finalize(self, state, spp):
        w = np.maximum(state["wsum"], 1e-12)[..., None]
        return {
            "primal": state["primal"] / w,
            "very_direct": (state["very_direct"] / w +
                            state["light_img"] / spp),
            "dx": state["dx"] / spp,
            "dy": state["dy"] / spp,
        }

    def render(self, scene, seed=0, spp=None, chunk=4,
               checkpoint_path=None, resume=False, progress=None):
        """Returns buffers dict; very_direct includes the light image
        (both are added back after reconstruction)."""
        from ..parallel.checkpoint import render_accumulate
        spp = spp or self.settings.spp
        state, spp = render_accumulate(
            self, scene, seed, spp, chunk,
            checkpoint_path=checkpoint_path, resume=resume,
            progress=progress)
        return self.finalize(state, spp)
