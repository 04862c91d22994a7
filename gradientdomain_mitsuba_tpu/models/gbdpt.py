"""Gradient-Domain Bidirectional Path Tracing (G-BDPT).

TPU-native replacement for the fork's gbdpt integrator
(src/integrators/gbdpt/gbdpt.cpp + gbdpt_proc.cpp, Manzi et al., EGSR
2015): per pixel sample, the base BDPT evaluation (models/bdpt.py) is
augmented with FOUR shifted evaluations whose EYE subpath is offset to the
neighboring pixel; the light subpath is shared (SURVEY.md §9.5).

Shift map (ONE piecewise map per neighbor, shared by every technique —
required for the MIS weights to partition unity, since every (s,t) with
the same total length samples the same physical paths):
  - reconnection at the FIRST vertex: offset camera ray -> z'_1, then
    reconnect z'_1 to the path's second surface vertex (z_2 for t>=3, the
    light endpoint y_{s-1} for t=2, y_{s-2} for t=1); requires z_1, z'_1,
    and that second vertex all classified diffuse by shiftThreshold;
  - light-tracing paths (t=1) are shifted in IMAGE space: the splat
    position moves one pixel, the camera ray through the shifted position
    is retraced to find z'_1, and z'_1 reconnects to y_{s-2}.  The image-
    plane Jacobian p_camArea(y_{s-1}) / p_camArea(z'_1) carries the
    vertex-area change (SURVEY.md §9.5 [G/?]);
  - otherwise (specular/glossy first vertex) the shift FAILS: r = 0,
    contribution 0, and the MIS weight degrades unbiasedly to the valid
    side.  Specular-prefix half-vector replay is a planned extension; it
    must upgrade the map for ALL t (including t=1) at once to stay
    consistent.

Estimator (decomposed gradient MIS): the primal integral is split into
per-technique components I_{s,t} = E[w_st * f] with the standard BDPT
power-heuristic weights w_st = 1/(1+A) (A = bdpt._mis_sum technique sum,
a pure function of the path).  Each component's gradient is estimated
independently with a TWO-way MIS between "sampled at this pixel, shifted
forward" and "sampled at the neighbor, shifted back":

    g_st = 1/(1 + r^2) * ( w_st(ybar) * c_off - w_st(xbar) * c_base ),
    r    = p_st(ybar) |J| / p_st(xbar)
         = |J| * prod_i pdf_fwd_offset(z_i) / pdf_fwd_base(z_i),

where c_* are the raw strategy contributions f/p and w_st(ybar) uses the
technique sum evaluated on the SHIFTED view.  Unlike the fully-coupled
heuristic (one denominator over all techniques x {base, offset}), this
form stays unbiased even when different techniques use DIFFERENT shift
maps for the same physical path — which they do here: t=1 paths shift in
image space with immediate reconnection while t>=2 eye shifts may replay
specular prefixes.  The offset views store TRUE per-slot densities (so
A_o is correct even for the t'=1 technique, whose density does not
contain the camera edge); the camera-edge image-plane shift is
measure-preserving, so |J_cam| * pdf ratio of slot 0 == 1 and the slot-0
factor is simply skipped.
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
        # light tracing (t=1) participates fully: sampled into the light
        # image, shifted in image space for the gradients, and present in
        # every MIS denominator (camera connectable).  lightImage=false
        # removes the whole family consistently (reference knob).
        self.light_image = bool(p.get("lightImage", True))
        self.camera_connectable = self.light_image

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
        # map consistency: the SAME piecewise shift map must apply to every
        # technique sampling this path, so t=2 strategies also require the
        # first-vertex classifications (their "z_2" is the light endpoint,
        # classified per strategy in trace_pass)
        ok_t2 = its1.valid & eye.valid[:, 0] & c_base1 & c_off1
        ok_conn = ok_t2 & c_base2

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

        # TRUE camera-technique density of z'_1 (area measure).  The
        # image-plane shift is measure-preserving, so the slot-0 MIS
        # ratio times the camera Jacobian is identically 1 and r simply
        # skips slot 0 — but A_o needs the true value for the t'=1
        # technique (whose density has no camera edge).
        pdf_fwd0_off = self._camera_pdf_area(scene, its1.p, its1.ng)

        view = eye._replace(
            p=eye.p.at[:, 0].set(its1.p),
            ng=eye.ng.at[:, 0].set(its1.ng),
            ns=eye.ns.at[:, 0].set(its1.ns),
            uv=eye.uv.at[:, 0].set(its1.uv),
            wi=eye.wi.at[:, 0].set(-d_cam).at[:, 1].set(-dir_rc),
            bsdf_id=eye.bsdf_id.at[:, 0].set(its1.bsdf_id),
            emitter_id=eye.emitter_id.at[:, 0].set(its1.emitter_id),
            pdf_fwd=eye.pdf_fwd
                .at[:, 0].set(jnp.where(ok_t2, pdf_fwd0_off,
                                        eye.pdf_fwd[:, 0]))
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
    def _t1_offset(self, scene, light, y0, s, film_base, N, eps, W, H,
                   c_light_end):
        """Image-space shift of a light-tracing path (t=1, reference
        gbdpt_proc.cpp light-image handling): retrace the camera ray
        through film_base + offset -> z'_1, reconnect z'_1 -> y_{s-2},
        evaluate the shifted t=1 contribution + its technique sum on a
        light-subpath VIEW with slot s-2 replaced.

        Returns per offset direction lists of (value*J, sri_off, r).  The
        shift fails (r=0) unless y_{s-1}, z'_1 and y_{s-2} are all
        classified diffuse — the same piecewise map as the eye-subpath
        shifts, evaluated from the path geometry."""
        kl = s - 2
        if s >= 3:
            prev_p = light.p[:, kl - 1]
            prev_ng = light.ng[:, kl - 1]
            prev_ok = light.valid[:, kl - 1]
            c_prev = self._classify_diffuse(scene, light.bsdf_id[:, kl - 1],
                                            prev_ok)
        else:  # s == 2: previous vertex is the emitter point y_0
            prev_p, prev_ng = y0.p, y0.ng
            prev_ok = y0.ok
            c_prev = prev_ok  # emitter surface: always connectable

        pf_base = _remap0(light.pdf_fwd[:, kl])
        jbase = self._camera_pdf_area(scene, light.p[:, kl],
                                      light.ng[:, kl])
        u_half = jnp.full((N, 2), 0.5)

        out = []
        for o_i in range(4):
            film_o = film_base + jnp.asarray(OFFSETS[o_i])
            o_c, d_c = sensor_ops.sample_ray(scene.camera, W, H, film_o,
                                             u_half)
            hit = self.closest(o_c, d_c, jnp.zeros(N), jnp.full(N, 3e38),
                               scene.geom)
            its1 = common.fill_intersection(scene, o_c, d_c, hit)
            c_off = self._classify_diffuse(scene, its1.bsdf_id, its1.valid)

            to1 = its1.p - prev_p
            d2 = jnp.maximum(m.squared_length(to1), 1e-12)
            dist = jnp.sqrt(d2)
            dirp = to1 / _b3(dist)
            conv_rc = jnp.abs(m.dot(dirp, its1.ng)) / d2

            occ = self.occluded(
                common.offset_ray_origin(prev_p, prev_ng, dirp, eps),
                dirp, jnp.zeros(N), dist - 2 * eps, scene.geom)
            ok = (its1.valid & prev_ok & light.valid[:, kl] & c_light_end &
                  c_off & c_prev & ~occ)

            # BSDF / emission factor at y_{s-2} toward z'_1 (adjoint side)
            if s >= 3:
                f_prev, pdf_prev_sa = self._eval_at(scene, light, kl - 1,
                                                    dirp)
                wi_w = light.wi[:, kl - 1]
                ns_p, ng_p = light.ns[:, kl - 1], light.ng[:, kl - 1]
                corr = ((jnp.abs(m.dot(dirp, ns_p)) *
                         jnp.abs(m.dot(wi_w, ng_p))) /
                        jnp.maximum(jnp.abs(m.dot(dirp, ng_p)) *
                                    jnp.abs(m.dot(wi_w, ns_p)), 1e-9))
                f_prev = f_prev * _b3(corr)
            else:
                cos0 = jnp.maximum(m.dot(dirp, y0.ng), 0.0)
                f_prev = jnp.broadcast_to(_b3(cos0), (N, 3))
                pdf_prev_sa = cos0 / jnp.pi
            ok = ok & (jnp.max(f_prev, -1) > 0) & (pdf_prev_sa > 0)

            # image-plane Jacobian: dA(z'_1)/dA(y_{s-1}) in image coords
            joff = self._camera_pdf_area(scene, its1.p, its1.ng)
            jimg = jbase / jnp.maximum(joff, 1e-30)

            beta_prev = y0.beta if s == 2 else light.beta[:, kl - 1]
            beta_off = beta_prev * f_prev * _b3(conv_rc / pf_base)
            pf_off = pdf_prev_sa * conv_rc

            # reverse-pdf fixups behind the junction
            pdf_rev_fix = light.pdf_rev
            y0_view = y0
            if s >= 4:
                pdf_rev_fix = pdf_rev_fix.at[:, kl - 2].set(
                    self._pdf_toward_prev(scene, light, kl - 1, dirp,
                                          light.p[:, kl - 2],
                                          light.ng[:, kl - 2]))
            elif s == 3:
                y0_view = y0._replace(pdf_rev=self._pdf_toward_prev(
                    scene, light, kl - 1, dirp, y0.p, y0.ng))

            view = light._replace(
                p=light.p.at[:, kl].set(its1.p),
                ng=light.ng.at[:, kl].set(its1.ng),
                ns=light.ns.at[:, kl].set(its1.ns),
                uv=light.uv.at[:, kl].set(its1.uv),
                wi=light.wi.at[:, kl].set(-dirp),
                bsdf_id=light.bsdf_id.at[:, kl].set(its1.bsdf_id),
                beta=light.beta.at[:, kl].set(beta_off),
                pdf_fwd=light.pdf_fwd.at[:, kl].set(pf_off),
                pdf_rev=pdf_rev_fix,
                delta=light.delta.at[:, kl].set(
                    _is_delta_kind(scene.materials, its1.bsdf_id)),
                valid=light.valid.at[:, kl].set(ok))

            # eye is only shape-inspected by _mis_sum for t=1 (its loop
            # over eye-side techniques is empty); pass the light view
            _, val, sri = self._strategy_t1(scene, view, view, y0_view, s,
                                            N, eps, W, H)
            r = jnp.where(ok, (pf_off / pf_base) * jimg, 0.0)
            val = jnp.where(_b3(ok), val * _b3(jimg), 0.0)
            sri = jnp.where(ok, sri, 0.0)
            out.append((val, sri, r))
        return out

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
        t1_pos, t1_grad = [], []

        def pair_grad(c_base, sri_base, c_off, sri_off, r, ok):
            """Decomposed gradient estimate for one (strategy, offset)
            pair — see module docstring.  Guards: invalid offset views can
            carry inf/NaN technique sums and r*r can overflow to inf (a
            2-way weight of 0 on this side — the neighbor's sample covers
            the pair)."""
            sri_off = jnp.where(ok, sri_off, 0.0)
            r = jnp.where(ok, r, 0.0)
            c_off = jnp.where(_b3(ok), c_off, 0.0)
            a = 1.0 / (1.0 + r * r)
            a = jnp.where(jnp.isnan(a), 0.0, a)
            w_off = jnp.where(ok, 1.0 / (1.0 + sri_off), 0.0)
            w_base = 1.0 / (1.0 + sri_base)
            return _b3(a) * (_b3(w_off) * c_off - _b3(w_base) * c_base)

        def run_strategy(view, s, t):
            if s == 0:
                return self._strategy_s0(scene, view, light, y0, t, N)
            if s == 1:
                return self._strategy_s1(scene, view, light, y0, t, N, eps)
            return self._strategy_connect(scene, view, light, y0, s, t, N,
                                          eps)

        def classify_light_end(s):
            """Shift-map classification of the reconnection target when it
            is a light vertex (t=2 endpoint / t=1 second vertex)."""
            if s <= 1:
                return jnp.ones(N, bool)  # y_0: emitter surface
            return self._classify_diffuse(scene, light.bsdf_id[:, s - 2],
                                          light.valid[:, s - 2])

        for t in range(1, self.TE + 2):
            for s in range(0, self.SM + 1):
                k_edges = s + t - 1
                if s + t < 2 or k_edges > self.depth:
                    continue
                if t == 1:
                    if s < 2 or not self.light_image:
                        continue
                    pos, val, sri_base = self._strategy_t1(
                        scene, eye, light, y0, s, N, eps, W, H)
                    splat_pos.append(pos)
                    splat_val.append(val * _b3(1.0 / (1.0 + sri_base)))
                    offs = self._t1_offset(scene, light, y0, s, pos, N,
                                           eps, W, H, classify_light_end(s))
                    g = [pair_grad(val, sri_base, v_off, sri_off, r, r > 0)
                         for (v_off, sri_off, r) in offs]
                    t1_pos.append(pos)
                    t1_grad.append(jnp.stack(g))
                    continue

                c_base, sri_base = run_strategy(eye, s, t)
                w_base = 1.0 / (1.0 + sri_base)
                if s == 0 and t == 2:
                    very = very + c_base * _b3(w_base)
                    continue  # very direct: excluded from gradients
                primal = primal + c_base * _b3(w_base)

                for o_i, (view, ok_t2, ok_conn) in enumerate(views):
                    if t == 2:
                        ok = ok_t2 & classify_light_end(s)
                    else:
                        ok = ok_conn
                    c_off, sri_off = run_strategy(view, s, t)
                    # r = |J| * prod of TRUE pdf ratios over the eye slots
                    # this technique samples; slot 0 contributes exactly 1
                    # (measure-preserving image-plane shift) and slots
                    # >= 3 are shared with the base (ratio 1)
                    r = jnp.ones(N)
                    for i in range(1, min(t - 1, 3)):
                        r = r * (_remap0(view.pdf_fwd[:, i]) /
                                 _remap0(eye.pdf_fwd[:, i]))
                    grad = grad.at[o_i].add(pair_grad(
                        c_base, sri_base, c_off, sri_off, r, ok))

        def cat(parts, shape):
            if parts:
                return jnp.concatenate(parts, axis=-2 if len(shape) == 3
                                       else 0)
            return jnp.zeros(shape)

        splat_pos = cat(splat_pos, (0, 2))
        splat_val = cat(splat_val, (0, 3))
        t1_pos = cat(t1_pos, (0, 2))
        t1_grad = cat(t1_grad, (4, 0, 3))
        return (pos_film, primal, very, grad, splat_pos, splat_val,
                t1_pos, t1_grad)

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
            (pos, primal, very, grad, spos, sval, t1p, t1g) = \
                self.trace_pass(scene, seed, sample_start + i)
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
            # light-image (t=1) gradient pairs splat at the base splat
            # position, same forward/backward lattice convention
            dx = film_ops.splat_unfiltered(dx, t1p, t1g[0])
            dx = film_ops.splat_unfiltered(
                dx, t1p + jnp.asarray(OFFSETS[1]), -t1g[1])
            dy = film_ops.splat_unfiltered(dy, t1p, t1g[2])
            dy = film_ops.splat_unfiltered(
                dy, t1p + jnp.asarray(OFFSETS[3]), -t1g[3])
            return dict(primal=fb, dx=dx, dy=dy, very_direct=vd,
                        light_img=li, wsum=wb)

        return jax.lax.fori_loop(0, n_samples, body, bufs)

    def finalize(self, state, spp):
        w = np.maximum(state["wsum"], 1e-12)[..., None]
        return {
            # the light image is part of the PRIMAL the Poisson solve
            # sees — its gradients are estimated (t=1 image-space shifts),
            # so it must not bypass reconstruction (gbdpt_wr merge [G])
            "primal": state["primal"] / w + state["light_img"] / spp,
            "very_direct": state["very_direct"] / w,
            "dx": state["dx"] / spp,
            "dy": state["dy"] / spp,
        }

    def render(self, scene, seed=0, spp=None, chunk=4,
               checkpoint_path=None, resume=False, progress=None):
        """Returns buffers dict; the light image is merged into primal
        (it participates in reconstruction via the t=1 gradient shifts);
        very_direct is re-added after reconstruction."""
        from ..parallel.checkpoint import render_accumulate
        spp = spp or self.settings.spp
        state, spp = render_accumulate(
            self, scene, seed, spp, chunk,
            checkpoint_path=checkpoint_path, resume=resume,
            progress=progress)
        return self.finalize(state, spp)
