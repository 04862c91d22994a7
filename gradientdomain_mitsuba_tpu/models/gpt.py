"""Gradient-Domain Path Tracing (G-PT).

TPU-native replacement for the fork's gpt integrator
(src/integrators/gpt/gpt.cpp — GradientPathIntegrator /
GradientPathTracer::evaluate, Kettunen et al., SIGGRAPH 2015), re-designed
as a lockstep wavefront: the base path through every pixel and its FOUR
shift-mapped offset paths (x±1, y±1) advance one bounce per loop iteration
as stacked SoA batches.  Counter-based RNG means the offset paths replay the
base path's random numbers by construction — no sampler state copying.

Estimator layout (documented because the reference is unavailable — see
SURVEY.md §0/§9):

  primal(i)      = standard PT estimator from base paths (light-vs-BSDF
                   power-heuristic MIS), EXCLUDING depth-1 "very direct"
                   emitter/environment hits;
  very_direct(i) = depth-1 emitter/env hits (added back after Poisson
                   reconstruction, gpt.cpp semantics);
  dx(i) estimates I(i+1x) - I(i), dy analogous.  Each base path through i
  contributes to the forward pair (i, i+o) and the backward pair (i-o, i);
  the pair estimate is  g = w * (contrib_offset - contrib_base)  with w the
  power-heuristic (beta=2) MIS weight over the FOUR techniques
  {base, offset} x {light-sampling, BSDF-sampling}, where offset technique
  densities carry the shift Jacobian (ratio r = p_offset*|J| / p_base
  tracked incrementally in a unified measure: area for surface segments,
  solid angle for environment segments).  A failed shift sets r = 0 and
  contrib_offset = 0, degrading w to the valid side (unbiased, §9.4).

Shift strategies per bounce (gpt.cpp ReconnectionShift/HalfVectorShift/
EnvironmentShift; classification by roughness > shiftThreshold):
  - reconnection: base and next vertex diffuse -> offset connects its own
    vertex to the base's next vertex (one visibility ray), Jacobian
    |J| = [cos'_next/cos_next] * [dist_base^2/dist_offset^2];
  - half-vector copy: specular/glossy chain -> copy the microfacet half
    vector in local frames (refraction eta-aware), Jacobian from the
    dwo/dH density ratio; total-internal-reflection kills the shift;
  - environment: base ray escapes -> offset reuses the world direction.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core import math as m
from ..core.rng import DimAllocator as DA
from ..core.rng import make_sampler, uniform_2d, uniform_float
from ..ops import bsdf as bsdf_ops
from ..ops import common, emitter as em_ops
from ..ops import film as film_ops
from ..ops import sensor as sensor_ops
from ..scene.materials import (CONDUCTOR, DIELECTRIC, THIN_DIELECTRIC)
from .path import MAX_BOUNCES_UNLIMITED, mis_weight

# film-space shifts: +x, -x, +y, -y
OFFSETS = np.array([[1, 0], [-1, 0], [0, 1], [0, -1]], np.float32)

CONN_NONE, CONN_RECENT, CONN_DONE = 0, 1, 2


def _b3(x):
    return x[..., None]


def half_vector_copy(beval, bpdf, wi_m, wo_m, par_m, is_delta_m, wi_o,
                     par_o):
    """Half-vector copy shift (gpt.cpp halfVectorShift), shape-agnostic:
    all BASE quantities must be pre-broadcast to the offset batch shape.
    wi/wo are LOCAL directions in each vertex's own shading frame.
    Returns dict(wo, f, pdf, jac, valid, is_delta) — the offset's outgoing
    direction in ITS local frame, f*cos, sampling pdf, the |dwo_o/dH| /
    |dwo_m/dH| Jacobian ratio, and validity.  Shared by G-PT's per-bounce
    lockstep shift and G-BDPT's eye-subpath prefix replay."""
    refract = (wi_m[..., 2] * wo_m[..., 2]) < 0  # transmission at base
    eta_m = par_m.eta[..., 0]
    eta_o = par_o.eta[..., 0]

    # base half-vector in its local frame
    h_refl = m.normalize(wi_m + wo_m)
    h_refl = h_refl * jnp.sign(h_refl[..., 2:3])
    rel_eta_m = jnp.where(wi_m[..., 2] >= 0, eta_m,
                          1.0 / jnp.maximum(eta_m, 1e-9))
    h_refr = m.normalize(-(wi_m + _b3(rel_eta_m) * wo_m))
    h_refr = h_refr * jnp.sign(h_refr[..., 2:3])
    h_m = jnp.where(_b3(refract), h_refr, h_refl)

    # delta offset materials use their own normal as H
    kind_o = par_o.kind
    is_delta_o = ((kind_o == CONDUCTOR) | (kind_o == DIELECTRIC) |
                  (kind_o == THIN_DIELECTRIC))
    z_axis = jnp.zeros_like(h_m).at[..., 2].set(1.0)
    h_o = jnp.where(_b3(is_delta_o), z_axis, h_m)

    wi_o_ = wi_o
    widh = m.dot(wi_o_, h_o)
    # reflection about H
    wo_refl = 2.0 * _b3(widh) * h_o - wi_o_
    # refraction about H with the OFFSET's eta
    rel_eta_o = jnp.where(wi_o_[..., 2] >= 0, eta_o,
                          1.0 / jnp.maximum(eta_o, 1e-9))
    c2 = 1.0 - (1.0 - widh * widh) / jnp.maximum(
        rel_eta_o * rel_eta_o, 1e-18)
    tir = c2 <= 0.0
    cos_t = jnp.sqrt(jnp.maximum(c2, 0.0))
    sgn = jnp.sign(widh)
    wo_refr = (-wi_o_ / _b3(rel_eta_o) +
               _b3(widh / rel_eta_o - sgn * cos_t) * h_o)
    wo_refr = m.normalize(wo_refr)
    wo_o = jnp.where(_b3(refract), wo_refr, wo_refl)

    # validity: same structural event; hemisphere consistency
    same_hemi_refl = (wo_o[..., 2] * wi_o_[..., 2]) > 0
    cross_hemi = (wo_o[..., 2] * wi_o_[..., 2]) < 0
    valid_mode = jnp.where(refract, cross_hemi & ~tir, same_hemi_refl)

    # f*cos and pdf at the offset vertex
    f_smooth = beval(par_o, wi_o_, wo_o)
    pdf_smooth = bpdf(par_o, wi_o_, wo_o)

    # delta offsets: discrete weights
    F_c = bsdf_ops.fresnel_conductor(wi_o_[..., 2], par_o.eta, par_o.k)
    F_d, _ = bsdf_ops.fresnel_dielectric(wi_o_[..., 2], eta_o)
    w_cond = par_o.specular * F_c
    w_die = jnp.where(_b3(refract),
                      par_o.transmittance /
                      _b3(jnp.maximum(rel_eta_o ** 2, 1e-9)),
                      par_o.specular)
    p_die = jnp.where(refract, 1.0 - F_d, F_d)
    f_delta = jnp.where(_b3(kind_o == CONDUCTOR), w_cond, w_die)
    pdf_delta = jnp.where(kind_o == CONDUCTOR, jnp.ones_like(F_d), p_die)

    f = jnp.where(_b3(is_delta_o), f_delta, f_smooth)
    pdf = jnp.where(is_delta_o, pdf_delta, pdf_smooth)

    # Jacobian |dwo/dH| ratio
    wodh_m = jnp.abs(m.dot(wo_m, h_m))
    wodh_o = jnp.abs(m.dot(wo_o, h_o))
    j_refl = wodh_o / jnp.maximum(wodh_m, 1e-9)
    # refraction: |dwo/dH| = eta^2 |wo.H| / (wi.H + eta*wo.H)^2 with the
    # relative eta; ratio of offset/base
    den_m = (m.dot(wi_m, h_m) + rel_eta_m * m.dot(wo_m, h_m)) ** 2
    den_o = (m.dot(wi_o_, h_o) + rel_eta_o * m.dot(wo_o, h_o)) ** 2
    j_refr = ((rel_eta_o ** 2) * wodh_o / jnp.maximum(den_o, 1e-12)) / \
        jnp.maximum((rel_eta_m ** 2) * wodh_m /
                    jnp.maximum(den_m, 1e-12), 1e-12)
    jac = jnp.where(refract, j_refr, j_refl)

    # structural consistency: a delta base bounce must map to a delta
    # offset bounce and vice versa (classification-mismatch kill)
    delta_match = is_delta_o == is_delta_m
    valid = (valid_mode & delta_match & (jnp.max(f, -1) > 0) &
             jnp.isfinite(jac) & (jac > 0))
    return dict(wo=wo_o, f=f, pdf=pdf, jac=jac, valid=valid,
                is_delta=is_delta_o)


class GPTracer:
    """Gradient-domain path tracer (also the BASE path machinery for the
    primal-parity test: with gradients ignored, primal+very_direct == path).
    """

    def __init__(self, scene, settings, aux_only=False):
        """aux_only=True restricts the estimator to the ENV/DELTA-LIGHT
        family (NEE over {point/spot/directional, envmap} + env escape;
        area-emitter contributions zeroed): G-BDPT embeds this restricted
        tracer to estimate gradients for the family its (s,t) strategies
        do not cover (models/gbdpt.py; reference analog: bdpt.cpp's
        infinite/degenerate-emitter handling, differentiated)."""
        self.kinds = bsdf_ops.scene_kinds(scene)
        self._beval = functools.partial(bsdf_ops.eval, kinds=self.kinds)
        self._bpdf = functools.partial(bsdf_ops.pdf, kinds=self.kinds)
        self._bsample = functools.partial(bsdf_ops.sample, kinds=self.kinds)
        self.settings = settings
        self.aux_only = bool(aux_only)
        self.n_area = int((np.asarray(scene.emitters.tri_count) > 0).sum())
        if self.aux_only:
            self.n_area = 0  # NEE selection + MIS densities skip area
        self.env_kind = settings.env_kind
        self.has_env = settings.env_kind != 0
        n_tris = int(scene.geom.indices.shape[0])
        self.closest, self.occluded = common.instrument_intersectors(
            self, *common.choose_intersector(
                settings, n_tris,
                int(scene.geom.clusters.offset.shape[0])))
        self.count_rays = False  # set True BEFORE first render
        self.ray_tally = None
        self.last_ray_count = None
        md = settings.max_depth
        self.n_bounces = (md - 1 if md > 0 else MAX_BOUNCES_UNLIMITED)
        self.filter_kind = film_ops.FILTERS.get(settings.rfilter, 0)
        p = settings.integrator_props
        self.shift_threshold = float(p.get("shiftThreshold", 0.001))
        self.has_textures = settings.has_textures
        # STATIC: does any material classify as specular/glossy for
        # shifting?  All-diffuse scenes skip the half-vector machinery and
        # its per-bounce offset continuation rays entirely.
        self.any_specular = bsdf_ops.any_specular(scene.materials,
                                                  self.shift_threshold)
        self.n_delta = settings.n_delta
        self._u1, self._u2 = make_sampler(settings.sampler, settings.spp)

    # ------------------------------------------------------------------
    def _classify_diffuse(self, scene, bsdf_id, valid):
        """VERTEX_TYPE_DIFFUSE iff roughness > shiftThreshold."""
        rough = bsdf_ops.roughness(scene.materials, jnp.maximum(bsdf_id, 0))
        return valid & (rough > self.shift_threshold)

    def _frame(self, its):
        ss, ts = m.build_frame(its.ns)
        return ss, ts

    # ------------------------------------------------------------------
    def trace_pass(self, scene, seed, sample_idx, pixel_id=None):
        """Trace one sample for a batch of pixels (default: whole frame).
        pixel_id indexes the GLOBAL film row-major; passing a slice is how
        the multi-chip tile renderer shards work (parallel/tiles.py)."""
        st = self.settings
        W, H = st.width, st.height
        eps = scene.ray_eps
        if pixel_id is None:
            pixel_id = jnp.arange(W * H, dtype=jnp.uint32)
        N = pixel_id.shape[0]
        px = (pixel_id % W).astype(jnp.float32)
        py = (pixel_id // W).astype(jnp.float32)

        jitter = self._u2(seed, pixel_id, sample_idx, DA.PIXEL_JITTER)
        pos_film = jnp.stack([px, py], -1) + jitter
        u_ap = self._u2(seed, pixel_id, sample_idx, DA.APERTURE)

        # base + 4 offset camera rays (same jitter/aperture randoms)
        o_m, d_m = sensor_ops.sample_ray(scene.camera, W, H, pos_film, u_ap)
        pos_off = pos_film[None] + jnp.asarray(OFFSETS)[:, None, :]
        o_o, d_o = sensor_ops.sample_ray(
            scene.camera, W, H, pos_off.reshape(4 * N, 2),
            jnp.tile(u_ap, (4, 1)))
        o_o = o_o.reshape(4, N, 3)
        d_o = d_o.reshape(4, N, 3)

        def trace4(o, d, maxt):
            hit = self.closest(o.reshape(4 * N, 3), d.reshape(4 * N, 3),
                               jnp.zeros(4 * N), maxt.reshape(4 * N),
                               scene.geom)
            its = common.fill_intersection(
                scene, o.reshape(4 * N, 3), d.reshape(4 * N, 3), hit)
            return jax.tree.map(
                lambda a: a.reshape((4, N) + a.shape[1:]), its)

        def occl4(o, d, maxt):
            return self.occluded(
                o.reshape(4 * N, 3), d.reshape(4 * N, 3), jnp.zeros(4 * N),
                maxt.reshape(4 * N), scene.geom).reshape(4, N)

        inf = jnp.full(N, 3e38)
        hit_m = self.closest(o_m, d_m, jnp.zeros(N), inf,
                             scene.geom)
        its_m = common.fill_intersection(scene, o_m, d_m, hit_m)
        its_o = trace4(o_o, d_o, jnp.broadcast_to(inf, (4, N)))

        # ---- very direct (depth 1): main only, excluded from gradients ----
        very = jnp.zeros((N, 3))
        if not self.aux_only:
            cosf = m.dot(its_m.ns, -d_m)
            is_em = its_m.valid & (its_m.emitter_id >= 0) & (cosf > 0)
            rad = common.fast_row_gather(scene.emitters.radiance,
                                         jnp.maximum(its_m.emitter_id, 0))
            very = very + jnp.where(_b3(is_em), rad, 0.0)
        if self.has_env:
            very = very + jnp.where(
                _b3(~its_m.valid),
                em_ops.eval_env(scene, self.env_kind, d_m), 0.0)

        state = dict(
            # main
            d=d_m, its=its_m,
            tp=jnp.ones((N, 3)),
            eta=jnp.ones(N),
            alive=its_m.valid,
            primal=jnp.zeros((N, 3)),
            # offsets [4, N]
            o_its=its_o,
            o_wi=-d_o,
            o_tp=jnp.ones((4, N, 3)),
            o_r=jnp.ones((4, N)),
            o_alive=its_o.valid & its_m.valid[None],
            o_conn=jnp.zeros((4, N), jnp.int32),
            grad=jnp.zeros((4, N, 3)),
        )

        # mipmap LOD: primary hits only (bounce 0 is peeled below), like
        # the reference whose ray differentials exist on camera rays
        fp_m = fp_o = None
        if self.has_textures and self.n_bounces > 0:
            fp_m = common.primary_uv_footprint(scene, W, H, d_m, its_m)
            fp_o = common.primary_uv_footprint(scene, W, H, d_o, its_o)
            if getattr(self.settings, "has_ewa", False):
                fp_m = (fp_m, common.primary_uv_jacobian(
                    scene, W, H, d_m, its_m))
                fp_o = (fp_o, common.primary_uv_jacobian(
                    scene, W, H, d_o, its_o))

        if self.n_bounces > 0:
            state = self._bounce(scene, state, 0, seed, sample_idx,
                                 pixel_id, N, eps, occl4, trace4, True,
                                 fp_main=fp_m, fp_off=fp_o)
        if self.any_specular:
            def bounce(b, s):
                rays = s.pop("rays", None)
                s2 = self._bounce(scene, s, b, seed, sample_idx,
                                  pixel_id, N, eps, occl4, trace4, True)
                if rays is not None:
                    s2["rays"] = rays + common.drain_tally(self)
                return s2

            if self.ray_tally is not None:
                state["rays"] = common.drain_tally(self)
            state = jax.lax.fori_loop(1, self.n_bounces, bounce, state)
            if self.ray_tally is not None:
                self.ray_tally.append(state.pop("rays"))
        else:
            # all-diffuse: after bounce 0 every live offset is CONNECTED
            # (reconnection either succeeded or the shift died), so the
            # not-connected machinery — 8N offset visibility/continuation
            # rays per bounce — compiles away for the remaining bounces
            if self.n_bounces > 1:
                state = self._bounce(scene, state, 1, seed, sample_idx,
                                     pixel_id, N, eps, occl4, trace4,
                                     False)
            if self.n_bounces > 2:
                # SUFFIX FACTORIZATION: from here every offset is
                # CONN_DONE (suffix shared with the base path) or dead.
                # For a shared suffix, contrib_o = rho * contrib_m with
                # rho = o_tp / tp constant for the rest of the walk
                # (both throughputs multiply by the same bs.weight and
                # RR 1/q), and the pair-MIS weight factorizes as
                # w_pair = w_std / (1 + r^2) with r = o_r constant.  For
                # a dead offset (failed shift) r = 0, rho = 0 and the
                # per-bounce update degenerates to -w_std*contrib_m.
                # Hence the ENTIRE remaining gradient is
                #   grad += (rho - 1) / (1 + r^2) * primal_rest
                # where primal_rest is the plain-PT contribution of
                # bounces >= 2 — so the remaining bounces run at plain
                # path-tracer cost (no [4,N] offset machinery at all).
                alive = state["alive"]
                o_alive = state["o_alive"]
                tp_safe = jnp.maximum(state["tp"], 1e-30)
                rho = jnp.where(_b3(o_alive),
                                state["o_tp"] / tp_safe[None], 0.0)
                r_c = jnp.where(o_alive, state["o_r"], 0.0)
                coeff = jnp.where(_b3(o_alive | alive[None]),
                                  (rho - 1.0) /
                                  _b3(1.0 + r_c * r_c), 0.0)

                rest = dict(state)
                rest["primal"] = jnp.zeros_like(state["primal"])

                def bounce(b, s):
                    rays = s.pop("rays", None)
                    s2 = self._bounce(scene, s, b, seed, sample_idx,
                                      pixel_id, N, eps, occl4, trace4,
                                      False, with_offsets=False)
                    if rays is not None:
                        s2["rays"] = rays + common.drain_tally(self)
                    return s2

                if self.ray_tally is not None:
                    rest["rays"] = common.drain_tally(self)
                rest = jax.lax.fori_loop(2, self.n_bounces, bounce, rest)
                if self.ray_tally is not None:
                    self.ray_tally.append(rest.pop("rays"))
                state["primal"] = state["primal"] + rest["primal"]
                state["grad"] = state["grad"] + coeff * rest["primal"][None]
        return pos_film, state["primal"], very, state["grad"]

    # ------------------------------------------------------------------
    def _bounce(self, scene, s, b, seed, sample_idx, pixel_id, N, eps,
                occl4, trace4, allow_conn0=True, fp_main=None,
                fp_off=None, with_offsets=True):
        """One lockstep bounce.  with_offsets=False runs the plain-PT
        subset only (main NEE + main BSDF segment, offset state passed
        through untouched) — the suffix-factorization fast path of
        trace_pass uses it for the post-connection bounces."""
        st = self.settings
        depth = b + 1
        its = s["its"]
        alive = s["alive"] & its.valid
        wi_w = -s["d"]
        tp = s["tp"]
        primal = s["primal"]
        grad = s["grad"]

        o_its, o_wi = s["o_its"], s["o_wi"]
        o_tp, o_r, o_conn = s["o_tp"], s["o_r"], s["o_conn"]
        o_alive = s["o_alive"] & alive[None]

        # frames & params: main
        ss_m, ts_m = self._frame(its)
        wi_m = m.to_local(wi_w, ss_m, ts_m, its.ns)
        par_m = common.material_params(scene, self.has_textures,
                                       its.bsdf_id, its.uv,
                                       uv_footprint=fp_main,
                                       bary=its.bary)
        c_main = self._classify_diffuse(scene, its.bsdf_id, its.valid)

        if with_offsets:
            # frames & params: offsets (own vertices; only used conn==0)
            ss_o, ts_o = m.build_frame(o_its.ns)
            wi_o_loc = m.to_local(o_wi, ss_o, ts_o, o_its.ns)
            par_o = common.material_params(scene, self.has_textures,
                                           o_its.bsdf_id, o_its.uv,
                                           uv_footprint=fp_off,
                                           bary=o_its.bary)
            c_off = self._classify_diffuse(scene, o_its.bsdf_id,
                                           o_its.valid)
            # wi of offsets expressed in MAIN frame (conn>=1 states)
            wi_o_main = m.to_local(o_wi, ss_m[None], ts_m[None],
                                   its.ns[None])

        not_last = jnp.bool_(True)
        ext_alive = alive
        if st.max_depth > 0:
            ext_alive = alive & (depth < st.max_depth)

        # ================= NEE (light-sampling strategy) ==================
        u_sel = self._u1(seed, pixel_id, sample_idx,
                              DA.bounce_dim(b, DA.D_LIGHT_SELECT))
        u_pos = self._u2(seed, pixel_id, sample_idx,
                           DA.bounce_dim(b, DA.D_LIGHT_UV))
        ds = em_ops.sample_direct(scene, self.n_area, self.env_kind,
                                  its.p, u_sel, u_pos,
                                  n_delta=self.n_delta)
        if self.n_area + self.n_delta + (1 if self.has_env else 0) > 0:
            # unified-measure quantities (area for surface, sa for env,
            # discrete for point/spot/directional)
            conv_m = jnp.where(ds.is_env | ds.is_delta, 1.0,
                               jnp.maximum(-m.dot(ds.d, ds.n), 0.0) /
                               jnp.maximum(ds.dist ** 2, 1e-12))
            pe_u = jnp.where(ds.is_env, ds.pdf, ds.pdf_area)
            wo_l_m = m.to_local(ds.d, ss_m, ts_m, its.ns)
            f_m = self._beval(par_m, wi_m, wo_l_m)
            pb_m_u = jnp.where(ds.is_delta, 0.0,
                               self._bpdf(par_m, wi_m, wo_l_m) * conv_m)
            sh_o = common.offset_ray_origin(its.p, its.ng, ds.d, eps)
            nee_live_m = ext_alive & ds.valid & (pe_u > 0)
            maxt_m_sh = jnp.where(
                nee_live_m,
                ds.dist - 2 * eps / jnp.maximum(
                    jnp.abs(m.dot(ds.d, ds.n)), 1e-3), -1.0)

            # ---- offsets -------------------------------------------------
            # conn==0: evaluate from own vertex y_k toward the SAME light pt
            if with_offsets and allow_conn0:
                to_l = ds.p[None] - o_its.p
                dist_o = jnp.sqrt(jnp.maximum(m.squared_length(to_l),
                                              1e-12))
                # directional delta lights keep the shared direction
                is_dirlt = ds.is_delta & (ds.dist > 1e6)
                d_o_l = jnp.where(_b3((ds.is_env | is_dirlt)[None]),
                                  jnp.broadcast_to(ds.d[None],
                                                   to_l.shape),
                                  to_l / _b3(dist_o))
                # delta point/spot: radiance carries 1/d^2 per side
                conv_o0 = jnp.where(
                    (ds.is_env | is_dirlt)[None], 1.0,
                    jnp.where(ds.is_delta[None],
                              ds.dist[None] ** 2 /
                              jnp.maximum(dist_o ** 2, 1e-12),
                              jnp.maximum(-m.dot(d_o_l, ds.n[None]),
                                          0.0) /
                              jnp.maximum(dist_o ** 2, 1e-12)))
                wo_l_o0 = m.to_local(d_o_l, ss_o, ts_o, o_its.ns)
                f_o0 = self._beval(par_o, wi_o_loc, wo_l_o0)
                pb_o0_u = jnp.where(
                    ds.is_delta[None], 0.0,
                    self._bpdf(par_o, wi_o_loc, wo_l_o0) * conv_o0)
                sh_oo = common.offset_ray_origin(o_its.p, o_its.ng,
                                                 d_o_l, eps)
                # dead offset lanes (not conn==0, dead, or main NEE
                # invalid) masked with maxt=-1: the cluster kernel skips
                # them and the measured ray counter stays honest
                nee_live_o = (o_alive & (o_conn == CONN_NONE) &
                              nee_live_m[None])
                maxt_o_sh = jnp.where(
                    nee_live_o,
                    jnp.where(ds.is_env[None],
                              jnp.broadcast_to(ds.dist[None],
                                               dist_o.shape),
                              dist_o) - 2 * eps / jnp.maximum(
                        jnp.abs(m.dot(d_o_l, ds.n[None])), 1e-3),
                    -1.0)
                # FUSED shadow batch: main + 4 offset NEE rays in ONE
                # traversal dispatch (5N lanes) — the per-dispatch fixed
                # cost dominated the 6-dispatch bounce loop (round-3 perf
                # pass; VERDICT r2 next-item #1)
                occ5 = self.occluded(
                    jnp.concatenate([sh_o[None], sh_oo]).reshape(
                        5 * N, 3),
                    jnp.concatenate([ds.d[None], d_o_l]).reshape(
                        5 * N, 3),
                    jnp.zeros(5 * N),
                    jnp.concatenate([maxt_m_sh[None],
                                     maxt_o_sh]).reshape(5 * N),
                    scene.geom).reshape(5, N)
                occ_m = occ5[0]
                occ_o0 = occ5[1:]
            else:
                occ_m = self.occluded(sh_o, ds.d, jnp.zeros(N),
                                      maxt_m_sh, scene.geom)
            vis_m = nee_live_m & ~occ_m
            c_m_val = (tp * f_m * ds.radiance *
                       _b3(conv_m / jnp.maximum(pe_u, 1e-30)))
            contrib_m = jnp.where(_b3(vis_m), c_m_val, 0.0)
            # primal: standard light-vs-bsdf MIS
            w_std = mis_weight(pe_u, pb_m_u)
            primal = primal + contrib_m * _b3(w_std)

            if not (with_offsets and allow_conn0):
                f_o0 = jnp.zeros_like(o_tp)
                pb_o0_u = jnp.zeros_like(o_r)
                conv_o0 = jnp.zeros_like(o_r)
                occ_o0 = jnp.ones_like(o_alive)
            if with_offsets:
                # conn==1: same vertex as main, different wi (material
                # params broadcast [N,...] against [4,N,...])
                f_o1 = self._beval(par_m, wi_o_main, wo_l_m[None])
                pb_o1_u = jnp.where(ds.is_delta[None], 0.0,
                                    self._bpdf(par_m, wi_o_main,
                                               wo_l_m[None]) * conv_m[None])

                is0 = (o_conn == CONN_NONE)
                is1 = (o_conn == CONN_RECENT)
                f_o = jnp.where(_b3(is0), f_o0,
                                jnp.where(_b3(is1), f_o1, f_m[None]))
                pb_o_u = jnp.where(is0, pb_o0_u,
                                   jnp.where(is1, pb_o1_u, pb_m_u[None]))
                conv_o = jnp.where(is0, conv_o0, conv_m[None])
                vis_o = jnp.where(is0, ~occ_o0, ~occ_m[None])
                ok_o = (o_alive & vis_o & vis_m[None])
                c_o_val = (o_tp * f_o * ds.radiance[None] *
                           _b3(conv_o / jnp.maximum(pe_u, 1e-30)[None]))
                contrib_o = jnp.where(_b3(ok_o), c_o_val, 0.0)
                r_eff = jnp.where(ok_o, o_r, 0.0)

                pe2 = (pe_u * pe_u)[None]
                den = (pe2 + (pb_m_u * pb_m_u)[None] +
                       r_eff * r_eff * (pe2 + pb_o_u * pb_o_u))
                w_pair = jnp.where(vis_m[None] | ok_o,
                                   pe2 / jnp.maximum(den, 1e-30), 0.0)
                grad = grad + w_pair[..., None] * (contrib_o -
                                                   contrib_m[None])

        # ================= BSDF-sampling strategy =========================
        u2 = self._u2(seed, pixel_id, sample_idx,
                        DA.bounce_dim(b, DA.D_BSDF_UV))
        uc = self._u1(seed, pixel_id, sample_idx,
                           DA.bounce_dim(b, DA.D_BSDF_COMPONENT))
        bs = self._bsample(par_m, wi_m, u2, uc)
        main_cont = ext_alive & bs.valid
        wo_w = m.to_world(bs.wo, ss_m, ts_m, its.ns)
        o_new = common.offset_ray_origin(its.p, its.ng, wo_w, eps)
        tp_new = jnp.where(_b3(main_cont), tp * bs.weight, 0.0)
        pb_m_sa = bs.pdf

        hit_n = self.closest(o_new, wo_w, jnp.zeros(N),
                             jnp.where(main_cont, 3e38, -1.0),
                             scene.geom)
        its_n = common.fill_intersection(scene, o_new, wo_w, hit_n)

        # geometry of the new segment (main)
        cos_n_m = jnp.abs(m.dot(its_n.ng, wo_w))
        dist2_m = jnp.maximum(its_n.t ** 2, 1e-12)
        conv_m_seg = jnp.where(its_n.valid, cos_n_m / dist2_m, 1.0)
        pb_m_u = jnp.where(bs.is_delta, 0.0, pb_m_sa) * conv_m_seg

        # emission seen by the main path at the new vertex
        cosf_n = m.dot(its_n.ns, -wo_w)
        hit_em = its_n.valid & (its_n.emitter_id >= 0) & (cosf_n > 0)
        if self.aux_only:  # area-emitter hits belong to the (s,t) family
            hit_em = jnp.zeros_like(hit_em)
        rad_n = common.fast_row_gather(scene.emitters.radiance,
                                       jnp.maximum(its_n.emitter_id, 0))
        n_tot = self.n_area + self.n_delta + (1 if self.has_env else 0)
        pe_area_n = jnp.where(
            hit_em,
            1.0 / (jnp.maximum(
                scene.emitters.total_area[
                    jnp.maximum(scene.geom.shape_emitter[
                        jnp.maximum(its_n.shape_id, 0)], 0)], 1e-12)
                * max(n_tot, 1)), 0.0)
        esc = main_cont & ~its_n.valid
        if self.has_env:
            env_rad = em_ops.eval_env(scene, self.env_kind, wo_w)
            pe_env = em_ops.pdf_env_direct(scene, self.n_area,
                                           self.env_kind, wo_w,
                                           n_delta=self.n_delta)
        else:
            env_rad = jnp.zeros((N, 3))
            pe_env = jnp.zeros(N)

        emit_m = jnp.where(_b3(hit_em), rad_n, 0.0) + \
            jnp.where(_b3(esc), env_rad, 0.0)
        pe_u_n = jnp.where(esc, pe_env, pe_area_n)
        pb_for_mis = jnp.where(esc, jnp.where(bs.is_delta, 0.0, pb_m_sa),
                               pb_m_u)
        has_emit_m = main_cont & (hit_em | esc)
        contrib_m_b = jnp.where(_b3(has_emit_m), tp_new * emit_m, 0.0)
        w_std_b = jnp.where(bs.is_delta, 1.0,
                            mis_weight(pb_for_mis, pe_u_n))
        primal = primal + contrib_m_b * _b3(w_std_b)

        # ----------------- offset shift handling --------------------------
        if with_offsets:
            new = self._shift_offsets(
                scene, N, eps, occl4, trace4,
                its, wi_m, par_m, ss_m, ts_m, c_main, bs, wo_w, its_n,
                conv_m_seg, pb_m_sa, o_its, o_wi, wi_o_loc, wi_o_main,
                par_o, ss_o, ts_o, c_off, o_tp, o_r, o_conn, o_alive,
                main_cont, esc, uc, allow_conn0)
            (o_its2, o_wi2, o_tp2, o_r2, o_conn2, o_alive2,
             off_emit, off_pb_u, off_pe_u) = new

            # pair MIS for the emission at the new vertex
            has_pair = has_emit_m | (o_alive2 &
                                     (m.squared_length(off_emit) > 0))
            r_eff_b = jnp.where(o_alive2, o_r2, 0.0)
            num_b = jnp.where(bs.is_delta[None],
                              jnp.ones_like(off_pb_u),
                              (pb_for_mis * pb_for_mis)[None])
            den_b = jnp.where(
                bs.is_delta[None],
                1.0 + r_eff_b * r_eff_b,
                (pb_for_mis * pb_for_mis + pe_u_n * pe_u_n)[None] +
                r_eff_b * r_eff_b * (off_pb_u * off_pb_u +
                                     off_pe_u * off_pe_u))
            w_pair_b = jnp.where(has_pair,
                                 num_b / jnp.maximum(den_b, 1e-30), 0.0)
            contrib_o_b = jnp.where(_b3(o_alive2), o_tp2 * off_emit, 0.0)
            grad = grad + w_pair_b[..., None] * (contrib_o_b -
                                                 contrib_m_b[None])

        # ----------------- russian roulette (shared decision) -------------
        u_rr = self._u1(seed, pixel_id, sample_idx,
                             DA.bounce_dim(b, DA.D_RR))
        eta_new = jnp.where(main_cont, s["eta"] * bs.eta, s["eta"])
        q = jnp.minimum(jnp.max(tp_new, -1) * eta_new * eta_new, 0.95)
        do_rr = (depth + 1) >= st.rr_depth
        survive = jnp.where(do_rr, u_rr < q, True)
        inv_q = jnp.where(do_rr, 1.0 / jnp.maximum(q, 1e-9), 1.0)
        tp_new = tp_new * _b3(inv_q)
        alive_next = main_cont & its_n.valid & survive & \
            (jnp.max(tp_new, -1) > 0)

        if not with_offsets:
            # plain-PT bounce: offset state frozen (the caller applies
            # the factorized gradient once at the end)
            return dict(
                d=wo_w, its=its_n, tp=tp_new, eta=eta_new,
                alive=alive_next, primal=primal,
                o_its=o_its, o_wi=o_wi, o_tp=o_tp, o_r=o_r,
                o_conn=o_conn, o_alive=s["o_alive"], grad=grad)

        o_tp2 = o_tp2 * inv_q[None, :, None]
        return dict(
            d=wo_w, its=its_n, tp=tp_new, eta=eta_new, alive=alive_next,
            primal=primal,
            o_its=o_its2, o_wi=o_wi2, o_tp=o_tp2, o_r=o_r2,
            o_conn=o_conn2, o_alive=o_alive2 & alive_next[None],
            grad=grad)

    # ------------------------------------------------------------------
    def _shift_offsets(self, scene, N, eps, occl4, trace4,
                       its, wi_m, par_m, ss_m, ts_m, c_main, bs, wo_w,
                       its_n, conv_m_seg, pb_m_sa, o_its, o_wi, wi_o_loc,
                       wi_o_main, par_o, ss_o, ts_o, c_off, o_tp, o_r,
                       o_conn, o_alive, main_cont, esc, uc,
                       allow_conn0=True):
        """Advance the 4 offset paths across the base path's BSDF segment.

        Returns updated offset state + the per-offset emission/pdfs at the
        new vertex for the pair MIS (off_emit includes the offset path's own
        emitted radiance; off_pb_u/off_pe_u are its technique densities in
        the unified measure).
        """
        st = self.settings
        is0 = o_conn == CONN_NONE
        is1 = o_conn == CONN_RECENT
        is2 = o_conn == CONN_DONE

        c_next = self._classify_diffuse(scene, its_n.bsdf_id, its_n.valid)

        # ========== connected (suffix shared): same multiplicative factors
        f_w_conn = bs.weight[None]          # f*cos/pdf of the base sample
        pb_conn = jnp.where(bs.is_delta, 1.0, pb_m_sa)[None]

        # ========== recently connected: same vertex, own wi ==============
        f_o1 = self._beval(par_m, wi_o_main, bs.wo[None])
        pb_o1 = self._bpdf(par_m, wi_o_main, bs.wo[None])
        # delta base sample from a RECENT state: the offset's incoming
        # direction differs, so a delta lobe cannot produce the same wo ->
        # shift dies (measure-zero event; matches halfVectorShift failure)
        ok1 = ~bs.is_delta[None] & (jnp.max(jnp.abs(f_o1), -1) >= 0)

        # ========== not connected: reconnection / env / half-vector ======
        recon_sel = c_main[None] & c_off & (c_next[None] | esc[None])

        if allow_conn0:
            # --- reconnection to base's next vertex ----------------------
            to_n = its_n.p[None] - o_its.p
            dist_o2 = jnp.maximum(m.squared_length(to_n), 1e-12)
            dist_o = jnp.sqrt(dist_o2)
            dir_rc = to_n / _b3(dist_o)
            cos_n_o = jnp.abs(m.dot(its_n.ng[None], dir_rc))
            conv_o_seg = cos_n_o / dist_o2
            jac_rc = conv_o_seg / jnp.maximum(conv_m_seg[None], 1e-30)
            wo_rc = m.to_local(dir_rc, ss_o, ts_o, o_its.ns)
            f_rc = self._beval(par_o, wi_o_loc, wo_rc)
            pb_rc = self._bpdf(par_o, wi_o_loc, wo_rc)

            # --- environment shift (base escaped): BSDF eval only --------
            wo_env = m.to_local(jnp.broadcast_to(wo_w[None], o_wi.shape),
                                ss_o, ts_o, o_its.ns)
            f_env = self._beval(par_o, wi_o_loc, wo_env)
            pb_env = self._bpdf(par_o, wi_o_loc, wo_env)

            # FUSED reconnection/environment visibility: the two shifts
            # are mutually exclusive per lane (esc selects), so ONE 4N
            # traversal dispatch serves both (round-3 perf pass).  Lanes
            # that cannot use either shift — dead, already connected,
            # non-reconnectable, or env-escaped in an env-less scene —
            # are masked with maxt=-1 (kernel early-exit + honest
            # measured ray counts).
            dir_sh = jnp.where(_b3(esc[None]),
                               jnp.broadcast_to(wo_w[None], o_wi.shape),
                               dir_rc)
            sh_all = common.offset_ray_origin(o_its.p, o_its.ng, dir_sh,
                                              eps)
            live_sh = (o_alive & is0 & recon_sel &
                       jnp.where(esc[None],
                                 jnp.full((4, N), self.has_env),
                                 its_n.valid[None]))
            maxt_sh = jnp.where(
                live_sh,
                jnp.where(esc[None], jnp.full((4, N), 1e7),
                          dist_o - 2 * eps / jnp.maximum(cos_n_o, 1e-3)),
                -1.0)
            occ_sh = occl4(sh_all, dir_sh, maxt_sh)
            ok_rc = (recon_sel & its_n.valid[None] & ~occ_sh &
                     (jnp.max(f_rc, -1) > 0))
            ok_env = (recon_sel & esc[None] & ~occ_sh & live_sh &
                      (jnp.max(f_env, -1) > 0))
        else:
            # no NOT-CONNECTED offsets can exist past bounce 0 in
            # all-diffuse scenes: the whole branch compiles away
            dir_rc = jnp.broadcast_to(wo_w[None], o_wi.shape)
            conv_o_seg = jnp.broadcast_to(conv_m_seg[None],
                                          o_r.shape)
            jac_rc = jnp.ones_like(o_r)
            f_rc = jnp.zeros_like(o_tp)
            pb_rc = jnp.zeros_like(o_r)
            ok_rc = jnp.zeros_like(o_alive)
            f_env = jnp.zeros_like(o_tp)
            pb_env = jnp.zeros_like(o_r)
            ok_env = jnp.zeros_like(o_alive)

        # --- half-vector copy --------------------------------------------
        if self.any_specular and allow_conn0:
            hv = self._half_vector_shift(scene, its, wi_m, par_m, bs,
                                         par_o, wi_o_loc, o_its, uc)
            wo_hv_w = m.to_world(hv["wo"], ss_o, ts_o, o_its.ns)
            ok_hv = ~recon_sel & hv["valid"] & main_cont[None]
            # trace the offset's own continuation ray for HV shifts
            o_hv = common.offset_ray_origin(o_its.p, o_its.ng, wo_hv_w,
                                            eps)
            its_hv = trace4(o_hv, wo_hv_w,
                            jnp.where(ok_hv, 3e38, -1.0))
        else:
            # all-diffuse scene: a non-reconnectable configuration kills
            # the shift (same unbiased failure semantics, zero extra rays)
            hv = dict(wo=wi_o_loc, f=jnp.zeros_like(o_tp),
                      pdf=jnp.zeros_like(o_r), jac=jnp.ones_like(o_r),
                      valid=jnp.zeros_like(o_alive),
                      is_delta=jnp.zeros_like(o_alive))
            wo_hv_w = o_wi
            ok_hv = jnp.zeros_like(o_alive)
            its_hv = o_its

        # ---------------- merge the conn==0 strategies -------------------
        use_rc = is0 & recon_sel & ~esc[None]
        use_env = is0 & recon_sel & esc[None]
        use_hv = is0 & ~recon_sel

        pb_base = jnp.where(bs.is_delta, 1.0, pb_m_sa)[None]
        # throughput factor f_offset*J / pdf_base   (unified measure folds
        # into jac_rc for reconnection; env/hv jacobians explicit)
        fac0 = jnp.where(
            _b3(use_rc), f_rc * _b3(jac_rc),
            jnp.where(_b3(use_env), f_env,
                      hv["f"] * _b3(hv["jac"]))) / _b3(
            jnp.maximum(pb_base, 1e-30))
        ok0 = jnp.where(use_rc, ok_rc,
                        jnp.where(use_env, ok_env, ok_hv))
        # pdf ratio factor for this segment
        r_fac0 = jnp.where(
            use_rc, pb_rc * jac_rc,
            jnp.where(use_env, pb_env,
                      hv["pdf"] * hv["jac"])) / jnp.maximum(pb_base, 1e-30)

        # ---------------- combine across connection states ---------------
        fac = jnp.where(_b3(is2), f_w_conn,
                        jnp.where(_b3(is1),
                                  f_o1 / _b3(jnp.maximum(pb_conn, 1e-30)),
                                  fac0))
        r_fac = jnp.where(is2, 1.0,
                          jnp.where(is1,
                                    pb_o1 / jnp.maximum(pb_conn, 1e-30),
                                    r_fac0))
        ok = jnp.where(is2, main_cont[None],
                       jnp.where(is1, ok1 & main_cont[None], ok0))
        o_alive2 = o_alive & ok
        o_tp2 = jnp.where(_b3(o_alive2), o_tp * fac, 0.0)
        o_r2 = jnp.where(o_alive2, o_r * r_fac, 0.0)

        # ---------------- offset emission at the new vertex --------------
        # connected / recently / reconnection / env: the offset path arrives
        # at the SAME vertex as base (its_n) or the same environment
        arr_same = is2 | is1 | use_rc | use_env
        dir_in = jnp.where(_b3(use_rc), dir_rc,
                           jnp.broadcast_to(wo_w[None], o_wi.shape))
        cosf_o = m.dot(its_n.ns[None], -dir_in)
        hit_em_o = (its_n.valid[None] & (its_n.emitter_id[None] >= 0) &
                    (cosf_o > 0))
        if self.aux_only:
            hit_em_o = jnp.zeros_like(hit_em_o)
        rad_np = common.fast_row_gather(scene.emitters.radiance,
                                        jnp.maximum(its_n.emitter_id, 0))
        if self.has_env:
            env_rad_m = em_ops.eval_env(scene, self.env_kind, wo_w)
            pe_env_m = em_ops.pdf_env_direct(scene, self.n_area,
                                             self.env_kind, wo_w,
                                             n_delta=self.n_delta)
        else:
            env_rad_m = jnp.zeros((N, 3))
            pe_env_m = jnp.zeros(N)
        n_tot = self.n_area + self.n_delta + (1 if self.has_env else 0)
        pe_area_n = jnp.where(
            its_n.valid & (its_n.emitter_id >= 0),
            1.0 / (jnp.maximum(
                scene.emitters.total_area[
                    jnp.maximum(its_n.emitter_id, 0)], 1e-12)
                * max(n_tot, 1)), 0.0)

        emit_same = (jnp.where(_b3(hit_em_o), rad_np[None], 0.0) +
                     jnp.where(_b3(esc[None]), env_rad_m[None], 0.0))
        pe_same = jnp.where(esc[None], pe_env_m[None], pe_area_n[None])

        # HV: offset has its OWN new vertex its_hv (or its own env escape)
        cosf_hv = m.dot(its_hv.ns, -wo_hv_w)
        hit_em_hv = (its_hv.valid & (its_hv.emitter_id >= 0) &
                     (cosf_hv > 0))
        if self.aux_only:
            hit_em_hv = jnp.zeros_like(hit_em_hv)
        rad_hv = common.fast_row_gather(scene.emitters.radiance,
                                        jnp.maximum(its_hv.emitter_id, 0))
        if self.has_env:
            env_rad_hv = em_ops.eval_env(
                scene, self.env_kind,
                wo_hv_w.reshape(4 * N, 3)).reshape(4, N, 3)
            pe_env_hv = em_ops.pdf_env_direct(
                scene, self.n_area, self.env_kind,
                wo_hv_w.reshape(4 * N, 3),
                n_delta=self.n_delta).reshape(4, N)
        else:
            env_rad_hv = jnp.zeros((4, N, 3))
            pe_env_hv = jnp.zeros((4, N))
        esc_hv = ok_hv & ~its_hv.valid
        pe_area_hv = jnp.where(
            its_hv.valid & (its_hv.emitter_id >= 0),
            1.0 / (jnp.maximum(
                scene.emitters.total_area[
                    jnp.maximum(its_hv.emitter_id, 0)], 1e-12)
                * max(n_tot, 1)), 0.0)
        emit_hv = (jnp.where(_b3(hit_em_hv), rad_hv, 0.0) +
                   jnp.where(_b3(esc_hv), env_rad_hv, 0.0))
        pe_hv = jnp.where(esc_hv, pe_env_hv, pe_area_hv)

        off_emit = jnp.where(_b3(use_hv), emit_hv, emit_same)
        off_pe_u = jnp.where(use_hv, pe_hv, pe_same)
        # offset bsdf technique density in the unified measure
        conv_hv = jnp.where(
            its_hv.valid,
            jnp.abs(m.dot(its_hv.ng, wo_hv_w)) /
            jnp.maximum(its_hv.t ** 2, 1e-12), 1.0)
        pb_hv_u = jnp.where(hv["is_delta"], 0.0, hv["pdf"]) * conv_hv
        pb_rc_u = pb_rc * conv_o_seg
        pb_o1_u = pb_o1 * conv_m_seg[None]
        pb_conn_u = jnp.where(bs.is_delta, 0.0, pb_m_sa)[None] * \
            conv_m_seg[None]
        off_pb_u = jnp.where(is2, pb_conn_u,
                             jnp.where(is1, pb_o1_u,
                                       jnp.where(use_rc, pb_rc_u,
                                                 jnp.where(use_env, pb_env,
                                                           pb_hv_u))))

        # ---------------- next-state bookkeeping -------------------------
        o_conn2 = jnp.where(is2 | is1, CONN_DONE,
                            jnp.where(use_rc | use_env, CONN_RECENT,
                                      CONN_NONE))
        o_conn2 = jnp.where(o_alive2, o_conn2, o_conn)
        # HV keeps its own vertex; others inherit base's next vertex frame
        o_wi2 = jnp.where(_b3(use_hv & o_alive2), -wo_hv_w,
                          jnp.where(_b3(use_rc & o_alive2), -dir_rc,
                                    -wo_w[None]))
        its_b = jax.tree.map(lambda a: jnp.broadcast_to(
            a[None], (4,) + a.shape), its_n)
        o_its2 = jax.tree.map(
            lambda hv_a, b_a: jnp.where(
                jnp.reshape(use_hv, use_hv.shape + (1,) * (hv_a.ndim - 2)),
                hv_a, b_a), its_hv, its_b)
        # HV offsets die when their own ray escapes (contribution recorded)
        o_alive2 = o_alive2 & jnp.where(use_hv, its_hv.valid, True)

        return (o_its2, o_wi2, o_tp2, o_r2, o_conn2, o_alive2,
                off_emit, off_pb_u, off_pe_u)

    # ------------------------------------------------------------------
    def _half_vector_shift(self, scene, its, wi_m, par_m, bs, par_o,
                           wi_o_loc, o_its, uc):
        """Half-vector copy for the 4 lockstep offsets: broadcast the base
        quantities to the [4, N] offset batch and defer to the shared
        half_vector_copy (gpt.cpp halfVectorShift semantics)."""
        b4 = lambda a: jnp.broadcast_to(a[None], (4,) + a.shape)
        par_m4 = jax.tree.map(b4, par_m)
        return half_vector_copy(self._beval, self._bpdf, b4(wi_m),
                                b4(bs.wo), par_m4, b4(bs.is_delta),
                                wi_o_loc, par_o)

    # ------------------------------------------------------------------
    def samples_per_batch(self, n_samples):
        """Lanes per dispatch (each lane carries 5 lockstep paths).
        Default 256k lanes: the per-op latency floor dominates below
        ~200k lanes (measured on v5e: 64k-lane passes reach <2% of HBM
        speed-of-light), while HBM working-set stays <1 GB well past 1M
        lanes.  Override with GDMT_LANES (target lanes per dispatch)."""
        import os
        target = int(os.environ.get("GDMT_LANES", str(1 << 18)))
        N = self.settings.width * self.settings.height
        spb = max(1, target // max(N, 1))
        while n_samples % spb:
            spb -= 1
        return spb

    @functools.partial(jax.jit, static_argnums=(0, 4))
    def render_chunk(self, scene, seed, sample_start, n_samples):
        st = self.settings
        H, W = st.height, st.width
        N = W * H
        spb = self.samples_per_batch(n_samples)
        ids = jnp.tile(jnp.arange(N, dtype=jnp.uint32), spb)
        zero = lambda: jnp.zeros((H, W, 3))
        bufs = dict(primal=zero(), dx=zero(), dy=zero(),
                    very_direct=zero(), wsum=jnp.zeros((H, W)))
        if self.count_rays:
            bufs["rays"] = jnp.zeros(())

        def body(i, bufs):
            if self.count_rays:
                self.ray_tally = []
            sidx = (sample_start + i * spb +
                    jnp.repeat(jnp.arange(spb, dtype=jnp.uint32), N))
            pos, primal, very, grad = self.trace_pass(
                scene, seed, sidx, pixel_id=ids)
            rays_acc = None
            if self.count_rays:
                rays_acc = bufs["rays"] + sum(self.ray_tally)
                self.ray_tally = None
            # grid-aligned: dense filtered adds, no scatter
            jit = (pos % 1.0).reshape(spb, N, 2)
            fb, wb = film_ops.splat_grid(bufs["primal"], bufs["wsum"],
                                         jit, primal.reshape(spb, N, 3),
                                         self.filter_kind)
            vd, _ = film_ops.splat_grid(bufs["very_direct"],
                                        jnp.zeros_like(wb), jit,
                                        very.reshape(spb, N, 3),
                                        self.filter_kind)
            # gradients: lattice adds at fixed integer offsets
            g4 = grad.reshape(4, spb, N, 3)
            dx = film_ops.add_grid_shifted(bufs["dx"], g4[0], 0, 0)
            dx = film_ops.add_grid_shifted(dx, -g4[1], -1, 0)
            dy = film_ops.add_grid_shifted(bufs["dy"], g4[2], 0, 0)
            dy = film_ops.add_grid_shifted(dy, -g4[3], 0, -1)
            out = dict(primal=fb, dx=dx, dy=dy, very_direct=vd, wsum=wb)
            if rays_acc is not None:
                out["rays"] = rays_acc
            return out

        return jax.lax.fori_loop(0, n_samples // spb, body, bufs)

    def finalize(self, state, spp):
        if self.count_rays and "rays" in state:
            self.last_ray_count = float(np.asarray(state["rays"]))
        state = {k: v for k, v in state.items() if k != "rays"}
        w = np.maximum(state["wsum"], 1e-12)[..., None]
        return {
            "primal": state["primal"] / w,
            "very_direct": state["very_direct"] / w,
            # gradients are per-sample averages on the pixel lattice;
            # each pixel receives `spp` base samples per involved pair
            "dx": state["dx"] / spp,
            "dy": state["dy"] / spp,
        }

    def render(self, scene, seed=0, spp=None, chunk=64,
               checkpoint_path=None, resume=False, progress=None):
        """Returns dict of numpy buffers: primal, dx, dy, very_direct
        (all sample-normalized)."""
        from ..parallel.checkpoint import render_accumulate
        spp = spp or self.settings.spp
        state, spp = render_accumulate(
            self, scene, seed, spp, chunk,
            checkpoint_path=checkpoint_path, resume=resume,
            progress=progress)
        return self.finalize(state, spp)

    @functools.partial(jax.jit, static_argnums=(0, 3, 5, 6, 7, 8))
    def render_final(self, scene, seed, spp, alpha=0.2, mode="L1",
                     l2_iters=100, l1_outer=8, l1_inner=40):
        """Render + finalize + screened-Poisson reconstruction as ONE
        device program (each dispatch costs ~0.4 s through the remote
        tunnel; the host round trip of render() -> reconstruct() is pure
        overhead when no checkpointing is requested).  Returns
        (final image, buffers dict)."""
        from . import poisson
        state = self.render_chunk(scene, seed, 0, spp)
        w = jnp.maximum(state["wsum"], 1e-12)[..., None]
        bufs = {
            "primal": state["primal"] / w,
            "very_direct": state["very_direct"] / w,
            "dx": state["dx"] / spp,
            "dy": state["dy"] / spp,
        }
        if "rays" in state:  # measured device-side counter (count_rays)
            bufs["rays"] = state["rays"]
        if mode.upper() == "L2":
            rec = poisson.solve_l2(bufs["primal"], bufs["dx"], bufs["dy"],
                                   alpha=alpha, iters=l2_iters)
        else:
            rec = poisson.solve_l1(bufs["primal"], bufs["dx"], bufs["dy"],
                                   alpha=alpha, outer_iters=l1_outer,
                                   inner_iters=l1_inner)
        return rec + bufs["very_direct"], bufs
