"""Ray-scene intersection kernels.

TPU-native replacement for Mitsuba's kd-tree traversal + Wald TriAccel hot
path (src/librender/skdtree.cpp, include/mitsuba/render/triaccel.h).  Three
device paths, one contract:

  - intersect_brute / occluded_brute: every ray against every triangle,
    scanned over triangle chunks (exact reference for tests; also the
    fastest path for small scenes where the whole tri soup fits in VMEM
    and the test vectorizes perfectly on the VPU).
  - intersect_bvh / occluded_bvh: per-ray short-stack BVH traversal under
    vmap + lax.while_loop.

Triangles are stored REORDERED by BVH leaf ranges (SoA v0/e1/e2), so leaf
prims are contiguous in HBM.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..scene.bvh import LEAF_BITS, MAX_LEAF

F32_MAX = jnp.float32(3.0e38)


class TriSoup(NamedTuple):
    """Triangle geometry in BVH leaf order."""
    v0: jnp.ndarray       # [T, 3]
    e1: jnp.ndarray       # [T, 3]  (v1 - v0)
    e2: jnp.ndarray       # [T, 3]  (v2 - v0)
    orig_id: jnp.ndarray  # [T] i32 — original (scene) triangle index


class BVHArrays(NamedTuple):
    child0_min: jnp.ndarray  # [N, 3]
    child0_max: jnp.ndarray
    child1_min: jnp.ndarray
    child1_max: jnp.ndarray
    child0: jnp.ndarray      # [N] i32 code (>=0 internal, <0 leaf)
    child1: jnp.ndarray      # [N] i32


class Hit(NamedTuple):
    t: jnp.ndarray        # [R] distance (F32_MAX if miss)
    u: jnp.ndarray        # [R] barycentric
    v: jnp.ndarray        # [R]
    prim: jnp.ndarray     # [R] i32 ORIGINAL triangle id (-1 if miss)
    valid: jnp.ndarray    # [R] bool


def _mt(o, d, v0, e1, e2, mint, maxt):
    """Moeller-Trumbore; o,d [..., 3] broadcast against v0/e1/e2 [..., 3]."""
    pvec = jnp.cross(d, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    tvec = o - v0
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(d * qvec, axis=-1) * inv_det
    t = jnp.sum(e2 * qvec, axis=-1) * inv_det
    hit = ((jnp.abs(det) > 1e-12) & (u >= 0.0) & (v >= 0.0) &
           (u + v <= 1.0) & (t > mint) & (t < maxt))
    return t, u, v, hit


def intersect_brute(o, d, mint, maxt, tris: TriSoup, chunk: int = 2048) -> Hit:
    """Closest hit, all rays x all tris, scanned over tri chunks."""
    T = tris.v0.shape[0]
    pad = (-T) % chunk
    v0 = jnp.pad(tris.v0, ((0, pad), (0, 0)))
    e1 = jnp.pad(tris.e1, ((0, pad), (0, 0)), constant_values=0)
    e2 = jnp.pad(tris.e2, ((0, pad), (0, 0)), constant_values=0)
    oid = jnp.pad(tris.orig_id, (0, pad), constant_values=-1)
    n_chunks = (T + pad) // chunk

    R = o.shape[0]
    # derive the carry from the inputs so its sharding/varying axes match
    # the body outputs under shard_map (and plain vmap/jit alike)
    zf = o[..., 0] * 0.0
    init = (zf + F32_MAX, zf, zf, zf.astype(jnp.int32) - 1)

    def body(carry, ck):
        bt, bu, bv, bp = carry
        cv0, ce1, ce2, cid = ck
        t, u, v, h = _mt(o[:, None, :], d[:, None, :],
                         cv0[None], ce1[None], ce2[None],
                         mint[:, None], jnp.minimum(maxt, bt)[:, None])
        h = h & (cid[None, :] >= 0)
        t = jnp.where(h, t, F32_MAX)
        j = jnp.argmin(t, axis=1)
        tj = jnp.take_along_axis(t, j[:, None], 1)[:, 0]
        better = tj < bt
        ar = jnp.arange(R)
        bu = jnp.where(better, u[ar, j], bu)
        bv = jnp.where(better, v[ar, j], bv)
        bp = jnp.where(better, cid[j], bp)
        bt = jnp.where(better, tj, bt)
        return (bt, bu, bv, bp), None

    chunks = (v0.reshape(n_chunks, chunk, 3), e1.reshape(n_chunks, chunk, 3),
              e2.reshape(n_chunks, chunk, 3), oid.reshape(n_chunks, chunk))
    (bt, bu, bv, bp), _ = jax.lax.scan(body, init, chunks)
    return Hit(t=bt, u=bu, v=bv, prim=bp, valid=bp >= 0)


def occluded_brute(o, d, mint, maxt, tris: TriSoup, chunk: int = 2048):
    hit = intersect_brute(o, d, mint, maxt, tris, chunk)
    return hit.valid


def _decode_leaf(code):
    raw = -code - 1
    return raw >> LEAF_BITS, raw & ((1 << LEAF_BITS) - 1)


def _slab(o, inv_d, mint, maxt, bmin, bmax):
    t0 = (bmin - o) * inv_d
    t1 = (bmax - o) * inv_d
    tn = jnp.max(jnp.minimum(t0, t1))
    tf = jnp.min(jnp.maximum(t0, t1))
    return (tn <= tf) & (tf >= mint) & (tn <= maxt), tn


def make_bvh_intersector(stack_depth: int):
    """Returns jittable (o, d, mint, maxt, tris, bvh) -> Hit closest-hit fn.

    stack_depth must be >= 2 * bvh.depth + 2 (static per scene).
    """

    def one_ray(o, d, mint, maxt, tris: TriSoup, bvh: BVHArrays):
        inv_d = jnp.where(jnp.abs(d) > 1e-12, 1.0 / d, 1e30)
        zf = o[0] * 0.0
        zi = zf.astype(jnp.int32)
        stack = jnp.zeros(stack_depth, jnp.int32) + zi
        # state: (sp, stack, t, u, v, prim)
        state = (zi + 1, stack, maxt, zf, zf, zi - 1)

        def leaf_prims(code, st):
            t_best, u_best, v_best, p_best = st
            offset, count = _decode_leaf(code)

            def pbody(j, s):
                tb, ub, vb, pb = s
                idx = offset + j
                t, u, v, h = _mt(o, d, tris.v0[idx], tris.e1[idx],
                                 tris.e2[idx], mint, tb)
                h = h & (j < count)
                return (jnp.where(h, t, tb), jnp.where(h, u, ub),
                        jnp.where(h, v, vb),
                        jnp.where(h, tris.orig_id[idx], pb))

            return jax.lax.fori_loop(0, MAX_LEAF, pbody,
                                     (t_best, u_best, v_best, p_best))

        def body(s):
            sp, stk, t_best, u_b, v_b, p_b = s
            sp = sp - 1
            code = stk[sp]

            def internal(args):
                sp, stk, tb, ub, vb, pb = args
                node = code
                h0, tn0 = _slab(o, inv_d, mint, tb,
                                bvh.child0_min[node], bvh.child0_max[node])
                h1, tn1 = _slab(o, inv_d, mint, tb,
                                bvh.child1_min[node], bvh.child1_max[node])
                c0 = bvh.child0[node]
                c1 = bvh.child1[node]
                # push far child first so near child pops first
                near_first = tn0 <= tn1
                first = jnp.where(near_first, c0, c1)
                second = jnp.where(near_first, c1, c0)
                hf = jnp.where(near_first, h0, h1)
                hs = jnp.where(near_first, h1, h0)
                stk = stk.at[sp].set(second)
                sp = sp + hs.astype(jnp.int32)
                stk = stk.at[sp].set(first)
                sp = sp + hf.astype(jnp.int32)
                return sp, stk, tb, ub, vb, pb

            def leaf(args):
                sp, stk, tb, ub, vb, pb = args
                tb, ub, vb, pb = leaf_prims(code, (tb, ub, vb, pb))
                return sp, stk, tb, ub, vb, pb

            return jax.lax.cond(code >= 0, internal, leaf,
                                (sp, stk, t_best, u_b, v_b, p_b))

        def cond(s):
            return s[0] > 0

        sp, stk, t, u, v, p = jax.lax.while_loop(cond, body, state)
        return Hit(t=jnp.where(p >= 0, t, F32_MAX), u=u, v=v, prim=p,
                   valid=p >= 0)

    def intersect(o, d, mint, maxt, tris, bvh):
        return jax.vmap(one_ray, in_axes=(0, 0, 0, 0, None, None))(
            o, d, mint, maxt, tris, bvh)

    return intersect


def make_bvh_occluder(stack_depth: int):
    """Any-hit variant with early exit (shadow rays)."""

    def one_ray(o, d, mint, maxt, tris: TriSoup, bvh: BVHArrays):
        inv_d = jnp.where(jnp.abs(d) > 1e-12, 1.0 / d, 1e30)
        zf = o[0] * 0.0
        zi = zf.astype(jnp.int32)
        stack = jnp.zeros(stack_depth, jnp.int32) + zi
        state = (zi + 1, stack, zi > 0)

        def body(s):
            sp, stk, _ = s
            sp = sp - 1
            code = stk[sp]

            def internal(args):
                sp, stk, occ = args
                node = code
                h0, _ = _slab(o, inv_d, mint, maxt,
                              bvh.child0_min[node], bvh.child0_max[node])
                h1, _ = _slab(o, inv_d, mint, maxt,
                              bvh.child1_min[node], bvh.child1_max[node])
                stk = stk.at[sp].set(bvh.child1[node])
                sp = sp + h1.astype(jnp.int32)
                stk = stk.at[sp].set(bvh.child0[node])
                sp = sp + h0.astype(jnp.int32)
                return sp, stk, occ

            def leaf(args):
                sp, stk, occ = args
                offset, count = _decode_leaf(code)

                def pbody(j, acc):
                    idx = offset + j
                    _, _, _, h = _mt(o, d, tris.v0[idx], tris.e1[idx],
                                     tris.e2[idx], mint, maxt)
                    return acc | (h & (j < count))

                occ = jax.lax.fori_loop(0, MAX_LEAF, pbody, occ)
                return sp, stk, occ

            return jax.lax.cond(code >= 0, internal, leaf, (sp, stk, s[2]))

        def cond(s):
            return (s[0] > 0) & jnp.logical_not(s[2])

        _, _, occ = jax.lax.while_loop(cond, body, state)
        return occ

    def occluded(o, d, mint, maxt, tris, bvh):
        return jax.vmap(one_ray, in_axes=(0, 0, 0, 0, None, None))(
            o, d, mint, maxt, tris, bvh)

    return occluded
