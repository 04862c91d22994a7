"""Pallas TPU ray-traversal kernels (the hot-path native kernels).

TPU-native replacement for Mitsuba's kd-tree traversal + TriAccel
(src/librender/skdtree.cpp, triaccel.h), built on the two-level cluster
decomposition (scene/bvh.py extract_clusters):

  - the film-coherent wavefront is cut into RAY BLOCKS of 1024 rays per
    grid step; all 8 per-ray streams (o.xyz d.xyz mint maxt) ride ONE
    packed [N, 8] array (separate [N, 1] columns pad lanes 1 -> 128 and
    blow the 16 MB scoped-VMEM budget 12x over);
  - per-block cluster WORKLISTS are built OUTSIDE the kernel by XLA
    (the all-pairs ray-vs-cluster AABB test is a dense fused
    [G, RBLK, K] reduce on full VPU tiles; in-kernel it would run on
    [RBLK, 1] columns at 1/128 lane utilization), sorted near-to-far
    by block-min entry distance and DMA'd to SMEM per block;
  - each block walks its worklist in 128-entry chunks: every chunk is
    slab-tested at once on full [RBLK, 128] VPU tiles (a per-entry
    [RBLK, 1] column test runs at 1/128 lane utilization and dominated
    large-scene traversal), the walk stops early once every ray's hit
    is closer than the chunk's minimum conservative entry distance
    (near-to-far sort keys ride row 7 of each entry), and only entries
    with a live pending bit issue ONE async DMA of the cluster's
    [16, WINDOW] triangle slab (rows 0-8 = v0/e1/e2 xyz, padded to the
    8-sublane DMA granule) HBM -> VMEM plus a pairwise
    Moeller-Trumbore sweep (rays broadcast over sublanes, triangles
    over lanes — full VPU tiles, no gathers).

This sidesteps what XLA cannot do well here: per-lane gathers (replaced
by blocked DMA) and lane-divergent while loops (replaced by block-level
culling).  Validated against intersect_brute in interpret mode and on
device (v5e).
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .intersect import ClusterArrays, Hit

F32_MAX = np.float32(3.0e38)
TCHUNK = 128  # triangles per lane sweep
SPAN = 4      # zero-slab tail padding on the cluster table (lets span
#               reads run off the end; kept for layout stability)
DEPTH = 8     # member-slab DMA pipeline depth: per-member rounds were
#               DMA-LATENCY bound (~2 us start->wait vs ~0.3 us compute);
#               a DEPTH-deep ring keeps copies in flight so rounds run at
#               issue/compute throughput instead


def _rblk(window: int) -> int:
    """Rays per grid step: lane-padded ray/out blocks cost RBLK*512 B
    each; at window 256 the 16 MB scoped-VMEM budget is tight inside
    large fused programs, so halve the block."""
    return 1024 if window <= 128 else 512


def _traverse_kernel(window, n_clusters, any_hit):
    n_chunks = window // TCHUNK

    def kernel(cb_ref, rays_ref, tri9_hbm, work_hbm,
               out_ref, prim_ref, tri_vmem, sem, work_smem, wsem):
        ox = rays_ref[:, 0:1]                            # [RBLK, 1]
        oy = rays_ref[:, 1:2]
        oz = rays_ref[:, 2:3]
        dx = rays_ref[:, 3:4]
        dy = rays_ref[:, 4:5]
        dz = rays_ref[:, 5:6]
        mint = rays_ref[:, 6:7]
        inv = lambda c: jnp.where(jnp.abs(c) > 1e-12, 1.0 / c, 1e30)
        ix, iy, iz = inv(dx), inv(dy), inv(dz)

        out_ref[:, 0:1] = rays_ref[:, 7:8]               # t := maxt
        out_ref[:, 1:2] = jnp.zeros_like(mint)
        out_ref[:, 2:3] = jnp.zeros_like(mint)
        out_ref[:, 3:4] = jnp.zeros_like(mint)
        prim_ref[:] = jnp.full(mint.shape, -1, jnp.int32)
        blk = pl.program_id(0)
        # this block's worklist row: [count, k_0, k_1, ...] (near-to-far)
        wcp = pltpu.make_async_copy(work_hbm.at[blk], work_smem, wsem)
        wcp.start()
        wcp.wait()

        def cluster_body(s, _):
            e = 1 + s
            k = work_smem[e % 8, e // 8]
            t_b = out_ref[:, 0:1]
            tx0 = (cb_ref[k, 0] - ox) * ix
            tx1 = (cb_ref[k, 3] - ox) * ix
            ty0 = (cb_ref[k, 1] - oy) * iy
            ty1 = (cb_ref[k, 4] - oy) * iy
            tz0 = (cb_ref[k, 2] - oz) * iz
            tz1 = (cb_ref[k, 5] - oz) * iz
            tn = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                         jnp.minimum(ty0, ty1)),
                             jnp.minimum(tz0, tz1))
            tf = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                         jnp.maximum(ty0, ty1)),
                             jnp.maximum(tz0, tz1))
            pending = (tn <= tf) & (tf >= mint) & (tn <= t_b)

            @pl.when(jnp.any(pending))
            def _():
                cp = pltpu.make_async_copy(tri9_hbm.at[k], tri_vmem, sem)
                cp.start()
                cp.wait()
                for jc in range(n_chunks):
                    sl = slice(jc * TCHUNK, (jc + 1) * TCHUNK)
                    v0x = tri_vmem[0:1, sl]              # [1, TCHUNK]
                    v0y = tri_vmem[1:2, sl]
                    v0z = tri_vmem[2:3, sl]
                    e1x = tri_vmem[3:4, sl]
                    e1y = tri_vmem[4:5, sl]
                    e1z = tri_vmem[5:6, sl]
                    e2x = tri_vmem[6:7, sl]
                    e2y = tri_vmem[7:8, sl]
                    e2z = tri_vmem[8:9, sl]
                    px = dy * e2z - dz * e2y             # [RBLK, TCHUNK]
                    py = dz * e2x - dx * e2z
                    pz = dx * e2y - dy * e2x
                    det = e1x * px + e1y * py + e1z * pz
                    inv_det = jnp.where(jnp.abs(det) > 1e-12,
                                        1.0 / det, 0.0)
                    tx = ox - v0x
                    ty = oy - v0y
                    tz = oz - v0z
                    uu = (tx * px + ty * py + tz * pz) * inv_det
                    qx = ty * e1z - tz * e1y
                    qy = tz * e1x - tx * e1z
                    qz = tx * e1y - ty * e1x
                    vv = (dx * qx + dy * qy + dz * qz) * inv_det
                    tt = (e2x * qx + e2y * qy + e2z * qz) * inv_det
                    hit = ((jnp.abs(det) > 1e-12) & (uu >= 0.0) &
                           (vv >= 0.0) & (uu + vv <= 1.0) &
                           (tt > mint) & (tt < out_ref[:, 0:1]) & pending)
                    tt = jnp.where(hit, tt, F32_MAX)
                    tj = jnp.min(tt, axis=1, keepdims=True)
                    better = tj < out_ref[:, 0:1]
                    if any_hit:
                        prim_ref[:] = jnp.where(better, 0, prim_ref[:])
                    else:
                        j = jnp.argmin(tt, axis=1,
                                       keepdims=True).astype(jnp.int32)
                        bi = jax.lax.broadcasted_iota(
                            jnp.int32, tt.shape, 1)
                        selm = bi == j
                        uj = jnp.sum(jnp.where(selm, uu, 0.0), axis=1,
                                     keepdims=True)
                        vj = jnp.sum(jnp.where(selm, vv, 0.0), axis=1,
                                     keepdims=True)
                        out_ref[:, 1:2] = jnp.where(better, uj,
                                                    out_ref[:, 1:2])
                        out_ref[:, 2:3] = jnp.where(better, vj,
                                                    out_ref[:, 2:3])
                        prim_ref[:] = jnp.where(
                            better, k * window + jc * TCHUNK + j,
                            prim_ref[:])
                        out_ref[:, 0:1] = jnp.where(better, tj,
                                                    out_ref[:, 0:1])

            return 0

        jax.lax.fori_loop(0, work_smem[0, 0], cluster_body, 0)

    return kernel


def _run(kernel_fn, window, o, d, mint, maxt, tri9, cbounds):
    RBLK = _rblk(window)
    N = o.shape[0]
    pad = (-N) % RBLK
    Np = N + pad
    G = Np // RBLK

    rays = jnp.concatenate(
        [o, d, mint[:, None], maxt[:, None]], axis=1).astype(jnp.float32)
    if pad:
        filler = jnp.concatenate(
            [jnp.zeros((pad, 3)), jnp.ones((pad, 3)),
             jnp.zeros((pad, 1)), jnp.full((pad, 1), -1.0)], axis=1)
        rays = jnp.concatenate([rays, filler.astype(jnp.float32)], axis=0)

    # Per-block near-to-far cluster worklists, built by XLA where the
    # all-pairs AABB test is a dense fused [G, RBLK, K] reduce (full VPU
    # tiles) — inside the kernel the same test runs on [RBLK, 1] columns
    # at 1/128 lane utilization and dominated the runtime.
    K = cbounds.shape[0]
    ob = rays[:, 0:3].reshape(G, RBLK, 1, 3)
    db = rays[:, 3:6].reshape(G, RBLK, 1, 3)
    mintb = rays[:, 6].reshape(G, RBLK, 1)
    maxtb = rays[:, 7].reshape(G, RBLK, 1)
    invd = jnp.where(jnp.abs(db) > 1e-12, 1.0 / db, 1e30)
    t0b = (cbounds[None, None, :, 0:3] - ob) * invd     # [G, RBLK, K, 3]
    t1b = (cbounds[None, None, :, 3:6] - ob) * invd
    tn = jnp.max(jnp.minimum(t0b, t1b), axis=-1)        # [G, RBLK, K]
    tf = jnp.min(jnp.maximum(t0b, t1b), axis=-1)
    pend = (tn <= tf) & (tf >= mintb) & (tn <= maxtb)
    tn_blk = jnp.min(jnp.where(pend, jnp.maximum(tn, 0.0), F32_MAX),
                     axis=1)                            # [G, K]
    pend_blk = jnp.any(pend, axis=1)                    # [G, K]
    order = jnp.argsort(tn_blk, axis=1).astype(jnp.int32)   # [G, K]
    count = jnp.sum(pend_blk, axis=1, dtype=jnp.int32)[:, None]
    # one DMA-able slab per block: flat [count, k_0, k_1, ...] stored as
    # [G, 8, W8] with element e at [e % 8, e // 8] (DMA slices must span
    # whole 8-sublane granules; see the tri9 padding note)
    Kp = 1 + K + ((-(1 + K)) % 1024)   # 8 sublanes x 128-lane granules
    W8 = Kp // 8
    flat = jnp.concatenate(
        [count, order, jnp.zeros((G, Kp - 1 - K), jnp.int32)], axis=1)
    work = flat.reshape(G, W8, 8).transpose(0, 2, 1)

    ray_spec = pl.BlockSpec((RBLK, 8), lambda i, *_: (i, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((RBLK, 4), lambda i, *_: (i, 0),
                            memory_space=pltpu.VMEM)
    prim_spec = pl.BlockSpec((RBLK, 1), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM)
    out, prim = pl.pallas_call(
        kernel_fn,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(G,),
            in_specs=[ray_spec,
                      pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=[out_spec, prim_spec],
            scratch_shapes=[
                pltpu.VMEM((16, window), jnp.float32),
                pltpu.SemaphoreType.DMA,
                pltpu.SMEM((8, W8), jnp.int32),
                pltpu.SemaphoreType.DMA,
            ]),
        out_shape=[jax.ShapeDtypeStruct((Np, 4), jnp.float32),
                   jax.ShapeDtypeStruct((Np, 1), jnp.int32)],
    )(cbounds, rays, tri9, work)
    return (out[:N, 0], out[:N, 1], out[:N, 2], prim[:N, 0])


def make_pallas_intersector(window: int, n_clusters: int):
    kernel = _traverse_kernel(window, n_clusters, any_hit=False)

    @jax.jit
    def intersect(o, d, mint, maxt, tri9, cbounds):
        t, u, v, p = _run(kernel, window, o, d, mint, maxt, tri9, cbounds)
        return Hit(t=jnp.where(p >= 0, t, F32_MAX), u=u, v=v, prim=p,
                   valid=p >= 0)

    return intersect


def make_pallas_occluder(window: int, n_clusters: int):
    kernel = _traverse_kernel(window, n_clusters, any_hit=True)

    @jax.jit
    def occluded(o, d, mint, maxt, tri9, cbounds):
        t, _, _, p = _run(kernel, window, o, d, mint, maxt, tri9, cbounds)
        return p >= 0

    return occluded


def pack_cluster_bounds(clusters: ClusterArrays) -> np.ndarray:
    """[K, 6] scalar-prefetch table: (bmin.xyz, bmax.xyz)."""
    return np.concatenate([np.asarray(clusters.bmin),
                           np.asarray(clusters.bmax)],
                          axis=1).astype(np.float32)


# ===========================================================================
# Traversal v3: in-kernel linear-MT (MXU) sweeps + sorted-ray coherence
# ===========================================================================
#
# The v2 kernel above runs Moeller-Trumbore as ~55 VPU ops per (ray, tri)
# pair; the VPU issue rate is the measured wall on this hardware while the
# MXU idles.  v3 stores each cluster's triangles as their linear-MT
# coefficient slab (ops/intersect.py build_linear_mt): one in-kernel
# [RBLK, 16] @ [16, 4*window] f32 matmul yields (det, u_num, v_num, t_num)
# for the whole sweep and the VPU epilogue shrinks to ~15 ops/pair.
# Incoherent ray batches (bounce/NEE wavefronts) are first sorted by
# (direction octant, origin Morton code) — rays in a block then share
# clusters, so the per-block worklists shrink ~10x (measured 28 ms
# coherent vs 295 ms incoherent on a 384k-tri scene with v2).  The sort
# is two lax.sort calls (~0.03 ms at 65k rays: the payload rides the
# sort network, no gathers).


def build_mt_slabs(linC: np.ndarray, window: int) -> np.ndarray:
    """Reshape the scene-wide [10, 4*Tp] linear-MT coefficient matrix
    into per-cluster DMA slabs [K + SPAN-1, 8, 4*window] — HALF the
    bytes of the historical 16-row layout on every member DMA (round 5).

    The 8-row packing exploits build_linear_mt's exact zero structure
    (ops/intersect.py): the det/u/v column groups only carry (o x d, d)
    feature coefficients (rows 0:6), and the t group only carries (o, 1)
    (rows 6:10).  So:
      - columns [0 : 3W]  (det|u|v): slab rows 0:6 = linC rows 0:6
      - columns [3W : 4W] (t):       slab rows 0:4 = linC rows 6:10
    and the kernels run TWO matmuls per member — [RB,8] @ [8,3W] with
    the (o x d, d) features and [RB,8] @ [8,W] with the (o, 1) features
    — reading disjoint column ranges of one fully tile-aligned 8-row
    slab (a 10-row DMA slice violates Mosaic's (8,128) tiling).  The
    SPAN-1 all-zero tail clusters let a span DMA of [k, k+SPAN) run off
    the end of the table safely (zero coefficients => det = 0 => never
    hit)."""
    Tp = linC.shape[1] // 4
    K = Tp // window
    seg = linC.reshape(10, 4, K, window)          # [10, out, K, W]
    per = seg.transpose(2, 0, 1, 3)               # [K, 10, out, W]
    slabs = np.zeros((K + SPAN - 1, 8, 4 * window), np.float32)
    slabs[:K, 0:6, 0:3 * window] = per[:, 0:6, 0:3, :].reshape(
        K, 6, 3 * window)
    slabs[:K, 0:4, 3 * window:] = per[:, 6:10, 3, :]
    return slabs


WL_CHUNK = 128          # worklist entries per SMEM chunk (one per column)
BIGI = 1 << 30          # plain int: jnp scalars here become captured consts


def _mt_kernel(window, sc_pad, n_clusters, any_hit):
    """v4 kernel: SUPER-granularity worklists, member expansion on-chip.

    The v3 kernel walked worklists of CLUSTER entries built in XLA; at
    3M tris the build materialized [G, K, 6] bounds gathers (~0.9 GB per
    call) and every pending cluster's matmul swept all RBLK=512 rays of
    its block while only ~4 clusters pend per RAY — a ~200x flop
    dilution that put the bounce wavefront at 461 ms/call (measured,
    VERDICT r3 weak #1).  v4 instead:

      - worklist entries are SUPERCLUSTERS (SUPER_FACTOR consecutive
        clusters; bounds = member union) — the XLA-side build shrinks to
        [G, S] with S = K/SUPER_FACTOR (~140 at 3M tris);
      - a pending super DMAs its member-bounds slab [8, SC] and
        slab-tests all members on one VPU tile; only members some ray
        actually enters DMA their triangle slab + linear-MT matmul;
      - ray blocks shrink (RBLK 512 -> 64): the matmul rides the MXU at
        identical K=16 utilization but sweeps 8x fewer non-pending rays
        per cluster (Morton-sorted blocks keep the per-block pending
        union close to the per-ray set);
      - scalar walks skip STRAIGHT to the next pending lane (min over a
        masked iota) instead of iterating all 128 columns.
    """
    W = window
    SCp = sc_pad

    def kernel(counts_ref, rays_ref, slab_hbm, mb_ref, work_hbm,
               out_ref, prim_ref,
               slab_vmem, slab_sem, slot_k, wl_smem, wsem, wl_vmem,
               vsem):
        ox = rays_ref[:, 0:1]
        oy = rays_ref[:, 1:2]
        oz = rays_ref[:, 2:3]
        dx = rays_ref[:, 3:4]
        dy = rays_ref[:, 4:5]
        dz = rays_ref[:, 5:6]
        mint = rays_ref[:, 6:7]
        inv = lambda c: jnp.where(jnp.abs(c) > 1e-12, 1.0 / c, 1e30)
        ix, iy, iz = inv(dx), inv(dy), inv(dz)
        zeros = jnp.zeros_like(ox)
        # two 8-wide feature groups matching the 8-row slab split
        # (build_mt_slabs): A = (o x d, d) for det|u|v, B = (o, 1) for t
        featsA = jnp.concatenate(
            [oy * dz - oz * dy, oz * dx - ox * dz, ox * dy - oy * dx,
             dx, dy, dz, zeros, zeros], axis=1)
        featsB = jnp.concatenate(
            [ox, oy, oz, jnp.ones_like(ox),
             zeros, zeros, zeros, zeros], axis=1)

        out_ref[:, 0:1] = rays_ref[:, 7:8]           # t := maxt
        out_ref[:, 1:2] = zeros
        out_ref[:, 2:3] = zeros
        out_ref[:, 3:4] = zeros
        prim_ref[:] = jnp.full(mint.shape, -1, jnp.int32)
        blk = pl.program_id(0)
        count = counts_ref[blk]

        def slab_pend(rows_ref, n_lanes):
            """Batched AABB test of n_lanes boxes against the block's
            rays on [RBLK, n_lanes] VPU tiles.  rows_ref layout: rows
            1-3 bbox min xyz, rows 4-6 bbox max xyz (worklist format) —
            returns pend [RBLK, n_lanes].  The t bound is read fresh so
            already-resolved rays prune everything behind their hit."""
            t_b = out_ref[:, 0:1]
            tx0 = (rows_ref[1:2, :] - ox) * ix
            tx1 = (rows_ref[4:5, :] - ox) * ix
            ty0 = (rows_ref[2:3, :] - oy) * iy
            ty1 = (rows_ref[5:6, :] - oy) * iy
            tz0 = (rows_ref[3:4, :] - oz) * iz
            tz1 = (rows_ref[6:7, :] - oz) * iz
            tn = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                         jnp.minimum(ty0, ty1)),
                             jnp.minimum(tz0, tz1))
            tf = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                         jnp.maximum(ty0, ty1)),
                             jnp.maximum(tz0, tz1))
            return (tn <= tf) & (tf >= mint) & (tn <= t_b)

        def compute_slab(k, slot):
            """Linear-MT sweep of the slab in ring slot `slot`.
            DEFAULT precision = bf16x3 passes (~f32 accuracy for these
            sums); HIGHEST (bf16x6) doubled the MXU passes and was half
            the measured large-scene wall."""
            FA = jax.lax.dot_general(
                featsA, slab_vmem[slot][:, :3 * W],
                (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=jnp.float32)      # [RBLK, 3W]
            FB = jax.lax.dot_general(
                featsB, slab_vmem[slot][:, 3 * W:],
                (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.DEFAULT,
                preferred_element_type=jnp.float32)      # [RBLK, W]
            dinv = 1.0 / FA[:, :W]
            u = FA[:, W:2 * W] * dinv
            v = FA[:, 2 * W:3 * W] * dinv
            t = FB * dinv
            ok = ((u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) &
                  (t > mint) & (t < out_ref[:, 0:1]))
            if any_hit:
                hit_any = jnp.any(ok, axis=1, keepdims=True)
                prim_ref[:] = jnp.where(hit_any, 0, prim_ref[:])
                # kill future pending tests for occluded rays
                out_ref[:, 0:1] = jnp.where(hit_any, -1.0,
                                            out_ref[:, 0:1])
            else:
                tt = jnp.where(ok, t, F32_MAX)
                tc = jnp.min(tt, axis=1, keepdims=True)
                better = tc < out_ref[:, 0:1]
                iw = jax.lax.broadcasted_iota(jnp.int32, tt.shape, 1)
                sel = tt == tc
                jm = jnp.min(jnp.where(sel, iw, BIGI),
                             axis=1, keepdims=True)
                first = iw == jm
                uc = jnp.sum(jnp.where(first, u, 0.0), axis=1,
                             keepdims=True)
                vc = jnp.sum(jnp.where(first, v, 0.0), axis=1,
                             keepdims=True)
                out_ref[:, 1:2] = jnp.where(better, uc, out_ref[:, 1:2])
                out_ref[:, 2:3] = jnp.where(better, vc, out_ref[:, 2:3])
                prim_ref[:] = jnp.where(better, k * W + jm, prim_ref[:])
                out_ref[:, 0:1] = jnp.where(better, tc, out_ref[:, 0:1])

        lane_m = jax.lax.broadcasted_iota(jnp.int32, (1, SCp), 1)

        def process_super(s):
            """Member expansion of super s: DMA its bounds slab, test
            all members on one VPU tile, then sweep pending members'
            triangle slabs through a DEPTH-deep DMA pipeline.  The
            member-bounds table is VMEM-RESIDENT (constant index_map
            input, ~32 B/cluster) — the per-super HBM round trip it
            replaces (two serial DMA start->waits, ~4 us x ~15-35k super
            visits/call) was the measured wall after the member DMAs
            were pipelined.  Member ids need no table at all: member
            lane m of super s IS cluster s*SC + m by construction."""
            # member pend: rows 1-6 bounds (worklist layout); lanes past
            # the real cluster count are padding
            rows = mb_ref[s]                                 # [8, SCp]
            pend = (slab_pend(rows, SCp) &
                    (s * SCp + lane_m < n_clusters))
            anymem = jnp.any(pend, axis=0, keepdims=True)    # [1, SCp]
            k_base = s * SCp

            # DEPTH-deep software pipeline: the per-member round was
            # DMA-LATENCY bound (~2 us start->wait vs ~0.3 us of
            # compute), so keep up to DEPTH slab copies in flight — a
            # ring of slots, each slot's cluster id parked in SMEM.
            def start_next(m, n_started):
                """Start the DMA for pending lane m into its ring slot;
                returns the following pending lane."""
                k = k_base + m
                slot = jax.lax.rem(n_started, jnp.int32(DEPTH))
                slot_k[slot] = k
                pltpu.make_async_copy(slab_hbm.at[k],
                                      slab_vmem.at[slot],
                                      slab_sem.at[slot]).start()
                return jnp.min(jnp.where(anymem & (lane_m > m), lane_m,
                                         BIGI))

            def prefill(carry):
                m, n_started = carry
                m2 = start_next(m, n_started)
                return (m2, n_started + 1)

            m0 = jnp.min(jnp.where(anymem, lane_m, BIGI))
            m_next, n_started = jax.lax.while_loop(
                lambda c: (c[0] < SCp) & (c[1] < DEPTH), prefill,
                (m0, jnp.int32(0)))

            def drain_one(carry):
                m_next, n_started, n_done = carry
                slot = jax.lax.rem(n_done, jnp.int32(DEPTH))
                pk = slot_k[slot]
                pltpu.make_async_copy(slab_hbm.at[pk],
                                      slab_vmem.at[slot],
                                      slab_sem.at[slot]).wait()
                compute_slab(pk, slot)
                # slot is free again: feed the pipeline
                started = jnp.where(m_next < SCp, n_started + 1,
                                    n_started)
                m2 = jax.lax.cond(
                    m_next < SCp,
                    lambda: start_next(m_next, n_started),
                    lambda: m_next)
                return (m2, started, n_done + 1)

            jax.lax.while_loop(
                lambda c: c[2] < c[1], drain_one,
                (m_next, n_started, jnp.int32(0)))

        def chunk_cond(carry):
            c, go = carry
            return (c < (count + WL_CHUNK - 1) // WL_CHUNK) & go

        def chunk_body(carry):
            c, _ = carry
            wcp = pltpu.make_async_copy(work_hbm.at[blk, c], wl_smem,
                                        wsem)
            wcp.start()
            vcp = pltpu.make_async_copy(work_hbm.at[blk, c], wl_vmem,
                                        vsem)
            vcp.start()
            wcp.wait()
            vcp.wait()
            # early termination (entries are near-to-far): once every
            # ray's current hit is closer than the chunk's minimum
            # conservative entry distance (row 7; monotone across
            # chunks), no later entry can improve any ray — stop.  For
            # any-hit, resolved rays carry t = -1, so the walk stops as
            # soon as the whole block is occluded.
            chunk_min_tn = jnp.min(wl_vmem[7:8, :])
            proceed = chunk_min_tn <= jnp.max(out_ref[:, 0:1])
            in_chunk = jnp.minimum(count - c * WL_CHUNK, WL_CHUNK)
            # slab-test ALL chunk entries at once on full VPU tiles; the
            # scalar walk below skips straight to pending lanes.  The t
            # bound is chunk-start stale, which can only admit extra
            # member tests, never lose a hit.
            pend = slab_pend(wl_vmem, WL_CHUNK)
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, WL_CHUNK), 1)
            anyrow = (jnp.any(pend, axis=0, keepdims=True) &
                      (lane < in_chunk) & proceed)

            @pl.when(jnp.any(anyrow))
            def _():
                def nxt(j):
                    # per-super early exit: entries are near-to-far, so
                    # once the next pending super's entry distance (row
                    # 7) exceeds EVERY ray's current hit, nothing behind
                    # it can improve the block.  anyrow's per-ray bound
                    # is chunk-start stale; this re-check uses fresh t.
                    tmax = jnp.max(out_ref[:, 0:1])
                    return jnp.min(jnp.where(
                        anyrow & (lane > j) & (wl_vmem[7:8, :] <= tmax),
                        lane, BIGI))

                def sbody(j):
                    s = wl_smem[0, j].astype(jnp.int32)
                    process_super(s)
                    return nxt(j)

                j0 = jnp.min(jnp.where(anyrow, lane, BIGI))
                jax.lax.while_loop(lambda j: j < WL_CHUNK, sbody, j0)

            return (c + 1, proceed)

        jax.lax.while_loop(chunk_cond, chunk_body,
                           (jnp.int32(0), jnp.bool_(True)))

    return kernel


def _assemble_worklists(order, counts, cbounds, row7=None):
    """Pack per-block sorted cluster ids + their bounds into DMA chunks.

    order: [G, K] int32 (pending-first, near-to-far); counts: [G] int32.
    Returns work [G, NCH, 8, WL_CHUNK] f32 — entry j of chunk c sits in
    column j: row 0 = cluster id (as f32; exact below 2^24), rows 1-3 =
    bbox min, rows 4-6 = bbox max, row 7 = the entry's conservative
    near-to-far sort key tn_lb (the kernel's early-termination bound;
    F32_MAX when absent)."""
    G, K = order.shape
    ob = cbounds[order]                                  # [G, K, 6]
    if row7 is None:
        row7 = jnp.full((G, K), F32_MAX)
    entries = jnp.concatenate(
        [order.astype(jnp.float32)[..., None], ob,
         row7[..., None]], axis=-1)                      # [G, K, 8]
    Kp = -(-K // WL_CHUNK) * WL_CHUNK
    if Kp != K:
        pad = jnp.zeros((G, Kp - K, 8), jnp.float32)
        pad = pad.at[:, :, 7].set(F32_MAX)
        entries = jnp.concatenate([entries, pad], axis=1)
    NCH = Kp // WL_CHUNK
    work = entries.reshape(G, NCH, WL_CHUNK, 8).transpose(0, 1, 3, 2)
    return counts.astype(jnp.int32), work


SUPER_FACTOR = int(os.environ.get("GDMT_SUPER_FACTOR", "128"))
#                  clusters per supercluster (= member-test lane width)
MT_RBLK = int(os.environ.get("GDMT_RBLK", "64"))
#                  rays per kernel block: small blocks keep the pending
#                  union close to the per-ray pending set (flop dilution)


def _super_bounds(cbounds):
    """[S, 6] supercluster bounds: union of SUPER_FACTOR consecutive
    DFS-ordered clusters (padding clusters get inverted boxes that never
    extend the union)."""
    K = cbounds.shape[0]
    big = jnp.float32(F32_MAX)
    SC = SUPER_FACTOR
    Kp = -(-K // SC) * SC
    if Kp != K:
        pad = jnp.concatenate(
            [jnp.full((Kp - K, 3), big), jnp.full((Kp - K, 3), -big)],
            axis=1)
        cb_pad = jnp.concatenate([cbounds, pad], axis=0)   # [Kp, 6]
    else:
        cb_pad = cbounds
    return jnp.concatenate(
        [jnp.min(cb_pad[:, 0:3].reshape(-1, SC, 3), axis=1),
         jnp.max(cb_pad[:, 3:6].reshape(-1, SC, 3), axis=1)],
        axis=1)                                            # [S, 6]


def _member_slabs(cbounds):
    """[S, 8, SC] member-bounds DMA slabs for the kernel's on-chip super
    expansion: row 0 = member cluster id (f32; -1 marks padding past K),
    rows 1-3 = bbox min, rows 4-6 = bbox max, row 7 = zeros — the same
    row layout as worklist entries so the kernel's batched slab test is
    shared."""
    K = cbounds.shape[0]
    SC = SUPER_FACTOR
    Kp = -(-K // SC) * SC
    ids = jnp.arange(Kp, dtype=jnp.int32)
    valid = ids < K
    cb = jnp.concatenate(
        [cbounds, jnp.zeros((Kp - K, 6), cbounds.dtype)], axis=0)
    rows = jnp.concatenate(
        [jnp.where(valid, ids, -1).astype(jnp.float32)[:, None],
         cb, jnp.zeros((Kp, 1), jnp.float32)], axis=1)     # [Kp, 8]
    return rows.reshape(-1, SC, 8).transpose(0, 2, 1)      # [S, 8, SC]


def _super_worklists(rays, G, RBLK, cbounds):
    """Per-block worklists of SUPERCLUSTER entries: EXACT per-ray AABB
    tests at super granularity (dense fused [RBLK, S, 3] reduces on full
    VPU tiles, chunked over blocks), block-reduced to a pending bit +
    block-min entry distance, then sorted near-to-far.  O(N*S) VPU work
    — S = K / SUPER_FACTOR stays small at any scene size (SURVEY §8.3
    hard-part #1).

    This replaced the round-3 interval-arithmetic build (origin box x
    direction interval per block): after one diffuse bounce a block's
    direction interval spans nearly the full sphere, so that build
    enqueued ~ALL clusters with ~0 sort keys — every block walked the
    whole scene and early termination never fired (the measured 0.2
    Mrays/s forest cliff, VERDICT r3 weak #1).  Member expansion now
    happens inside the kernel (_mt_kernel process_super)."""
    big = jnp.float32(F32_MAX)
    scb = _super_bounds(cbounds)
    S = scb.shape[0]

    def block_pend(blk):
        """[RBLK, 8] rays -> (pend [S] bool, tn_min [S] f32)."""
        o = blk[:, 0:3][:, None]                         # [RBLK, 1, 3]
        d = blk[:, 3:6][:, None]
        mint = blk[:, 6][:, None]
        maxt = blk[:, 7][:, None]
        invd = jnp.where(jnp.abs(d) > 1e-12, 1.0 / d, 1e30)
        t0 = (scb[None, :, 0:3] - o) * invd              # [RBLK, S, 3]
        t1 = (scb[None, :, 3:6] - o) * invd
        tn = jnp.max(jnp.minimum(t0, t1), axis=-1)       # [RBLK, S]
        tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
        pend = (tn <= tf) & (tf >= mint) & (tn <= maxt)
        tn_min = jnp.min(jnp.where(pend, jnp.maximum(tn, 0.0), big),
                         axis=0)                         # [S]
        return jnp.any(pend, axis=0), tn_min

    # chunk the per-ray x per-super test over blocks: temps are
    # [B, RBLK, S, 3] f32 — keep them ~100 MB
    bsz = max(1, min(G, (1 << 23) // max(RBLK * S, 1)))
    pend, tn_blk = jax.lax.map(block_pend, rays.reshape(G, RBLK, 8),
                               batch_size=bsz)           # [G, S] each
    key = jnp.where(pend, tn_blk, big)
    counts_s = jnp.sum(pend, axis=1, dtype=jnp.int32)
    order_s, row7 = _rank_sort(key)
    return _assemble_worklists(order_s, counts_s, scb, row7)


def _rank_sort(key):
    """Near-to-far ordering of [G, S] rows WITHOUT lax.sort: on the
    measured backend a bitonic sort costs ~100 ms regardless of size
    (pass-count x per-pass dispatch), while this O(G*S^2) rank-by-
    comparison is a handful of fused VPU passes (~20M elementwise ops at
    S=140).  Ties break by index, so ranks are a permutation."""
    S = key.shape[1]
    iot = jnp.arange(S, dtype=jnp.int32)
    a = key[:, :, None]          # entry s
    b = key[:, None, :]          # entry s'
    before = (b < a) | ((b == a) & (iot[None, :, None] > iot[None, None, :]))
    rank = jnp.sum(before, axis=2).astype(jnp.int32)       # [G, S]
    onehot = rank[:, :, None] == iot[None, None, :]        # [G, S, r]
    order = jnp.sum(jnp.where(onehot, iot[None, :, None], 0),
                    axis=1).astype(jnp.int32)              # [G, S]
    sorted_key = jnp.sum(jnp.where(onehot, a, 0.0), axis=1)
    return order, sorted_key


def _mt_run(kernel_fn, window, o, d, mint, maxt, slabs, cbounds):
    RBLK = MT_RBLK
    N = o.shape[0]
    pad = (-N) % RBLK
    Np = N + pad
    G = Np // RBLK

    rays = jnp.concatenate(
        [o, d, mint[:, None], maxt[:, None]], axis=1).astype(jnp.float32)
    if pad:
        filler = jnp.concatenate(
            [jnp.zeros((pad, 3)), jnp.ones((pad, 3)),
             jnp.zeros((pad, 1)), jnp.full((pad, 1), -1.0)], axis=1)
        rays = jnp.concatenate([rays, filler.astype(jnp.float32)], axis=0)

    counts, work = _super_worklists(rays, G, RBLK, cbounds)
    mb = _member_slabs(cbounds)

    ray_spec = pl.BlockSpec((RBLK, 8), lambda i, *_: (i, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((RBLK, 4), lambda i, *_: (i, 0),
                            memory_space=pltpu.VMEM)
    prim_spec = pl.BlockSpec((RBLK, 1), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM)
    out, prim = pl.pallas_call(
        kernel_fn,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(G,),
            in_specs=[ray_spec,
                      pl.BlockSpec(memory_space=pl.ANY),
                      # member-bounds table: VMEM-resident across all
                      # grid steps (constant index_map => fetched once)
                      pl.BlockSpec(mb.shape, lambda i, *_: (0, 0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=[out_spec, prim_spec],
            scratch_shapes=[
                pltpu.VMEM((DEPTH, 8, 4 * window), jnp.float32),
                pltpu.SemaphoreType.DMA((DEPTH,)),
                pltpu.SMEM((DEPTH,), jnp.int32),
                pltpu.SMEM((8, WL_CHUNK), jnp.float32),
                pltpu.SemaphoreType.DMA,
                pltpu.VMEM((8, WL_CHUNK), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ]),
        out_shape=[jax.ShapeDtypeStruct((Np, 4), jnp.float32),
                   jax.ShapeDtypeStruct((Np, 1), jnp.int32)],
    )(counts, rays, slabs, mb, work)
    return (out[:N, 0], out[:N, 1], out[:N, 2], prim[:N, 0])


def _part1by2(x):
    """Spread the low 10 bits of x so there are 2 zero bits between each
    (Morton interleave helper, standard bit twiddling)."""
    x = x & 0x3ff
    x = (x | (x << 16)) & 0x30000ff
    x = (x | (x << 8)) & 0x300f00f
    x = (x | (x << 4)) & 0x30c30c3
    x = (x | (x << 2)) & 0x9249249
    return x


def sort_rays(o, d, mint, maxt, bmin, bmax):
    """Coherence sort: key = (direction octant << 21) | morton7(origin).
    Returns the sorted ray streams plus the inverse-permutation index;
    payload rides the lax.sort network (no gathers)."""
    extent = jnp.maximum(bmax - bmin, 1e-6)
    q = jnp.clip((o - bmin[None]) / extent[None] * 127.0,
                 0.0, 127.0).astype(jnp.int32)
    morton = (_part1by2(q[:, 0]) | (_part1by2(q[:, 1]) << 1) |
              (_part1by2(q[:, 2]) << 2))
    octant = ((d[:, 0] < 0).astype(jnp.int32) * 4 +
              (d[:, 1] < 0).astype(jnp.int32) * 2 +
              (d[:, 2] < 0).astype(jnp.int32))
    key = (octant << 21) | morton
    iota = jnp.arange(o.shape[0], dtype=jnp.int32)
    (key, o0, o1, o2, d0, d1, d2, mi, ma, inv) = jax.lax.sort(
        (key, o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
         mint, maxt, iota), dimension=0, num_keys=1)
    return (jnp.stack([o0, o1, o2], 1), jnp.stack([d0, d1, d2], 1),
            mi, ma, inv)


# Morton/octant coherence sort around the kernel: wavefront rays arrive
# in IMAGE order, whose origins are already spatially coherent (ray i's
# origin is pixel i's hit point), so the sort mostly adds direction-
# octant grouping.  On the measured backend ONE 65k-element lax.sort
# costs ~100 ms (bitonic passes x per-pass dispatch), i.e. sort+unsort
# dwarfed the traversal kernel itself — default OFF.
RAY_SORT = os.environ.get("GDMT_RAY_SORT", "0") != "0"


def make_pallas_mt_intersector(window: int, n_clusters: int):
    kernel = _mt_kernel(window, SUPER_FACTOR, n_clusters, any_hit=False)

    @jax.jit
    def intersect(o, d, mint, maxt, slabs, cbounds):
        if RAY_SORT:
            bmin = jnp.min(cbounds[:, 0:3], axis=0)
            bmax = jnp.max(cbounds[:, 3:6], axis=0)
            so, sd, smi, sma, inv = sort_rays(o, d, mint, maxt, bmin,
                                              bmax)
            t, u, v, p = _mt_run(kernel, window, so, sd, smi, sma,
                                 slabs, cbounds)
            # unsort: second payload sort keyed on the original index
            _, t, u, v, p = jax.lax.sort((inv, t, u, v, p), dimension=0,
                                         num_keys=1)
        else:
            t, u, v, p = _mt_run(kernel, window, o, d, mint, maxt,
                                 slabs, cbounds)
        return Hit(t=jnp.where(p >= 0, t, F32_MAX), u=u, v=v, prim=p,
                   valid=p >= 0)

    return intersect


def make_pallas_mt_occluder(window: int, n_clusters: int):
    kernel = _mt_kernel(window, SUPER_FACTOR, n_clusters, any_hit=True)

    @jax.jit
    def occluded(o, d, mint, maxt, slabs, cbounds):
        if RAY_SORT:
            bmin = jnp.min(cbounds[:, 0:3], axis=0)
            bmax = jnp.max(cbounds[:, 3:6], axis=0)
            so, sd, smi, sma, inv = sort_rays(o, d, mint, maxt, bmin,
                                              bmax)
            t, _, _, p = _mt_run(kernel, window, so, sd, smi, sma,
                                 slabs, cbounds)
            _, p = jax.lax.sort((inv, p), dimension=0, num_keys=1)
        else:
            _, _, _, p = _mt_run(kernel, window, o, d, mint, maxt,
                                 slabs, cbounds)
        return p >= 0

    return occluded


# ===========================================================================
# Traversal v7: bitmask pair records + grouped member sweeps (round-based)
# ===========================================================================
#
# In-render xplane profiles of the v4 kernel on the 4.5M-tri forest showed
# the wall is CONTROL, not compute: every data-dependent decision inside the
# kernel (per-super fresh-t vector-min walks, per-member min-masked-iota
# extraction) serializes a VPU->scalar sync (~1 us), and at 64-ray blocks the
# per-block pending-cluster UNION is 16-42x the per-ray pending set (flop
# dilution).  v7 removes both:
#
#   - RAY BLOCKS SHRINK to RB=8 (one f32 VPU sublane tile): the measured
#     block union drops to 2.75x (camera) / 6.8x (bounce) of the per-ray
#     pending set on the forest;
#   - ALL data-dependent selection moves to XLA, which emits per-block
#     RECORDS of (super id, 128-bit member pend bitmask): exact-capacity
#     [G*SS] scatter — no compaction overflow cases at all;
#   - the kernel walks records with PURE SCALAR control (bit-scan member
#     extraction, ~15 scalar ops/member, no vector->scalar syncs), streams
#     triangle slabs through a 2*GW DMA ring, and evaluates members in
#     GROUPS of GW=8: one [RB,16]x[16,GW*4W] matmul pass + ONE argmin
#     epilogue per group instead of per member;
#   - rounds: a lax.while_loop re-expands records every SS supers per
#     block with FRESH per-ray hit distances, so far clusters behind
#     resolved hits are pruned without any in-kernel early-exit logic
#     (the per-round member test uses t_cur as the ray extent).
#
# Reference semantics: closest-hit/any-hit triangle query of
# src/librender/skdtree.cpp + triaccel.h [unverifiable - mount empty];
# exact linear-MT arithmetic shared with v3/v4 (build_mt_slabs).

PAIR_RB = int(os.environ.get("GDMT_PAIR_RB", "32"))
PAIR_SS = int(os.environ.get("GDMT_PAIR_SS", "16"))
# GW default 32 (round-5 sweep at 1M rays): camera 560 -> 508 ms,
# bounce 1007 -> 899 ms vs GW=8 — wider flush groups mean fewer argmin
# epilogues and a deeper slab-DMA ring (64 x 32 KB = 2 MB VMEM).
PAIR_GW = int(os.environ.get("GDMT_PAIR_GW", "32"))
# RB default 32 (round-5 sweep, tools/sweep_v7.py at 1M rays): camera
# 837 -> 560 ms, bounce 1409 -> 992 ms vs RB=8.  Bigger blocks cut the
# per-block expand/phase1/record overhead faster than the block-union
# growth adds member sweeps.  Hit results differ from RB=8 only at the
# MXU default-precision noise level (99.5% same prim, valid-rate equal;
# interpret mode is exact for every RB).
# Ray BLOCKS per grid STEP: the per-step fixed cost (two sub-KB state
# copies, a record DMA, pipeline bookkeeping — measured ~15 us/step on
# the forest) is 20x the per-block compute.  One step walks NB blocks
# from one record DMA, amortizing the fixed cost NB-fold; the per-BLOCK
# record layout (and so the XLA expand stage) is unchanged.
PAIR_NB = int(os.environ.get("GDMT_PAIR_NB", "32"))
# Any-hit early-out: stop walking a block's records once every lane is
# occluded.  MEASURED SLOWER on the forest (1.72 s vs 1.66 s walls): the
# per-flush vector->scalar sync outweighs the skipped sweeps there, so
# it is opt-in for occlusion-dense scenes.
PAIR_EARLYOUT = os.environ.get("GDMT_ANYHIT_EARLYOUT", "0") == "1"


def _ctz_onehot(low):
    """Index of the single set bit in `low` (scalar i32, two's complement
    safe): sum of mask tests.  ~15 scalar ops, no float tricks."""
    m = jnp.int32(0)
    for shift, mask in ((1, 0xAAAAAAAA), (2, 0xCCCCCCCC),
                        (4, 0xF0F0F0F0), (8, 0xFF00FF00),
                        (16, 0xFFFF0000)):
        mm = jnp.int32(np.int32(np.uint32(mask)))
        m = m + jnp.where((low & mm) != 0, jnp.int32(shift), 0)
    return m


def _v7_kernel(window, n_clusters, any_hit):
    """Grid = STEPS of NB ray blocks.  Scalar prefetch: rc [G] per-block
    record counts.  Inputs: rays [NB*RB,8] / state-in [NB*RB,4] f32 /
    prim-in [NB*RB,1] i32 (blocked), slab table (ANY), record table
    (ANY).  Outputs: state/prim (blocked).  Records: 8-i32 cells =
    (super, bits0..3, pad...), 16 per 128-lane row, RPB rows per block,
    NB*RPB contiguous rows per step (one double-buffered DMA)."""
    W = window
    RB = PAIR_RB
    SS = PAIR_SS
    GW = PAIR_GW
    NB = PAIR_NB
    SC = SUPER_FACTOR

    RPB = SS // 16           # record rows per block (16 records/row)
    NR = NB * RPB            # record rows per step
    assert SS % 16 == 0 and NR % 8 == 0

    def kernel(rc_ref, rays_ref, stin_ref, prin_ref, slab_hbm, rec_hbm,
               stout_ref, prout_ref,
               slab_vmem, slab_sem, kv_smem, rec_smem, rec_sem,
               feat_vmem):
        si = pl.program_id(0)
        NS = pl.num_programs(0)

        # --- record stream: FIXED SLOTS — block b of step si owns rows
        # [si*NR + b*RPB, +RPB) of rec_hbm [G*RPB, 128] i32; empty slots
        # carry bits=0 and are skipped via the rc scalar-prefetch.  Fixed
        # slots kill the XLA-side compaction scatter (measured 24 ms/
        # round at 32k blocks); one NR-row DMA per step, double buffered.
        def rec_start(ss, slot):
            pltpu.make_async_copy(rec_hbm.at[pl.ds(ss * NR, NR)],
                                  rec_smem.at[slot],
                                  rec_sem.at[slot]).start()

        @pl.when(si == 0)
        def _():
            rec_start(0, 0)

        @pl.when(si + 1 < NS)
        def _():
            rec_start(si + 1, (si + 1) % 2)

        # out := in (blocks with no records keep their state)
        stout_ref[:] = stin_ref[:]
        prout_ref[:] = prin_ref[:]

        # --- whole-step ray features (linear-MT lhs), staged to VMEM so
        # per-block flushes can slice rows dynamically.  Two 8-wide
        # planes matching the 8-row slab split (build_mt_slabs): plane 0
        # = (o x d, d) for det|u|v, plane 1 = (o, 1) for t -------------
        ox = rays_ref[:, 0:1]
        oy = rays_ref[:, 1:2]
        oz = rays_ref[:, 2:3]
        dx = rays_ref[:, 3:4]
        dy = rays_ref[:, 4:5]
        dz = rays_ref[:, 5:6]
        zeros = jnp.zeros_like(ox)
        feat_vmem[0] = jnp.concatenate(
            [oy * dz - oz * dy, oz * dx - ox * dz, ox * dy - oy * dx,
             dx, dy, dz, zeros, zeros], axis=1)
        feat_vmem[1] = jnp.concatenate(
            [ox, oy, oz, jnp.ones_like(ox),
             zeros, zeros, zeros, zeros], axis=1)
        lane_g = jax.lax.broadcasted_iota(jnp.int32, (1, GW), 1)

        pltpu.make_async_copy(
            rec_hbm.at[pl.ds(si * NR, NR)],
            rec_smem.at[si % 2], rec_sem.at[si % 2]).wait()

        def flush(b, done, cnt):
            """Sweep block b's members [done, min(done+GW, cnt)): wait
            their slab DMAs, one grouped matmul+epilogue pass.  Returns
            the block's live-lane count AFTER the sweep (any-hit mode:
            lanes not yet occluded; closest mode: constant 1 — early-out
            does not apply because hits only refine t)."""
            half = jax.lax.rem(done // GW, jnp.int32(2))
            nv = jnp.minimum(cnt - done, GW)
            row0 = b * RB

            def wait_body(p, _):
                slot = half * GW + p
                pk = kv_smem[slot]
                pltpu.make_async_copy(slab_hbm.at[pk],
                                      slab_vmem.at[slot],
                                      slab_sem.at[slot]).wait()
                return 0

            jax.lax.fori_loop(0, nv, wait_body, 0)

            featsA = feat_vmem[0, pl.ds(row0, RB), :]
            featsB = feat_vmem[1, pl.ds(row0, RB), :]
            mint = rays_ref[pl.ds(row0, RB), 6:7]
            t_cur = stout_ref[pl.ds(row0, RB), 0:1]

            # grouped linear-MT: GW static sub-sweeps, one shared argmin
            tts = []
            uus = []
            vvs = []
            kvec = jnp.zeros((1, GW), jnp.int32)
            for p in range(GW):
                slot_s = half * GW + p
                FA = jax.lax.dot_general(
                    featsA, slab_vmem[slot_s][:, :3 * W],
                    (((1,), (0,)), ((), ())),
                    precision=jax.lax.Precision.DEFAULT,
                    preferred_element_type=jnp.float32)   # [RB, 3W]
                FB = jax.lax.dot_general(
                    featsB, slab_vmem[slot_s][:, 3 * W:],
                    (((1,), (0,)), ((), ())),
                    precision=jax.lax.Precision.DEFAULT,
                    preferred_element_type=jnp.float32)   # [RB, W]
                den = FA[:, :W]
                r = 1.0 / den
                u = FA[:, W:2 * W] * r
                v = FA[:, 2 * W:3 * W] * r
                t = FB * r
                ok = ((u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) &
                      (t > mint) & (t < t_cur) & (p < nv))
                tts.append(jnp.where(ok, t, F32_MAX))
                if not any_hit:
                    uus.append(u)
                    vvs.append(v)
                    kvec = jnp.where(lane_g == p, kv_smem[slot_s], kvec)
            tt = jnp.concatenate(tts, axis=1)             # [RB, GW*W]
            if any_hit:
                occ = jnp.any(tt < F32_MAX, axis=1, keepdims=True)
                prout_ref[pl.ds(row0, RB), :] = jnp.where(
                    occ, 0, prout_ref[pl.ds(row0, RB), :])
                t_new = jnp.where(occ, -1.0, t_cur)
                stout_ref[pl.ds(row0, RB), 0:1] = t_new
                if not PAIR_EARLYOUT:
                    return jnp.int32(1)
                # early-out signal: count of lanes still unoccluded
                # (dead/padding lanes carry t <= 0 from the start).  One
                # vector->scalar sync per GW-member flush.
                return jnp.sum((t_new > 0.0).astype(jnp.int32))
            else:
                uu = jnp.concatenate(uus, axis=1)
                vv = jnp.concatenate(vvs, axis=1)
                tc = jnp.min(tt, axis=1, keepdims=True)
                better = tc < t_cur
                iw = jax.lax.broadcasted_iota(jnp.int32, tt.shape, 1)
                jm = jnp.min(jnp.where(tt == tc, iw, BIGI),
                             axis=1, keepdims=True)
                first = iw == jm
                uc = jnp.sum(jnp.where(first, uu, 0.0), axis=1,
                             keepdims=True)
                vc = jnp.sum(jnp.where(first, vv, 0.0), axis=1,
                             keepdims=True)
                p_win = jm // W                            # [RB, 1]
                k_win = jnp.sum(
                    jnp.where(lane_g == p_win, kvec, 0), axis=1,
                    keepdims=True)                         # [RB, 1]
                prim_c = k_win * W + jax.lax.rem(jm, jnp.int32(W))
                stout_ref[pl.ds(row0, RB), 0:1] = jnp.where(
                    better, tc, t_cur)
                stout_ref[pl.ds(row0, RB), 1:2] = jnp.where(
                    better, uc, stout_ref[pl.ds(row0, RB), 1:2])
                stout_ref[pl.ds(row0, RB), 2:3] = jnp.where(
                    better, vc, stout_ref[pl.ds(row0, RB), 2:3])
                prout_ref[pl.ds(row0, RB), :] = jnp.where(
                    better, prim_c, prout_ref[pl.ds(row0, RB), :])
                return jnp.int32(1)

        def block_body(b, _):
            rc = rc_ref[si * NB + b]

            def issue(k, cnt, done, alive):
                """Start the slab DMA for member k; flush the oldest
                group first when the 2*GW ring is full (updating the
                any-hit early-out live count)."""
                done, alive = jax.lax.cond(
                    cnt - done == 2 * GW,
                    lambda d, a: (d + GW, flush(b, d, cnt)),
                    lambda d, a: (d, a), done, alive)
                slot = jax.lax.rem(cnt, jnp.int32(2 * GW))
                kv_smem[slot] = k
                pltpu.make_async_copy(slab_hbm.at[k], slab_vmem.at[slot],
                                      slab_sem.at[slot]).start()
                return cnt + 1, done, alive

            def rec_body(carry):
                r, cnt, done, alive = carry
                row = b * RPB + r // 16
                col = jax.lax.rem(r, jnp.int32(16)) * 8
                s = rec_smem[si % 2, row, col]
                for w in range(4):
                    bw0 = rec_smem[si % 2, row, col + 1 + w]

                    def bit_body(c):
                        bw, cnt, done, alive = c
                        low = bw & (-bw)
                        m = _ctz_onehot(low)
                        k = s * SC + w * 32 + m
                        cnt, done, alive = issue(k, cnt, done, alive)
                        return (bw & (bw - 1), cnt, done, alive)

                    def bit_cond(c):
                        live = (c[3] > 0 if any_hit and PAIR_EARLYOUT
                                else True)
                        return (c[0] != 0) & live

                    _, cnt, done, alive = jax.lax.while_loop(
                        bit_cond, bit_body, (bw0, cnt, done, alive))
                return (r + 1, cnt, done, alive)

            def rec_cond(carry):
                r, _, _, alive = carry
                live = (alive > 0 if any_hit and PAIR_EARLYOUT
                        else True)
                return (r < rc) & live

            _, cnt, done, alive = jax.lax.while_loop(
                rec_cond, rec_body,
                (jnp.int32(0), jnp.int32(0), jnp.int32(0), jnp.int32(1)))

            def drain(c):
                # every started DMA must be waited even after early-out;
                # flush both sweeps and waits, so draining is always safe
                cnt, done = c
                flush(b, done, cnt)
                return (cnt, done + GW)

            jax.lax.while_loop(lambda c: c[1] < c[0], drain, (cnt, done))
            return 0

        jax.lax.fori_loop(0, NB, block_body, 0)

    return kernel


def _v7_phase1(rays, G, RB, cbounds):
    """Per-block pending SUPERS, near-to-far: (order [G,S], scnt [G]).
    Same dense per-ray AABB test as _super_worklists, without the bounds
    worklist assembly (v7 re-reads bounds from the member table on the
    XLA side each round instead)."""
    big = jnp.float32(F32_MAX)
    scb = _super_bounds(cbounds)
    S = scb.shape[0]

    def block_pend(blk):
        o = blk[:, 0:3][:, None]
        d = blk[:, 3:6][:, None]
        mint = blk[:, 6][:, None]
        maxt = blk[:, 7][:, None]
        invd = jnp.where(jnp.abs(d) > 1e-12, 1.0 / d, 1e30)
        t0 = (scb[None, :, 0:3] - o) * invd
        t1 = (scb[None, :, 3:6] - o) * invd
        tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
        tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
        # maxt >= mint: dead/padding lanes carry maxt = -1, but an
        # origin sitting >1 unit inside a super's AABB still passes
        # tn <= -1 — without the liveness term those lanes enqueue
        # supers and burn expand rounds + kernel sweeps (ADVICE r4 #3).
        pend = (tn <= tf) & (tf >= mint) & (tn <= maxt) & (maxt >= mint)
        tn_min = jnp.min(jnp.where(pend, jnp.maximum(tn, 0.0), big),
                         axis=0)
        return jnp.any(pend, axis=0), tn_min

    bsz = max(1, min(G, (1 << 23) // max(RB * S, 1)))
    pend, tn_blk = jax.lax.map(block_pend, rays.reshape(G, RB, 8),
                               batch_size=bsz)
    key = jnp.where(pend, tn_blk, big)
    scnt = jnp.sum(pend, axis=1, dtype=jnp.int32)
    # near-to-far order per block: lax.sort along the minor axis (the
    # O(G*S^2) rank-by-comparison used by v4 was the #2 device cost of
    # the whole render at RB=8 block counts — 0.46 ms per 217-row chunk)
    iot = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None], key.shape)
    _, order = jax.lax.sort((key, iot), dimension=1, num_keys=1)
    return order, scnt


def _v7_expand(rays, st, order, scnt, r, mb, G, RB):
    """One round's records: the r-th window of SS supers per block,
    member bitmasks from EXACT per-ray member-AABB tests bounded by the
    current per-ray hit distance (st[:, 0]).  Returns
    (rec2d [G*RPB, 128] i32 — FIXED per-block record slots, 16 records
    of 8 i32 per row, RPB = SS//16 rows per block, compacted within the
    block; rc [G] i32 per-block record counts for the scalar prefetch).

    r is a GLOBAL round index, not a per-block cursor: a per-block
    cursor min(r*SS, scnt) selects exactly the same valid window
    entries (everything at idx >= scnt is masked either way), and the
    global form turns the window select into one dynamic SLICE of the
    order table — the per-block take_along_axis gather it replaces was
    155 ms per two traversal calls (xplane profile, round 5)."""
    SS = PAIR_SS
    SC = SUPER_FACTOR
    # caller pads order's super axis to a multiple of SS, so the last
    # window's slice never clamps (a clamped start would desync sel
    # from the idx-based validity mask)
    idx = r * SS + jnp.arange(SS, dtype=jnp.int32)[None, :]
    valid = idx < scnt[:, None]
    sel = jax.lax.dynamic_slice_in_dim(order, r * SS, SS, axis=1)
    t_cur = st[:, 0].reshape(G, RB)

    def blk_members(args):
        blk, selg, tcg = args                  # [RB,8], [SS], [RB]
        mbs = mb[selg]                         # [SS, 8, SC]
        mint = blk[:, 6]
        # per-axis 2D-friendly formulation: every op's minor axis is SC
        # (the [RB, SS, 3, SC] middle-axis reduce ran at ~3x the cost)
        tn = jnp.full((RB, SS, SC), -jnp.float32(F32_MAX))
        tf = jnp.full((RB, SS, SC), jnp.float32(F32_MAX))
        for ax in range(3):
            dax = blk[:, 3 + ax]
            iax = jnp.where(jnp.abs(dax) > 1e-12, 1.0 / dax, 1e30)
            oo = blk[:, ax, None, None]
            ii = iax[:, None, None]
            lo = (mbs[None, :, 1 + ax, :] - oo) * ii
            hi = (mbs[None, :, 4 + ax, :] - oo) * ii
            tn = jnp.maximum(tn, jnp.minimum(lo, hi))
            tf = jnp.minimum(tf, jnp.maximum(lo, hi))
        pend = ((tn <= tf) & (tf >= mint[:, None, None]) &
                (tn <= tcg[:, None, None]) &
                (tcg[:, None, None] >= mint[:, None, None]) &
                (mbs[None, :, 0, :] >= 0))
        anyp = jnp.any(pend, axis=0)                       # [SS, SC]
        w32 = (jnp.int32(1) << jnp.arange(32, dtype=jnp.int32))
        bits = jnp.sum(anyp.reshape(SS, 4, 32) *
                       w32[None, None, :], axis=-1,
                       dtype=jnp.int32)                    # [SS, 4]
        return bits

    bsz = max(1, (1 << 24) // max(RB * SS * SC, 1))
    bits = jax.lax.map(blk_members,
                       (rays.reshape(G, RB, 8), sel, t_cur),
                       batch_size=bsz)                     # [G, SS, 4]
    bits = jnp.where(valid[:, :, None], bits, 0)
    # FIXED record slots: block g's SS record slots are rows
    # [g*RPB, (g+1)*RPB) of the packed [*, 128] table (16 records x 8
    # i32 per row) — no global compaction scatter (measured 24 ms/round
    # at 32k blocks).  Records ARE compacted WITHIN each block (a cheap
    # [G, SS] 2-key sort, stable so near-to-far order survives) and the
    # per-block count rides a scalar-prefetch so the kernel's record
    # loop runs exactly rc times (empty-slot scalar walks measured
    # ~1.2 s/render at SS=16).
    has = ((bits[..., 0] | bits[..., 1] | bits[..., 2] |
            bits[..., 3]) != 0)                            # [G, SS]
    iot = jnp.broadcast_to(jnp.arange(SS, dtype=jnp.int32)[None],
                           has.shape)
    _, perm = jax.lax.sort(((~has).astype(jnp.int32), iot),
                           dimension=1, num_keys=1)
    rows = jnp.concatenate(
        [sel[..., None], bits,
         jnp.zeros((G, SS, 3), jnp.int32)], axis=-1)       # [G, SS, 8]
    rows = jnp.take_along_axis(rows, perm[:, :, None], axis=1)
    rc = jnp.sum(has, axis=1, dtype=jnp.int32)             # [G]
    RPB = SS // 16
    rec2d = rows.reshape(G * RPB, 128)
    return rec2d, rc


def _v7_run(kernel_fn, window, o, d, mint, maxt, slabs, cbounds):
    RB = PAIR_RB
    SS = PAIR_SS
    NB = PAIR_NB
    N = o.shape[0]
    pad = (-N) % (RB * NB)
    Np = N + pad
    G = Np // RB             # ray blocks (record/expand granularity)
    NS = G // NB             # grid steps
    RPB = SS // 16

    rays = jnp.concatenate(
        [o, d, mint[:, None], maxt[:, None]], axis=1).astype(jnp.float32)
    if pad:
        filler = jnp.concatenate(
            [jnp.zeros((pad, 3)), jnp.ones((pad, 3)),
             jnp.zeros((pad, 1)), jnp.full((pad, 1), -1.0)], axis=1)
        rays = jnp.concatenate([rays, filler.astype(jnp.float32)], axis=0)

    order, scnt = _v7_phase1(rays, G, RB, cbounds)
    # pad the super axis to a multiple of SS so every round's window is
    # a clean dynamic slice (see _v7_expand)
    S = order.shape[1]
    Sp = -(-S // SS) * SS
    if Sp != S:
        order = jnp.concatenate(
            [order, jnp.zeros((G, Sp - S), jnp.int32)], axis=1)
    mb = _member_slabs(cbounds)                            # [S, 8, SC]

    st0 = jnp.concatenate(
        [rays[:, 7:8], jnp.zeros((Np, 3), jnp.float32)], axis=1)
    pr0 = jnp.full((Np, 1), -1, jnp.int32)

    ray_spec = pl.BlockSpec((NB * RB, 8), lambda i, *_: (i, 0),
                            memory_space=pltpu.VMEM)
    st_spec = pl.BlockSpec((NB * RB, 4), lambda i, *_: (i, 0),
                           memory_space=pltpu.VMEM)
    pr_spec = pl.BlockSpec((NB * RB, 1), lambda i, *_: (i, 0),
                           memory_space=pltpu.VMEM)

    def sweep(st, pr, rec, rc):
        return pl.pallas_call(
            kernel_fn,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(NS,),
                in_specs=[ray_spec, st_spec, pr_spec,
                          pl.BlockSpec(memory_space=pl.ANY),
                          pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=[st_spec, pr_spec],
                scratch_shapes=[
                    pltpu.VMEM((2 * PAIR_GW, 8, 4 * window),
                               jnp.float32),
                    pltpu.SemaphoreType.DMA((2 * PAIR_GW,)),
                    pltpu.SMEM((2 * PAIR_GW,), jnp.int32),
                    pltpu.SMEM((2, NB * RPB, 128), jnp.int32),
                    pltpu.SemaphoreType.DMA((2,)),
                    pltpu.VMEM((2, NB * RB, 8), jnp.float32),
                ]),
            out_shape=[jax.ShapeDtypeStruct((Np, 4), jnp.float32),
                       jax.ShapeDtypeStruct((Np, 1), jnp.int32)],
        )(rc, rays, st, pr, slabs, rec)

    max_scnt = jnp.max(scnt)

    def round_body(carry):
        r, st, pr = carry
        rec, rc = _v7_expand(rays, st, order, scnt, r, mb, G, RB)
        st2, pr2 = sweep(st, pr, rec, rc)
        return (r + 1, st2, pr2)

    def round_cond(carry):
        r, _, _ = carry
        return r * SS < max_scnt

    _, st, pr = jax.lax.while_loop(round_cond, round_body,
                                   (jnp.int32(0), st0, pr0))
    return (st[:N, 0], st[:N, 1], st[:N, 2], pr[:N, 0])


def _check_pair_super_factor():
    """The v7 record format packs each super's member pend mask into
    exactly four 32-bit words (`_v7_expand` reshapes to [SS, 4, 32]; the
    kernel scans `w in range(4)`), so the pair kernels require
    SUPER_FACTOR == 128.  Fail with a clear message instead of the
    opaque reshape error an env override would otherwise produce
    (ADVICE r4 #1)."""
    if SUPER_FACTOR != 128:
        raise ValueError(
            f"GDMT_SUPER_FACTOR={SUPER_FACTOR} is incompatible with the "
            "default pair-record kernel (v7), whose 4x32-bit member "
            "bitmasks hardcode 128 members per super.  Use "
            "GDMT_SUPER_FACTOR=128 (default) or select another kernel "
            "with GDMT_KERNEL=v4.")


def make_pair_intersector(window: int, n_clusters: int):
    _check_pair_super_factor()
    kernel = _v7_kernel(window, n_clusters, any_hit=False)

    @jax.jit
    def intersect(o, d, mint, maxt, slabs, cbounds):
        t, u, v, p = _v7_run(kernel, window, o, d, mint, maxt, slabs,
                             cbounds)
        return Hit(t=jnp.where(p >= 0, t, F32_MAX), u=u, v=v, prim=p,
                   valid=p >= 0)

    return intersect


def make_pair_occluder(window: int, n_clusters: int):
    _check_pair_super_factor()
    kernel = _v7_kernel(window, n_clusters, any_hit=True)

    @jax.jit
    def occluded(o, d, mint, maxt, slabs, cbounds):
        _, _, _, p = _v7_run(kernel, window, o, d, mint, maxt, slabs,
                             cbounds)
        return p >= 0

    return occluded
