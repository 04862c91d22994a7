"""Fused Pallas linear-MT sweep for small scenes (the headline hot path).

TPU-native replacement for the same role TriAccel plays in Mitsuba's
small-scene traversal (src/librender/skdtree.cpp leaf tests, triaccel.h):
closest-hit / any-hit of a ray wavefront against the WHOLE triangle soup.

The jnp formulation (ops/intersect.py intersect_matmul) lowers to an XLA
program that materializes the [N, 4T] linear-MT term matrix in HBM and
re-reads it for every epilogue pass — measured 1.3 ms per 64k-ray
traversal on v5e for a 36-triangle scene whose roofline is ~30 us.  This
kernel fuses the feature build, the MXU coefficient matmul, and the whole
hit-selection epilogue into one VMEM-resident pass:

  - rays ride TRANSPOSED [8, N] (rows o.xyz d.xyz mint maxt) so every
    per-ray quantity is a full-lane [1, TILE] row and the per-triangle
    term tiles are [Ct, TILE] (triangles on sublanes, rays on lanes);
  - the coefficient matrix is pre-chunked host-side into
    [n_chunks, 4*Ct, 16] (det | u_num | v_num | t_num row blocks per
    chunk, feature dim padded 10 -> 16) so each chunk is ONE
    [4Ct, 16] @ [16, TILE] MXU dot whose [4Ct, TILE] output never
    leaves VMEM;
  - hit selection (divide-first Moeller-Trumbore test, sublane min,
    first-winner index + barycentrics) happens on the same tile;
    chunks merge through a running (t, u, v, prim) best.

Per 64k rays the HBM traffic is ~2.5 MB total (rays in, hits out,
coefficients once) instead of >150 MB.  Padding triangles have all-zero
columns => det = 0 => u = 0 * inf = NaN fails every comparison (closest)
and ad = 0 fails ok (any-hit), exactly like the jnp sweeps.

MEASURED (v5e, round 3): at 64k-lane batches the win is hidden by per-op
dispatch overhead, but at the 256k-lane batches GDMT_LANES now defaults
to, the headline cbox G-PT render drops 1.33 s -> 0.73 s (49.6 -> 90.3
Mrays/s measured) when this kernel replaces the jnp matmul sweep — wired
into choose_intersector for small scenes on TPU (GDMT_PALLAS_SWEEP=0
restores the jnp sweep).  Correctness is pinned by the interpret-mode
test in tests/test_pallas.py plus the whole default suite running both
paths (CPU uses the jnp sweep; TPU this one).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .intersect import Hit

F32_MAX = np.float32(3.0e38)
TILE = 2048        # max rays per grid step (lane-dim blocks of [8, N])
CHUNK_T = 512      # triangles per MXU dot
KDIM = 16          # feature rows, 10 real + 6 zero pad (sublane granule)
F_TILE_BYTES = 4 << 20  # cap on the [4*Ct, tile] f32 MXU output tile:
#   with the epilogue temps (~4 more [Ct, tile] arrays) this keeps the
#   kernel inside the ~16 MB v5e VMEM budget at every soup size
#   (ADVICE r3: Ct=512 x tile=2048 was 16.8 MB for F alone)


def _lane_tile(Ct: int) -> int:
    """Rays per grid step such that the MXU output tile stays under
    F_TILE_BYTES (4*Ct*tile*4 bytes), floored to the 128-lane granule,
    clamped to [512, TILE]."""
    t = F_TILE_BYTES // (16 * max(Ct, 1))
    return int(max(512, min(TILE, (t // 128) * 128)))


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _feats(rays_ref):
    """[KDIM, TILE] feature tile from the [8, TILE] ray block: rows
    cross(o,d).xyz | d.xyz | o.xyz | 1 | zeros — matches the column
    order of ops/intersect.build_linear_mt."""
    o = rays_ref[0:3, :]
    d = rays_ref[3:6, :]
    ox, oy, oz = o[0:1], o[1:2], o[2:3]
    dx, dy, dz = d[0:1], d[1:2], d[2:3]
    cx = oy * dz - oz * dy
    cy = oz * dx - ox * dz
    cz = ox * dy - oy * dx
    one = jnp.ones_like(ox)
    zero = jnp.zeros((KDIM - 10,) + ox.shape[1:], ox.dtype)
    return jnp.concatenate(
        [cx, cy, cz, dx, dy, dz, ox, oy, oz, one, zero], axis=0)


def _sweep_kernel(n_chunks, Ct, a_ref, rays_ref, out_ref):
    f = _feats(rays_ref)
    mint = rays_ref[6:7, :]
    maxt = rays_ref[7:8, :]

    best_t = jnp.full(mint.shape, F32_MAX)
    best_u = jnp.zeros_like(mint)
    best_v = jnp.zeros_like(mint)
    best_j = jnp.full(mint.shape, jnp.float32(-1.0))
    big = jnp.int32(2 ** 30)

    for c in range(n_chunks):
        F = jax.lax.dot(a_ref[c], f, precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32)
        d_inv = 1.0 / F[0:Ct]
        u = F[Ct:2 * Ct] * d_inv
        v = F[2 * Ct:3 * Ct] * d_inv
        t = F[3 * Ct:4 * Ct] * d_inv
        ok = ((u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) &
              (t > mint) & (t < maxt))
        tt = jnp.where(ok, t, F32_MAX)
        tm = jnp.min(tt, axis=0, keepdims=True)                 # [1, TILE]
        iota = jax.lax.broadcasted_iota(jnp.int32, tt.shape, 0) + c * Ct
        sel = ok & (tt == tm)
        j = jnp.min(jnp.where(sel, iota, big), axis=0, keepdims=True)
        first = sel & (iota == j)
        us = jnp.sum(jnp.where(first, u, 0.0), axis=0, keepdims=True)
        vs = jnp.sum(jnp.where(first, v, 0.0), axis=0, keepdims=True)
        better = tm < best_t
        best_t = jnp.where(better, tm, best_t)
        best_u = jnp.where(better, us, best_u)
        best_v = jnp.where(better, vs, best_v)
        best_j = jnp.where(better, j.astype(jnp.float32), best_j)

    out_ref[0:1, :] = best_t
    out_ref[1:2, :] = best_u
    out_ref[2:3, :] = best_v
    out_ref[3:4, :] = best_j


def _occl_kernel(n_chunks, Ct, a_ref, rays_ref, out_ref):
    f = _feats(rays_ref)
    mint = rays_ref[6:7, :]
    maxt = rays_ref[7:8, :]
    any_hit = jnp.zeros(mint.shape, jnp.float32)
    for c in range(n_chunks):
        F = jax.lax.dot(a_ref[c], f, precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32)
        det = F[0:Ct]
        s = jnp.sign(det)
        ad = det * s
        su = F[Ct:2 * Ct] * s
        sv = F[2 * Ct:3 * Ct] * s
        st = F[3 * Ct:4 * Ct] * s
        ok = ((su >= 0.0) & (sv >= 0.0) & (su + sv <= ad) & (ad > 0.0) &
              (st > mint * ad) & (st < maxt * ad))
        any_hit = jnp.maximum(any_hit,
                              jnp.max(ok.astype(jnp.float32), axis=0,
                                      keepdims=True))
    out_ref[0:1, :] = any_hit


def _prep_coeffs(linC, Tp, Ct):
    """linC [10, 4T] -> [n_chunks, 4*Ct, KDIM] chunked row blocks.
    Tp may be SMALLER than linC's own column padding (the scene builder
    pads the soup to 128; the epilogue's VPU cost is linear in Tp, so
    the kernel trims to the 8-row granule above the real count —
    trimmed padding rows are all-zero columns that never hit anyway)."""
    T = linC.shape[1] // 4
    blocks = jnp.stack([linC[:, 0:T], linC[:, T:2 * T],
                        linC[:, 2 * T:3 * T], linC[:, 3 * T:]], 0)
    if Tp > T:
        blocks = jnp.concatenate(
            [blocks, jnp.zeros((4, 10, Tp - T), linC.dtype)], axis=2)
    elif Tp < T:
        blocks = blocks[:, :, :Tp]
    a = jnp.transpose(blocks, (0, 2, 1))                    # [4, Tp, 10]
    a = jnp.concatenate([a, jnp.zeros((4, Tp, KDIM - 10), a.dtype)], 2)
    nch = Tp // Ct
    a = a.reshape(4, nch, Ct, KDIM).transpose(1, 0, 2, 3)
    return a.reshape(nch, 4 * Ct, KDIM)


def _pack_rays(o, d, mint, maxt, Np):
    N = o.shape[0]
    rays = jnp.concatenate(
        [o.T, d.T, mint[None], maxt[None]], axis=0).astype(jnp.float32)
    if Np > N:
        # padding rays: d = 1s, maxt = -1 (miss everything cheaply)
        filler = jnp.concatenate(
            [jnp.zeros((3, Np - N)), jnp.ones((3, Np - N)),
             jnp.zeros((1, Np - N)), jnp.full((1, Np - N), -1.0)], axis=0)
        rays = jnp.concatenate([rays, filler.astype(jnp.float32)], axis=1)
    return rays


def _sweep_call(kernel, n_out_rows, n_chunks, Ct, a, rays, Np):
    tile = _lane_tile(Ct)
    grid = Np // tile
    return pl.pallas_call(
        functools.partial(kernel, n_chunks, Ct),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((n_chunks, 4 * Ct, KDIM), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n_out_rows, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_out_rows, Np), jnp.float32),
    )(a, rays)


def _chunking(n_tris, linC):
    """Chunk sizes from the REAL triangle count (8-row granule): the
    scene builder pads linC to 128 columns per block, but the epilogue's
    VPU cost is linear in the padded count, so trim to the real soup
    (capped by linC's own static width)."""
    T = min(linC.shape[1] // 4, _round_up(max(n_tris, 8), 64))
    Ct = min(CHUNK_T, T)
    Tp = _round_up(T, Ct)
    return Tp // Ct, Ct, Tp


def make_sweep_intersector(n_tris: int):
    """Closest-hit over the whole soup via the fused Pallas sweep.
    Signature matches intersect_matmul: (o, d, mint, maxt, linC) -> Hit."""

    def closest(o, d, mint, maxt, linC):
        n_chunks, Ct, Tp = _chunking(n_tris, linC)
        N = o.shape[0]
        Np = _round_up(N, _lane_tile(Ct))
        rays = _pack_rays(o, d, mint, maxt, Np)
        a = _prep_coeffs(linC, Tp, Ct)
        out = _sweep_call(_sweep_kernel, 8, n_chunks, Ct, a, rays, Np)
        t = out[0, :N]
        valid = t < F32_MAX
        prim = out[3, :N].astype(jnp.int32)
        return Hit(t=t, u=out[1, :N], v=out[2, :N],
                   prim=jnp.where(valid, prim, -1), valid=valid)

    return closest


def make_sweep_occluder(n_tris: int):
    """Any-hit variant (sign-fixed test, no divisions)."""

    def occluded(o, d, mint, maxt, linC):
        n_chunks, Ct, Tp = _chunking(n_tris, linC)
        N = o.shape[0]
        Np = _round_up(N, _lane_tile(Ct))
        rays = _pack_rays(o, d, mint, maxt, Np)
        a = _prep_coeffs(linC, Tp, Ct)
        out = _sweep_call(_occl_kernel, 8, n_chunks, Ct, a, rays, Np)
        return out[0, :N] > 0.0

    return occluded
