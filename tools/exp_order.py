"""Experiment: how much does ray ORDER alone buy the forest traversal?

Builds the same camera/bounce wavefronts as diag_forest, then times the
Pallas intersector under different lane orders (host-side argsort — zero
in-jit cost, isolates the coherence win from the sort cost):

  scan    : image scanline order (status quo)
  morton  : pixel Morton order (static permutation — free at raygen)
  oct     : (direction octant, scanline) order
  oct+mor : (direction octant, origin morton) order   <- the full key

Also reports the TRUE per-block pending-cluster union for each order —
the kernel's member-visit count is proportional to it.

Usage: python tools/exp_order.py [size]
"""
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax
import jax.numpy as jnp
import numpy as np

from gradientdomain_mitsuba_tpu.scene import scene as sc
from gradientdomain_mitsuba_tpu.ops import pallas_trace as ptr
from gradientdomain_mitsuba_tpu.ops import common as com
from gradientdomain_mitsuba_tpu.ops import sensor as sen
from gradientdomain_mitsuba_tpu.core import rng as rng_mod


def sync(x):
    for a in jax.tree_util.tree_leaves(x):
        if hasattr(a, "addressable_data"):
            np.asarray(jax.device_get(a.ravel()[:1] if a.ndim else a))
    return x


def timeit(fn, *a, reps=3):
    sync(fn(*a))
    best = 1e30
    for _ in range(reps):
        t0 = time.time()
        sync(fn(*a))
        best = min(best, time.time() - t0)
    return best * 1e3


def part1by1(x):
    x = x & 0xFFFF
    x = (x | (x << 8)) & 0x00FF00FF
    x = (x | (x << 4)) & 0x0F0F0F0F
    x = (x | (x << 2)) & 0x33333333
    x = (x | (x << 1)) & 0x55555555
    return x


def block_union_stats(o, d, mint, maxt, cb, RBLK):
    N = o.shape[0]
    G = N // RBLK
    K = cb.shape[0]

    @jax.jit
    def pend_stats(o, d, mi, ma):
        def blk(args):
            o, d, mi, ma = args
            invd = jnp.where(jnp.abs(d) > 1e-12, 1.0 / d, 1e30)
            t0 = (cb[None, :, 0:3] - o[:, None]) * invd[:, None]
            t1 = (cb[None, :, 3:6] - o[:, None]) * invd[:, None]
            tn = jnp.max(jnp.minimum(t0, t1), -1)
            tf = jnp.min(jnp.maximum(t0, t1), -1)
            pend = (tn <= tf) & (tf >= mi[:, None]) & (tn <= ma[:, None])
            return jnp.sum(jnp.any(pend, 0))
        return jax.lax.map(
            blk, (o.reshape(G, RBLK, 3), d.reshape(G, RBLK, 3),
                  mi.reshape(G, RBLK), ma.reshape(G, RBLK)),
            batch_size=max(1, (1 << 21) // (RBLK * K)))

    mi, ma = mint, maxt
    u = np.asarray(sync(pend_stats(o, d, mi, ma)))
    return u.mean(), u.max()


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    scene, st = sc.load_scene(
        os.path.join(ROOT, "data/scenes/forest/forest.xml"),
        {"width": str(size), "height": str(size), "spp": "4",
         "maxDepth": "5"})
    scene = jax.device_put(scene)
    K = scene.geom.clusters.offset.shape[0]
    N = size * size
    RBLK = ptr.MT_RBLK
    cb = jnp.asarray(scene.geom.cbounds)
    cbn = np.asarray(scene.geom.cbounds)
    bmin = cbn[:, 0:3].min(0)
    bmax = cbn[:, 3:6].max(0)

    key = jnp.arange(N, dtype=jnp.uint32)
    u = rng_mod.uniform_2d(jnp.uint32(1), key, key * 0, jnp.uint32(0))
    xy = jnp.stack([key % size, key // size], 1).astype(jnp.float32) + u
    o_cam, d_cam = sen.sample_ray(scene.camera, size, size, xy,
                                  jnp.zeros((N, 2)))[:2]
    mint = jnp.zeros(N)
    maxt = jnp.full(N, 3e38)
    closest, occl = com.choose_intersector(st, scene.geom.tris.v0.shape[0],
                                           K)
    hit = sync(closest(o_cam, d_cam, mint, maxt, scene.geom))
    p = o_cam + d_cam * jnp.where(hit.valid, hit.t, 1.0)[:, None]
    k2 = rng_mod.uniform_2d(jnp.uint32(2), key, key * 0, jnp.uint32(1))
    z = 1.0 - 2.0 * k2[:, 0]
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = 2 * np.pi * k2[:, 1]
    d2 = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], 1)
    mint2 = jnp.full(N, 1e-3)
    maxt2 = jnp.where(hit.valid, 3e38, -1.0)

    px = np.arange(N, dtype=np.uint32) % size
    py = np.arange(N, dtype=np.uint32) // size
    morton_px = part1by1(px) | (part1by1(py) << 1)

    def octant(d):
        d = np.asarray(d)
        return ((d[:, 0] < 0) * 4 + (d[:, 1] < 0) * 2 +
                (d[:, 2] < 0) * 1).astype(np.uint32)

    def omorton(o):
        o = np.asarray(o)
        q = np.clip((o - bmin) / np.maximum(bmax - bmin, 1e-6) * 1023.0,
                    0, 1023).astype(np.uint32)

        def p12(x):
            x &= 0x3ff
            x = (x | (x << 16)) & 0x30000ff
            x = (x | (x << 8)) & 0x300f00f
            x = (x | (x << 4)) & 0x30c30c3
            x = (x | (x << 2)) & 0x9249249
            return x
        return p12(q[:, 0]) | (p12(q[:, 1]) << 1) | (p12(q[:, 2]) << 2)

    for label, (o, d, mi, ma) in (
            ("camera", (o_cam, d_cam, mint, maxt)),
            ("bounce", (p, d2, mint2, maxt2))):
        on, dn = np.asarray(o), np.asarray(d)
        orders = {
            "scan   ": np.arange(N),
            "morton ": np.argsort(morton_px, kind="stable"),
            "oct    ": np.argsort(octant(dn), kind="stable"),
            "octmor ": np.argsort(
                (octant(dn).astype(np.uint64) << 32)
                | omorton(on).astype(np.uint64), kind="stable"),
            "octpix ": np.argsort(
                (octant(dn).astype(np.uint64) << 32)
                | morton_px.astype(np.uint64), kind="stable"),
        }
        print(f"== {label} ==")
        for name, perm in orders.items():
            op = jnp.asarray(on[perm])
            dp = jnp.asarray(dn[perm])
            mip = jnp.asarray(np.asarray(mi)[perm])
            map_ = jnp.asarray(np.asarray(ma)[perm])
            ms = timeit(lambda: closest(op, dp, mip, map_, scene.geom))
            um, ux = block_union_stats(op, dp, mip, map_, cb, RBLK)
            print(f"  {name}: {ms:7.1f} ms   union/block mean {um:6.1f} "
                  f"max {ux}")


if __name__ == "__main__":
    main()
