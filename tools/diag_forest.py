"""Forest traversal diagnostics: where do the 9.4 s go?

Loads the 3M-tri forest (geometry cache makes this ~2 s), builds the two
wavefront shapes that dominate a render (coherent camera rays; incoherent
diffuse-bounce rays), and times each traversal stage separately:

  1. worklist build alone (jitted _super_worklists + coherence sort)
  2. the full Pallas intersector call
  3. per-block worklist length stats + TRUE per-block pending-cluster
     stats (the DMA count the kernel should converge to)

Usage:  python tools/diag_forest.py [size] [--cpu]
"""
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

if "--cpu" in sys.argv:
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax
import jax.numpy as jnp
import numpy as np

from gradientdomain_mitsuba_tpu.scene import scene as sc
from gradientdomain_mitsuba_tpu.ops import pallas_trace as ptr
from gradientdomain_mitsuba_tpu.ops import common as com
from gradientdomain_mitsuba_tpu.ops import sensor as sen
from gradientdomain_mitsuba_tpu.core import rng as rng_mod


def sync(x):
    """True sync: HOST-READ one element of every leaf — on the axon
    tunnel block_until_ready() can return before execution finishes."""
    for a in jax.tree_util.tree_leaves(x):
        if hasattr(a, "addressable_data"):
            np.asarray(jax.device_get(a.ravel()[:1] if a.ndim else a))
    return x


def timeit(label, fn, *a, reps=3):
    fn(*a)  # compile
    sync(fn(*a))
    best = 1e30
    for _ in range(reps):
        t0 = time.time()
        sync(fn(*a))
        best = min(best, time.time() - t0)
    print(f"  {label}: {best * 1e3:.1f} ms")
    return best


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() \
        else 256
    t0 = time.time()
    scene, st = sc.load_scene(
        os.path.join(ROOT, "data/scenes/forest/forest.xml"),
        {"width": str(size), "height": str(size), "spp": "4",
         "maxDepth": "5"})
    print(f"load {time.time() - t0:.1f}s; window={st.cluster_window} "
          f"K={scene.geom.clusters.offset.shape[0]} "
          f"tris={scene.geom.tris.v0.shape[0]}")
    scene = jax.device_put(scene)
    K = scene.geom.clusters.offset.shape[0]
    W = st.cluster_window
    N = size * size

    # --- wavefront 1: camera rays ---------------------------------------
    key = jnp.arange(N, dtype=jnp.uint32)
    u = rng_mod.uniform_2d(jnp.uint32(1), key, key * 0, jnp.uint32(0))
    xy = jnp.stack([key % size, key // size], 1).astype(jnp.float32) + u
    o_cam, d_cam = sen.sample_ray(scene.camera, size, size, xy,
                                  jnp.zeros((N, 2)))[:2]
    mint = jnp.zeros(N)
    maxt = jnp.full(N, 3e38)

    closest, occl = com.choose_intersector(st, scene.geom.tris.v0.shape[0],
                                           K)

    print("== camera rays ==")
    t_cam = timeit("full intersect", lambda: closest(
        o_cam, d_cam, mint, maxt, scene.geom))
    hit = closest(o_cam, d_cam, mint, maxt, scene.geom)
    hit = sync(hit)
    frac = float(jnp.mean(hit.valid.astype(jnp.float32)))
    print(f"  hit rate {frac:.3f}")

    # --- wavefront 2: diffuse bounce rays from the hits -----------------
    p = o_cam + d_cam * jnp.where(hit.valid, hit.t, 1.0)[:, None]
    k2 = rng_mod.uniform_2d(jnp.uint32(2), key, key * 0, jnp.uint32(1))
    z = 1.0 - 2.0 * k2[:, 0]
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = 2 * np.pi * k2[:, 1]
    d2 = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], 1)
    maxt2 = jnp.where(hit.valid, 3e38, -1.0)
    print("== bounce rays ==")
    t_bnc = timeit("full intersect", lambda: closest(
        p, d2, jnp.full(N, 1e-3), maxt2, scene.geom))

    # --- stage split: worklist build vs kernel ---------------------------
    RBLK = ptr.MT_RBLK
    cb = jnp.asarray(scene.geom.cbounds)

    @jax.jit
    def build_wl(o, d, mi, ma):
        bmin = cb[:, 0:3].min(0)
        bmax = cb[:, 3:6].max(0)
        so, sd, smi, sma, inv = ptr.sort_rays(o, d, mi, ma, bmin, bmax)
        pad = (-N) % RBLK
        rays = jnp.concatenate([so, sd, smi[:, None], sma[:, None]], 1)
        if pad:
            filler = jnp.concatenate(
                [jnp.zeros((pad, 3)), jnp.ones((pad, 3)),
                 jnp.zeros((pad, 1)), jnp.full((pad, 1), -1.0)], 1)
            rays = jnp.concatenate([rays, filler.astype(jnp.float32)], 0)
        G = rays.shape[0] // RBLK
        return ptr._super_worklists(rays, G, RBLK, cb)

    for label, (o, d, mi, ma) in (
            ("camera", (o_cam, d_cam, mint, maxt)),
            ("bounce", (p, d2, jnp.full(N, 1e-3), maxt2))):
        print(f"== {label}: stage split ==")
        timeit("worklist build+sort", lambda: build_wl(o, d, mi, ma))
        counts, work = sync(build_wl(o, d, mi, ma))
        counts = np.asarray(counts)
        print(f"  worklist entries/block: mean {counts.mean():.0f} "
              f"median {np.median(counts):.0f} max {counts.max()} "
              f"(K={K}, NCH={work.shape[1]})")

        # TRUE per-block pending clusters (what the kernel should DMA):
        # chunked dense per-ray AABB test at CLUSTER granularity
        bmin = cb[:, 0:3].min(0)
        bmax = cb[:, 3:6].max(0)
        so, sd, smi, sma, _ = sync(ptr.sort_rays(o, d, mi, ma, bmin,
                                                 bmax))
        pad = (-N) % RBLK
        rays = jnp.concatenate([so, sd, smi[:, None], sma[:, None]], 1)
        if pad:
            filler = jnp.concatenate(
                [jnp.zeros((pad, 3)), jnp.ones((pad, 3)),
                 jnp.zeros((pad, 1)), jnp.full((pad, 1), -1.0)], 1)
            rays = jnp.concatenate([rays, filler.astype(jnp.float32)], 0)
        G = rays.shape[0] // RBLK

        @jax.jit
        def true_pending(rays):
            def blk(b):                      # [RBLK, 8]
                o = b[:, 0:3][:, None]
                d = b[:, 3:6][:, None]
                mi = b[:, 6][:, None]
                ma = b[:, 7][:, None]
                invd = jnp.where(jnp.abs(d) > 1e-12, 1.0 / d, 1e30)
                t0 = (cb[None, :, 0:3] - o) * invd
                t1 = (cb[None, :, 3:6] - o) * invd
                tn = jnp.max(jnp.minimum(t0, t1), -1)
                tf = jnp.min(jnp.maximum(t0, t1), -1)
                pend = (tn <= tf) & (tf >= mi) & (tn <= ma)
                return (jnp.sum(jnp.any(pend, 0)),      # block union
                        jnp.sum(pend, 1).mean())        # per-ray mean
            return jax.lax.map(blk, rays.reshape(G, RBLK, 8),
                               batch_size=max(1, (1 << 22) // (RBLK * K)))
        blk_pend, ray_pend = sync(true_pending(rays))
        blk_pend = np.asarray(blk_pend)
        print(f"  TRUE pending clusters/block: mean {blk_pend.mean():.0f} "
              f"max {blk_pend.max()}  per-RAY mean "
              f"{float(np.asarray(ray_pend).mean()):.1f}")
        dma_bytes = blk_pend.sum() * 16 * 4 * W * 4
        print(f"  => slab DMA if exact: {dma_bytes / 1e9:.2f} GB; "
              f"matmul flops {blk_pend.sum() * 2 * RBLK * 16 * 4 * W / 1e12:.2f} TF")


if __name__ == "__main__":
    main()
