"""v7 pair-kernel stage split on the forest: phase1 (super pend+sort),
expand (per-round record build), sweep (the Pallas kernel alone), and the
full round loop — so the next optimization targets the measured wall, not
a guess.

Usage:  python tools/diag_v7.py [size] [--cpu]
Env:    GDMT_PAIR_RB / GDMT_PAIR_SS / GDMT_PAIR_NB as in pallas_trace.
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
from gradientdomain_mitsuba_tpu.ops import sensor as sen
from gradientdomain_mitsuba_tpu.core import rng as rng_mod


def sync(x):
    for a in jax.tree_util.tree_leaves(x):
        if hasattr(a, "addressable_data"):
            np.asarray(jax.device_get(a.ravel()[:1] if a.ndim else a))
    return x


def timeit(label, fn, *a, reps=3):
    t0 = time.time()
    sync(fn(*a))
    print(f"  {label}: compile+first {time.time() - t0:.1f}s", flush=True)
    best = 1e30
    for _ in range(reps):
        t0 = time.time()
        sync(fn(*a))
        best = min(best, time.time() - t0)
    print(f"  {label}: {best * 1e3:.1f} ms", flush=True)
    return best


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() \
        else 256
    t0 = time.time()
    scene, st = sc.load_scene(
        os.path.join(ROOT, "data/scenes/forest/forest.xml"),
        {"width": str(size), "height": str(size), "spp": "4",
         "maxDepth": "5"})
    scene = jax.device_put(scene)
    K = scene.geom.clusters.offset.shape[0]
    W = st.cluster_window
    n_tris = scene.geom.tris.v0.shape[0]
    print(f"load {time.time() - t0:.1f}s; window={W} K={K} tris={n_tris} "
          f"RB={ptr.PAIR_RB} SS={ptr.PAIR_SS} NB={ptr.PAIR_NB}",
          flush=True)

    N = size * size
    RB = ptr.PAIR_RB
    NB = ptr.PAIR_NB
    slabs = scene.geom.mt_slabs
    cbounds = jnp.asarray(scene.geom.cbounds)

    key = jnp.arange(N, dtype=jnp.uint32)
    u = rng_mod.uniform_2d(jnp.uint32(1), key, key * 0, jnp.uint32(0))
    xy = jnp.stack([key % size, key // size], 1).astype(jnp.float32) + u
    o_cam, d_cam = sen.sample_ray(scene.camera, size, size, xy,
                                  jnp.zeros((N, 2)))[:2]
    mint = jnp.zeros(N)
    maxt = jnp.full(N, 3e38)

    closest = ptr.make_pair_intersector(W, K)
    hit = sync(closest(o_cam, d_cam, mint, maxt, slabs, cbounds))
    p = o_cam + d_cam * jnp.where(hit.valid, hit.t, 1.0)[:, None]
    k2 = rng_mod.uniform_2d(jnp.uint32(2), key, key * 0, jnp.uint32(1))
    z = 1.0 - 2.0 * k2[:, 0]
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = 2 * np.pi * k2[:, 1]
    d2 = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], 1)
    mint2 = jnp.full(N, 1e-3)
    maxt2 = jnp.where(hit.valid, 3e38, -1.0)

    # stage fns (mirror _v7_run internals)
    def prep(o, d, mi, ma):
        pad = (-N) % (RB * NB)
        rays = jnp.concatenate(
            [o, d, mi[:, None], ma[:, None]], 1).astype(jnp.float32)
        if pad:
            filler = jnp.concatenate(
                [jnp.zeros((pad, 3)), jnp.ones((pad, 3)),
                 jnp.zeros((pad, 1)), jnp.full((pad, 1), -1.0)], 1)
            rays = jnp.concatenate([rays, filler.astype(jnp.float32)], 0)
        return rays

    G = (N + (-N) % (RB * NB)) // RB

    phase1 = jax.jit(lambda rays: ptr._v7_phase1(rays, G, RB, cbounds))
    mb = jax.jit(ptr._member_slabs)(cbounds)

    @jax.jit
    def expand1(rays, order, scnt):
        Np = rays.shape[0]
        st0 = jnp.concatenate(
            [rays[:, 7:8], jnp.zeros((Np, 3), jnp.float32)], 1)
        SS = ptr.PAIR_SS
        S = order.shape[1]
        Sp = -(-S // SS) * SS
        if Sp != S:
            order = jnp.concatenate(
                [order, jnp.zeros((order.shape[0], Sp - S), jnp.int32)],
                axis=1)
        return ptr._v7_expand(rays, st0, order, scnt, jnp.int32(0), mb,
                              G, RB)

    for label, (o, d, mi, ma) in (
            ("camera", (o_cam, d_cam, mint, maxt)),
            ("bounce", (p, d2, mint2, maxt2))):
        print(f"== {label} ==", flush=True)
        rays = sync(prep(o, d, mi, ma))
        timeit("full intersect", closest, o, d, mi, ma, slabs, cbounds)
        timeit("phase1 (pend+sort)", phase1, rays)
        order, scnt = phase1(rays)
        sn = np.asarray(scnt)
        print(f"  pending supers/block: mean {sn.mean():.1f} "
              f"median {np.median(sn):.0f} max {sn.max()} "
              f"rounds(SS={ptr.PAIR_SS}): "
              f"mean {np.ceil(sn / ptr.PAIR_SS).mean():.2f} "
              f"max {int(np.ceil(sn.max() / ptr.PAIR_SS))}", flush=True)
        timeit("expand (round 1)", expand1, rays, order, scnt)
        rec, rc = expand1(rays, order, scnt)
        rcn = np.asarray(rc)
        print(f"  records/block (round 1): mean {rcn.mean():.1f} "
              f"max {rcn.max()}", flush=True)
        bits = (np.asarray(rec).reshape(-1, 16, 8)[:, :, 1:5]
                .astype(np.int64) & 0xFFFFFFFF)
        popc = np.vectorize(lambda x: bin(int(x)).count("1"))
        members = popc(bits).sum()
        print(f"  member visits (round 1): {members} "
              f"({members / G:.1f}/block)", flush=True)


if __name__ == "__main__":
    main()
