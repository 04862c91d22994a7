"""Parameter sweep for the v7 pair-record traversal on the forest.

Times raw closest-hit traversal (camera + one diffuse bounce wavefront)
at a 1M-lane amortized shape for a grid of (RB, SS, NB) configurations,
reloading pallas_trace between configs so the env knobs take effect —
all in ONE process, because every process exit wedges the tunneled TPU
runtime for minutes (tools/NOTES_r4_forest_hang.md).

Usage:  python tools/sweep_v7.py [n_rays_log2=20]
"""
import importlib
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax
import jax.numpy as jnp
import numpy as np

from gradientdomain_mitsuba_tpu.scene import scene as sc
from gradientdomain_mitsuba_tpu.ops import sensor as sen
from gradientdomain_mitsuba_tpu.core import rng as rng_mod


def sync(x):
    for a in jax.tree_util.tree_leaves(x):
        if hasattr(a, "addressable_data"):
            np.asarray(jax.device_get(a.ravel()[:1] if a.ndim else a))
    return x


CONFIGS = [
    # (RB, SS, NB) — RB*NB must keep grid steps integral; SS % 16 == 0
    (8, 16, 32),    # current default
    (8, 16, 64),
    (8, 16, 128),
    (8, 32, 32),
    (16, 16, 32),
    (16, 16, 64),
    (16, 32, 32),
    (32, 16, 32),
]


def main():
    n = 1 << (int(sys.argv[1]) if len(sys.argv) > 1 else 20)
    scene, st = sc.load_scene(
        os.path.join(ROOT, "data/scenes/forest/forest.xml"),
        {"width": "256", "height": "256", "spp": "4", "maxDepth": "5"})
    scene = jax.device_put(scene)
    K = scene.geom.clusters.offset.shape[0]
    W = st.cluster_window
    slabs = scene.geom.mt_slabs
    cbounds = jnp.asarray(scene.geom.cbounds)
    print(f"sweep: {n} rays, window={W}, K={K}", flush=True)

    size = 256
    key = jnp.arange(n, dtype=jnp.uint32)
    u = rng_mod.uniform_2d(jnp.uint32(1), key, key * 0, jnp.uint32(0))
    xy = jnp.stack([(key % size), (key // size) % size],
                   1).astype(jnp.float32) + u
    o_cam, d_cam = sen.sample_ray(scene.camera, size, size, xy,
                                  jnp.zeros((n, 2)))[:2]
    mint0 = jnp.zeros(n)
    maxt0 = jnp.full(n, 3e38)

    # bounce wavefront from the default config's camera hits
    from gradientdomain_mitsuba_tpu.ops import pallas_trace as ptr0
    closest0 = ptr0.make_pair_intersector(W, K)
    hit = sync(closest0(o_cam, d_cam, mint0, maxt0, slabs, cbounds))
    p = o_cam + d_cam * jnp.where(hit.valid, hit.t, 1.0)[:, None]
    k2 = rng_mod.uniform_2d(jnp.uint32(2), key, key * 0, jnp.uint32(1))
    z = 1.0 - 2.0 * k2[:, 0]
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = 2 * np.pi * k2[:, 1]
    d_b = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], 1)
    mint_b = jnp.full(n, 1e-3)
    maxt_b = jnp.where(hit.valid, 3e38, -1.0)
    ref = np.asarray(hit.prim)

    for rb, ss, nb in CONFIGS:
        os.environ["GDMT_PAIR_RB"] = str(rb)
        os.environ["GDMT_PAIR_SS"] = str(ss)
        os.environ["GDMT_PAIR_NB"] = str(nb)
        import gradientdomain_mitsuba_tpu.ops.pallas_trace as ptr
        importlib.reload(ptr)
        try:
            closest = ptr.make_pair_intersector(W, K)
            t0 = time.time()
            h = sync(closest(o_cam, d_cam, mint0, maxt0, slabs, cbounds))
            comp = time.time() - t0
            same = bool((np.asarray(h.prim) == ref).mean() > 0.999)
            walls = []
            for _ in range(3):
                t0 = time.time()
                sync(closest(o_cam, d_cam, mint0, maxt0, slabs, cbounds))
                walls.append(time.time() - t0)
            cam_ms = min(walls) * 1e3
            t0 = time.time()
            sync(closest(p, d_b, mint_b, maxt_b, slabs, cbounds))
            bcomp = time.time() - t0
            walls = []
            for _ in range(3):
                t0 = time.time()
                sync(closest(p, d_b, mint_b, maxt_b, slabs, cbounds))
                walls.append(time.time() - t0)
            bnc_ms = min(walls) * 1e3
            print(f"RB={rb:2d} SS={ss:2d} NB={nb:3d}: camera "
                  f"{cam_ms:7.1f} ms  bounce {bnc_ms:7.1f} ms  "
                  f"(compile {comp:.0f}/{bcomp:.0f}s, match={same})",
                  flush=True)
        except Exception as e:
            print(f"RB={rb:2d} SS={ss:2d} NB={nb:3d}: FAILED "
                  f"{type(e).__name__}: {str(e)[:200]}", flush=True)
    # restore defaults for any later import in this interpreter
    for k in ("GDMT_PAIR_RB", "GDMT_PAIR_SS", "GDMT_PAIR_NB"):
        os.environ.pop(k, None)


if __name__ == "__main__":
    main()
