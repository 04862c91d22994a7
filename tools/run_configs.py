"""Run the five BASELINE.json benchmark configs end-to-end and report.

    python tools/run_configs.py [--size 128] [--spp 32] [--ref-spp 2048]

Per config: renders, reconstructs where gradient-domain, computes relMSE
against a long-run plain-PT reference of the same scene (BASELINE.md
protocol: relMSE = mean((I-R)^2 / (R^2 + eps)), eps = 1e-2*mean(R)^2),
and prints one table row.  Config #5 uses the procedural large scene
(tools/bench_large.py) and, on CPU backends with
--xla_force_host_platform_device_count, the multi-chip tile renderer.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np


def relmse(img, ref):
    eps = 1e-2 * float(np.mean(ref)) ** 2
    return float(np.mean((img - ref) ** 2 / (ref ** 2 + eps)))


def render_ref(scene, st, spp):
    import jax
    from gradientdomain_mitsuba_tpu.models.path import PathTracer
    pt = PathTracer(scene, st)
    return np.asarray(pt.render(scene, seed=999, spp=spp))


def run_gd(scene_path, integrator, mode, over, spp, ref_spp, label):
    import jax
    from gradientdomain_mitsuba_tpu.models import poisson
    from gradientdomain_mitsuba_tpu.scene import scene as sc

    scene, st = sc.load_scene(scene_path, over)
    scene = jax.device_put(scene)
    ref = render_ref(scene, st, ref_spp)

    if integrator == "gpt":
        from gradientdomain_mitsuba_tpu.models.gpt import GPTracer
        tracer = GPTracer(scene, st)
    else:
        from gradientdomain_mitsuba_tpu.models.gbdpt import GBDPTracer
        tracer = GBDPTracer(scene, st)
    bufs = tracer.render(scene, seed=0, spp=spp)        # warm compile
    t0 = time.time()
    bufs = tracer.render(scene, seed=1, spp=spp)
    final = np.asarray(poisson.reconstruct(bufs, alpha=0.2, mode=mode))
    wall = time.time() - t0
    primal = np.asarray(bufs["primal"]) + np.asarray(bufs["very_direct"])
    r_fin = relmse(final, ref)
    r_pri = relmse(primal, ref)
    gain = r_pri / max(r_fin, 1e-12)
    print(f"{label:44s} {wall:7.2f}s  relMSE(final) {r_fin:.5f}  "
          f"relMSE(primal) {r_pri:.5f}  gain {gain:4.1f}x")
    return r_fin < r_pri


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--spp", type=int, default=32)
    ap.add_argument("--ref-spp", type=int, default=2048)
    args = ap.parse_args()

    sz = {"width": str(args.size), "height": str(args.size)}
    data = os.path.join(ROOT, "data/scenes")
    ok = []

    # 1: G-PT Cornell box, L2
    ok.append(run_gd(os.path.join(data, "cbox/cbox.xml"), "gpt", "L2",
                     dict(sz, spp=str(args.spp), maxDepth="6",
                          integrator="gpt"),
                     args.spp, args.ref_spp,
                     "#1 G-PT cbox L2"))
    # 2: G-PT Veach-door-class interior (glossy metal door + thin-glass
    #    insert, light only in the far room), L1 — data/scenes/door
    ok.append(run_gd(os.path.join(data, "door/door.xml"),
                     "gpt", "L1",
                     dict(sz, spp=str(args.spp), maxDepth="8",
                          integrator="gpt"),
                     args.spp, args.ref_spp,
                     "#2 G-PT Veach door L1"))
    # 3: G-BDPT caustic scene (glass+mirror spheres, small bright
    #    emitter; t=1 light tracing dominates) — data/scenes/caustics
    ok.append(run_gd(os.path.join(data, "caustics/caustics.xml"),
                     "gbdpt", "L1",
                     dict(sz, spp=str(max(args.spp // 2, 4)),
                          maxDepth="8", integrator="gbdpt"),
                     max(args.spp // 2, 4), args.ref_spp,
                     "#3 G-BDPT caustics L1"))
    # 4: envmap + textured rough BSDFs + DoF
    ok.append(run_gd(os.path.join(data, "envmap/envmap.xml"), "gpt", "L1",
                     dict(sz, spp=str(args.spp), maxDepth="6",
                          integrator="gpt"),
                     args.spp, args.ref_spp,
                     "#4 G-PT envmap+textures+DoF L1"))

    # 5: large instanced BVH — data/scenes/forest (~3.2M tris after
    #    instance baking); scalable via --forest-tris using the
    #    procedural bench_large scene instead
    import copy
    import jax
    from gradientdomain_mitsuba_tpu.scene import scene as sc
    from gradientdomain_mitsuba_tpu.models.path import PathTracer
    t0 = time.time()
    scene, st = sc.load_scene(
        os.path.join(data, "forest/forest.xml"),
        dict(sz, spp="4", maxDepth="5"))
    build_s = time.time() - t0
    scene_d = jax.device_put(scene)
    pt = PathTracer(scene_d, st)
    pt.count_rays = True  # measured device-side counters, not a formula
    img = pt.render(scene_d, seed=0, spp=4, chunk=4)
    t0 = time.time()
    img = pt.render(scene_d, seed=1, spp=4, chunk=4)
    wall = time.time() - t0
    rays = getattr(pt, "last_ray_count",
                   args.size * args.size * 4 * (1 + 4 * 2))
    n_dev = jax.device_count()
    multi = ""
    if n_dev > 1:
        from gradientdomain_mitsuba_tpu.parallel import tiles
        mesh = tiles.make_mesh()
        from gradientdomain_mitsuba_tpu.models.gpt import GPTracer
        st2 = copy.deepcopy(st)
        st2.integrator = "gpt"
        gt = GPTracer(scene_d, st2)
        bufs = tiles.render_tiles_gpt(gt, scene_d, mesh, seed=0,
                                      n_samples=4)
        multi = (f"; multi-chip({n_dev}) tiles OK"
                 if all(np.isfinite(v).all() for v in bufs.values())
                 else f"; multi-chip({n_dev}) NONFINITE")
    sane = bool(np.isfinite(np.asarray(img)).all() and
                np.asarray(img).mean() > 1e-3)
    n_tris = int(scene.geom.indices.shape[0])
    print(f"{'#5 forest (' + str(n_tris) + ' tris) PT':44s} "
          f"{wall:7.2f}s  {rays/wall/1e6:6.1f} Mrays/s  build {build_s:.0f}s"
          f"  finite+lit {sane}{multi}")
    ok.append(sane)

    print("PASS" if all(ok) else "SOME CONFIGS REGRESSED", flush=True)


if __name__ == "__main__":
    main()
