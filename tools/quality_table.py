"""Equal-spp quality comparison: plain PT vs G-PT + screened-Poisson.

Reproduces the headline claim of the gradient-domain papers (BASELINE.md:
G-PT relMSE ~3-10x lower than PT at equal time/spp) on our scenes:

    python tools/quality_table.py [--scene data/scenes/cbox/cbox.xml]
        [--size 128] [--spp 32] [--ref-spp 2048] [--max-depth 6]

Prints a relMSE table (reference = long-run PT at --ref-spp) and writes
the images next to --out-dir if given.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="data/scenes/cbox/cbox.xml")
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--spp", type=int, default=32)
    ap.add_argument("--ref-spp", type=int, default=2048)
    ap.add_argument("--max-depth", type=int, default=6)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out-dir", default=None)
    args = ap.parse_args()

    import numpy as np
    from gradientdomain_mitsuba_tpu.models import poisson
    from gradientdomain_mitsuba_tpu.models.gpt import GPTracer
    from gradientdomain_mitsuba_tpu.models.path import PathTracer
    from gradientdomain_mitsuba_tpu.scene import scene as sc
    from gradientdomain_mitsuba_tpu.utils.cli import relmse

    over = {"width": str(args.size), "height": str(args.size),
            "spp": str(args.spp), "maxDepth": str(args.max_depth)}
    scene, st = sc.load_scene(args.scene, over)

    pt = PathTracer(scene, st)
    t0 = time.time()
    ref = pt.render(scene, seed=999, spp=args.ref_spp)
    print(f"# reference: PT {args.ref_spp} spp  ({time.time()-t0:.1f}s)")

    t0 = time.time()
    img_pt = pt.render(scene, seed=args.seed, spp=args.spp)
    t_pt = time.time() - t0

    g = GPTracer(scene, st)
    t0 = time.time()
    bufs = g.render(scene, seed=args.seed, spp=args.spp)
    t_gpt = time.time() - t0
    t0 = time.time()
    l1 = np.asarray(poisson.reconstruct(bufs, alpha=0.2, mode="L1"))
    t_l1 = time.time() - t0
    t0 = time.time()
    l2 = np.asarray(poisson.reconstruct(bufs, alpha=0.2, mode="L2"))
    t_l2 = time.time() - t0
    primal = bufs["primal"] + bufs["very_direct"]

    rows = [
        ("PT", img_pt, t_pt),
        ("G-PT primal", primal, t_gpt),
        ("G-PT + L2", l2, t_gpt + t_l2),
        ("G-PT + L1", l1, t_gpt + t_l1),
    ]
    base = relmse(img_pt, ref)
    print(f"# scene={args.scene} {args.size}x{args.size} @ {args.spp} spp, "
          f"maxDepth={args.max_depth}")
    print(f"{'method':<14s} {'relMSE':>12s} {'vs PT':>8s} {'wall s':>8s}")
    for name, img, wall in rows:
        e = relmse(img, ref)
        print(f"{name:<14s} {e:>12.6g} {base / max(e, 1e-12):>7.2f}x "
              f"{wall:>8.2f}")
        if args.out_dir:
            os.makedirs(args.out_dir, exist_ok=True)
            from gradientdomain_mitsuba_tpu.utils import exr
            exr.write(os.path.join(
                args.out_dir,
                name.replace(" ", "").replace("+", "_") + ".exr"), img)


if __name__ == "__main__":
    main()
