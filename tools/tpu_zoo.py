"""Run EVERY integrator family once on the live accelerator and record
wall + finiteness + brightness — hardware coverage evidence for the
whole model zoo in one process (one process because every client exit
wedges the tunneled runtime for minutes; tools/NOTES_r4_forest_hang.md).

    python tools/tpu_zoo.py [--size 64] [--spp 4] [--json ZOO_r05.json]

Each integrator renders the Cornell box (caustics scene for the photon/
Markov families where it is the representative workload) at a small
shape; the check is finite pixels + nonzero mean + wall recorded.  This
is a breadth smoke, not a quality benchmark — quality evidence lives in
CONFIGS_r05.json / MLT_CAUSTICS_r05.json and the CPU test suite.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--spp", type=int, default=4)
    ap.add_argument("--json", type=str, default=None)
    args = ap.parse_args()

    import jax
    from gradientdomain_mitsuba_tpu.scene import scene as sc

    CBOX = os.path.join(ROOT, "data/scenes/cbox/cbox.xml")
    CAUS = os.path.join(ROOT, "data/scenes/caustics/caustics.xml")
    ENV = os.path.join(ROOT, "data/scenes/envmap/envmap.xml")

    # (name, module, class, scene, extra overrides, render kwargs)
    FAMILIES = [
        ("path", "path", "PathTracer", CBOX, {}, {}),
        ("direct", "direct", "DirectIntegrator", CBOX, {}, {}),
        ("ao", "direct", "AOIntegrator", CBOX, {}, {}),
        ("field", "direct", "FieldIntegrator", CBOX, {"field": "shNormal"}, {}),
        ("gpt", "gpt", "GPTracer", CBOX, {}, {}),
        ("bdpt", "bdpt", "BDPTracer", CBOX, {}, {}),
        ("gbdpt", "gbdpt", "GBDPTracer", CBOX, {}, {}),
        ("volpath", "volpath", "VolPathTracer", CBOX, {}, {}),
        ("pssmlt", "pssmlt", "PSSMLTracer", CAUS, {}, {}),
        ("mlt", "mlt", "MLTracer", CAUS, {}, {}),
        ("erpt", "erpt", "ERPTracer", CAUS, {}, {}),
        ("sppm", "sppm", "SPPMTracer", CAUS, {}, {}),
        ("adaptive", "adaptive", "AdaptiveTracer", CBOX, {}, {}),
        ("vpl", "vpl", "VPLTracer", CBOX, {}, {}),
        ("multichannel", "multichannel", "MultiChannelIntegrator",
         CBOX, {}, {}),
        ("irrcache", "irrcache", "IrrCacheTracer", CBOX, {}, {}),
        ("envmap-gpt", "gpt", "GPTracer", ENV, {}, {}),
    ]

    rows = []
    backend = jax.devices()[0].platform
    print(f"[zoo] backend={backend} size={args.size} spp={args.spp}",
          flush=True)
    for name, mod, cls, scene_path, extra, _kw in FAMILIES:
        try:
            import importlib
            M = importlib.import_module(
                f"gradientdomain_mitsuba_tpu.models.{mod}")
            C = getattr(M, cls)
            over = {"width": str(args.size), "height": str(args.size),
                    "spp": str(args.spp), "maxDepth": "5",
                    "integrator": mod}
            over.update({k: str(v) for k, v in extra.items()})
            scene, st = sc.load_scene(scene_path, over)
            scene = jax.device_put(scene)
            tr = C(scene, st)
            t0 = time.time()
            out = tr.render(scene, seed=0, spp=args.spp)
            if isinstance(out, dict):
                img = np.asarray(out.get("primal", next(
                    iter(out.values()))))
            else:
                img = np.asarray(out)
            compile_s = time.time() - t0
            t0 = time.time()
            out = tr.render(scene, seed=1, spp=args.spp)
            img = np.asarray(out.get("primal", next(iter(out.values())))
                             if isinstance(out, dict) else out)
            wall = time.time() - t0
            finite = bool(np.isfinite(img).all())
            mean = float(np.abs(img).mean())
            ok = finite and mean > 1e-5
            rows.append(dict(name=name, ok=ok, finite=finite,
                             mean=round(mean, 5),
                             wall_s=round(wall, 3),
                             compile_s=round(compile_s, 1)))
            print(f"[zoo] {name:14s} {'OK ' if ok else 'BAD'} "
                  f"wall {wall:6.2f}s compile {compile_s:5.1f}s "
                  f"mean {mean:.4f}", flush=True)
        except Exception as e:
            rows.append(dict(name=name, ok=False,
                             error=f"{type(e).__name__}: {e}"))
            print(f"[zoo] {name:14s} FAILED {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)
            traceback.print_exc()
    n_ok = sum(1 for r in rows if r.get("ok"))
    print(f"[zoo] {n_ok}/{len(rows)} families OK on {backend}",
          flush=True)
    if args.json:
        with open(args.json, "w") as f:
            json.dump({"backend": backend, "size": args.size,
                       "spp": args.spp, "families": rows}, f, indent=1)
        print(f"wrote {args.json}", flush=True)


if __name__ == "__main__":
    main()
