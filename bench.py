"""Headline benchmark: G-PT render + screened-Poisson reconstruction on the
Cornell box at 256x256, 64 spp (BASELINE.json config #1 geometry/settings).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Metric: total rays traced per second during the G-PT render (camera + NEE
shadow + BSDF + offset reconnection/half-vector rays — the BASELINE.md
protocol).  vs_baseline divides by 5 Mrays/s, the midpoint of BASELINE.md's
anecdotal 1-10 Mrays/s for 8-core CPU Mitsuba plain PT (the repo publishes
no numbers; see BASELINE.md provenance caveat).  XLA compile time is
excluded (warm-up pass first; the persistent compilation cache makes
subsequent processes start warm).
"""
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, ROOT)

CBOX = os.path.join(ROOT, "data/scenes/cbox/cbox.xml")
BASELINE_MRAYS = 5.0

WIDTH = int(os.environ.get("BENCH_WIDTH", "256"))
HEIGHT = int(os.environ.get("BENCH_HEIGHT", "256"))
SPP = int(os.environ.get("BENCH_SPP", "64"))
MAXDEPTH = int(os.environ.get("BENCH_MAXDEPTH", "6"))


def count_rays_per_sample(max_depth):
    """Rays per pixel-sample in the G-PT lockstep loop (see gpt.py):
    5 camera rays, then per bounce: 1 main NEE shadow + 1 main BSDF +
    4 offset shadow/visibility + up to 4 offset continuation rays."""
    bounces = max_depth - 1
    return 5 + bounces * (1 + 1 + 4 + 4)


def main():
    from gradientdomain_mitsuba_tpu.models.gpt import GPTracer
    from gradientdomain_mitsuba_tpu.models import poisson
    from gradientdomain_mitsuba_tpu.scene import scene as sc

    scene, st = sc.load_scene(CBOX, {
        "width": str(WIDTH), "height": str(HEIGHT), "spp": str(SPP),
        "maxDepth": str(MAXDEPTH), "integrator": "gpt"})
    tracer = GPTracer(scene, st)

    # warm-up: compile (excluded per BASELINE.md measurement protocol)
    import jax
    scene = jax.device_put(scene)
    final, _ = tracer.render_final(scene, 0, SPP, alpha=0.2, mode="L1")
    final.block_until_ready()

    t0 = time.time()
    final, _ = tracer.render_final(scene, 1, SPP, alpha=0.2, mode="L1")
    final.block_until_ready()
    wall = time.time() - t0

    rays = WIDTH * HEIGHT * SPP * count_rays_per_sample(MAXDEPTH)
    mrays = rays / wall / 1e6
    print(json.dumps({
        "metric": f"gpt_cbox_{WIDTH}x{HEIGHT}_{SPP}spp_render+reconstruct_mrays_per_sec",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / BASELINE_MRAYS, 3),
    }))


if __name__ == "__main__":
    main()
