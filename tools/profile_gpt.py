"""Break down the headline bench (G-PT cbox 256x256@64spp) into phases
on the live backend: render_chunk, reconstruct, plain-PT ratio, and
XLA cost analysis (FLOPs / HBM bytes) for speed-of-light context.

Usage: python tools/profile_gpt.py [--spp 64] [--size 256] [--depth 6]
"""
import argparse
import copy
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
CBOX = os.path.join(ROOT, "data/scenes/cbox/cbox.xml")


def jax_block(x):
    import jax
    for leaf in jax.tree.leaves(x):
        if hasattr(leaf, "block_until_ready"):
            leaf.block_until_ready()


def bench(fn, n=3):
    out = fn()
    jax_block(out)
    ts = []
    for _ in range(n):
        t0 = time.time()
        out = fn()
        jax_block(out)
        ts.append(time.time() - t0)
    return min(ts), out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spp", type=int, default=64)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--depth", type=int, default=6)
    ap.add_argument("--trace-dir", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from gradientdomain_mitsuba_tpu.models.gpt import GPTracer
    from gradientdomain_mitsuba_tpu.models.path import PathTracer
    from gradientdomain_mitsuba_tpu.models import poisson
    from gradientdomain_mitsuba_tpu.scene import scene as sc

    print(f"backend: {jax.devices()[0]}", flush=True)
    scene, st = sc.load_scene(CBOX, {
        "width": str(args.size), "height": str(args.size),
        "spp": str(args.spp), "maxDepth": str(args.depth),
        "integrator": "gpt"})
    scene = jax.device_put(scene)
    tracer = GPTracer(scene, st)

    # --- G-PT render_chunk (no reconstruct, one device program) --------
    t, state = bench(lambda: tracer.render_chunk(scene, 1, 0, args.spp))
    print(f"gpt render_chunk {args.spp}spp: {t:.3f}s "
          f"({t / args.spp * 1e3:.2f} ms/spp)", flush=True)

    # --- reconstruct alone ---------------------------------------------
    w = jnp.maximum(state["wsum"], 1e-12)[..., None]
    primal = state["primal"] / w
    dx = state["dx"] / args.spp
    dy = state["dy"] / args.spp
    t2, _ = bench(lambda: poisson.solve_l1(primal, dx, dy, alpha=0.2))
    print(f"poisson L1 reconstruct: {t2:.3f}s", flush=True)

    # --- plain PT for the ratio ------------------------------------------
    st2 = copy.deepcopy(st)
    st2.integrator = "path"
    pt = PathTracer(scene, st2)
    t3, _ = bench(lambda: pt.render_chunk(scene, 1, 0, args.spp))
    print(f"plain PT render_chunk {args.spp}spp: {t3:.3f}s "
          f"({t3 / args.spp * 1e3:.2f} ms/spp); gpt/pt = {t / t3:.2f}x",
          flush=True)

    # --- dispatch overhead: 1-spp chunk ----------------------------------
    t1, _ = bench(lambda: tracer.render_chunk(scene, 1, 0, 1))
    print(f"gpt 1-spp chunk: {t1 * 1e3:.1f} ms "
          f"(x{args.spp} = {t1 * args.spp:.2f}s vs {t:.3f}s)", flush=True)

    # --- XLA cost analysis ------------------------------------------------
    for name, lower in (
        ("gpt", lambda: GPTracer.render_chunk.lower(
            tracer, scene, 1, 0, args.spp)),
        ("pt", lambda: PathTracer.render_chunk.lower(
            pt, scene, 1, 0, args.spp)),
    ):
        try:
            comp = lower().compile()
            ca = comp.cost_analysis()
            if isinstance(ca, list):
                ca = ca[0]
            flops = ca.get("flops", 0.0)
            bytes_ = ca.get("bytes accessed", 0.0)
            tt = t if name == "gpt" else t3
            print(f"{name} render_chunk: {flops/1e12:.3f} TFLOP, "
                  f"{bytes_/1e9:.2f} GB; -> {flops/tt/1e12:.2f} TFLOP/s, "
                  f"{bytes_/tt/1e9:.1f} GB/s", flush=True)
        except Exception as e:
            print(f"{name} cost analysis unavailable: {type(e).__name__}: "
                  f"{e}", flush=True)

    if args.trace_dir:
        with jax.profiler.trace(args.trace_dir):
            out = tracer.render_chunk(scene, 2, 0, args.spp)
            jax_block(out)
        print(f"profiler trace written to {args.trace_dir}", flush=True)


if __name__ == "__main__":
    main()
