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

Robustness (VERDICT.md round-1 weak #1): backend init is retried with
backoff; if the accelerator backend never comes up, the benchmark falls
back to the CPU backend at reduced size so the driver still records a
parseable number (flagged by a "_cpufallback" metric suffix and a
"backend" field); any other failure emits a JSON line with an "error"
field instead of a raw traceback.  Progress goes to stderr — stdout
carries exactly one JSON line.
"""
import json
import os
import sys
import time
import traceback

ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, ROOT)

CBOX = os.path.join(ROOT, "data/scenes/cbox/cbox.xml")
BASELINE_MRAYS = 5.0

WIDTH = int(os.environ.get("BENCH_WIDTH", "256"))
HEIGHT = int(os.environ.get("BENCH_HEIGHT", "256"))
SPP = int(os.environ.get("BENCH_SPP", "64"))
MAXDEPTH = int(os.environ.get("BENCH_MAXDEPTH", "6"))
INIT_RETRIES = int(os.environ.get("BENCH_INIT_RETRIES", "2"))
PROBE_TIMEOUT_S = int(os.environ.get("BENCH_PROBE_TIMEOUT_S", "90"))


def log(msg):
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def emit(obj):
    print(json.dumps(obj), flush=True)


def count_rays_per_sample(max_depth):
    """Rays per pixel-sample in the G-PT lockstep loop (see gpt.py):
    5 camera rays, then per bounce: 1 main NEE shadow + 1 main BSDF +
    4 offset shadow/visibility + up to 4 offset continuation rays."""
    bounces = max_depth - 1
    return 5 + bounces * (1 + 1 + 4 + 4)


def probe_backend_subprocess(timeout_s=PROBE_TIMEOUT_S):
    """Probe accelerator init in a THROWAWAY subprocess so a wedged TPU
    runtime (which HANGS rather than raising — round-1 failure mode)
    cannot wedge the benchmark process itself."""
    import subprocess
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; d=jax.devices(); print(d[0].platform)"],
            capture_output=True, text=True, timeout=timeout_s)
        if r.returncode == 0 and r.stdout.strip():
            return r.stdout.strip().splitlines()[-1]
        log(f"probe rc={r.returncode}: {r.stderr.strip()[-500:]}")
        return None
    except subprocess.TimeoutExpired:
        log(f"probe timed out after {timeout_s}s (wedged backend)")
        return None


def init_backend():
    """Decide on a backend BEFORE touching jax in this process: probe the
    accelerator in a subprocess with a timeout, retrying with backoff;
    fall back to CPU if it never comes up.  Returns (backend_name, devices).
    """
    delay = 15.0
    platform = None
    for attempt in range(1, INIT_RETRIES + 1):
        platform = probe_backend_subprocess()
        if platform is not None:
            log(f"accelerator probe OK on attempt {attempt}: {platform}")
            break
        log(f"backend probe attempt {attempt}/{INIT_RETRIES} failed")
        if attempt < INIT_RETRIES:
            time.sleep(delay)
            delay *= 2
    import jax
    if platform is None or platform == "cpu":
        log("falling back to CPU backend")
        jax.config.update("jax_platforms", "cpu")
        return "cpu_fallback", jax.devices("cpu")
    devs = jax.devices()
    return devs[0].platform, devs


def run(width, height, spp, max_depth, backend):
    from gradientdomain_mitsuba_tpu.models.gpt import GPTracer
    from gradientdomain_mitsuba_tpu.scene import scene as sc
    import jax

    log(f"loading scene {width}x{height} spp={spp} maxDepth={max_depth}")
    scene, st = sc.load_scene(CBOX, {
        "width": str(width), "height": str(height), "spp": str(spp),
        "maxDepth": str(max_depth), "integrator": "gpt"})
    tracer = GPTracer(scene, st)
    tracer.count_rays = True  # measured device-side counter (round 2)
    scene = jax.device_put(scene)

    def one(seed):
        """One render+reconstruct, synced by a HOST READ of the scalar ray
        counter: on the axon-tunneled TPU backend, block_until_ready() on
        the first post-compile dispatch returns before execution finishes
        (measured 0.001s "walls"); a scalar device->host read provably
        blocks and costs ~1 ms of tunnel latency, which we charge to the
        measurement (BASELINE.md protocol: everything but compile).
        Returns (wall, rays, measured) — measured=False means the closed
        -form ray formula was used, not a device counter."""
        t0 = time.time()
        final, bufs = tracer.render_final(scene, seed, spp,
                                          alpha=0.2, mode="L1")
        if "rays" in bufs:
            rays = float(bufs["rays"])  # counted on device (popcounts)
            measured = True
        else:
            final.block_until_ready()
            rays = width * height * spp * count_rays_per_sample(max_depth)
            measured = False
        return time.time() - t0, rays, measured

    log("warm-up (compile + first dispatch, excluded from timing)...")
    t0 = time.time()
    one(0)
    log(f"compile+first run: {time.time() - t0:.1f}s; second warm-up...")
    one(1)
    # keep (wall, rays) PAIRED per seed: RR makes ray counts seed-
    # dependent, so the headline is the best same-run rays/wall
    runs = [one(seed) for seed in (2, 3, 4)]
    wall, rays, measured = max(runs, key=lambda r: r[1] / r[0])
    log(f"timed render+reconstruct (best rays/wall of {len(runs)}): "
        f"{wall:.3f}s (all: {[f'{w:.3f}s/{r:.2e}' for w, r, _ in runs]})")
    log(f"measured rays: {rays:.0f} (formula would say "
        f"{width * height * spp * count_rays_per_sample(max_depth)})")
    mrays = rays / wall / 1e6
    suffix = "_cpufallback" if backend == "cpu_fallback" else ""
    emit({
        "metric": (f"gpt_cbox_{width}x{height}_{spp}spp_"
                   f"render+reconstruct_mrays_per_sec{suffix}"),
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / BASELINE_MRAYS, 3),
        "backend": backend,
        "wall_s": round(wall, 3),
        "rays_measured": measured,
    })


def run_forest(backend):
    """Second metric line (VERDICT r2 next-item #2): the 3.2M-tri forest
    through the Pallas batched-chunk BVH traversal kernel, measured
    device-side rays — so the large-scene traversal path gets an
    externally captured number every round, not just the 36-tri matmul
    sweep.  Emitted BEFORE the cbox headline so the driver's last-line
    parse still records the headline metric."""
    from gradientdomain_mitsuba_tpu.models.path import PathTracer
    from gradientdomain_mitsuba_tpu.scene import scene as sc
    import jax

    spp = int(os.environ.get("BENCH_FOREST_SPP", "4"))
    size = int(os.environ.get("BENCH_FOREST_SIZE", "256"))
    forest = os.path.join(ROOT, "data/scenes/forest/forest.xml")
    log(f"forest scene {size}x{size} spp={spp} (BVH build on host)...")
    t0 = time.time()
    scene, st = sc.load_scene(forest, {
        "width": str(size), "height": str(size), "spp": str(spp),
        "maxDepth": "5"})
    build_s = time.time() - t0
    n_tris = int(scene.geom.indices.shape[0])
    prep = {k: (round(v, 2) if isinstance(v, float) else v)
            for k, v in st.prep_times.items() if k != "geom_key"}
    log(f"forest: {n_tris} tris, prep {build_s:.1f}s "
        f"(breakdown: {prep})")
    scene = jax.device_put(scene)
    tracer = PathTracer(scene, st)
    tracer.count_rays = True

    def one(seed):
        # render() host-reads the scalar ray counter in finalize(), which
        # is a true sync even where block_until_ready returns early (see
        # run() below).  (wall, rays) stay PAIRED per seed — RR makes the
        # measured ray count seed-dependent.
        t0 = time.time()
        tracer.render(scene, seed=seed, spp=spp, chunk=spp)
        return time.time() - t0, float(getattr(tracer, "last_ray_count",
                                               0.0))

    t0 = time.time()
    one(0)
    log(f"forest compile+first: {time.time() - t0:.1f}s; warm-up 2...")
    one(1)
    runs = [one(s) for s in (2, 3, 4)]
    wall, rays = max(runs, key=lambda r: r[1] / max(r[0], 1e-9))
    mrays = rays / wall / 1e6
    log(f"forest runs: {[f'{w:.3f}s/{r:.2e}' for w, r in runs]}")
    log(f"forest timed render: {wall:.3f}s, {rays:.0f} rays")
    emit({
        "metric": (f"pt_forest{n_tris // 1000000}M_{size}x{size}_"
                   f"{spp}spp_pallas_bvh_mrays_per_sec"),
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        # baseline: the same anecdotal 5 Mrays/s 8-core CPU plain-PT
        # midpoint as the headline (BASELINE.md publishes no per-scene
        # figure; this is the closest like-for-like class)
        "vs_baseline": round(mrays / BASELINE_MRAYS, 3),
        "baseline_mrays": BASELINE_MRAYS,
        "backend": backend,
        "wall_s": round(wall, 3),
        "n_tris": n_tris,
        "scene_prep_s": round(build_s, 1),
        "scene_prep_breakdown": prep,
        "rays_measured": True,
    })


def run_forest10m(backend):
    """Third metric line (VERDICT r3 next-item #9): the 10.6M-tri forest
    rendered on-device — proves the BVH/slab tables at San-Miguel scale
    fit HBM and traverse; reports measured Mrays/s + HBM footprint."""
    from gradientdomain_mitsuba_tpu.models.path import PathTracer
    from gradientdomain_mitsuba_tpu.scene import scene as sc
    import jax

    spp = int(os.environ.get("BENCH_FOREST10M_SPP", "2"))
    size = int(os.environ.get("BENCH_FOREST10M_SIZE", "128"))
    forest = os.path.join(ROOT, "data/scenes/forest/forest10m.xml")
    log(f"forest10m scene {size}x{size} spp={spp}...")
    t0 = time.time()
    scene, st = sc.load_scene(forest, {
        "width": str(size), "height": str(size), "spp": str(spp),
        "maxDepth": "4"})
    build_s = time.time() - t0
    n_tris = int(scene.geom.indices.shape[0])
    log(f"forest10m: {n_tris} tris, prep {build_s:.1f}s "
        f"(cache: {st.prep_times.get('cache')})")
    scene = jax.device_put(scene)
    tracer = PathTracer(scene, st)
    tracer.count_rays = True

    def one(seed):
        t0 = time.time()
        tracer.render(scene, seed=seed, spp=spp, chunk=spp)
        return time.time() - t0, float(getattr(tracer, "last_ray_count",
                                               0.0))

    t0 = time.time()
    one(0)
    log(f"forest10m compile+first: {time.time() - t0:.1f}s...")
    runs = [one(s) for s in (1, 2)]
    wall, rays = max(runs, key=lambda r: r[1] / max(r[0], 1e-9))
    mrays = rays / wall / 1e6
    try:
        ms = jax.local_devices()[0].memory_stats() or {}
        hbm_gb = round(ms.get("bytes_in_use", 0) / 2 ** 30, 2)
    except Exception:
        hbm_gb = None
    log(f"forest10m render: {wall:.3f}s, {rays:.0f} rays, HBM {hbm_gb} GB")
    emit({
        "metric": (f"pt_forest{n_tris // 1000000}M_{size}x{size}_"
                   f"{spp}spp_pallas_bvh_mrays_per_sec"),
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / BASELINE_MRAYS, 3),
        "baseline_mrays": BASELINE_MRAYS,
        "backend": backend,
        "wall_s": round(wall, 3),
        "n_tris": n_tris,
        "hbm_in_use_gb": hbm_gb,
        "scene_prep_s": round(build_s, 1),
        "rays_measured": True,
    })


def main():
    try:
        backend, _ = init_backend()
        if backend == "cpu_fallback":
            # keep the CPU fallback cheap so it finishes in minutes
            run(min(WIDTH, 128), min(HEIGHT, 128), min(SPP, 8),
                min(MAXDEPTH, 4), backend)
        else:
            if os.environ.get("BENCH_FOREST", "1") != "0":
                try:
                    run_forest(backend)
                except Exception:
                    log("forest metric failed (headline continues):\n" +
                        traceback.format_exc())
            if os.environ.get("BENCH_FOREST10M", "1") != "0":
                try:
                    run_forest10m(backend)
                except Exception:
                    log("forest10m metric failed (headline continues):\n" +
                        traceback.format_exc())
            run(WIDTH, HEIGHT, SPP, MAXDEPTH, backend)
    except Exception as e:
        log(traceback.format_exc())
        emit({
            "metric": f"gpt_cbox_{WIDTH}x{HEIGHT}_{SPP}spp_"
                      "render+reconstruct_mrays_per_sec",
            "value": 0.0,
            "unit": "Mrays/s",
            "vs_baseline": 0.0,
            "error": f"{type(e).__name__}: {e}",
        })
        sys.exit(0)  # parseable output was produced; don't fail the driver


if __name__ == "__main__":
    main()
