#!/usr/bin/env bash
# Round-2 TPU measurement sweep (run on a machine with a live TPU):
#   bash tools/bench_round2.sh [outdir]
#
# Produces:
#   - headline bench.py JSON (G-PT cbox 256^2 @ 64spp)
#   - large-scene Mrays/s at 1M / 2M / 5M tris (block-conservative
#     Pallas worklists; VERDICT r1 missing #3 datapoints)
#   - G-BDPT vs BDPT ms/spp (batched offset views; VERDICT r1 weak #4)
#   - the five BASELINE configs incl. relMSE(final) < relMSE(primal)
set -u
OUT="${1:-/tmp/bench_round2}"
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

echo "== headline bench =="
python bench.py | tee "$OUT/bench.json"

echo "== large-scene sweep =="
for T in 1000000 2000000 5000000; do
  echo "-- $T tris --"
  timeout 3000 python tools/bench_large.py --tris $T --size 256 --spp 4 \
    | tee "$OUT/large_$T.txt"
done

echo "== G-BDPT vs BDPT ms/spp (cbox 256^2, depth 6) =="
python - <<'EOF' | tee "$OUT/gbdpt_msspp.txt"
import time
import jax
import numpy as np
from gradientdomain_mitsuba_tpu.scene import scene as sc
from gradientdomain_mitsuba_tpu.models.bdpt import BDPTracer
from gradientdomain_mitsuba_tpu.models.gbdpt import GBDPTracer

scene, st = sc.load_scene("data/scenes/cbox/cbox.xml", {
    "width": "256", "height": "256", "spp": "8", "maxDepth": "6",
    "integrator": "gbdpt"})
scene = jax.device_put(scene)
for name, cls in (("bdpt", BDPTracer), ("gbdpt", GBDPTracer)):
    tr = cls(scene, st)
    out = tr.render_chunk(scene, 0, 0, 8)
    jax.tree.map(lambda a: a.block_until_ready(), out)
    t0 = time.time()
    out = tr.render_chunk(scene, 1, 0, 8)
    jax.tree.map(lambda a: a.block_until_ready(), out)
    dt = time.time() - t0
    print(f"{name}: {dt / 8 * 1000:.1f} ms/spp (256^2, depth 6)")
EOF

echo "== BASELINE configs =="
timeout 6000 python tools/run_configs.py --size 128 --spp 32 \
  --ref-spp 1024 | tee "$OUT/configs.txt"

echo "all results in $OUT"
