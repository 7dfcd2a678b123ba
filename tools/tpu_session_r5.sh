#!/bin/bash
# Ordered round-5 TPU measurement queue. Run ONE process at a time (the
# relay wedges under concurrency, CLAUDE.md); each step is SIGINT-first
# bounded so a hang cannot eat the session. Logs to /tmp/*_r5*.log.
#
# Rationale per step:
#  1. march_group A/B  — the round-5 batch-scaling fix (ops/raycast.py
#     batch_group): does grouping the B=8/B=4 march into B=2 sub-marches
#     recover the geo-style batch scaling? (B=8 ungrouped full step was
#     2.515 s; the phase-1 march alone 1135 ms vs B=2's 115 ms.)
#  2. scene cfeed+trace — whole-scene inference at the best known config
#     (zslab+scan+wb16) with the compact device feed (host->device is the
#     suspected wall) and a jax.profiler trace to attribute the ~18 s.
#  3. (after analyzing #2) scene restitch A/B — if the stitching scatter
#     dominates, the slice-RMW restitch lands and this measures it.
set -u
cd /root/repo

run() { # run NAME TIMEOUT CMD...
  local name=$1 t=$2; shift 2
  echo "=== $name ($(date -u +%H:%M:%S)) ===" | tee -a /tmp/tpu_r5_queue.log
  timeout --signal=INT --kill-after=60 "$t" "$@" \
    > "/tmp/${name}.log" 2>&1
  echo "--- $name rc=$? ---" | tee -a /tmp/tpu_r5_queue.log
  sleep 5
}

run bench_r5_ab_mg 3600 python bench.py --ab \
  --only_ab b8_resid_global_mg2,b8_resid_zslab_global_mg2,b8_resid_global_mg4,b4_resid_zslab_global_mg2 \
  --steps 3

run bench_r5_scene_cfeed 2400 python bench.py --mode scene \
  --zslab_conv --scan_windows --window_batch 16 --compact_feed \
  --profile_dir /tmp/trace_scene_r5
