#!/bin/bash
# Round-4 TPU measurement queue — run the moment the relay answers.
#
# Discipline (CLAUDE.md): ONE TPU process at a time, never kill one
# mid-run, keep the total process count low (the relay died after ~15 in
# round 3). Ordered by value-per-process; each step logs to
# docs/evidence/bench_r4/ and the script continues past failures.
#
#   bash tools/tpu_session_r4.sh [stop_after_step]
set -u
cd "$(dirname "$0")/.."
EV=docs/evidence/bench_r4
mkdir -p "$EV"
STOP="${1:-99}"

probe() {
  python - <<'EOF'
import socket, sys
s = socket.socket(); s.settimeout(3)
try:
    s.connect(("127.0.0.1", 8082)); print("relay: OPEN")
except Exception as e:
    print("relay:", e); sys.exit(1)
EOF
}

run() {  # run <step> <name> <timeout_s> <cmd...>
  local step="$1" name="$2" to="$3"; shift 3
  [ "$step" -gt "$STOP" ] && return 0
  echo "=== [$step] $name: $*" | tee -a "$EV/session.log"
  # SIGINT first (clean JAX client teardown — a hard kill mid-execution can
  # wedge the relay, CLAUDE.md); escalate to KILL 60 s later if ignored
  ( timeout -s INT -k 60 "$to" "$@" ) >"$EV/$name.log" 2>&1
  local rc=$?
  echo "=== [$step] $name rc=$rc" | tee -a "$EV/session.log"
  tail -2 "$EV/$name.log" | tee -a "$EV/session.log"
  # a relay death mid-queue makes every later step hang; re-probe cheaply
  probe >>"$EV/session.log" 2>&1 || { echo "relay DEAD — stopping queue" \
    | tee -a "$EV/session.log"; exit 2; }
}

probe || exit 1

# PROCESS BUDGET: the relay died after ~15 TPU processes in round 3, so
# the queue is compressed into few one-process multi-config runs
# (bench.py --ab). Highest-value first; each later step is optional gravy.
#
# 1. the driver deliverable first: bench must emit its JSON cold
run 1 bench_default 900 python bench.py
# 2. the ENTIRE train-step flag matrix in one process (baseline, fused/
#    pallas/folded conv, pair/global compaction, steps_per_call, best
#    combo, B=8 triage rows) — one stderr row per variant as it lands
run 2 bench_ab 7200 python bench.py --ab
# 3. conv formulations (the round-3 unmeasured probe incl. folded + Pallas)
run 3 conv_probe 1500 python tools/conv_probe.py
# 4. the whole-scene matrix in one process (loop/scan dispatch, folded
#    conv, window_batch 16)
run 4 bench_scene_ab 3600 python bench.py --mode scene --ab
# 5. production-operating-point curriculum run (VERDICT r3 item 6): geo ->
#    GAN phases at the flagship dims with the r3/r4 features on; ~1-2k
#    steps; log.csv + occ-IoU land in the save dir (committed as evidence)
run 5 curriculum 5400 python -m spsg_tpu.cli.train \
    --synthetic_chunks 64 --save "$EV/curriculum_run" \
    --batch_size 2 --max_epoch 60 --num_iters_geo_only 400 \
    --num_iters_before_content 999999 \
    --compute_dtype bfloat16 --cache_renders 64 --compact_resid \
    --skip_batch_on_bad_depth --no_vis
# 6+. optional diagnostics if the relay is still healthy
run 6 scene_sweep 3600 python tools/scene_sweep.py --window_batches 8 16 32
run 7 bench_b8_profile 1200 python bench.py --batch_size 8 --compact_resid \
    --profile_dir /tmp/b8trace --steps 3
run 8 gen_timing_folded 900 python tools/gen_timing.py --folded_conv
echo "queue complete" | tee -a "$EV/session.log"
