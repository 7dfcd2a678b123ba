#!/bin/bash
# Round-4 follow-up TPU queue (session 2): measure the z-slab conv
# formulation (the conv_probe winner, 6.4x over lax.conv) inside the full
# train step + scene inference, and validate the Pallas 8-alignment fix.
# Same discipline as tools/tpu_session_r4.sh: ONE TPU process at a time,
# SIGINT-first timeouts, relay re-probe between steps.
#
#   bash tools/tpu_session_r4b.sh [stop_after_step]
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
  ( timeout -s INT -k 60 "$to" "$@" ) >"$EV/$name.log" 2>&1
  local rc=$?
  echo "=== [$step] $name rc=$rc" | tee -a "$EV/session.log"
  tail -2 "$EV/$name.log" | tee -a "$EV/session.log"
  probe >>"$EV/session.log" 2>&1 || { echo "relay DEAD — stopping queue" \
    | tee -a "$EV/session.log"; exit 2; }
}

probe || exit 1

# 1. zslab in the full train step: alone and composed with the measured
#    wins (spc4 +2.6%, pair+global +0.5%), plus the B=8 scaling row
run 1 bench_ab_zslab 5400 python bench.py --ab \
    --only_ab zslab,zslab+spc4,zslab+pair+global+spc4,b8_resid_zslab
# 2. zslab in whole-scene inference (composes with the measured scan win)
run 2 bench_scene_zslab 2400 python bench.py --mode scene --ab \
    --only_ab zslab+scan,zslab+scan_wb16
# 3. Pallas alignment fix: isolated formulations (fast; proves the Mosaic
#    fix compiles and gives the first real Pallas-vs-zslab numbers)
run 3 conv_probe_fix 1500 python tools/conv_probe.py --only conv,zslab,pallas,fused
echo "queue r4b complete" | tee -a "$EV/session.log"
