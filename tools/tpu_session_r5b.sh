#!/bin/bash
# Round-5 TPU queue #2 (after the mg A/B landed 4.89 chunks/s/chip at
# B=8+resid+global+mg2, spc=1, and the scene trace attributed ~10.5 s of
# the 18.4 s scene step to the flat scatter-add stitch):
#  1. default-candidate confirmation: the A/B winner composed with the
#     steps_per_call=4 default (zslab OFF at B=8 — it lost 4.89 vs 4.56).
#  2. scene slice-RMW stitching A/B (stitch_slices) at wb16 and wb8.
set -u
cd /root/repo

run() {
  local name=$1 t=$2; shift 2
  echo "=== $name ($(date -u +%H:%M:%S)) ===" | tee -a /tmp/tpu_r5_queue.log
  timeout --signal=INT --kill-after=60 "$t" "$@" \
    > "/tmp/${name}.log" 2>&1
  echo "--- $name rc=$? ---" | tee -a /tmp/tpu_r5_queue.log
  sleep 5
}

run bench_r5_b8_default_candidate 3600 python bench.py \
  --batch_size 8 --compact_resid --no-zslab_conv --march_group 2 --steps 3

run bench_r5_scene_rmw 3600 python bench.py --mode scene --ab \
  --only_ab zslab+scan_wb16+cfeed+rmw,zslab+scan+cfeed+rmw
