#!/bin/bash
# Round-5 TPU queue #3:
#  1. style-phase curriculum segment (VERDICT r3 weak #6: the style phase
#     has never run on TPU) — resume the round-4 TPU checkpoint (1,920
#     steps, val occ-IoU 0.952) and train ~320 more steps with style +
#     content losses engaged from the first iter, at the NEW operating
#     point (B=8 + march_group 2 + compact_resid, bf16, cached renders).
#     VGG features are the documented fixed-seed random fallback (no
#     pretrained weights in this image) — this validates stability and
#     the jitted style-step program, not reference-fidelity style quality.
#  2. trace of the new scene default (stitch_slices+cfeed) to attribute
#     the remaining 8.3 s.
#  3. plain `python bench.py` rehearsal — exactly what the driver runs;
#     confirms the new defaults emit their JSON and the compile cache is
#     warm for the end-of-round artifact.
set -u
cd /root/repo
EV=docs/evidence/bench_r5

run() {
  local name=$1 t=$2; shift 2
  echo "=== $name ($(date -u +%H:%M:%S)) ===" | tee -a /tmp/tpu_r5_queue.log
  timeout --signal=INT --kill-after=60 "$t" "$@" \
    > "/tmp/${name}.log" 2>&1
  echo "--- $name rc=$? ---" | tee -a /tmp/tpu_r5_queue.log
  sleep 5
}

run curriculum_style_r5 4200 python -m spsg_tpu.cli.train \
  --synthetic_chunks 64 --save "$EV/style_run" \
  --retrain docs/evidence/bench_r4/curriculum_run/model-epoch59 \
  --batch_size 8 --max_epoch 100 --start_epoch 60 \
  --num_iters_geo_only 1 --num_iters_before_content 1 \
  --weight_style_loss 0.01 --weight_content_loss 0.01 \
  --compute_dtype bfloat16 --cache_renders 64 --compact_resid \
  --march_group 2 --skip_batch_on_bad_depth --no_vis

run bench_r5_scene_trace 2400 python bench.py --mode scene \
  --profile_dir /tmp/trace_scene_rmw

run bench_r5_driver_rehearsal 1500 python bench.py
