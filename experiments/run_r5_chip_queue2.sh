#!/bin/bash
# Round-5 chip queue v2: the 256^2 bench13 checkpoint from the earlier run
# survives at /tmp/bench13_13c_256_3/run/bench13_ckpt/60, so the 256^2
# retrain is skipped and everything seeds from it directly.
#   setsid nohup bash experiments/run_r5_chip_queue2.sh > /tmp/r5_queue2.log 2>&1 &
set -x
cd /root/repo
R=experiments/results
SEED=/tmp/bench13_13c_256_3/run/bench13

phase() { echo "=== $(date +%H:%M:%S) PHASE $1 ==="; }

# ---- P2: 480x640 protocol run (conv trunk seeded; fc6 fresh), TIS=4,
#          batch 16, 4-epoch chunks (tunnel leak ~12 GB/epoch here) ----
phase P2a-480-gen-and-0to4
timeout 7200 python experiments/benchmark_multiclass.py --size 480 --width 640 \
  --train-iter-size 4 --epochs 4 --classes 13 --batch 16 --lr 1e-4 \
  --seed-convs "$SEED" --seed-epoch 60 --train-only > /tmp/b480_a.log 2>&1
for EP in 8 12 16 20; do
  phase P2-480-to-$EP
  timeout 5400 python experiments/benchmark_multiclass.py --size 480 --width 640 \
    --train-iter-size 4 --epochs $EP --classes 13 --batch 16 --lr 1e-4 \
    --resume-epoch $((EP-4)) --train-only > /tmp/b480_$EP.log 2>&1
done
phase P2e-480-eval
timeout 7200 python experiments/benchmark_multiclass.py --size 480 --width 640 \
  --train-iter-size 4 --epochs 24 --classes 13 --batch 16 --lr 1e-4 \
  --resume-epoch 20 > /tmp/b480_e.log 2>&1
grep -h "BENCH13_JSON" /tmp/b480_e.log | tail -1 > "$R/bench13_480x640_r5.json"

# ---- P3: occlusion fine-tune (256 scenes, 30 epochs, viz_visible flow
#          supervision), chunked at 15 ----
phase P3a-occ
timeout 5400 python experiments/benchmark_occlusion.py --size 256 --epochs 60 \
  --train-scenes 256 --finetune-epochs 15 --train-only > /tmp/occ_a.log 2>&1
phase P3b-occ
timeout 5400 python experiments/benchmark_occlusion.py --size 256 --epochs 60 \
  --train-scenes 256 --finetune-epochs 30 --resume-epoch 75 > /tmp/occ_b.log 2>&1
grep -h "BENCH_OCC_JSON" /tmp/occ_b.log | tail -1 > "$R/bench_occlusion_r5.json"

# ---- P4: tracking-precision fine-tune + tracking eval ----
phase P4a-trackft
timeout 5400 python experiments/track_finetune.py --size 256 --epochs 60 \
  --finetune-epochs 20 > /tmp/trackft.log 2>&1
phase P4b-track-eval
{ timeout 3600 python experiments/track_learned.py --size 256 --epochs 80 \
    --prefix trackft --run-dir /tmp/bench13_13c_256_3_trackft/run \
    --iters-per-frame 2 --init-iters 4 2>/dev/null | grep TRACK_JSON;
  timeout 3600 python experiments/track_learned.py --size 256 --epochs 60 \
    --iters-per-frame 2 --init-iters 4 2>/dev/null | grep TRACK_JSON; } \
  > "$R/track_learned_r5.jsonl"

# ---- P5: train-step scaling refresh at 20k faces (post quad-packing) ----
phase P5-scaling
{ timeout 1800 python experiments/bench_scaling.py --per-device-batch 16 \
    --mesh-detail 5 2>/dev/null | grep "^{";
  timeout 1800 python experiments/bench_scaling.py --train --per-device-batch 8 \
    --mesh-detail 5 2>/dev/null | grep "^{"; } > "$R/scaling_r5.jsonl"

# ---- P6: LW_FLOW A/B at 128^2 (cheap scale) ----
phase P6-flow-ab
timeout 3600 python experiments/benchmark_multiclass.py --size 128 --classes 13 \
  --epochs 30 --train-iter-size 2 --lw-flow 0.25 --out /tmp/flowab_on \
  > /tmp/flowab_on.log 2>&1
grep -h "BENCH13_JSON" /tmp/flowab_on.log | tail -1 > "$R/flow_ab_lw025.json"
timeout 3600 python experiments/benchmark_multiclass.py --size 128 --classes 13 \
  --epochs 30 --train-iter-size 2 --lw-flow 0.0 --out /tmp/flowab_off \
  > /tmp/flowab_off.log 2>&1
grep -h "BENCH13_JSON" /tmp/flowab_off.log | tail -1 > "$R/flow_ab_lw0.json"

# ---- P7: fresh 256^2 protocol eval of the surviving checkpoint (r5 code) ----
phase P7-256-eval
timeout 5400 python experiments/benchmark_multiclass.py --size 256 \
  --train-iter-size 4 --epochs 60 --classes 13 --test-only > /tmp/b256_eval.log 2>&1
grep -h "BENCH13_JSON" /tmp/b256_eval.log | tail -1 > "$R/bench13_256_r5.json"

phase DONE
