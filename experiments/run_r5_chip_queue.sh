#!/bin/bash
# Round-5 chip queue: every TPU job of the round, serialized (the tunneled
# chip is exclusive).  Each training phase runs in its OWN process — the
# tunnel client leaks host memory per transferred batch, and a process
# restart is the only reliable bound (resume + the persistent compile cache
# make restarts ~2 min).  Run detached:
#   setsid nohup bash experiments/run_r5_chip_queue.sh > /tmp/r5_queue.log 2>&1 &
set -x
cd /root/repo
R=experiments/results
mkdir -p "$R"

phase() { echo "=== $(date +%H:%M:%S) PHASE $1 ==="; }

# ---- P0: heavy-tailed mesh bench row (tiered CSR budgets) ----
phase P0-mixed-bench
BENCH_MESH=mixed timeout 1500 python bench.py 2>/dev/null | tail -1 | tee "$R/bench_mixed_r5.json"

# ---- P1: 13-class 256^2 protocol run (the r4 recipe: TIS=2 curriculum
#          then TIS=4; lr 2e-4; chunked every ~15 epochs) ----
phase P1a-256-tis2
timeout 3600 python experiments/benchmark_multiclass.py --size 256 --train-iter-size 2 \
  --epochs 15 --classes 13 --lr 2e-4 --train-only > /tmp/b256_a.log 2>&1
phase P1b-256-tis4
timeout 3600 python experiments/benchmark_multiclass.py --size 256 --train-iter-size 4 \
  --epochs 30 --classes 13 --lr 2e-4 --resume-epoch 15 --train-only > /tmp/b256_b.log 2>&1
phase P1c-256-tis4
timeout 3600 python experiments/benchmark_multiclass.py --size 256 --train-iter-size 4 \
  --epochs 45 --classes 13 --lr 2e-4 --resume-epoch 30 --train-only > /tmp/b256_c.log 2>&1
phase P1d-256-tis4-eval
timeout 5400 python experiments/benchmark_multiclass.py --size 256 --train-iter-size 4 \
  --epochs 60 --classes 13 --lr 2e-4 --resume-epoch 45 > /tmp/b256_d.log 2>&1
grep -h "BENCH13_JSON" /tmp/b256_d.log | tail -1 > "$R/bench13_256_r5.json"

# ---- P2: 480x640 protocol run, conv trunk seeded from the 256^2
#          checkpoint (fc6 is resolution-dependent and trains fresh);
#          TIS=4 directly (the fine-tune regime), batch 16, 4-epoch chunks ----
SEED=/tmp/bench13_13c_256_3/run/bench13
phase P2a-480
timeout 7200 python experiments/benchmark_multiclass.py --size 480 --width 640 \
  --train-iter-size 4 --epochs 4 --classes 13 --batch 16 --lr 1e-4 \
  --seed-convs "$SEED" --seed-epoch 60 --train-only > /tmp/b480_a.log 2>&1
for EP in 8 12 16; do
  phase P2-480-to-$EP
  timeout 5400 python experiments/benchmark_multiclass.py --size 480 --width 640 \
    --train-iter-size 4 --epochs $EP --classes 13 --batch 16 --lr 1e-4 \
    --resume-epoch $((EP-4)) --train-only > /tmp/b480_$EP.log 2>&1
done
phase P2e-480-eval
timeout 7200 python experiments/benchmark_multiclass.py --size 480 --width 640 \
  --train-iter-size 4 --epochs 20 --classes 13 --batch 16 --lr 1e-4 \
  --resume-epoch 16 > /tmp/b480_e.log 2>&1
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

phase DONE
