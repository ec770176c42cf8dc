#!/bin/bash
# Round-5 chip queue v6 — final controller.  Starts after P1b (256^2 base to
# epoch 30, launched by v5) finishes; WAIT_PID is that python.  Gates
# recalibrated after measuring TIS=4 throughput (36 samples/s at 256^2 =>
# a 128-pair 480x640 epoch is ~4 min, so deeper 480 fine-tuning is cheap):
#   480 fine-tune extends to 8 then 12 epochs while occlusion + eval still
#   fit; occlusion > tracking > flow A/B > scaling behind it.
#   DEADLINE_TS=... WAIT_PID=<P1b pid> setsid nohup \
#     bash experiments/run_r5_chip_queue6.sh > /tmp/r5_queue6.log 2>&1 &
set -x
cd /root/repo
R=experiments/results
: "${DEADLINE_TS:?set DEADLINE_TS (epoch seconds)}"

left_min() { echo $(( (DEADLINE_TS - $(date +%s)) / 60 )); }
phase() { echo "=== $(date +%H:%M:%S) PHASE $1 (left: $(left_min) min) ==="; }

if [ -n "$WAIT_PID" ]; then
  phase WAIT-P1b
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
fi
[ -d /tmp/bench13_13c_256_3/run/bench13_ckpt/30 ] || { echo "no epoch-30 ckpt"; exit 1; }

SEED=/tmp/bench13_13c_256_3/run/bench13

# ---- P2: 480x640 protocol — gen + seeded fine-tune chunks, then eval ----
phase P2a-480-gen-0to4
timeout 7200 python experiments/benchmark_multiclass.py --size 480 --width 640 \
  --train-iter-size 4 --epochs 4 --classes 13 --batch 16 --lr 1e-4 \
  --n-train 128 --seed-convs "$SEED" --seed-epoch 30 --train-only > /tmp/b480_a.log 2>&1
LAST=4
if [ "$(left_min)" -ge 110 ]; then
  phase P2b-480-to-8
  timeout 5400 python experiments/benchmark_multiclass.py --size 480 --width 640 \
    --train-iter-size 4 --epochs 8 --classes 13 --batch 16 --lr 1e-4 \
    --n-train 128 --resume-epoch 4 --train-only > /tmp/b480_8.log 2>&1 && LAST=8
fi
if [ "$LAST" -eq 8 ] && [ "$(left_min)" -ge 130 ]; then
  phase P2c-480-to-12
  timeout 5400 python experiments/benchmark_multiclass.py --size 480 --width 640 \
    --train-iter-size 4 --epochs 12 --classes 13 --batch 16 --lr 1e-4 \
    --n-train 128 --resume-epoch 8 --train-only > /tmp/b480_12.log 2>&1 && LAST=12
fi
phase P2e-480-eval
timeout 5400 python experiments/benchmark_multiclass.py --size 480 --width 640 \
  --train-iter-size 4 --epochs $LAST --classes 13 --batch 16 --lr 1e-4 \
  --n-train 128 --test-only > /tmp/b480_e.log 2>&1
grep -h "BENCH13_JSON" /tmp/b480_e.log | tail -1 > "$R/bench13_480x640_r5.json"

# ---- P3: occlusion fine-tune off the epoch-30 base, then eval ----
if [ "$(left_min)" -ge 40 ]; then
  phase P3-occ
  timeout 5400 python experiments/benchmark_occlusion.py --size 256 --epochs 30 \
    --train-scenes 256 --finetune-epochs 30 > /tmp/occ_b.log 2>&1
  grep -h "BENCH_OCC_JSON" /tmp/occ_b.log | tail -1 > "$R/bench_occlusion_r5.json"
fi

# ---- P4: tracking-precision fine-tune + tracking eval ----
if [ "$(left_min)" -ge 55 ]; then
  phase P4a-trackft
  timeout 3600 python experiments/track_finetune.py --size 256 --epochs 30 \
    --finetune-epochs 20 > /tmp/trackft.log 2>&1
  phase P4b-track-eval
  timeout 2700 python experiments/track_learned.py --size 256 --epochs 50 \
    --prefix trackft --run-dir /tmp/bench13_13c_256_3_trackft/run \
    --iters-per-frame 2 --init-iters 4 2>/dev/null | grep TRACK_JSON \
    > "$R/track_learned_r5.jsonl"
fi

# ---- P6: LW_FLOW A/B at 128^2 ----
if [ "$(left_min)" -ge 35 ]; then
  phase P6-flow-ab-off
  timeout 2400 python experiments/benchmark_multiclass.py --size 128 --classes 13 \
    --epochs 30 --train-iter-size 2 --lw-flow 0.0 --out /tmp/flowab_off \
    > /tmp/flowab_off.log 2>&1
  grep -h "BENCH13_JSON" /tmp/flowab_off.log | tail -1 > "$R/flow_ab_lw0.json"
fi
if [ "$(left_min)" -ge 35 ]; then
  phase P6-flow-ab-on
  timeout 2400 python experiments/benchmark_multiclass.py --size 128 --classes 13 \
    --epochs 30 --train-iter-size 2 --lw-flow 0.25 --out /tmp/flowab_on \
    > /tmp/flowab_on.log 2>&1
  grep -h "BENCH13_JSON" /tmp/flowab_on.log | tail -1 > "$R/flow_ab_lw025.json"
fi

# ---- P5: train-step scaling refresh ----
if [ "$(left_min)" -ge 12 ]; then
  phase P5-scaling
  timeout 1200 python experiments/bench_scaling.py --train --per-device-batch 8 \
    --mesh-detail 5 2>/dev/null | grep "^{" > "$R/scaling_r5.jsonl"
fi

phase DONE
