#!/bin/bash
# Round-5 chip queue v3 (adaptive): /tmp was wiped between sessions, so the
# 256^2 seed checkpoint is gone — P1 retrains it from scratch (the r4 recipe
# took ~75 min on-chip, README "Measured accuracy").  Later phases follow the
# round-4 VERDICT's own priority order (480x640 protocol > occlusion >
# tracking > flow A/B > scaling) and each is gated on time remaining before
# DEADLINE_TS, so the tail is cut cleanly rather than half-run.
# Each training phase runs in its OWN process: the tunnel client leaks host
# memory per transferred batch; a process restart is the only reliable bound
# (resume + persistent compile cache make restarts ~2 min).
#   DEADLINE_TS=$(date -d '+4 hours' +%s) setsid nohup \
#     bash experiments/run_r5_chip_queue3.sh > /tmp/r5_queue3.log 2>&1 &
set -x
cd /root/repo
R=experiments/results
mkdir -p "$R"
: "${DEADLINE_TS:?set DEADLINE_TS (epoch seconds)}"

left_min() { echo $(( (DEADLINE_TS - $(date +%s)) / 60 )); }
phase() { echo "=== $(date +%H:%M:%S) PHASE $1 (left: $(left_min) min) ==="; }

# ---- P1: 13-class 256^2 protocol run (r4 recipe: TIS=2 curriculum then
#          TIS=4; lr 2e-4; chunked; ~100 min with cold compiles).  Everything
#          later seeds from its epoch-60 checkpoint. ----
phase P1a-256-tis2
timeout 3600 python experiments/benchmark_multiclass.py --size 256 --train-iter-size 2 \
  --epochs 15 --classes 13 --lr 2e-4 --train-only > /tmp/b256_a.log 2>&1 || exit 1
phase P1b-256-tis4
timeout 3600 python experiments/benchmark_multiclass.py --size 256 --train-iter-size 4 \
  --epochs 30 --classes 13 --lr 2e-4 --resume-epoch 15 --train-only > /tmp/b256_b.log 2>&1 || exit 1
phase P1c-256-tis4
timeout 3600 python experiments/benchmark_multiclass.py --size 256 --train-iter-size 4 \
  --epochs 45 --classes 13 --lr 2e-4 --resume-epoch 30 --train-only > /tmp/b256_c.log 2>&1 || exit 1
phase P1d-256-tis4-eval
timeout 5400 python experiments/benchmark_multiclass.py --size 256 --train-iter-size 4 \
  --epochs 60 --classes 13 --lr 2e-4 --resume-epoch 45 > /tmp/b256_d.log 2>&1 || exit 1
grep -h "BENCH13_JSON" /tmp/b256_d.log | tail -1 > "$R/bench13_256_r5.json"

# ---- P2: 480x640 protocol run, conv trunk seeded from the 256^2 checkpoint
#          (fc6 is resolution-dependent and trains fresh); TIS=4, batch 16,
#          4-epoch chunks.  8 epochs + eval if time is short, 12 if not. ----
SEED=/tmp/bench13_13c_256_3/run/bench13
if [ "$(left_min)" -ge 110 ]; then
  phase P2a-480-0to4
  timeout 7200 python experiments/benchmark_multiclass.py --size 480 --width 640 \
    --train-iter-size 4 --epochs 4 --classes 13 --batch 16 --lr 1e-4 \
    --seed-convs "$SEED" --seed-epoch 60 --train-only > /tmp/b480_a.log 2>&1
  phase P2b-480-to8
  timeout 5400 python experiments/benchmark_multiclass.py --size 480 --width 640 \
    --train-iter-size 4 --epochs 8 --classes 13 --batch 16 --lr 1e-4 \
    --resume-epoch 4 --train-only > /tmp/b480_8.log 2>&1
  LAST=8
  if [ "$(left_min)" -ge 150 ]; then
    phase P2c-480-to12
    timeout 5400 python experiments/benchmark_multiclass.py --size 480 --width 640 \
      --train-iter-size 4 --epochs 12 --classes 13 --batch 16 --lr 1e-4 \
      --resume-epoch 8 --train-only > /tmp/b480_12.log 2>&1
    LAST=12
  fi
  phase P2e-480-eval
  timeout 7200 python experiments/benchmark_multiclass.py --size 480 --width 640 \
    --train-iter-size 4 --epochs $((LAST+4)) --classes 13 --batch 16 --lr 1e-4 \
    --resume-epoch $LAST > /tmp/b480_e.log 2>&1
  grep -h "BENCH13_JSON" /tmp/b480_e.log | tail -1 > "$R/bench13_480x640_r5.json"
fi

# ---- P3: occlusion fine-tune (256 scenes, 30 epochs, visibility-aware
#          supervision), chunked at 15, then eval ----
if [ "$(left_min)" -ge 70 ]; then
  phase P3a-occ
  timeout 5400 python experiments/benchmark_occlusion.py --size 256 --epochs 60 \
    --train-scenes 256 --finetune-epochs 15 --train-only > /tmp/occ_a.log 2>&1
  phase P3b-occ
  timeout 5400 python experiments/benchmark_occlusion.py --size 256 --epochs 60 \
    --train-scenes 256 --finetune-epochs 30 --resume-epoch 75 > /tmp/occ_b.log 2>&1
  grep -h "BENCH_OCC_JSON" /tmp/occ_b.log | tail -1 > "$R/bench_occlusion_r5.json"
fi

# ---- P4: tracking-precision fine-tune + tracking eval ----
if [ "$(left_min)" -ge 55 ]; then
  phase P4a-trackft
  timeout 5400 python experiments/track_finetune.py --size 256 --epochs 60 \
    --finetune-epochs 20 > /tmp/trackft.log 2>&1
  phase P4b-track-eval
  timeout 3600 python experiments/track_learned.py --size 256 --epochs 80 \
    --prefix trackft --run-dir /tmp/bench13_13c_256_3_trackft/run \
    --iters-per-frame 2 --init-iters 4 2>/dev/null | grep TRACK_JSON \
    > "$R/track_learned_r5.jsonl"
fi

# ---- P6: LW_FLOW A/B at 128^2 (cheap scale) ----
if [ "$(left_min)" -ge 40 ]; then
  phase P6-flow-ab-on
  timeout 2700 python experiments/benchmark_multiclass.py --size 128 --classes 13 \
    --epochs 30 --train-iter-size 2 --lw-flow 0.25 --out /tmp/flowab_on \
    > /tmp/flowab_on.log 2>&1
  grep -h "BENCH13_JSON" /tmp/flowab_on.log | tail -1 > "$R/flow_ab_lw025.json"
fi
if [ "$(left_min)" -ge 25 ]; then
  phase P6-flow-ab-off
  timeout 2700 python experiments/benchmark_multiclass.py --size 128 --classes 13 \
    --epochs 30 --train-iter-size 2 --lw-flow 0.0 --out /tmp/flowab_off \
    > /tmp/flowab_off.log 2>&1
  grep -h "BENCH13_JSON" /tmp/flowab_off.log | tail -1 > "$R/flow_ab_lw0.json"
fi

# ---- P5: train-step scaling refresh at 20k faces (post quad-packing) ----
if [ "$(left_min)" -ge 15 ]; then
  phase P5-scaling
  { timeout 1200 python experiments/bench_scaling.py --per-device-batch 16 \
      --mesh-detail 5 2>/dev/null | grep "^{";
    timeout 1200 python experiments/bench_scaling.py --train --per-device-batch 8 \
      --mesh-detail 5 2>/dev/null | grep "^{"; } > "$R/scaling_r5.jsonl"
fi

phase DONE
