#!/bin/bash
# Round-5 TPU queue 2 — runs AFTER the soak (one TPU process at a time):
#   1. streaming synthesis end-to-end on the TPU with a TRAINED checkpoint
#      (VERDICT r4 next #4) — uses the soak run's weights
#   2. bf16 warm-up transient bisect (#5) — one f32 island at a time
#   3. Pallas WaveNet train-path re-A/B at the new defaults (#9), measured
#      against the pallas-attention base INSIDE the same process/slot
set -e
cd /root/repo

echo "== streaming e2e on TPU (soak checkpoint) =="
STREAM2_WORKDIR=checkpoints/soak_r5 STREAM2_SECONDS=50 \
    python tools/stream_tpu_demo2.py \
    > artifacts/r5_stream2_tpu.log 2>&1 || tail -5 artifacts/r5_stream2_tpu.log
tail -3 artifacts/r5_stream2_tpu.log || true

echo "== bf16 island bisect =="
# Loss TRAJECTORIES (unlike timings) are slot-independent, so the bf16
# baseline and fp32 anchors come from the recorded runs
# (artifacts/parity/bf16_run_2500.md: bf16 settles ~step 1100, fp32 ~200)
# — only the candidate islands need fresh programs.  CTC/phoneme is the
# prime suspect (ctc ~1500 in the transient window).
ISLANDS=phoneme,disc,decoder ISLAND_STEPS=1500 \
    python tools/bf16_islands.py \
    > artifacts/r5_bf16_islands.log 2>&1 || tail -5 artifacts/r5_bf16_islands.log
tail -5 artifacts/r5_bf16_islands.log || true

echo "== pallas WaveNet train-path A/B =="
AB_VARIANTS=pallas,pallas-wn python tools/ab_r5.py \
    > artifacts/r5_ab_wn.log 2>&1 || tail -5 artifacts/r5_ab_wn.log
tail -4 artifacts/r5_ab_wn.log || true

echo "ALL R5 QUEUE2 DONE"
