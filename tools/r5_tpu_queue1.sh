#!/bin/bash
# Round-5 TPU queue 1 (one TPU process at a time):
#   1. ab_r5 retry: pallas-gstack (compile-helper returned HTTP 500 on the
#      first try) + base/pallas at B=32 (batch-scaling point)
#   2. profile the train step at the new default (bf16 + pair + pallas attn)
set -e
cd /root/repo

echo "== ab_r5 retry: gstack =="
AB_VARIANTS=pallas-gstack python tools/ab_r5.py || true

echo "== ab_r5 B=32: pallas =="
BENCH_BATCH=32 AB_VARIANTS=pallas python tools/ab_r5.py || true

echo "== profile bf16+pair+pallas =="
BENCH_DTYPE=bfloat16 PROFILE_DIR=/tmp/profile_r5 python tools/profile_step.py \
    | tee artifacts/bench_r3/profile_r5_bf16_pallas.txt

echo "ALL R5 QUEUE1 DONE"
