#!/bin/bash
# Round-3 TPU training sequence (one TPU process at a time):
#   1. fp32 parity run to step 1000  -> test (quality-table "ours" side)
#   2. resume fp32 to step 2500      -> test (bf16 A/B endpoint)
#   3. bf16 twin to step 2500        -> test
# Corpus/binaries must exist (configs/tpu_run.yaml drive).
set -e
cd /root/repo

echo "== fp32 parity run -> 1000 =="
python -m visinger_tpu.run train --config configs/parity_run.yaml \
    -hp "max_updates=1000,work_dir=checkpoints/parity_fp32"
python -m visinger_tpu.run test --config checkpoints/parity_fp32/config.yaml

echo "== fp32 resume -> 2500 =="
python -m visinger_tpu.run train --config checkpoints/parity_fp32/config.yaml \
    -hp "max_updates=2500"
python -m visinger_tpu.run test --config checkpoints/parity_fp32/config.yaml

echo "== bf16 twin -> 2500 =="
python -m visinger_tpu.run train --config configs/parity_run.yaml \
    -hp "max_updates=2500,compute_dtype=bfloat16,work_dir=checkpoints/parity_bf16"
python -m visinger_tpu.run test --config checkpoints/parity_bf16/config.yaml

echo "ALL TPU RUNS DONE"
