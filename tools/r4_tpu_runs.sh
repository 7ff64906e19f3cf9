#!/bin/bash
# Round-4 TPU sequence (one TPU process at a time).  Waits for the relay
# tunnel (127.0.0.1:8103) to accept connections, then runs:
#   1. fp32 parity run to step 1500 + test  -> quality-table "ours" side
#      (matches the torch checkpoint's 1500 steps, checkpoints/torch_parity_r3.pt)
#   2. tools/ab_r4.py at B=16: nopair / pair / pair-remat-full / pair-remat-dots
#   3. tools/ab_r4.py at B=32: pair only (batch-scaling point)
# Corpus/binaries must exist (configs/tpu_run.yaml drive).
set -e
cd /root/repo

echo "== waiting for TPU tunnel =="
until python - <<'EOF' 2>/dev/null
import socket
s = socket.socket(); s.settimeout(3); s.connect(("127.0.0.1", 8103))
EOF
do sleep 60; done
echo "== tunnel up =="

echo "== fp32 parity run -> 1500 =="
python -m visinger_tpu.run train --config configs/parity_run.yaml \
    -hp "max_updates=1500,work_dir=checkpoints/parity_fp32_1500"
python -m visinger_tpu.run test --config checkpoints/parity_fp32_1500/config.yaml

echo "== ab_r4 B=16 =="
python tools/ab_r4.py

echo "== ab_r4 B=32 (pair) =="
BENCH_BATCH=32 AB_VARIANTS=pair python tools/ab_r4.py

echo "ALL R4 TPU RUNS DONE"
