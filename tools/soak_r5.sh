#!/bin/bash
# Round-5 soak run (VERDICT r4 weak #8): 25k optimizer steps, bf16 + Pallas
# attention + async checkpoints + TB media + rotation, with a REAL mid-run
# kill (-9) and resume, then the test-split synthesis for the pitch probe.
# One TPU process at a time throughout.
set -e
cd /root/repo

echo "== soak phase 1: train to ~12k then kill -9 =="
python -m visinger_tpu.run train --config configs/soak_r5.yaml \
    > artifacts/soak_r5_phase1.log 2>&1 &
PID=$!
echo "phase1 pid $PID"
# wait for step 12000 to appear in the log, then kill hard mid-flight
while kill -0 $PID 2>/dev/null; do
    sleep 30
    if grep -q "step 12[0-9][0-9][0-9]:" artifacts/soak_r5_phase1.log; then
        echo "== killing $PID mid-run =="
        kill -9 $PID || true
        break
    fi
done
wait $PID 2>/dev/null || true
sleep 5

echo "== soak phase 2: resume to 25k =="
python -m visinger_tpu.run train --config configs/soak_r5.yaml \
    > artifacts/soak_r5_phase2.log 2>&1
grep -m1 "resumed from" artifacts/soak_r5_phase2.log || echo "NO RESUME LINE"

echo "== soak test synthesis (pitch probe @ 25k) =="
python -m visinger_tpu.run test --config configs/soak_r5.yaml \
    > artifacts/soak_r5_test.log 2>&1 || true
tail -3 artifacts/soak_r5_test.log

echo "ALL SOAK DONE"
