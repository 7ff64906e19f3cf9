"""Round-4 same-slot A/B over train-step variants (all bf16 — the validated
benched dtype, artifacts/parity/bf16_run_2500.md):

    nopair       disc_pair_batch=false (the round-3 configuration)
    pair         one concat([real,fake]) pass per sub-discriminator (new
                 default — modules/discriminator.py pair_batch)
    pair-remat-full   + remat_policy=full (recompute forward in backward —
                 the bandwidth-bound bet, train_step.py)
    pair-remat-dots   + remat_policy=dots (save matmuls only)

One process = one tunnel slot, so ratios are decision-grade (CLAUDE.md).
Incremental JSONL out: artifacts/parity/ab_r4.jsonl.

    python tools/ab_r4.py                      # B=16 x T=640
    BENCH_BATCH=32 python tools/ab_r4.py       # scaling point
    AB_VARIANTS=pair,pair-remat-full python tools/ab_r4.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.ab_dtype import time_step  # noqa: E402
from visinger_tpu.config import load_config  # noqa: E402
from visinger_tpu.data.synthetic import synthetic_batch  # noqa: E402

VARIANTS = {
    "nopair": dict(compute_dtype="bfloat16", disc_pair_batch=False),
    "pair": dict(compute_dtype="bfloat16", disc_pair_batch=True),
    "pair-remat-full": dict(compute_dtype="bfloat16", disc_pair_batch=True,
                            remat_policy="full"),
    "pair-remat-dots": dict(compute_dtype="bfloat16", disc_pair_batch=True,
                            remat_policy="dots"),
}


def main():
    batch_size = int(os.environ.get("BENCH_BATCH", 16))
    n_frames = int(os.environ.get("BENCH_FRAMES", 640))
    n_tokens = int(os.environ.get("BENCH_TOKENS", 192))
    names = [n for n in os.environ.get(
        "AB_VARIANTS", ",".join(VARIANTS)).split(",") if n]

    cfg0 = load_config(name="visinger_csd")
    raw = synthetic_batch(batch_size, n_tokens, n_frames, vocab=60,
                          pitch_vocab=117, dur_vocab=98,
                          num_linear_bins=cfg0.num_linear_bins,
                          hop_size=cfg0.hop_size)
    batch = {k: jnp.asarray(v) for k, v in raw.items()}
    out_fn = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts", "parity", "ab_r4.jsonl")
    base_ms = None
    for name in names:
        print(f"== {name} ==", flush=True)
        t0 = time.time()
        step_s, metrics = time_step(cfg0.replace(**VARIANTS[name]), batch)
        rec = {"variant": name, "B": batch_size, "T": n_frames,
               "ms_per_step": round(step_s * 1e3, 2),
               "mel_frames_per_s": round(batch_size * n_frames / step_s, 1),
               "total_g": round(float(metrics["total_g"]), 3),
               "compile_s": round(time.time() - t0, 1)}
        if base_ms is None:
            base_ms = step_s
        rec["speedup_vs_first"] = round(base_ms / step_s, 3)
        print("  " + json.dumps(rec), flush=True)
        with open(out_fn, "a") as f:
            f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
