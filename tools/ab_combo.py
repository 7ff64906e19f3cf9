"""Same-slot A/B over train-step variants: dtype x grouped-conv lowering.

One process (one tunnel slot), sequential compiles, incremental JSONL out —
partial results survive a timeout.  Variants:

    f32-native   compute_dtype=float32, grouped_conv_impl=native (default)
    f32-stack    float32, tap-stacked grouped conv (modules/common.py)
    bf16-native  bfloat16 compute / f32 params
    bf16-stack   both

    AB_VARIANTS=f32-native,bf16-native python tools/ab_combo.py
    (default: all four; B=16 x T=640 bench shape, BENCH_* env as usual)

Writes artifacts/parity/ab_combo.jsonl (one record per variant, appended as
soon as it is measured).
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
    "f32-native": dict(compute_dtype="float32", grouped_conv_impl="native"),
    "f32-stack": dict(compute_dtype="float32", grouped_conv_impl="stack"),
    "bf16-native": dict(compute_dtype="bfloat16", grouped_conv_impl="native"),
    "bf16-stack": dict(compute_dtype="bfloat16", grouped_conv_impl="stack"),
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
        os.path.abspath(__file__))), "artifacts", "parity", "ab_combo.jsonl")
    base_ms = None
    for name in names:
        print(f"== {name} ==", flush=True)
        t0 = time.time()
        ms, metrics = time_step(cfg0.replace(**VARIANTS[name]), batch)
        rec = {"variant": name, "ms_per_step": round(ms * 1e3, 2),
               "mel_frames_per_s": round(batch_size * n_frames / ms, 1),
               "total_g": round(float(metrics["total_g"]), 4),
               "shape": [batch_size, n_frames],
               "compile_s": round(time.time() - t0, 1)}
        if base_ms is None:
            base_ms = ms
        rec["speedup_vs_first"] = round(base_ms / ms, 3)
        with open(out_fn, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
