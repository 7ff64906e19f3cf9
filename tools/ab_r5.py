"""Round-5 same-slot A/B: attention lowering + conv-layout variants.

The round-4 profile (artifacts/bench_r3/profile_r4_bf16_pair.txt) charged
~25% of device time to data formatting/copies around the attention tensors
and ~34% to the frame-rate transformers; VERDICT.md item #1 names the
levers.  Variants (all bf16 + pair-batched disc, the round-4 defaults):

    base          attn_impl=legacy (round-4 configuration)
    einsum        transpose-free attention einsums (XLA)
    pallas        fused Pallas rel-attention kernel
    pallas-fold   + decoder_time_fold (MXU-dense HiFi-GAN tail — negative
                  at inference shapes in round 3, untested in the train
                  step where the profile shows res_4 convs at ~2.4 TF/s)
    pallas-gstack + grouped_conv_impl=stack (disc_s grouped-conv lowering)
    fold-only     legacy attention + decoder_time_fold (isolates the fold)

One process = one tunnel slot, so ratios are decision-grade (CLAUDE.md).
Incremental JSONL out: artifacts/parity/ab_r5.jsonl.

    python tools/ab_r5.py                       # B=16 x T=640
    AB_VARIANTS=base,pallas python tools/ab_r5.py
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

BF16 = dict(compute_dtype="bfloat16", disc_pair_batch=True)
VARIANTS = {
    "base": dict(BF16, attn_impl="legacy"),
    "einsum": dict(BF16, attn_impl="einsum"),
    "pallas": dict(BF16, attn_impl="pallas"),
    "pallas-fold": dict(BF16, attn_impl="pallas", decoder_time_fold=True),
    "pallas-gstack": dict(BF16, attn_impl="pallas",
                          grouped_conv_impl="stack"),
    "fold-only": dict(BF16, attn_impl="legacy", decoder_time_fold=True),
    # VERDICT r4 #9: the Pallas fused WaveNet stack in the TRAIN path at the
    # new default shapes (standing negative was fp32/round-2, eval-only).
    "pallas-wn": dict(BF16, attn_impl="pallas", use_pallas=True),
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
        os.path.abspath(__file__))), "artifacts", "parity", "ab_r5.jsonl")
    base_ms = None
    for name in names:
        print(f"== {name} ==", flush=True)
        t0 = time.time()
        try:
            step_s, metrics = time_step(cfg0.replace(**VARIANTS[name]), batch)
        except Exception as e:  # record and keep measuring the rest
            rec = {"variant": name, "B": batch_size, "T": n_frames,
                   "error": f"{type(e).__name__}: {e}"[:500]}
            print("  FAILED " + json.dumps(rec), flush=True)
            with open(out_fn, "a") as f:
                f.write(json.dumps(rec) + "\n")
            continue
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
