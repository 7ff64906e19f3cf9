"""Single-process A/B: native XLA grouped conv vs the tap-stacked einsum
formulation (modules/common.py:_grouped_conv_stacked) in the full fused
train step.  Same-slot comparison (the tunnel's per-process fast/slow slots
make cross-process timing meaningless).

    python tools/ab_grouped.py          # B=16 x T=640
"""

from __future__ import annotations

import json
import os
import sys

import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.ab_dtype import time_step  # noqa: E402
from visinger_tpu.config import load_config  # noqa: E402
from visinger_tpu.data.synthetic import synthetic_batch  # noqa: E402


def main():
    batch_size = int(os.environ.get("BENCH_BATCH", 16))
    n_frames = int(os.environ.get("BENCH_FRAMES", 640))
    n_tokens = int(os.environ.get("BENCH_TOKENS", 192))

    cfg = load_config(name="visinger_csd")
    raw = synthetic_batch(batch_size, n_tokens, n_frames, vocab=60,
                          pitch_vocab=117, dur_vocab=98,
                          num_linear_bins=cfg.num_linear_bins,
                          hop_size=cfg.hop_size)
    batch = {k: jnp.asarray(v) for k, v in raw.items()}
    results = {}
    for impl in ("native", "stack"):
        print(f"== grouped_conv_impl={impl} ==", flush=True)
        ms, metrics = time_step(cfg.replace(grouped_conv_impl=impl), batch)
        results[impl] = {"ms_per_step": round(ms * 1e3, 2),
                         "mel_frames_per_s": round(batch_size * n_frames / ms, 1),
                         "total_g": round(float(metrics["total_g"]), 3)}
        print(f"  {results[impl]}", flush=True)
    speedup = results["native"]["ms_per_step"] / results["stack"]["ms_per_step"]
    print(json.dumps({"B": batch_size, "T": n_frames, **results,
                      "stack_speedup": round(speedup, 3)}))


if __name__ == "__main__":
    main()
