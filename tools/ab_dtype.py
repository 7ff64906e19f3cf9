"""Single-process A/B: fp32 vs bf16 fused train step on the attached TPU.

The tunnel assigns per-PROCESS fast/slow slots (~7x spread), so dtype
comparisons are only meaningful inside ONE process.  Compiles both programs
in the same slot and reports ms/step medians + the ratio.

    python tools/ab_dtype.py            # B=16 x T=640 (bench.py default)
    BENCH_BATCH=4 BENCH_FRAMES=800 python tools/ab_dtype.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from visinger_tpu.config import load_config
from visinger_tpu.data.synthetic import synthetic_batch
from visinger_tpu.models.factory import build_models, init_state
from visinger_tpu.training.train_step import make_train_step


def time_step(cfg, batch, iters=10, trials=3):
    """ms/step behind the chained-readback barrier (bench.py's): each timed
    window runs ``iters`` donated steps closed by ONE scalar readback that
    depends on the full final step, so the per-readback tunnel round-trip
    amortizes to ~1/iters per step."""
    model, disc = build_models(cfg, ph_vocab=60, pitch_vocab=117, dur_vocab=98)
    state = init_state(cfg, model, disc, batch)
    step_fn = jax.jit(make_train_step(cfg, model, disc), donate_argnums=(0,))

    def barrier(m):
        return float(jax.device_get(m["total_g"] + m["disc"] + m["gnorm_g"]))

    t0 = time.time()
    state, metrics = step_fn(state, batch)
    barrier(metrics)
    print(f"  compiled+first step in {time.time() - t0:.1f}s", flush=True)
    for _ in range(2):  # warm
        state, metrics = step_fn(state, batch)
    barrier(metrics)
    per_step = []
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(iters):
            state, metrics = step_fn(state, batch)
        barrier(metrics)
        per_step.append((time.perf_counter() - t0) / iters)
    del state
    return min(per_step), metrics


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
    for dtype in ("float32", "bfloat16"):
        print(f"== {dtype} ==", flush=True)
        ms, metrics = time_step(cfg.replace(compute_dtype=dtype), batch)
        fps = batch_size * n_frames / ms
        results[dtype] = {"ms_per_step": round(ms * 1e3, 2),
                          "mel_frames_per_s": round(fps, 1),
                          "total_g": round(float(metrics["total_g"]), 3),
                          "gnorm_g": round(float(metrics["gnorm_g"]), 1)}
        print(f"  {results[dtype]}", flush=True)
    speedup = (results["float32"]["ms_per_step"]
               / results["bfloat16"]["ms_per_step"])
    print(json.dumps({"B": batch_size, "T": n_frames, **results,
                      "bf16_speedup": round(speedup, 3)}))


if __name__ == "__main__":
    main()
