"""Profile the fused train step on the attached TPU and print a cost table.

Runs bench.py's exact setup (B=16 x T=640 by default), captures 5 steps with
jax.profiler, then aggregates XLA op durations from the trace into buckets
(conv/matmul per subsystem, scan, elementwise fusions) so we can see where
the step time actually goes.  Usage:

    python tools/profile_step.py            # train step
    BENCH_MODE=rtf python tools/profile_step.py   # infer program

Trace parsing: the axon backend writes a chrome-trace `*.trace.json.gz`
under <logdir>/plugins/profile/<ts>/; we group complete events on the
device track by their HLO op-name prefix.
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import re
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from visinger_tpu.config import load_config
from visinger_tpu.data.synthetic import synthetic_batch
from visinger_tpu.models.factory import build_models, init_params, init_state
from visinger_tpu.training.train_step import make_train_step


def classify(name: str) -> str:
    """Map an XLA/HLO event name to a coarse cost bucket."""
    n = name.lower()
    if "all-reduce" in n or "psum" in n:
        return "collectives"
    if "dynamic-update-slice" in n or "dynamic-slice" in n:
        return "dynamic-slice"
    if "scatter" in n:
        return "scatter"
    if "gather" in n:
        return "gather"
    if "while" in n:
        return "while/scan"
    if "conv" in n:
        return "conv"
    if "dot" in n or "matmul" in n or "einsum" in n:
        return "dot"
    if "fusion" in n:
        return "fusion(elementwise)"
    if "copy" in n or "transpose" in n or "reshape" in n or "bitcast" in n:
        return "layout/copy"
    if "reduce" in n:
        return "reduce"
    if "rng" in n:
        return "rng"
    return "other"


def main():
    batch_size = int(os.environ.get("BENCH_BATCH", 16))
    n_frames = int(os.environ.get("BENCH_FRAMES", 640))
    n_tokens = int(os.environ.get("BENCH_TOKENS", 192))
    mode = os.environ.get("BENCH_MODE", "train")
    logdir = os.environ.get("PROFILE_DIR", "/tmp/profile_step")

    cfg = load_config(name="visinger_csd")
    dtype = os.environ.get("BENCH_DTYPE")
    if dtype:
        cfg = cfg.replace(compute_dtype=dtype)
    raw = synthetic_batch(batch_size, n_tokens, n_frames, vocab=60,
                          pitch_vocab=117, dur_vocab=98,
                          num_linear_bins=cfg.num_linear_bins,
                          hop_size=cfg.hop_size)
    batch = {k: jnp.asarray(v) for k, v in raw.items()}
    model, disc = build_models(cfg, ph_vocab=60, pitch_vocab=117, dur_vocab=98)

    if mode == "rtf":
        params_g, _ = init_params(cfg, model, disc, raw)

        def run(params, batch, rng):
            out = model.apply(
                {"params": params}, text_tokens=batch["text_tokens"],
                pitch_tokens=batch["note_pitch"], dur_tokens=batch["note_dur"],
                mel2ph=batch["mel2ph"], spk_id=batch["spk_ids"],
                infer=True, deterministic=True, rngs={"sample": rng})
            return jnp.sum(out["wav_out"])

        fn = jax.jit(run)
        rng = jax.random.PRNGKey(0)
        print("compiling (rtf mode)...", flush=True)
        float(fn(params_g, batch, rng))
        print("running traced steps...", flush=True)
        with jax.profiler.trace(logdir):
            for _ in range(5):
                float(fn(params_g, batch, rng))
    else:
        state = init_state(cfg, model, disc, batch)
        step_fn = jax.jit(make_train_step(cfg, model, disc), donate_argnums=(0,))
        print("compiling (train mode)...", flush=True)
        t0 = time.time()
        state, metrics = step_fn(state, batch)
        # honest barrier: read a scalar from the step
        _ = float(metrics["total_g"])
        print(f"compiled+step in {time.time() - t0:.1f}s", flush=True)
        print("running traced steps...", flush=True)
        with jax.profiler.trace(logdir):
            for _ in range(5):
                state, metrics = step_fn(state, batch)
            _ = float(metrics["total_g"])

    traces = sorted(glob.glob(os.path.join(
        logdir, "plugins/profile/*/*.trace.json.gz")))
    if not traces:
        print("no trace written", flush=True)
        return
    with gzip.open(traces[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # device tracks: pid/tid names containing "TPU"/"XLA Ops" vary by backend;
    # keep complete events ("X") with a duration and an args.name or name.
    by_bucket = collections.Counter()
    by_op = collections.Counter()
    total = 0.0
    pid_names = {e.get("pid"): e.get("args", {}).get("name", "")
                 for e in events if e.get("ph") == "M"
                 and e.get("name") == "process_name"}
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = pid_names.get(e.get("pid"), "")
        if not re.search(r"tpu|device|/device|xla ops", pname, re.I):
            continue
        dur = e.get("dur", 0) / 1e3  # us -> ms
        name = e.get("name", "")
        by_bucket[classify(name)] += dur
        # strip .N suffixes for grouping
        by_op[re.sub(r"\.\d+$", "", name)] += dur
        total += dur
    if total == 0:
        # fall back: take every X event (host+device), better than nothing
        for e in events:
            if e.get("ph") != "X":
                continue
            dur = e.get("dur", 0) / 1e3
            name = e.get("name", "")
            by_bucket[classify(name)] += dur
            by_op[re.sub(r"\.\d+$", "", name)] += dur
            total += dur
        print("(no device-track match; aggregating ALL tracks)")
    print(f"\ntrace: {traces[-1]}")
    print(f"total device op time over 5 steps: {total:.1f} ms "
          f"({total / 5:.1f} ms/step)\n")
    print("== by bucket ==")
    for k, v in by_bucket.most_common():
        print(f"  {k:24s} {v:9.2f} ms  {100 * v / total:5.1f}%")
    print("\n== top 30 ops ==")
    for k, v in by_op.most_common(30):
        print(f"  {v:9.2f} ms  {100 * v / total:5.1f}%  {k[:110]}")


if __name__ == "__main__":
    main()
