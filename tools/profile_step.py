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


def subsystem(tf_op: str) -> str:
    """Attribute an event to a model subsystem from its tf_op path, e.g.
    'jit(train_step)/transpose(jvp(VISinger))/decoder/up_0/...' ->
    'bwd/decoder'."""
    if not tf_op:
        return "(no tf_op)"
    parts = tf_op.split("/")
    direction = "bwd" if any("transpose(" in p for p in parts) else "fwd"
    # first component after the jit/jvp wrappers that names a module
    skip = ("jit(", "jvp(", "transpose(", "checkpoint")
    mods = [p for p in parts[1:] if p and not p.startswith(skip)]
    top = mods[0] if mods else parts[-1].rstrip(":")
    # collapse per-layer suffixes: up_0 -> up, layers_3 -> layers
    top = re.sub(r"_\d+$", "", top)
    return f"{direction}/{top}"


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

    report(logdir)


def report(logdir: str, n_steps: int = 5):
    """Aggregate the newest trace under ``logdir``: per-subsystem time
    (tf_op attribution), HLO-category totals, top ops with source lines,
    and bytes/FLOPs roofline hints."""
    traces = sorted(glob.glob(os.path.join(
        logdir, "plugins/profile/*/*.trace.json.gz")))
    if not traces:
        print("no trace written", flush=True)
        return
    with gzip.open(traces[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    pid_names = {e.get("pid"): e.get("args", {}).get("name", "")
                 for e in events if e.get("ph") == "M"
                 and e.get("name") == "process_name"}
    tid_names = {(e.get("pid"), e.get("tid")): e.get("args", {}).get("name", "")
                 for e in events if e.get("ph") == "M"
                 and e.get("name") == "thread_name"}
    by_sub = collections.Counter()
    by_cat = collections.Counter()
    by_op = collections.defaultdict(lambda: [0.0, 0, 0, ""])  # ms, bytes, flops, src
    total = bytes_total = flops_total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        if "device" not in pid_names.get(e.get("pid"), "").lower():
            continue
        if tid_names.get((e.get("pid"), e.get("tid"))) != "XLA Ops":
            continue
        a = e.get("args", {})
        dur = e.get("dur", 0) / 1e3  # us -> ms
        tf_op = a.get("tf_op", "")
        by_sub[subsystem(tf_op)] += dur
        by_cat[a.get("hlo_category", "?")] += dur
        key = re.sub(r"_\d+[/:]", "/", tf_op)[:100] or \
            re.sub(r"\.\d+$", "", e.get("name", ""))
        rec = by_op[key]
        rec[0] += dur
        rec[1] += int(a.get("bytes_accessed", 0))
        rec[2] += int(a.get("model_flops", 0) or 0)
        rec[3] = a.get("source", "")
        total += dur
        bytes_total += int(a.get("bytes_accessed", 0))
        flops_total += int(a.get("model_flops", 0) or 0)
    print(f"\ntrace: {traces[-1]}")
    print(f"device op time over {n_steps} steps: {total:.1f} ms "
          f"({total / n_steps:.2f} ms/step); "
          f"{bytes_total / max(total, 1e-9) / 1e6:.0f} GB/s avg, "
          f"{flops_total / max(total, 1e-9) / 1e9:.1f} TFLOP/s avg\n")
    print("== by subsystem (tf_op) ==")
    for k, v in by_sub.most_common(25):
        print(f"  {k:32s} {v:9.2f} ms  {100 * v / total:5.1f}%")
    print("\n== by HLO category ==")
    for k, v in by_cat.most_common(15):
        print(f"  {k:32s} {v:9.2f} ms  {100 * v / total:5.1f}%")
    print("\n== top 30 op groups ==")
    for k, (ms, by, fl, src) in sorted(by_op.items(), key=lambda x: -x[1][0])[:30]:
        gbps = by / max(ms, 1e-9) / 1e6
        tfps = fl / max(ms, 1e-9) / 1e9
        print(f"  {ms:8.2f} ms {100 * ms / total:5.1f}%  {gbps:6.0f} GB/s "
              f"{tfps:6.2f} TF/s  {k}")
        if src:
            print(f"           {src}")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "report":
        # re-aggregate an existing trace without touching the TPU
        report(sys.argv[2] if len(sys.argv) > 2
               else os.environ.get("PROFILE_DIR", "/tmp/profile_step"))
    else:
        main()
