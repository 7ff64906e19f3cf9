"""Single-process A/B of the decoder lowerings on the attached TPU.

Variants (identical params / identical math — tests/test_modules.py proves
exactness; this only measures):
  baseline   lhs-dilated ConvTranspose + native small-channel convs
  polyphase  polyphase upsampling only
  poly+fold  polyphase + MXU-dense time-folded tail convs

Result (TPU v5e, one process, 2026-08-18 — artifacts/parity/
decoder_lowering_ab.jsonl): baseline WINS — polyphase 0.70x, poly+fold
0.56x at synthesis shapes (B=4, T=640).  XLA:TPU already lowers the
lhs-dilated transposed conv and the 16-32ch tail convs efficiently; the
reformulations pay per-step kernel-build chains and strided-conv
relayouts for utilization XLA was getting anyway.  Defaults stay off.

Timing protocol per CLAUDE.md: honest barrier = read back a scalar that
depends on the full waveform; all variants inside ONE process so the
tunnel's fast/slow slot assignment cancels out.

    python tools/ab_decoder_lowering.py            # synthesis program
    AB_MODE=train python tools/ab_decoder_lowering.py   # fused train step
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
from visinger_tpu.models.factory import build_models, init_params, init_state
from visinger_tpu.training.train_step import make_train_step

VARIANTS = [
    ("baseline", dict(decoder_polyphase=False, decoder_time_fold=False)),
    ("polyphase", dict(decoder_polyphase=True, decoder_time_fold=False)),
    ("poly+fold", dict(decoder_polyphase=True, decoder_time_fold=True)),
]


def main():
    batch_size = int(os.environ.get("BENCH_BATCH", 4))
    n_frames = int(os.environ.get("BENCH_FRAMES", 640))
    n_tokens = int(os.environ.get("BENCH_TOKENS", 192))
    warmup = int(os.environ.get("BENCH_WARMUP", 2))
    iters = int(os.environ.get("BENCH_ITERS", 7))
    mode = os.environ.get("AB_MODE", "rtf")
    if mode == "train":
        batch_size = int(os.environ.get("BENCH_BATCH", 16))

    base_cfg = load_config(name="visinger_csd")
    raw = synthetic_batch(batch_size, n_tokens, n_frames, vocab=60,
                          pitch_vocab=117, dur_vocab=98,
                          num_linear_bins=base_cfg.num_linear_bins,
                          hop_size=base_cfg.hop_size)
    batch = {k: jnp.asarray(v) for k, v in raw.items()}
    results = {}
    for name, flags in VARIANTS:
        cfg = base_cfg.replace(**flags)
        model, disc = build_models(cfg, ph_vocab=60, pitch_vocab=117,
                                   dur_vocab=98)
        if mode == "train":
            state = init_state(cfg, model, disc, batch)
            step = jax.jit(make_train_step(cfg, model, disc),
                           donate_argnums=(0,))
            t0 = time.perf_counter()
            state, metrics = step(state, batch)
            float(metrics["total_g"])
            print(f"[{name}] compiled in {time.perf_counter()-t0:.0f}s",
                  flush=True)

            def timed():
                nonlocal state
                state, m = step(state, batch)
                return m["total_g"]
        else:
            params_g, _ = init_params(cfg, model, disc, raw)
            rng = jax.random.PRNGKey(0)

            def infer_fn(params, batch, rng):
                out = model.apply(
                    {"params": params}, text_tokens=batch["text_tokens"],
                    pitch_tokens=batch["note_pitch"],
                    dur_tokens=batch["note_dur"], mel2ph=batch["mel2ph"],
                    spk_id=batch["spk_ids"], infer=True, deterministic=True,
                    rngs={"sample": rng})
                return jnp.sum(out["wav_out"])

            fn = jax.jit(infer_fn)
            t0 = time.perf_counter()
            float(fn(params_g, batch, rng))
            print(f"[{name}] compiled in {time.perf_counter()-t0:.0f}s",
                  flush=True)

            def timed(fn=fn, params=params_g, rng=rng):
                return fn(params, batch, rng)

        for _ in range(warmup):
            float(timed())
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            float(timed())
            times.append(time.perf_counter() - t0)
        times.sort()
        med = times[len(times) // 2]
        results[name] = med
        print(json.dumps({"case": f"{mode}_{name}_B{batch_size}_T{n_frames}",
                          "ms": round(med * 1e3, 2),
                          "best_ms": round(times[0] * 1e3, 2)}), flush=True)
    base = results.get("baseline")
    for name, med in results.items():
        if name != "baseline" and base:
            print(json.dumps({"case": name, "speedup_vs_baseline":
                              round(base / med, 3)}), flush=True)


if __name__ == "__main__":
    main()
