"""Diagnose the early-training KL blow-up (round-1 VERDICT weak #2).

Runs the real fused train step on the binarized corpus for N steps on CPU,
and after each step evaluates a deterministic diagnostic forward that
reports the extrema of every tensor entering the KL term:

    min/max logs_p, |mu_p|, |z_p|, kl

so the spike can be attributed (activation explosion vs logs_p collapse).

Usage (CPU env is forced):
    python tools/kl_spike_diag.py --steps 40 --config configs/parity_run.yaml
"""

from __future__ import annotations

import argparse
import json
import os

os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--config", default="configs/parity_run.yaml")
    ap.add_argument("--out", default="/tmp/kl_diag.jsonl")
    args = ap.parse_args()

    from visinger_tpu.config import load_config
    from visinger_tpu.data.dataset import VISingerDataset
    from visinger_tpu.models.factory import build_models, init_params
    from visinger_tpu.ops.stft import STFTParams, power_spectrogram
    from visinger_tpu.training.train_state import create_train_state
    from visinger_tpu.training.train_step import make_train_step
    from visinger_tpu.utils.text.token_encoder import build_token_encoder

    cfg = load_config(args.config)
    data_dir = cfg.binary_data_dir
    enc = build_token_encoder(f"{data_dir}/phone_set.json")
    with open(f"{data_dir}/pitch_map.json") as f:
        pv = len(json.load(f))
    with open(f"{data_dir}/dur_map.json") as f:
        dv = len(json.load(f))
    model, disc = build_models(cfg, ph_vocab=len(enc), pitch_vocab=pv,
                               dur_vocab=dv)
    ds = VISingerDataset(cfg, cfg.train_set_name)

    mel_params = STFTParams(cfg.fft_size, cfg.win_size, cfg.hop_size,
                            cfg.sample_rate, float(cfg.fmin), float(cfg.fmax),
                            cfg.num_mel_bins)

    batches = []
    for i, b in enumerate(ds.batches(seed=0)):
        batches.append({k: jnp.asarray(v) for k, v in b.items()})
        if i >= 15:
            break
    params_g, params_d = init_params(cfg, model, disc, batches[0])
    state = create_train_state(cfg, params_g, params_d,
                               jax.random.PRNGKey(cfg.seed))
    step_fn = jax.jit(make_train_step(cfg, model, disc))

    def diag(params, batch, rng):
        wavs = batch["wavs"].astype(jnp.float32) / 32767.0 \
            if batch["wavs"].dtype == jnp.int16 else batch["wavs"]
        spec = power_spectrogram(wavs, mel_params)
        out = model.apply(
            {"params": params},
            text_tokens=batch["text_tokens"],
            pitch_tokens=batch["note_pitch"],
            dur_tokens=batch["note_dur"],
            mel2ph=batch["mel2ph"],
            spk_embed=batch.get("spk_embed"),
            spk_id=batch.get("spk_ids"),
            f0=batch.get("f0"), uv=batch.get("uv"), spec=spec,
            lengths=batch.get("mel_lengths"),
            item_weights=batch.get("item_weights"),
            infer=False, deterministic=True,
            rngs={"sample": rng},
        )
        s = {}
        for k in ("mu_p", "logs_p", "z_p"):
            v = out[k]
            s[f"{k}_min"] = jnp.min(v)
            s[f"{k}_max"] = jnp.max(v)
        s["kl"] = out["kl"]
        return s

    diag_fn = jax.jit(diag)
    rng = jax.random.PRNGKey(123)
    with open(args.out, "w") as f:
        for i in range(args.steps):
            batch = batches[i % len(batches)]
            state, metrics = step_fn(state, batch)
            d = diag_fn(state.params_g, batch, rng)
            row = {"step": i + 1}
            row.update({k: float(v) for k, v in d.items()})
            row["kl_metric"] = float(metrics.get("kl_v", jnp.nan))
            row["gnorm_g"] = float(metrics.get("gnorm_g", jnp.nan))
            f.write(json.dumps(row) + "\n")
            f.flush()
            print(json.dumps({k: (round(v, 4) if isinstance(v, float) else v)
                              for k, v in row.items()}))


if __name__ == "__main__":
    main()
