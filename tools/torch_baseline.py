"""Measured PyTorch-reference baseline (replaces bench.py's assumed 8k
mel-frames/s denominator — round-1 VERDICT item #1).

Builds the ACTUAL reference model stack from /root/reference (VISinger +
MultiPeriodDiscriminator, models/visinger.py) and replicates its fused
two-optimizer training step (tasks/visinger.py:53-146: generator forward +
kl/mel/pitch/ctc losses + backward + AdamW, then discriminator forward +
LSGAN loss + backward + AdamW, both grad-clipped) WITHOUT the Lightning-ish
Trainer around it — so the measurement is the model math, not the harness.

Modes (TORCH_BASELINE_MODE or argv[1]):
  step      time the full reference train step at bench.py's shapes on CPU;
            prints one JSON line {step_s, mel_frames_per_s, ...}
  jax-step  time OUR fused JAX train step on the same CPU for the
            like-for-like CPU:CPU ratio (run under JAX_PLATFORMS=cpu)
  train     run N steps over OUR binarized corpus (same batches both
            frameworks see) logging per-step losses to JSONL for the
            loss-curve parity comparison in PARITY.md

The reference's spectrogram path needs torchaudio (absent); SpectrogramFixed
/ MelSpectrogramFixed (utils/audio/mel_processing.py:15-39) are replicated
here with torch.stft + our own HTK mel filterbank — the same filterbank the
JAX build uses, so loss curves are directly comparable.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BENCH_BATCH = int(os.environ.get("BENCH_BATCH", 4))
BENCH_FRAMES = int(os.environ.get("BENCH_FRAMES", 640))
BENCH_TOKENS = int(os.environ.get("BENCH_TOKENS", 192))


def _load_cfg():
    from visinger_tpu.config import load_config

    return load_config(name="visinger_csd")


# ---------------------------------------------------------------------------
# Reference-side step (torch)
# ---------------------------------------------------------------------------

def _torch_setup(cfg):
    sys.path.insert(0, "/root/reference")
    # the reference's utils.audio package imports audio-IO deps at module
    # scope that this image lacks and the train step never calls — stub them
    import types

    for name in ("librosa", "librosa.filters", "webrtcvad", "pyloudnorm",
                 "parselmouth", "pyworld", "resemblyzer", "soundfile",
                 "skimage", "skimage.transform"):
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.modules["skimage.transform"].resize = None  # from-import target
    import torch

    from models.visinger import MultiPeriodDiscriminator, VISinger

    # Minimal crash fix for a latent bug in the reference itself: the model
    # passes cond_pitch as [B, 1, T] (models/visinger.py:88,134) but
    # FramePriorNetwork.forward transposes g AGAIN before the 1-channel
    # pre_net conv (modules/visinger/encoder.py:67-69), so the published
    # code crashes with its own default use_pitch_embed: true.  Feed the
    # layout that forward expects; the effective math is the intended
    # "condition on [B, 1, T] log-f0" (what the JAX build implements).
    import modules.visinger.encoder as _ref_enc

    _orig_fp = _ref_enc.FramePriorNetwork.forward

    def _fixed_fp(self, x, x_mask, g=None):
        return _orig_fp(self, x, x_mask,
                        None if g is None else g.transpose(1, 2))

    _ref_enc.FramePriorNetwork.forward = _fixed_fp

    hp = cfg.to_dict()
    torch.manual_seed(0)
    model = VISinger(60, 117, 98, hp)
    disc = MultiPeriodDiscriminator(hp["use_spectral_norm"])
    opt_g = torch.optim.AdamW(model.parameters(), lr=hp["lr"],
                              betas=(hp["optimizer_adam_beta1"],
                                     hp["optimizer_adam_beta2"]),
                              weight_decay=hp["weight_decay"], eps=hp["eps"])
    opt_d = torch.optim.AdamW(disc.parameters(), lr=hp["lr"],
                              betas=(hp["optimizer_adam_beta1"],
                                     hp["optimizer_adam_beta2"]),
                              weight_decay=hp.get("disc_weight_decay", 0.0))
    return torch, model, disc, opt_g, opt_d, hp


def _spec_fns(torch, hp):
    """SpectrogramFixed / MelSpectrogramFixed parity without torchaudio."""
    from visinger_tpu.ops.stft import mel_filterbank

    n_fft, win, hop = hp["fft_size"], hp["win_size"], hp["hop_size"]
    window = torch.hann_window(win)
    fb = torch.from_numpy(mel_filterbank(
        n_fft // 2 + 1, float(hp["fmin"]), float(hp["fmax"]),
        hp["num_mel_bins"], hp["sample_rate"]).astype(np.float32))

    def spec_fn(wav):  # [B, L] -> [B, bins, T] power spectrogram
        s = torch.stft(wav, n_fft, hop_length=hop, win_length=win,
                       window=window, center=True, pad_mode="reflect",
                       return_complex=True)
        return (s.real ** 2 + s.imag ** 2)[..., :-1]

    def mel_fn(wav):  # [B, L] -> [B, n_mels, T] log mel
        m = torch.einsum("bft,fm->bmt", spec_fn(wav) , fb)
        return torch.log(m + 1e-3)

    return spec_fn, mel_fn


def _np_batch_to_torch(torch, raw, spec_fn):
    b = {
        "text_tokens": torch.from_numpy(raw["text_tokens"]).long(),
        "note_pitch": torch.from_numpy(raw["note_pitch"]).long(),
        "note_dur": torch.from_numpy(raw["note_dur"]).long(),
        "mel2ph": torch.from_numpy(raw["mel2ph"]).long(),
        "f0": torch.from_numpy(raw["f0"]).float(),
        "uv": torch.from_numpy(raw["uv"]).float(),
        "wavs": torch.from_numpy(raw["wavs"]).float(),
        "spk_ids": torch.from_numpy(np.asarray(raw["spk_ids"])).long(),
        "mel_lengths": torch.from_numpy(np.asarray(raw["mel_lengths"])).long(),
        "text_lengths": torch.from_numpy(np.asarray(raw["text_lengths"])).long(),
    }
    with torch.no_grad():
        b["mels"] = spec_fn(b["wavs"]).transpose(1, 2)  # [B, T, bins]
    return b


def _reference_step(torch, model, disc, opt_g, opt_d, hp, sample, step,
                    spec_fn, mel_fn):
    """One full reference train step (tasks/visinger.py:53-146)."""
    import torch.nn.functional as F

    from modules.commons.utils import slice_segments

    losses = {}
    out = model(sample["text_tokens"], sample["note_pitch"],
                sample["note_dur"], mel2ph=sample["mel2ph"],
                spk_id=sample["spk_ids"], f0=sample["f0"],
                uv=sample["uv"], mel=sample["mels"],  # [B,T,bins]; model transposes
                infer=False)
    # KL (tasks/visinger.py:104-110)
    losses["kl_v"] = out["kl"].detach()
    kl = torch.clamp(out["kl"], min=hp["kl_min"])
    kl = min(step / hp["kl_start_steps"], 1) * kl * hp["lambda_kl"]
    losses["kl"] = kl
    # Mel L1 (tasks/base.py:227-238, weights_nonzero on the target)
    tgt_mel = mel_fn(sample["wavs"])
    tgt_slice = slice_segments(tgt_mel, out["ids_slice"], hp["segment_size"])
    mel_out = mel_fn(out["wav_out"].squeeze(1))
    t1, t2 = mel_out.transpose(1, 2), tgt_slice.transpose(1, 2)
    w = (t2.abs().sum(-1, keepdim=True) > 0).float().expand_as(t2)
    losses["mel_l1"] = (F.l1_loss(t1, t2, reduction="none") * w).sum() \
        / w.sum().clamp(min=1) * 45.0
    # Pitch (tasks/visinger.py:128-139)
    nonpadding = (sample["mel2ph"] != 0).float()
    p_pred = out["f0_pred"]
    losses["uv"] = (F.binary_cross_entropy_with_logits(
        p_pred[:, :, 1], sample["uv"], reduction="none") * nonpadding).sum() \
        / nonpadding.sum() * hp["lambda_uv"]
    np2 = nonpadding * (sample["uv"] == 0).float()
    losses["f0"] = (F.l1_loss(p_pred[:, :, 0], sample["f0"],
                              reduction="none") * np2).sum() \
        / np2.sum() * hp["lambda_f0"]
    # CTC (tasks/visinger.py:141-146)
    ph_pred = out["ph_pred"].float().permute(2, 0, 1)
    losses["ctc"] = F.ctc_loss(ph_pred, sample["text_tokens"],
                               sample["mel_lengths"], sample["text_lengths"],
                               zero_infinity=True) * hp["lambda_ctc"]
    disc_start = step >= hp["disc_start_steps"] and hp["lambda_mel_adv"] > 0
    if disc_start:
        slice_wavs = slice_segments(
            sample["wavs"].unsqueeze(1), out["ids_slice"] * hp["hop_size"],
            hp["segment_size"] * hp["hop_size"])
        _, d_gen, fmap_t, fmap_g = disc(slice_wavs, out["wav_out"].unsqueeze(1))
        adv = sum(torch.mean((1 - g.float()) ** 2) for g in d_gen)
        fm = sum(torch.mean((t.float().detach() - g.float()).abs())
                 for ft, fg in zip(fmap_t, fmap_g)
                 for t, g in zip(ft, fg))
        losses["adv"] = adv * hp["lambda_mel_adv"]
        losses["fm"] = fm * hp["lambda_fm"]
    total_g = sum(v for k, v in losses.items() if k != "kl_v")
    opt_g.zero_grad()
    total_g.backward()
    torch.nn.utils.clip_grad_norm_(model.parameters(), hp["clip_grad_norm"])
    opt_g.step()

    if disc_start and step % hp["disc_interval"] == 0:
        slice_wavs = slice_segments(
            sample["wavs"].unsqueeze(1),
            out["ids_slice"].detach() * hp["hop_size"],
            hp["segment_size"] * hp["hop_size"])
        d_tgt, d_gen, _, _ = disc(slice_wavs, out["wav_out"].detach().unsqueeze(1))
        loss_d = sum(torch.mean((1 - t.float()) ** 2) + torch.mean(g.float() ** 2)
                     for t, g in zip(d_tgt, d_gen))
        losses["disc"] = loss_d
        opt_d.zero_grad()
        loss_d.backward()
        torch.nn.utils.clip_grad_norm_(disc.parameters(), hp["clip_grad_norm"])
        opt_d.step()
    losses["total_g"] = total_g
    return {k: float(v.detach()) for k, v in losses.items()}


def mode_step(warmup: int, iters: int):
    cfg = _load_cfg()
    torch, model, disc, opt_g, opt_d, hp = _torch_setup(cfg)
    spec_fn, mel_fn = _spec_fns(torch, hp)
    from visinger_tpu.data.synthetic import synthetic_batch

    raw = synthetic_batch(BENCH_BATCH, BENCH_TOKENS, BENCH_FRAMES, vocab=60,
                          pitch_vocab=117, dur_vocab=98,
                          num_linear_bins=cfg.num_linear_bins,
                          hop_size=cfg.hop_size)
    sample = _np_batch_to_torch(torch, raw, spec_fn)
    for i in range(warmup):
        _reference_step(torch, model, disc, opt_g, opt_d, hp, sample, i + 1,
                        spec_fn, mel_fn)
    times = []
    for i in range(iters):
        t0 = time.perf_counter()
        _reference_step(torch, model, disc, opt_g, opt_d, hp, sample,
                        warmup + i + 1, spec_fn, mel_fn)
        times.append(time.perf_counter() - t0)
    times.sort()
    med = times[len(times) // 2]
    print(json.dumps({
        "framework": "torch-reference-cpu",
        "threads": torch.get_num_threads(),
        "batch": BENCH_BATCH, "frames": BENCH_FRAMES,
        "step_s": round(med, 4),
        "mel_frames_per_s": round(BENCH_BATCH * BENCH_FRAMES / med, 1),
    }))


def mode_jax_step(warmup: int, iters: int):
    """OUR step, same CPU, same shapes — the like-for-like ratio's numerator."""
    import jax
    import jax.numpy as jnp

    from visinger_tpu.data.synthetic import synthetic_batch
    from visinger_tpu.models.factory import build_models, init_state
    from visinger_tpu.training.train_step import make_train_step

    cfg = _load_cfg()
    raw = synthetic_batch(BENCH_BATCH, BENCH_TOKENS, BENCH_FRAMES, vocab=60,
                          pitch_vocab=117, dur_vocab=98,
                          num_linear_bins=cfg.num_linear_bins,
                          hop_size=cfg.hop_size)
    batch = {k: jnp.asarray(v) for k, v in raw.items()}
    model, disc = build_models(cfg, ph_vocab=60, pitch_vocab=117, dur_vocab=98)
    state = init_state(cfg, model, disc, batch)
    step_fn = jax.jit(make_train_step(cfg, model, disc), donate_argnums=(0,))
    for _ in range(warmup):
        state, _m = step_fn(state, batch)
    jax.block_until_ready(state)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        state, _m = step_fn(state, batch)
        jax.block_until_ready(state)
        times.append(time.perf_counter() - t0)
    times.sort()
    med = times[len(times) // 2]
    print(json.dumps({
        "framework": f"visinger_tpu-{jax.devices()[0].platform}",
        "batch": BENCH_BATCH, "frames": BENCH_FRAMES,
        "step_s": round(med, 4),
        "mel_frames_per_s": round(BENCH_BATCH * BENCH_FRAMES / med, 1),
    }))


def mode_train(n_steps: int, out_fn: str, data_dir: str,
               config: str | None = None, save_ckpt: str | None = None,
               ckpt_every: int = 500, ladder: bool = False):
    """Reference training on OUR binarized corpus; JSONL losses for
    loss-curve parity (PARITY.md).  ``--save_ckpt x.pt`` checkpoints the
    torch model (every ``ckpt_every`` steps + at the end) so `synth` can
    render the test split for the quality-parity table.  ``--ladder``
    additionally keeps EVERY periodic checkpoint as ``x_step{N}.pt``
    (with optimizer state) and resumes from the newest one on restart —
    round-4's lesson was that single rotated checkpoints cost a 4-hour
    retrain (VERDICT.md weak #2)."""
    if config:
        from visinger_tpu.config import load_config

        cfg = load_config(config)
        data_dir = cfg.binary_data_dir
    else:
        cfg = _load_cfg()

    # vocab sizes from the binarized maps (same as the JAX trainer reads)
    with open(f"{data_dir}/pitch_map.json") as f:
        pv = len(json.load(f))
    with open(f"{data_dir}/dur_map.json") as f:
        dv = len(json.load(f))
    from visinger_tpu.utils.text.token_encoder import build_token_encoder

    enc = build_token_encoder(f"{data_dir}/phone_set.json")
    cfg = cfg.replace(binary_data_dir=data_dir)
    torch, model, disc, opt_g, opt_d, hp = _torch_setup(cfg)
    # rebuild with the real vocab sizes
    from models.visinger import VISinger

    torch.manual_seed(0)
    model = VISinger(len(enc), pv, dv, hp)
    opt_g = torch.optim.AdamW(model.parameters(), lr=hp["lr"],
                              betas=(hp["optimizer_adam_beta1"],
                                     hp["optimizer_adam_beta2"]),
                              weight_decay=hp["weight_decay"], eps=hp["eps"])
    spec_fn, mel_fn = _spec_fns(torch, hp)
    from visinger_tpu.data.dataset import VISingerDataset

    ds = VISingerDataset(cfg, "train")
    step = 0
    base = save_ckpt[:-3] if save_ckpt and save_ckpt.endswith(".pt") else save_ckpt

    def _save(tag=""):
        if not save_ckpt:
            return
        payload = {"model": model.state_dict(), "disc": disc.state_dict(),
                   "step": step}
        if ladder:
            payload["opt_g"] = opt_g.state_dict()
            payload["opt_d"] = opt_d.state_dict()
        torch.save(payload, save_ckpt + ".part")
        os.replace(save_ckpt + ".part", save_ckpt)
        if ladder and step > 0:
            fn = f"{base}_step{step:06d}.pt"
            torch.save(payload, fn + ".part")
            os.replace(fn + ".part", fn)
        print(f"| saved {save_ckpt} @ step {step}{tag}")

    log_mode = "w"
    if ladder and save_ckpt:
        import glob

        prior = sorted(glob.glob(f"{base}_step*.pt"))
        if prior:
            ck = torch.load(prior[-1], map_location="cpu")
            model.load_state_dict(ck["model"])
            disc.load_state_dict(ck["disc"])
            opt_g.load_state_dict(ck["opt_g"])
            opt_d.load_state_dict(ck["opt_d"])
            step = int(ck["step"])
            log_mode = "a"
            print(f"| resumed from {prior[-1]} (step {step})")

    with open(out_fn, log_mode) as f:
        while step < n_steps:
            for raw in ds.batches(seed=step, pad_to_max_sentences=False):
                if step >= n_steps:
                    break
                raw = dict(raw)
                raw.pop("item_weights", None)
                sample = _np_batch_to_torch(torch, raw, spec_fn)
                step += 1
                t0 = time.perf_counter()
                losses = _reference_step(torch, model, disc, opt_g, opt_d,
                                         hp, sample, step, spec_fn, mel_fn)
                losses["step"] = step
                losses["step_s"] = round(time.perf_counter() - t0, 3)
                f.write(json.dumps(losses) + "\n")
                f.flush()
                if step % 10 == 0:
                    print(f"| torch step {step}: " + ", ".join(
                        f"{k}={v:.2f}" for k, v in sorted(losses.items())
                        if k not in ("step",)))
                if step % ckpt_every == 0:
                    _save()
    _save(" (final)")
    print(f"| wrote {out_fn}")


def mode_synth(ckpt_fn: str, out_dir: str, config: str | None = None,
               split: str = "test"):
    """Synthesize a split with the torch reference from a `train --save_ckpt`
    checkpoint and record the same objective quality metrics the JAX test
    loop records (utils/audio/quality.py) — the torch half of
    artifacts/parity/quality_table.md."""
    from visinger_tpu.config import load_config
    from visinger_tpu.ops.stft import STFTParams
    from visinger_tpu.utils.audio.io import save_wav
    from visinger_tpu.utils.audio.quality import f0_metrics, mcd, mel_l1_np
    from visinger_tpu.utils.text.token_encoder import build_token_encoder

    cfg = load_config(config) if config else _load_cfg()
    data_dir = cfg.binary_data_dir
    with open(f"{data_dir}/pitch_map.json") as f:
        pv = len(json.load(f))
    with open(f"{data_dir}/dur_map.json") as f:
        dv = len(json.load(f))
    enc = build_token_encoder(f"{data_dir}/phone_set.json")
    torch, model, disc, _og, _od, hp = _torch_setup(cfg)
    from models.visinger import VISinger

    model = VISinger(len(enc), pv, dv, hp)
    ckpt = torch.load(ckpt_fn, map_location="cpu")
    model.load_state_dict(ckpt["model"])
    model.eval()
    print(f"| loaded {ckpt_fn} (step {ckpt['step']})")
    spec_fn, _mel_fn = _spec_fns(torch, hp)

    from visinger_tpu.data.dataset import VISingerDataset

    ds = VISingerDataset(cfg, split)
    mel_params = STFTParams(cfg.fft_size, cfg.win_size, cfg.hop_size,
                            cfg.sample_rate, float(cfg.fmin),
                            float(cfg.fmax), cfg.num_mel_bins)
    os.makedirs(os.path.join(out_dir, "wavs"), exist_ok=True)
    results = []
    torch.manual_seed(0)
    for raw in ds.batches(max_sentences=1, shuffle=False,
                          pad_to_max_sentences=False):
        raw = dict(raw)
        raw.pop("item_weights", None)
        sample = _np_batch_to_torch(torch, raw, spec_fn)
        t0 = time.perf_counter()
        with torch.no_grad():
            out = model(sample["text_tokens"], sample["note_pitch"],
                        sample["note_dur"], mel2ph=sample["mel2ph"],
                        spk_id=sample["spk_ids"], infer=True)
        dt = time.perf_counter() - t0
        t = int(raw["mel_lengths"][0])
        wav = out["wav_out"][0, : t * cfg.hop_size].float().numpy()
        gt = np.asarray(raw["wavs"][0][: t * cfg.hop_size], np.float32)
        if gt.dtype == np.int16 or raw["wavs"].dtype == np.int16:
            gt = gt / 32767.0
        fn = f"item_{len(results):04d}_synth.wav"
        save_wav(wav, os.path.join(out_dir, "wavs", fn), cfg.sample_rate,
                 norm=True)
        audio_s = t * cfg.hop_size / cfg.sample_rate
        f0m = f0_metrics(gt, wav, cfg.sample_rate, cfg.hop_size,
                         float(cfg.get("f0_min", 50)),
                         float(cfg.get("f0_max", 1250)))
        results.append({
            "wav_fn_pred": fn, "audio_s": audio_s,
            "rtf": dt / max(audio_s, 1e-9), "rtf_kind": "per_item_cpu",
            "mcd": round(mcd(gt, wav, mel_params), 3),
            "mel_l1": round(mel_l1_np(gt, wav, mel_params), 4),
            "f0_rmse_cents": round(f0m["f0_rmse_cents"], 1),
            "vuv_error": round(f0m["vuv_error"], 4),
        })
        print(f"| torch synth {fn}: mcd={results[-1]['mcd']} "
              f"mel_l1={results[-1]['mel_l1']}")
    with open(os.path.join(out_dir, "results.json"), "w") as f:
        json.dump(results, f, indent=1)
    print(f"| wrote {out_dir}/results.json ({len(results)} items)")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["step", "jax-step", "train", "synth"])
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--out", default="/tmp/torch_train_log.jsonl")
    ap.add_argument("--data_dir", default="data/binary/synth")
    ap.add_argument("--config", default="")
    ap.add_argument("--save_ckpt", default="")
    ap.add_argument("--ckpt_every", type=int, default=500)
    ap.add_argument("--ladder", action="store_true")
    ap.add_argument("--ckpt", default="")
    ap.add_argument("--out_dir", default="/tmp/torch_synth")
    ap.add_argument("--split", default="test")
    args = ap.parse_args()
    if args.mode == "step":
        mode_step(args.warmup, args.iters)
    elif args.mode == "jax-step":
        mode_jax_step(args.warmup, args.iters)
    elif args.mode == "synth":
        mode_synth(args.ckpt, args.out_dir, args.config or None, args.split)
    else:
        mode_train(args.steps, args.out, args.data_dir, args.config or None,
                   args.save_ckpt or None, args.ckpt_every, args.ladder)
