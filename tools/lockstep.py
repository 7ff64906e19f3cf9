"""Lockstep comparison: our JAX model vs the torch reference, SAME weights.

Round-2 investigation of the training-dynamics divergence (JAX KL spikes to
~1e10 around step 25 and the discriminator saturates, while the torch
reference trained on the same corpus stays bounded): copy our exact initial
parameters into the actual reference model (/root/reference), zero every
source of stochasticity on both sides (eps=0 posterior sampling, slice
ids=0, p_dropout=0), and compare

  1. every loss value at identical weights      (validates the full copy)
  2. per-loss generator gradient global norms   (localizes backward bugs)
  3. optionally N AdamW lockstep training steps (dynamics head-to-head)

Usage (CPU):
  env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu PYTHONPATH=/root/repo \
      python tools/lockstep.py [--steps 0]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# ---------------------------------------------------------------------------
# flax -> torch weight copy (effective-weight based: our explicit g*v/||v||
# decomposition is re-decomposed in torch's norm_except_dim convention, so
# the effective weights agree exactly whatever each side's convention)
# ---------------------------------------------------------------------------

def _eff_kernel(fp) -> np.ndarray:
    """Effective conv kernel [k, in, out] from flax params (weight-norm
    aware; mirrors modules/common.py Conv1d)."""
    v = np.asarray(fp["kernel"], np.float64)
    if "g" in fp:
        g = np.asarray(fp["g"], np.float64)
        n = np.sqrt((v * v).sum(axis=tuple(range(v.ndim - 1))) + 1e-12)
        v = v * (g / n)
    return v.astype(np.float32)


def _set_conv(torch, tmod, fp, transpose=(2, 1, 0)):
    """Copy flax conv params into a torch conv (plain or weight_norm)."""
    w = _eff_kernel(fp).transpose(*transpose)
    with torch.no_grad():
        if hasattr(tmod, "weight_v"):
            tw = torch.from_numpy(w)
            tmod.weight_v.copy_(tw)
            norm_dims = tuple(range(1, tw.ndim))
            g = tw.pow(2).sum(dim=norm_dims, keepdim=True).sqrt()
            tmod.weight_g.copy_(g)
        else:
            tmod.weight.copy_(torch.from_numpy(w))
        if tmod.bias is not None and "bias" in fp:
            tmod.bias.copy_(torch.from_numpy(np.asarray(fp["bias"])))


def _set_linear(torch, tmod, fp):
    with torch.no_grad():
        tmod.weight.copy_(torch.from_numpy(np.asarray(fp["kernel"]).T))
        if tmod.bias is not None:
            tmod.bias.copy_(torch.from_numpy(np.asarray(fp["bias"])))


def _set_emb(torch, tmod, fp):
    with torch.no_grad():
        tmod.weight.copy_(torch.from_numpy(np.asarray(fp["embedding"])))


def _copy_rel_encoder(torch, tenc, fp):
    """Our RelativeEncoder params -> reference RelativeEncoder module."""
    n_layers = sum(1 for k in fp if k.startswith("attn_"))
    if "pre_net" in fp:
        _set_conv(torch, tenc.pre_net, fp["pre_net"])
    for i in range(n_layers):
        a = fp[f"attn_{i}"]
        _set_conv(torch, tenc.attn_layers[i].conv_q, a["conv_q"])
        _set_conv(torch, tenc.attn_layers[i].conv_k, a["conv_k"])
        _set_conv(torch, tenc.attn_layers[i].conv_v, a["conv_v"])
        _set_conv(torch, tenc.attn_layers[i].conv_o, a["conv_o"])
        with torch.no_grad():
            tenc.attn_layers[i].emb_rel_k.copy_(
                torch.from_numpy(np.asarray(a["emb_rel_k"]))[None])
            tenc.attn_layers[i].emb_rel_v.copy_(
                torch.from_numpy(np.asarray(a["emb_rel_v"]))[None])
        f = fp[f"ffn_{i}"]
        _set_conv(torch, tenc.ffn_layers[i].conv_1, f["conv_1"])
        _set_conv(torch, tenc.ffn_layers[i].conv_2, f["conv_2"])
        for norm_name, tnorm in ((f"norm1_{i}", tenc.norm_layers_1[i]),
                                 (f"norm2_{i}", tenc.norm_layers_2[i])):
            with torch.no_grad():
                tnorm.gamma.copy_(torch.from_numpy(
                    np.asarray(fp[norm_name]["gamma"])))
                tnorm.beta.copy_(torch.from_numpy(
                    np.asarray(fp[norm_name]["beta"])))


def _copy_wavenet(torch, twn, fp):
    n_layers = sum(1 for k in fp if k.startswith("in_"))
    if "cond_layer" in fp:
        _set_conv(torch, twn.cond_layer, fp["cond_layer"])
    for i in range(n_layers):
        _set_conv(torch, twn.in_layers[i], fp[f"in_{i}"])
        _set_conv(torch, twn.res_skip_layers[i], fp[f"res_skip_{i}"])


def copy_generator(torch, tmodel, pg):
    te = pg["text_encoder"]
    _set_emb(torch, tmodel.text_encoder.ph_emb, te["ph_emb"])
    _set_emb(torch, tmodel.text_encoder.pitch_emb, te["pitch_emb"])
    _set_emb(torch, tmodel.text_encoder.dur_emb, te["dur_emb"])
    _set_linear(torch, tmodel.text_encoder.linear, te["linear"])
    _copy_rel_encoder(torch, tmodel.text_encoder.text_encoder, te["encoder"])
    if hasattr(tmodel, "spk_id_proj") and "spk_id_proj" in pg:
        _set_emb(torch, tmodel.spk_id_proj, pg["spk_id_proj"])
    pp = pg["pitch_predictor"]
    _copy_rel_encoder(torch, tmodel.pitch_predictor.pitch_predictor,
                      pp["encoder"])
    _set_conv(torch, tmodel.pitch_predictor.linear, pp["linear"])
    _copy_rel_encoder(torch, tmodel.phoneme_predictor.phoneme_predictor,
                      pg["phoneme_predictor"]["encoder"])
    _set_conv(torch, tmodel.phoneme_predictor.ph_proj,
              pg["phoneme_predictor"]["ph_proj"])
    fpn = pg["frame_prior"]
    _copy_rel_encoder(torch, tmodel.frame_prior.encoder, fpn["encoder"])
    _set_conv(torch, tmodel.frame_prior.proj, fpn["proj"])
    pe = pg["posterior_encoder"]
    _set_conv(torch, tmodel.posterior_encoder.pre, pe["pre"])
    _copy_wavenet(torch, tmodel.posterior_encoder.enc, pe["enc"])
    _set_conv(torch, tmodel.posterior_encoder.proj, pe["proj"])
    n_coupling = sum(1 for k in pg["flow"] if k.startswith("coupling_"))
    for i in range(n_coupling):
        cp = pg["flow"][f"coupling_{i}"]
        tcp = tmodel.flow.flows[i * 2]
        _set_conv(torch, tcp.pre, cp["pre"])
        _set_conv(torch, tcp.post, cp["post"])
        _copy_wavenet(torch, tcp.enc, cp["enc"])
    dec = pg["decoder"]
    tdec = tmodel.decoder
    _set_conv(torch, tdec.conv_pre, dec["conv_pre"])
    _set_conv(torch, tdec.cond, dec["cond"])
    _set_conv(torch, tdec.conv_post, dec["conv_post"])
    n_ups = sum(1 for k in dec if k.startswith("up_"))
    n_res_kernels = sum(1 for k in dec if k.startswith("res_0_"))
    for i in range(n_ups):
        # ConvTranspose1d: our [k, in, out] -> torch [in, out, k], no flip
        _set_conv(torch, tdec.ups[i], dec[f"up_{i}"], transpose=(1, 2, 0))
        for j in range(n_res_kernels):
            res = dec[f"res_{i}_{j}"]
            tres = tdec.resblocks[i * n_res_kernels + j]
            for c in range(3):
                _set_conv(torch, tres.convs1[c], res[f"conv1_{c}"])
                _set_conv(torch, tres.convs2[c], res[f"conv2_{c}"])


def copy_discriminator(torch, tdisc, pd):
    ds = pd["disc_s"]
    t0 = tdisc.discriminators[0]
    for i in range(6):
        _set_conv(torch, t0.convs[i], ds[f"conv_{i}"])
    _set_conv(torch, t0.conv_post, ds["conv_post"])
    periods = sorted(int(k.split("disc_p")[1]) for k in pd if k.startswith("disc_p"))
    for n, p in enumerate(periods):
        dp = pd[f"disc_p{p}"]
        tp = tdisc.discriminators[n + 1]
        for i in range(5):
            name = f"conv_{i}" if i < 4 else "conv_4"
            _set_conv(torch, tp.convs[i], dp[name], transpose=(3, 2, 0, 1))
        _set_conv(torch, tp.conv_post, dp["conv_post"], transpose=(3, 2, 0, 1))


# ---------------------------------------------------------------------------
# Torch-side loss dict (mirrors tools/torch_baseline._reference_step without
# the optimizer updates, so each loss can be backpropagated separately)
# ---------------------------------------------------------------------------

def torch_losses(torch, model, disc, hp, sample, spec_fn, mel_fn, step=1):
    import torch.nn.functional as F

    from modules.commons.utils import slice_segments

    losses = {}
    out = model(sample["text_tokens"], sample["note_pitch"],
                sample["note_dur"], mel2ph=sample["mel2ph"],
                spk_id=sample["spk_ids"], f0=sample["f0"],
                uv=sample["uv"], mel=sample["mels"], infer=False)
    losses["kl"] = out["kl"]
    tgt_mel = mel_fn(sample["wavs"])
    tgt_slice = slice_segments(tgt_mel, out["ids_slice"], hp["segment_size"])
    mel_out = mel_fn(out["wav_out"].squeeze(1) if out["wav_out"].dim() == 3
                     else out["wav_out"])
    t1, t2 = mel_out.transpose(1, 2), tgt_slice.transpose(1, 2)
    w = (t2.abs().sum(-1, keepdim=True) > 0).float().expand_as(t2)
    losses["mel_l1"] = (F.l1_loss(t1, t2, reduction="none") * w).sum() \
        / w.sum().clamp(min=1) * 45.0
    nonpadding = (sample["mel2ph"] != 0).float()
    p_pred = out["f0_pred"]
    losses["uv"] = (F.binary_cross_entropy_with_logits(
        p_pred[:, :, 1], sample["uv"], reduction="none") * nonpadding).sum() \
        / nonpadding.sum() * hp["lambda_uv"]
    np2 = nonpadding * (sample["uv"] == 0).float()
    losses["f0"] = (F.l1_loss(p_pred[:, :, 0], sample["f0"],
                              reduction="none") * np2).sum() \
        / np2.sum() * hp["lambda_f0"]
    ph_pred = out["ph_pred"].float().permute(2, 0, 1)
    losses["ctc"] = F.ctc_loss(ph_pred, sample["text_tokens"],
                               sample["mel_lengths"], sample["text_lengths"],
                               zero_infinity=True) * hp["lambda_ctc"]
    slice_wavs = slice_segments(
        sample["wavs"].unsqueeze(1), out["ids_slice"] * hp["hop_size"],
        hp["segment_size"] * hp["hop_size"])
    wav_out = out["wav_out"]
    if wav_out.dim() == 2:
        wav_out = wav_out.unsqueeze(1)
    _, d_gen, fmap_t, fmap_g = disc(slice_wavs, wav_out)
    losses["adv"] = sum(torch.mean((1 - g.float()) ** 2) for g in d_gen) \
        * hp["lambda_mel_adv"]
    losses["fm"] = sum(torch.mean((t.float().detach() - g.float()).abs())
                       for ft, fg in zip(fmap_t, fmap_g)
                       for t, g in zip(ft, fg)) * hp["lambda_fm"]
    d_tgt, d_gen2, _, _ = disc(slice_wavs, wav_out.detach())
    losses["disc"] = sum(torch.mean((1 - t.float()) ** 2)
                         + torch.mean(g.float() ** 2)
                         for t, g in zip(d_tgt, d_gen2))
    return losses, out


# ---------------------------------------------------------------------------

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/parity_run.yaml")
    ap.add_argument("--grads", action="store_true",
                    help="also compare per-loss generator grad norms")
    ap.add_argument("--train", type=int, default=0,
                    help="run N deterministic lockstep training steps on "
                         "the same batch in both frameworks and compare "
                         "loss trajectories")
    ap.add_argument("--cycle", action="store_true",
                    help="with --train: cycle through the real corpus "
                         "batches in identical order on both sides instead "
                         "of repeating one batch (true data regime, still "
                         "zero-stochasticity)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from visinger_tpu.config import load_config
    from visinger_tpu.data.dataset import VISingerDataset
    from visinger_tpu.models.factory import build_models, init_params
    from visinger_tpu.ops.stft import (
        STFTParams,
        log_mel_spectrogram,
        power_spectrogram,
    )
    from visinger_tpu.ops.masking import slice_segments as jslice
    import visinger_tpu.training.losses as L
    from visinger_tpu.utils.text.token_encoder import build_token_encoder

    cfg = load_config(args.config)
    # disc_pair_batch off: the concat([real,fake]) disc lowering is the same
    # math but XLA may reassociate conv reductions at 2B vs B (~1e-4 rel) —
    # the torch reference runs separate passes, and lockstep's point is
    # bitwise-grade comparison, so match its execution shape exactly.
    cfg = cfg.replace(p_dropout=0.0, logs_clamp=0.0, disc_pair_batch=False)
    data_dir = cfg.binary_data_dir
    enc = build_token_encoder(f"{data_dir}/phone_set.json")
    with open(f"{data_dir}/pitch_map.json") as f:
        pv = len(json.load(f))
    with open(f"{data_dir}/dur_map.json") as f:
        dv = len(json.load(f))
    model, disc = build_models(cfg, ph_vocab=len(enc), pitch_vocab=pv,
                               dur_vocab=dv)
    ds = VISingerDataset(cfg, cfg.train_set_name)
    raw = next(ds.batches(shuffle=False))
    batch = {k: jnp.asarray(v) for k, v in raw.items()}
    params_g, params_d = init_params(cfg, model, disc, batch)

    # ---- zero all stochasticity on the JAX side
    real_normal = jax.random.normal
    real_uniform = jax.random.uniform
    jax.random.normal = lambda key, shape=None, dtype=jnp.float32: \
        jnp.zeros(shape if shape is not None else (), dtype)
    jax.random.uniform = (
        lambda key, shape=(), dtype=jnp.float32, minval=0.0, maxval=1.0,
        **kw: jnp.zeros(shape, dtype))

    mel_params = STFTParams(cfg.fft_size, cfg.win_size, cfg.hop_size,
                            cfg.sample_rate, float(cfg.fmin), float(cfg.fmax),
                            cfg.num_mel_bins)
    seg, hop = int(cfg.segment_size), int(cfg.hop_size)

    def jax_losses(pg, pd, batch):
        wavs = batch["wavs"].astype(jnp.float32)
        if batch["wavs"].dtype == jnp.int16:
            wavs = wavs / 32767.0
        spec = jax.lax.stop_gradient(power_spectrogram(wavs, mel_params))
        out = model.apply(
            {"params": pg},
            text_tokens=batch["text_tokens"],
            pitch_tokens=batch["note_pitch"],
            dur_tokens=batch["note_dur"],
            mel2ph=batch["mel2ph"],
            spk_id=batch.get("spk_ids"),
            f0=batch.get("f0"), uv=batch.get("uv"), spec=spec,
            lengths=batch.get("mel_lengths"),
            infer=False, deterministic=True,
            rngs={"sample": jax.random.PRNGKey(0)},
        )
        losses = {"kl": out["kl"]}
        tgt_mel = log_mel_spectrogram(wavs, mel_params)
        tgt_slice = jslice(tgt_mel, out["ids_slice"], seg)
        mel_out = log_mel_spectrogram(out["wav_out"], mel_params)
        losses["mel_l1"] = L.mel_losses_total(
            cfg.get("mel_losses", "l1:45.0"), mel_out, tgt_slice, None)
        losses["uv"], losses["f0"] = L.pitch_losses(
            out["f0_pred"], batch["f0"], batch["uv"], batch["mel2ph"],
            float(cfg.lambda_uv), float(cfg.lambda_f0), None)
        losses["ctc"] = L.ctc_loss(
            out["ph_pred"], batch["mel_lengths"], batch["text_tokens"],
            batch["text_lengths"], float(cfg.lambda_ctc), None)
        real_slice = jslice(wavs[..., None], out["ids_slice"] * hop,
                            seg * hop)[..., 0]
        _, fake_scores, fmap_r, fmap_g = disc.apply(
            {"params": jax.lax.stop_gradient(pd)}, real_slice, out["wav_out"])
        losses["adv"] = L.generator_adv_loss(fake_scores, None) \
            * float(cfg.lambda_mel_adv)
        losses["fm"] = L.feature_matching_loss(fmap_r, fmap_g, None) \
            * float(cfg.lambda_fm)
        rs, fs, _, _ = disc.apply({"params": pd}, real_slice,
                                  jax.lax.stop_gradient(out["wav_out"]))
        losses["disc"] = L.discriminator_loss(rs, fs, None)
        return losses, out

    jl, jout = jax_losses(params_g, params_d, batch)
    jl = {k: float(v) for k, v in jl.items()}

    # ---- torch side
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))
    import torch_baseline as tb

    torch, tmodel, tdisc, _og, _od, hp = tb._torch_setup(cfg)
    from models.visinger import VISinger

    torch.manual_seed(0)
    tmodel = VISinger(len(enc), pv, dv, hp)
    copy_generator(torch, tmodel, params_g)
    copy_discriminator(torch, tdisc, params_d)
    tmodel.train()
    tdisc.train()

    # zero torch stochasticity: eps and slice ids
    torch.randn_like = lambda x: torch.zeros_like(x)
    import models.visinger as ref_visinger

    def _fixed_slice(x, segment_size=4):
        from modules.commons.utils import slice_segments as tslice

        b = x.size(0)
        ids = torch.zeros(b, dtype=torch.long)
        return tslice(x, ids, segment_size), ids

    ref_visinger.rand_slice_segments = _fixed_slice

    spec_fn, mel_fn = tb._spec_fns(torch, hp)
    sample = tb._np_batch_to_torch(torch, {k: np.asarray(v)
                                           for k, v in raw.items()
                                           if k != "item_weights"}, spec_fn)
    tl, tout = torch_losses(torch, tmodel, tdisc, hp, sample, spec_fn, mel_fn)
    tlv = {k: float(v) for k, v in tl.items()}

    def _mad(a, b):
        a = np.asarray(a, np.float32)
        b = b.detach().cpu().numpy().astype(np.float32)
        if a.shape != b.shape and b.ndim == 3:
            b = b.transpose(0, 2, 1)
        return float(np.abs(a - b).max()), float(np.abs(a).max())

    print("\n=== tensor max-abs-diff (ours vs torch, identical weights)")
    for k, tk in (("f0_pred", "f0_pred"), ("wav_out", "wav_out"),
                  ("ph_pred", "ph_pred"), ("z_p", "z_p"),
                  ("mu_p", "mu_p"), ("logs_p", "logs_p")):
        if k in jout and tk in tout:
            d, m = _mad(jout[k], tout[tk])
            print(f"{k:10} max|diff|={d:12.6f}  max|ours|={m:10.4f}")

    print("\n=== loss values at identical weights (eps=0, ids=0, dropout=0)")
    print(f"{'loss':8} {'jax':>12} {'torch':>12} {'rel_diff':>10}")
    for k in jl:
        t = tlv.get(k, float("nan"))
        rd = abs(jl[k] - t) / max(abs(t), 1e-9)
        print(f"{k:8} {jl[k]:12.5f} {t:12.5f} {rd:10.2e}")

    if args.grads:
        print("\n=== per-loss generator grad norms")
        gparams = [p for p in tmodel.parameters() if p.requires_grad]

        def jax_norm(key):
            def f(pg):
                losses, _ = jax_losses(pg, params_d, batch)
                return losses[key]

            g = jax.grad(f)(params_g)
            return float(jnp.sqrt(sum(jnp.vdot(x, x)
                                      for x in jax.tree.leaves(g))))

        for k in ("kl", "mel_l1", "uv", "f0", "ctc", "adv", "fm"):
            tg = torch.autograd.grad(tl[k], gparams, retain_graph=True,
                                     allow_unused=True)
            tn = float(torch.sqrt(sum((x * x).sum() for x in tg
                                      if x is not None)))
            jn = jax_norm(k)
            print(f"{k:8} jax={jn:14.5f} torch={tn:14.5f} "
                  f"ratio={jn / max(tn, 1e-12):8.3f}")

    if args.train:
        regime = ("cycling real corpus batches, identical order"
                  if args.cycle else "same batch every step")
        print(f"\n=== {args.train}-step deterministic lockstep training "
              f"({regime})")
        from visinger_tpu.training.train_state import create_train_state
        from visinger_tpu.training.train_step import make_train_step

        if args.cycle:
            raw_seq = list(ds.batches(shuffle=False))
            jbatches = [{k: jnp.asarray(v) for k, v in r.items()}
                        for r in raw_seq]
        else:
            raw_seq, jbatches = [raw], [batch]

        state = create_train_state(cfg, params_g, params_d,
                                   jax.random.PRNGKey(cfg.seed))
        step_fn = jax.jit(make_train_step(cfg, model, disc))
        jrows = []
        for i in range(args.train):
            state, m = step_fn(state, jbatches[i % len(jbatches)])
            jrows.append({k: float(v) for k, v in m.items()})

        torch.manual_seed(0)
        opt_g = torch.optim.AdamW(tmodel.parameters(), lr=hp["lr"],
                                  betas=(hp["optimizer_adam_beta1"],
                                         hp["optimizer_adam_beta2"]),
                                  weight_decay=hp["weight_decay"],
                                  eps=hp["eps"])
        opt_d = torch.optim.AdamW(tdisc.parameters(), lr=hp["lr"],
                                  betas=(hp["optimizer_adam_beta1"],
                                         hp["optimizer_adam_beta2"]),
                                  weight_decay=0.0, eps=hp["eps"])
        if args.cycle:
            tsamples = [tb._np_batch_to_torch(
                torch, {k: np.asarray(v) for k, v in r.items()
                        if k != "item_weights"}, spec_fn) for r in raw_seq]
        else:
            tsamples = [sample]
        trows = []
        for i in range(args.train):
            tl_i = tb._reference_step(torch, tmodel, tdisc, opt_g, opt_d,
                                      hp, tsamples[i % len(tsamples)],
                                      i + 1, spec_fn, mel_fn)
            trows.append(tl_i)
        keys = ("kl_v", "mel_l1", "ctc", "adv", "fm", "disc")
        hdr = "step " + " ".join(f"{k+'(j/t)':>22}" for k in keys)
        print(hdr)
        for i in range(args.train):
            row = f"{i+1:4d} "
            for k in keys:
                j = jrows[i].get(k, float('nan'))
                t = float(trows[i].get(k, float('nan')))
                row += f" {j:10.3f}/{t:10.3f}"
            print(row)

    jax.random.normal = real_normal
    jax.random.uniform = real_uniform


if __name__ == "__main__":
    main()
