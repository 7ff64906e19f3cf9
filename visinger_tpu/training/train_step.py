"""The fused VISinger GAN train step — one XLA program per step.

The reference runs two sequential optimizer passes per step with separate
backwards (utils/commons/trainer.py:306-384).  Here both are fused into a
single jitted function preserving the reference's update semantics
(tasks/visinger.py:53-89):
  1. generator loss/grads vs the *pre-update* discriminator -> AdamW update
  2. discriminator loss on (real slice, detached fake from the same forward)
     -> AdamW update, gated by disc_start_steps / disc_interval via lax.cond
     so a gated-off step leaves params AND optimizer state untouched.

Loss gating (the reference's find_unused_parameters situations) is handled
with masked/zero losses, never dynamic graphs, so the program is static.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from visinger_tpu.ops.masking import slice_segments
from visinger_tpu.ops.stft import (
    STFTParams,
    log_mel_slices,
    log_mel_spectrogram,
    power_spectrogram,
)
from visinger_tpu.training import losses as L
from visinger_tpu.training.train_state import TrainState, make_optimizers


def make_train_step(cfg, model, disc, steps_per_epoch: int | None = None
                    ) -> Callable[[TrainState, dict], tuple[TrainState, dict]]:
    """Build the (un-jitted) fused train step; callers wrap in jax.jit/pjit.

    ``steps_per_epoch``: actual batches/epoch, for the per-epoch LR decay
    (see make_optimizers) — the trainer derives it from the epoch plan.
    """
    mel_params = STFTParams(
        cfg.fft_size, cfg.win_size, cfg.hop_size, cfg.sample_rate,
        float(cfg.fmin), float(cfg.fmax), cfg.num_mel_bins)
    # TPU-first: the posterior's linear spectrogram is computed ON DEVICE from
    # the raw waveform (the reference computes it in dataset workers,
    # tasks/dataset_utils.py:140-141) — the batch ships 24 kHz wav only,
    # ~14x less host->device traffic, and the DFT matmuls ride the MXU.
    opt_g, opt_d = make_optimizers(cfg, steps_per_epoch)
    seg = cfg.segment_size
    hop = cfg.hop_size
    lambda_adv = float(cfg.lambda_mel_adv)
    disc_start_steps = int(cfg.disc_start_steps)
    disc_interval = int(cfg.disc_interval)
    # With gradient accumulation, every step-indexed gate/schedule counts
    # OPTIMIZER steps, not micro-batches (the reference's global_step
    # advances once per optimizer step, utils/commons/trainer.py:339,368):
    # state.step stays the micro-batch counter (resume/logging), and
    # opt_step = state.step // accum drives disc_start/disc_interval gating
    # and the KL warm-up.  The LR schedule already counts optimizer steps
    # (optax.MultiSteps only calls the inner update at accumulation
    # boundaries) — see make_optimizers for the per-epoch divide.
    accum = max(int(cfg.get("accumulate_grad_batches", 1)), 1)

    def gen_loss_fn(params_g, params_d, batch, step, rngs):
        if batch["wavs"].dtype == jnp.int16:  # int16 PCM shipping: dequantize
            batch = dict(batch)
            batch["wavs"] = batch["wavs"].astype(jnp.float32) / 32767.0
        spec = batch.get("spec")
        if spec is None:
            spec = jax.lax.stop_gradient(
                power_spectrogram(batch["wavs"], mel_params))
        # per-item validity weights: batches are padded to max_sentences by
        # repeating the last item (static shapes); the weights zero the
        # duplicates out of every loss so small ragged batches (valid/test
        # splits) don't double-count items vs the reference's ragged batches.
        w = batch.get("item_weights")
        out = model.apply(
            {"params": params_g},
            text_tokens=batch["text_tokens"],
            pitch_tokens=batch["note_pitch"],
            dur_tokens=batch["note_dur"],
            mel2ph=batch["mel2ph"],
            spk_embed=batch.get("spk_embed"),
            spk_id=batch.get("spk_ids"),
            f0=batch.get("f0"),
            uv=batch.get("uv"),
            spec=spec,
            lengths=batch.get("mel_lengths"),
            item_weights=w,
            infer=False,
            deterministic=False,
            rngs=rngs,
        )
        losses = {}
        losses["kl_v"] = jax.lax.stop_gradient(out["kl"])
        losses["kl"] = L.kl_schedule(out["kl"], step, float(cfg.kl_min),
                                     int(cfg.kl_start_steps), float(cfg.lambda_kl))
        # target mel on the sliced WAV window (numerically identical to
        # full-length mel + frame slice, ~T/seg x cheaper — see
        # ops/stft.py:log_mel_slices)
        tgt_slice = log_mel_slices(batch["wavs"], out["ids_slice"], seg,
                                   mel_params)
        mel_out = log_mel_spectrogram(out["wav_out"], mel_params)
        # configured mel-loss mix (reference parse_mel_losses "l1:45.0")
        losses["mel_l1"] = L.mel_losses_total(
            cfg.get("mel_losses", "l1:45.0"), mel_out, tgt_slice, w)
        if cfg.use_pitch_embed:
            losses["uv"], losses["f0"] = L.pitch_losses(
                out["f0_pred"], batch["f0"], batch["uv"], batch["mel2ph"],
                float(cfg.lambda_uv), float(cfg.lambda_f0), w)
        if cfg.use_phoneme_pred:
            losses["ctc"] = L.ctc_loss(
                out["ph_pred"], batch["mel_lengths"], batch["text_tokens"],
                batch["text_lengths"], float(cfg.lambda_ctc), w)

        real_slice = slice_segments(
            batch["wavs"], out["ids_slice"] * hop, seg * hop)
        adv_gate = 1.0
        if disc_start_steps > 0:
            adv_gate = (step >= disc_start_steps).astype(jnp.float32)
        if lambda_adv > 0:
            _, fake_scores, fmap_r, fmap_g = disc.apply(
                {"params": jax.lax.stop_gradient(params_d)},
                real_slice, out["wav_out"])
            losses["adv"] = L.generator_adv_loss(fake_scores, w) * lambda_adv * adv_gate
            losses["fm"] = L.feature_matching_loss(fmap_r, fmap_g, w) \
                * float(cfg.lambda_fm) * adv_gate
        total = sum(v for k, v in losses.items() if k != "kl_v")
        aux = {"losses": losses, "wav_out": out["wav_out"],
               "real_slice": real_slice, "item_weights": w}
        return total, aux

    def disc_loss_fn(params_d, real, fake, w):
        real_scores, fake_scores, _, _ = disc.apply({"params": params_d}, real, fake)
        return L.discriminator_loss(real_scores, fake_scores, w)

    # Rematerialization knob (XLA cost analysis says the step is
    # bandwidth-bound — artifacts/bench_r3/README.md): trade backward-pass
    # activation reads for recompute.
    #   none  (default) — XLA's own fusion/remat decisions
    #   full  — save nothing across fwd/bwd (recompute the whole forward)
    #   dots  — save matmul outputs, recompute everything elementwise/conv
    # A/B'd on the real chip via tools/ab_r4.py before changing defaults.
    remat = str(cfg.get("remat_policy", "none"))
    if remat != "none":
        policy = {
            "full": jax.checkpoint_policies.nothing_saveable,
            "dots": jax.checkpoint_policies.checkpoint_dots,
        }[remat]
        gen_loss_fn = jax.checkpoint(gen_loss_fn, policy=policy)
        disc_loss_fn = jax.checkpoint(disc_loss_fn, policy=policy)

    def train_step(state: TrainState, batch: dict) -> tuple[TrainState, dict]:
        rng, k_sample, k_drop = jax.random.split(state.rng, 3)
        rngs = {"sample": k_sample, "dropout": k_drop}
        opt_step = state.step // accum if accum > 1 else state.step

        (total_g, aux), grads_g = jax.value_and_grad(gen_loss_fn, has_aux=True)(
            state.params_g, state.params_d, batch, opt_step, rngs)
        # grad-norm metric doubles as the NaN tripwire (the reference's
        # print_nan_grads, trainer.py:358-365): non-finite shows up here.
        gnorm = optax.global_norm(grads_g)
        updates_g, opt_state_g = opt_g.update(grads_g, state.opt_state_g,
                                              state.params_g)
        params_g = jax.tree.map(lambda p, u: p + u, state.params_g, updates_g)

        fake = jax.lax.stop_gradient(aux["wav_out"])
        real = jax.lax.stop_gradient(aux["real_slice"])
        w = aux["item_weights"]

        def do_disc(operand):
            params_d, opt_state_d = operand
            loss_d, grads_d = jax.value_and_grad(disc_loss_fn)(
                params_d, real, fake, w)
            updates_d, opt_state_d = opt_d.update(grads_d, opt_state_d, params_d)
            params_d = jax.tree.map(lambda p, u: p + u, params_d, updates_d)
            return params_d, opt_state_d, loss_d

        def skip_disc(operand):
            params_d, opt_state_d = operand
            return params_d, opt_state_d, jnp.zeros(())

        if lambda_adv <= 0:
            # reference disc_start gate includes lambda_mel_adv > 0
            # (tasks/visinger.py:75-77): with adversarial training off the
            # discriminator never updates — statically skip its whole pass.
            params_d, opt_state_d, loss_d = skip_disc(
                (state.params_d, state.opt_state_d))
        elif disc_start_steps > 0 or disc_interval > 1:
            gate = jnp.logical_and(opt_step >= disc_start_steps,
                                   (opt_step % disc_interval) == 0)
            params_d, opt_state_d, loss_d = jax.lax.cond(
                gate, do_disc, skip_disc, (state.params_d, state.opt_state_d))
        else:  # statically always-on: avoid compiling the dead branch
            params_d, opt_state_d, loss_d = do_disc(
                (state.params_d, state.opt_state_d))

        metrics = {k: v for k, v in aux["losses"].items()}
        metrics["total_g"] = total_g
        metrics["disc"] = loss_d
        metrics["gnorm_g"] = gnorm
        new_state = TrainState(
            params_g=params_g, params_d=params_d,
            opt_state_g=opt_state_g, opt_state_d=opt_state_d,
            step=state.step + 1, rng=rng)
        return new_state, metrics

    return train_step


# Generator reconstruction losses — what validation tracks for best-model
# selection (reference validation_step evaluates the generator losses only,
# tasks/visinger.py:187-199; adv/fm/disc are excluded).
RECON_LOSS_KEYS = ("kl", "mel_l1", "uv", "f0", "ctc")


def recon_loss_total(metrics: dict) -> float:
    return float(sum(float(metrics[k]) for k in RECON_LOSS_KEYS if k in metrics))


def make_eval_step(cfg, model) -> Callable[[Any, dict, jax.Array], dict]:
    """Deterministic validation step (reference validation_step semantics,
    tasks/visinger.py:187-199): dropout OFF, a caller-fixed RNG for the
    posterior sample / segment slice, and only the generator reconstruction
    losses (kl / mel / uv / f0 / ctc) — no adversarial terms, no updates.

    Costs one extra program compile; the trainer gates it behind
    cfg.deterministic_eval (reusing the train program is free)."""
    mel_params = STFTParams(
        cfg.fft_size, cfg.win_size, cfg.hop_size, cfg.sample_rate,
        float(cfg.fmin), float(cfg.fmax), cfg.num_mel_bins)
    seg = cfg.segment_size

    def eval_step(params_g, batch, rng) -> dict:
        if batch["wavs"].dtype == jnp.int16:
            batch = dict(batch)
            batch["wavs"] = batch["wavs"].astype(jnp.float32) / 32767.0
        spec = batch.get("spec")
        if spec is None:
            spec = power_spectrogram(batch["wavs"], mel_params)
        w = batch.get("item_weights")
        out = model.apply(
            {"params": params_g},
            text_tokens=batch["text_tokens"],
            pitch_tokens=batch["note_pitch"],
            dur_tokens=batch["note_dur"],
            mel2ph=batch["mel2ph"],
            spk_embed=batch.get("spk_embed"),
            spk_id=batch.get("spk_ids"),
            f0=batch.get("f0"),
            uv=batch.get("uv"),
            spec=spec,
            lengths=batch.get("mel_lengths"),
            item_weights=w,
            infer=False,
            deterministic=True,
            rngs={"sample": rng},
        )
        m = {"kl": out["kl"] * float(cfg.lambda_kl)}
        tgt_slice = log_mel_slices(batch["wavs"], out["ids_slice"], seg,
                                   mel_params)
        mel_out = log_mel_spectrogram(out["wav_out"], mel_params)
        m["mel_l1"] = L.mel_losses_total(
            cfg.get("mel_losses", "l1:45.0"), mel_out, tgt_slice, w)
        if cfg.use_pitch_embed:
            m["uv"], m["f0"] = L.pitch_losses(
                out["f0_pred"], batch["f0"], batch["uv"], batch["mel2ph"],
                float(cfg.lambda_uv), float(cfg.lambda_f0), w)
        if cfg.use_phoneme_pred:
            m["ctc"] = L.ctc_loss(
                out["ph_pred"], batch["mel_lengths"], batch["text_tokens"],
                batch["text_lengths"], float(cfg.lambda_ctc), w)
        m["total_g"] = sum(m.values())
        return m

    return eval_step
