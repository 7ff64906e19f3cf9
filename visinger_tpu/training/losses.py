"""VISinger training losses.

Parity targets (reference tasks/visinger.py + tasks/base.py):
  masked mel L1            tasks/base.py:227-238 (weights_nonzero_speech)
  KL warm-up/clamp         tasks/visinger.py:104-110
  uv BCE + f0 L1           tasks/visinger.py:127-139
  CTC                      tasks/visinger.py:141-146 (torch mean semantics:
                           per-sequence NLL / target_length, then batch mean)
  LSGAN disc/gen + FM      tasks/visinger.py:148-170
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def masked_mel_l1(mel_out: jax.Array, mel_tgt: jax.Array) -> jax.Array:
    """L1 with weights from nonzero target frames (utils/nn/seq_utils.py:33)."""
    weights = (jnp.sum(jnp.abs(mel_tgt), axis=-1, keepdims=True) != 0).astype(mel_tgt.dtype)
    weights = jnp.broadcast_to(weights, mel_tgt.shape)
    l1 = jnp.abs(mel_out - mel_tgt) * weights
    return jnp.sum(l1) / jnp.maximum(jnp.sum(weights), 1.0)


def kl_schedule(kl: jax.Array, step: jax.Array, kl_min: float,
                kl_start_steps: int, lambda_kl: float) -> jax.Array:
    kl = jnp.maximum(kl, kl_min)
    warm = jnp.minimum(step.astype(jnp.float32) / max(kl_start_steps, 1), 1.0)
    return warm * kl * lambda_kl


def pitch_losses(f0_pred: jax.Array, f0: jax.Array, uv: jax.Array,
                 mel2ph: jax.Array, lambda_uv: float, lambda_f0: float):
    """(uv BCE, f0 L1) with the reference's masking."""
    nonpadding = (mel2ph != 0).astype(jnp.float32)
    uv_logit = f0_pred[..., 1]
    bce = optax.sigmoid_binary_cross_entropy(uv_logit, uv)
    uv_loss = jnp.sum(bce * nonpadding) / jnp.maximum(jnp.sum(nonpadding), 1.0)
    voiced = nonpadding * (uv == 0).astype(jnp.float32)
    f0_loss = jnp.sum(jnp.abs(f0_pred[..., 0] - f0) * voiced) / jnp.maximum(
        jnp.sum(voiced), 1.0)
    return uv_loss * lambda_uv, f0_loss * lambda_f0


def ctc_loss(log_probs: jax.Array, mel_lengths: jax.Array,
             text_tokens: jax.Array, text_lengths: jax.Array,
             lambda_ctc: float) -> jax.Array:
    """torch.F.ctc_loss(reduction='mean', blank=0, zero_infinity) parity.

    log_probs: [B, T_frame, vocab] (already log-softmaxed is fine — optax
    re-normalizes and log_softmax is idempotent).
    """
    from visinger_tpu.ops.ctc import ctc_loss_fast

    t = log_probs.shape[1]
    n = text_tokens.shape[1]
    logit_pad = (jnp.arange(t)[None, :] >= mel_lengths[:, None]).astype(jnp.float32)
    label_pad = (jnp.arange(n)[None, :] >= text_lengths[:, None]).astype(jnp.float32)
    per_seq = ctc_loss_fast(log_probs, logit_pad, text_tokens, label_pad, blank_id=0)
    per_seq = jnp.where(jnp.isfinite(per_seq), per_seq, 0.0)  # zero_infinity
    per_seq = per_seq / jnp.maximum(text_lengths.astype(jnp.float32), 1.0)
    return jnp.mean(per_seq) * lambda_ctc


def discriminator_loss(real_scores, fake_scores) -> jax.Array:
    """LSGAN: sum_d mean((1-D(y))^2) + mean(D(G(z))^2)."""
    loss = 0.0
    for r, g in zip(real_scores, fake_scores):
        loss = loss + jnp.mean(jnp.square(1.0 - r)) + jnp.mean(jnp.square(g))
    return loss


def generator_adv_loss(fake_scores) -> jax.Array:
    """LSGAN generator: sum_d mean((1-D(G(z)))^2)."""
    loss = 0.0
    for g in fake_scores:
        loss = loss + jnp.mean(jnp.square(1.0 - g))
    return loss


def feature_matching_loss(fmap_real, fmap_fake) -> jax.Array:
    """Sum of L1 over every feature map of every sub-discriminator."""
    loss = 0.0
    for fr, ff in zip(fmap_real, fmap_fake):
        for r, f in zip(fr, ff):
            loss = loss + jnp.mean(jnp.abs(jax.lax.stop_gradient(r) - f))
    return loss
