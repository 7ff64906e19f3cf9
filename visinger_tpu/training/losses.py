"""VISinger training losses.

Parity targets (reference tasks/visinger.py + tasks/base.py):
  masked mel losses        tasks/base.py:227-247 (parse_mel_losses registry
                           "l1:45.0" from tasks/utils.py:22-36;
                           weights_nonzero_speech)
  KL warm-up/clamp         tasks/visinger.py:104-110
  uv BCE + f0 L1           tasks/visinger.py:127-139
  CTC                      tasks/visinger.py:141-146 (torch mean semantics:
                           per-sequence NLL / target_length, then batch mean;
                           zero_infinity=True zeroes infeasible items)
  LSGAN disc/gen + FM      tasks/visinger.py:148-170

Every loss takes an optional per-item weight vector ``w`` [B] (1.0 = real
item).  TPU batches are padded to ``max_sentences`` by repeating the last
item (static shapes); the weights mask the duplicates out of every reduction
so padded batches match the reference's variable-size batch semantics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

# ctc_loss_fast encodes "no valid path" as ~ -_NEG_INF (finite, 1e30-scale);
# anything above this threshold is treated as infinite for zero_infinity.
_CTC_INF_THRESHOLD = 1e29


def _ones_like_batch(x: jax.Array, w) -> jax.Array:
    return jnp.ones((x.shape[0],), jnp.float32) if w is None \
        else w.astype(jnp.float32)


def parse_mel_losses(spec: str) -> dict[str, float]:
    """'l1:45.0|mse:1.0' -> {name: weight} (reference tasks/utils.py:22-36)."""
    out: dict[str, float] = {}
    for part in str(spec).split("|"):
        if not part:
            continue
        if ":" in part:
            name, weight = part.split(":")
            out[name] = float(weight)
        else:
            out[part] = 1.0
    return out


def _masked_mel(penalty, mel_out: jax.Array, mel_tgt: jax.Array,
                w=None) -> jax.Array:
    """Masked mel loss with weights from nonzero target frames
    (utils/nn/seq_utils.py:33; reference l1/mse, tasks/base.py:232-247)."""
    weights = (jnp.sum(jnp.abs(mel_tgt), axis=-1, keepdims=True) != 0).astype(mel_tgt.dtype)
    weights = weights * _ones_like_batch(mel_tgt, w)[:, None, None]
    weights = jnp.broadcast_to(weights, mel_tgt.shape)
    err = penalty(mel_out - mel_tgt) * weights
    return jnp.sum(err) / jnp.maximum(jnp.sum(weights), 1.0)


def masked_mel_l1(mel_out, mel_tgt, w=None):
    return _masked_mel(jnp.abs, mel_out, mel_tgt, w)


def masked_mel_mse(mel_out, mel_tgt, w=None):
    return _masked_mel(jnp.square, mel_out, mel_tgt, w)


MEL_LOSSES = {"l1": masked_mel_l1, "mse": masked_mel_mse}


def mel_losses_total(spec: str, mel_out: jax.Array, mel_tgt: jax.Array,
                     w=None) -> jax.Array:
    """Apply the configured mel-loss mix (reference add_mel_loss,
    tasks/base.py:227-231)."""
    total = 0.0
    for name, weight in parse_mel_losses(spec).items():
        fn = MEL_LOSSES.get(name)
        if fn is None:
            raise ValueError(f"unsupported mel loss {name!r}")
        total = total + fn(mel_out, mel_tgt, w) * weight
    return total


def kl_schedule(kl: jax.Array, step: jax.Array, kl_min: float,
                kl_start_steps: int, lambda_kl: float) -> jax.Array:
    kl = jnp.maximum(kl, kl_min)
    warm = jnp.minimum(step.astype(jnp.float32) / max(kl_start_steps, 1), 1.0)
    return warm * kl * lambda_kl


def pitch_losses(f0_pred: jax.Array, f0: jax.Array, uv: jax.Array,
                 mel2ph: jax.Array, lambda_uv: float, lambda_f0: float,
                 w=None):
    """(uv BCE, f0 L1) with the reference's masking."""
    nonpadding = (mel2ph != 0).astype(jnp.float32) \
        * _ones_like_batch(mel2ph, w)[:, None]
    uv_logit = f0_pred[..., 1]
    bce = optax.sigmoid_binary_cross_entropy(uv_logit, uv)
    uv_loss = jnp.sum(bce * nonpadding) / jnp.maximum(jnp.sum(nonpadding), 1.0)
    voiced = nonpadding * (uv == 0).astype(jnp.float32)
    f0_loss = jnp.sum(jnp.abs(f0_pred[..., 0] - f0) * voiced) / jnp.maximum(
        jnp.sum(voiced), 1.0)
    return uv_loss * lambda_uv, f0_loss * lambda_f0


def ctc_loss(log_probs: jax.Array, mel_lengths: jax.Array,
             text_tokens: jax.Array, text_lengths: jax.Array,
             lambda_ctc: float, w=None) -> jax.Array:
    """torch.F.ctc_loss(reduction='mean', blank=0, zero_infinity) parity.

    log_probs: [B, T_frame, vocab] (already log-softmaxed is fine — optax
    re-normalizes and log_softmax is idempotent).

    zero_infinity: ctc_loss_fast returns ~1e30 (from its -1e30 floor) when no
    valid alignment exists (e.g. valid frames < label count), so the filter
    thresholds at 1e29 rather than isfinite — torch zeroes exactly these.
    """
    from visinger_tpu.ops.ctc import ctc_loss_fast

    t = log_probs.shape[1]
    n = text_tokens.shape[1]
    logit_pad = (jnp.arange(t)[None, :] >= mel_lengths[:, None]).astype(jnp.float32)
    label_pad = (jnp.arange(n)[None, :] >= text_lengths[:, None]).astype(jnp.float32)
    per_seq = ctc_loss_fast(log_probs, logit_pad, text_tokens, label_pad, blank_id=0)
    feasible = jnp.isfinite(per_seq) & (per_seq < _CTC_INF_THRESHOLD)
    # zero_infinity semantics (torch F.ctc_loss): infeasible items (fewer
    # valid frames than labels) contribute 0.  Gradients stay finite because
    # ctc_loss_fast floors its logsumexps at a finite -1e30 (no inf/NaN in
    # the discarded branch — verified by test_ctc_zero_infinity_*).
    per_seq = jnp.where(feasible, per_seq, 0.0)
    per_seq = per_seq / jnp.maximum(text_lengths.astype(jnp.float32), 1.0)
    wb = _ones_like_batch(per_seq, w)
    return jnp.sum(per_seq * wb) / jnp.maximum(jnp.sum(wb), 1.0) * lambda_ctc


def _per_item_mean(x: jax.Array) -> jax.Array:
    """[B, ...] -> [B] mean over non-batch axes."""
    return jnp.mean(x.reshape(x.shape[0], -1), axis=1)


def _weighted_mean(per_item: jax.Array, wb: jax.Array) -> jax.Array:
    return jnp.sum(per_item * wb) / jnp.maximum(jnp.sum(wb), 1.0)


def discriminator_loss(real_scores, fake_scores, w=None) -> jax.Array:
    """LSGAN: sum_d mean((1-D(y))^2) + mean(D(G(z))^2)."""
    loss = 0.0
    for r, g in zip(real_scores, fake_scores):
        wb = _ones_like_batch(r, w)
        loss = loss + _weighted_mean(_per_item_mean(jnp.square(1.0 - r)), wb) \
            + _weighted_mean(_per_item_mean(jnp.square(g)), wb)
    return loss


def generator_adv_loss(fake_scores, w=None) -> jax.Array:
    """LSGAN generator: sum_d mean((1-D(G(z)))^2)."""
    loss = 0.0
    for g in fake_scores:
        wb = _ones_like_batch(g, w)
        loss = loss + _weighted_mean(_per_item_mean(jnp.square(1.0 - g)), wb)
    return loss


def feature_matching_loss(fmap_real, fmap_fake, w=None) -> jax.Array:
    """Sum of L1 over every feature map of every sub-discriminator."""
    loss = 0.0
    for fr, ff in zip(fmap_real, fmap_fake):
        for r, f in zip(fr, ff):
            wb = _ones_like_batch(r, w)
            d = jnp.abs(jax.lax.stop_gradient(r) - f)
            loss = loss + _weighted_mean(_per_item_mean(d), wb)
    return loss
