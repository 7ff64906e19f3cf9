"""Fast CTC loss for TPU.

optax.ctc_loss lowers to a T-step lax.scan whose per-step work is tiny, so
on TPU the sequential iteration latency dominates — measured ~29% of the
whole VISinger train step (bench ablation).  This implementation keeps the
identical alpha-recursion semantics but:
  - gathers per-frame label logits once up front ([B, T, S] take_along_axis)
  - runs the scan with ``unroll`` (default 8) so XLA amortizes loop overhead
  - carries only the [B, S] alpha row in log space

Semantics match optax.ctc_loss (blank_id, paddings, per-sequence negative
log-likelihood), verified in tests/test_ctc.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_NEG_INF = -1e30


def _logaddexp3(a, b, c):
    m = jnp.maximum(jnp.maximum(a, b), c)
    all_ninf = m <= _NEG_INF / 2
    m_safe = jnp.where(all_ninf, 0.0, m)
    total = jnp.exp(a - m_safe) + jnp.exp(b - m_safe) + jnp.exp(c - m_safe)
    # double-where so the log(0) branch can't poison gradients
    total_safe = jnp.where(all_ninf, 1.0, total)
    return jnp.where(all_ninf, _NEG_INF, m_safe + jnp.log(total_safe))


def ctc_loss_fast(log_probs: jax.Array, logit_paddings: jax.Array,
                  labels: jax.Array, label_paddings: jax.Array,
                  blank_id: int = 0, unroll: int = 8) -> jax.Array:
    """Per-sequence CTC negative log-likelihood.

    Args:
      log_probs: [B, T, K] (log-softmaxed or raw — normalized here)
      logit_paddings: [B, T] 1.0 where frame is padding
      labels: [B, N] int labels (blank_id used as pad value too)
      label_paddings: [B, N] 1.0 where label is padding
    Returns: [B] loss.
    """
    b, t, k = log_probs.shape
    n = labels.shape[1]
    s = 2 * n + 1
    log_probs = jax.nn.log_softmax(log_probs, axis=-1)

    # extended label sequence [blank, l1, blank, l2, ..., blank]
    ext = jnp.full((b, s), blank_id, labels.dtype)
    ext = ext.at[:, 1::2].set(labels)
    label_valid = 1.0 - label_paddings                          # [B, N]
    n_labels = jnp.sum(label_valid, axis=1).astype(jnp.int32)   # [B]

    # per-state validity: state s valid iff s < 2*n_labels+1
    state_idx = jnp.arange(s)[None, :]
    state_valid = state_idx < (2 * n_labels + 1)[:, None]

    # skip-transition allowed: odd states (labels) whose label differs from
    # the label two states back
    prev_label = jnp.concatenate(
        [jnp.full((b, 1), -1, labels.dtype), labels[:, :-1]], axis=1)
    can_skip_lbl = labels != prev_label                          # [B, N]
    can_skip = jnp.zeros((b, s), bool).at[:, 1::2].set(can_skip_lbl)
    can_skip = can_skip & (state_idx >= 2)

    # per-frame log-probs of each extended state's label: [B, T, S] via a
    # one-hot matmul (a gather here puts a scatter-add in the backward —
    # milliseconds per step on TPU; the matmul is MXU-friendly both ways)
    ext_onehot = jax.nn.one_hot(ext, k, dtype=log_probs.dtype)  # [B, S, K]
    state_logp = jnp.einsum("btk,bsk->bts", log_probs, ext_onehot,
                            preferred_element_type=log_probs.dtype)
    state_logp = jnp.where(state_valid[:, None, :], state_logp, _NEG_INF)

    alpha0 = jnp.full((b, s), _NEG_INF)
    alpha0 = alpha0.at[:, 0].set(0.0).at[:, 1].set(
        jnp.where(n_labels > 0, 0.0, _NEG_INF))
    alpha0 = alpha0 + state_logp[:, 0]
    # frame 0 might itself be padding (degenerate); handled by mask below

    neg_inf_col = jnp.full((b, 1), _NEG_INF)

    def step(alpha, inp):
        logp_t, pad_t = inp                                      # [B,S], [B]
        a1 = jnp.concatenate([neg_inf_col, alpha[:, :-1]], axis=1)
        a2 = jnp.concatenate([neg_inf_col, neg_inf_col, alpha[:, :-2]], axis=1)
        a2 = jnp.where(can_skip, a2, _NEG_INF)
        new = _logaddexp3(alpha, a1, a2) + logp_t
        new = jnp.where(state_valid, new, _NEG_INF)
        alpha = jnp.where(pad_t[:, None] > 0, alpha, new)        # freeze pads
        return alpha, None

    xs = (jnp.moveaxis(state_logp[:, 1:], 1, 0),
          jnp.moveaxis(logit_paddings[:, 1:], 1, 0))
    alpha, _ = jax.lax.scan(step, alpha0, xs, unroll=unroll)

    # final states: 2*n_labels (last blank) and 2*n_labels-1 (last label).
    # One-hot reductions instead of take_along_axis: the gather's backward
    # is a scatter into [B, S] — a one-hot multiply-sum is matmul-shaped
    # both ways.
    idx_last = jnp.clip(2 * n_labels, 0, s - 1)
    idx_prev = jnp.clip(2 * n_labels - 1, 0, s - 1)
    pick = lambda idx: jnp.sum(  # noqa: E731
        jnp.where(state_idx == idx[:, None], alpha, 0.0), axis=1)
    fin = jnp.logaddexp(
        pick(idx_last),
        jnp.where(n_labels > 0, pick(idx_prev), _NEG_INF))
    return -fin
