"""Alignment ops: the length regulator gather and duration recovery.

Parity with reference models/commons/align_ops.py:22-26 (expand_states) and
utils/audio/align.py:107-129 (mel2token_to_dur), channels-last.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def expand_states(h: jax.Array, mel2token: jax.Array) -> jax.Array:
    """Length-regulate token-rate features to frame rate.

    Args:
      h: [B, T_tok, C] token-rate hidden states.
      mel2token: [B, T_frame] int; 0 = padding, i>0 selects token i-1
        (padding frames get zeros — the reference's prepended zero row).

    Implemented as a one-hot matmul rather than a gather: the gather's
    backward is a scatter-add, which costs milliseconds per call on TPU,
    while the matmul (T_frame x T_tok x C, ~tens of MFLOPs) rides the MXU
    in both directions.
    """
    n_tok = h.shape[1]
    onehot = jax.nn.one_hot(mel2token - 1, n_tok, dtype=h.dtype)  # -1 -> all-0
    return jnp.einsum("btn,bnc->btc", onehot, h,
                      preferred_element_type=h.dtype)


def mel2ph_to_mel2word(mel2ph: jax.Array, ph2word: jax.Array) -> jax.Array:
    """Frame->phoneme map + phoneme->word map -> frame->word map
    (align_ops.py:5-8 semantics); index 0 stays padding."""
    ph2word_pad = jnp.concatenate(
        [jnp.zeros_like(ph2word[:, :1]), ph2word], axis=1)
    return jnp.take_along_axis(ph2word_pad, mel2ph, axis=1)


def build_word_mask(x2word: jax.Array, y2word: jax.Array) -> jax.Array:
    """[B, Tx], [B, Ty] -> [B, Tx, Ty] mask where both map to the same word
    (align_ops.py:11-13)."""
    return (x2word[:, :, None] == y2word[:, None, :]) & (x2word[:, :, None] > 0)


def clip_mel2token_to_multiple(mel2token: jax.Array, frames_multiple: int) -> jax.Array:
    """Truncate the frame axis to a multiple (align_ops.py:16-19)."""
    t = (mel2token.shape[1] // frames_multiple) * frames_multiple
    return mel2token[:, :t]


def mel2token_to_dur(mel2token: jax.Array, t_tokens: int) -> jax.Array:
    """Recover per-token durations from a frame->token map (scatter-add).

    Args:
      mel2token: [B, T_frame] int (0 = padding).
      t_tokens: static token-axis size of the output.

    Returns: [B, t_tokens] int durations.
    """
    one = jnp.ones_like(mel2token)
    dur = jax.vmap(
        lambda m, o: jnp.zeros((t_tokens + 1,), dtype=mel2token.dtype).at[m].add(o)
    )(mel2token, one)
    return dur[:, 1:]
