"""Relative-position transformer encoder (VITS/NATSpeech-style).

Parity target: reference modules/rel_transformer.py —
  MultiHeadAttention (:103-254) with learned relative key/value embeddings in
  a ±window band (window 4, heads shared), conv-FFN (:323-345, ReLU), channel
  LayerNorm, post-LN residual blocks, optional per-layer additive
  conditioning g (:290-320).

TPU-first redesign: the reference converts banded relative logits to
absolute positions with the pad/reshape "skew trick" (:214-243), which
materializes [B, H, T, 2T-1] tensors.  Here the band is applied with two
static gathers instead:
  - rel-K: logits_abs[i, j] = rel[i, j-i+w]   (one take_along_axis, [T, T] idx)
  - rel-V: w_rel[i, d] = p_attn[i, i+d-w]     (one take_along_axis, [T, 2w+1] idx)
Both index maps are compile-time constants, so XLA fuses them; peak memory
stays at the [B, H, T, T] score matrix.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from visinger_tpu.modules.common import ChannelLayerNorm, Conv1d


def _band_edge_mask(t: int, window: int) -> jax.Array:
    """[t, 2w+1] mask: band offset d maps inside [0, t) for row i."""
    ii = jax.lax.broadcasted_iota(jnp.int32, (t, 2 * window + 1), 0)
    dd = jax.lax.broadcasted_iota(jnp.int32, (t, 2 * window + 1), 1)
    jj = ii + dd - window
    return (jj >= 0) & (jj < t)


def band_to_dense(rel: jax.Array, window: int) -> jax.Array:
    """[..., T, 2w+1] banded values -> [..., T, T] dense (zeros off-band).

    out[i, i+d-w] = rel[i, d].  Implemented with the pad/reshape skew trick
    (flat index i*(T+1) + (d-w) == dense flat index), so forward AND backward
    are pure pads/slices — a gather formulation here makes XLA emit a
    scatter in the backward that runs ~30 ms per layer on TPU.
    """
    *lead, t, m = rel.shape
    w = window
    assert m == 2 * w + 1
    rel = jnp.where(_band_edge_mask(t, w), rel, 0.0)
    buf = jnp.pad(rel, [(0, 0)] * len(lead) + [(0, 0), (0, t + 1 - m)])
    flat = buf.reshape(*lead, t * (t + 1))
    flat = jax.lax.slice_in_dim(
        jnp.pad(flat, [(0, 0)] * len(lead) + [(0, w)]), w, w + t * t,
        axis=len(lead))
    return flat.reshape(*lead, t, t)


def dense_to_band(p: jax.Array, window: int) -> jax.Array:
    """[..., T, T] dense -> [..., T, 2w+1] band: out[i, d] = p[i, i+d-w].

    Inverse skew (same pad/reshape family; no gather/scatter)."""
    *lead, t, t2 = p.shape
    assert t == t2
    w = window
    flat = p.reshape(*lead, t * t)
    flat = jnp.pad(flat, [(0, 0)] * len(lead) + [(w, t + w)])
    buf = flat[..., : t * (t + 1)].reshape(*lead, t, t + 1)
    band = buf[..., : 2 * w + 1]
    return jnp.where(_band_edge_mask(t, w), band, 0.0)


class RelativeMultiHeadAttention(nn.Module):
    """Self-attention with shared relative key/value embeddings (±window)."""

    channels: int
    n_heads: int
    window_size: int = 4
    p_dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, attn_mask: jax.Array, deterministic: bool = True) -> jax.Array:
        b, t, c = x.shape
        h, w = self.n_heads, self.window_size
        dk = c // h
        assert c % h == 0

        xavier = nn.initializers.xavier_uniform()
        q = Conv1d(c, 1, kernel_init=xavier, dtype=self.dtype, name="conv_q")(x)
        k = Conv1d(c, 1, kernel_init=xavier, dtype=self.dtype, name="conv_k")(x)
        v = Conv1d(c, 1, kernel_init=xavier, dtype=self.dtype, name="conv_v")(x)

        # heads_share=True: one [2w+1, dk] table for all heads.
        rel_init = nn.initializers.normal(stddev=dk ** -0.5)
        emb_rel_k = self.param("emb_rel_k", rel_init, (2 * w + 1, dk))
        emb_rel_v = self.param("emb_rel_v", rel_init, (2 * w + 1, dk))

        def split_heads(a):
            return a.reshape(b, t, h, dk).transpose(0, 2, 1, 3)  # [B,H,T,dk]

        qh, kh, vh = split_heads(q), split_heads(k), split_heads(v)
        scale = 1.0 / math.sqrt(dk)
        scores = jnp.einsum("bhid,bhjd->bhij", qh, kh,
                            preferred_element_type=jnp.float32) * scale

        # relative-key logits: [B,H,T,2w+1] -> banded [B,H,T,T] (skew trick)
        rel = jnp.einsum("bhid,md->bhim", qh, emb_rel_k,
                         preferred_element_type=jnp.float32) * scale
        scores = scores + band_to_dense(rel, w)

        scores = jnp.where(attn_mask[:, None] > 0, scores, -1e4)
        p_attn = jax.nn.softmax(scores, axis=-1)
        p_attn = nn.Dropout(self.p_dropout)(p_attn, deterministic=deterministic)

        # softmax stays f32; weights cast back to the compute dtype for the MXU
        p_attn = p_attn.astype(self.dtype)
        out = jnp.einsum("bhij,bhjd->bhid", p_attn, vh,
                         preferred_element_type=jnp.float32)
        # relative-value contribution: w_rel[i, d] = p_attn[i, i+d-w]
        w_rel = dense_to_band(p_attn, w)
        out = out + jnp.einsum("bhim,md->bhid", w_rel, emb_rel_v,
                               preferred_element_type=jnp.float32)

        out = out.transpose(0, 2, 1, 3).reshape(b, t, c).astype(self.dtype)
        return Conv1d(self.channels, 1, dtype=self.dtype, name="conv_o")(out)


class ConvFFN(nn.Module):
    """Conv k / ReLU / conv-1x1 feed-forward (rel_transformer.py:323-345)."""

    channels: int
    filter_channels: int
    kernel_size: int
    p_dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, x_mask: jax.Array, deterministic: bool = True) -> jax.Array:
        x = Conv1d(self.filter_channels, self.kernel_size, dtype=self.dtype,
                   name="conv_1")(x * x_mask)
        x = jax.nn.relu(x)
        x = nn.Dropout(self.p_dropout)(x, deterministic=deterministic)
        return Conv1d(self.channels, 1, dtype=self.dtype, name="conv_2")(x * x_mask)


class RelativeEncoder(nn.Module):
    """Post-LN stack of (rel-MHA, conv-FFN), optional additive conditioning.

    Mirrors reference RelativeEncoder (rel_transformer.py:257-320): when a
    conditioning signal g ([B, 1 or T, gin]) is given it is projected once
    (pre_net 1x1) and added to x before *every* layer.
    """

    hidden_channels: int
    filter_channels: int
    n_heads: int
    n_layers: int
    kernel_size: int = 1
    p_dropout: float = 0.0
    window_size: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, x_mask: jax.Array, g: jax.Array | None = None,
                 deterministic: bool = True) -> jax.Array:
        """x: [B, T, C]; x_mask: [B, T, 1]; g: [B, 1|T, gin] or None."""
        x = x.astype(self.dtype)
        x_mask = x_mask.astype(self.dtype)
        attn_mask = x_mask[:, :, 0][:, :, None] * x_mask[:, :, 0][:, None, :]
        if g is not None:
            g = Conv1d(self.hidden_channels, 1, dtype=self.dtype,
                       name="pre_net")(g.astype(self.dtype))
        drop = nn.Dropout(self.p_dropout)
        for i in range(self.n_layers):
            if g is not None:
                x = x + g
            x = x * x_mask
            y = RelativeMultiHeadAttention(
                self.hidden_channels, self.n_heads, self.window_size,
                self.p_dropout, dtype=self.dtype,
                name=f"attn_{i}")(x, attn_mask, deterministic)
            y = drop(y, deterministic=deterministic)
            x = ChannelLayerNorm(name=f"norm1_{i}")(x + y)
            y = ConvFFN(self.hidden_channels, self.filter_channels,
                        self.kernel_size, self.p_dropout, dtype=self.dtype,
                        name=f"ffn_{i}")(x, x_mask, deterministic)
            y = drop(y, deterministic=deterministic)
            x = ChannelLayerNorm(name=f"norm2_{i}")(x + y)
        return x * x_mask
