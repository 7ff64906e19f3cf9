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

from typing import Callable

from visinger_tpu.modules.common import (ChannelLayerNorm, Conv1d,
                                         torch_bias_init, torch_kernel_init)


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


class _HeadPackedProj(nn.Module):
    """1x1 projection emitting head-major 128-lane-packed channels.

    Declares the SAME parameters as ``Conv1d(features, 1)`` (kernel
    [1, C, F], bias [F]; identical names, shapes and initializers, so
    checkpoints are interchangeable with the legacy attention path) but
    zero-pads each head's d_k weight columns up to 128 lanes at apply time
    — the Pallas attention kernel then reads head h as an aligned lane slab
    with no transpose/reshape anywhere in the layer."""

    features: int
    n_heads: int
    kernel_init: Callable
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from visinger_tpu.ops.pallas.attention_kernel import LANE

        c = x.shape[-1]
        w = self.param("kernel", self.kernel_init, (1, c, self.features))
        bias = self.param("bias", torch_bias_init(c), (self.features,))
        dk = self.features // self.n_heads
        w2 = w[0].reshape(c, self.n_heads, dk)
        w2 = jnp.pad(w2, ((0, 0), (0, 0), (0, LANE - dk)))
        w2 = w2.reshape(c, self.n_heads * LANE)
        b2 = jnp.pad(bias.reshape(self.n_heads, dk),
                     ((0, 0), (0, LANE - dk))).reshape(-1)
        return jnp.einsum("btc,cd->btd", x.astype(self.dtype),
                          w2.astype(self.dtype)) + b2.astype(self.dtype)


class _HeadPackedOutProj(nn.Module):
    """Output 1x1 projection consuming head-major 128-lane-packed input.

    Same parameters as ``Conv1d(channels, 1)`` on the unpacked [B, T, C]
    input; the padded lanes map to zero weight rows, so the packed apply is
    exactly the legacy projection."""

    channels: int
    n_heads: int
    kernel_init: Callable
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x_packed: jax.Array) -> jax.Array:
        from visinger_tpu.ops.pallas.attention_kernel import LANE

        c = self.channels  # the legacy conv_o has in C == out C
        w = self.param("kernel", self.kernel_init, (1, c, self.channels))
        bias = self.param("bias", torch_bias_init(c), (self.channels,))
        dk = c // self.n_heads
        w2 = w[0].reshape(self.n_heads, dk, self.channels)
        w2 = jnp.pad(w2, ((0, 0), (0, LANE - dk), (0, 0)))
        w2 = w2.reshape(self.n_heads * LANE, self.channels)
        return jnp.einsum("btc,cd->btd", x_packed.astype(self.dtype),
                          w2.astype(self.dtype)) + bias.astype(self.dtype)


class RelativeMultiHeadAttention(nn.Module):
    """Self-attention with shared relative key/value embeddings (±window).

    ``attn_impl`` picks the lowering (identical math and parameters):
      - "legacy": [B,H,T,dk] split-head einsums + skew-trick band
        (round-1..4 path; the split/merge transposes and [B,H,T,T]
        reshapes showed up as ~10 ms/step of data formatting in the
        round-4 profile)
      - "einsum": transpose-free [B,T,H,dk] einsums — contractions carry
        the head dim as a batch axis so XLA folds the layout change into
        the matmuls instead of emitting copy ops
      - "pallas": fused TPU kernel (ops/pallas/attention_kernel.py);
        scores/softmax/band/dropout never leave VMEM
    """

    channels: int
    n_heads: int
    window_size: int = 4
    p_dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "legacy"

    @nn.compact
    def __call__(self, x: jax.Array, x_mask: jax.Array, deterministic: bool = True) -> jax.Array:
        """x: [B, T, C]; x_mask: [B, T, 1] per-frame validity."""
        b, t, c = x.shape
        h, w = self.n_heads, self.window_size
        dk = c // h
        assert c % h == 0
        scale = 1.0 / math.sqrt(dk)
        xavier = nn.initializers.xavier_uniform()
        rel_init = nn.initializers.normal(stddev=dk ** -0.5)

        if self.attn_impl == "pallas":
            from visinger_tpu.ops.pallas.attention_kernel import rel_attention

            q = _HeadPackedProj(c, h, xavier, self.dtype, name="conv_q")(x)
            k = _HeadPackedProj(c, h, xavier, self.dtype, name="conv_k")(x)
            v = _HeadPackedProj(c, h, xavier, self.dtype, name="conv_v")(x)
            emb_rel_k = self.param("emb_rel_k", rel_init, (2 * w + 1, dk))
            emb_rel_v = self.param("emb_rel_v", rel_init, (2 * w + 1, dk))
            dropping = self.p_dropout > 0 and not deterministic
            if dropping:
                seed = jax.random.randint(self.make_rng("dropout"), (), 0,
                                          jnp.iinfo(jnp.int32).max,
                                          dtype=jnp.int32)
            else:
                seed = None
            out = rel_attention(
                q, k, v, emb_rel_k, emb_rel_v, x_mask[:, :, 0], window=w,
                scale=scale, dropout_rate=float(self.p_dropout), seed=seed,
                deterministic=not dropping)
            return _HeadPackedOutProj(self.channels, h, torch_kernel_init,
                                      self.dtype, name="conv_o")(
                                          out.astype(self.dtype))

        attn_mask = x_mask[:, :, 0][:, :, None] * x_mask[:, :, 0][:, None, :]
        q = Conv1d(c, 1, kernel_init=xavier, dtype=self.dtype, name="conv_q")(x)
        k = Conv1d(c, 1, kernel_init=xavier, dtype=self.dtype, name="conv_k")(x)
        v = Conv1d(c, 1, kernel_init=xavier, dtype=self.dtype, name="conv_v")(x)

        # heads_share=True: one [2w+1, dk] table for all heads.
        emb_rel_k = self.param("emb_rel_k", rel_init, (2 * w + 1, dk))
        emb_rel_v = self.param("emb_rel_v", rel_init, (2 * w + 1, dk))

        if self.attn_impl == "einsum":
            # transpose-free: keep [B, T, H, dk]; the head axis rides the
            # einsum batch dims, so no split/merge copies are emitted
            qh = q.reshape(b, t, h, dk)
            kh = k.reshape(b, t, h, dk)
            vh = v.reshape(b, t, h, dk)
            scores = jnp.einsum("bihd,bjhd->bhij", qh, kh,
                                preferred_element_type=jnp.float32) * scale
            rel = jnp.einsum("bihd,md->bhim", qh, emb_rel_k,
                             preferred_element_type=jnp.float32) * scale
            scores = scores + band_to_dense(rel, w)
            scores = jnp.where(attn_mask[:, None] > 0, scores, -1e4)
            p_attn = jax.nn.softmax(scores, axis=-1)
            p_attn = nn.Dropout(self.p_dropout)(p_attn,
                                                deterministic=deterministic)
            p_attn = p_attn.astype(self.dtype)
            out = jnp.einsum("bhij,bjhd->bihd", p_attn, vh,
                             preferred_element_type=jnp.float32)
            w_rel = dense_to_band(p_attn, w)
            out = out + jnp.einsum("bhim,md->bihd", w_rel, emb_rel_v,
                                   preferred_element_type=jnp.float32)
            out = out.reshape(b, t, c).astype(self.dtype)
            return Conv1d(self.channels, 1, dtype=self.dtype,
                          name="conv_o")(out)

        def split_heads(a):
            return a.reshape(b, t, h, dk).transpose(0, 2, 1, 3)  # [B,H,T,dk]

        qh, kh, vh = split_heads(q), split_heads(k), split_heads(v)
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
    attn_impl: str = "legacy"

    @nn.compact
    def __call__(self, x: jax.Array, x_mask: jax.Array, g: jax.Array | None = None,
                 deterministic: bool = True) -> jax.Array:
        """x: [B, T, C]; x_mask: [B, T, 1]; g: [B, 1|T, gin] or None."""
        x = x.astype(self.dtype)
        x_mask = x_mask.astype(self.dtype)
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
                self.p_dropout, dtype=self.dtype, attn_impl=self.attn_impl,
                name=f"attn_{i}")(x, x_mask, deterministic)
            y = drop(y, deterministic=deterministic)
            x = ChannelLayerNorm(name=f"norm1_{i}")(x + y)
            y = ConvFFN(self.hidden_channels, self.filter_channels,
                        self.kernel_size, self.p_dropout, dtype=self.dtype,
                        name=f"ffn_{i}")(x, x_mask, deterministic)
            y = drop(y, deterministic=deterministic)
            x = ChannelLayerNorm(name=f"norm2_{i}")(x + y)
        return x * x_mask
