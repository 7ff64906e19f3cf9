"""VISinger encoders: text/score encoder, frame prior, posterior, predictors.

Parity targets in the reference:
  TextEncoder               modules/visinger/encoder.py:14-55
  FramePriorNetwork         modules/visinger/encoder.py:58-73
  PosteriorEncoder          modules/visinger/encoder.py:76-101
  PitchPredictor            modules/visinger/predictor.py:7-19
  PhonemePredictor          modules/visinger/predictor.py:22-35

All channels-last [B, T, C].  Sampling takes explicit PRNG keys.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from visinger_tpu.modules.common import (
    Conv1d,
    TokenEmbedding,
    positional_embedding,
    torch_bias_init,
    torch_kernel_init,
)
from visinger_tpu.modules.transformer import RelativeEncoder
from visinger_tpu.modules.wavenet import WaveNet
from visinger_tpu.ops.expand import expand_states


class TextEncoder(nn.Module):
    """MIDI-score encoder: (phoneme, note-pitch, note-duration) token triples
    -> relative-transformer features, length-regulated to frame rate."""

    ph_vocab: int
    pitch_vocab: int
    dur_vocab: int
    hidden_channels: int
    filter_channels: int
    n_heads: int
    n_layers: int
    kernel_size: int
    p_dropout: float
    use_pos_embed: bool = True
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "legacy"

    @nn.compact
    def __call__(self, text_tokens, pitch_tokens, dur_tokens, mel2ph,
                 deterministic: bool = True):
        """Returns [B, T_frame, H] frame-rate features."""
        h = self.hidden_channels
        scale = math.sqrt(h)
        nonpadding = (text_tokens > 0).astype(self.dtype)[..., None]  # [B,T_ph,1]
        emb = jnp.concatenate(
            [
                TokenEmbedding(self.ph_vocab, h, name="ph_emb")(text_tokens) * scale,
                TokenEmbedding(self.pitch_vocab, h, name="pitch_emb")(pitch_tokens) * scale,
                TokenEmbedding(self.dur_vocab, h, name="dur_emb")(dur_tokens) * scale,
            ],
            axis=-1,
        ).astype(self.dtype)
        x = nn.Dense(h, dtype=self.dtype, name="linear",
                     kernel_init=torch_kernel_init,
                     bias_init=torch_bias_init(3 * h))(emb) * nonpadding
        if self.use_pos_embed:
            pos = positional_embedding(nonpadding[..., 0], h).astype(self.dtype)
            # Reference-faithful token-level positions are SCRAMBLED: the
            # reference passes token_emb.shape[2] (=H, not T_ph) as seq_len
            # (modules/visinger/encoder.py:53), so its positional table is
            # .view()-ed [B*T*H] -> [B, H, T] and transposed
            # (rel_transformer.py:101-102) — a deterministic reshape of the
            # correct table, not positions.  Reproduced bit-exactly here
            # (validated in tools/lockstep.py); frame-level positions in
            # models/visinger.py use the correct path.
            b, t, _ = pos.shape
            pos = pos.reshape(b, h, t).transpose(0, 2, 1)
            x = x + pos
        x = x * nonpadding
        x = RelativeEncoder(h, self.filter_channels, self.n_heads, self.n_layers,
                            self.kernel_size, self.p_dropout, dtype=self.dtype,
                            attn_impl=self.attn_impl,
                            name="encoder")(x, nonpadding, deterministic=deterministic)
        return expand_states(x, mel2ph)


class FramePriorNetwork(nn.Module):
    """Frame-rate prior: relative encoder conditioned on log-f0 (gin=1)
    -> (mu_p, logs_p)."""

    hidden_channels: int
    filter_channels: int
    n_heads: int
    n_layers: int
    kernel_size: int
    p_dropout: float
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "legacy"

    @nn.compact
    def __call__(self, x, x_mask, g=None, deterministic: bool = True):
        h = self.hidden_channels
        x = RelativeEncoder(h, self.filter_channels, self.n_heads, self.n_layers,
                            self.kernel_size, self.p_dropout, dtype=self.dtype,
                            attn_impl=self.attn_impl,
                            name="encoder")(x, x_mask, g=g, deterministic=deterministic)
        stats = Conv1d(2 * h, 1, dtype=self.dtype, name="proj")(x) \
            * x_mask.astype(self.dtype)
        # distribution stats in f32: downstream exp/KL need the range
        stats = stats.astype(jnp.float32)
        return stats[..., :h], stats[..., h:]


class PosteriorEncoder(nn.Module):
    """Linear-spectrogram -> 16-layer WaveNet -> (z_q, mu_q, logs_q)."""

    out_channels: int
    hidden_channels: int
    kernel_size: int = 5
    dilation_rate: int = 1
    n_layers: int = 16
    gin_channels: int = 0
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False
    # when > 0, |logs_q| is bounded BEFORE sampling so exp(logs_q) cannot
    # blow z_q up in the first training steps (the KL term is clamped
    # separately in models/visinger.py); 0 = reference-faithful raw stats.
    logs_clamp: float = 0.0

    @nn.compact
    def __call__(self, x, x_mask, key, g=None, deterministic: bool = True):
        x = x.astype(self.dtype)
        xm = x_mask.astype(self.dtype)
        x = Conv1d(self.hidden_channels, 1, dtype=self.dtype, name="pre")(x) * xm
        x = WaveNet(self.hidden_channels, self.kernel_size, self.dilation_rate,
                    self.n_layers, self.gin_channels, dtype=self.dtype,
                    use_pallas=self.use_pallas,
                    name="enc")(x, xm, g=g, deterministic=deterministic)
        stats = Conv1d(2 * self.out_channels, 1, dtype=self.dtype,
                       name="proj")(x) * xm
        # sampling in f32 (exp of logs needs range), z cast back downstream
        stats = stats.astype(jnp.float32)
        mu_q, logs_q = stats[..., :self.out_channels], stats[..., self.out_channels:]
        if self.logs_clamp > 0:
            logs_q = jnp.clip(logs_q, -self.logs_clamp, self.logs_clamp)
        eps = jax.random.normal(key, mu_q.shape, mu_q.dtype)
        z_q = (mu_q + eps * jnp.exp(logs_q)) * x_mask
        return z_q, mu_q, logs_q


class PitchPredictor(nn.Module):
    """Relative encoder + 1x1 head -> [B, T, 2] (log-f0, uv-logit)."""

    hidden_channels: int
    filter_channels: int
    n_heads: int
    n_layers: int
    kernel_size: int
    p_dropout: float
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "legacy"

    @nn.compact
    def __call__(self, x, x_mask, spk_emb=None, deterministic: bool = True):
        x = RelativeEncoder(self.hidden_channels, self.filter_channels,
                            self.n_heads, self.n_layers, self.kernel_size,
                            self.p_dropout, dtype=self.dtype,
                            attn_impl=self.attn_impl, name="encoder")(
                                x, x_mask, g=spk_emb, deterministic=deterministic)
        return Conv1d(2, 1, dtype=self.dtype,
                      name="linear")(x).astype(jnp.float32)


class PhonemePredictor(nn.Module):
    """CTC head on z_q: relative encoder + 1x1 -> log-softmax over vocab."""

    vocab_size: int
    hidden_channels: int
    filter_channels: int
    n_heads: int
    n_layers: int
    kernel_size: int
    p_dropout: float
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "legacy"

    @nn.compact
    def __call__(self, x, x_mask, deterministic: bool = True):
        x = RelativeEncoder(self.hidden_channels, self.filter_channels,
                            self.n_heads, self.n_layers, self.kernel_size,
                            self.p_dropout, dtype=self.dtype,
                            attn_impl=self.attn_impl, name="encoder")(
                                x, x_mask, deterministic=deterministic)
        logits = Conv1d(self.vocab_size, 1, dtype=self.dtype, name="ph_proj")(x)
        # CTC numerics in f32
        return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
