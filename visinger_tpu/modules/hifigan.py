"""HiFi-GAN waveform generator (the VISinger decoder).

Parity target: reference Generator/ResBlock1/ResBlock2
(modules/visinger/decoder.py:13-137): conv_pre k7 -> optional speaker cond ->
N x [leaky_relu -> weight-norm ConvTranspose up -> mean of multi-kernel
ResBlocks] -> leaky_relu -> conv_post k7 (no bias) -> tanh.  Channel count
halves at each upsample stage; total upsampling equals the hop size (300).

Init: torch defaults (kaiming_uniform + uniform bias).  The reference's
init_weights(N(0,0.01)) pass (decoder.py:35,79,89) is a silent no-op — it
mutates the `.weight` tensor of already weight-normed convs, which the
weight_norm pre-hook recomputes from weight_g/weight_v on the next forward
— so the reference's EFFECTIVE init is the construction-time torch default,
which is what modules/common.py's defaults now reproduce (verified
empirically; see tools/lockstep.py).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from visinger_tpu.modules.common import LRELU_SLOPE, Conv1d, ConvTranspose1d

class ResBlock1(nn.Module):
    channels: int
    kernel_size: int = 3
    dilations: Sequence[int] = (1, 3, 5)
    time_fold: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for i, d in enumerate(self.dilations):
            xt = nn.leaky_relu(x, LRELU_SLOPE)
            xt = Conv1d(self.channels, self.kernel_size, dilation=d,
                        weight_norm=True, time_fold=self.time_fold,
                        dtype=self.dtype, name=f"conv1_{i}")(xt)
            xt = nn.leaky_relu(xt, LRELU_SLOPE)
            xt = Conv1d(self.channels, self.kernel_size, dilation=1,
                        weight_norm=True, time_fold=self.time_fold,
                        dtype=self.dtype, name=f"conv2_{i}")(xt)
            x = x + xt
        return x


class ResBlock2(nn.Module):
    channels: int
    kernel_size: int = 3
    dilations: Sequence[int] = (1, 3)
    time_fold: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for i, d in enumerate(self.dilations):
            xt = nn.leaky_relu(x, LRELU_SLOPE)
            xt = Conv1d(self.channels, self.kernel_size, dilation=d,
                        weight_norm=True, time_fold=self.time_fold,
                        dtype=self.dtype, name=f"conv_{i}")(xt)
            x = x + xt
        return x


class HiFiGANGenerator(nn.Module):
    """z [B, T, C] -> waveform [B, T * prod(upsample_rates)]."""

    resblock_type: str = "1"
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11)
    resblock_dilations: Sequence[Sequence[int]] = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    upsample_rates: Sequence[int] = (5, 5, 3, 2, 2)
    upsample_initial_channel: int = 512
    upsample_kernel_sizes: Sequence[int] = (11, 11, 7, 4, 4)
    gin_channels: int = 0
    # Alternative lowerings, identical math/params, A/B'd on the TPU
    # (tools/ab_decoder_lowering.py): time_fold = MXU-dense stride-f tail
    # convs (0.8x incremental on top of polyphase; poly+fold together =
    # 0.56x end-to-end vs the naive lowering — i.e. SLOWER), polyphase =
    # depth-to-space upsampling (0.7x end-to-end — slower).  XLA:TPU
    # already handles the naive forms well; both stay available for future
    # hardware but default off.
    time_fold: bool = False
    polyphase: bool = False
    dtype: jnp.dtype = jnp.float32

    def _fold(self, ch: int) -> int:
        return max(1, min(8, 128 // ch)) if self.time_fold else 1

    @nn.compact
    def __call__(self, x: jax.Array, g: jax.Array | None = None) -> jax.Array:
        num_kernels = len(self.resblock_kernel_sizes)
        res_cls = ResBlock1 if self.resblock_type == "1" else ResBlock2
        x = x.astype(self.dtype)
        x = Conv1d(self.upsample_initial_channel, 7, dtype=self.dtype,
                   name="conv_pre")(x)
        if g is not None and self.gin_channels:
            x = x + Conv1d(self.upsample_initial_channel, 1, dtype=self.dtype,
                           name="cond")(g.astype(self.dtype))
        ch = self.upsample_initial_channel
        for i, (u, k) in enumerate(zip(self.upsample_rates, self.upsample_kernel_sizes)):
            ch = self.upsample_initial_channel // (2 ** (i + 1))
            x = nn.leaky_relu(x, LRELU_SLOPE)
            x = ConvTranspose1d(ch, k, u, weight_norm=True,
                                polyphase=self.polyphase, dtype=self.dtype,
                                name=f"up_{i}")(x)
            acc = None
            for j, (rk, rd) in enumerate(zip(self.resblock_kernel_sizes,
                                             self.resblock_dilations)):
                y = res_cls(ch, rk, tuple(rd), time_fold=self._fold(ch),
                            dtype=self.dtype, name=f"res_{i}_{j}")(x)
                acc = y if acc is None else acc + y
            x = acc / num_kernels
        x = nn.leaky_relu(x, LRELU_SLOPE)
        x = Conv1d(1, 7, use_bias=False, time_fold=self._fold(ch),
                   dtype=self.dtype, name="conv_post")(x)
        # waveform output back in f32 for the (f32) STFT losses
        return jnp.tanh(x.astype(jnp.float32))[..., 0]
