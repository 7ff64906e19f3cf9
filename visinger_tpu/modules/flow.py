"""Normalizing flow: residual affine coupling blocks with channel flips.

Parity target: reference ResidualCouplingBlock/-Layer/Flip
(modules/visinger/flow.py:15-95): n_flows x (mean-only affine coupling with a
4-layer WaveNet on the untouched half + channel Flip).  The coupling's
`post` 1x1 conv is zero-initialized so each flow starts as the identity.

Forward (q -> p direction in VISinger): x1' = m + x1 (mean_only => logs = 0,
logdet = 0).  Reverse: x1 = x1' - m.  The VITS spline flow (ConvFlow) is dead
code in the reference and intentionally omitted.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from visinger_tpu.modules.common import Conv1d
from visinger_tpu.modules.wavenet import WaveNet


class ResidualCouplingLayer(nn.Module):
    channels: int
    hidden_channels: int
    kernel_size: int = 5
    dilation_rate: int = 1
    n_layers: int = 4
    gin_channels: int = 0
    mean_only: bool = True
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, x_mask: jax.Array, g: jax.Array | None = None,
                 reverse: bool = False, deterministic: bool = True):
        half = self.channels // 2
        x = x.astype(self.dtype)
        x_mask = x_mask.astype(self.dtype)
        x0, x1 = x[..., :half], x[..., half:]
        h = Conv1d(self.hidden_channels, 1, dtype=self.dtype, name="pre")(x0) * x_mask
        h = WaveNet(self.hidden_channels, self.kernel_size, self.dilation_rate,
                    self.n_layers, self.gin_channels, dtype=self.dtype,
                    use_pallas=self.use_pallas,
                    name="enc")(h, x_mask, g=g, deterministic=deterministic)
        n_out = half * (1 if self.mean_only else 2)
        stats = Conv1d(n_out, 1, kernel_init=nn.initializers.zeros,
                       dtype=self.dtype, name="post")(h) * x_mask
        if self.mean_only:
            m, logs = stats, jnp.zeros_like(stats)
        else:
            m, logs = stats[..., :half], stats[..., half:]
        if not reverse:
            x1 = (m + x1 * jnp.exp(logs)) * x_mask
            logdet = jnp.sum(logs, axis=(1, 2))
            return jnp.concatenate([x0, x1], axis=-1), logdet
        x1 = (x1 - m) * jnp.exp(-logs) * x_mask
        return jnp.concatenate([x0, x1], axis=-1)


class ResidualCouplingBlock(nn.Module):
    channels: int
    hidden_channels: int
    kernel_size: int = 5
    dilation_rate: int = 1
    n_layers: int = 4
    n_flows: int = 4
    gin_channels: int = 0
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, x_mask: jax.Array, g: jax.Array | None = None,
                 reverse: bool = False, deterministic: bool = True) -> jax.Array:
        layers = [
            ResidualCouplingLayer(
                self.channels, self.hidden_channels, self.kernel_size,
                self.dilation_rate, self.n_layers, self.gin_channels,
                mean_only=True, dtype=self.dtype,
                use_pallas=self.use_pallas, name=f"coupling_{i}")
            for i in range(self.n_flows)
        ]
        if not reverse:
            for layer in layers:
                x, _ = layer(x, x_mask, g=g, reverse=False, deterministic=deterministic)
                x = jnp.flip(x, axis=-1)        # channel Flip
        else:
            for layer in reversed(layers):
                x = jnp.flip(x, axis=-1)        # undo Flip first (reverse order)
                x = layer(x, x_mask, g=g, reverse=True, deterministic=deterministic)
        return x
