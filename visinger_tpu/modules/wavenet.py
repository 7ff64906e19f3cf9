"""Non-causal WaveNet stack (gated dilated convs with res/skip).

Parity target: reference WaveNet (modules/visinger/encoder.py:130-203) —
per layer: weight-norm dilated conv C->2C, add conditioning slice, fused
tanh*sigmoid gate (:206-213), weight-norm 1x1 res/skip conv; skip outputs
summed; everything masked.  The speaker conditioning is one 1x1 conv
gin -> 2C*L applied once and sliced per layer.

TPU notes: channels-last convs; the gate + residual adds are elementwise and
fuse into the convs under XLA.  A Pallas fused-stack kernel can be slotted in
behind `use_pallas` later without changing parameters.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from visinger_tpu.modules.common import Conv1d


class WaveNet(nn.Module):
    hidden_channels: int
    kernel_size: int = 5
    dilation_rate: int = 1
    n_layers: int = 16
    gin_channels: int = 0
    p_dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, x_mask: jax.Array, g: jax.Array | None = None,
                 deterministic: bool = True) -> jax.Array:
        """x: [B, T, C]; x_mask: [B, T, 1]; g: [B, 1|T, gin] or None."""
        c = self.hidden_channels
        x = x.astype(self.dtype)
        x_mask = x_mask.astype(self.dtype)
        if g is not None:
            g_all = Conv1d(2 * c * self.n_layers, 1, weight_norm=True,
                           dtype=self.dtype, name="cond_layer")(g.astype(self.dtype))
        out = jnp.zeros_like(x)
        drop = nn.Dropout(self.p_dropout)
        for i in range(self.n_layers):
            dilation = self.dilation_rate ** i
            x_in = Conv1d(2 * c, self.kernel_size, dilation=dilation,
                          weight_norm=True, dtype=self.dtype, name=f"in_{i}")(x)
            if g is not None:
                x_in = x_in + g_all[..., i * 2 * c:(i + 1) * 2 * c]
            acts = jnp.tanh(x_in[..., :c]) * jax.nn.sigmoid(x_in[..., c:])
            acts = drop(acts, deterministic=deterministic)
            if i < self.n_layers - 1:
                rs = Conv1d(2 * c, 1, weight_norm=True, dtype=self.dtype,
                            name=f"res_skip_{i}")(acts)
                x = (x + rs[..., :c]) * x_mask
                out = out + rs[..., c:]
            else:
                out = out + Conv1d(c, 1, weight_norm=True, dtype=self.dtype,
                                   name=f"res_skip_{i}")(acts)
        return out * x_mask
