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
    # Route the forward through the Pallas fused-stack kernel
    # (ops/pallas/wavenet_kernel.py).  Init and training always take the XLA
    # path (the fused kernel wins at inference shapes; training also needs
    # dropout).  The kernel is differentiable — custom_vjp with an
    # XLA-recompute backward — so eval-mode applies stay safe under
    # jax.grad (diagnostic tooling differentiates deterministic applies).
    # A/B on a v5e chip (tools/pallas_bench.py): XLA is already at the f32
    # roofline at these shapes, so this is ~parity — kept for bigger configs
    # and as the fusion hook, default off.
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, x_mask: jax.Array, g: jax.Array | None = None,
                 deterministic: bool = True) -> jax.Array:
        """x: [B, T, C]; x_mask: [B, T, 1]; g: [B, 1|T, gin] or None."""
        if (self.use_pallas and not self.is_initializing()
                and self.dilation_rate == 1
                and deterministic
                and (g is None or g.shape[1] == 1)):
            params = {}
            for i in range(self.n_layers):
                params[f"in_{i}"] = self.get_variable("params", f"in_{i}")
                params[f"res_skip_{i}"] = self.get_variable(
                    "params", f"res_skip_{i}")
            if g is not None:
                params["cond_layer"] = self.get_variable("params", "cond_layer")
            return fused_forward_from_params(
                params, x.astype(jnp.float32), x_mask.astype(jnp.float32),
                None if g is None else g.astype(jnp.float32),
                n_layers=self.n_layers)
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


def effective_conv_weight(p: dict) -> jnp.ndarray:
    """Weight-norm Conv1d params -> effective kernel g * v/||v||."""
    v = p["kernel"]
    norm = jnp.sqrt(jnp.sum(v * v, axis=(0, 1)) + 1e-12)
    return v * (p["g"] / norm)


def fused_forward_from_params(params: dict, x, x_mask, g=None,
                              n_layers: int | None = None,
                              t_blk: int = 512):
    """Run the Pallas fused WaveNet kernel from a WaveNet module's params.

    Numerically identical to WaveNet.__call__ in eval mode (validated to
    ~1e-6 in tests/test_pallas.py); differentiable (custom_vjp with an
    XLA-recompute backward), though training uses the XLA module path.

    Args:
      params: the WaveNet module's params dict ({'in_0': .., 'res_skip_0': ..,
        optionally 'cond_layer': ..}).
      x: [B, T, C]; x_mask: [B, T, 1]; g: [B, 1, gin] or None.
    """
    from visinger_tpu.ops.pallas.wavenet_kernel import wavenet_fused_forward

    if n_layers is None:
        n_layers = sum(1 for k in params if k.startswith("in_"))
    c = x.shape[-1]
    w_in = jnp.stack([effective_conv_weight(params[f"in_{i}"])
                      for i in range(n_layers)])
    b_in = jnp.stack([params[f"in_{i}"]["bias"] for i in range(n_layers)])
    w_rs_list, b_rs_list = [], []
    for i in range(n_layers):
        w = effective_conv_weight(params[f"res_skip_{i}"])[0]
        bb = params[f"res_skip_{i}"]["bias"]
        if i == n_layers - 1:  # final C->C skip-only layer -> skip half
            w = jnp.concatenate([jnp.zeros((c, c), w.dtype), w], axis=1)
            bb = jnp.concatenate([jnp.zeros((c,), bb.dtype), bb])
        w_rs_list.append(w)
        b_rs_list.append(bb)
    g_bias = None
    if g is not None and "cond_layer" in params:
        cond = params["cond_layer"]
        w_c = effective_conv_weight(cond)[0]
        g_bias = (g[:, 0] @ w_c + cond["bias"]).reshape(
            g.shape[0], n_layers, 2 * c)
    out = wavenet_fused_forward(
        x, w_in, b_in, jnp.stack(w_rs_list), jnp.stack(b_rs_list),
        g_bias=g_bias, mask=x_mask, t_blk=t_blk)
    return out * x_mask
