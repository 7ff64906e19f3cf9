"""Common linen building blocks, channels-last ([B, T, C]) for TPU.

Re-implements the primitives the reference builds on torch.nn:
  - Conv1d / ConvTranspose1d with torch-compatible "same" padding semantics
    (modules/commons/utils.py:109-110 get_padding)
  - explicit weight normalization (g * v / ||v||) replacing
    nn.utils.weight_norm (PyTorch C++ internals)
  - channel LayerNorm (modules/rel_transformer.py:24-42, eps 1e-4)
  - scaled embedding init N(0, H^-0.5) with zeroed padding row
    (modules/commons/utils.py:71-76)
  - sinusoidal positions from the nonpadding cumsum
    (modules/rel_transformer.py:45-100)
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

LRELU_SLOPE = 0.1


def torch_conv_pad(kernel_size: int, dilation: int = 1) -> int:
    """Reference get_padding: length-preserving pad for odd kernels."""
    return (kernel_size * dilation - dilation) // 2


def _norm_over_vector(v: jax.Array) -> jax.Array:
    """L2 norm over all axes except the last (out-features)."""
    axes = tuple(range(v.ndim - 1))
    return jnp.sqrt(jnp.sum(v * v, axis=axes) + 1e-12)


# ---------------------------------------------------------------------------
# torch-parity default initializers.
#
# The reference leaves most convs/linears on torch defaults:
# kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in)) for the kernel and
# U(+-1/sqrt(fan_in)) for the bias (torch nn/modules/conv.py
# reset_parameters).  flax's lecun_normal is 1.73x wider AND unbounded —
# measured consequence: our posterior logs_q at init reached +-10 vs
# torch's +-4, and exp(logs_q) turned that into z_q ~ 1e9, the step-25 KL
# spike (~1e10) and a permanently imbalanced GAN.  Matching the init
# distribution is therefore a correctness issue for trajectory parity, not
# a style choice.
#
# NOTE the reference decoder's `init_weights` (N(0,0.01), decoder.py:35,79)
# is a silent no-op: it mutates the `.weight` tensor of already
# weight-normed convs, which the weight_norm pre-hook recomputes from
# weight_g/weight_v on the first forward — so the EFFECTIVE reference init
# for HiFi-GAN convs is the construction-time kaiming_uniform, which is
# what these defaults give (verified empirically against torch).
# ---------------------------------------------------------------------------

def torch_kernel_init(key, shape, dtype=jnp.float32):
    """U(+-1/sqrt(fan_in)) with fan_in = prod(shape[:-1]) — matches torch
    Conv1d/Conv2d/Linear default for our [*, in, out] kernel layouts."""
    bound = float(np.prod(shape[:-1])) ** -0.5
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_convt_kernel_init(key, shape, dtype=jnp.float32):
    """ConvTranspose default: torch computes fan_in over dim-1 (out) and k
    for its [in, out, k] weight; ours is [k, in, out] -> fan = k * out."""
    bound = float(shape[0] * shape[-1]) ** -0.5
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_bias_init(fan_in: int) -> Callable:
    bound = float(fan_in) ** -0.5

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def spectral_normalize(w: jax.Array, n_iters: int = 5) -> jax.Array:
    """Stateless spectral normalization: w / sigma_max(w).

    The torch wrapper persists the power-iteration vector u across steps
    (one iteration/step); here u restarts from a fixed vector with
    ``n_iters`` iterations under stop_gradient — same normalization without
    mutable state inside jit (deviation documented; reference default is
    weight_norm anyway, config/models/visinger.yaml:46).
    """
    mat = w.reshape(-1, w.shape[-1])
    u = jnp.ones((mat.shape[0],), w.dtype) / np.sqrt(mat.shape[0])
    for _ in range(n_iters):
        v = mat.T @ u
        v = v / jnp.maximum(jnp.linalg.norm(v), 1e-12)
        u = mat @ v
        u = u / jnp.maximum(jnp.linalg.norm(u), 1e-12)
    sigma = jax.lax.stop_gradient(u @ mat @ v)
    return w / jnp.maximum(sigma, 1e-12)


def _grouped_conv_stacked(x: jax.Array, w: jax.Array, groups: int,
                          stride: int, dilation: int, pad: int) -> jax.Array:
    """Grouped 1-D conv as tap-stacked strided slices + one block einsum.

    Exact same math and parameter layout as
    ``conv_general_dilated(feature_group_count=groups)`` (XLA grouped-conv
    output channels are group-major), but lowers to dense slice/stack +
    dot_general: every backward op is a matmul or a zero-pad — no
    scatter-add and no per-group conv decomposition (the native grouped
    conv's backward measured 40 ms/step at B=4 in the MSD, the largest
    single op group in the train-step trace).

    x: [B, T, Cin]; w: [k, Cin/groups, Cout] -> [B, Tout, Cout].
    """
    b, t, c_in = x.shape
    k, c_ing, c_out = w.shape
    c_outg = c_out // groups
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))
    t_out = (t + 2 * pad - dilation * (k - 1) - 1) // stride + 1
    span = (t_out - 1) * stride + 1
    taps = [jax.lax.slice(xp, (0, tap * dilation, 0),
                          (b, tap * dilation + span, c_in),
                          (1, stride, 1))
            for tap in range(k)]
    cols = jnp.stack(taps, axis=2)                    # [B, Tout, k, Cin]
    cols = cols.reshape(b, t_out, k, groups, c_ing)
    w_g = w.reshape(k, c_ing, groups, c_outg)
    y = jnp.einsum("btkgc,kcgd->btgd", cols, w_g,
                   preferred_element_type=x.dtype)
    return y.reshape(b, t_out, c_out)


def _time_folded_conv(x: jax.Array, w: jax.Array, dilation: int,
                      fold: int) -> jax.Array:
    """Small-channel SAME conv as a stride-``fold`` conv producing ``fold``
    consecutive outputs' channels per step.

    The decoder tail runs convs at 16-32 channels over T ~ 200k samples;
    lowered naively those fill <16 of the MXU's 128 lanes (measured 1.5-13
    TF/s in the synthesis trace).  Grouping f consecutive output positions
    into the channel dim makes the op a dense [w_len*C_in] x [f*C_out]
    matmul (both >=128 at f = 128/C): kernel W'[i + off_j + r, cin,
    i*C_out + co] = W[j, cin, co] with off_j = (j - (k-1)/2)*d, window
    w_len = f + 2r, r = (k-1)/2*d, stride f, padding (r, r).  FLOPs grow by
    w_len/k (the window is dense over the f output slots).  Identical math /
    identical params; ~1e-7 float reassociation only.

    Measured on the TPU it LOSES (0.8x, tools/ab_decoder_lowering.py):
    XLA:TPU's native lowering of the small-channel convs is already good —
    kept as a flag-gated option, default off.
    """
    b, t, c_in = x.shape
    k, _, c_out = w.shape
    r = (k - 1) // 2 * dilation
    f = fold
    pad_t = (-t) % f
    if pad_t:
        # zero-padding the tail == the SAME-conv zero pad; sliced off below
        x = jnp.pad(x, ((0, 0), (0, pad_t), (0, 0)))
    t_p = t + pad_t
    w_len = f + 2 * r
    # Assemble W' with ONE einsum against a precomputed one-hot placement
    # tensor (a Python loop of f*k traced dynamic-update-slices lengthened
    # the already minutes-long remote compiles).  P[j, i, i + off_j + r] = 1;
    # within a fold slot i the tap positions are distinct, so the j-sum is
    # pure selection, never accumulation.
    half = (k - 1) // 2
    place = np.zeros((k, f, w_len), w.dtype)
    for j in range(k):
        off = (j - half) * dilation
        place[j, np.arange(f), np.arange(f) + off + r] = 1.0
    wbig = jnp.einsum("jiw,jco->wcio", jnp.asarray(place), w)
    wbig = wbig.reshape(w_len, c_in, f * c_out)
    y = jax.lax.conv_general_dilated(
        x, wbig, window_strides=(f,), padding=[(r, r)],
        dimension_numbers=("NWC", "WIO", "NWC"))
    y = y.reshape(b, t_p, c_out)
    return y[:, :t] if pad_t else y


class Conv1d(nn.Module):
    """1-D convolution, NWC layout, torch-Conv1d-compatible defaults.

    ``weight_norm=True`` uses the explicit g*v/||v|| parameterization with
    g initialized to ||v|| so the initial function equals the plain conv —
    matching torch.nn.utils.weight_norm semantics.

    ``time_fold > 1`` switches to the MXU-dense time-folded lowering (see
    _time_folded_conv) — same params, same math; requires stride 1,
    groups 1, odd kernel, default padding.
    """

    features: int
    kernel_size: int = 1
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True
    weight_norm: bool = False
    spectral_norm: bool = False
    padding: int | None = None          # None -> torch same-length padding
    kernel_init: Callable = torch_kernel_init
    dtype: jnp.dtype = jnp.float32
    # grouped-conv lowering: "native" = XLA feature_group_count,
    # "stack" = tap-stacked strided slices + block einsum (identical math,
    # same params; built because the native grouped conv's BACKWARD was the
    # single largest op group in the train-step trace — see
    # _grouped_conv_stacked)
    grouped_impl: str = "native"
    time_fold: int = 1

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_ch = x.shape[-1]
        if in_ch % self.groups != 0:
            raise ValueError(
                f"Conv1d: in_channels {in_ch} not divisible by groups "
                f"{self.groups}")
        kshape = (self.kernel_size, in_ch // self.groups, self.features)
        v = self.param("kernel", self.kernel_init, kshape)
        if self.spectral_norm:
            w = spectral_normalize(v)
        elif self.weight_norm:
            g = self.param("g", lambda _key: _norm_over_vector(v))
            w = v * (g / _norm_over_vector(v))
        else:
            w = v
        pad = self.padding
        if pad is None:
            pad = torch_conv_pad(self.kernel_size, self.dilation)
        if self.time_fold > 1:
            # preconditions raise (not assert: python -O strips asserts and a
            # violating caller would silently compute wrong outputs)
            if not (self.groups == 1 and self.stride == 1
                    and self.kernel_size % 2 == 1
                    and pad == torch_conv_pad(self.kernel_size, self.dilation)):
                raise ValueError(
                    "Conv1d(time_fold>1) requires stride=1, groups=1, an odd "
                    "kernel, and default same-length padding; got "
                    f"stride={self.stride} groups={self.groups} "
                    f"kernel={self.kernel_size} padding={pad}")
            y = _time_folded_conv(x.astype(self.dtype), w.astype(self.dtype),
                                  self.dilation, self.time_fold)
        elif self.groups > 1 and self.grouped_impl == "stack":
            y = _grouped_conv_stacked(
                x.astype(self.dtype), w.astype(self.dtype), self.groups,
                self.stride, self.dilation, pad)
        else:
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype),
                w.astype(self.dtype),
                window_strides=(self.stride,),
                padding=[(pad, pad)],
                rhs_dilation=(self.dilation,),
                dimension_numbers=("NWC", "WIO", "NWC"),
                feature_group_count=self.groups,
            )
        if self.use_bias:
            b = self.param(
                "bias",
                torch_bias_init((in_ch // self.groups) * self.kernel_size),
                (self.features,))
            y = y + b.astype(self.dtype)
        return y


def _polyphase_specs(k: int, u: int, p: int):
    """Static polyphase decomposition of a stride-``u`` transposed conv.

    Output index n = q*u + r.  With torch ConvTranspose1d semantics
    (y[n] = sum_m x[m] * W[..., j], j = n + p - m*u, j in [0, k)), phase r
    reads tap j = d*u + rho at input offset o = a - d, where (a, rho) =
    divmod(r + p, u) and d in [0, ceil((k - rho)/u)).  Returns the per-phase
    (a, rho, D) triples plus the tap window [o_lo, o_hi] they jointly span.
    """
    specs = []
    for r in range(u):
        a, rho = divmod(r + p, u)
        n_taps = -(-(k - rho) // u)
        specs.append((a, rho, n_taps))
    o_lo = min(a - (d - 1) for a, _, d in specs)
    o_hi = max(a for a, _, _ in specs)
    return specs, o_lo, o_hi


def polyphase_upsample(x: jax.Array, w: jax.Array, u: int,
                       p: int) -> jax.Array:
    """Transposed conv as a stride-1 conv to ``u*C_out`` channels followed by
    a depth-to-space reshape.

    ``w`` is the torch-tap-order kernel [k, C_in, C_out] (same params as the
    lhs-dilated formulation).  The lhs-dilated conv multiplies against the
    u-1 inserted zeros between samples — k MACs/output; this formulation
    touches only the <= ceil(k/u)+1 taps that are actually nonzero for each
    output phase, a ~2.3-2.8x FLOP cut at the VISinger decoder shapes
    (k=11,u=5 / k=7,u=3 / k=4,u=2) and a single dense [C_in -> u*C_out]
    MXU matmul per tap instead of a sparse one.
    """
    k, in_ch, out_ch = w.shape
    specs, o_lo, o_hi = _polyphase_specs(k, u, p)
    n_w = o_hi - o_lo + 1
    # Kbig[o - o_lo, cin, r*C_out + cout] = W[d*u + rho, cin, cout], o = a - d
    cols = []
    for a, rho, n_taps in specs:
        taps = jnp.zeros((n_w, in_ch, out_ch), w.dtype)
        for d in range(n_taps):
            taps = taps.at[a - d - o_lo].set(w[d * u + rho])
        cols.append(taps)
    kbig = jnp.concatenate(cols, axis=-1)  # [n_w, C_in, u*C_out]
    y = jax.lax.conv_general_dilated(
        x, kbig, window_strides=(1,),
        padding=[(-o_lo, o_hi)],
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    b, t = x.shape[0], x.shape[1]
    # [B, T, u*C_out] -> [B, T*u, C_out]: phase r is the fast axis of the
    # channel dim (r*C_out + cout), so a contiguous reshape interleaves it.
    return y.reshape(b, t * u, out_ch)


class ConvTranspose1d(nn.Module):
    """Transposed 1-D conv matching torch.ConvTranspose1d(k, stride=u,
    padding=(k-u)//2): output length = T * u.

    Two mathematically identical formulations (same params either way):
    the lhs-dilated conv (default) or ``polyphase`` — stride-1 conv to
    u*C_out channels + depth-to-space, skipping the inserted-zero MACs.
    Measured on the TPU (tools/ab_decoder_lowering.py, one process):
    polyphase is 0.70x at synthesis shapes — XLA:TPU already lowers the
    lhs-dilated conv efficiently and the per-step polyphase kernel build
    adds overhead — so the default stays lhs-dilated.
    """

    features: int
    kernel_size: int
    stride: int
    use_bias: bool = True
    weight_norm: bool = True
    kernel_init: Callable = torch_convt_kernel_init
    polyphase: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_ch = x.shape[-1]
        k, u = self.kernel_size, self.stride
        p = (k - u) // 2
        kshape = (k, in_ch, self.features)
        v = self.param("kernel", self.kernel_init, kshape)
        if self.weight_norm:
            g = self.param("g", lambda _key: _norm_over_vector(v))
            w = v * (g / _norm_over_vector(v))
        else:
            w = v
        if self.polyphase:
            y = polyphase_upsample(x.astype(self.dtype), w.astype(self.dtype),
                                   u, p)
        else:
            # transposed conv == lhs-dilated conv with flipped kernel
            wf = jnp.flip(w, axis=0)
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype),
                wf.astype(self.dtype),
                window_strides=(1,),
                padding=[(k - 1 - p, k - 1 - p)],
                lhs_dilation=(u,),
                dimension_numbers=("NWC", "WIO", "NWC"),
            )
        if self.use_bias:
            b = self.param("bias", torch_bias_init(k * self.features),
                           (self.features,))
            y = y + b.astype(self.dtype)
        return y


class Conv2dP(nn.Module):
    """2-D conv (NHWC), kernel (kh, 1), torch-compatible pad — the period-
    discriminator conv (modules/discriminator.py:20-26)."""

    features: int
    kernel_h: int
    stride_h: int = 1
    weight_norm: bool = True
    spectral_norm: bool = False
    kernel_init: Callable = torch_kernel_init
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_ch = x.shape[-1]
        kshape = (self.kernel_h, 1, in_ch, self.features)
        v = self.param("kernel", self.kernel_init, kshape)
        if self.spectral_norm:
            w = spectral_normalize(v)
        elif self.weight_norm:
            g = self.param("g", lambda _key: _norm_over_vector(v))
            w = v * (g / _norm_over_vector(v))
        else:
            w = v
        pad_h = torch_conv_pad(self.kernel_h, 1)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            w.astype(self.dtype),
            window_strides=(self.stride_h, 1),
            padding=[(pad_h, pad_h), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        b = self.param("bias", torch_bias_init(self.kernel_h * in_ch),
                       (self.features,))
        return y + b.astype(self.dtype)


class ChannelLayerNorm(nn.Module):
    """LayerNorm over the channel axis, eps 1e-4 (rel_transformer.py:24-42).

    In channels-last layout this is a standard last-axis LayerNorm.
    Statistics are computed in f32 regardless of input dtype (bf16-safe)."""

    eps: float = 1e-4

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        gamma = self.param("gamma", nn.initializers.ones, (c,))
        beta = self.param("beta", nn.initializers.zeros, (c,))
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        return (y * gamma + beta).astype(x.dtype)


def embedding_init(key, shape, dtype=jnp.float32):
    """N(0, H^-0.5) with zeroed padding row 0 (commons/utils.py:71-76)."""
    h = shape[-1]
    w = jax.random.normal(key, shape, dtype) * (h ** -0.5)
    return w.at[0].set(0.0)


class TokenEmbedding(nn.Module):
    """Embedding with padding_idx=0 zero row and N(0, H^-0.5) init."""

    vocab_size: int
    features: int

    @nn.compact
    def __call__(self, ids: jax.Array) -> jax.Array:
        table = self.param("embedding", embedding_init, (self.vocab_size, self.features))
        return jnp.take(table, ids, axis=0)


def sinusoidal_table(num_positions: int, dim: int) -> np.ndarray:
    """tensor2tensor-style sin/cos table with zeroed row 0 (padding).

    Matches SinusoidalPositionalEmbedding.get_embedding
    (rel_transformer.py:59-76): concat(sin, cos) halves, not interleaved.
    """
    half = dim // 2
    scale = math.log(10000) / (half - 1)
    freqs = np.exp(np.arange(half, dtype=np.float64) * -scale)
    ang = np.arange(num_positions, dtype=np.float64)[:, None] * freqs[None, :]
    emb = np.concatenate([np.sin(ang), np.cos(ang)], axis=1)
    if dim % 2 == 1:
        emb = np.concatenate([emb, np.zeros((num_positions, 1))], axis=1)
    emb[0, :] = 0.0
    return emb.astype(np.float32)


def positional_embedding(nonpadding: jax.Array, dim: int) -> jax.Array:
    """[B, T] mask -> [B, T, dim] sinusoidal embeddings.

    Positions are cumsum of the nonpadding mask (padding gets position 0 ->
    all-zero embedding) — rel_transformer.py:78-100 semantics.  Computed
    in-graph (no [T, dim] table constant; only the [dim/2] freq vector is
    inlined) to keep HLO small.
    """
    half = dim // 2
    scale = math.log(10000) / (half - 1)
    freqs = jnp.asarray(np.exp(np.arange(half) * -scale).astype(np.float32))
    mask = nonpadding.astype(jnp.int32)
    positions = jnp.cumsum(mask, axis=1) * mask
    ang = positions.astype(jnp.float32)[..., None] * freqs
    emb = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 0), (0, 1)))
    return emb * (positions != 0)[..., None]
