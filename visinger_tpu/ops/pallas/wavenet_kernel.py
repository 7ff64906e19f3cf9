"""Pallas TPU kernel: fused gated WaveNet stack.

The reference's hot loop is the 16-layer non-causal WaveNet
(modules/visinger/encoder.py:130-213): per layer a K-wide dilated conv
C->2C, conditioning add, tanh*sigmoid gate, and a 1x1 res/skip conv.  Run
layer-by-layer through XLA this round-trips activations to HBM ~4L times per
step.  This kernel keeps the activation tile and the skip accumulator
resident in VMEM across ALL layers and streams each layer's weights once
(double-buffered DMA overlapped with the matmuls).

Scope (v1):
  - dilation_rate == 1 (VISinger uses 1 everywhere; kernel_size 5)
  - forward only — training keeps the XLA path; the win lands on
    inference/eval (use via modules/wavenet.py `use_pallas`)
  - conditioning as a per-layer bias [B, L, 2C] (speaker-embedding case —
    time-invariant g, which is how VISinger conditions every WaveNet)

Tiling: grid (B, T/t_blk).  Each program DMAs its x tile plus an
L*(K//2)-frame halo on each side (the stack's receptive field), computes all
layers on the padded tile — edge garbage stays inside the shrinking halo —
and writes the valid center.  The K-tap conv is K shifted [T, C] @ [C, C]
MXU matmuls.

Mosaic layout rules shape the data plumbing (learned the hard way —
"Slice shape along dimension 2 must be aligned to tiling (128)"):
  - channels are zero-padded to a 128 multiple (the MXU pads lanes to 128
    anyway, so the extra columns are free compute);
  - the conv's tanh/sigmoid halves ship as SEPARATE [.., C, C] arrays so the
    kernel never slices the lane dimension at C;
  - biases ride in whole-array VMEM inputs indexed per layer (no augmented
    ones-column matmul trick — that made a 193-lane operand).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pad_axis(a: jax.Array, axis: int, size: int) -> jax.Array:
    pad = [(0, 0)] * a.ndim
    pad[axis] = (0, size - a.shape[axis])
    return jnp.pad(a, pad)


def wavenet_fused_forward(x: jax.Array, w_in: jax.Array, b_in: jax.Array,
                          w_rs: jax.Array, b_rs: jax.Array,
                          g_bias: jax.Array | None = None,
                          mask: jax.Array | None = None,
                          t_blk: int = 256) -> jax.Array:
    """Fused WaveNet stack: Pallas forward, XLA-recompute backward.

    Differentiable everywhere via jax.custom_vjp — the backward pass
    re-runs an equivalent XLA implementation under jax.vjp (the two compute
    the same math; parity tested).  Training still routes the XLA module
    path for speed; this makes eval-mode applies safe under jax.grad
    (lockstep/diagnostic tooling differentiates deterministic applies).
    See `_stack_forward_xla` for the reference math.
    """
    if mask is None:
        mask = jnp.ones((*x.shape[:2], 1), jnp.float32)
    return _fused_stack(int(t_blk), x, w_in, b_in, w_rs, b_rs, g_bias, mask)


def _stack_forward_xla(x, w_in, b_in, w_rs, b_rs, g_bias, mask):
    """Pure-XLA mirror of the kernel math (same args, unpadded channels):
    per layer i — K-tap zero-padded conv as shifted matmuls, + b_in[i]
    (+ g_bias[:, i]), tanh*sigmoid gate, 1x1 res/skip matmul; residual
    applied and re-masked for all but the last layer; skips summed."""
    t = x.shape[1]
    l, k = int(w_in.shape[0]), int(w_in.shape[1])
    half = k // 2
    h = x.astype(jnp.float32)
    m = jnp.broadcast_to(mask.astype(jnp.float32), h.shape)
    out = jnp.zeros_like(h)
    for i in range(l):
        xp = jnp.pad(h, ((0, 0), (half, half), (0, 0)))
        x_in = b_in[i][None, None, :]
        if g_bias is not None:
            x_in = x_in + g_bias[:, i][:, None, :]
        for tap in range(k):
            x_in = x_in + jnp.einsum("btc,cd->btd", xp[:, tap:tap + t],
                                     w_in[i, tap])
        c = h.shape[-1]
        gate = jnp.tanh(x_in[..., :c]) * jax.nn.sigmoid(x_in[..., c:])
        rs = jnp.einsum("btc,cd->btd", gate, w_rs[i]) + b_rs[i][None, None, :]
        if i < l - 1:
            h = (h + rs[..., :c]) * m
        out = out + rs[..., c:]
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_stack(t_blk, x, w_in, b_in, w_rs, b_rs, g_bias, mask):
    return _pallas_forward(x, w_in, b_in, w_rs, b_rs, g_bias, mask, t_blk)


def _fused_stack_fwd(t_blk, x, w_in, b_in, w_rs, b_rs, g_bias, mask):
    out = _pallas_forward(x, w_in, b_in, w_rs, b_rs, g_bias, mask, t_blk)
    return out, (x, w_in, b_in, w_rs, b_rs, g_bias, mask)


def _fused_stack_bwd(t_blk, residuals, ct):
    _, vjp = jax.vjp(_stack_forward_xla, *residuals)
    return vjp(ct.astype(jnp.float32))


_fused_stack.defvjp(_fused_stack_fwd, _fused_stack_bwd)


def _pallas_forward(x: jax.Array, w_in: jax.Array, b_in: jax.Array,
                    w_rs: jax.Array, b_rs: jax.Array,
                    g_bias: jax.Array | None, mask: jax.Array,
                    t_blk: int) -> jax.Array:
    """Pallas forward (skip-sum output, mask applied by caller).

    Args:
      x:     [B, T, C]
      w_in:  [L, K, C, 2C] conv weights (tanh half cols [:C], sigmoid [C:])
      b_in:  [L, 2C] conv biases
      w_rs:  [L, C, 2C] res/skip weights; the last layer's skip half is
             taken from columns [C:2C) like every other layer, so callers
             must place the final C->C skip weights there (see the wrapper
             in modules/wavenet.py)
      b_rs:  [L, 2C] res/skip biases
      g_bias: [B, L, 2C] conditioning bias (cond_layer(g) slices) or None
      mask:  [B, T, 1] nonpadding (reference multiplies every layer,
             encoder.py:191; also supplies the virtual zero padding at
             sequence/tile boundaries) — defaults to all-ones

    Returns [B, T, C] float32.
    """
    b, t, c = x.shape
    l, k = int(w_in.shape[0]), int(w_in.shape[1])
    halo = l * (k // 2)
    c_p = -(-c // 128) * 128  # lane-aligned channels; zero pad is inert
    # fold the conv bias into the conditioning bias; split gate halves
    if g_bias is None:
        g_all = jnp.broadcast_to(b_in[None], (b, l, 2 * c)).astype(jnp.float32)
    else:
        g_all = (g_bias + b_in[None]).astype(jnp.float32)
    g_a = _pad_axis(g_all[..., :c], 2, c_p)              # [B, L, Cp]
    g_b = _pad_axis(g_all[..., c:], 2, c_p)
    w_in = w_in.astype(jnp.float32)
    win_a = _pad_axis(_pad_axis(w_in[..., :c], 3, c_p), 2, c_p)  # [L,K,Cp,Cp]
    win_b = _pad_axis(_pad_axis(w_in[..., c:], 3, c_p), 2, c_p)
    w_rs = w_rs.astype(jnp.float32)
    wrs_a = _pad_axis(_pad_axis(w_rs[..., :c], 2, c_p), 1, c_p)  # [L,Cp,Cp]
    wrs_b = _pad_axis(_pad_axis(w_rs[..., c:], 2, c_p), 1, c_p)
    b_rs = b_rs.astype(jnp.float32)
    brs_a = _pad_axis(b_rs[..., :c], 1, c_p)             # [L, Cp]
    brs_b = _pad_axis(b_rs[..., c:], 1, c_p)

    t_blk = min(t_blk, max(t, 8))
    n_tiles = -(-t // t_blk)
    t_padded = n_tiles * t_blk
    x_p = jnp.pad(x.astype(jnp.float32),
                  ((0, 0), (halo, t_padded - t + halo), (0, c_p - c)))
    if mask is None:
        mask = jnp.ones((b, t, 1), jnp.float32)
    mask_p = jnp.pad(jnp.broadcast_to(mask.astype(jnp.float32), (b, t, c)),
                     ((0, 0), (halo, t_padded - t + halo), (0, c_p - c)))

    kernel = functools.partial(_wavenet_kernel, n_layers=l, k=k,
                               t_blk=t_blk, halo=halo)
    vmem = pltpu.VMEM
    out = pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),                 # x
            pl.BlockSpec(memory_space=pl.ANY),                 # mask
            pl.BlockSpec((1, l, c_p), lambda bi, ti: (bi, 0, 0),
                         memory_space=vmem),                      # g_a
            pl.BlockSpec((1, l, c_p), lambda bi, ti: (bi, 0, 0),
                         memory_space=vmem),                      # g_b
            pl.BlockSpec(memory_space=pl.ANY),                 # win_a
            pl.BlockSpec(memory_space=pl.ANY),                 # win_b
            pl.BlockSpec(memory_space=pl.ANY),                 # wrs_a
            pl.BlockSpec(memory_space=pl.ANY),                 # wrs_b
            pl.BlockSpec((l, c_p), lambda bi, ti: (0, 0),
                         memory_space=vmem),                      # brs_a
            pl.BlockSpec((l, c_p), lambda bi, ti: (0, 0),
                         memory_space=vmem),                      # brs_b
        ],
        out_specs=pl.BlockSpec((1, t_blk, c_p), lambda bi, ti: (bi, ti, 0),
                               memory_space=vmem),
        out_shape=jax.ShapeDtypeStruct((b, t_padded, c_p), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((t_blk + 2 * halo, c_p), jnp.float32),     # h
            pltpu.VMEM((t_blk + 2 * halo, c_p), jnp.float32),     # mask
            pltpu.VMEM((t_blk + 2 * halo, c_p), jnp.float32),     # skip
            pltpu.VMEM((2, k, c_p, c_p), jnp.float32),            # win_a slots
            pltpu.VMEM((2, k, c_p, c_p), jnp.float32),            # win_b slots
            pltpu.VMEM((2, c_p, c_p), jnp.float32),               # wrs_a slots
            pltpu.VMEM((2, c_p, c_p), jnp.float32),               # wrs_b slots
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2, 4)),
        ],
    )(x_p, mask_p, g_a, g_b, win_a, win_b, wrs_a, wrs_b, brs_a, brs_b)
    return out[:, :t, :c]


def _wavenet_kernel(x_hbm, m_hbm, ga_ref, gb_ref, wina_hbm, winb_hbm,
                    wrsa_hbm, wrsb_hbm, brsa_ref, brsb_ref, out_ref,
                    h_ref, m_ref, skip_ref, wina_v, winb_v, wrsa_v, wrsb_v,
                    x_sem, w_sem, *, n_layers: int, k: int, t_blk: int,
                    halo: int):
    """Weights double-buffer through VMEM slots (4 DMA streams per layer);
    the mask tile re-zeroes padding rows every layer, matching the
    reference's per-layer masking."""
    bi = pl.program_id(0)
    ti = pl.program_id(1)
    tpad = t_blk + 2 * halo

    x_dma = pltpu.make_async_copy(
        x_hbm.at[bi, pl.ds(ti * t_blk, tpad), :], h_ref, x_sem.at[0])
    x_dma.start()
    m_dma = pltpu.make_async_copy(
        m_hbm.at[bi, pl.ds(ti * t_blk, tpad), :], m_ref, x_sem.at[1])
    m_dma.start()

    def w_dmas(slot, layer):
        return [
            pltpu.make_async_copy(wina_hbm.at[layer], wina_v.at[slot],
                                  w_sem.at[slot, 0]),
            pltpu.make_async_copy(winb_hbm.at[layer], winb_v.at[slot],
                                  w_sem.at[slot, 1]),
            pltpu.make_async_copy(wrsa_hbm.at[layer], wrsa_v.at[slot],
                                  w_sem.at[slot, 2]),
            pltpu.make_async_copy(wrsb_hbm.at[layer], wrsb_v.at[slot],
                                  w_sem.at[slot, 3]),
        ]

    for dma in w_dmas(0, 0):
        dma.start()
    x_dma.wait()
    m_dma.wait()
    skip_ref[:] = jnp.zeros_like(skip_ref)

    def layer_body(i, _):
        slot = i % 2
        nxt = (i + 1) % 2

        @pl.when(i + 1 < n_layers)
        def _():
            for dma in w_dmas(nxt, i + 1):
                dma.start()

        for dma in w_dmas(slot, i):
            dma.wait()

        h = h_ref[:]
        acc_a = jnp.zeros_like(h)
        acc_b = jnp.zeros_like(h)
        for tap in range(k):
            shift = tap - (k // 2)
            # pltpu.roll requires non-negative shift; circular => mod tpad
            rolled = pltpu.roll(h, (-shift) % tpad, 0)
            acc_a = acc_a + jnp.dot(rolled, wina_v[slot, tap],
                                    preferred_element_type=jnp.float32)
            acc_b = acc_b + jnp.dot(rolled, winb_v[slot, tap],
                                    preferred_element_type=jnp.float32)
        gate = jnp.tanh(acc_a + ga_ref[0, i][None, :]) \
            * jax.nn.sigmoid(acc_b + gb_ref[0, i][None, :])
        res = jnp.dot(gate, wrsa_v[slot],
                      preferred_element_type=jnp.float32) \
            + brsa_ref[i][None, :]
        skip = jnp.dot(gate, wrsb_v[slot],
                       preferred_element_type=jnp.float32) \
            + brsb_ref[i][None, :]

        @pl.when(i < n_layers - 1)
        def _():
            h_ref[:] = (h + res) * m_ref[:]

        skip_ref[:] = skip_ref[:] + skip
        return 0

    jax.lax.fori_loop(0, n_layers, layer_body, 0, unroll=False)
    out_ref[0] = skip_ref[halo:halo + t_blk, :]
