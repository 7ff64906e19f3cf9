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
and writes the valid center.  The K-tap conv is K shifted [T, C] @ [C, 2C]
MXU matmuls.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def wavenet_fused_forward(x: jax.Array, w_in: jax.Array, b_in: jax.Array,
                          w_rs: jax.Array, b_rs: jax.Array,
                          g_bias: jax.Array | None = None,
                          mask: jax.Array | None = None,
                          t_blk: int = 256) -> jax.Array:
    """Fused WaveNet stack forward (skip-sum output, mask applied by caller).

    Args:
      x:     [B, T, C]
      w_in:  [L, K, C, 2C] conv weights
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
    # fold the conv bias into the conditioning bias
    if g_bias is None:
        g_all = jnp.broadcast_to(b_in[None], (b, l, 2 * c)).astype(jnp.float32)
    else:
        g_all = (g_bias + b_in[None]).astype(jnp.float32)
    # res/skip bias folded into the matmul as an augmented input row (the
    # kernel appends a ones column to the gate): rs = [gate, 1] @ [w_rs; b_rs]
    w_rs_aug = jnp.concatenate([w_rs, b_rs[:, None, :]], axis=1)  # [L, C+1, 2C]

    t_blk = min(t_blk, max(t, 8))
    n_tiles = -(-t // t_blk)
    t_padded = n_tiles * t_blk
    x_p = jnp.pad(x.astype(jnp.float32),
                  ((0, 0), (halo, t_padded - t + halo), (0, 0)))
    if mask is None:
        mask = jnp.ones((b, t, 1), jnp.float32)
    mask_p = jnp.pad(jnp.broadcast_to(mask.astype(jnp.float32), (b, t, c)),
                     ((0, 0), (halo, t_padded - t + halo), (0, 0)))

    kernel = functools.partial(_wavenet_aug_kernel, n_layers=l, k=k, c=c,
                               t_blk=t_blk, halo=halo)
    out = pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),                 # x (HBM)
            pl.BlockSpec(memory_space=pltpu.ANY),                 # mask (HBM)
            pl.BlockSpec((1, l, 2 * c), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),                # g bias
            pl.BlockSpec(memory_space=pltpu.ANY),                 # w_in
            pl.BlockSpec(memory_space=pltpu.ANY),                 # w_rs_aug
        ],
        out_specs=pl.BlockSpec((1, t_blk, c), lambda bi, ti: (bi, ti, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t_padded, c), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((t_blk + 2 * halo, c), jnp.float32),       # h
            pltpu.VMEM((t_blk + 2 * halo, c), jnp.float32),       # mask
            pltpu.VMEM((t_blk + 2 * halo, c), jnp.float32),       # skip
            pltpu.VMEM((2, 2, k, c + 1, 2 * c), jnp.float32),     # w slots
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )(x_p, mask_p, g_all, w_in.astype(jnp.float32),
      w_rs_aug.astype(jnp.float32))
    return out[:, :t, :]


def _wavenet_aug_kernel(x_hbm, m_hbm, g_ref, win_hbm, brs_hbm, out_ref,
                        h_ref, m_ref, skip_ref, w_vmem, x_sem, w_sem,
                        *, n_layers: int, k: int, c: int, t_blk: int,
                        halo: int):
    """Res/skip bias rides as an augmented input row (w slot [C+1, 2C],
    ones column appended to the gate); the mask tile re-zeroes padding rows
    every layer, matching the reference's per-layer masking."""
    bi = pl.program_id(0)
    ti = pl.program_id(1)
    tpad = t_blk + 2 * halo

    x_dma = pltpu.make_async_copy(
        x_hbm.at[bi, pl.ds(ti * t_blk, tpad), :], h_ref, x_sem.at[0])
    x_dma.start()
    m_dma = pltpu.make_async_copy(
        m_hbm.at[bi, pl.ds(ti * t_blk, tpad), :], m_ref, x_sem.at[1])
    m_dma.start()

    def dma_w(slot, layer):
        return pltpu.make_async_copy(
            win_hbm.at[layer], w_vmem.at[slot, 0, :, :c, :], w_sem.at[slot, 0])

    def dma_rs(slot, layer):
        return pltpu.make_async_copy(
            brs_hbm.at[layer], w_vmem.at[slot, 1, 0], w_sem.at[slot, 1])

    dma_w(0, 0).start()
    dma_rs(0, 0).start()
    x_dma.wait()
    m_dma.wait()
    skip_ref[:] = jnp.zeros_like(skip_ref)
    ones_col = jnp.ones((tpad, 1), jnp.float32)

    def layer_body(i, _):
        slot = i % 2
        nxt = (i + 1) % 2

        @pl.when(i + 1 < n_layers)
        def _():
            dma_w(nxt, i + 1).start()
            dma_rs(nxt, i + 1).start()

        dma_w(slot, i).wait()
        dma_rs(slot, i).wait()

        h = h_ref[:]
        acc = jnp.zeros((tpad, 2 * c), jnp.float32)
        for tap in range(k):
            shift = tap - (k // 2)
            # pltpu.roll requires non-negative shift; circular => mod tpad
            rolled = pltpu.roll(h, (-shift) % tpad, 0)
            acc = acc + jnp.dot(rolled, w_vmem[slot, 0, tap, :c, :],
                                preferred_element_type=jnp.float32)
        acc = acc + g_ref[0, i][None, :]
        gate = jnp.tanh(acc[:, :c]) * jax.nn.sigmoid(acc[:, c:])
        gate_aug = jnp.concatenate([gate, ones_col], axis=1)      # [tpad, C+1]
        rs = jnp.dot(gate_aug, w_vmem[slot, 1, 0],
                     preferred_element_type=jnp.float32)           # [tpad, 2C]

        @pl.when(i < n_layers - 1)
        def _():
            h_ref[:] = (h + rs[:, :c]) * m_ref[:]

        skip_ref[:] = skip_ref[:] + rs[:, c:]
        return 0

    jax.lax.fori_loop(0, n_layers, layer_body, 0, unroll=False)
    out_ref[0] = skip_ref[halo:halo + t_blk, :]
