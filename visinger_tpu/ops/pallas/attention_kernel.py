"""Pallas TPU kernel: fused relative-position attention.

Parity target: reference modules/rel_transformer.py:103-254
(MultiHeadAttention with shared ±window relative key/value embeddings) —
the hot op of the three frame-rate transformer stacks (pitch-predictor 6L +
frame-prior 4L + phoneme-predictor 2L at T=640), which the round-4 profile
put at ~34% of the train step with a further ~25% of device time spent on
data formatting around the [B,H,T,T] score tensors
(artifacts/bench_r3/profile_r4_bf16_pair.txt).

TPU-first design (NOT flash attention):
  - At VISinger's sequence lengths (frame buckets <= 1280) a whole row-tile
    of scores [q_blk, T] plus the full K/V for one (batch, head) cell fits
    in VMEM, so no online-softmax machinery is needed — each grid cell
    computes an exact softmax over the full key axis.
  - Heads ride the LANE dimension: callers pack q/k/v as [B, T, H*128]
    (each head zero-padded from d_k to 128 lanes — see
    modules/transformer.py, which folds the padding into the 1x1 projection
    weights), so the kernel's BlockSpec picks head h as a 128-lane slab and
    NO transpose or reshape appears anywhere in the layer.
  - The ±window relative-key bias is built in-kernel from iota offsets and
    a [q_blk, 128] rel-logit tile (q @ emb_rel_k^T) — the [T, T] banded
    bias is never materialized in HBM, replacing the pad/reshape "skew
    trick" of the XLA path (modules/transformer.py band_to_dense).
  - Attention-weight dropout (reference rel_transformer.py:131 drop(p_attn))
    runs in-kernel via the TPU PRNG; the backward kernel re-seeds the same
    per-cell stream and regenerates the identical keep mask.
  - Backward is a second Pallas kernel (full recompute of scores/softmax —
    cheaper than round-tripping [B,H,T,T] probabilities through HBM), with
    dk/dv/demb accumulated across row-tiles in revisited output blocks.

Masking contract: validity is given per batch row as a LENGTH (valid frames
are the contiguous prefix [0, len)) — true for every caller (frame-rate
masks come from sequence_mask; token masks pad only at the tail).  Scores
at invalid query or key positions are set to -1e4 (not -inf), so fully
masked rows softmax to uniform — bit-matching the XLA path's semantics.

Numerics match the XLA path: scores and softmax in f32, probabilities cast
to the compute dtype for the P@V matmul, f32 accumulation everywhere.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
_MASK_VAL = -1e4


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _band_bias(rel, off, window):
    """[q_blk, LANE] rel logits -> banded [q_blk, T] bias via iota select.

    bias[i, j] = rel[i, j - i + window] for |j - i| <= window else 0.
    2*window+1 masked broadcast-adds on the VPU — the band is tiny (9 for
    window 4) and the [T, T] bias never exists outside registers/VMEM.
    """
    bias = jnp.zeros(off.shape, jnp.float32)
    for m in range(2 * window + 1):
        bias = bias + jnp.where(off == m - window, rel[:, m][:, None], 0.0)
    return bias


def _band_cols(p, off, window):
    """[q_blk, T] dense -> [q_blk, LANE] band: out[i, m] = p[i, i + m - w].

    (Row-reductions of diagonal-masked p; inverse of _band_bias.)"""
    lanes = jax.lax.broadcasted_iota(jnp.int32, (p.shape[0], LANE), 1)
    band = jnp.zeros((p.shape[0], LANE), jnp.float32)
    for m in range(2 * window + 1):
        colm = jnp.sum(jnp.where(off == m - window, p, 0.0), axis=1)
        band = band + jnp.where(lanes == m, colm[:, None], 0.0)
    return band


def _softmax_fwd(s):
    """Row softmax in f32, matching jax.nn.softmax numerics."""
    m = jnp.max(s, axis=1, keepdims=True)
    e = jnp.exp(s - m)
    return e / jnp.sum(e, axis=1, keepdims=True)


def _cell_seed(seed_ref, h, qi, n_q, n_h):
    b = pl.program_id(0)
    return seed_ref[0] + (b * n_h + h) * n_q + qi


def _tile_geometry(q_blk, t, qi, length):
    rows = jax.lax.broadcasted_iota(jnp.int32, (q_blk, t), 0) + qi * q_blk
    cols = jax.lax.broadcasted_iota(jnp.int32, (q_blk, t), 1)
    valid = (rows < length) & (cols < length)
    return cols - rows, valid


def _scores(q, k, ekt_ref, off, valid, *, window, scale):
    """Masked score tile [q_blk, T] in f32 (shared by fwd and bwd)."""
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    rel = jax.lax.dot_general(
        q, ekt_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    s = s + _band_bias(rel, off, window)
    return jnp.where(valid, s, _MASK_VAL)


def _dropout_keep(shape, rate):
    """Uniform keep mask from the seeded per-core PRNG (flax semantics:
    keep with prob 1-rate, scale kept values by 1/(1-rate))."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    threshold = jnp.uint32(min(int(rate * (2 ** 32)), 2 ** 32 - 1))
    return bits >= threshold


def _attn_fwd_kernel(seed_ref, len_ref, q_ref, k_ref, v_ref,
                     ekt_ref, evr_ref, out_ref,
                     *, window, scale, rate, deterministic, q_blk, n_h):
    b, h, qi = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    n_q = pl.num_programs(2)
    q = q_ref[0, :, :]
    k = k_ref[0, :, :]
    off, valid = _tile_geometry(q_blk, k.shape[0], qi, len_ref[b])
    s = _scores(q, k, ekt_ref, off, valid, window=window, scale=scale)
    p = _softmax_fwd(s)
    if rate > 0.0 and not deterministic:
        pltpu.prng_seed(_cell_seed(seed_ref, h, qi, n_q, n_h))
        keep = _dropout_keep(p.shape, rate)
        p = jnp.where(keep, p * (1.0 / (1.0 - rate)), 0.0)
    pc = p.astype(v_ref.dtype)
    out = jax.lax.dot_general(
        pc, v_ref[0, :, :], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    band = _band_cols(pc.astype(jnp.float32), off, window)
    out = out + jax.lax.dot_general(
        band.astype(v_ref.dtype), evr_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    out_ref[0, :, :] = out.astype(out_ref.dtype)


def _attn_bwd_kernel(seed_ref, len_ref, q_ref, k_ref, v_ref,
                     ekt_ref, ekr_ref, evt_ref, evr_ref, g_ref,
                     dq_ref, dk_ref, dv_ref, dek_ref, dev_ref,
                     *, window, scale, rate, deterministic, q_blk, n_h):
    b, h, qi = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    n_q = pl.num_programs(2)

    @pl.when(qi == 0)
    def _():
        dk_ref[0, :, :] = jnp.zeros_like(dk_ref[0, :, :])
        dv_ref[0, :, :] = jnp.zeros_like(dv_ref[0, :, :])
        dek_ref[0, :, :] = jnp.zeros_like(dek_ref[0, :, :])
        dev_ref[0, :, :] = jnp.zeros_like(dev_ref[0, :, :])

    q = q_ref[0, :, :]
    k = k_ref[0, :, :]
    v = v_ref[0, :, :]
    g = g_ref[0, :, :].astype(jnp.float32)
    off, valid = _tile_geometry(q_blk, k.shape[0], qi, len_ref[b])
    s = _scores(q, k, ekt_ref, off, valid, window=window, scale=scale)
    p = _softmax_fwd(s)
    dropping = rate > 0.0 and not deterministic
    if dropping:
        pltpu.prng_seed(_cell_seed(seed_ref, h, qi, n_q, n_h))
        keep = _dropout_keep(p.shape, rate)
        pd = jnp.where(keep, p * (1.0 / (1.0 - rate)), 0.0)
    else:
        pd = p
    pd_c = pd.astype(v_ref.dtype).astype(jnp.float32)

    # dv += pd^T @ g ; dev += band(pd)^T @ g
    dv_ref[0, :, :] = dv_ref[0, :, :] + jax.lax.dot_general(
        pd_c, g, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    band_pd = _band_cols(pd_c, off, window)
    dev_ref[0, :, :] = dev_ref[0, :, :] + jax.lax.dot_general(
        band_pd, g, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    # d(pd)[i,j] = g[i]·v[j] + 1[|j-i|<=w] g[i]·ev[j-i+w]
    dpd = jax.lax.dot_general(
        g, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    rel_g = jax.lax.dot_general(
        g, evt_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dpd = dpd + _band_bias(rel_g, off, window)
    if dropping:
        dp = jnp.where(keep, dpd * (1.0 / (1.0 - rate)), 0.0)
    else:
        dp = dpd

    # softmax vjp, then zero the masked branch (cotangent of jnp.where)
    ds = p * (dp - jnp.sum(dp * p, axis=1, keepdims=True))
    ds = jnp.where(valid, ds, 0.0)

    band_ds = _band_cols(ds, off, window)
    dq = jax.lax.dot_general(
        ds, k.astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    dq = dq + jax.lax.dot_general(
        band_ds, ekr_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    dq_ref[0, :, :] = dq
    dk_ref[0, :, :] = dk_ref[0, :, :] + jax.lax.dot_general(
        ds, q.astype(jnp.float32), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    dek_ref[0, :, :] = dek_ref[0, :, :] + jax.lax.dot_general(
        band_ds, q.astype(jnp.float32), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale


def _pick_q_blk(t_pad: int) -> int:
    # single row-tile while the [T, T] f32 score tile stays well under
    # VMEM; beyond that, 128-row tiles (divides any lane-padded length)
    return t_pad if t_pad <= 768 else 128


def _grid_specs(b, t_pad, n_h, q_blk, n_tables):
    """Grid (B, H, T/q_blk) and in_specs for (q, k, v) + n_tables [128,128]
    VMEM tables."""
    n_q = t_pad // q_blk
    # index maps take (*grid_indices, *scalar_prefetch_refs)
    qspec = pl.BlockSpec((1, q_blk, LANE), lambda b_, h, i, *_: (b_, i, h),
                         memory_space=pltpu.VMEM)
    kvspec = pl.BlockSpec((1, t_pad, LANE), lambda b_, h, i, *_: (b_, 0, h),
                          memory_space=pltpu.VMEM)
    table = pl.BlockSpec((LANE, LANE), lambda b_, h, i, *_: (0, 0),
                         memory_space=pltpu.VMEM)
    return (b, n_h, n_q), [qspec, kvspec, kvspec] + [table] * n_tables


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _attn(cfg, q, k, v, ekr, evr, lengths, seed):
    return _attn_pallas_fwd(cfg, q, k, v, ekr, evr, lengths, seed)


def _attn_fwd_rule(cfg, q, k, v, ekr, evr, lengths, seed):
    out = _attn_pallas_fwd(cfg, q, k, v, ekr, evr, lengths, seed)
    return out, (q, k, v, ekr, evr, lengths, seed)


def _attn_bwd_rule(cfg, residuals, g):
    q, k, v, ekr, evr, lengths, seed = residuals
    window, scale, rate, deterministic = cfg
    b, t_pad, hc = q.shape
    n_h = hc // LANE
    q_blk = _pick_q_blk(t_pad)
    grid, in_specs = _grid_specs(b, t_pad, n_h, q_blk, 4)
    in_specs.append(in_specs[0])  # g tiles like q
    qspec, kvspec = in_specs[0], in_specs[1]
    accspec = pl.BlockSpec((1, LANE, LANE), lambda b_, h, i, *_: (b_, 0, h),
                           memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _attn_bwd_kernel, window=window, scale=scale, rate=rate,
        deterministic=deterministic, q_blk=q_blk, n_h=n_h)
    f32 = jnp.float32
    dq, dk, dv, dek, dev = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=in_specs,
            out_specs=[qspec, kvspec, kvspec, accspec, accspec],
        ),
        out_shape=[
            jax.ShapeDtypeStruct(q.shape, f32),
            jax.ShapeDtypeStruct(k.shape, f32),
            jax.ShapeDtypeStruct(v.shape, f32),
            jax.ShapeDtypeStruct((b, LANE, hc), f32),
            jax.ShapeDtypeStruct((b, LANE, hc), f32),
        ],
    )(seed, lengths, q, k, v, ekr.T, ekr, evr.T, evr, g.astype(q.dtype))
    # per-(batch, head) demb partials -> one shared [LANE, LANE] table
    dek = dek.reshape(b, LANE, n_h, LANE).sum(axis=(0, 2))
    dev = dev.reshape(b, LANE, n_h, LANE).sum(axis=(0, 2))
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            dek, dev, None, None)


_attn.defvjp(_attn_fwd_rule, _attn_bwd_rule)


def _attn_pallas_fwd(cfg, q, k, v, ekr, evr, lengths, seed):
    window, scale, rate, deterministic = cfg
    b, t_pad, hc = q.shape
    n_h = hc // LANE
    q_blk = _pick_q_blk(t_pad)
    grid, in_specs = _grid_specs(b, t_pad, n_h, q_blk, 2)
    kernel = functools.partial(
        _attn_fwd_kernel, window=window, scale=scale, rate=rate,
        deterministic=deterministic, q_blk=q_blk, n_h=n_h)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=in_specs,
            out_specs=in_specs[0],
        ),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
    )(seed, lengths, q, k, v, ekr.T, evr)


def rel_attention(q, k, v, emb_rel_k, emb_rel_v, mask, *, window: int,
                  scale: float, dropout_rate: float = 0.0,
                  seed: jax.Array | None = None,
                  deterministic: bool = True) -> jax.Array:
    """Fused relative-position attention.

    Args:
      q, k, v: [B, T, H*128] head-major packed projections — head h lives in
        lanes [h*128, (h+1)*128), with the head dim zero-padded from d_k up
        to 128 (callers fold this padding into the projection weights).
      emb_rel_k / emb_rel_v: [2*window+1, d_k] shared relative embeddings.
      mask: [B, T] validity (1 = real frame), a contiguous prefix per row;
        scores masked to -1e4 where either query or key is invalid, like
        the XLA path.
      seed: int32 scalar array seeding the in-kernel dropout PRNG (required
        when dropout_rate > 0 and not deterministic).

    Returns [B, T, H*128] (dtype of q, f32-accumulated); padded head lanes
    of the output are zero.
    """
    b, t, hc = q.shape
    assert hc % LANE == 0, hc
    m = int(emb_rel_k.shape[0])
    assert m == 2 * window + 1 and m <= LANE
    dk = int(emb_rel_k.shape[1])
    assert dk <= LANE
    t_pad = _ceil_to(t, LANE)
    pad_t = [(0, 0), (0, t_pad - t), (0, 0)]
    qp, kp, vp = (jnp.pad(a, pad_t) for a in (q, k, v))
    lengths = jnp.sum(mask.astype(jnp.int32), axis=1).astype(jnp.int32)
    ekr = jnp.pad(emb_rel_k.astype(jnp.float32),
                  [(0, LANE - m), (0, LANE - dk)])
    evr = jnp.pad(emb_rel_v.astype(jnp.float32),
                  [(0, LANE - m), (0, LANE - dk)])
    if seed is None:
        seed = jnp.zeros((), jnp.int32)
    seed = jnp.reshape(seed.astype(jnp.int32), (1,))
    cfg = (int(window), float(scale), float(dropout_rate), bool(deterministic))
    out = _attn(cfg, qp, kp, vp, ekr, evr, lengths, seed)
    return out[:, :t, :]
