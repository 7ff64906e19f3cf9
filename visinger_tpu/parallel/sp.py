"""Sequence-parallel (time-sharded) synthesis over a device mesh.

The reference has no multi-device inference at all (single-GPU
`inference/visinger.py`); this is TPU-native scale-out for long-score
serving: ONE score's frame axis is sharded ``P(None, 'time')`` across the
mesh, params replicated, and XLA's SPMD partitioner does the rest —
halo exchanges for the convolutional stacks (WaveNet, flow couplings,
HiFi-GAN upsampling), collective (re)shards where the banded-attention
reshapes cross shard boundaries, and a sharded 24 kHz waveform out.

Numerics: identical to single-device because jax's partitionable threefry
generates the same random bits whatever the sharding, and every op here is
sharding-invariant (tested to 2e-4 on an 8-device CPU mesh in
`tests/test_seq_parallel.py`, which dominates conv-order float noise).

Scaling intuition (How-to-Scale-Your-Model recipe): synthesis compute is
O(T) convolutions with tiny halos (receptive fields ≤ 11 per layer), so
time-sharding is embarrassingly parallel except for the score encoder
(token-level, replicated — negligible) — near-linear RTF scaling until
per-shard frames approach the halo width.
"""

from __future__ import annotations

from typing import Callable

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_sp_mesh(devices=None, axis_name: str = "time") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def pad_frames_for_mesh(n_frames: int, mesh: Mesh,
                        axis_name: str = "time") -> int:
    """Frame count rounded up so the time axis divides the mesh."""
    m = mesh.shape[axis_name]
    return -(-n_frames // m) * m


def jit_sp_infer(model, mesh: Mesh, axis_name: str = "time",
                 use_spk_embed: bool = False) -> Callable:
    """Compile the infer branch with the frame axis sharded over ``mesh``.

    Returns ``fn(params, text_tokens, pitch_tokens, dur_tokens, mel2ph,
    spk_id, rng) -> wav [B, T*hop]`` where ``mel2ph`` is [B, T] with T a
    multiple of the mesh size (`pad_frames_for_mesh`); token-level inputs
    and params are replicated, frame-level activations and the waveform ride
    the ``time`` axis.

    ``use_spk_embed=True`` (a ``use_spk_embed: true`` model) adds a
    replicated ``spk_embed [B, D]`` argument before ``rng`` — the voice
    embedding is per-item, not per-frame, so it rides with the params.
    """
    repl = NamedSharding(mesh, P())
    frames = NamedSharding(mesh, P(None, axis_name))

    if use_spk_embed:
        def infer_fn(params, text_tokens, pitch_tokens, dur_tokens, mel2ph,
                     spk_id, spk_embed, rng):
            out = model.apply(
                {"params": params}, text_tokens=text_tokens,
                pitch_tokens=pitch_tokens, dur_tokens=dur_tokens,
                mel2ph=mel2ph, spk_id=spk_id, spk_embed=spk_embed,
                infer=True, deterministic=True, rngs={"sample": rng})
            return out["wav_out"]

        return jax.jit(
            infer_fn,
            in_shardings=(repl, repl, repl, repl, frames, repl, repl, repl),
            out_shardings=frames,
        )

    def infer_fn(params, text_tokens, pitch_tokens, dur_tokens, mel2ph,
                 spk_id, rng):
        out = model.apply(
            {"params": params}, text_tokens=text_tokens,
            pitch_tokens=pitch_tokens, dur_tokens=dur_tokens, mel2ph=mel2ph,
            spk_id=spk_id, infer=True, deterministic=True,
            rngs={"sample": rng})
        return out["wav_out"]

    return jax.jit(
        infer_fn,
        in_shardings=(repl, repl, repl, repl, frames, repl, repl),
        out_shardings=frames,
    )
