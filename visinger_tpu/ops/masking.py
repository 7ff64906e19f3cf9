"""Masking and segment-slicing ops (static shapes, jit-safe).

Behavioral parity with reference modules/commons/utils.py:79-100
(sequence_mask, slice_segments, rand_slice_segments), re-expressed channels-
last for TPU and with explicit PRNG keys instead of global torch RNG.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sequence_mask(lengths: jax.Array, max_length: int) -> jax.Array:
    """[B] lengths -> [B, max_length] bool mask (True = valid)."""
    pos = jnp.arange(max_length, dtype=lengths.dtype)
    return pos[None, :] < lengths[:, None]


def slice_segments(x: jax.Array, ids_start: jax.Array, segment_size: int) -> jax.Array:
    """Gather fixed-size time windows per batch element.

    Args:
      x: [B, T, ...] (time is axis 1; trailing axes arbitrary).
      ids_start: [B] int start indices.
      segment_size: static window length.

    Returns: [B, segment_size, ...]
    """

    def one(xb, i0):
        start = (i0,) + (0,) * (xb.ndim - 1)
        sizes = (segment_size,) + xb.shape[1:]
        return jax.lax.dynamic_slice(xb, start, sizes)

    return jax.vmap(one)(x, ids_start)


def rand_slice_segments(
    key: jax.Array,
    x: jax.Array,
    segment_size: int,
    lengths: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Random fixed-size time windows (the GAN-training slice trick).

    Matches reference rand_slice_segments (modules/commons/utils.py:95-100)
    with an improvement: when per-item ``lengths`` are given, windows are
    drawn inside the valid region instead of the padded batch length.
    """
    b, t = x.shape[0], x.shape[1]
    if lengths is None:
        ids_max = jnp.full((b,), t - segment_size + 1, dtype=jnp.int32)
    else:
        ids_max = jnp.maximum(lengths.astype(jnp.int32) - segment_size + 1, 1)
    u = jax.random.uniform(key, (b,))
    ids_start = (u * ids_max.astype(u.dtype)).astype(jnp.int32)
    return slice_segments(x, ids_start, segment_size), ids_start
