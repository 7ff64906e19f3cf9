"""Multi-host data parallelism helpers.

The reference is single-node only (MASTER_ADDR hardcoded to 127.0.0.1,
utils/commons/trainer.py:503-507).  This module is the multi-host story for
the TPU build (SURVEY.md §5.8): `jax.distributed.initialize()` bootstraps
the cluster; the global mesh spans all chips on all hosts; each host loads a
disjoint shard of every global batch and assembles the global array with
``jax.make_array_from_process_local_data`` — the replacement for the
reference's rank-strided ``batches[rank::world]`` split.

Gradient all-reduce needs no code here: the loss means over the globally
sharded batch make XLA emit psum over ICI within a slice and DCN across
slices.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None):
    """Bootstrap multi-host JAX.  No-ops when single-process (the TPU-pod
    environment variables usually make the arguments unnecessary)."""
    if jax.process_count() > 1:
        return  # already initialized
    try:
        if coordinator_address:
            jax.distributed.initialize(coordinator_address, num_processes,
                                       process_id)
        else:
            jax.distributed.initialize()
    except Exception as e:  # single-host runs land here — fine
        if jax.process_count() == 1:
            return
        raise e


def host_batch_slice(n_items: int) -> slice:
    """This host's slice of a size-n_items global batch (contiguous split;
    all hosts must agree on n_items)."""
    per = n_items // jax.process_count()
    assert per * jax.process_count() == n_items, (
        f"global batch {n_items} not divisible by {jax.process_count()} hosts")
    start = jax.process_index() * per
    return slice(start, start + per)


def global_batch_from_local(local_batch: dict, mesh: Mesh,
                            axis_name: str = "data") -> dict:
    """Assemble per-host local shards into globally sharded jax.Arrays.

    Each host passes its own [B_local, ...] arrays; the result behaves like
    the [B_global, ...] batch sharded P('data') over all chips.
    """
    sharding = NamedSharding(mesh, P(axis_name))

    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(sharding, x)

    return {k: put(v) for k, v in local_batch.items()}


def is_primary() -> bool:
    """Rank-0-style IO gating (replaces the reference's rank checks)."""
    return jax.process_index() == 0
