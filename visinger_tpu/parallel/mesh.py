"""Device mesh + data-parallel sharding — the TPU-native replacement for the
reference's NCCL DDP stack (utils/commons/{ddp_utils,trainer}.py:497-507,
SURVEY.md §5.8).

Design: a 1-D ``Mesh(('data',))`` over all chips; batches sharded
``P('data', ...)`` on the leading axis, params/optimizer state replicated.
The fused train step is compiled with ``jax.jit`` + NamedSharding constraints
so XLA places the gradient all-reduce *inside* the step, riding ICI (and DCN
across slices) — no process-level allreduce, no barriers, no device moves.

Multi-host: call ``jax.distributed.initialize()`` before building the mesh;
each host feeds its local shard of the global batch (make_array_from_
process_local_data) and gates checkpoint/log IO on ``jax.process_index()==0``
— replacing the reference's rank-0 conventions.
"""

from __future__ import annotations

from typing import Callable

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis_name: str = "data") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Leading-axis sharding for batch pytrees."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh, axis_name: str = "data") -> dict:
    """Place a host-global batch dict onto the mesh, sharded on axis 0."""
    sharding = batch_sharding(mesh, axis_name)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def jit_train_step(
    train_step: Callable,
    mesh: Mesh,
    axis_name: str = "data",
    donate_state: bool = True,
) -> Callable:
    """Compile the fused train step for data parallelism over ``mesh``.

    State (params + opt state + step + rng) is replicated; the batch is
    sharded on its leading axis.  The loss means over the global batch make
    XLA emit the gradient psum over ICI automatically.
    """
    repl = replicated(mesh)
    data = batch_sharding(mesh, axis_name)
    return jax.jit(
        train_step,
        in_shardings=(repl, data),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate_state else (),
    )
