"""Multi-host helper unit tests (single-process degenerate paths; real
multi-host requires a pod — the sharding math is what we can check here)."""

import jax
import jax.numpy as jnp
import numpy as np

from visinger_tpu.parallel import make_mesh
from visinger_tpu.parallel.multihost import (
    global_batch_from_local,
    host_batch_slice,
    is_primary,
)


def test_host_batch_slice_single_process():
    sl = host_batch_slice(8)
    assert sl == slice(0, 8)
    assert is_primary()


def test_global_batch_from_local_single_process():
    mesh = make_mesh()
    batch = {"x": np.arange(16, dtype=np.float32).reshape(8, 2)}
    out = global_batch_from_local(batch, mesh)
    assert out["x"].shape == (8, 2)
    np.testing.assert_array_equal(np.asarray(out["x"]), batch["x"])
    # sharded over the data axis
    assert len(out["x"].addressable_shards) == len(jax.devices())
