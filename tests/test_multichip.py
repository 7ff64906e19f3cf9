"""Data-parallel sharding tests on an 8-device virtual CPU mesh — the
multi-chip machinery the reference lacks (SURVEY.md §4 implication (d),
§5.8)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visinger_tpu.models.factory import build_models, init_state, tiny_batch, tiny_config
from visinger_tpu.parallel import jit_train_step, make_mesh, shard_batch
from visinger_tpu.training.train_step import make_train_step


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must force 8 CPU devices"
    return make_mesh()


def test_dp_step_runs_and_matches_replication(mesh):
    cfg = tiny_config()
    batch = tiny_batch(cfg, batch_size=8)
    model, disc = build_models(cfg, ph_vocab=40, pitch_vocab=96, dur_vocab=64)
    state = init_state(cfg, model, disc, batch)
    train_step = make_train_step(cfg, model, disc)

    sharded = shard_batch(batch, mesh)
    step_dp = jit_train_step(train_step, mesh, donate_state=False)
    state_dp, metrics_dp = step_dp(state, sharded)

    # single-device result must match the distributed one (same program, same
    # RNG stream; XLA's psum mean == local mean over the full batch)
    step_1d = jax.jit(train_step)
    state_1d, metrics_1d = step_1d(state, batch)
    for k in metrics_1d:
        np.testing.assert_allclose(
            float(metrics_dp[k]), float(metrics_1d[k]), rtol=2e-3, atol=2e-4)

    # params stay replicated & equal
    leaf_dp = jax.tree.leaves(state_dp.params_g)[0]
    leaf_1d = jax.tree.leaves(state_1d.params_g)[0]
    np.testing.assert_allclose(np.asarray(leaf_dp), np.asarray(leaf_1d),
                               rtol=2e-3, atol=2e-4)


def test_batch_sharding_layout(mesh):
    cfg = tiny_config()
    batch = tiny_batch(cfg, batch_size=8)
    sharded = shard_batch(batch, mesh)
    for k, v in sharded.items():
        shard_shapes = {s.data.shape for s in v.addressable_shards}
        assert len(shard_shapes) == 1
        local = next(iter(shard_shapes))
        assert local[0] == 1, f"{k} not sharded on batch axis: {local}"
