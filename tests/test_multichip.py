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


def test_dp8_recipe_shape_matches_single_device(mesh):
    """DP-8 equivalence at the RECIPE shape (global B=16, T=640 — the bench
    configuration), not just tiny_config: the same program + RNG stream
    must produce matching metrics and updated params whether the batch is
    sharded P('data') over 8 devices or run on one (VERDICT r4 #6a).
    fp32 (bf16 is emulated on CPU); 2 steps so the second step consumes
    DP-updated params."""
    from visinger_tpu.config import load_config
    from visinger_tpu.data.synthetic import synthetic_batch

    cfg = load_config(name="visinger_csd").replace(compute_dtype="float32")
    raw = synthetic_batch(16, 192, 640, vocab=60, pitch_vocab=117,
                          dur_vocab=98, num_linear_bins=cfg.num_linear_bins,
                          hop_size=cfg.hop_size)
    batch = {k: jnp.asarray(v) for k, v in raw.items()}
    model, disc = build_models(cfg, ph_vocab=60, pitch_vocab=117,
                               dur_vocab=98)
    state = init_state(cfg, model, disc, batch)
    train_step = make_train_step(cfg, model, disc)

    sharded = shard_batch(batch, mesh)
    step_dp = jit_train_step(train_step, mesh, donate_state=False)
    state_dp, metrics_dp = step_dp(state, sharded)
    state_dp, metrics_dp = step_dp(state_dp, sharded)

    step_1d = jax.jit(train_step)
    state_1d, metrics_1d = step_1d(state, batch)
    state_1d, metrics_1d = step_1d(state_1d, batch)
    for k in metrics_1d:
        np.testing.assert_allclose(
            float(metrics_dp[k]), float(metrics_1d[k]), rtol=5e-3,
            atol=5e-4, err_msg=k)
    for (kp, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(state_dp.params_g),
            jax.tree_util.tree_leaves_with_path(state_1d.params_g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3,
                                   atol=5e-4, err_msg=str(kp))
