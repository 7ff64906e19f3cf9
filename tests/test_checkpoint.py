"""Checkpoint save/restore/rotate/best + warm-start + async-writer tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visinger_tpu.models.factory import build_models, init_state, tiny_batch, tiny_config
from visinger_tpu.training.checkpoint import (
    AsyncCheckpointer,
    latest_checkpoint,
    restore_latest,
    save_checkpoint,
    warm_start,
)


def _mk_state(cfg, seed=0):
    batch = tiny_batch(cfg, seed=seed)
    model, disc = build_models(cfg, 40, 96, 64)
    return init_state(cfg, model, disc, batch, seed=seed)


def test_save_restore_rotate_best(tmp_path):
    cfg = tiny_config()
    state = _mk_state(cfg)
    wd = str(tmp_path)
    for step, vl in [(1, 5.0), (2, 3.0), (3, 4.0)]:
        state = state.replace(step=jnp.asarray(step, jnp.int32))
        save_checkpoint(wd, state, num_keep=2, val_loss=vl)
    ckpts = sorted(os.listdir(wd))
    assert "model_ckpt_steps_3.msgpack" in ckpts
    assert "model_ckpt_steps_2.msgpack" in ckpts
    assert "model_ckpt_steps_1.msgpack" not in ckpts  # rotated out
    assert "model_ckpt_best.msgpack" in ckpts         # best at step 2
    assert latest_checkpoint(wd).endswith("steps_3.msgpack")

    template = _mk_state(cfg, seed=1)
    restored, step = restore_latest(wd, template)
    assert step == 3
    a = jax.tree.leaves(restored.params_g)[0]
    b = jax.tree.leaves(state.params_g)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_async_checkpointer_matches_sync(tmp_path):
    """The background writer produces byte-identical checkpoints and the
    same best-tracking as the synchronous path."""
    cfg = tiny_config()
    state = _mk_state(cfg).replace(step=jnp.asarray(5, jnp.int32))
    sync_dir = str(tmp_path / "sync")
    async_dir = str(tmp_path / "async")
    save_checkpoint(sync_dir, state, num_keep=2, val_loss=1.0)
    ac = AsyncCheckpointer()
    ac.save(async_dir, state, num_keep=2, val_loss=1.0)
    ac.wait()
    with open(os.path.join(sync_dir, "model_ckpt_steps_5.msgpack"), "rb") as f:
        a = f.read()
    with open(os.path.join(async_dir, "model_ckpt_steps_5.msgpack"), "rb") as f:
        b = f.read()
    assert a == b
    assert os.path.exists(os.path.join(async_dir, "best.json"))
    assert os.path.exists(os.path.join(async_dir, "model_ckpt_best.msgpack"))


def test_async_checkpointer_serializes_and_rotates(tmp_path):
    """Back-to-back saves queue one behind the other (at most one in
    flight) and rotation/best behave exactly like the sync path."""
    cfg = tiny_config()
    state = _mk_state(cfg)
    wd = str(tmp_path)
    ac = AsyncCheckpointer()
    for step, vl in [(1, 5.0), (2, 3.0), (3, 4.0)]:
        ac.save(wd, state.replace(step=jnp.asarray(step, jnp.int32)),
                num_keep=2, val_loss=vl)
    ac.wait()
    ckpts = sorted(os.listdir(wd))
    assert "model_ckpt_steps_3.msgpack" in ckpts
    assert "model_ckpt_steps_2.msgpack" in ckpts
    assert "model_ckpt_steps_1.msgpack" not in ckpts
    template = _mk_state(cfg, seed=1)
    restored, step = restore_latest(wd, template)
    assert step == 3
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(restored.params_g)[0]),
        np.asarray(jax.tree.leaves(state.params_g)[0]))


def test_async_checkpointer_error_propagates(tmp_path):
    """A writer-thread failure re-raises on wait() instead of disappearing,
    and the checkpointer stays usable afterwards."""
    cfg = tiny_config()
    state = _mk_state(cfg)
    blocker = tmp_path / "blocked"
    blocker.write_text("a file where a directory is needed")
    ac = AsyncCheckpointer()
    ac.save(str(blocker / "sub"), state)  # makedirs fails in the thread
    with pytest.raises(OSError):
        ac.wait()
    ok = str(tmp_path / "ok")
    ac.save(ok, state)
    ac.wait()
    assert latest_checkpoint(ok) is not None


def test_warm_start_shape_tolerant(tmp_path):
    cfg = tiny_config()
    state = _mk_state(cfg)
    state = state.replace(step=jnp.asarray(7, jnp.int32))
    save_checkpoint(str(tmp_path), state, num_keep=2)
    path = latest_checkpoint(str(tmp_path))

    # target with a different vocab: embedding shapes differ, rest matches
    cfg2 = cfg
    batch = tiny_batch(cfg2)
    model2, disc2 = build_models(cfg2, ph_vocab=55, pitch_vocab=96, dur_vocab=64)
    target = init_state(cfg2, model2, disc2, batch, seed=3)
    warmed = warm_start(path, target)
    # matching leaf is copied
    src = state.params_g["frame_prior"]["proj"]["kernel"]
    dst = warmed.params_g["frame_prior"]["proj"]["kernel"]
    np.testing.assert_array_equal(np.asarray(dst), np.asarray(src))
    # mismatched embedding keeps the fresh init (shape differs)
    assert warmed.params_g["text_encoder"]["ph_emb"]["embedding"].shape[0] == 55
    # step stays fresh
    assert int(warmed.step) == 0
