"""Checkpoint save/restore with rotation and best-tracking.

Parity target: reference trainer checkpoint policy
(utils/commons/trainer.py:453-492, ckpt_utils.py:8-63): save every
validation on process 0, atomic write, keep the newest ``num_ckpt_keep``,
track best by val_loss; resume picks the newest step.

Implementation: flax.serialization msgpack of the TrainState pytree (params,
both optimizer states, step, PRNG key) — a single file per step, atomic via
.part + os.replace.  Multi-host: only process 0 writes; callers barrier via
the next collective.
"""

from __future__ import annotations

import glob
import json
import os
import re
import threading
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization


def _ckpt_path(work_dir: str, step: int) -> str:
    return os.path.join(work_dir, f"model_ckpt_steps_{step}.msgpack")


def save_checkpoint(work_dir: str, state: Any, num_keep: int = 100,
                    val_loss: float | None = None) -> str | None:
    """Atomic save + rotation + best tracking. Returns the path (or None on
    non-zero hosts)."""
    if jax.process_index() != 0:
        return None
    os.makedirs(work_dir, exist_ok=True)
    step = int(jax.device_get(state.step))
    path = _ckpt_path(work_dir, step)
    blob = serialization.to_bytes(jax.device_get(state))
    tmp = path + ".part"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)

    # rotation: keep newest num_keep
    for old in sorted(all_checkpoints(work_dir), key=_ckpt_step)[:-num_keep]:
        os.remove(old)

    # best tracking
    if val_loss is not None:
        best_fn = os.path.join(work_dir, "best.json")
        best = {"val_loss": float("inf")}
        if os.path.exists(best_fn):
            with open(best_fn) as f:
                best = json.load(f)
        if val_loss < best["val_loss"]:
            with open(best_fn + ".part", "w") as f:
                json.dump({"val_loss": float(val_loss), "step": step}, f)
            os.replace(best_fn + ".part", best_fn)
            with open(os.path.join(work_dir, "model_ckpt_best.msgpack"), "wb") as f:
                f.write(blob)
    return path


class AsyncCheckpointer:
    """Background-thread checkpoint writer (`async_checkpoint: true`).

    The reference saves synchronously inside the train loop
    (utils/commons/trainer.py:453-477), stalling every rank-0 step-loop
    iteration that lands on a save for the full device→host transfer +
    serialization.  Here the step loop only dispatches a device-side copy
    of the state; the transfer, msgpack encode, atomic write, rotation and
    best-tracking all happen on a writer thread.

    Why the copy: the trainer's jitted step donates its input state
    (trainer.py `donate_argnums=(0, 1)`), so a background `device_get` of
    the live buffers would race with XLA reusing them on the next step.  A
    jitted `tree.map(copy)` yields fresh buffers nothing ever donates; the
    snapshot is consistent because jax.Arrays are immutable.

    One save in flight at a time — a second ``save()`` joins the first, so
    a slow write can delay the loop by at most one checkpoint interval.
    Writer-thread errors re-raise on the next ``save()``/``wait()`` rather
    than being swallowed.
    """

    def __init__(self):
        self._thread: threading.Thread | None = None
        self._exc: BaseException | None = None
        self._copy_fn = None

    def save(self, work_dir: str, state: Any, num_keep: int = 100,
             val_loss: float | None = None) -> None:
        if jax.process_index() != 0:
            return
        self.wait()
        if self._copy_fn is None:
            self._copy_fn = jax.jit(
                lambda s: jax.tree.map(jnp.copy, s))
        snap = self._copy_fn(state)

        def run():
            try:
                save_checkpoint(work_dir, snap, num_keep, val_loss)
            except BaseException as e:  # surfaced on next save()/wait()
                self._exc = e

        self._thread = threading.Thread(target=run, name="ckpt-writer",
                                        daemon=True)
        self._thread.start()

    def wait(self) -> None:
        """Join any in-flight write; re-raise its error if it failed."""
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._exc is not None:
            exc, self._exc = self._exc, None
            raise exc


def _ckpt_step(path: str) -> int:
    m = re.search(r"steps_(\d+)\.msgpack$", path)
    return int(m.group(1)) if m else -1


def all_checkpoints(work_dir: str) -> list[str]:
    return [p for p in glob.glob(os.path.join(work_dir, "model_ckpt_steps_*.msgpack"))
            if _ckpt_step(p) >= 0]


def latest_checkpoint(work_dir: str) -> str | None:
    ckpts = sorted(all_checkpoints(work_dir), key=_ckpt_step)
    return ckpts[-1] if ckpts else None


def restore_checkpoint(path: str, target: Any) -> Any:
    """Restore into a template TrainState (shape/dtype-matching pytree)."""
    with open(path, "rb") as f:
        return serialization.from_bytes(target, f.read())


def restore_latest(work_dir: str, target: Any) -> tuple[Any, int]:
    """-> (state, step); (target, 0) when no checkpoint exists."""
    path = latest_checkpoint(work_dir)
    if path is None:
        return target, 0
    state = restore_checkpoint(path, target)
    return state, int(jax.device_get(state.step))


def warm_start(path: str, state: Any) -> Any:
    """Shape-tolerant warm start from another experiment's checkpoint
    (reference load_ckpt, ckpt_utils.py:28-63): overlay every leaf whose
    path and shape match; keep the fresh init elsewhere; step/optimizer
    state stay fresh."""
    from flax.serialization import msgpack_restore
    from flax.traverse_util import flatten_dict, unflatten_dict

    with open(path, "rb") as f:
        raw = msgpack_restore(f.read())

    def overlay(tree: dict, saved: dict, scope: str):
        flat_t = flatten_dict(tree)
        flat_s = flatten_dict(saved)
        n_loaded = 0
        for k, v in flat_t.items():
            sv = flat_s.get(k)
            if sv is not None and np.shape(sv) == np.shape(v):
                flat_t[k] = np.asarray(sv, np.asarray(v).dtype)
                n_loaded += 1
            else:
                print(f"| warm_start skip {scope}/{'/'.join(map(str, k))}"
                      f" (shape {None if sv is None else np.shape(sv)}"
                      f" vs {np.shape(v)})")
        print(f"| warm_start {scope}: {n_loaded}/{len(flat_t)} leaves loaded")
        return unflatten_dict(flat_t)

    params_g = overlay(jax.device_get(state.params_g), raw["params_g"], "gen")
    params_d = overlay(jax.device_get(state.params_d), raw["params_d"], "disc")
    return state.replace(params_g=params_g, params_d=params_d)
