"""Train state pytree + optimizer construction.

Replaces the reference's Trainer-held torch optimizers/schedulers
(tasks/visinger.py:201-227, utils/commons/trainer.py:306-384) with a single
flax.struct pytree: generator and discriminator params, both optax states,
the global step, and the base PRNG key — everything a checkpoint needs.

Optimizers: two AdamW (β=(0.8, 0.99), eps 1e-9; wd 1e-3 gen / 0 disc) with
per-epoch exponential LR decay (γ=0.999875 per epoch — reference
ExponentialLR stepped with the epoch index, tasks/visinger.py:221-227) and
global-norm grad clipping (clip_grad_norm 1.0).
"""

from __future__ import annotations

from typing import Any

import jax
import optax
from flax import struct


@struct.dataclass
class TrainState:
    params_g: Any
    params_d: Any
    opt_state_g: Any
    opt_state_d: Any
    step: jax.Array
    rng: jax.Array


def make_optimizers(cfg, steps_per_epoch: int | None = None
                    ) -> tuple[optax.GradientTransformation, optax.GradientTransformation]:
    # The reference decays LR once per *actual* epoch (ExponentialLR stepped
    # with the epoch index, tasks/visinger.py:221-227).  steps_per_epoch is
    # therefore derived from the real epoch plan by the trainer (the number
    # of batches batch_by_size yields for the corpus) and passed in here;
    # cfg.steps_per_epoch > 0 acts as an explicit override.
    cfg_spe = int(cfg.get("steps_per_epoch", 0) or 0)
    steps_per_epoch = cfg_spe or int(steps_per_epoch or 0) or 280
    # steps_per_epoch arrives in micro-batches; the schedule's count advances
    # once per OPTIMIZER step (with MultiSteps the inner adamw update — and
    # hence its count — only runs at accumulation boundaries), so the
    # per-epoch decay boundary converts to optimizer steps (reference
    # ExponentialLR steps once per epoch of optimizer steps,
    # tasks/visinger.py:221-227 + trainer.py:339,368).
    accum = max(int(cfg.get("accumulate_grad_batches", 1)), 1)
    steps_per_epoch = max(steps_per_epoch // accum, 1)
    sched = optax.exponential_decay(
        init_value=cfg.lr,
        transition_steps=steps_per_epoch,
        decay_rate=cfg.scheduler_gamma,
        staircase=True,
    )
    common = dict(
        b1=cfg.optimizer_adam_beta1,
        b2=cfg.optimizer_adam_beta2,
        eps=cfg.eps,
    )
    opt_g = optax.chain(
        optax.clip_by_global_norm(cfg.clip_grad_norm),
        optax.adamw(sched, weight_decay=cfg.weight_decay, **common),
    )
    opt_d = optax.chain(
        optax.clip_by_global_norm(cfg.clip_grad_norm),
        optax.adamw(sched, weight_decay=cfg.get("disc_weight_decay", 0.0), **common),
    )
    accum = int(cfg.get("accumulate_grad_batches", 1))
    if accum > 1:  # reference trainer.py:339,368 semantics via optax.MultiSteps
        opt_g = optax.MultiSteps(opt_g, accum)
        opt_d = optax.MultiSteps(opt_d, accum)
    return opt_g, opt_d


def create_train_state(cfg, params_g, params_d, rng) -> TrainState:
    import jax.numpy as jnp

    opt_g, opt_d = make_optimizers(cfg)
    # jitted: eager optax init dispatches one zeros-op per parameter leaf,
    # which is pathological through a remote-compile TPU tunnel.
    return TrainState(
        params_g=params_g,
        params_d=params_d,
        opt_state_g=jax.jit(opt_g.init)(params_g),
        opt_state_d=jax.jit(opt_d.init)(params_d),
        step=jnp.zeros((), jnp.int32),
        rng=rng,
    )
