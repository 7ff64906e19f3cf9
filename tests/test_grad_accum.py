"""Gradient-accumulation semantics (reference trainer.py:339,368).

With accumulate_grad_batches = k:
  - parameters only move at optimizer-step boundaries (every k micro-batches);
  - step-indexed gates/schedules (disc_start_steps, disc_interval, KL warm-up)
    count OPTIMIZER steps (state.step // k), like the reference's global_step
    which advances once per optimizer step;
  - one optimizer step over k identical micro-batches equals one accum=1 step
    on that batch (MultiSteps averages the accumulated grads, so identical
    micro-grads average to themselves).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visinger_tpu.models.factory import (
    build_models,
    init_state,
    tiny_batch,
    tiny_config,
)
from visinger_tpu.training.train_step import make_train_step


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    batch = tiny_batch(cfg)
    model, disc = build_models(cfg, ph_vocab=40, pitch_vocab=96, dur_vocab=64)
    return cfg, batch, model, disc


def _max_delta(a, b):
    return max(
        float(jnp.abs(x - y).max())
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
    )


def test_accum2_matches_accum1_on_identical_microbatches(setup):
    """Two accum=2 micro-steps on the SAME batch with the SAME rng must land
    exactly where one accum=1 step lands (grad average == grad)."""
    cfg, batch, model, disc = setup
    cfg2 = cfg.replace(accumulate_grad_batches=2)

    s1 = init_state(cfg, model, disc, batch)
    s2 = init_state(cfg2, model, disc, batch)
    step1 = jax.jit(make_train_step(cfg, model, disc))
    step2 = jax.jit(make_train_step(cfg2, model, disc))

    ref, _ = step1(s1, batch)

    mid, _ = step2(s2, batch)
    # no optimizer step yet: params must be EXACTLY unchanged
    assert _max_delta(mid.params_g, s2.params_g) == 0.0
    assert _max_delta(mid.params_d, s2.params_d) == 0.0
    assert int(mid.step) == 1
    # replay the same rng so the second micro-batch produces identical grads
    mid = mid.replace(rng=s2.rng)
    out, _ = step2(mid, batch)

    np.testing.assert_allclose(
        np.concatenate([np.ravel(x) for x in jax.tree.leaves(out.params_g)]),
        np.concatenate([np.ravel(x) for x in jax.tree.leaves(ref.params_g)]),
        rtol=2e-5, atol=2e-7)
    np.testing.assert_allclose(
        np.concatenate([np.ravel(x) for x in jax.tree.leaves(out.params_d)]),
        np.concatenate([np.ravel(x) for x in jax.tree.leaves(ref.params_d)]),
        rtol=2e-5, atol=2e-7)


def test_disc_gates_count_optimizer_steps(setup):
    """disc_start_steps=1 with accum=2: the discriminator must stay frozen for
    the first TWO micro-batches (opt_step 0) and move only after micro-batches
    3-4 complete optimizer step 1 — micro-step counting would move it after
    micro-batch 2."""
    cfg, batch, model, disc = setup
    cfg2 = cfg.replace(accumulate_grad_batches=2, disc_start_steps=1)
    s = init_state(cfg2, model, disc, batch)
    step_fn = jax.jit(make_train_step(cfg2, model, disc))
    d0 = s.params_d

    for i in range(2):  # opt_step 0: disc gated OFF both micro-steps
        s, _ = step_fn(s, batch)
        assert _max_delta(s.params_d, d0) == 0.0, f"disc moved at micro {i}"
    for _ in range(2):  # opt_step 1: disc gated ON, accumulates then applies
        s, m = step_fn(s, batch)
    assert _max_delta(s.params_d, d0) > 0.0, "disc never updated at opt_step 1"
    assert float(m["disc"]) > 0.0


def test_kl_warmup_counts_optimizer_steps(setup):
    """kl warm-up factor is min(opt_step / kl_start_steps, 1): with accum=2
    and kl_start_steps=2 the micro-batches of optimizer step 0 must see a
    zero KL weight, and those of optimizer step 1 a half weight."""
    cfg, batch, model, disc = setup
    cfg2 = cfg.replace(accumulate_grad_batches=2, kl_start_steps=2)
    s = init_state(cfg2, model, disc, batch)
    step_fn = jax.jit(make_train_step(cfg2, model, disc))
    kls = []
    for _ in range(4):
        s, m = step_fn(s, batch)
        kls.append((float(m["kl"]), float(m["kl_v"])))
    for k, (kl, kl_v) in enumerate(kls[:2]):
        assert kl == 0.0, f"micro {k}: warm-up leaked {kl} (opt_step 0)"
        assert kl_v > 0.0
    for k, (kl, kl_v) in enumerate(kls[2:]):
        assert abs(kl - 0.5 * kl_v) < 1e-4 * max(kl_v, 1.0), \
            f"micro {k + 2}: expected half weight, got {kl} vs kl_v {kl_v}"
