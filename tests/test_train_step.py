"""Single-step training tests on synthetic data (SURVEY.md §4 implication (c)):
loss finite, every generator/discriminator parameter receives gradient signal,
and the fused step updates both parameter sets."""

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
    state = init_state(cfg, model, disc, batch)
    step_fn = jax.jit(make_train_step(cfg, model, disc))
    return cfg, batch, model, disc, state, step_fn


def test_losses_finite_and_params_update(setup):
    cfg, batch, model, disc, state, step_fn = setup
    new_state, metrics = step_fn(state, batch)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"loss {k} not finite: {v}"
    assert float(metrics["mel_l1"]) > 0
    assert float(metrics["disc"]) > 0
    assert int(new_state.step) == 1

    def max_delta(a, b):
        return max(
            float(jnp.abs(x - y).max())
            for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
        )

    assert max_delta(new_state.params_g, state.params_g) > 0
    assert max_delta(new_state.params_d, state.params_d) > 0


def test_remat_policies_match_no_remat(setup):
    """remat_policy full/dots recompute the forward instead of saving
    activations — same math, so one step must land on (numerically) the
    same params and losses as remat_policy none."""
    cfg, batch, model, disc, state, step_fn = setup
    base, m0 = step_fn(state, batch)
    for policy in ("full", "dots"):
        fn = jax.jit(make_train_step(cfg.replace(remat_policy=policy),
                                     model, disc))
        out, m = fn(state, batch)
        np.testing.assert_allclose(float(m["total_g"]), float(m0["total_g"]),
                                   rtol=1e-5)
        # param atol ~2x the AdamW lr (2e-4): recompute reassociates fp
        # reductions, and Adam's m/sqrt(v) normalization lets a near-zero
        # grad's rounding noise swing that param's whole update
        for a, b in zip(jax.tree.leaves(base.params_g),
                        jax.tree.leaves(out.params_g)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-4, atol=5e-4)


def test_two_steps_progress(setup):
    cfg, batch, model, disc, state, step_fn = setup
    s1, m1 = step_fn(state, batch)
    s2, m2 = step_fn(s1, batch)
    assert int(s2.step) == 2
    for k in m2:
        assert np.isfinite(float(m2[k])), k


def test_all_generator_params_get_grads(setup):
    """The reference needed find_unused_parameters=True; our gated losses must
    keep every parameter on the gradient path (or deliberately excluded).

    Measured from step 2 -> step 3: at step 0 the KL warm-up gate is 0
    (min(step/kl_start_steps, 1), parity with tasks/visinger.py:108), and the
    flow couplings' zero-initialized `post` conv blocks upstream gradients
    for one further step (identical to the torch reference) — so KL-only
    parameters legitimately move only from step 2 on."""
    cfg, batch, model, disc, state, step_fn = setup
    s = state
    for _ in range(3):
        s_prev, (s, _) = s, step_fn(s, batch)
    moved, frozen = 0, []
    flat_old = jax.tree_util.tree_flatten_with_path(s_prev.params_g)[0]
    flat_new = jax.tree.leaves(s.params_g)
    for (path, old), new in zip(flat_old, flat_new):
        if float(jnp.abs(new - old).max()) > 0:
            moved += 1
        else:
            frozen.append(jax.tree_util.keystr(path))
    assert moved / (moved + len(frozen)) > 0.99, f"frozen params: {frozen}"
