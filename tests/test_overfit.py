"""Short-horizon training sanity: losses must decrease when overfitting one
fixed batch (the trainable-end-to-end check a single step can't give)."""

import jax
import numpy as np

from visinger_tpu.models.factory import (
    build_models,
    init_state,
    tiny_batch,
    tiny_config,
)
from visinger_tpu.training.train_step import make_train_step


def test_mel_loss_decreases_overfitting_one_batch():
    cfg = tiny_config().replace(kl_start_steps=1, lr=2e-3)
    batch = tiny_batch(cfg, batch_size=2, n_tokens=10, n_frames=48, seed=3)
    model, disc = build_models(cfg, 40, 96, 64)
    state = init_state(cfg, model, disc, batch)
    step_fn = jax.jit(make_train_step(cfg, model, disc), donate_argnums=0)

    first_window, last_window = [], []
    n_steps = 60
    for i in range(n_steps):
        state, metrics = step_fn(state, batch)
        mel = float(metrics["mel_l1"])
        assert np.isfinite(mel), (i, metrics)
        if i < 10:
            first_window.append(mel)
        if i >= n_steps - 10:
            last_window.append(mel)
    early, late = np.mean(first_window), np.mean(last_window)
    assert late < early * 0.85, f"mel loss did not decrease: {early} -> {late}"
    # f0/uv predictor losses should also trend down
    assert np.isfinite(float(metrics["total_g"]))
