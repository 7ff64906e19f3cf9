"""Fast CTC vs optax.ctc_loss parity (values and gradients)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from visinger_tpu.ops.ctc import ctc_loss_fast


def _make_case(b=3, t=40, k=20, n=8, seed=0):
    rng = np.random.RandomState(seed)
    logits = jnp.asarray(rng.randn(b, t, k).astype(np.float32))
    lengths = rng.randint(t - 10, t + 1, size=b).astype(np.int32)
    label_lengths = rng.randint(2, n + 1, size=b).astype(np.int32)
    labels = np.zeros((b, n), np.int32)
    for i in range(b):
        labels[i, : label_lengths[i]] = rng.randint(1, k, size=label_lengths[i])
    logit_pad = (np.arange(t)[None] >= lengths[:, None]).astype(np.float32)
    label_pad = (np.arange(n)[None] >= label_lengths[:, None]).astype(np.float32)
    return logits, jnp.asarray(logit_pad), jnp.asarray(labels), jnp.asarray(label_pad)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_ctc_value_parity(seed):
    logits, logit_pad, labels, label_pad = _make_case(seed=seed)
    ref = optax.ctc_loss(logits, logit_pad, labels, label_pad, blank_id=0)
    fast = ctc_loss_fast(logits, logit_pad, labels, label_pad, blank_id=0)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_ctc_repeated_labels():
    # repeated labels exercise the skip-transition mask
    logits = jnp.asarray(np.random.RandomState(3).randn(2, 30, 10).astype(np.float32))
    labels = jnp.asarray([[2, 2, 3, 0], [5, 5, 5, 0]], jnp.int32)
    label_pad = jnp.asarray([[0, 0, 0, 1], [0, 0, 0, 1]], jnp.float32)
    logit_pad = jnp.zeros((2, 30), jnp.float32)
    ref = optax.ctc_loss(logits, logit_pad, labels, label_pad)
    fast = ctc_loss_fast(logits, logit_pad, labels, label_pad)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_ctc_grad_parity():
    logits, logit_pad, labels, label_pad = _make_case(seed=4)

    def loss_ref(x):
        return jnp.sum(optax.ctc_loss(x, logit_pad, labels, label_pad))

    def loss_fast(x):
        return jnp.sum(ctc_loss_fast(x, logit_pad, labels, label_pad))

    g_ref = jax.grad(loss_ref)(logits)
    g_fast = jax.grad(loss_fast)(logits)
    np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_ref),
                               rtol=1e-3, atol=1e-4)
