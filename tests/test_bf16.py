"""Mixed-precision (bf16 compute / f32 params) path checks."""

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


def test_bf16_train_step_close_to_f32():
    cfg32 = tiny_config()
    cfg16 = cfg32.replace(compute_dtype="bfloat16")
    batch = tiny_batch(cfg32)
    model32, disc32 = build_models(cfg32, 40, 96, 64)
    model16, disc16 = build_models(cfg16, 40, 96, 64)
    state = init_state(cfg32, model32, disc32, batch)  # same init for both
    s32, m32 = jax.jit(make_train_step(cfg32, model32, disc32))(state, batch)
    s16, m16 = jax.jit(make_train_step(cfg16, model16, disc16))(state, batch)
    # params remain f32 in both
    assert jax.tree.leaves(s16.params_g)[0].dtype == jnp.float32
    for k in m32:
        a, b = float(m32[k]), float(m16[k])
        assert np.isfinite(b), k
        # loose agreement: same magnitude, not bitwise (stochastic layers share
        # the same keys, so differences are pure precision effects)
        assert abs(a - b) <= 0.2 * max(abs(a), abs(b), 1.0), (k, a, b)


def test_bf16_f32_islands_route_compute():
    """`bf16_f32_islands` (the warm-up-transient bisect instrument,
    tools/bf16_islands.py) must route the named subsystems to f32 compute
    while the rest of the model stays bf16."""
    cfg = tiny_config(compute_dtype="bfloat16",
                      bf16_f32_islands=("phoneme", "disc"))
    model, disc = build_models(cfg, 40, 96, 64)
    # disc island is applied at build time (models/factory.py)
    assert disc.dtype == jnp.float32
    model_no, disc_no = build_models(
        cfg.replace(bf16_f32_islands=()), 40, 96, 64)
    assert disc_no.dtype == jnp.bfloat16
    # generator islands are applied in VISinger.setup (dt()); visible on a
    # bound module's submodules
    batch = tiny_batch(cfg)
    state = init_state(cfg, model, disc, batch)
    bound = model.bind({"params": state.params_g})
    assert bound.phoneme_predictor.dtype == jnp.float32
    assert bound.text_encoder.dtype == jnp.bfloat16
    assert bound.decoder.dtype == jnp.bfloat16


def test_bf16_flow_invertibility():
    from visinger_tpu.modules.flow import ResidualCouplingBlock

    c = 16
    x = jnp.asarray(np.random.RandomState(0).randn(2, 20, c).astype(np.float32))
    mask = jnp.ones((2, 20, 1))
    m = ResidualCouplingBlock(c, c, 5, 1, 1, n_flows=2, dtype=jnp.bfloat16)
    params = m.init(jax.random.PRNGKey(0), x, mask)
    params = jax.tree.map(
        lambda p: p + 0.05 * np.random.RandomState(1).randn(*p.shape).astype(np.float32),
        params)
    z = m.apply(params, x, mask, reverse=False)
    x_rec = m.apply(params, z, mask, reverse=True)
    # bf16 has ~3 decimal digits; invertibility should hold to that precision
    np.testing.assert_allclose(np.asarray(x_rec, np.float32),
                               np.asarray(x), rtol=0.1, atol=0.05)
