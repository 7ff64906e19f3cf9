"""Pallas fused WaveNet kernel: numerical parity vs the XLA module.

Runs in interpreter mode on CPU (the kernel compiles natively on TPU)."""

import jax
import jax.experimental.pallas as pl
import jax.numpy as jnp
import numpy as np
import pytest

import visinger_tpu.ops.pallas.wavenet_kernel as wk
from visinger_tpu.modules.wavenet import WaveNet, fused_forward_from_params


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(wk.pl, "pallas_call", patched)


@pytest.mark.parametrize("t_blk,masked", [(48, False), (96, False), (48, True)])
def test_fused_wavenet_matches_xla(t_blk, masked):
    B, T, C, L, K = 2, 96, 32, 4, 5
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, T, C).astype(np.float32) * 0.3)
    if masked:
        lengths = np.array([96, 70])
        mask = jnp.asarray((np.arange(T)[None, :] < lengths[:, None])
                           .astype(np.float32))[..., None]
        x = x * mask
    else:
        mask = jnp.ones((B, T, 1))
    g = jnp.asarray(rng.randn(B, 1, 8).astype(np.float32))
    wn = WaveNet(C, kernel_size=K, n_layers=L, gin_channels=8)
    params = wn.init(jax.random.PRNGKey(0), x, mask, g)["params"]
    ref = wn.apply({"params": params}, x, mask, g)
    out = fused_forward_from_params(params, x, mask, g, t_blk=t_blk)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_fused_wavenet_no_conditioning():
    B, T, C, L, K = 1, 64, 16, 3, 5
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(B, T, C).astype(np.float32) * 0.3)
    mask = jnp.ones((B, T, 1))
    wn = WaveNet(C, kernel_size=K, n_layers=L, gin_channels=0)
    params = wn.init(jax.random.PRNGKey(0), x, mask)["params"]
    ref = wn.apply({"params": params}, x, mask)
    out = fused_forward_from_params(params, x, mask, t_blk=32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_use_pallas_flag_routes_wavenet():
    """WaveNet(use_pallas=True) applies through the fused kernel and matches
    the XLA path on identical params (the model-level `use_pallas` wiring:
    models/visinger.py -> PosteriorEncoder/ResidualCouplingBlock)."""
    B, T, C, L, K = 2, 64, 16, 3, 5
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(B, T, C).astype(np.float32) * 0.3)
    mask = jnp.ones((B, T, 1))
    g = jnp.asarray(rng.randn(B, 1, 8).astype(np.float32))
    wn_xla = WaveNet(C, kernel_size=K, n_layers=L, gin_channels=8)
    wn_pal = WaveNet(C, kernel_size=K, n_layers=L, gin_channels=8,
                     use_pallas=True)
    # init always takes the XLA path (kernel is forward-only) — identical
    # param trees either way
    params = wn_pal.init(jax.random.PRNGKey(0), x, mask, g)["params"]
    ref = wn_xla.apply({"params": params}, x, mask, g)
    out = wn_pal.apply({"params": params}, x, mask, g)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_use_pallas_model_infer():
    """Full model infer branch with cfg.use_pallas: flow-coupling WaveNets
    route through the kernel; wav_out matches the XLA model on the same
    params/RNG."""
    from visinger_tpu.data.synthetic import synthetic_batch
    from visinger_tpu.models.factory import build_models, init_params, tiny_config

    cfg = tiny_config()
    raw = synthetic_batch(2, 12, 64, num_linear_bins=cfg.num_linear_bins,
                          hop_size=cfg.hop_size)
    batch = {k: jnp.asarray(v) for k, v in raw.items()}
    model, disc = build_models(cfg, ph_vocab=40, pitch_vocab=96, dur_vocab=64)
    params_g, _ = init_params(cfg, model, disc, raw)
    model_p, _ = build_models(cfg.replace(use_pallas=True), ph_vocab=40,
                              pitch_vocab=96, dur_vocab=64)
    kwargs = dict(text_tokens=batch["text_tokens"],
                  pitch_tokens=batch["note_pitch"],
                  dur_tokens=batch["note_dur"], mel2ph=batch["mel2ph"],
                  spk_id=batch["spk_ids"], infer=True, deterministic=True)
    rngs = {"sample": jax.random.PRNGKey(7)}
    ref = model.apply({"params": params_g}, rngs=rngs, **kwargs)
    out = model_p.apply({"params": params_g}, rngs=rngs, **kwargs)
    np.testing.assert_allclose(np.asarray(out["wav_out"]),
                               np.asarray(ref["wav_out"]),
                               rtol=2e-3, atol=2e-4)


def test_use_pallas_training_grad_takes_xla_path():
    """Training applies (deterministic=False) must NOT route through the
    forward-only Pallas kernel even with p_dropout=0 — jax.grad through
    pallas_call has no AD rule and crashes (round-2 review finding)."""
    import jax
    import jax.numpy as jnp

    from visinger_tpu.modules.wavenet import WaveNet

    wn = WaveNet(8, kernel_size=5, dilation_rate=1, n_layers=2,
                 p_dropout=0.0, use_pallas=True)
    x = jnp.ones((1, 16, 8), jnp.float32)
    m = jnp.ones((1, 16, 1), jnp.float32)
    params = wn.init(jax.random.PRNGKey(0), x, m, deterministic=False)

    def loss(p):
        return jnp.sum(wn.apply(p, x, m, deterministic=False))

    g = jax.grad(lambda p: loss(p))(params)
    assert all(bool(jnp.isfinite(l).all()) for l in jax.tree.leaves(g))


def test_fused_kernel_grad_matches_xla():
    """The kernel is differentiable (custom_vjp, XLA-recompute backward):
    grads of an eval-mode use_pallas apply match the XLA module's grads
    (the lockstep/diagnostic tooling differentiates deterministic applies)."""
    B, T, C, L, K = 2, 48, 16, 3, 5
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(B, T, C).astype(np.float32) * 0.3)
    lengths = np.array([48, 40])
    mask = jnp.asarray((np.arange(T)[None, :] < lengths[:, None])
                       .astype(np.float32))[..., None]
    g = jnp.asarray(rng.randn(B, 1, 8).astype(np.float32))
    wn_xla = WaveNet(C, kernel_size=K, n_layers=L, gin_channels=8)
    wn_pal = WaveNet(C, kernel_size=K, n_layers=L, gin_channels=8,
                     use_pallas=True)
    params = wn_pal.init(jax.random.PRNGKey(0), x, mask, g)["params"]

    def loss(module):
        def f(p, xx):
            out = module.apply({"params": p}, xx, mask, g)
            return jnp.sum(out * out)
        return f

    g_ref_p, g_ref_x = jax.grad(loss(wn_xla), argnums=(0, 1))(params, x)
    g_pal_p, g_pal_x = jax.grad(loss(wn_pal), argnums=(0, 1))(params, x)
    np.testing.assert_allclose(np.asarray(g_pal_x), np.asarray(g_ref_x),
                               rtol=1e-3, atol=1e-4)
    for kp, a, b in zip(jax.tree_util.tree_leaves_with_path(g_ref_p),
                        jax.tree.leaves(g_ref_p), jax.tree.leaves(g_pal_p)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-3, atol=1e-4,
                                   err_msg=str(kp[0]))
