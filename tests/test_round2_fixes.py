"""Round-2 correctness fixes: CTC zero_infinity, per-item batch-padding
weights, configured mel losses, derived steps_per_epoch, lambda_adv=0 disc
gate, and the deterministic eval step."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from visinger_tpu.models.factory import (
    build_models,
    init_state,
    tiny_batch,
    tiny_config,
)
from visinger_tpu.training import losses as L
from visinger_tpu.training.train_state import make_optimizers
from visinger_tpu.training.train_step import (
    make_eval_step,
    make_train_step,
    recon_loss_total,
)


# ---------------------------------------------------------------- CTC
def test_ctc_zero_infinity_filters_infeasible():
    """An item whose valid frame count is below its label count has no valid
    CTC alignment; torch's zero_infinity=True zeroes it.  ctc_loss_fast
    encodes it as a finite ~1e30 which must not poison the loss."""
    rng = np.random.RandomState(0)
    b, t, k, n = 2, 6, 8, 5
    log_probs = jnp.asarray(rng.randn(b, t, k), jnp.float32)
    labels = jnp.asarray(rng.randint(1, k, (b, n)), jnp.int32)
    # item 0 feasible (3 frames >= 2 labels), item 1 infeasible (2 < 5)
    mel_lengths = jnp.asarray([6, 2], jnp.int32)
    text_lengths = jnp.asarray([2, 5], jnp.int32)

    def loss(lp):
        return L.ctc_loss(lp, mel_lengths, labels, text_lengths, 1.0)

    val = float(loss(log_probs))
    assert np.isfinite(val) and val < 1e3, val
    g = jax.grad(lambda lp: loss(lp))(log_probs)
    assert np.all(np.isfinite(np.asarray(g)))
    # the infeasible item contributes exactly zero: halving batch matches
    solo = float(L.ctc_loss(log_probs[:1], mel_lengths[:1], labels[:1],
                            text_lengths[:1], 1.0))
    assert val == pytest.approx(solo / 2, rel=1e-5)


# ------------------------------------------------------- item weights
def test_loss_item_weights_mask_duplicates():
    rng = np.random.RandomState(1)
    mel_a = jnp.asarray(rng.randn(1, 16, 8), jnp.float32)
    mel_b = jnp.asarray(rng.randn(1, 16, 8), jnp.float32)
    out = jnp.asarray(rng.randn(2, 16, 8), jnp.float32)
    tgt = jnp.concatenate([mel_a, mel_b])
    w = jnp.asarray([1.0, 0.0])
    masked = float(L.masked_mel_l1(out, tgt, w))
    solo = float(L.masked_mel_l1(out[:1], tgt[:1]))
    assert masked == pytest.approx(solo, rel=1e-6)

    scores_full = [jnp.asarray(rng.randn(2, 7), jnp.float32)]
    fakes_full = [jnp.asarray(rng.randn(2, 7), jnp.float32)]
    d_masked = float(L.discriminator_loss(
        scores_full, fakes_full, jnp.asarray([1.0, 0.0])))
    d_solo = float(L.discriminator_loss(
        [scores_full[0][:1]], [fakes_full[0][:1]]))
    assert d_masked == pytest.approx(d_solo, rel=1e-6)


def test_parse_mel_losses():
    assert L.parse_mel_losses("l1:45.0") == {"l1": 45.0}
    assert L.parse_mel_losses("l1:45.0|mse:2.0") == {"l1": 45.0, "mse": 2.0}
    assert L.parse_mel_losses("l1") == {"l1": 1.0}
    a = jnp.ones((1, 4, 3))
    b = jnp.full((1, 4, 3), 3.0)
    assert float(L.mel_losses_total("l1:2.0", a, b)) == pytest.approx(4.0)
    assert float(L.mel_losses_total("mse:1.0", a, b)) == pytest.approx(4.0)
    with pytest.raises(ValueError):
        L.mel_losses_total("ssim:1.0", a, b)


# --------------------------------------------------- steps_per_epoch
def test_steps_per_epoch_derivation():
    cfg = tiny_config()
    assert int(cfg.get("steps_per_epoch", 0)) == 4  # tiny_config override

    def lr_after(opt, n_steps):
        params = {"w": jnp.zeros(3)}
        s = opt.init(params)
        g = {"w": jnp.ones(3)}
        for _ in range(n_steps):
            u, s = opt.update(g, s, params)
        # AdamW update magnitude ~ lr for constant grads
        return float(jnp.abs(u["w"][0]))

    # explicit cfg override wins over the derived value
    o1, _ = make_optimizers(cfg, steps_per_epoch=100)
    o2, _ = make_optimizers(cfg.replace(steps_per_epoch=0), steps_per_epoch=100)
    # after 100 steps: cfg-override (4/epoch) has decayed 25 epochs; the
    # derived one (100/epoch) decayed once
    d1, d2 = lr_after(o1, 101), lr_after(o2, 101)
    assert d1 < d2


# ------------------------------------------------ fused step behavior
@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    batch = tiny_batch(cfg)
    model, disc = build_models(cfg, ph_vocab=40, pitch_vocab=96, dur_vocab=64)
    state = init_state(cfg, model, disc, batch)
    return cfg, batch, model, disc, state


def test_item_weights_mask_whole_pipeline(setup):
    """A weight-0 row's DATA must have zero influence: swapping what item
    sits in the masked slot changes neither metrics nor parameter updates
    (the per-position RNG draws are shape-keyed, hence identical)."""
    cfg, batch, model, disc, state = setup
    step_fn = jax.jit(make_train_step(cfg, model, disc))

    def with_rows(rows, w):
        b = {k: v[jnp.asarray(rows)] for k, v in batch.items()}
        b["item_weights"] = jnp.asarray(w, jnp.float32)
        return b

    s_a, m_a = step_fn(state, with_rows([0, 1], [1.0, 0.0]))
    s_b, m_b = step_fn(state, with_rows([0, 0], [1.0, 0.0]))
    for k in m_a:
        np.testing.assert_allclose(float(m_a[k]), float(m_b[k]),
                                   rtol=1e-5, err_msg=k)
    for a, b_ in zip(jax.tree.leaves(s_a.params_g),
                     jax.tree.leaves(s_b.params_g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-6)
    # sensitivity check: with weight 1 the same swap DOES change the loss
    _, m_c = step_fn(state, with_rows([0, 1], [1.0, 1.0]))
    _, m_d = step_fn(state, with_rows([0, 0], [1.0, 1.0]))
    assert abs(float(m_c["total_g"]) - float(m_d["total_g"])) > 1e-3


def test_lambda_adv_zero_skips_disc(setup):
    cfg, batch, model, disc, state = setup
    cfg0 = cfg.replace(lambda_mel_adv=0.0)
    step_fn = jax.jit(make_train_step(cfg0, model, disc))
    new_state, metrics = step_fn(state, batch)
    assert float(metrics["disc"]) == 0.0
    assert "adv" not in metrics and "fm" not in metrics
    for a, b in zip(jax.tree.leaves(new_state.params_d),
                    jax.tree.leaves(state.params_d)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_deterministic_eval_step(setup):
    cfg, batch, model, disc, state = setup
    eval_fn = jax.jit(make_eval_step(cfg, model))
    key = jax.random.PRNGKey(0)
    m1 = eval_fn(state.params_g, batch, key)
    m2 = eval_fn(state.params_g, batch, key)
    assert set(m1) <= {"kl", "mel_l1", "uv", "f0", "ctc", "total_g"}
    for k in m1:
        assert float(m1[k]) == float(m2[k]), k
        assert np.isfinite(float(m1[k])), k
    assert float(m1["total_g"]) == pytest.approx(
        recon_loss_total({k: float(v) for k, v in m1.items()
                          if k != "total_g"}), rel=1e-6)


def test_slice_ref_padded_flag(setup):
    """slice_ref_padded: true restores the reference rand_slice regime
    (ids drawn over the PADDED frame axis, modules/commons/utils.py:95-100);
    default draws inside each item's valid length.  The regime measurably
    changes GAN balance (PARITY.md "GAN balance")."""
    cfg, batch, model, _disc, state = setup
    short = dict(batch)
    t_pad = int(batch["mel2ph"].shape[1])
    seg = int(cfg.segment_size)
    valid = t_pad // 4
    short["mel_lengths"] = jnp.full_like(batch["mel_lengths"], valid)

    def max_id(m, n_keys=40):
        mx = -1
        for s in range(n_keys):
            out = m.apply(
                {"params": state.params_g},
                text_tokens=short["text_tokens"],
                pitch_tokens=short["note_pitch"],
                dur_tokens=short["note_dur"], mel2ph=short["mel2ph"],
                spk_id=short["spk_ids"], f0=short["f0"], uv=short["uv"],
                spec=short["spec"], lengths=short["mel_lengths"],
                infer=False, deterministic=True,
                rngs={"sample": jax.random.PRNGKey(s)})
            mx = max(mx, int(jnp.max(out["ids_slice"])))
        return mx

    model_ref, _ = build_models(cfg.replace(slice_ref_padded=True),
                                ph_vocab=40, pitch_vocab=96, dur_vocab=64)
    assert max_id(model) <= valid - seg  # default: inside valid region
    assert max_id(model_ref) > valid     # reference regime: padded range


def test_logs_clamp_bounds_sampling(setup):
    """logs_clamp must bound logs_q BEFORE sampling (not just in the KL
    term), so exp(logs_q) cannot blow z_q up in the first training steps."""
    cfg, batch, _model, _disc, state = setup
    model_c, _ = build_models(cfg.replace(logs_clamp=2.0),
                              ph_vocab=40, pitch_vocab=96, dur_vocab=64)
    out = model_c.apply(
        {"params": state.params_g}, text_tokens=batch["text_tokens"],
        pitch_tokens=batch["note_pitch"], dur_tokens=batch["note_dur"],
        mel2ph=batch["mel2ph"], spk_id=batch["spk_ids"], f0=batch["f0"],
        uv=batch["uv"], spec=batch["spec"], lengths=batch["mel_lengths"],
        infer=False, deterministic=True,
        rngs={"sample": jax.random.PRNGKey(0)})
    assert float(jnp.abs(out["logs_q"]).max()) <= 2.0 + 1e-6
    mu_max = float(jnp.abs(out["mu_q"]).max())
    assert float(jnp.abs(out["z_q"]).max()) <= mu_max + 3 * np.e ** 2 * 6
