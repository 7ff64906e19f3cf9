"""Module-level unit tests: shapes, invariants, and the flow invertibility
checks the reference lacks (SURVEY.md §4 implication (a))."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visinger_tpu.modules.common import (
    ChannelLayerNorm,
    Conv1d,
    ConvTranspose1d,
    positional_embedding,
    sinusoidal_table,
)
from visinger_tpu.modules.discriminator import MultiPeriodDiscriminator
from visinger_tpu.modules.flow import ResidualCouplingBlock
from visinger_tpu.modules.hifigan import HiFiGANGenerator
from visinger_tpu.modules.transformer import RelativeEncoder
from visinger_tpu.modules.wavenet import WaveNet

KEY = jax.random.PRNGKey(0)


def test_conv1d_same_length_and_weight_norm():
    x = jnp.ones((2, 17, 8))
    for k, d in [(1, 1), (3, 1), (5, 2), (9, 1), (3, 5)]:
        m = Conv1d(12, k, dilation=d, weight_norm=True)
        p = m.init(KEY, x)
        y = m.apply(p, x)
        assert y.shape == (2, 17, 12), (k, d)
    # weight-norm init is function-preserving: g == ||v||
    m = Conv1d(4, 3, weight_norm=True)
    p = m.init(KEY, x)["params"]
    v = p["kernel"]
    np.testing.assert_allclose(
        np.asarray(p["g"]),
        np.sqrt(np.sum(np.asarray(v) ** 2, axis=(0, 1)) + 1e-12),
        rtol=1e-6,
    )


def test_conv_transpose_lengths():
    for k, u in [(11, 5), (7, 3), (4, 2)]:
        x = jnp.ones((2, 13, 6))
        m = ConvTranspose1d(4, k, u)
        y = m.apply(m.init(KEY, x), x)
        assert y.shape == (2, 13 * u, 4), (k, u)


def test_channel_layer_norm_normalizes():
    x = jnp.asarray(np.random.RandomState(0).randn(2, 5, 16).astype(np.float32)) * 3 + 1
    m = ChannelLayerNorm()
    y = m.apply(m.init(KEY, x), x)
    np.testing.assert_allclose(np.asarray(y.mean(-1)), 0.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(y.std(-1)), 1.0, atol=1e-2)


def test_positional_embedding_padding_is_zero():
    mask = jnp.asarray([[1, 1, 1, 0, 0]], dtype=jnp.float32)
    pe = positional_embedding(mask, 16)
    assert pe.shape == (1, 5, 16)
    np.testing.assert_allclose(np.asarray(pe[0, 3:]), 0.0)
    # first two valid positions differ
    assert np.abs(np.asarray(pe[0, 0] - pe[0, 1])).max() > 1e-3
    # table row 0 is the padding row
    assert (sinusoidal_table(8, 16)[0] == 0).all()


def test_relative_encoder_masked_output():
    x = jnp.asarray(np.random.RandomState(0).randn(2, 10, 16).astype(np.float32))
    mask = jnp.asarray(
        np.concatenate([np.ones((2, 7, 1)), np.zeros((2, 3, 1))], 1), jnp.float32)
    m = RelativeEncoder(16, 32, 2, 2, kernel_size=3)
    y = m.apply(m.init(KEY, x, mask), x, mask)
    assert y.shape == x.shape
    np.testing.assert_allclose(np.asarray(y[:, 7:]), 0.0, atol=1e-6)
    # conditioning path: g of shape [B, 1, gin]
    g = jnp.ones((2, 1, 8))
    mg = RelativeEncoder(16, 32, 2, 2, kernel_size=3)
    pg = mg.init(KEY, x, mask, g)
    yg = mg.apply(pg, x, mask, g)
    assert yg.shape == x.shape


def test_wavenet_shapes_and_mask():
    x = jnp.asarray(np.random.RandomState(0).randn(2, 12, 16).astype(np.float32))
    mask = jnp.ones((2, 12, 1))
    g = jnp.ones((2, 1, 8))
    m = WaveNet(16, kernel_size=5, n_layers=3, gin_channels=8)
    y = m.apply(m.init(KEY, x, mask, g), x, mask, g)
    assert y.shape == x.shape


def test_flow_invertibility():
    """flow_reverse(flow_forward(x)) == x — the core flow invariant."""
    c = 16
    x = jnp.asarray(np.random.RandomState(0).randn(2, 20, c).astype(np.float32))
    mask = jnp.ones((2, 20, 1))
    g = jnp.asarray(np.random.RandomState(1).randn(2, 1, 8).astype(np.float32))
    m = ResidualCouplingBlock(c, c, 5, 1, 2, n_flows=4, gin_channels=8)
    params = m.init(KEY, x, mask, g)
    # zero-init post conv => identity at init; perturb to make it non-trivial
    params = jax.tree.map(
        lambda p: p + 0.05 * np.random.RandomState(2).randn(*p.shape).astype(np.float32),
        params)
    z = m.apply(params, x, mask, g, reverse=False)
    x_rec = m.apply(params, z, mask, g, reverse=True)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), rtol=1e-4, atol=1e-4)
    # at (unperturbed) init the flow is the identity up to channel flips
    params0 = m.init(KEY, x, mask, g)
    z0 = m.apply(params0, x, mask, g, reverse=False)
    assert np.abs(np.asarray(z0)).max() > 0


def test_hifigan_upsamples_to_hop():
    x = jnp.asarray(np.random.RandomState(0).randn(1, 8, 16).astype(np.float32))
    m = HiFiGANGenerator(upsample_initial_channel=32, gin_channels=8)
    g = jnp.ones((1, 1, 8))
    y = m.apply(m.init(KEY, x, g), x, g)
    assert y.shape == (1, 8 * 300)
    assert np.abs(np.asarray(y)).max() <= 1.0  # tanh-bounded


def test_discriminators_output_scores_and_fmaps():
    wav = jnp.asarray(np.random.RandomState(0).randn(2, 2400).astype(np.float32))
    m = MultiPeriodDiscriminator(periods=(2, 3))
    p = m.init(KEY, wav, wav)
    rs, gs, fr, fg = m.apply(p, wav, wav)
    assert len(rs) == len(gs) == 3  # 1 scale + 2 period
    assert len(fr[0]) == 7  # DiscriminatorS: 6 convs + post
    assert len(fr[1]) == 6  # DiscriminatorP: 5 convs + post
    for r in rs:
        assert r.shape[0] == 2 and r.ndim == 2


def test_disc_pair_batch_matches_separate():
    """pair_batch=True (one concat([real, fake]) pass per sub-disc) must be
    numerically identical to two separate batch-B passes — values AND
    gradients (convs are batch-parallel; params are shared)."""
    import jax

    rng = np.random.RandomState(1)
    real = jnp.asarray(rng.randn(2, 2400).astype(np.float32))
    fake = jnp.asarray(rng.randn(2, 2400).astype(np.float32))
    sep = MultiPeriodDiscriminator(periods=(2, 3), pair_batch=False)
    par = MultiPeriodDiscriminator(periods=(2, 3), pair_batch=True)
    p = sep.init(KEY, real, fake)
    assert jax.tree_util.tree_structure(p) == jax.tree_util.tree_structure(
        par.init(KEY, real, fake))  # same param tree either way

    def loss(params, m):
        rs, gs, fr, fg = m.apply(params, real, fake)
        return (sum(jnp.sum(r ** 2) for r in rs)
                + sum(jnp.sum(g ** 2) for g in gs)
                + sum(jnp.sum(a) for f in fr + fg for a in f))

    (l0, g0) = jax.value_and_grad(loss)(p, sep)
    (l1, g1) = jax.value_and_grad(loss)(p, par)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)
    # tolerance: same math, but XLA may pick a different conv reduction
    # order at batch 2B vs B (fp reassociation ~1e-4 rel on grad sums)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)


def test_grouped_conv_stacked_matches_native():
    """Conv1d(grouped_impl='stack') == the native XLA grouped conv — values
    AND gradients — across the MSD's actual (k, stride, groups) specs."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from visinger_tpu.modules.common import Conv1d

    rng = np.random.RandomState(0)
    for c_in, c_out, k, s, g, pad in [(16, 64, 41, 4, 4, 20),
                                      (64, 256, 41, 4, 16, 20),
                                      (8, 8, 5, 1, 2, 2),
                                      (12, 24, 7, 2, 3, 3)]:
        x = jnp.asarray(rng.randn(2, 97, c_in).astype(np.float32))
        native = Conv1d(c_out, k, stride=s, groups=g, padding=pad,
                        weight_norm=True)
        stacked = Conv1d(c_out, k, stride=s, groups=g, padding=pad,
                         weight_norm=True, grouped_impl="stack")
        params = native.init(jax.random.PRNGKey(1), x)
        y_n = native.apply(params, x)
        y_s = stacked.apply(params, x)
        assert y_n.shape == y_s.shape
        np.testing.assert_allclose(np.asarray(y_s), np.asarray(y_n),
                                   rtol=1e-5, atol=1e-5)

        def loss(mod):
            return lambda p, xx: jnp.sum(jnp.square(mod.apply(p, xx)))

        gp_n, gx_n = jax.grad(loss(native), argnums=(0, 1))(params, x)
        gp_s, gx_s = jax.grad(loss(stacked), argnums=(0, 1))(params, x)
        np.testing.assert_allclose(np.asarray(gx_s), np.asarray(gx_n),
                                   rtol=1e-4, atol=1e-4)
        for a, b in zip(jax.tree.leaves(gp_n), jax.tree.leaves(gp_s)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-4, atol=1e-4)


def test_polyphase_conv_transpose_matches_dilated():
    """Polyphase (stride-1 conv + depth-to-space) upsampling is the same
    function as the lhs-dilated formulation, fwd and bwd, on all decoder
    shapes (reference modules/visinger/decoder.py:17-33 upsample stack)."""
    for k, u, cin, cout in [(11, 5, 24, 12), (7, 3, 12, 8), (4, 2, 8, 4),
                            (5, 5, 8, 8), (3, 1, 8, 8)]:
        x = jax.random.normal(KEY, (2, 13, cin))
        m_poly = ConvTranspose1d(cout, k, u, polyphase=True)
        m_dil = ConvTranspose1d(cout, k, u, polyphase=False)
        p = m_poly.init(KEY, x)

        def s_poly(p, x):
            return jnp.sum(m_poly.apply(p, x) ** 2)

        def s_dil(p, x):
            return jnp.sum(m_dil.apply(p, x) ** 2)

        y1, y2 = m_poly.apply(p, x), m_dil.apply(p, x)
        assert y1.shape == y2.shape == (2, 13 * u, cout)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                                   atol=1e-5, rtol=1e-4)
        g1, g2 = jax.grad(s_poly)(p, x), jax.grad(s_dil)(p, x)
        for a, b in zip(jax.tree_util.tree_leaves(g1),
                        jax.tree_util.tree_leaves(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, rtol=1e-3)


def test_time_folded_conv_matches_native():
    """time_fold>1 (MXU-dense stride-f lowering for the low-channel decoder
    tail) is the same function as the native conv — incl. T % fold != 0 and
    every (kernel, dilation) in the MRF (decoder.py:68-110)."""
    for k, d, fold, t in [(3, 1, 8, 40), (3, 5, 8, 43), (7, 1, 4, 40),
                          (11, 5, 8, 29), (7, 1, 8, 16)]:
        x = jax.random.normal(KEY, (2, t, 16))
        m_fold = Conv1d(12, k, dilation=d, weight_norm=True, time_fold=fold)
        m_nat = Conv1d(12, k, dilation=d, weight_norm=True)
        p = m_fold.init(KEY, x)
        y1, y2 = m_fold.apply(p, x), m_nat.apply(p, x)
        assert y1.shape == y2.shape == (2, t, 12), (k, d, fold, t)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                                   atol=1e-5, rtol=1e-4)

        def s_fold(p):
            return jnp.sum(m_fold.apply(p, x) ** 2)

        def s_nat(p):
            return jnp.sum(m_nat.apply(p, x) ** 2)

        for a, b in zip(jax.tree_util.tree_leaves(jax.grad(s_fold)(p)),
                        jax.tree_util.tree_leaves(jax.grad(s_nat)(p))):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, rtol=1e-3)


def test_hifigan_time_fold_matches_unfolded():
    """Full generator with the folded tail == the plain generator (same
    param tree), so the flag is a pure lowering choice."""
    gen_a = HiFiGANGenerator(upsample_initial_channel=64, time_fold=True)
    gen_b = HiFiGANGenerator(upsample_initial_channel=64, time_fold=False)
    x = jax.random.normal(KEY, (2, 7, 32))
    p = gen_a.init(KEY, x)
    assert (jax.tree_util.tree_structure(p)
            == jax.tree_util.tree_structure(gen_b.init(KEY, x)))
    ya, yb = gen_a.apply(p, x), gen_b.apply(p, x)
    assert ya.shape == yb.shape == (2, 7 * 300)
    np.testing.assert_allclose(np.asarray(ya), np.asarray(yb), atol=2e-6)
