"""Fused relative-position attention kernel: parity vs the XLA paths.

All three attn_impl lowerings share one parameter tree (same names, shapes,
initializers), so a single init serves every impl.  Pallas runs in
interpreter mode on CPU (compiles natively on TPU)."""

import jax
import jax.experimental.pallas as pl
import jax.numpy as jnp
import numpy as np
import pytest

import visinger_tpu.ops.pallas.attention_kernel as ak
from visinger_tpu.modules.transformer import RelativeEncoder


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    orig = pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(ak.pl, "pallas_call", patched)


def _setup(b=2, t=48, c=32, heads=2, layers=1, window=4, lengths=None,
           p_dropout=0.0):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, t, c).astype(np.float32) * 0.3)
    if lengths is None:
        lengths = [t] * b
    mask = jnp.asarray((np.arange(t)[None, :] < np.array(lengths)[:, None])
                       .astype(np.float32))[..., None]
    x = x * mask

    def enc(impl):
        return RelativeEncoder(c, 2 * c, heads, layers, kernel_size=3,
                               p_dropout=p_dropout, window_size=window,
                               attn_impl=impl)

    params = enc("legacy").init(jax.random.PRNGKey(0), x, mask)["params"]
    return x, mask, enc, params


def test_param_tree_identical_across_impls():
    x, mask, enc, params = _setup()
    for impl in ("einsum", "pallas"):
        p2 = enc(impl).init(jax.random.PRNGKey(0), x, mask)["params"]
        flat1 = jax.tree_util.tree_leaves_with_path(params)
        flat2 = jax.tree_util.tree_leaves_with_path(p2)
        assert [k for k, _ in flat1] == [k for k, _ in flat2]
        for (_, a), (_, b) in zip(flat1, flat2):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("lengths", [None, [48, 31]])
def test_pallas_forward_matches_legacy(lengths):
    x, mask, enc, params = _setup(lengths=lengths)
    ref = enc("legacy").apply({"params": params}, x, mask)
    out = enc("pallas").apply({"params": params}, x, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_einsum_forward_matches_legacy():
    x, mask, enc, params = _setup(lengths=[48, 20])
    ref = enc("legacy").apply({"params": params}, x, mask)
    out = enc("einsum").apply({"params": params}, x, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("impl", ["einsum", "pallas"])
def test_grads_match_legacy(impl):
    x, mask, enc, params = _setup(lengths=[48, 37])

    def loss(p, e):
        out = e.apply({"params": p}, x, mask)
        # weight the output so every position contributes distinctly
        w = jnp.arange(out.size, dtype=jnp.float32).reshape(out.shape)
        return jnp.sum(out * jnp.sin(w * 0.01))

    g_ref = jax.grad(loss)(params, enc("legacy"))
    g_new = jax.grad(loss)(params, enc(impl))
    flat_r = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_n = jax.tree_util.tree_leaves_with_path(g_new)
    for (kr, vr), (kn, vn) in zip(flat_r, flat_n):
        assert kr == kn
        np.testing.assert_allclose(
            np.asarray(vn), np.asarray(vr), rtol=2e-3, atol=2e-5,
            err_msg=str(kr))


def test_pallas_row_tiled_path():
    # t > 768 after lane padding forces the 128-row q tiles + accumulated
    # dk/dv/demb blocks
    x, mask, enc, params = _setup(b=1, t=800, c=16, heads=1)
    ref = enc("legacy").apply({"params": params}, x, mask)
    out = enc("pallas").apply({"params": params}, x, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)

    def loss(p, e):
        return jnp.sum(e.apply({"params": p}, x, mask) ** 2)

    g_ref = jax.grad(loss)(params, enc("legacy"))
    g_new = jax.grad(loss)(params, enc("pallas"))
    for (kr, vr), (kn, vn) in zip(
            jax.tree_util.tree_leaves_with_path(g_ref),
            jax.tree_util.tree_leaves_with_path(g_new)):
        np.testing.assert_allclose(np.asarray(vn), np.asarray(vr),
                                   rtol=2e-3, atol=2e-5, err_msg=str(kr))


def test_pallas_kernel_numerical_grads():
    """check_grads validates the custom_vjp against numerical derivatives
    of the Pallas forward itself (deterministic path)."""
    rng = np.random.RandomState(3)
    b, t, hd, dk, w = 1, 16, 1, 8, 2
    q = jnp.asarray(rng.randn(b, t, hd * ak.LANE).astype(np.float32) * 0.3)
    k = jnp.asarray(rng.randn(b, t, hd * ak.LANE).astype(np.float32) * 0.3)
    v = jnp.asarray(rng.randn(b, t, hd * ak.LANE).astype(np.float32) * 0.3)
    ek = jnp.asarray(rng.randn(2 * w + 1, dk).astype(np.float32) * 0.3)
    ev = jnp.asarray(rng.randn(2 * w + 1, dk).astype(np.float32) * 0.3)
    mask = jnp.ones((b, t), jnp.float32)

    probe = jnp.asarray(
        rng.randn(b, t, hd * ak.LANE).astype(np.float32))

    def f(q, k, v, ek, ev):
        out = ak.rel_attention(q, k, v, ek, ev, mask, window=w, scale=0.25)
        return jnp.sum(out * probe)

    args = (q, k, v, ek, ev)
    grads = jax.grad(f, argnums=tuple(range(5)))(*args)
    # directional derivative vs central finite difference
    dirs = [jnp.asarray(rng.randn(*np.asarray(a).shape).astype(np.float32))
            for a in args]
    eps = 1e-3
    plus = f(*[a + eps * d for a, d in zip(args, dirs)])
    minus = f(*[a - eps * d for a, d in zip(args, dirs)])
    fd = (plus - minus) / (2 * eps)
    analytic = sum(jnp.sum(g * d) for g, d in zip(grads, dirs))
    np.testing.assert_allclose(np.asarray(analytic), np.asarray(fd),
                               rtol=2e-2, atol=2e-3)


def test_pallas_dropout_deterministic_and_rate():
    """In-kernel dropout: same seed reproduces, keep-rate is ~1-p, grads
    flow (the backward kernel regenerates the identical mask)."""
    x, mask, enc, params = _setup(p_dropout=0.5)
    m = enc("pallas")
    try:
        out1 = m.apply({"params": params}, x, mask, deterministic=False,
                       rngs={"dropout": jax.random.PRNGKey(7)})
    except Exception as e:  # pragma: no cover - interpret-mode PRNG gap
        pytest.skip(f"pallas PRNG unavailable in interpret mode: {e}")
    out2 = m.apply({"params": params}, x, mask, deterministic=False,
                   rngs={"dropout": jax.random.PRNGKey(7)})
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    out3 = m.apply({"params": params}, x, mask, deterministic=False,
                   rngs={"dropout": jax.random.PRNGKey(8)})
    assert not np.allclose(np.asarray(out1), np.asarray(out3))

    def loss(p):
        out = m.apply({"params": p}, x, mask, deterministic=False,
                      rngs={"dropout": jax.random.PRNGKey(7)})
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(params)
    assert all(np.all(np.isfinite(np.asarray(v)))
               for v in jax.tree_util.tree_leaves(g))


def test_pallas_attention_under_dp_sharding():
    """The kernel composes with data-parallel pjit: batch sharded P('data')
    over the 8-device mesh, params replicated — output matches the
    unsharded apply (multi-chip training runs the kernel inside the DP
    train step)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device mesh")
    x, mask, enc, params = _setup(b=8)
    e = enc("pallas")
    ref = e.apply({"params": params}, x, mask)
    mesh = Mesh(np.array(jax.devices()), ("data",))
    data, repl = NamedSharding(mesh, P("data")), NamedSharding(mesh, P())
    f = jax.jit(lambda p, a, m: e.apply({"params": p}, a, m),
                in_shardings=(repl, data, data), out_shardings=data)
    out = f(jax.device_put(params, repl), jax.device_put(x, data),
            jax.device_put(mask, data))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
