"""Numerical parity vs the ACTUAL torch reference implementation.

Loads our flax parameters into the reference PyTorch modules
(/root/reference, mounted read-only) and compares forward outputs on the
same inputs — the strongest possible check that the math matches
(SURVEY.md §4 implication (b): module-level numerical parity).

Weight mapping notes:
  - torch Conv1d weight [out, in, k] <-> flax [k, in, out] (transpose)
  - torch weight_norm splits into weight_g [out,1,1] / weight_v; we assign
    weight_v = v and weight_g = ||v|| per out-channel so the effective
    weight equals our g * v/||v|| (our g is initialized to ||v||)
  - torch ConvTranspose1d weight [in, out, k] <-> our [k, in, out], and our
    kernel is flipped at apply time, so assign w[k,in,out] -> transpose
    (1, 2, 0) without flip
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
sys.path.insert(0, "/root/reference")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from visinger_tpu.modules.common import Conv1d, ConvTranspose1d  # noqa: E402
from visinger_tpu.modules.transformer import RelativeEncoder  # noqa: E402
from visinger_tpu.modules.wavenet import WaveNet  # noqa: E402
from visinger_tpu.modules.flow import ResidualCouplingBlock  # noqa: E402
from visinger_tpu.modules.hifigan import HiFiGANGenerator  # noqa: E402

KEY = jax.random.PRNGKey(0)


def t2n(x):
    return x.detach().cpu().numpy()


def set_conv1d(tmod, fparams, weight_norm=False):
    """Copy flax Conv1d params into a torch nn.Conv1d (possibly weight_norm)."""
    w = np.asarray(fparams["kernel"]).transpose(2, 1, 0)  # [out, in, k]
    with torch.no_grad():
        if weight_norm:
            g = np.asarray(fparams["g"])
            # effective = g * v/||v||; torch computes weight_g * v/||v||_dim0
            tmod.weight_v.copy_(torch.from_numpy(w))
            tmod.weight_g.copy_(torch.from_numpy(g.reshape(-1, 1, 1)))
        else:
            tmod.weight.copy_(torch.from_numpy(w))
        if "bias" in fparams and tmod.bias is not None:
            tmod.bias.copy_(torch.from_numpy(np.asarray(fparams["bias"])))


def test_wavenet_parity():
    from modules.visinger.encoder import WaveNet as TorchWaveNet

    B, T, C, L, K, G = 2, 40, 32, 4, 5, 16
    rng = np.random.RandomState(0)
    x = rng.randn(B, T, C).astype(np.float32) * 0.3
    g = rng.randn(B, 1, G).astype(np.float32)
    mask = np.ones((B, T, 1), np.float32)

    fwn = WaveNet(C, kernel_size=K, n_layers=L, gin_channels=G)
    params = fwn.init(KEY, jnp.asarray(x), jnp.asarray(mask), jnp.asarray(g))["params"]
    ours = np.asarray(fwn.apply({"params": params}, jnp.asarray(x),
                                jnp.asarray(mask), jnp.asarray(g)))

    twn = TorchWaveNet(C, K, 1, L, gin_channels=G).eval()
    set_conv1d(twn.cond_layer, params["cond_layer"], weight_norm=True)
    for i in range(L):
        set_conv1d(twn.in_layers[i], params[f"in_{i}"], weight_norm=True)
        set_conv1d(twn.res_skip_layers[i], params[f"res_skip_{i}"], weight_norm=True)
    with torch.no_grad():
        theirs = twn(torch.from_numpy(x.transpose(0, 2, 1)),
                     torch.from_numpy(mask.transpose(0, 2, 1)),
                     g=torch.from_numpy(g.transpose(0, 2, 1)))
    theirs = t2n(theirs).transpose(0, 2, 1)
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_relative_encoder_parity():
    from modules.rel_transformer import RelativeEncoder as TorchRelEncoder

    B, T, C, H, FF, L = 2, 24, 32, 2, 64, 2
    rng = np.random.RandomState(1)
    x = rng.randn(B, T, C).astype(np.float32)
    mask = np.ones((B, T, 1), np.float32)
    mask[1, 18:] = 0.0
    x = x * mask

    fenc = RelativeEncoder(C, FF, H, L, kernel_size=3, p_dropout=0.0)
    params = fenc.init(KEY, jnp.asarray(x), jnp.asarray(mask))["params"]
    ours = np.asarray(fenc.apply({"params": params}, jnp.asarray(x),
                                 jnp.asarray(mask)))

    tenc = TorchRelEncoder(C, FF, H, L, kernel_size=3, p_dropout=0.0).eval()
    for i in range(L):
        a = params[f"attn_{i}"]
        set_conv1d(tenc.attn_layers[i].conv_q, a["conv_q"])
        set_conv1d(tenc.attn_layers[i].conv_k, a["conv_k"])
        set_conv1d(tenc.attn_layers[i].conv_v, a["conv_v"])
        set_conv1d(tenc.attn_layers[i].conv_o, a["conv_o"])
        with torch.no_grad():
            tenc.attn_layers[i].emb_rel_k.copy_(
                torch.from_numpy(np.asarray(a["emb_rel_k"]))[None])
            tenc.attn_layers[i].emb_rel_v.copy_(
                torch.from_numpy(np.asarray(a["emb_rel_v"]))[None])
        f = params[f"ffn_{i}"]
        set_conv1d(tenc.ffn_layers[i].conv_1, f["conv_1"])
        set_conv1d(tenc.ffn_layers[i].conv_2, f["conv_2"])
        with torch.no_grad():
            tenc.norm_layers_1[i].gamma.copy_(
                torch.from_numpy(np.asarray(params[f"norm1_{i}"]["gamma"])))
            tenc.norm_layers_1[i].beta.copy_(
                torch.from_numpy(np.asarray(params[f"norm1_{i}"]["beta"])))
            tenc.norm_layers_2[i].gamma.copy_(
                torch.from_numpy(np.asarray(params[f"norm2_{i}"]["gamma"])))
            tenc.norm_layers_2[i].beta.copy_(
                torch.from_numpy(np.asarray(params[f"norm2_{i}"]["beta"])))
    with torch.no_grad():
        theirs = tenc(torch.from_numpy(x.transpose(0, 2, 1)),
                      torch.from_numpy(mask.transpose(0, 2, 1)))
    theirs = t2n(theirs).transpose(0, 2, 1)
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_flow_parity():
    from modules.visinger.flow import ResidualCouplingBlock as TorchFlow

    B, T, C, G = 2, 30, 16, 8
    rng = np.random.RandomState(2)
    x = rng.randn(B, T, C).astype(np.float32)
    g = rng.randn(B, 1, G).astype(np.float32)
    mask = np.ones((B, T, 1), np.float32)

    fflow = ResidualCouplingBlock(C, C, 5, 1, 2, n_flows=2, gin_channels=G)
    params = fflow.init(KEY, jnp.asarray(x), jnp.asarray(mask), jnp.asarray(g))["params"]
    # perturb the zero-init post convs so the flow is non-trivial
    params = jax.tree.map(
        lambda p: p + 0.1 * np.random.RandomState(7).randn(*p.shape).astype(np.float32),
        params)
    ours_fwd = np.asarray(fflow.apply({"params": params}, jnp.asarray(x),
                                      jnp.asarray(mask), jnp.asarray(g)))
    ours_rev = np.asarray(fflow.apply({"params": params}, jnp.asarray(x),
                                      jnp.asarray(mask), jnp.asarray(g),
                                      reverse=True))

    tflow = TorchFlow(C, C, 5, 1, 2, n_flows=2, gin_channels=G).eval()
    for i in range(2):
        cp = params[f"coupling_{i}"]
        tcp = tflow.flows[i * 2]
        set_conv1d(tcp.pre, cp["pre"])
        set_conv1d(tcp.post, cp["post"])
        enc = cp["enc"]
        set_conv1d(tcp.enc.cond_layer, enc["cond_layer"], weight_norm=True)
        for j in range(2):
            set_conv1d(tcp.enc.in_layers[j], enc[f"in_{j}"], weight_norm=True)
            set_conv1d(tcp.enc.res_skip_layers[j], enc[f"res_skip_{j}"],
                       weight_norm=True)
    with torch.no_grad():
        tx = torch.from_numpy(x.transpose(0, 2, 1))
        tm = torch.from_numpy(mask.transpose(0, 2, 1))
        tg = torch.from_numpy(g.transpose(0, 2, 1))
        theirs_fwd = tflow(tx, tm, g=tg, reverse=False)
        theirs_rev = tflow(tx, tm, g=tg, reverse=True)
    # NB: reference uses channel Flip modules between couplings; ours flips
    # inline — structural parity is covered by matching outputs.
    np.testing.assert_allclose(
        ours_fwd, t2n(theirs_fwd).transpose(0, 2, 1), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        ours_rev, t2n(theirs_rev).transpose(0, 2, 1), rtol=1e-4, atol=1e-5)


def test_discriminator_s_parity():
    from modules.discriminator import DiscriminatorS as TorchDiscS

    from visinger_tpu.modules.discriminator import DiscriminatorS

    B, T = 2, 2400
    rng = np.random.RandomState(4)
    wav = rng.randn(B, T).astype(np.float32) * 0.3

    fd = DiscriminatorS()
    params = fd.init(KEY, jnp.asarray(wav))["params"]
    ours_score, ours_fmap = fd.apply({"params": params}, jnp.asarray(wav))

    td = TorchDiscS().eval()
    for i in range(6):
        set_conv1d(td.convs[i], params[f"conv_{i}"], weight_norm=True)
    set_conv1d(td.conv_post, params["conv_post"], weight_norm=True)
    with torch.no_grad():
        theirs_score, theirs_fmap = td(torch.from_numpy(wav[:, None, :]))
    np.testing.assert_allclose(np.asarray(ours_score), t2n(theirs_score),
                               rtol=1e-4, atol=1e-5)
    assert len(ours_fmap) == len(theirs_fmap)
    # fmaps: ours NWC vs theirs NCW
    np.testing.assert_allclose(
        np.asarray(ours_fmap[2]), t2n(theirs_fmap[2]).transpose(0, 2, 1),
        rtol=1e-4, atol=1e-5)


def test_discriminator_p_parity():
    from modules.discriminator import DiscriminatorP as TorchDiscP

    from visinger_tpu.modules.discriminator import DiscriminatorP

    B, T, period = 2, 2400, 3
    rng = np.random.RandomState(5)
    wav = rng.randn(B, T).astype(np.float32) * 0.3

    fd = DiscriminatorP(period)
    params = fd.init(KEY, jnp.asarray(wav))["params"]
    ours_score, _ = fd.apply({"params": params}, jnp.asarray(wav))

    td = TorchDiscP(period).eval()
    for i in range(5):
        name = f"conv_{i}" if i < 4 else "conv_4"
        fp = params[name]
        # our Conv2dP kernel [kh, 1, in, out] -> torch [out, in, kh, 1]
        w = np.asarray(fp["kernel"]).transpose(3, 2, 0, 1)
        with torch.no_grad():
            td.convs[i].weight_v.copy_(torch.from_numpy(w))
            td.convs[i].weight_g.copy_(torch.from_numpy(
                np.asarray(fp["g"]).reshape(-1, 1, 1, 1)))
            td.convs[i].bias.copy_(torch.from_numpy(np.asarray(fp["bias"])))
    fp = params["conv_post"]
    with torch.no_grad():
        td.conv_post.weight_v.copy_(torch.from_numpy(
            np.asarray(fp["kernel"]).transpose(3, 2, 0, 1)))
        td.conv_post.weight_g.copy_(torch.from_numpy(
            np.asarray(fp["g"]).reshape(-1, 1, 1, 1)))
        td.conv_post.bias.copy_(torch.from_numpy(np.asarray(fp["bias"])))
    with torch.no_grad():
        theirs_score, _ = td(torch.from_numpy(wav[:, None, :]))
    # torch folds [B, 1, T/p, p]; ours [B, T/p, p, 1] — scores flatten the
    # same way (H-major), so direct comparison holds
    np.testing.assert_allclose(np.asarray(ours_score), t2n(theirs_score),
                               rtol=1e-4, atol=1e-5)


def test_hifigan_parity():
    from modules.visinger.decoder import Generator as TorchGenerator

    B, T, C, G = 1, 12, 16, 8
    rng = np.random.RandomState(3)
    x = rng.randn(B, T, C).astype(np.float32) * 0.3
    g = rng.randn(B, 1, G).astype(np.float32)

    fgen = HiFiGANGenerator(upsample_initial_channel=32, gin_channels=G)
    params = fgen.init(KEY, jnp.asarray(x), jnp.asarray(g))["params"]
    ours = np.asarray(fgen.apply({"params": params}, jnp.asarray(x), jnp.asarray(g)))

    tgen = TorchGenerator(C, "1", [3, 7, 11], [[1, 3, 5]] * 3, [5, 5, 3, 2, 2],
                          32, [11, 11, 7, 4, 4], gin_channels=G).eval()
    set_conv1d(tgen.conv_pre, params["conv_pre"])
    set_conv1d(tgen.cond, params["cond"])
    with torch.no_grad():
        tgen.conv_post.weight.copy_(torch.from_numpy(
            np.asarray(params["conv_post"]["kernel"]).transpose(2, 1, 0)))
    for i in range(5):
        up = params[f"up_{i}"]
        w = np.asarray(up["kernel"]).transpose(1, 2, 0)  # [in, out, k]
        with torch.no_grad():
            tgen.ups[i].weight_v.copy_(torch.from_numpy(w))
            # torch weight_norm on ConvTranspose1d: dim=0 -> norm over (out,k)
            norms = np.sqrt((w ** 2).sum(axis=(1, 2), keepdims=True) + 0)
            g_eff = np.sqrt((np.asarray(up["kernel"]) ** 2).sum(axis=(0, 1)))
            # our g is per-out-channel; torch's weight_g for ConvT dim=0 is
            # per-IN-channel — map effective weights directly instead:
            eff = np.asarray(up["kernel"])  # [k, in, out]
            gg = np.asarray(up["g"])
            eff = eff * (gg / np.sqrt((eff ** 2).sum(axis=(0, 1)) + 1e-12))
            tgen.ups[i] = torch.nn.ConvTranspose1d(
                tgen.ups[i].in_channels, tgen.ups[i].out_channels,
                tgen.ups[i].kernel_size[0], tgen.ups[i].stride[0],
                padding=tgen.ups[i].padding[0])
            tgen.ups[i].weight.copy_(torch.from_numpy(eff.transpose(1, 2, 0)))
            tgen.ups[i].bias.copy_(torch.from_numpy(np.asarray(up["bias"])))
        for j in range(3):
            res = params[f"res_{i}_{j}"]
            tres = tgen.resblocks[i * 3 + j]
            for k in range(3):
                set_conv1d(tres.convs1[k], res[f"conv1_{k}"], weight_norm=True)
                set_conv1d(tres.convs2[k], res[f"conv2_{k}"], weight_norm=True)
    with torch.no_grad():
        theirs = tgen(torch.from_numpy(x.transpose(0, 2, 1)),
                      g=torch.from_numpy(g.transpose(0, 2, 1)))
    np.testing.assert_allclose(ours[:, :], t2n(theirs)[:, 0, :],
                               rtol=1e-3, atol=1e-4)
