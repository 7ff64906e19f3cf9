"""AOT serving export (infer/export.py): the serialized StableHLO synthesis
program must load without model source and reproduce the live path exactly.

No reference equivalent — the reference rebuilds the torch model from source
at inference load (inference/visinger.py:20-38); this is the TPU-native
deployment artifact.  v2 artifacts hold multiple (token, frame) bucket
programs and carry spk_embed for use_spk_embed models (VERDICT r2 #8).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from visinger_tpu.infer.export import (
    ExportedSynthesizer,
    _synthesis_fn,
    export_synthesis,
)
from visinger_tpu.models.factory import build_models, tiny_config


def _score(n_tok=24, n_frames=96, seed=0):
    rng = np.random.RandomState(seed)
    tok = rng.randint(1, 20, (1, n_tok)).astype(np.int32)
    mel2ph = np.minimum(np.arange(n_frames) // (n_frames // n_tok) + 1,
                        n_tok).astype(np.int32)[None]
    return tok, mel2ph


def _init(cfg, model, tok, mel2ph, spk_embed=None):
    kw = {} if spk_embed is None else {"spk_embed": jnp.asarray(spk_embed)}
    return model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        text_tokens=jnp.asarray(tok), pitch_tokens=jnp.asarray(tok % 30),
        dur_tokens=jnp.asarray(tok % 12), mel2ph=jnp.asarray(mel2ph),
        spk_id=jnp.zeros((1,), jnp.int32), infer=True,
        deterministic=True, **kw)["params"]


@pytest.fixture(scope="module")
def exported(tmp_path_factory):
    cfg = tiny_config()
    model, _ = build_models(cfg, ph_vocab=20, pitch_vocab=30, dur_vocab=12)
    tok, mel2ph = _score()
    params = _init(cfg, model, tok, mel2ph)
    art_dir = str(tmp_path_factory.mktemp("artifact"))
    meta = export_synthesis(cfg, model, params, art_dir,
                            n_tokens=24, n_frames=96,
                            platforms=("cpu", "tpu"))
    return cfg, model, params, tok, mel2ph, art_dir, meta


def test_export_writes_versioned_artifact(exported):
    import os

    *_, art_dir, meta = exported
    for fn in ("synthesis_t24_f96.jaxexport", "params.msgpack", "meta.json"):
        assert os.path.exists(os.path.join(art_dir, fn))
    assert meta["platforms"] == ["cpu", "tpu"]  # one artifact, both targets
    assert meta["buckets"] == [[24, 96]]
    assert meta["use_spk_embed"] is False


def test_exported_matches_live_synthesis(exported):
    cfg, model, params, tok, mel2ph, art_dir, meta = exported
    syn = ExportedSynthesizer(art_dir)
    wav = syn(tok[0], tok[0] % 30, tok[0] % 12, mel2ph[0], seed=3)
    direct = _synthesis_fn(model, use_spk_embed=False)(
        params, jnp.asarray(tok), jnp.asarray(tok % 30),
        jnp.asarray(tok % 12), jnp.asarray(mel2ph),
        jnp.zeros((1,), jnp.int32), jnp.int32(3))
    assert wav.shape == (mel2ph.shape[1] * cfg.hop_size,)
    np.testing.assert_allclose(wav, np.asarray(direct)[0, : len(wav)],
                               rtol=1e-5, atol=1e-5)


def test_exported_rejects_oversize_scores(exported):
    *_, art_dir, _meta = exported
    syn = ExportedSynthesizer(art_dir)
    big = np.ones(500, np.int32)
    with pytest.raises(ValueError, match="exceeds every exported bucket"):
        syn(big, big, big, big)


def test_multibucket_export_picks_smallest_fit(tmp_path):
    """Two bucket programs in ONE artifact; a small score must route to the
    small program (same padding the live CLI would use) and a large one to
    the large program."""
    cfg = tiny_config()
    model, _ = build_models(cfg, ph_vocab=20, pitch_vocab=30, dur_vocab=12)
    tok, mel2ph = _score()
    params = _init(cfg, model, tok, mel2ph)
    art_dir = str(tmp_path / "art")
    meta = export_synthesis(cfg, model, params, art_dir,
                            buckets=[(24, 96), (48, 192)],
                            platforms=("cpu",))
    assert meta["buckets"] == [[24, 96], [48, 192]]
    syn = ExportedSynthesizer(art_dir)

    small_tok, small_m2p = _score(12, 48, seed=1)
    wav_small = syn(small_tok[0], small_tok[0] % 30, small_tok[0] % 12,
                    small_m2p[0])
    assert wav_small.shape == (48 * cfg.hop_size,)
    assert list(syn._calls) == [(24, 96)]

    big_tok, big_m2p = _score(40, 160, seed=2)
    wav_big = syn(big_tok[0], big_tok[0] % 30, big_tok[0] % 12, big_m2p[0])
    assert wav_big.shape == (160 * cfg.hop_size,)
    assert (48, 192) in syn._calls


def test_spk_embed_export_roundtrip(tmp_path):
    """use_spk_embed models export with the voice-embedding input; the
    loader result must match live synthesis AND actually depend on the
    embedding (two embeddings -> two waveforms)."""
    from visinger_tpu.utils.audio.spk_embed import SPK_EMBED_DIM

    cfg = tiny_config().replace(use_spk_embed=True)
    model, _ = build_models(cfg, ph_vocab=20, pitch_vocab=30, dur_vocab=12)
    tok, mel2ph = _score()
    emb = np.random.RandomState(3).randn(1, SPK_EMBED_DIM).astype(np.float32)
    params = _init(cfg, model, tok, mel2ph, spk_embed=emb)
    art_dir = str(tmp_path / "art")
    meta = export_synthesis(cfg, model, params, art_dir,
                            n_tokens=24, n_frames=96, platforms=("cpu",))
    assert meta["use_spk_embed"] is True
    assert meta["spk_embed_dim"] == SPK_EMBED_DIM
    syn = ExportedSynthesizer(art_dir)
    wav = syn(tok[0], tok[0] % 30, tok[0] % 12, mel2ph[0], seed=3,
              spk_embed=emb[0])
    direct = _synthesis_fn(model, use_spk_embed=True)(
        params, jnp.asarray(tok), jnp.asarray(tok % 30),
        jnp.asarray(tok % 12), jnp.asarray(mel2ph),
        jnp.zeros((1,), jnp.int32), jnp.asarray(emb), jnp.int32(3))
    np.testing.assert_allclose(wav, np.asarray(direct)[0, : len(wav)],
                               rtol=1e-5, atol=1e-5)
    wav_other = syn(tok[0], tok[0] % 30, tok[0] % 12, mel2ph[0], seed=3,
                    spk_embed=-emb[0])
    assert float(np.max(np.abs(wav - wav_other))) > 0
