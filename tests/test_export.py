"""AOT serving export (infer/export.py): the serialized StableHLO synthesis
program must load without model source and reproduce the live path exactly.

No reference equivalent — the reference rebuilds the torch model from source
at inference load (inference/visinger.py:20-38); this is the TPU-native
deployment artifact.
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


@pytest.fixture(scope="module")
def exported(tmp_path_factory):
    cfg = tiny_config()
    model, _ = build_models(cfg, ph_vocab=20, pitch_vocab=30, dur_vocab=12)
    n_tok, n_frames = 24, 96
    rng = np.random.RandomState(0)
    tok = rng.randint(1, 20, (1, n_tok)).astype(np.int32)
    mel2ph = np.minimum(np.arange(n_frames) // (n_frames // n_tok) + 1,
                        n_tok).astype(np.int32)[None]
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        text_tokens=jnp.asarray(tok), pitch_tokens=jnp.asarray(tok % 30),
        dur_tokens=jnp.asarray(tok % 12), mel2ph=jnp.asarray(mel2ph),
        spk_id=jnp.zeros((1,), jnp.int32), infer=True,
        deterministic=True)["params"]
    art_dir = str(tmp_path_factory.mktemp("artifact"))
    meta = export_synthesis(cfg, model, params, art_dir,
                            n_tokens=n_tok, n_frames=n_frames,
                            platforms=("cpu", "tpu"))
    return cfg, model, params, tok, mel2ph, art_dir, meta


def test_export_writes_versioned_artifact(exported):
    import os

    *_, art_dir, meta = exported
    for fn in ("synthesis.jaxexport", "params.msgpack", "meta.json"):
        assert os.path.exists(os.path.join(art_dir, fn))
    assert meta["platforms"] == ["cpu", "tpu"]  # one artifact, both targets
    assert meta["n_tokens"] == 24 and meta["n_frames"] == 96


def test_exported_matches_live_synthesis(exported):
    cfg, model, params, tok, mel2ph, art_dir, meta = exported
    syn = ExportedSynthesizer(art_dir)
    wav = syn(tok[0], tok[0] % 30, tok[0] % 12, mel2ph[0], seed=3)
    direct = _synthesis_fn(model)(
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
    with pytest.raises(ValueError, match="exceeds the exported bucket"):
        syn(big, big, big, big)
