"""Binarizer optional features: with_spk_embed + with_f0cwt (VERDICT #7).

Reference parity targets: base_binarizer.py:154-160,369-370 (resemblyzer
voice embedding -> model use_spk_embed projection) and :309-316 (CWT f0
decomposition — helpers absent upstream; native impl in utils/audio/cwt.py).
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visinger_tpu.data.binarizer import Binarizer
from visinger_tpu.data.dataset import VISingerDataset
from visinger_tpu.data.synthetic_corpus import generate_corpus
from visinger_tpu.models.factory import build_models, init_state, tiny_config
from visinger_tpu.training.train_step import make_train_step
from visinger_tpu.utils.audio.cwt import (
    get_cont_logf0,
    get_logf0_cwt,
    inverse_cwt,
)
from visinger_tpu.utils.audio.spk_embed import (
    SPK_EMBED_DIM,
    extract_spk_embed,
    mel_stats_embed,
)


def test_mel_stats_embed_shape_norm_determinism():
    rng = np.random.RandomState(0)
    wav = rng.randn(24000).astype(np.float32) * 0.1
    e1 = mel_stats_embed(wav, 24000)
    e2 = extract_spk_embed("mel_stats", wav, 24000)
    assert e1.shape == (SPK_EMBED_DIM,) and e1.dtype == np.float32
    assert abs(np.linalg.norm(e1) - 1.0) < 1e-5
    np.testing.assert_allclose(e1, e2)
    # different spectral content -> different embedding
    t = np.arange(24000) / 24000
    tone = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    e3 = mel_stats_embed(tone, 24000)
    assert np.dot(e1, e3) < 0.99


def test_unknown_extractor_raises():
    with pytest.raises(ValueError, match="unknown spk_embed"):
        extract_spk_embed("nope", np.zeros(1000), 24000)


def test_cont_logf0_interpolates_unvoiced():
    f0 = np.array([0, 0, 100, 0, 0, 200, 0, 0], float)
    uv, cont = get_cont_logf0(f0)
    assert uv.tolist() == [1, 1, 0, 1, 1, 0, 1, 1]
    assert np.isfinite(cont).all()
    # interior gap interpolates between log(100) and log(200)
    assert np.log(100) < cont[4] < np.log(200)
    # edges hold the nearest voiced value
    assert cont[0] == pytest.approx(np.log(100))
    assert cont[-1] == pytest.approx(np.log(200))


def test_cwt_decomposition_and_inverse():
    t = np.arange(600)
    # slow contour + fast vibrato, like a sung phrase
    lf0 = 0.5 * np.sin(2 * np.pi * t / 400) + 0.1 * np.sin(2 * np.pi * t / 20)
    lf0 = (lf0 - lf0.mean()) / lf0.std()
    spec, scales = get_logf0_cwt(lf0)
    assert spec.shape == (600, 10) and len(scales) == 10
    assert np.isfinite(spec).all()
    # fine scales carry the vibrato, coarse scales the phrase contour
    assert np.abs(spec[:, 0]).max() > 0 and np.abs(spec[:, -1]).max() > 0
    rec = inverse_cwt(spec)
    # empirical inverse: reconstruction correlates with the input contour
    corr = np.corrcoef(rec, lf0)[0, 1]
    assert corr > 0.5, corr


@pytest.fixture(scope="module")
def featured_corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus_feat")
    processed = str(root / "processed")
    binary = str(root / "binary")
    generate_corpus(processed, n_items=4, seed=1)
    cfg = tiny_config().replace(
        processed_data_dir=processed,
        binary_data_dir=binary,
        frame_buckets=[64, 128, 192, 256, 320, 384, 448, 512],
        token_buckets=[16, 32, 48, 64],
        max_frames=512,
        use_spk_embed=True,
    )
    cfg = cfg.replace(binarization_args=cfg.binarization_args.to_dict() | {
        "train_range": [1, -1], "valid_range": [0, 1], "test_range": [0, 1],
        "min_text": 2, "with_spk_embed": True, "with_f0cwt": True,
    })
    Binarizer(cfg).process()
    return cfg, binary


def test_binarize_with_features(featured_corpus):
    cfg, binary = featured_corpus
    from visinger_tpu.data.record_store import RecordReader

    rec = RecordReader(f"{binary}/train")[0]
    assert rec["spk_embed"].shape == (SPK_EMBED_DIM,)
    assert abs(np.linalg.norm(rec["spk_embed"]) - 1.0) < 1e-4
    assert rec["cwt_spec"].shape == (rec["len"], 10)
    assert np.isfinite(rec["cwt_spec"].astype(np.float32)).all()
    assert np.isfinite([rec["cwt_mean"], rec["cwt_std"]]).all()


def test_spk_embed_flows_to_batch_and_train_step(featured_corpus):
    cfg, binary = featured_corpus
    ds = VISingerDataset(cfg, "train")
    item = ds[0]
    assert "spk_embed" in item
    batch = next(ds.batches(shuffle=False))
    assert batch["spk_embed"].shape == (cfg.max_sentences, SPK_EMBED_DIM)

    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    with open(f"{binary}/pitch_map.json") as f:
        pv = len(json.load(f))
    with open(f"{binary}/dur_map.json") as f:
        dv = len(json.load(f))
    from visinger_tpu.utils.text.token_encoder import build_token_encoder

    enc = build_token_encoder(f"{binary}/phone_set.json")
    model, disc = build_models(cfg, ph_vocab=len(enc), pitch_vocab=pv,
                               dur_vocab=dv)
    state = init_state(cfg, model, disc, jb)
    # the projection layer must exist when use_spk_embed is on
    assert "spk_embed_proj" in state.params_g
    step_fn = jax.jit(make_train_step(cfg, model, disc))
    state, metrics = step_fn(state, jb)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, float(v))


def test_device_store_carries_spk_embed(featured_corpus):
    cfg, _ = featured_corpus
    from visinger_tpu.data.device_store import DeviceStore, gather_batch

    ds = VISingerDataset(cfg, "train")
    store = DeviceStore(ds)
    assert "spk_embed" in store.arrays
    idxs, t_b, n_b = store.plan_batches(shuffle=False)[0]
    batch = gather_batch(store.arrays, jnp.asarray(idxs), t_b, n_b,
                         cfg.hop_size)
    assert batch["spk_embed"].shape == (len(idxs), SPK_EMBED_DIM)
