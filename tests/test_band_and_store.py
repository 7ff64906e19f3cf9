"""Targeted tests: banded skew-trick conversions and the device store."""

import jax
import jax.numpy as jnp
import numpy as np

from visinger_tpu.modules.transformer import band_to_dense, dense_to_band


def _naive_band_to_dense(rel, w):
    *lead, t, m = rel.shape
    out = np.zeros((*lead, t, t), np.float32)
    it = np.ndindex(*lead) if lead else [()]
    for b in it:
        for i in range(t):
            for d in range(m):
                j = i + d - w
                if 0 <= j < t:
                    out[b + (i, j)] = rel[b + (i, d)]
    return out


def test_band_to_dense_matches_naive():
    rng = np.random.RandomState(0)
    for t, w in [(6, 2), (9, 4), (16, 4)]:
        rel = rng.randn(2, 3, t, 2 * w + 1).astype(np.float32)
        got = np.asarray(band_to_dense(jnp.asarray(rel), w))
        np.testing.assert_allclose(got, _naive_band_to_dense(rel, w), atol=1e-6)


def test_dense_to_band_roundtrip():
    rng = np.random.RandomState(1)
    t, w = 12, 4
    p = rng.randn(2, 2, t, t).astype(np.float32)
    band = np.asarray(dense_to_band(jnp.asarray(p), w))
    for i in range(t):
        for d in range(2 * w + 1):
            j = i + d - w
            expect = p[..., i, j] if 0 <= j < t else 0.0
            np.testing.assert_allclose(band[..., i, d], expect, atol=1e-6)
    # adjoint property: <band_to_dense(x), y> == <x, dense_to_band(y)>
    x = rng.randn(t, 2 * w + 1).astype(np.float32)
    y = rng.randn(t, t).astype(np.float32)
    lhs = float(jnp.sum(band_to_dense(jnp.asarray(x), w) * y))
    rhs = float(jnp.sum(jnp.asarray(x) * dense_to_band(jnp.asarray(y), w)))
    assert abs(lhs - rhs) < 1e-3


def test_band_to_dense_grad_has_no_scatter():
    t, w = 32, 4
    f = jax.jit(jax.grad(lambda r: jnp.sum(band_to_dense(r, w) ** 2)))
    txt = f.lower(jnp.ones((t, 2 * w + 1))).as_text()
    assert "scatter" not in txt, "backward must stay scatter-free"


def test_device_store_matches_host_collate(tmp_path):
    from visinger_tpu.data.binarizer import Binarizer
    from visinger_tpu.data.dataset import VISingerDataset
    from visinger_tpu.data.device_store import DeviceStore, gather_batch
    from visinger_tpu.data.synthetic_corpus import generate_corpus
    from visinger_tpu.models.factory import tiny_config

    processed, binary = str(tmp_path / "p"), str(tmp_path / "b")
    generate_corpus(processed, n_items=6, seed=2)
    cfg = tiny_config().replace(
        processed_data_dir=processed, binary_data_dir=binary,
        frame_buckets=[512], token_buckets=[64], max_frames=512,
        max_sentences=2, ship_wav_int16=False)
    cfg = cfg.replace(binarization_args=cfg.binarization_args.to_dict() | {
        "train_range": [1, -1], "valid_range": [0, 1], "test_range": [0, 1],
        "min_text": 2})
    Binarizer(cfg).process()
    ds = VISingerDataset(cfg, "train")
    store = DeviceStore(ds)
    plans = store.plan_batches(shuffle=False)
    idxs, t_b, n_b = plans[0]
    got = jax.jit(lambda a, i: gather_batch(a, i, t_b, n_b, cfg.hop_size))(
        store.arrays, jnp.asarray(idxs))

    # host collate of the same items, padded to the same buckets
    items = [ds[int(i)] for i in idxs]
    ref = ds.collate(items, frame_buckets=[t_b], token_buckets=[n_b])
    for k in ("text_tokens", "note_pitch", "note_dur", "mel2ph",
              "mel_lengths", "text_lengths", "spk_ids"):
        np.testing.assert_array_equal(np.asarray(got[k]), ref[k], err_msg=k)
    np.testing.assert_allclose(np.asarray(got["f0"]), ref["f0"], atol=1e-6)
    np.testing.assert_allclose(np.asarray(got["uv"]), ref["uv"], atol=1e-6)
    np.testing.assert_allclose(np.asarray(got["wavs"]), ref["wavs"], atol=2e-4)
