"""Sequence-parallel synthesis: time-sharded infer over an 8-device CPU mesh
must match single-device output (parallel/sp.py).  The reference has no
multi-device inference; this is the TPU-native long-score serving path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visinger_tpu.models.factory import build_models, init_params, tiny_config
from visinger_tpu.data.synthetic import synthetic_batch
from visinger_tpu.parallel.sp import (
    jit_sp_infer,
    make_sp_mesh,
    pad_frames_for_mesh,
)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8-device mesh")
def test_sp_infer_matches_single_device():
    cfg = tiny_config()
    raw = synthetic_batch(2, 12, 64, num_linear_bins=cfg.num_linear_bins,
                          hop_size=cfg.hop_size)
    batch = {k: jnp.asarray(v) for k, v in raw.items()}
    model, disc = build_models(cfg, ph_vocab=40, pitch_vocab=96, dur_vocab=64)
    pg, _ = init_params(cfg, model, disc, batch)

    mesh = make_sp_mesh(jax.devices()[:8])
    t = int(batch["mel2ph"].shape[1])
    assert pad_frames_for_mesh(t, mesh) == t  # 64 divides 8
    assert pad_frames_for_mesh(t + 1, mesh) == t + 8

    rng = jax.random.PRNGKey(7)
    args = (pg, batch["text_tokens"], batch["note_pitch"], batch["note_dur"],
            batch["mel2ph"], batch["spk_ids"], rng)

    def single(params, tt, pt, dt, m2p, spk, key):
        out = model.apply({"params": params}, text_tokens=tt,
                          pitch_tokens=pt, dur_tokens=dt, mel2ph=m2p,
                          spk_id=spk, infer=True, deterministic=True,
                          rngs={"sample": key})
        return out["wav_out"]

    ref = np.asarray(jax.jit(single)(*args))

    sp_fn = jit_sp_infer(model, mesh)
    wav = sp_fn(*args)
    # the output really is sharded over the mesh's time axis
    assert len(wav.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(wav), ref, atol=2e-4)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8-device mesh")
def test_sp_infer_spk_embed_matches_single_device():
    """use_spk_embed models serve through SP too (VERDICT r2 #8): the voice
    embedding rides replicated and the sharded output still matches the
    single-device waveform — and actually depends on the embedding."""
    from visinger_tpu.utils.audio.spk_embed import SPK_EMBED_DIM

    cfg = tiny_config().replace(use_spk_embed=True)
    raw = synthetic_batch(2, 12, 64, num_linear_bins=cfg.num_linear_bins,
                          hop_size=cfg.hop_size)
    emb = np.random.RandomState(5).randn(2, SPK_EMBED_DIM).astype(np.float32)
    raw["spk_embed"] = emb
    batch = {k: jnp.asarray(v) for k, v in raw.items()}
    model, disc = build_models(cfg, ph_vocab=40, pitch_vocab=96, dur_vocab=64)
    pg, _ = init_params(cfg, model, disc, raw)

    mesh = make_sp_mesh(jax.devices()[:8])
    rng = jax.random.PRNGKey(7)
    args = (pg, batch["text_tokens"], batch["note_pitch"], batch["note_dur"],
            batch["mel2ph"], batch["spk_ids"], batch["spk_embed"], rng)

    def single(params, tt, pt, dt, m2p, spk, se, key):
        out = model.apply({"params": params}, text_tokens=tt,
                          pitch_tokens=pt, dur_tokens=dt, mel2ph=m2p,
                          spk_id=spk, spk_embed=se, infer=True,
                          deterministic=True, rngs={"sample": key})
        return out["wav_out"]

    ref = np.asarray(jax.jit(single)(*args))
    sp_fn = jit_sp_infer(model, mesh, use_spk_embed=True)
    wav = sp_fn(*args)
    assert len(wav.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(wav), ref, atol=2e-4)
    # flipping the embedding must change the waveform (it is not dropped)
    flipped = np.asarray(sp_fn(*args[:6], -batch["spk_embed"], rng))
    assert float(np.max(np.abs(flipped - np.asarray(wav)))) > 0
