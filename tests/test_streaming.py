"""Streaming (chunked) synthesis: halo bounds, the infer-path split, and
sample-exactness of chunked decoding vs the full-length program
(infer/streaming.py; model split in models/visinger.py infer_prior /
decode_frames)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visinger_tpu.infer.streaming import (
    StreamingSynthesizer,
    decoder_halo_frames,
    flow_halo_frames,
    halo_frames,
)
from visinger_tpu.models.factory import (
    build_models,
    init_params,
    tiny_batch,
    tiny_config,
)


def _setup(n_frames=128):
    # long enough that chunk windows (chunk + 2*halo) fit inside the score
    cfg = tiny_config()
    batch = tiny_batch(cfg, n_frames=n_frames)
    model, disc = build_models(cfg, 40, 96, 64)
    raw = {k: np.asarray(v) for k, v in batch.items()}
    params_g, _ = init_params(cfg, model, disc, raw)
    return cfg, model, params_g, batch


def _full_infer(model, params_g, batch, rng):
    out = model.apply(
        {"params": params_g}, text_tokens=batch["text_tokens"],
        pitch_tokens=batch["note_pitch"], dur_tokens=batch["note_dur"],
        mel2ph=batch["mel2ph"], spk_id=batch["spk_ids"],
        infer=True, deterministic=True, rngs={"sample": rng})
    return out["wav_out"]


def test_halo_bounds():
    cfg = tiny_config()
    f, d = flow_halo_frames(cfg), decoder_halo_frames(cfg)
    assert f > 0 and d > 0
    assert halo_frames(cfg) == f + d
    # csd recipe: flow = 4 couplings x 4 layers x (5//2) = 32
    from visinger_tpu.config import load_config

    csd = load_config(name="visinger_csd")
    assert flow_halo_frames(csd) == 32
    assert 10 <= decoder_halo_frames(csd) <= 64  # analytic, conservative


def test_two_stage_split_matches_full_infer():
    """decode_frames(infer_prior(...)) == __call__(infer=True) with the
    same 'sample' key — the refactor draws the identical prior noise."""
    cfg, model, params_g, batch = _setup()
    rng = jax.random.PRNGKey(7)
    wav_full = _full_infer(model, params_g, batch, rng)
    z_p, mask = model.apply(
        {"params": params_g}, batch["text_tokens"], batch["note_pitch"],
        batch["note_dur"], batch["mel2ph"], spk_id=batch["spk_ids"],
        method="infer_prior", rngs={"sample": rng})
    wav_split = model.apply(
        {"params": params_g}, z_p, mask, spk_id=batch["spk_ids"],
        method="decode_frames")
    np.testing.assert_allclose(np.asarray(wav_split), np.asarray(wav_full),
                               atol=1e-5)


@pytest.mark.parametrize("chunk", [16, 24])  # 24 does not divide T=128
def test_chunked_decode_equals_full(chunk):
    cfg, model, params_g, batch = _setup()
    rng = jax.random.PRNGKey(3)
    wav_full = _full_infer(model, params_g, batch, rng)
    synth = StreamingSynthesizer(cfg, model, chunk_frames=chunk)
    wav_stream = synth.synthesize(params_g, batch, rng)
    assert wav_stream.shape == wav_full.shape
    np.testing.assert_allclose(np.asarray(wav_stream), np.asarray(wav_full),
                               atol=2e-5)


def test_one_chunk_program_serves_any_length():
    """Different score lengths hit the SAME compiled chunk program (the
    whole point: full-length decoding needs one program per bucket)."""
    cfg, model, params_g, _ = _setup()
    synth = StreamingSynthesizer(cfg, model, chunk_frames=16)
    h = cfg.hidden_size
    window = synth.chunk + 2 * synth.halo
    size_after_first = None
    # includes SHORT scores (t <= window): they pad up to the one window
    # shape instead of compiling per distinct length (round-4 ADVICE)
    for t in (window + 10, 128, 173, window - 3, window // 2):
        z = jnp.asarray(np.random.RandomState(t).randn(1, t, h), jnp.float32)
        mask = jnp.ones((1, t, 1), jnp.float32)
        wav = synth.decode(params_g, z, mask)
        assert wav.shape == (1, t * cfg.hop_size)
        if hasattr(synth._chunk_fn, "_cache_size"):
            if size_after_first is None:
                size_after_first = synth._chunk_fn._cache_size()
            else:  # later lengths must not add compilations
                assert synth._chunk_fn._cache_size() == size_after_first


def test_chunked_decode_spk_embed_model():
    """Voice-embedding models: spk_embed conditioning threads through the
    chunk program (the 1x1 cond conv is pointwise, so chunking stays
    exact)."""
    from visinger_tpu.utils.audio.spk_embed import SPK_EMBED_DIM

    cfg = tiny_config(use_spk_embed=True)
    batch = dict(tiny_batch(cfg, n_frames=128))
    batch["spk_embed"] = jnp.asarray(
        np.random.RandomState(0).randn(2, SPK_EMBED_DIM), jnp.float32)
    model, disc = build_models(cfg, 40, 96, 64)
    raw = {k: np.asarray(v) for k, v in batch.items()}
    params_g, _ = init_params(cfg, model, disc, raw)
    rng = jax.random.PRNGKey(5)
    out = model.apply(
        {"params": params_g}, text_tokens=batch["text_tokens"],
        pitch_tokens=batch["note_pitch"], dur_tokens=batch["note_dur"],
        mel2ph=batch["mel2ph"], spk_id=batch["spk_ids"],
        spk_embed=batch["spk_embed"], infer=True, deterministic=True,
        rngs={"sample": rng})
    synth = StreamingSynthesizer(cfg, model, chunk_frames=16)
    wav_stream = synth.synthesize(params_g, batch, rng)
    np.testing.assert_allclose(np.asarray(wav_stream),
                               np.asarray(out["wav_out"]), atol=2e-5)


def test_halo_is_sufficient_not_vacuous():
    """The analytic halo is tight enough to matter: decoding with halo 0
    must NOT match the full program (otherwise the exactness test above
    proves nothing)."""
    cfg, model, params_g, batch = _setup()
    rng = jax.random.PRNGKey(3)
    wav_full = _full_infer(model, params_g, batch, rng)
    z_p, mask = model.apply(
        {"params": params_g}, batch["text_tokens"], batch["note_pitch"],
        batch["note_dur"], batch["mel2ph"], spk_id=batch["spk_ids"],
        method="infer_prior", rngs={"sample": rng})
    synth0 = StreamingSynthesizer(cfg, model, chunk_frames=16, halo=0)
    wav0 = synth0.decode(params_g, z_p, mask, spk_id=batch["spk_ids"])
    assert not np.allclose(np.asarray(wav0), np.asarray(wav_full), atol=2e-5)
