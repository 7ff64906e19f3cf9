"""Model/state factory helpers shared by the trainer, tests, bench, and the
driver entry points."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from visinger_tpu.config import Config, load_config
from visinger_tpu.data.synthetic import synthetic_batch
from visinger_tpu.models.visinger import VISinger
from visinger_tpu.modules.discriminator import MultiPeriodDiscriminator
from visinger_tpu.training.train_state import TrainState, create_train_state


def build_models(cfg: Config, ph_vocab: int, pitch_vocab: int, dur_vocab: int):
    model = VISinger(cfg, ph_vocab=ph_vocab, pitch_vocab=pitch_vocab,
                     dur_vocab=dur_vocab)
    # "disc" in bf16_f32_islands forces the discriminators to f32 (the
    # bf16 warm-up bisect instrument — see models/visinger.py setup)
    disc_dtype = jnp.float32 \
        if "disc" in set(cfg.get("bf16_f32_islands", ()) or ()) \
        else jnp.dtype(cfg.get("compute_dtype", "float32"))
    disc = MultiPeriodDiscriminator(
        periods=tuple(cfg.disc_periods),
        s_base=int(cfg.get("disc_s_base", 16)),
        p_channels=tuple(cfg.get("disc_p_channels", (32, 128, 512, 1024))),
        dtype=disc_dtype,
        use_spectral_norm=bool(cfg.get("use_spectral_norm", False)),
        grouped_impl=str(cfg.get("grouped_conv_impl", "native")),
        pair_batch=bool(cfg.get("disc_pair_batch", True)))
    return model, disc


def init_params(cfg: Config, model, disc, batch: dict, seed: int = 0):
    rng = jax.random.PRNGKey(seed)
    init_rngs = {"params": rng, "sample": rng, "dropout": rng}
    spec = batch.get("spec")
    if spec is None:
        from visinger_tpu.ops.stft import STFTParams, power_spectrogram

        spec = power_spectrogram(
            jnp.asarray(batch["wavs"]),
            STFTParams(cfg.fft_size, cfg.win_size, cfg.hop_size,
                       cfg.sample_rate, float(cfg.fmin), float(cfg.fmax),
                       cfg.num_mel_bins))
    # jit the inits: eager linen init dispatches hundreds of individual ops,
    # which is pathological through a remote-compile TPU tunnel.
    params_g = jax.jit(model.init, static_argnames=("infer",))(
        init_rngs,
        text_tokens=jnp.asarray(batch["text_tokens"]),
        pitch_tokens=jnp.asarray(batch["note_pitch"]),
        dur_tokens=jnp.asarray(batch["note_dur"]),
        mel2ph=jnp.asarray(batch["mel2ph"]),
        spk_embed=None if batch.get("spk_embed") is None
        else jnp.asarray(batch["spk_embed"]),
        spk_id=jnp.asarray(batch["spk_ids"]),
        f0=jnp.asarray(batch["f0"]),
        uv=jnp.asarray(batch["uv"]),
        spec=jnp.asarray(spec),
        lengths=jnp.asarray(batch["mel_lengths"]),
        infer=False,
    )["params"]
    wav = jnp.zeros((batch["wavs"].shape[0], cfg.segment_size * cfg.hop_size))
    params_d = jax.jit(disc.init)(rng, wav, wav)["params"]
    return params_g, params_d


def init_state(cfg: Config, model, disc, batch: dict, seed: int = 0) -> TrainState:
    params_g, params_d = init_params(cfg, model, disc, batch, seed)
    return create_train_state(cfg, params_g, params_d, jax.random.PRNGKey(seed + 1))


def tiny_config(**overrides) -> Config:
    """A fast-to-compile config for unit tests (keeps all structure)."""
    cfg = load_config(name="visinger_csd").replace(
        enc_layers=1,
        frame_prior_layers=1,
        pitch_predictor_layers=1,
        phoneme_predictor_layers=1,
        posterior_wn_layers=2,
        flow_n_flows=2,
        flow_wn_layers=1,
        ffn_filter_channels=32,
        hidden_size=16,
        num_heads=2,
        initial_upsample_channels=32,  # must exceed 2**len(upsample_rates)
        gin_channels=8,
        segment_size=8,
        steps_per_epoch=4,
        disc_periods=[2, 3],
        disc_s_base=4,
        disc_p_channels=[8, 16, 32, 32],
    )
    return cfg.replace(**overrides) if overrides else cfg


def tiny_batch(cfg: Config, batch_size: int = 2, n_tokens: int = 12,
               n_frames: int = 64, seed: int = 0) -> dict:
    raw = synthetic_batch(batch_size, n_tokens, n_frames,
                          num_linear_bins=cfg.num_linear_bins,
                          hop_size=cfg.hop_size, seed=seed)
    return {k: jnp.asarray(v) for k, v in raw.items()}
