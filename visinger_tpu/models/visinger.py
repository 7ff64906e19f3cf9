"""VISinger model assembly (Zhang et al., 2022) — TPU-native.

Parity target: reference models/visinger.py:18-135.  Train path:
score encoder -> length regulate -> +sinusoidal positions -> speaker embed ->
pitch predictor (teacher-forced log-f0 as prior condition, predictor_grad
stop-gradient mix) -> frame prior (mu_p, logs_p) -> posterior encoder on the
linear spectrogram (z_q) -> phoneme CTC head -> flow z_q -> z_p ->
KL(masked mean) -> random 32-frame slice of z_q -> HiFi-GAN decode.
Infer path: z_p ~ N(mu_p, e^{2 logs_p}) -> flow reverse -> full-length decode.

Randomness is drawn from linen RNG streams: 'sample' (posterior/prior noise,
slice offsets) and 'dropout'.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from visinger_tpu.modules.common import positional_embedding
from visinger_tpu.modules.encoders import (
    FramePriorNetwork,
    PhonemePredictor,
    PitchPredictor,
    PosteriorEncoder,
    TextEncoder,
)
from visinger_tpu.modules.flow import ResidualCouplingBlock
from visinger_tpu.modules.hifigan import HiFiGANGenerator
from visinger_tpu.ops.masking import rand_slice_segments


class VISinger(nn.Module):
    """Config-driven assembly; ``cfg`` is a visinger_tpu Config."""

    cfg: Any
    ph_vocab: int
    pitch_vocab: int
    dur_vocab: int

    def setup(self):
        cfg = self.cfg
        h = cfg.hidden_size
        dtype = jnp.dtype(cfg.get("compute_dtype", "float32"))
        # bf16_f32_islands: subsystem names forced to f32 compute while the
        # rest runs compute_dtype — the bisect instrument for the bf16
        # warm-up gradient transient (round-4 VERDICT weak #5; driven by
        # tools/bf16_islands.py).  Names: text_encoder, pitch, phoneme,
        # frame_prior, posterior, flow, decoder.
        islands = set(cfg.get("bf16_f32_islands", ()) or ())

        def dt(name):
            return jnp.float32 if name in islands else dtype
        # attention lowering for every relative-position encoder stack:
        # "auto" | "legacy" | "einsum" | "pallas" (modules/transformer.py
        # docstring).  auto = the fused Pallas kernel on TPU (1.27x full
        # train step, artifacts/parity/ab_r5.jsonl), the XLA legacy path on
        # CPU/GPU where Mosaic kernels cannot compile.
        attn_impl = str(cfg.get("attn_impl", "auto"))
        if attn_impl == "auto":
            attn_impl = ("pallas" if jax.default_backend() == "tpu"
                         else "legacy")
        self.text_encoder = TextEncoder(
            self.ph_vocab, self.pitch_vocab, self.dur_vocab, h,
            cfg.ffn_filter_channels, cfg.num_heads, cfg.enc_layers,
            cfg.ffn_kernel_size, cfg.p_dropout, use_pos_embed=True,
            dtype=dt("text_encoder"), attn_impl=attn_impl)
        if cfg.use_spk_id:
            self.spk_id_proj = nn.Embed(
                cfg.num_spk, cfg.gin_channels,
                embedding_init=nn.initializers.normal(cfg.gin_channels ** -0.5))
        if cfg.use_spk_embed:
            self.spk_embed_proj = nn.Dense(cfg.gin_channels)
        if cfg.use_pitch_embed:
            self.pitch_predictor = PitchPredictor(
                h, cfg.ffn_filter_channels, cfg.num_heads,
                cfg.pitch_predictor_layers, cfg.ffn_kernel_size, cfg.p_dropout,
                dtype=dt("pitch"), attn_impl=attn_impl)
        if cfg.use_phoneme_pred:
            self.phoneme_predictor = PhonemePredictor(
                self.ph_vocab, h, cfg.ffn_filter_channels, cfg.num_heads,
                cfg.phoneme_predictor_layers, cfg.ffn_kernel_size, cfg.p_dropout,
                dtype=dt("phoneme"), attn_impl=attn_impl)
        self.frame_prior = FramePriorNetwork(
            h, cfg.ffn_filter_channels, cfg.num_heads, cfg.frame_prior_layers,
            cfg.ffn_kernel_size, cfg.p_dropout, dtype=dt("frame_prior"),
            attn_impl=attn_impl)
        # use_pallas routes the WaveNet stacks (posterior + flow couplings)
        # through the fused Pallas kernel on eval/inference applies
        # (modules/wavenet.py; A/B numbers in tools/pallas_bench.py)
        use_pallas = bool(cfg.get("use_pallas", False))
        self.posterior_encoder = PosteriorEncoder(
            h, h, cfg.posterior_wn_kernel, 1, cfg.posterior_wn_layers,
            gin_channels=cfg.gin_channels, dtype=dt("posterior"),
            use_pallas=use_pallas,
            logs_clamp=float(cfg.get("logs_clamp", 0.0) or 0.0))
        self.flow = ResidualCouplingBlock(
            h, h, cfg.flow_wn_kernel, 1, cfg.flow_wn_layers,
            n_flows=cfg.flow_n_flows, gin_channels=cfg.gin_channels,
            dtype=dt("flow"), use_pallas=use_pallas)
        self.decoder = HiFiGANGenerator(
            resblock_type=str(cfg.dec_blocks),
            resblock_kernel_sizes=tuple(cfg.dec_kernel_size),
            resblock_dilations=tuple(tuple(d) for d in cfg.dec_dilation_sizes),
            upsample_rates=tuple(cfg.upsample_rates),
            upsample_initial_channel=cfg.initial_upsample_channels,
            upsample_kernel_sizes=tuple(cfg.upsample_kernel_sizes),
            gin_channels=cfg.gin_channels,
            time_fold=bool(cfg.get("decoder_time_fold", False)),
            polyphase=bool(cfg.get("decoder_polyphase", False)),
            dtype=dt("decoder"))

    def speaker_embedding(self, spk_embed, spk_id):
        """-> [B, 1, gin] or None (models/visinger.py:114-121)."""
        g = None
        if self.cfg.use_spk_embed and spk_embed is not None:
            g = self.spk_embed_proj(spk_embed)[:, None, :]
        if self.cfg.use_spk_id and spk_id is not None:
            e = self.spk_id_proj(spk_id)[:, None, :]
            g = e if g is None else g + e
        return g

    def forward_pitch(self, pitch_inp, f0, uv, spk_emb, tgt_nonpadding,
                      deterministic):
        """Pitch prediction + teacher-forced conditioning signal
        (models/visinger.py:123-135).  Returns (cond_f0 [B,T,1], f0_pred)."""
        grad_scale = self.cfg.predictor_grad
        if grad_scale != 1:
            sg = jax.lax.stop_gradient(pitch_inp)
            pitch_inp = sg + grad_scale * (pitch_inp - sg)
        pitch_pred = self.pitch_predictor(
            pitch_inp, tgt_nonpadding, spk_emb, deterministic=deterministic)
        if f0 is None:
            f0 = pitch_pred[..., 0]
            v = pitch_pred[..., 1] <= 0  # predicted voiced flag
        else:
            v = uv == 0
        cond = (f0 * v.astype(f0.dtype))[..., None] * tgt_nonpadding
        return cond, pitch_pred

    def __call__(self, text_tokens, pitch_tokens, dur_tokens, mel2ph,
                 spk_embed=None, spk_id=None, f0=None, uv=None, spec=None,
                 lengths=None, item_weights=None, infer: bool = False,
                 deterministic: bool = True) -> dict:
        """Args mirror reference forward (models/visinger.py:71-112); ``spec``
        is the linear spectrogram [B, T_frame, num_linear_bins] (train only),
        ``lengths`` the valid frame counts used for slice sampling,
        ``item_weights`` [B] optional validity weights (0 masks an item out
        of the KL reduction — used for batch-padding duplicates)."""
        cfg = self.cfg
        ret: dict = {}
        tgt_nonpadding = (mel2ph > 0).astype(jnp.float32)[..., None]  # [B,T,1]
        prior_inp = self.text_encoder(
            text_tokens, pitch_tokens, dur_tokens, mel2ph,
            deterministic=deterministic) * tgt_nonpadding
        if cfg.use_pos_embed:
            prior_inp = prior_inp + positional_embedding(
                tgt_nonpadding[..., 0], cfg.hidden_size)
        spk_emb = self.speaker_embedding(spk_embed, spk_id)
        cond_pitch = None
        if cfg.use_pitch_embed:
            cond_pitch, ret["f0_pred"] = self.forward_pitch(
                prior_inp, f0, uv, spk_emb, tgt_nonpadding, deterministic)
        mu_p, logs_p = self.frame_prior(
            prior_inp, tgt_nonpadding, g=cond_pitch, deterministic=deterministic)
        ret["mu_p"], ret["logs_p"] = mu_p, logs_p

        if not infer:
            z_q, mu_q, logs_q = self.posterior_encoder(
                spec, tgt_nonpadding, self.make_rng("sample"), g=spk_emb,
                deterministic=deterministic)
            if cfg.use_phoneme_pred:
                ret["ph_pred"] = self.phoneme_predictor(
                    z_q, tgt_nonpadding, deterministic=deterministic) * tgt_nonpadding
            z_p = self.flow(z_q, tgt_nonpadding, g=spk_emb,
                            deterministic=deterministic).astype(jnp.float32) \
                * tgt_nonpadding
            ret["z_p"] = z_p
            # posterior stats exposed for diagnostics (KL-spike tracing)
            ret["z_q"], ret["mu_q"], ret["logs_q"] = z_q, mu_q, logs_q
            # Optional robustness clamp (off by default for reference parity,
            # models/visinger.py:100-101 has the raw exp(-2 logs_p)): very
            # negative logs_p early in training blows KL up to ~1e10 for a
            # step; clamping |logs| <= logs_clamp bounds exp(-2 logs_p).
            logs_clamp = float(cfg.get("logs_clamp", 0.0) or 0.0)
            if logs_clamp > 0:
                logs_p = jnp.clip(logs_p, -logs_clamp, logs_clamp)
                logs_q = jnp.clip(logs_q, -logs_clamp, logs_clamp)
            kl = (logs_p - logs_q - 0.5) \
                + 0.5 * jnp.square(z_p - mu_p) * jnp.exp(-2.0 * logs_p)
            # Reference normalization (models/visinger.py:100-101): numerator
            # sums channels AND frames, denominator counts valid frames only
            # — i.e. per-frame channel-summed KL averaged over frames.
            kl_mask = tgt_nonpadding
            if item_weights is not None:
                kl_mask = kl_mask * item_weights.astype(jnp.float32)[:, None, None]
            ret["kl"] = jnp.sum(kl * kl_mask) / jnp.maximum(
                jnp.sum(kl_mask), 1.0)
            # Reference rand_slice_segments draws ids over the PADDED batch
            # length (modules/commons/utils.py:95-100), so with bucketed
            # padding a large fraction of GAN slices are pure padding; by
            # default we draw inside each item's valid length instead (the
            # padded regime measurably weakens the discriminator — see
            # PARITY.md "GAN balance").  slice_ref_padded: true restores the
            # reference regime for trajectory-parity runs.
            slice_lengths = None if cfg.get("slice_ref_padded", False) \
                else lengths
            z_slice, ids_slice = rand_slice_segments(
                self.make_rng("sample"), z_q, cfg.segment_size, slice_lengths)
            ret["ids_slice"] = ids_slice
            ret["wav_out"] = self.decoder(z_slice, g=spk_emb)
        else:
            eps = jax.random.normal(self.make_rng("sample"), mu_p.shape, mu_p.dtype)
            z_p = (mu_p + eps * jnp.exp(logs_p)) * tgt_nonpadding
            ret["wav_out"] = self.decode_frames(
                z_p, tgt_nonpadding, spk_embed=spk_embed, spk_id=spk_id,
                deterministic=deterministic)
        return ret

    # ------------------------------------------------------------------
    # Split infer path for streaming synthesis (infer/streaming.py): the
    # global-attention stage runs full-length once; the purely-convolutional
    # tail (finite receptive field) can then be decoded on halo-padded
    # fixed-shape chunks — one compiled chunk program for any score length.
    def infer_prior(self, text_tokens, pitch_tokens, dur_tokens, mel2ph,
                    spk_embed=None, spk_id=None, deterministic: bool = True):
        """Score -> sampled prior latent (everything that needs global
        attention: text encoder, pitch predictor, frame prior).  Returns
        (z_p [B,T,H], tgt_nonpadding [B,T,1]).  Mirrors the infer branch of
        __call__ up to the z_p sample — same single draw from the 'sample'
        stream, so `decode_frames(*infer_prior(...))` reproduces
        `__call__(infer=True)` exactly."""
        cfg = self.cfg
        tgt_nonpadding = (mel2ph > 0).astype(jnp.float32)[..., None]
        prior_inp = self.text_encoder(
            text_tokens, pitch_tokens, dur_tokens, mel2ph,
            deterministic=deterministic) * tgt_nonpadding
        if cfg.use_pos_embed:
            prior_inp = prior_inp + positional_embedding(
                tgt_nonpadding[..., 0], cfg.hidden_size)
        spk_emb = self.speaker_embedding(spk_embed, spk_id)
        cond_pitch = None
        if cfg.use_pitch_embed:
            cond_pitch, _ = self.forward_pitch(
                prior_inp, None, None, spk_emb, tgt_nonpadding, deterministic)
        mu_p, logs_p = self.frame_prior(
            prior_inp, tgt_nonpadding, g=cond_pitch,
            deterministic=deterministic)
        eps = jax.random.normal(self.make_rng("sample"), mu_p.shape,
                                mu_p.dtype)
        z_p = (mu_p + eps * jnp.exp(logs_p)) * tgt_nonpadding
        return z_p, tgt_nonpadding

    def decode_frames(self, z_p, tgt_nonpadding, spk_embed=None, spk_id=None,
                      deterministic: bool = True):
        """Local tail of the infer path: flow reverse + HiFi-GAN decode ->
        waveform [B, T*hop].  Pure convs with a finite receptive field
        (`infer.streaming.halo_frames`), so running it on halo-padded chunks
        is sample-exact."""
        spk_emb = self.speaker_embedding(spk_embed, spk_id)
        z_q = self.flow(z_p, tgt_nonpadding, g=spk_emb, reverse=True,
                        deterministic=deterministic).astype(jnp.float32) \
            * tgt_nonpadding
        return self.decoder(z_q * tgt_nonpadding, g=spk_emb)
