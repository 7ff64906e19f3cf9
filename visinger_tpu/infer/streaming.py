"""Streaming (chunked) synthesis: one fixed-shape decode program for any
score length.

The infer path splits at the prior latent z_p (models/visinger.py
``infer_prior`` / ``decode_frames``):

- the **global stage** (text encoder, pitch predictor, frame prior — the
  attention layers that need the whole score) runs once at frame rate on
  the bucketed full-length program; it is a tiny fraction of synthesis
  compute;
- the **local tail** (flow reverse + HiFi-GAN decode — pure finite-
  receptive-field convolutions, where ~all the FLOPs are) runs
  chunk-by-chunk at ONE fixed shape ``[B, halo + chunk + halo, H]``.

Why this is the TPU-native shape of the problem: a single compiled chunk
program serves every score length (full-length decoding needs one
program per frame bucket, at minutes per compile on a fresh shape),
device memory for the waveform-rate activations is constant in score
length, and latency to first audio is one chunk instead of the full
score.

Exactness: every conv in the tail is same-padded and shift-equivariant,
so an output sample computed inside a chunk equals the full-length
program's sample as long as the chunk carries the op's full receptive
field — ``halo_frames(cfg)`` is a conservative analytic bound on that
radius (flow WaveNets + the decoder's transposed-conv/MRF cascade).
Windows are clamped to lie fully inside the score (see ``decode``), so
interior kept regions see true neighbouring frames and a window edge
only ever coincides with a true score edge, where the chunk program's
own SAME padding IS the full program's boundary semantics.
tests/test_streaming.py asserts the stitched waveform matches
full-length decoding to float tolerance (and that halo=0 does not —
the bound is doing real work).

No reference equivalent: inference/visinger.py:91-100 always decodes the
full score in one pass.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp


def flow_halo_frames(cfg) -> int:
    """Receptive radius (frames) of the flow stack in reverse mode.

    Each of ``flow_n_flows`` couplings runs one WaveNet
    (``flow_wn_layers`` layers, kernel ``flow_wn_kernel``, dilation
    ``dilation_rate ** layer``) over the untouched half — radius
    Σ_i (k//2)·d^i per coupling; couplings compose, radii add."""
    k = int(cfg.flow_wn_kernel)
    layers = int(cfg.flow_wn_layers)
    d = int(cfg.get("flow_wn_dilation_rate", 1))
    per_coupling = sum((k // 2) * (d ** i) for i in range(layers))
    return int(cfg.flow_n_flows) * per_coupling


def decoder_halo_frames(cfg) -> int:
    """Receptive radius of the HiFi-GAN generator, in input FRAMES
    (conservative: transposed-conv contribution rounded up).

    Accumulates each stage's radius at its own sample rate and converts
    to frames by dividing by the cumulative upsample factor:
    conv_pre(k7) + per stage [ConvT(k,u) + MRF resblocks] + conv_post(k7).
    """
    r_frames = 7 // 2  # conv_pre at frame rate
    rate = 1
    res_type = str(cfg.dec_blocks)
    for u, k in zip(cfg.upsample_rates, cfg.upsample_kernel_sizes):
        prev_rate = rate
        rate *= int(u)
        # ConvT(k, u, pad (k-u)//2): an output sample depends on inputs
        # within ceil(k/u) of its source position at the PREVIOUS rate.
        r_frames += math.ceil(int(k) / int(u)) / prev_rate
        # MRF = mean of parallel resblocks -> radius is the max branch.
        # ResBlock1 runs conv(d) + conv(1) per dilation, ResBlock2 conv(d)
        # only (modules/hifigan.py:28-66).
        rb = 0
        for rk, rd in zip(cfg.dec_kernel_size, cfg.dec_dilation_sizes):
            rk = int(rk)
            span = sum(int(x) for x in rd)
            if res_type == "1":
                span += len(rd)
            rb = max(rb, (rk // 2) * span)
        r_frames += rb / rate
    r_frames += (7 // 2) / rate  # conv_post at waveform rate
    return math.ceil(r_frames)


def halo_frames(cfg) -> int:
    """Total one-sided halo (frames) for exact chunked decoding."""
    return flow_halo_frames(cfg) + decoder_halo_frames(cfg)


class StreamingSynthesizer:
    """Chunked decode driver over a model's ``decode_frames`` tail.

    ``decode(params_g, z_p, mask)`` consumes the full-length prior latent
    (from ``model.infer_prior`` or any source) and returns the waveform
    ``[B, T*hop]``, decoding ``chunk_frames`` frames per device program.
    """

    def __init__(self, cfg, model, chunk_frames: int | None = None,
                 halo: int | None = None):
        self.cfg = cfg
        self.model = model
        self.hop = int(cfg.hop_size)
        self.chunk = int(chunk_frames
                         or cfg.get("stream_chunk_frames", 256))
        self.halo = int(halo if halo is not None else halo_frames(cfg))
        if self.chunk < 1:
            raise ValueError(f"chunk_frames must be >= 1, got {self.chunk}")
        use_spk_embed = bool(cfg.get("use_spk_embed", False))

        def _decode(params, z_pad, mask_pad, spk_embed, spk_id):
            return model.apply(
                {"params": params}, z_pad, mask_pad,
                spk_embed=spk_embed if use_spk_embed else None,
                spk_id=spk_id, method="decode_frames")

        self._chunk_fn = jax.jit(_decode)

        def _prior(params, batch, rng):
            return model.apply(
                {"params": params}, batch["text_tokens"],
                batch["note_pitch"], batch["note_dur"], batch["mel2ph"],
                spk_embed=batch.get("spk_embed") if use_spk_embed else None,
                spk_id=batch["spk_ids"], method="infer_prior",
                rngs={"sample": rng})

        self._prior_fn = jax.jit(_prior)

    def synthesize(self, params_g, batch: dict[str, Any], rng) -> jax.Array:
        """Full streaming infer: bucketed global stage + chunked local
        tail.  ``batch`` uses the infer batch keys (text_tokens,
        note_pitch, note_dur, mel2ph, spk_ids, optional spk_embed).
        Returns the waveform [B, T*hop]."""
        z_p, mask = self._prior_fn(params_g, batch, rng)
        spk_embed = batch.get("spk_embed") \
            if self.cfg.get("use_spk_embed", False) else None
        return self.decode(params_g, z_p, mask, spk_embed=spk_embed,
                           spk_id=batch["spk_ids"])

    def decode(self, params_g, z_p, mask, spk_embed=None, spk_id=None
               ) -> jax.Array:
        """z_p [B,T,H], mask [B,T,1] -> waveform [B, T*hop] equal to
        ``model.decode_frames`` on the full length.

        Windows are clamped to lie fully inside the score: a window edge
        only ever coincides with a TRUE score edge, where the chunk
        program's own SAME padding is exactly the full program's boundary
        semantics.  (Zero-padding a halo instead is NOT equivalent: conv
        biases make every layer's output nonzero on zero input, while the
        full program zero-pads each layer's own input at the edge.)
        Interior kept-region boundaries always sit >= halo frames from a
        non-edge window boundary, so the receptive field is satisfied."""
        z_p = jnp.asarray(z_p)
        mask = jnp.asarray(mask)
        b, t, _h = z_p.shape
        halo, chunk, hop = self.halo, self.chunk, self.hop
        if spk_id is None:
            spk_id = jnp.zeros((b,), jnp.int32)
        window = chunk + 2 * halo
        if t <= window:
            # Short score: pad up to the ONE window shape (masked frames)
            # and slice the valid samples out, so direct decode() callers
            # with unbucketed lengths reuse the same compiled program
            # instead of compiling per distinct length (round-4 ADVICE).
            # Boundary semantics: identical to how every static-shape path
            # (VISingerInfer's frame buckets) treats a score shorter than
            # its program — masked pad frames beyond t, waveform sliced to
            # t*hop.
            zp_p = jnp.pad(z_p, ((0, 0), (0, window - t), (0, 0)))
            mask_p = jnp.pad(mask, ((0, 0), (0, window - t), (0, 0)))
            wav = self._chunk_fn(params_g, zp_p, mask_p, spk_embed, spk_id)
            return wav[:, : t * hop]
        outs = []
        for s in range(0, t, chunk):
            e = min(s + chunk, t)
            w0 = min(max(s - halo, 0), t - window)
            wav = self._chunk_fn(params_g, z_p[:, w0:w0 + window],
                                 mask[:, w0:w0 + window], spk_embed, spk_id)
            outs.append(wav[:, (s - w0) * hop:(e - w0) * hop])
        return jnp.concatenate(outs, axis=1)


