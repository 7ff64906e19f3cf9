"""Streaming decode on the real TPU: one fixed-shape chunk program serving
a score far beyond any compiled frame bucket.

Decodes a T-frame prior latent (default 4096 frames = 51.2 s of audio —
3.2x the recipe's largest bucket, a length the full-length path cannot
serve without a fresh multi-minute bucket compile) through
infer/streaming.py's chunk program, behind the honest scalar-readback
barrier (CLAUDE.md: block_until_ready lies on the tunnel).

Reports: chunk-program compile time (paid ONCE for every length),
decode RTF (audio-seconds per wall-second, amortized over repeats), and
time-to-first-audio (one window).  The latent is random — decode FLOPs
are data-independent — so this measures the decode tail (flow reverse +
HiFi-GAN), which is ~all of synthesis compute.

    python tools/stream_tpu_demo.py            # T=4096, chunk=256
    STREAM_T=8192 STREAM_CHUNK=512 python tools/stream_tpu_demo.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from visinger_tpu.config import load_config  # noqa: E402
from visinger_tpu.data.synthetic import synthetic_batch  # noqa: E402
from visinger_tpu.infer.streaming import StreamingSynthesizer, halo_frames  # noqa: E402
from visinger_tpu.models.factory import build_models, init_params  # noqa: E402


def main():
    t_frames = int(os.environ.get("STREAM_T", 4096))
    chunk = int(os.environ.get("STREAM_CHUNK", 256))
    repeats = int(os.environ.get("STREAM_REPEATS", 3))
    cfg = load_config(name="visinger_csd")
    if os.environ.get("STREAM_DTYPE"):
        cfg = cfg.replace(compute_dtype=os.environ["STREAM_DTYPE"])

    raw = synthetic_batch(1, 32, 64, vocab=60, pitch_vocab=117, dur_vocab=98,
                          num_linear_bins=cfg.num_linear_bins,
                          hop_size=cfg.hop_size)
    model, disc = build_models(cfg, ph_vocab=60, pitch_vocab=117, dur_vocab=98)
    params_g, _ = init_params(cfg, model, disc, raw)

    synth = StreamingSynthesizer(cfg, model, chunk_frames=chunk)
    h = cfg.hidden_size
    z = jax.random.normal(jax.random.PRNGKey(0), (1, t_frames, h), jnp.float32)
    mask = jnp.ones((1, t_frames, 1), jnp.float32)

    def barrier(wav):
        return float(jnp.sum(wav))

    t0 = time.perf_counter()
    wav = synth.decode(params_g, z, mask)
    barrier(wav)
    compile_and_first_s = time.perf_counter() - t0

    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        wav = synth.decode(params_g, z, mask)
        barrier(wav)
        times.append(time.perf_counter() - t0)
    best = min(times)
    audio_s = t_frames * cfg.hop_size / cfg.sample_rate

    # time-to-first-audio: ONE window program call (the first chunk of
    # audio a client would hear).  Warm the readback-sum program first so
    # the timing is the window execution, not a tiny-program compile.
    window = synth.chunk + 2 * synth.halo
    spk0 = jnp.zeros((1,), jnp.int32)
    first = synth._chunk_fn(params_g, z[:, :window], mask[:, :window],
                            None, spk0)
    barrier(first)
    t0 = time.perf_counter()
    first = synth._chunk_fn(params_g, z[:, :window], mask[:, :window],
                            None, spk0)
    barrier(first)
    ttfa_s = time.perf_counter() - t0

    print(json.dumps({
        "t_frames": t_frames, "audio_s": round(audio_s, 2),
        "chunk": synth.chunk, "halo": synth.halo,
        "halo_frames_analytic": halo_frames(cfg),
        "compute_dtype": str(cfg.compute_dtype),
        "compile_and_first_s": round(compile_and_first_s, 1),
        "decode_s_best": round(best, 3),
        "audio_s_per_s": round(audio_s / best, 1),
        "rtf": round(best / audio_s, 5),
        "time_to_first_audio_s": round(ttfa_s, 3),
        "n_window_programs": 1,
        "note": "random latent; decode tail only (flow reverse + HiFi-GAN)",
    }))


if __name__ == "__main__":
    main()
