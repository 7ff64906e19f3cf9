"""Speaker embedding extractors for the binarizer (with_spk_embed).

Parity target: reference preprocessor/base_binarizer.py:154-160,369-370 —
``with_spk_embed`` runs resemblyzer's ``VoiceEncoder.embed_utterance`` over
each item's waveform and stores a unit-norm 256-d float vector that the
model's ``use_spk_embed`` projection consumes
(models/visinger.py:32-33,117-118).

TPU-native redesign: a pluggable registry (mirroring pitch_extract.py's
extractor registry) so any embedding backend can feed the same data path.
The resemblyzer backend registers itself when the package imports (absent in
this image); the default ``mel_stats`` backend is a dependency-free
stand-in: a fixed random projection of log-mel mean/std timbre statistics,
L2-normalized like resemblyzer's output.  It is deterministic and
discriminates speakers at the spectral-envelope-statistics level, keeping
the full spk_embed path (binarize -> dataset -> model projection)
exercisable end-to-end without the external model.
"""

from __future__ import annotations

import numpy as np

SPK_EMBED_DIM = 256

SPK_EMBED_EXTRACTORS: dict[str, object] = {}


def register_spk_embed(name: str):
    def deco(fn):
        SPK_EMBED_EXTRACTORS[name] = fn
        return fn

    return deco


@register_spk_embed("mel_stats")
def mel_stats_embed(wav: np.ndarray, sample_rate: int) -> np.ndarray:
    """Log-mel mean/std statistics -> fixed random projection -> L2 norm.

    80-bin log-mel over the whole utterance; the (mean, std) vector [160]
    is projected by a seed-0 Gaussian matrix to SPK_EMBED_DIM and unit
    normalized (resemblyzer also emits unit-norm embeddings).
    """
    from visinger_tpu.ops.stft import STFTParams, log_mel_spectrogram_np

    n_mels = 80
    params = STFTParams(1024, 1024, 256, sample_rate,
                        0.0, sample_rate / 2, n_mels)
    mel = log_mel_spectrogram_np(np.asarray(wav, np.float32), params)
    stats = np.concatenate([mel.mean(axis=0), mel.std(axis=0)])  # [160]
    proj = np.random.RandomState(0).randn(stats.shape[0], SPK_EMBED_DIM)
    proj /= np.sqrt(stats.shape[0])
    emb = stats @ proj
    return (emb / max(np.linalg.norm(emb), 1e-8)).astype(np.float32)


try:  # reference backend (base_binarizer.py:369-370); optional
    from resemblyzer import VoiceEncoder  # type: ignore

    _VOICE_ENCODER = None

    @register_spk_embed("resemblyzer")
    def resemblyzer_embed(wav: np.ndarray, sample_rate: int) -> np.ndarray:
        global _VOICE_ENCODER
        if _VOICE_ENCODER is None:
            _VOICE_ENCODER = VoiceEncoder()
        return np.asarray(
            _VOICE_ENCODER.embed_utterance(np.asarray(wav, float)),
            np.float32)
except ImportError:
    pass


def extract_spk_embed(name: str, wav: np.ndarray,
                      sample_rate: int) -> np.ndarray:
    fn = SPK_EMBED_EXTRACTORS.get(name)
    if fn is None:
        raise ValueError(
            f"unknown spk_embed extractor {name!r}; "
            f"available: {sorted(SPK_EMBED_EXTRACTORS)}")
    emb = fn(wav, sample_rate)
    assert emb.shape == (SPK_EMBED_DIM,), emb.shape
    return emb
