"""Wav-processor registry: resample, loudness normalization, silence trim.

Parity target: reference preprocessor/wave/{base_wave_processor,
common_processor}.py + utils/audio/vad.py — a named registry of waveform
transforms applied during preprocessing.  The reference shells out to sox
and uses webrtcvad/pyloudnorm; here: polyphase resampling (scipy),
RMS-window loudness normalization, and an energy-based VAD with mask
dilation (webrtcvad is unavailable; energy VAD covers the
trim-long-silences role on clean studio vocals).
"""

from __future__ import annotations

import numpy as np

WAV_PROCESSORS: dict[str, type] = {}


def register_wav_processor(name: str):
    def deco(cls):
        WAV_PROCESSORS[name] = cls
        cls.name = name
        return cls

    return deco


def get_wav_processor_cls(name: str):
    return WAV_PROCESSORS.get(name)


class BaseWavProcessor:
    def process(self, wav: np.ndarray, sr: int, cfg) -> tuple[np.ndarray, int]:
        raise NotImplementedError


@register_wav_processor("resample")
class ResampleProcessor(BaseWavProcessor):
    """-> cfg.sample_rate (replaces the sox_resample shell-out)."""

    def process(self, wav, sr, cfg):
        from visinger_tpu.data.preprocess import resample_wav

        tgt = cfg.sample_rate
        return resample_wav(wav, sr, tgt), tgt


@register_wav_processor("loud_norm")
class LoudNormProcessor(BaseWavProcessor):
    """Normalize to a target RMS level in dBFS (default -20)."""

    def process(self, wav, sr, cfg):
        target_db = float(cfg.get("loud_norm_db", -20.0))
        rms = np.sqrt(np.mean(np.square(wav)) + 1e-12)
        gain = 10 ** (target_db / 20) / max(rms, 1e-6)
        return np.clip(wav * gain, -1.0, 1.0).astype(np.float32), sr


@register_wav_processor("trim_sil")
class TrimSilenceProcessor(BaseWavProcessor):
    """Energy VAD: drop silent stretches longer than
    ``vad_max_silence_length`` frames (30 ms frames, dilated mask) — the
    role of the reference's trim_long_silences (utils/audio/vad.py:17-93).
    """

    def process(self, wav, sr, cfg):
        max_sil = int(cfg.get("vad_max_silence_length", 12))
        frame = int(0.03 * sr)
        n = len(wav) // frame
        x = wav[: n * frame].reshape(n, frame)
        energy_db = 10 * np.log10(np.mean(np.square(x), axis=1) + 1e-10)
        floor = np.percentile(energy_db, 10)
        voiced = energy_db > floor + 10.0
        # dilate so short pauses inside phrases are kept
        kernel = np.ones(3, dtype=bool)
        voiced = np.convolve(voiced, kernel, mode="same") > 0
        keep = voiced.copy()
        run = 0
        for i in range(n):
            if voiced[i]:
                run = 0
            else:
                run += 1
                keep[i] = run <= max_sil
        mask = np.repeat(keep, frame)
        out = np.concatenate([wav[: n * frame][mask], wav[n * frame:]])
        return out.astype(np.float32), sr
