"""Wav-processor registry: resample, loudness normalization, silence trim.

Parity target: reference preprocessor/wave/{base_wave_processor,
common_processor}.py + utils/audio/vad.py — a named registry of waveform
transforms applied during preprocessing.  The reference shells out to sox
and uses webrtcvad/pyloudnorm; here: polyphase resampling (scipy), real
BS.1770 loudness normalization (utils/audio/loudness.py — the pyloudnorm
algorithm implemented from the public spec), and trim_long_silences with
the reference's exact pipeline shape (10 ms VAD frames at 16 kHz,
moving-average-8 smoothing, binary dilation by vad_max_silence_length+1,
mask resized to raw rate, unvoiced samples dropped — vad.py:52-100) with
one documented substitution: an adaptive energy VAD stands in for the
webrtcvad GMM core (package absent from this image).
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
    """BS.1770 integrated-loudness normalization to ``loud_norm_db`` LUFS
    (default -20 — the reference's pyloudnorm target, vad.py:46-49), with
    the reference's peak re-normalization if the gain clips."""

    def process(self, wav, sr, cfg):
        from visinger_tpu.utils.audio.loudness import (
            integrated_loudness,
            normalize_loudness,
        )

        target = float(cfg.get("loud_norm_db", -20.0))
        loudness = integrated_loudness(wav, sr)
        wav = normalize_loudness(wav, loudness, target)
        peak = np.abs(wav).max()
        if peak > 1.0:  # reference vad.py:48-49
            wav = wav / peak
        return wav.astype(np.float32), sr


def _otsu_split(values: np.ndarray) -> tuple[float, float]:
    """Two-class threshold maximizing between-class variance; returns
    (threshold, class-mean gap).  Exhaustive over sorted midpoints — the
    per-file window count is small."""
    v = np.sort(values)
    n = len(v)
    best_thr, best_sep, best_gap = v[0] - 1.0, -1.0, 0.0
    csum = np.cumsum(v)
    total = csum[-1]
    for i in range(1, n):
        w0, w1 = i / n, (n - i) / n
        mu0, mu1 = csum[i - 1] / i, (total - csum[i - 1]) / (n - i)
        sep = w0 * w1 * (mu1 - mu0) ** 2
        if sep > best_sep:
            best_sep, best_thr, best_gap = sep, (v[i - 1] + v[i]) / 2, mu1 - mu0
    return best_thr, best_gap


def _energy_vad_flags(wav16: np.ndarray, samples_per_window: int
                      ) -> np.ndarray:
    """Per-10ms-window voiced flags — the webrtcvad.Vad(mode=3) stand-in
    (package absent): Otsu two-class split on window energies (dB) over
    the same 10 ms windows the reference feeds webrtcvad (vad.py:53-75).
    When the energy histogram is unimodal (class-mean gap < 8 dB — no
    silence present, e.g. continuous singing), everything is voiced; a
    fixed floor-offset rule instead silently dropped uniformly-loud files
    (caught by tests/test_vocoder_wavproc.py::TestVadStandInValidation)."""
    n = len(wav16) // samples_per_window
    x = wav16[: n * samples_per_window].reshape(n, samples_per_window)
    e_db = 10 * np.log10(np.mean(np.square(x), axis=1) + 1e-10)
    thr, gap = _otsu_split(e_db)
    if gap < 8.0:
        return np.ones(n, bool)
    return e_db > thr


def trim_mask_from_flags(flags: np.ndarray, max_sil: int,
                         samples_per_window: int, out_len: int) -> np.ndarray:
    """Per-window voiced flags -> per-raw-sample keep mask, reproducing the
    reference post-VAD pipeline exactly (vad.py:77-91): moving average
    width 8, round to bool, binary dilation by ``max_sil + 1`` windows,
    repeat to 16 kHz samples, resize to the raw-rate length.

    Split out so tests can drive it with ORACLE flags (ground-truth speech
    labels of constructed signals) and measure how far the energy-VAD
    stand-in's decisions diverge from the reference pipeline's intent."""
    flags = np.asarray(flags, float)
    width = 8
    padded = np.concatenate([np.zeros((width - 1) // 2), flags,
                             np.zeros(width // 2)])
    csum = np.cumsum(padded)
    avg = (csum[width - 1:] - np.concatenate([[0.0], csum[:-width]])) / width
    mask = np.round(avg).astype(bool)
    # binary dilation with a (max_sil+1)-wide structuring element
    # (vad.py:89: binary_dilation(mask, ones(max_sil + 1)))
    from scipy.ndimage import binary_dilation

    mask = binary_dilation(mask, np.ones(max_sil + 1, bool))
    # windows -> 16k samples -> resize to the raw-rate length (vad.py:90-91)
    mask16 = np.repeat(mask, samples_per_window)
    idx = np.minimum((np.arange(out_len) * len(mask16))
                     // max(out_len, 1), len(mask16) - 1)
    return mask16[idx]


@register_wav_processor("trim_sil")
class TrimSilenceProcessor(BaseWavProcessor):
    """The reference's trim_long_silences pipeline (utils/audio/vad.py:
    17-100): loudness-norm (own processor here), resample to 16 kHz, VAD
    over 10 ms windows, moving-average smoothing (width 8), round to bool,
    binary-dilate by ``vad_max_silence_length + 1`` windows, resize the
    mask back to the raw rate and DROP the unvoiced samples."""

    def process(self, wav, sr, cfg):
        from visinger_tpu.data.preprocess import resample_wav

        max_sil = int(cfg.get("vad_max_silence_length", 12))
        vad_sr = 16000
        spw = (10 * vad_sr) // 1000  # 10 ms windows (vad.py:54,63)
        wav16 = resample_wav(wav, sr, vad_sr) if sr != vad_sr else wav
        wav16 = wav16[: len(wav16) - (len(wav16) % spw)]
        if len(wav16) < spw:
            return wav.astype(np.float32), sr
        flags = _energy_vad_flags(wav16, spw)
        keep = trim_mask_from_flags(flags, max_sil, spw, len(wav))
        out = wav[keep]
        if len(out) == 0:  # degenerate: keep the original
            return wav.astype(np.float32), sr
        return out.astype(np.float32), sr
