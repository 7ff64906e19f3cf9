"""BS.1770-4 loudness meter compliance anchors (utils/audio/loudness.py —
the from-spec implementation of the reference's pyloudnorm dependency,
/root/reference/utils/audio/vad.py:46-49)."""

import numpy as np
import pytest

from visinger_tpu.utils.audio.loudness import (
    integrated_loudness,
    k_weight,
    normalize_loudness,
)


def _sine(freq, sr, seconds, amp=1.0):
    t = np.arange(int(sr * seconds)) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float64)


def test_997hz_fullscale_sine_reads_minus_3_01():
    """BS.1770's -0.691 dB offset cancels the K-filter gain at 997 Hz, so a
    0 dBFS sine reads 10*log10(0.5) = -3.01 LUFS — the spec's anchor."""
    for sr in (48000, 44100, 24000):
        lufs = integrated_loudness(_sine(997.0, sr, 5.0), sr)
        assert abs(lufs - (-3.01)) < 0.15, (sr, lufs)


def test_level_linearity():
    """-20 dB of gain = -20 LU of loudness."""
    sr = 24000
    l_full = integrated_loudness(_sine(997.0, sr, 4.0), sr)
    l_20 = integrated_loudness(_sine(997.0, sr, 4.0, amp=0.1), sr)
    assert abs((l_full - l_20) - 20.0) < 0.05


def test_k_weighting_shape():
    """High-pass attenuates 20 Hz (a 38 Hz Q=0.5 biquad gives ~-13 dB
    there), shelf boosts 8 kHz (ca +4 dB), 997 Hz ~ +0.69 dB (the
    offset's complement)."""
    sr = 48000

    def gain_db(freq):
        x = _sine(freq, sr, 2.0)
        y = k_weight(x, sr)[sr // 2:]  # skip the filter transient
        return 10 * np.log10(np.mean(y ** 2) / np.mean(x[sr // 2:] ** 2))

    assert gain_db(20.0) < -10.0
    assert abs(gain_db(8000.0) - 4.0) < 0.7
    assert abs(gain_db(997.0) - 0.691) < 0.15


def test_gating_excludes_silence():
    """Appending near-silence must not drag the integrated loudness down
    (the -70 LUFS absolute + relative gates exclude those blocks)."""
    sr = 24000
    voice = _sine(440.0, sr, 3.0, amp=0.25)
    silence = np.full(6 * sr, 1e-5)
    l_voice = integrated_loudness(voice, sr)
    l_padded = integrated_loudness(np.concatenate([voice, silence]), sr)
    assert abs(l_voice - l_padded) < 0.3, (l_voice, l_padded)


def test_normalize_roundtrip():
    sr = 24000
    rng = np.random.RandomState(0)
    wav = (rng.randn(5 * sr) * 0.05).astype(np.float32)
    l0 = integrated_loudness(wav, sr)
    out = normalize_loudness(wav, l0, -20.0)
    assert abs(integrated_loudness(out, sr) - (-20.0)) < 0.1


def test_short_signal_is_neg_inf():
    sr = 24000
    assert integrated_loudness(np.zeros(sr // 10), sr) == float("-inf")
    # all-silence: nothing above the absolute gate
    assert integrated_loudness(np.zeros(2 * sr), sr) == float("-inf")


def test_stereo_rejected():
    with pytest.raises(ValueError):
        integrated_loudness(np.zeros((2, 48000)), 48000)
