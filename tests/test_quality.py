"""MCD / objective quality metrics (utils/audio/quality.py)."""

import numpy as np

from visinger_tpu.ops.stft import STFTParams
from visinger_tpu.utils.audio.quality import (
    f0_metrics,
    mcd,
    mcd_from_mels,
    mel_cepstra,
    mel_l1_np,
)

PARAMS = STFTParams(512, 480, 120, 24000, 0.0, 12000.0, 40)


def _tone(freq, n, sr=24000, amp=0.3):
    t = np.arange(n) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_mcd_identical_is_zero():
    wav = _tone(440, 24000)
    assert mcd(wav, wav, PARAMS) < 1e-6
    assert mel_l1_np(wav, wav, PARAMS) < 1e-7


def test_mcd_orders_degradations():
    rng = np.random.RandomState(0)
    wav = _tone(440, 24000)
    a = wav + 0.01 * rng.randn(len(wav)).astype(np.float32)
    b = wav + 0.1 * rng.randn(len(wav)).astype(np.float32)
    m_a, m_b = mcd(wav, a, PARAMS), mcd(wav, b, PARAMS)
    assert 0 < m_a < m_b
    other = _tone(880, 24000)
    assert mcd(wav, other, PARAMS) > m_a


def test_mcd_excludes_energy_coefficient():
    """c0 (overall energy/loudness) is excluded — a pure gain change moves
    MCD far less than a spectral change of similar mel-L1."""
    wav = _tone(440, 24000)
    gain = (wav * 0.5).astype(np.float32)
    assert mcd(wav, gain, PARAMS) < mcd(wav, _tone(880, 24000), PARAMS)


def test_dtw_alignment_recovers_time_shift():
    wav = _tone(440, 24000)
    shifted = np.concatenate([np.zeros(1200, np.float32), wav])[:len(wav)]
    plain = mcd(wav, shifted, PARAMS)
    aligned = mcd(wav, shifted, PARAMS, use_dtw=True)
    assert aligned < plain


def test_mel_cepstra_shape():
    mel = np.random.RandomState(1).randn(50, 40)
    c = mel_cepstra(mel, n_coeffs=13)
    assert c.shape == (50, 13)


def test_dct_matches_scipy_when_available():
    try:
        from scipy.fftpack import dct
    except ImportError:
        return
    from visinger_tpu.utils.audio.quality import _dct2_ortho

    x = np.random.RandomState(2).randn(7, 40)
    ours = _dct2_ortho(x, 14)
    ref = dct(x, type=2, norm="ortho", axis=-1)[:, :14]
    np.testing.assert_allclose(ours, ref, rtol=1e-10, atol=1e-10)


def test_f0_metrics_identical_and_semitone_shift():
    """Same tone -> ~0 cents RMSE, 0 V/UV error; a semitone-shifted tone
    (2^(1/12)) -> ~100 cents RMSE."""
    wav = _tone(440, 48000)
    same = f0_metrics(wav, wav, 24000, 120)
    assert same["f0_rmse_cents"] < 5.0
    assert same["vuv_error"] == 0.0
    shifted = _tone(440 * 2 ** (1 / 12), 48000)
    m = f0_metrics(wav, shifted, 24000, 120)
    assert 80.0 < m["f0_rmse_cents"] < 120.0


def test_f0_metrics_vuv_disagreement():
    """Tone vs silence: every voiced reference frame is a V/UV miss and no
    jointly-voiced frames exist (RMSE NaN)."""
    wav = _tone(440, 48000)
    silence = np.zeros_like(wav)
    m = f0_metrics(wav, silence, 24000, 120)
    assert m["vuv_error"] > 0.8
    assert np.isnan(m["f0_rmse_cents"])


def test_mcd_from_mels_known_value():
    """Hand-checkable case: constant cepstral offset d in ONE coefficient
    gives MCD = 10*sqrt(2)/ln(10) * d."""
    t, n_mels = 20, 40
    mel_ref = np.zeros((t, n_mels))
    # craft mel_syn whose cepstra differ by delta in c1 only: invert DCT row
    from visinger_tpu.utils.audio.quality import _dct2_ortho

    basis = _dct2_ortho(np.eye(n_mels), 14)  # [n_mels, 14] columns = coeffs
    delta = 0.25
    mel_syn = mel_ref + delta * basis[:, 1][None, :] / np.sum(basis[:, 1] ** 2)
    got = mcd_from_mels(mel_ref, mel_syn)
    expect = 10 * np.sqrt(2) / np.log(10) * delta
    np.testing.assert_allclose(got, expect, rtol=1e-8)


def test_mcd_silence_gate_drops_floor_frames():
    """Frames where the reference sits at the log floor dominate ungated
    MCD (several nats per bin against any non-silent synthesis); the gate
    excludes them, leaving the voiced-frame distortion."""
    rng = np.random.RandomState(5)
    n_mels = 32
    voiced = rng.randn(40, n_mels) * 0.5 + 2.0
    silent = np.full((40, n_mels), np.log(1e-3))
    mel_ref = np.concatenate([voiced, silent])
    # synthesis: perfect on voiced frames, noisy where the ref is silent
    mel_syn = np.concatenate([voiced, silent + rng.rand(40, n_mels) * 3.0])
    ungated = mcd_from_mels(mel_ref, mel_syn)
    gated = mcd_from_mels(mel_ref, mel_syn, silence_gate_db=20.0)
    assert ungated > 1.0          # the floor frames dominate
    assert gated < 1e-9           # voiced frames are identical
