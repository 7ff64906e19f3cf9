"""STFT/mel parity vs torch.stft (the reference's torchaudio backend wraps
torch.stft; utils/audio/mel_processing.py:15-38)."""

import jax.numpy as jnp
import numpy as np
import pytest

from visinger_tpu.ops.stft import (
    STFTParams,
    log_mel_spectrogram,
    log_mel_spectrogram_np,
    power_spectrogram,
    power_spectrogram_np,
)

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def params():
    return STFTParams(2048, 1200, 300, 24000, 20.0, 12000.0, 128)


@pytest.fixture(scope="module")
def wav():
    rng = np.random.RandomState(0)
    # a synthetic "voiced" signal: harmonics + noise, 2 items, 3200*3 samples
    t = np.arange(300 * 32) / 24000.0
    sig = sum(0.1 / (i + 1) * np.sin(2 * np.pi * 220 * (i + 1) * t) for i in range(8))
    x = np.stack([sig, rng.randn(len(t)) * 0.05]).astype(np.float32)
    return x


def torch_power_spec(x: np.ndarray) -> np.ndarray:
    win = torch.hann_window(1200)
    st = torch.stft(torch.from_numpy(x), n_fft=2048, hop_length=300,
                    win_length=1200, window=win, center=True,
                    pad_mode="reflect", return_complex=True)
    return (st.abs() ** 2).numpy().transpose(0, 2, 1)[:, :-1, :]


def test_power_spec_matches_torch(params, wav):
    ours = np.asarray(power_spectrogram(jnp.asarray(wav), params))
    ref = torch_power_spec(wav)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


def test_mel_shapes_and_numpy_parity(params, wav):
    jmel = np.asarray(log_mel_spectrogram(jnp.asarray(wav), params))
    assert jmel.shape == (2, 32, 128)
    nmel = log_mel_spectrogram_np(wav[0], params)
    np.testing.assert_allclose(nmel, jmel[0], rtol=1e-4, atol=1e-4)
    nspec = power_spectrogram_np(wav[0], params)
    jspec = np.asarray(power_spectrogram(jnp.asarray(wav), params))[0]
    np.testing.assert_allclose(nspec, jspec, rtol=1e-4, atol=1e-5)


def test_mel_is_differentiable(params, wav):
    import jax

    def loss(x):
        return jnp.mean(log_mel_spectrogram(x, params))

    g = jax.grad(loss)(jnp.asarray(wav))
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0


def test_log_mel_slices_matches_full_then_slice():
    """log_mel_slices (wav sliced first) == full-length mel + frame slice,
    including slices touching both sequence boundaries."""
    import jax.numpy as jnp

    from visinger_tpu.ops.masking import slice_segments
    from visinger_tpu.ops.stft import (
        STFTParams,
        log_mel_slices,
        log_mel_spectrogram,
    )

    params = STFTParams(512, 480, 120, 24000, 0.0, 12000.0, 40)
    rng = np.random.RandomState(0)
    t_frames, seg, hop = 64, 8, 120
    wav = jnp.asarray(rng.randn(3, t_frames * hop).astype(np.float32) * 0.2)
    full = log_mel_spectrogram(wav, params)
    for ids in ([0, 17, 56], [56, 0, 29]):  # first/last valid starts included
        ids_a = jnp.asarray(ids, jnp.int32)
        want = slice_segments(full, ids_a, seg)
        got = log_mel_slices(wav, ids_a, seg, params)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)
