"""Differentiable STFT / mel-spectrogram for TPU.

Matches the numerics of the reference's torchaudio-based
SpectrogramFixed/MelSpectrogramFixed (utils/audio/mel_processing.py:15-38):
center-padded reflect STFT, hann window (periodic) zero-padded to n_fft,
power-2 magnitude, HTK mel scale with no filterbank norm, ``log(mel+1e-3)``,
and the trailing-frame drop.  These land inside the training loss
(tasks/visinger.py:111-113), so everything here is differentiable.

TPU-first design: the DFT is a matmul against precomputed (window-folded)
cosine/sine matrices — two [n_fft, n_bins] GEMMs that ride the MXU — instead
of an FFT, and framing is a gather.  All shapes static.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(win_length: int) -> np.ndarray:
    """Periodic hann window (torch.hann_window default)."""
    n = np.arange(win_length)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)).astype(np.float32)


def _hz_to_mel_htk(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def _mel_to_hz_htk(m):
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


def mel_filterbank(
    n_freqs: int, f_min: float, f_max: float, n_mels: int, sample_rate: int
) -> np.ndarray:
    """Triangular mel filterbank, HTK scale, no norm — [n_freqs, n_mels].

    Matches torchaudio.functional.melscale_fbanks(norm=None, mel_scale='htk').
    """
    all_freqs = np.linspace(0, sample_rate // 2, n_freqs)
    m_pts = np.linspace(_hz_to_mel_htk(f_min), _hz_to_mel_htk(f_max), n_mels + 2)
    f_pts = _mel_to_hz_htk(m_pts)
    f_diff = f_pts[1:] - f_pts[:-1]                       # [n_mels+1]
    slopes = f_pts[None, :] - all_freqs[:, None]          # [n_freqs, n_mels+2]
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    return fb.astype(np.float32)


def _dft_matrices(n_fft: int, win_length: int) -> tuple[np.ndarray, np.ndarray]:
    """Window-folded real-DFT matrices [n_fft, n_fft//2+1]."""
    n_bins = n_fft // 2 + 1
    window = np.zeros(n_fft, dtype=np.float64)
    lpad = (n_fft - win_length) // 2
    window[lpad:lpad + win_length] = hann_window(win_length)
    n = np.arange(n_fft)[:, None]
    k = np.arange(n_bins)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    cos_m = (window[:, None] * np.cos(ang)).astype(np.float32)
    sin_m = (window[:, None] * np.sin(ang)).astype(np.float32)
    return cos_m, sin_m


class STFTParams:
    """Precomputed constants for a fixed STFT/mel config (hashable by id)."""

    def __init__(self, n_fft: int, win_length: int, hop_length: int,
                 sample_rate: int = 24000, f_min: float = 20.0,
                 f_max: float = 12000.0, n_mels: int = 128):
        self.n_fft = n_fft
        self.win_length = win_length
        self.hop_length = hop_length
        self.sample_rate = sample_rate
        self.f_min = f_min
        self.f_max = f_max
        self.n_bins = n_fft // 2 + 1
        self.cos_m, self.sin_m = _dft_matrices(n_fft, win_length)
        self.mel_fb = mel_filterbank(self.n_bins, f_min, f_max, n_mels, sample_rate)


def _frame(x: jax.Array, n_fft: int, hop: int) -> jax.Array:
    """Center-pad (reflect) and frame: [B, L] -> [B, 1+L//hop, n_fft]."""
    pad = n_fft // 2
    x = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = 1 + (x.shape[1] - n_fft) // hop
    # index matrix built in-graph (an inlined [F, n_fft] int constant costs
    # ~100s of KB of HLO; see _dft_matrices_on_device rationale)
    idx = (jax.lax.broadcasted_iota(jnp.int32, (n_frames, n_fft), 0) * hop
           + jax.lax.broadcasted_iota(jnp.int32, (n_frames, n_fft), 1))
    return x[:, idx]


def _dft_matrices_on_device(params: STFTParams) -> tuple[jax.Array, jax.Array]:
    """Window-folded DFT matrices computed IN-GRAPH.

    Embedding the [n_fft, n_bins] matrices as array constants bloats every
    containing HLO by ~17 MB and cripples (remote) compilation, so they are
    rebuilt on device each call — ~4M transcendentals, noise next to the
    model.  The angle is reduced with integer ``(n*k) mod n_fft`` first, so
    f32 cos/sin stay exact (n*k reaches 2^21; naive 2*pi*n*k/N would lose
    ~4 decimal digits to f32 rounding).
    """
    n_fft, n_bins, wl = params.n_fft, params.n_bins, params.win_length
    n = jax.lax.broadcasted_iota(jnp.int32, (n_fft, n_bins), 0)
    k = jax.lax.broadcasted_iota(jnp.int32, (n_fft, n_bins), 1)
    ang = (2.0 * np.pi / n_fft) * ((n * k) % n_fft).astype(jnp.float32)
    lpad = (n_fft - wl) // 2
    pos = jnp.arange(n_fft, dtype=jnp.float32)
    win = 0.5 - 0.5 * jnp.cos(2.0 * np.pi * (pos - lpad) / wl)
    win = jnp.where((pos >= lpad) & (pos < lpad + wl), win, 0.0)
    return win[:, None] * jnp.cos(ang), win[:, None] * jnp.sin(ang)


def _mel_fb_on_device(params: STFTParams) -> jax.Array:
    """HTK mel filterbank computed in-graph (same no-big-constants rationale
    as _dft_matrices_on_device); [n_bins, n_mels]."""
    n_mels = params.mel_fb.shape[1]
    f_pts = jnp.asarray(
        _mel_to_hz_htk(np.linspace(_hz_to_mel_htk(params.f_min),
                                   _hz_to_mel_htk(params.f_max), n_mels + 2))
        .astype(np.float32))  # tiny [n_mels+2] constant — fine to inline
    all_freqs = jnp.linspace(0.0, params.sample_rate // 2, params.n_bins)
    f_diff = f_pts[1:] - f_pts[:-1]
    slopes = f_pts[None, :] - all_freqs[:, None]
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    return jnp.maximum(0.0, jnp.minimum(down, up))


@functools.partial(jax.jit, static_argnums=1)
def power_spectrogram(x: jax.Array, params: STFTParams) -> jax.Array:
    """[B, L] waveform -> [B, F-1, n_bins] power spectrogram.

    Includes the reference's trailing-frame drop ([..., :-1] on the frame
    axis, mel_processing.py:25).  Frame axis is time (channels-last).
    """
    frames = _frame(x, params.n_fft, params.hop_length)
    cos_m, sin_m = _dft_matrices_on_device(params)
    re = jnp.einsum("bfn,nk->bfk", frames, cos_m, preferred_element_type=jnp.float32)
    im = jnp.einsum("bfn,nk->bfk", frames, sin_m, preferred_element_type=jnp.float32)
    spec = re * re + im * im
    return spec[:, :-1, :]


@functools.partial(jax.jit, static_argnums=1)
def log_mel_spectrogram(x: jax.Array, params: STFTParams) -> jax.Array:
    """[B, L] waveform -> [B, F-1, n_mels] log-mel, log(mel + 1e-3)."""
    frames = _frame(x, params.n_fft, params.hop_length)
    cos_m, sin_m = _dft_matrices_on_device(params)
    re = jnp.einsum("bfn,nk->bfk", frames, cos_m, preferred_element_type=jnp.float32)
    im = jnp.einsum("bfn,nk->bfk", frames, sin_m, preferred_element_type=jnp.float32)
    spec = re * re + im * im
    mel = jnp.einsum("bfk,km->bfm", spec, _mel_fb_on_device(params),
                     preferred_element_type=jnp.float32)
    return jnp.log(mel + 1e-3)[:, :-1, :]


@functools.partial(jax.jit, static_argnums=(2, 3))
def log_mel_slices(x: jax.Array, ids_frame: jax.Array, seg: int,
                   params: STFTParams) -> jax.Array:
    """Log-mel of ``seg`` frames starting at per-item frame ``ids_frame``,
    computed by slicing the WAVEFORM first — numerically identical to
    ``slice_segments(log_mel_spectrogram(x), ids_frame, seg)`` (the reflect
    pad is applied to the full wav before slicing, so boundary frames see
    exactly the same samples) but ~T/seg x cheaper: the dynamic slice ids
    defeat XLA's DCE, so the full-length formulation really does 640-frame
    DFT matmuls to use 32 (measured in the train-step trace).

    x: [B, L]; ids_frame: [B] int; -> [B, seg, n_mels].
    """
    n_fft, hop = params.n_fft, params.hop_length
    pad = n_fft // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    length = (seg - 1) * hop + n_fft
    starts = ids_frame.astype(jnp.int32) * hop
    seg_wav = jax.vmap(
        lambda row, s: jax.lax.dynamic_slice(row, (s,), (length,)))(
        xp, starts)
    idx = (jax.lax.broadcasted_iota(jnp.int32, (seg, n_fft), 0) * hop
           + jax.lax.broadcasted_iota(jnp.int32, (seg, n_fft), 1))
    frames = seg_wav[:, idx]
    cos_m, sin_m = _dft_matrices_on_device(params)
    re = jnp.einsum("bfn,nk->bfk", frames, cos_m, preferred_element_type=jnp.float32)
    im = jnp.einsum("bfn,nk->bfk", frames, sin_m, preferred_element_type=jnp.float32)
    spec = re * re + im * im
    mel = jnp.einsum("bfk,km->bfm", spec, _mel_fb_on_device(params),
                     preferred_element_type=jnp.float32)
    return jnp.log(mel + 1e-3)


# ---------------------------------------------------------------------------
# NumPy variants (offline binarizer path; identical numerics, no device).
# ---------------------------------------------------------------------------

def power_spectrogram_np(x: np.ndarray, params: STFTParams) -> np.ndarray:
    pad = params.n_fft // 2
    xp = np.pad(x, (pad, pad), mode="reflect")
    n_frames = 1 + (len(xp) - params.n_fft) // params.hop_length
    idx = np.arange(n_frames)[:, None] * params.hop_length + np.arange(params.n_fft)
    frames = xp[idx]
    re = frames @ params.cos_m
    im = frames @ params.sin_m
    return (re * re + im * im)[:-1]


def log_mel_spectrogram_np(x: np.ndarray, params: STFTParams) -> np.ndarray:
    spec = power_spectrogram_np(x, params)
    return np.log(spec @ params.mel_fb + 1e-3)
