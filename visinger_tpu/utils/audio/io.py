"""WAV I/O without external audio libraries (stdlib ``wave`` + numpy).

Replaces the reference's torchaudio.load / scipy save_wav
(utils/audio/mel_processing.py:7-12, utils/audio/io.py:8-15).
"""

from __future__ import annotations

import wave

import numpy as np


def load_wav(path: str, pad_to_hop: int = 0) -> tuple[np.ndarray, int]:
    """Read a PCM wav -> (float32 mono [-1, 1], sample_rate).

    When ``pad_to_hop`` > 0, zero-pads so len(wav) is the next multiple of
    hop (+1 hop, matching reference load_wav_to_torch's
    ``(len//hop + 1) * hop`` padding, mel_processing.py:7-12).
    """
    with wave.open(path, "rb") as f:
        sr = f.getframerate()
        n = f.getnframes()
        width = f.getsampwidth()
        channels = f.getnchannels()
        raw = f.readframes(n)
    if width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    elif width == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    elif width == 3:
        a = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
        x = ((a[:, 0].astype(np.int32)) | (a[:, 1].astype(np.int32) << 8)
             | (a[:, 2].astype(np.int32) << 16))
        x = np.where(x >= 1 << 23, x - (1 << 24), x).astype(np.float32) / float(1 << 23)
    else:
        raise ValueError(f"unsupported sample width {width}")
    if channels > 1:
        x = x.reshape(-1, channels).mean(axis=1)
    if pad_to_hop:
        p = (len(x) // pad_to_hop + 1) * pad_to_hop - len(x)
        x = np.pad(x, (0, p))
    return x, sr


def save_wav(wav: np.ndarray, path: str, sample_rate: int, norm: bool = False):
    """16-bit PCM save (utils/audio/io.py:8-15 semantics)."""
    wav = np.asarray(wav, dtype=np.float64)
    if norm:
        peak = np.abs(wav).max()
        if peak > 0:
            wav = wav / peak * 0.95
    pcm = np.clip(wav * 32767.0, -32768, 32767).astype("<i2")
    with wave.open(path, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(pcm.tobytes())
