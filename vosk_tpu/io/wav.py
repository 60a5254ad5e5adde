"""Minimal WAV (RIFF PCM) reader/writer — no external deps.

The reference consumes 16-bit mono PCM (vosk_api.h:212-231); examples read WAV
via the `wave` stdlib module.  We support PCM16/PCM32/float32, mono or
multi-channel (averaged to mono on request).
"""
from __future__ import annotations

import struct
import wave
from pathlib import Path

import numpy as np


def read_wav(path: str | Path, to_mono: bool = True) -> tuple[np.ndarray, int]:
    """Read a WAV file -> (float32 samples in int16 scale, sample_rate)."""
    with wave.open(str(path), "rb") as w:
        rate = w.getframerate()
        nch = w.getnchannels()
        width = w.getsampwidth()
        raw = w.readframes(w.getnframes())
    if width == 2:
        data = np.frombuffer(raw, dtype="<i2").astype(np.float32)
    elif width == 4:
        data = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 65536.0
    elif width == 1:
        data = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) * 256.0
    else:
        raise ValueError(f"unsupported sample width {width}")
    if nch > 1:
        data = data.reshape(-1, nch)
        if to_mono:
            data = data.mean(axis=1)
    return data, rate


def write_wav(path: str | Path, samples: np.ndarray, rate: int) -> None:
    """Write float samples (int16 scale) as 16-bit mono PCM."""
    pcm = np.clip(samples, -32768, 32767).astype("<i2")
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm.tobytes())


def pcm16_bytes_to_float(data: bytes) -> np.ndarray:
    """PCM16 LE bytes -> float32 samples (int16 scale), as the C ABI accepts
    (vosk_api.h:212-221, recognizer.cc:270-277)."""
    n = len(data) // 2
    return np.frombuffer(data[: n * 2], dtype="<i2").astype(np.float32)
