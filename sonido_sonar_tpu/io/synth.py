"""Synthetic signal generators for tests and benchmarks.

The reference has no fixtures (zero test files); the rebuild's test
strategy (SURVEY.md section 4) synthesizes signals with known structure:
tones (known pitch/chroma), chirps (known centroid slope), noise, and
known-lag shifted pairs for alignment accuracy tests.
"""

from __future__ import annotations

import numpy as np


def sine(
    freq: float,
    duration: float,
    sample_rate: int = 44100,
    amplitude: float = 0.5,
    phase: float = 0.0,
) -> np.ndarray:
    t = np.arange(int(duration * sample_rate), dtype=np.float64) / sample_rate
    return (amplitude * np.sin(2 * np.pi * freq * t + phase)).astype(np.float32)


def harmonic_tone(
    f0: float,
    duration: float,
    sample_rate: int = 44100,
    num_harmonics: int = 5,
    decay: float = 0.7,
) -> np.ndarray:
    """Harmonic complex with geometrically decaying partials."""
    t = np.arange(int(duration * sample_rate), dtype=np.float64) / sample_rate
    x = np.zeros_like(t)
    for h in range(1, num_harmonics + 1):
        x += (decay ** (h - 1)) * np.sin(2 * np.pi * f0 * h * t)
    x /= np.max(np.abs(x)) + 1e-12
    return (0.5 * x).astype(np.float32)


def chirp(
    f_start: float,
    f_end: float,
    duration: float,
    sample_rate: int = 44100,
    amplitude: float = 0.5,
) -> np.ndarray:
    t = np.arange(int(duration * sample_rate), dtype=np.float64) / sample_rate
    k = (f_end - f_start) / duration
    phase = 2 * np.pi * (f_start * t + 0.5 * k * t * t)
    return (amplitude * np.sin(phase)).astype(np.float32)


def white_noise(
    duration: float, sample_rate: int = 44100, amplitude: float = 0.1, seed: int = 0
) -> np.ndarray:
    rng = np.random.default_rng(seed)
    n = int(duration * sample_rate)
    return (amplitude * rng.standard_normal(n)).astype(np.float32)


def speech_like(
    duration: float, sample_rate: int = 44100, f0: float = 120.0, seed: int = 0
) -> np.ndarray:
    """Voiced-speech proxy: a glottal pulse train (slightly jittered)
    driven through two formant resonators (700 Hz, 1800 Hz) plus a touch
    of aspiration noise. Rich in harmonics around the formants, so it
    survives pre-emphasis and exercises pitch/formant/voice-quality
    paths realistically."""
    rng = np.random.default_rng(seed)
    n = int(duration * sample_rate)
    # jittered impulse train at f0
    src = np.zeros(n)
    pos = 0.0
    while pos < n:
        src[int(pos)] = 1.0
        period = sample_rate / (f0 * (1.0 + 0.005 * rng.standard_normal()))
        pos += period
    src += 0.01 * rng.standard_normal(n)  # aspiration noise

    def resonate(x, f, r=0.97):
        w = 2 * np.pi * f / sample_rate
        a1, a2 = -2 * r * np.cos(w), r * r
        y = np.zeros_like(x)
        for t in range(2, len(x)):
            y[t] = x[t] - a1 * y[t - 1] - a2 * y[t - 2]
        return y

    x = resonate(resonate(src, 700.0), 1800.0, r=0.95)
    # slow amplitude modulation (syllable-ish) with pauses
    t = np.arange(n, dtype=np.float64) / sample_rate
    env = 0.55 + 0.45 * np.sin(2 * np.pi * 2.5 * t)
    x = x * env
    x /= np.max(np.abs(x)) + 1e-12
    return (0.5 * x).astype(np.float32)


def shift_signal(
    x: np.ndarray, lag_samples: int, noise: float = 0.0, gain: float = 1.0, seed: int = 1
) -> np.ndarray:
    """Delay x by lag_samples (>0: y starts later), same length, optional
    noise + gain — the source/CDN pair generator for alignment tests."""
    y = np.zeros_like(x)
    if lag_samples >= 0:
        y[lag_samples:] = x[: len(x) - lag_samples]
    else:
        y[: len(x) + lag_samples] = x[-lag_samples:]
    y = gain * y
    if noise > 0:
        rng = np.random.default_rng(seed)
        y = y + noise * rng.standard_normal(len(x)).astype(np.float32)
    return y.astype(np.float32)
