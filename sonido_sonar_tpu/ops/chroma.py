"""Chroma features: STFT-fold chromagram, CQT chroma, HPCP, key estimation.

Reference parity: algorithms/chroma/*.go —
  chroma_stft.go: FFT bin -> pitch class via MIDI 69 + 12 log2(f/440)
    rounded mod 12, energy (mag^2) summed per class, unit-sum normalize
    (:91-140); range 80-8000 Hz (:34-35); key estimation via shifted
    profile Pearson correlation over 12 roots x {major, minor} with the
    simplified profiles at :249-251;
  chroma_cqt.go: per-bin Gaussian-windowed complex exponential kernels,
    bins_per_octave log-spaced bins from min to max freq, octave-fold
    to 12 (:95-146, 213-244);
  hpcp.go: peak-based pitch-class profile, cosine window (1 semitone),
    band preset boost x2 below 500 Hz, defaults size 12 / 40-5000 Hz /
    ref 440 (:56-76), optional log non-linearity and max-shifted
    correlation (:330-374).

TPU design: the STFT fold is a precomputed [12, F] 0/1 matrix -> one
matmul per frame batch (MXU). CQT is a [T, L] x [L, K] complex matmul
against precomputed kernels. HPCP consumes the fixed-k peak arrays from
ops.harmonic with fully vectorized cosine-window contributions.
"""

from __future__ import annotations

import functools
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sonido_sonar_tpu.ops.harmonic import detect_spectral_peaks

_EPS = 1e-10

CHROMA_LABELS = ["C", "C#", "D", "D#", "E", "F", "F#", "G", "G#", "A", "A#", "B"]


# ---------------------------------------------------------------------
# Chroma-STFT
# ---------------------------------------------------------------------

@functools.lru_cache(maxsize=32)
def chroma_fold_matrix(
    freq_bins: int,
    sample_rate: int,
    window_size: int,
    tuning_freq: float = 440.0,
    min_freq: float = 80.0,
    max_freq: float = 8000.0,
) -> np.ndarray:
    """[12, F] fold matrix: entry (c, f) = 1 if FFT bin f maps to pitch
    class c (chroma_stft.go:91-124). Precomputed in float64."""
    freq_res = sample_rate / float(window_size)
    fold = np.zeros((12, freq_bins), dtype=np.float32)
    for f in range(freq_bins):
        freq = f * freq_res
        if freq < min_freq or freq > max_freq or freq <= 0:
            continue
        midi = 69.0 + 12.0 * np.log2(freq / tuning_freq)
        c = int(round(midi)) % 12
        fold[c, f] = 1.0
    fold.setflags(write=False)
    return fold


def chroma_from_magnitude(
    magnitude: jnp.ndarray,
    sample_rate: int,
    window_size: int,
    tuning_freq: float = 440.0,
    min_freq: float = 80.0,
    max_freq: float = 8000.0,
) -> jnp.ndarray:
    """Chromagram [..., T, 12] from magnitude frames [..., T, F]:
    energy fold + unit-sum normalization (chroma_stft.go:63-140)."""
    fold = jnp.asarray(
        chroma_fold_matrix(
            magnitude.shape[-1], sample_rate, window_size, tuning_freq,
            min_freq, max_freq,
        )
    )
    energy = jnp.matmul(
        magnitude * magnitude, fold.T, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return chroma_normalize(energy)


def chroma_normalize(energy: jnp.ndarray) -> jnp.ndarray:
    """Unit-sum normalization tail of the chroma fold ([..., 12] energy
    -> chromagram), shared with the Pallas STFT feature-epilogue path
    (which computes the same HIGHEST-precision fold matmul in-kernel)."""
    total = jnp.sum(energy, axis=-1, keepdims=True)
    return jnp.where(total > _EPS, energy / jnp.maximum(total, _EPS), energy)


def chroma_stft(
    signal: jnp.ndarray,
    sample_rate: int,
    window_size: int = 2048,
    hop_size: int = 512,
) -> jnp.ndarray:
    """ChromaSTFT.ComputeChroma (chroma_stft.go:45-60): STFT (Hann) then
    fold."""
    from sonido_sonar_tpu.ops.stft import stft

    res = stft(signal, window_size, hop_size, sample_rate=sample_rate)
    return chroma_from_magnitude(res.magnitude, sample_rate, window_size)


# key profiles (chroma_stft.go:249-251)
_MAJOR_PROFILE = np.array(
    [1.0, 0.2, 0.6, 0.2, 0.8, 0.6, 0.2, 1.0, 0.2, 0.6, 0.2, 0.4]
)
_MINOR_PROFILE = np.array(
    [1.0, 0.2, 0.4, 0.6, 0.2, 0.8, 0.2, 0.6, 0.8, 0.2, 0.4, 0.2]
)


def _pearson(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Pearson correlation over the last axis (chroma_stft.go:298-330)."""
    mx = jnp.mean(x, axis=-1, keepdims=True)
    my = jnp.mean(y, axis=-1, keepdims=True)
    num = jnp.sum((x - mx) * (y - my), axis=-1)
    den = jnp.sqrt(
        jnp.sum((x - mx) ** 2, axis=-1) * jnp.sum((y - my) ** 2, axis=-1)
    )
    return jnp.where(den < _EPS, 0.0, num / jnp.maximum(den, _EPS))


def key_correlations(mean_chroma: jnp.ndarray) -> jnp.ndarray:
    """[..., 24] correlations: index r in 0..11 = major root r,
    12+r = minor root r (chroma_stft.go:240-296)."""
    profiles = []
    for root in range(12):
        profiles.append(np.roll(_MAJOR_PROFILE, root))
    for root in range(12):
        profiles.append(np.roll(_MINOR_PROFILE, root))
    p = jnp.asarray(np.stack(profiles).astype(np.float32))  # [24, 12]
    return _pearson(mean_chroma[..., None, :], p)


def estimate_key(chromagram: jnp.ndarray) -> Tuple[str, str]:
    """EstimateKey (chroma_stft.go:240-278). Host-returning helper for a
    single chromagram [T, 12]."""
    mean_chroma = jnp.mean(chromagram, axis=-2)
    corr = key_correlations(mean_chroma)
    best = int(jnp.argmax(corr))
    root, mode = best % 12, ("major" if best < 12 else "minor")
    return CHROMA_LABELS[root], mode


# ---------------------------------------------------------------------
# Chroma-CQT
# ---------------------------------------------------------------------

@functools.lru_cache(maxsize=8)
def cqt_kernels(
    sample_rate: int,
    min_freq: float = 32.7,   # C1
    max_freq: float = 3951.1,  # B7
    bins_per_octave: int = 12,
    q_factor: float = 17.0,
    max_kernel_len: int = 8192,
) -> Tuple[np.ndarray, np.ndarray, int]:
    """Precomputed time-domain CQT kernels.

    Returns (kernels_real [K, L], kernels_imag [K, L], L) where L is the
    common (zero-padded) kernel length. Per chroma_cqt.go:95-146: kernel
    length q*sr/f, Gaussian window sigma = sr/(2 pi bandwidth),
    bandwidth = f/Q, complex exponential at f.
    """
    num_octaves = np.log2(max_freq / min_freq)
    total_bins = int(num_octaves * bins_per_octave)
    freqs = min_freq * 2.0 ** (np.arange(total_bins) / bins_per_octave)
    lengths = np.minimum(
        (q_factor * sample_rate / freqs).astype(int), max_kernel_len
    )
    L = 1
    while L < lengths.max():
        L <<= 1
    kr = np.zeros((total_bins, L), dtype=np.float32)
    ki = np.zeros((total_bins, L), dtype=np.float32)
    for k, (f, ln) in enumerate(zip(freqs, lengths)):
        n = np.arange(ln, dtype=np.float64)
        center = ln / 2
        t = n - center
        bandwidth = f / q_factor
        sigma = sample_rate / (2.0 * np.pi * bandwidth)
        window = np.exp(-(t * t) / (2.0 * sigma * sigma))
        phase = 2.0 * np.pi * f * t / sample_rate
        # normalize kernel energy so octaves contribute comparably
        window /= window.sum() + 1e-12
        kr[k, :ln] = (window * np.cos(phase)).astype(np.float32)
        ki[k, :ln] = (window * np.sin(phase)).astype(np.float32)
    kr.setflags(write=False)
    ki.setflags(write=False)
    return kr, ki, L


def chroma_cqt(
    signal: jnp.ndarray,
    sample_rate: int,
    hop_size: int = 512,
    min_freq: float = 32.7,
    max_freq: float = 3951.1,
    bins_per_octave: int = 12,
    q_factor: float = 17.0,
) -> jnp.ndarray:
    """ChromaCQT.ComputeChroma (chroma_cqt.go:69-93): CQT magnitudes
    folded across octaves to [T, 12], unit-sum normalized.

    Implemented as framed inner products against precomputed kernels —
    two [T, L] x [L, K] matmuls (real/imag)."""
    from sonido_sonar_tpu.ops.framing import frame_signal, num_frames

    kr, ki, L = cqt_kernels(
        sample_rate, min_freq, max_freq, bins_per_octave, q_factor
    )
    n = signal.shape[-1]
    if n < L:
        pad = [(0, 0)] * (signal.ndim - 1) + [(0, L - n)]
        signal = jnp.pad(signal, pad)
    frames = frame_signal(signal, L, hop_size)  # [..., T, L]
    re = jnp.matmul(frames, jnp.asarray(kr).T, preferred_element_type=jnp.float32)
    im = jnp.matmul(frames, jnp.asarray(ki).T, preferred_element_type=jnp.float32)
    mag = jnp.sqrt(re * re + im * im)  # [..., T, K]

    k_bins = mag.shape[-1]
    fold = np.zeros((12, k_bins), dtype=np.float32)
    for k in range(k_bins):
        fold[(k % bins_per_octave) * 12 // bins_per_octave, k] = 1.0
    chroma = jnp.matmul(mag * mag, jnp.asarray(fold).T, preferred_element_type=jnp.float32)
    total = jnp.sum(chroma, axis=-1, keepdims=True)
    return jnp.where(total > _EPS, chroma / jnp.maximum(total, _EPS), chroma)


# ---------------------------------------------------------------------
# HPCP
# ---------------------------------------------------------------------

@partial(
    jax.jit,
    static_argnames=(
        "sample_rate", "window_size", "size", "max_peaks", "band_preset",
        "non_linear", "max_shifted", "weight_type",
    ),
)
def hpcp_from_magnitude(
    magnitude: jnp.ndarray,
    sample_rate: int,
    window_size: int,
    size: int = 12,
    reference_freq: float = 440.0,
    window_semitones: float = 1.0,
    min_freq: float = 40.0,
    max_freq: float = 5000.0,
    split_freq: float = 500.0,
    band_preset: bool = True,
    non_linear: bool = False,
    max_shifted: bool = False,
    weight_type: str = "cosine",
    max_peaks: int = 24,
) -> jnp.ndarray:
    """HPCP [..., size] from magnitude frames [..., F]
    (hpcp.go:147-204 + ComputeFromSpectrum :205-222).

    Peaks -> pitch class (scaled to `size`) -> cosine-window contribution
    to neighbouring bins with circular wrap -> unit-energy normalization.
    """
    freqs, mags, count = detect_spectral_peaks(
        magnitude, sample_rate, window_size, max_peaks=max_peaks
    )
    valid = (freqs >= min_freq) & (freqs <= max_freq) & (mags > 0)

    # peak weight: x2 boost below split frequency (hpcp.go:239-252)
    weight = mags
    if band_preset:
        weight = jnp.where(freqs < split_freq, weight * 2.0, weight)

    # pitch class scaled to HPCP size (hpcp.go:224-237)
    midi = 69.0 + 12.0 * jnp.log2(jnp.maximum(freqs, _EPS) / reference_freq)
    pc = jnp.mod(midi, 12.0) * (size / 12.0)

    window_bins = window_semitones * size / 12.0
    bins = jnp.arange(size, dtype=jnp.float32)
    # circular distance from each peak's pc to each bin
    dist = jnp.abs(bins[None, :] - pc[..., :, None])  # [..., K, size]
    dist = jnp.minimum(dist, size - dist)
    if weight_type == "cosine":
        wwin = jnp.maximum(0.0, jnp.cos(jnp.pi * dist / jnp.maximum(window_bins, _EPS)))
    elif weight_type == "squared_cosine":
        c = jnp.maximum(0.0, jnp.cos(jnp.pi * dist / jnp.maximum(window_bins, _EPS)))
        wwin = c * c
    else:
        wwin = jnp.ones_like(dist)
    wwin = jnp.where(dist <= window_bins / 2.0, wwin, 0.0)

    contrib = jnp.where(valid[..., :, None], weight[..., :, None] * wwin, 0.0)
    hpcp = jnp.sum(contrib, axis=-2)  # [..., size]

    if non_linear:
        hpcp = jnp.where(hpcp > 0, jnp.log1p(hpcp), hpcp)

    # unit-energy normalization (common.Normalizer Energy)
    norm = jnp.sqrt(jnp.sum(hpcp * hpcp, axis=-1, keepdims=True))
    hpcp = jnp.where(norm > _EPS, hpcp / jnp.maximum(norm, _EPS), hpcp)

    if max_shifted:
        # best circular shift by self-correlation against the unshifted
        # profile (hpcp.go:339-374)
        def corr_at(s):
            return jnp.sum(hpcp * jnp.roll(hpcp, s, axis=-1), axis=-1)

        corrs = jnp.stack([corr_at(s) for s in range(size)], axis=-1)
        best = jnp.argmax(corrs, axis=-1)
        idx = (jnp.arange(size)[None, :] - best[..., None]) % size
        hpcp = jnp.take_along_axis(hpcp, idx, axis=-1)

    return hpcp


def hpcp_entropy(hpcp: jnp.ndarray) -> jnp.ndarray:
    """Shannon entropy of the normalized profile (hpcp.go:385-406)."""
    total = jnp.sum(hpcp, axis=-1, keepdims=True)
    p = jnp.where(total > 0, hpcp / jnp.maximum(total, _EPS), 0.0)
    return jnp.sum(jnp.where(p > 0, -p * jnp.log2(jnp.maximum(p, _EPS)), 0.0), axis=-1)
