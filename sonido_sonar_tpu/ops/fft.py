"""Thin FFT wrappers (reference: algorithms/spectral/fft.go:19-51).

The reference wraps go-dsp's FFTReal/IFFT; here the equivalents are
jnp.fft (XLA FFT HLO). Kept as a module so the layer map matches the
inventory and callers have one import point.
"""

from __future__ import annotations

import jax.numpy as jnp


def compute(signal: jnp.ndarray) -> jnp.ndarray:
    """Real -> complex spectrum (FFT.Compute / fft.FFTReal)."""
    return jnp.fft.rfft(signal.astype(jnp.float32), axis=-1)


def compute_inverse(spectrum: jnp.ndarray) -> jnp.ndarray:
    """Complex -> complex inverse (FFT.ComputeInverse / fft.IFFT)."""
    return jnp.fft.ifft(spectrum, axis=-1)


def compute_inverse_real(spectrum: jnp.ndarray, n: int | None = None) -> jnp.ndarray:
    """Complex half-spectrum -> real signal (FFT.ComputeInverseReal)."""
    return jnp.fft.irfft(spectrum, n=n, axis=-1)


def fft_complex(signal: jnp.ndarray) -> jnp.ndarray:
    return jnp.fft.fft(signal, axis=-1)
