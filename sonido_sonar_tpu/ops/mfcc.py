"""MFCC: power spectrum -> mel filterbank -> log -> DCT-II -> liftering.

Reference parity: algorithms/spectral/mfcc.go — defaults 13 coeffs /
26 mel filters / lifter 22 (:44-53), log floor log(1e-10) (:136-143),
orthonormal DCT-II matrix (:194-212), sinusoidal liftering
`1 + (L/2) sin(pi*i/L)` with C0 unliftered (:230-245).

The whole computation is two matmuls + a log: [B,T,F] x [F,M] -> log ->
[B,T,M] x [M,C] — ideal for the MXU, fused with the STFT magnitude pass
by XLA.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from sonido_sonar_tpu.ops.mel import mel_filterbank

_LOG_FLOOR = 1e-10


@dataclass(frozen=True)
class MFCCParams:
    """mfcc.go:13-30."""

    num_coefficients: int = 13
    num_mel_filters: int = 26
    low_freq: float = 0.0
    high_freq: float = 0.0  # <=0 -> sample_rate/2
    use_liftering: bool = True
    lifter_coeff: float = 22.0


@functools.lru_cache(maxsize=64)
def dct_matrix(num_coefficients: int, num_mel_filters: int, dtype=np.float32) -> np.ndarray:
    """Orthonormal DCT-II [C, M] (mfcc.go:194-212)."""
    k = np.arange(num_coefficients, dtype=np.float64)[:, None]
    n = np.arange(num_mel_filters, dtype=np.float64)[None, :]
    d = np.cos(np.pi * k * (n + 0.5) / num_mel_filters)
    d[0, :] *= np.sqrt(1.0 / num_mel_filters)
    d[1:, :] *= np.sqrt(2.0 / num_mel_filters)
    out = d.astype(dtype)
    out.setflags(write=False)
    return out


@functools.lru_cache(maxsize=64)
def lifter_vector(num_coefficients: int, lifter_coeff: float, dtype=np.float32) -> np.ndarray:
    """`1 + (L/2) sin(pi*i/L)`, C0 unliftered (mfcc.go:230-245)."""
    i = np.arange(num_coefficients, dtype=np.float64)
    lift = 1.0 + (lifter_coeff / 2.0) * np.sin(np.pi * i / lifter_coeff)
    lift[0] = 1.0
    out = lift.astype(dtype)
    out.setflags(write=False)
    return out


@partial(jax.jit, static_argnames=("sample_rate", "fft_size", "params"))
def mfcc(
    magnitude: jnp.ndarray,
    sample_rate: int,
    fft_size: int,
    params: MFCCParams = MFCCParams(),
) -> jnp.ndarray:
    """MFCC over frames: magnitude [..., F] -> [..., C].

    Matches MFCC.Compute/ComputeFrames (mfcc.go:113-191).
    """
    high = params.high_freq if params.high_freq > 0 else sample_rate / 2.0
    fb = jnp.asarray(
        mel_filterbank(
            params.num_mel_filters, fft_size, sample_rate, params.low_freq, high
        )
    )
    dct = jnp.asarray(dct_matrix(params.num_coefficients, params.num_mel_filters))

    # HIGHEST precision: MXU bf16 passes would inject ~1e-3 relative error
    # which log() then amplifies — parity needs true f32 accumulation. These
    # matmuls are tiny next to the rFFT, so the cost is negligible.
    power = magnitude * magnitude
    mel_spec = jnp.matmul(
        power, fb.T, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return mfcc_from_mel(mel_spec, params)


def mfcc_from_mel(mel_spec: jnp.ndarray, params: MFCCParams = MFCCParams()) -> jnp.ndarray:
    """log -> DCT-II -> lifter tail of `mfcc` over precomputed mel
    energies [..., M] (e.g. the Pallas STFT feature-epilogue's mel lanes,
    which run the same HIGHEST-precision filterbank matmul in-kernel)."""
    dct = jnp.asarray(dct_matrix(params.num_coefficients, params.num_mel_filters))
    log_mel = jnp.log(jnp.maximum(mel_spec, _LOG_FLOOR))
    coeffs = jnp.matmul(
        log_mel, dct.T, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    if params.use_liftering:
        coeffs = coeffs * jnp.asarray(
            lifter_vector(params.num_coefficients, params.lifter_coeff)
        )
    return coeffs


def mel_spectrum(
    magnitude: jnp.ndarray,
    sample_rate: int,
    fft_size: int,
    params: MFCCParams = MFCCParams(),
) -> jnp.ndarray:
    """Mel power spectrum [..., M] (MFCCResult.MelSpectrum)."""
    high = params.high_freq if params.high_freq > 0 else sample_rate / 2.0
    fb = jnp.asarray(
        mel_filterbank(
            params.num_mel_filters, fft_size, sample_rate, params.low_freq, high
        )
    )
    return jnp.matmul(
        magnitude * magnitude, fb.T, preferred_element_type=jnp.float32
    )


def log_energy_c0(
    magnitude: jnp.ndarray,
    sample_rate: int,
    fft_size: int,
    params: MFCCParams = MFCCParams(),
) -> jnp.ndarray:
    """C0 before liftering = MFCCResult.LogEnergy (mfcc.go:152-156)."""
    p = MFCCParams(**{**params.__dict__, "use_liftering": False})
    return mfcc(magnitude, sample_rate, fft_size, p)[..., 0]
