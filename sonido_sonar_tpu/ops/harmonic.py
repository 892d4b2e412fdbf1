"""Harmonic analysis: spectral peaks, HPS, autocorrelation F0.

Reference parity: algorithms/harmonic/*.go —
  spectral_peaks.go: local maxima above min height with greedy
    min-distance suppression keeping the higher peak (:36-100);
  harmonic_product.go: HPS = product of downsampled power spectra,
    F0 = argmax within [minF0, maxF0] (:10-60);
  fundamental_estimation.go: autocorrelation F0 with lag bounds from
    the F0 range (:10-55).

TPU design: variable-length peak lists become fixed-k arrays + count
via iterative greedy non-max suppression (k iterations of masked argmax
— exactly the reference's keep-the-higher-peak semantics).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

_EPS = 1e-10


@partial(jax.jit, static_argnames=("max_peaks", "window_size", "sample_rate", "min_peak_distance_hz", "min_peak_height"))
def detect_spectral_peaks(
    magnitude: jnp.ndarray,
    sample_rate: int,
    window_size: int,
    max_peaks: int = 16,
    min_peak_height: float = 0.0,
    min_peak_distance_hz: float = 50.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Greedy peak picking on [..., F] magnitude frames.

    Returns (freqs [..., max_peaks], mags [..., max_peaks], count [...]).
    Greedy max-first suppression of +-min_distance bins reproduces the
    reference's keep-the-higher-peak rule (spectral_peaks.go:54-73).
    """
    f_bins = magnitude.shape[-1]
    freq_res = sample_rate / float(window_size)
    min_dist_bins = max(int(min_peak_distance_hz / freq_res), 1)

    local_max = (
        (magnitude[..., 1:-1] > magnitude[..., :-2])
        & (magnitude[..., 1:-1] > magnitude[..., 2:])
        & (magnitude[..., 1:-1] >= min_peak_height)
    )
    cand = jnp.pad(local_max, [(0, 0)] * (local_max.ndim - 1) + [(1, 1)])
    score0 = jnp.where(cand, magnitude, -jnp.inf)
    bins = jnp.arange(f_bins)

    def body(i, state):
        score, out_idx, out_mag, count = state
        best = jnp.argmax(score, axis=-1)
        best_val = jnp.take_along_axis(score, best[..., None], axis=-1)[..., 0]
        ok = jnp.isfinite(best_val)
        out_idx = out_idx.at[..., i].set(jnp.where(ok, best, -1))
        out_mag = out_mag.at[..., i].set(jnp.where(ok, best_val, 0.0))
        count = count + ok.astype(jnp.int32)
        # suppress +-min_dist_bins around the chosen peak
        near = jnp.abs(bins - best[..., None]) < min_dist_bins
        score = jnp.where(near, -jnp.inf, score)
        return score, out_idx, out_mag, count

    out_idx0 = jnp.full(magnitude.shape[:-1] + (max_peaks,), -1, jnp.int32)
    out_mag0 = jnp.zeros(magnitude.shape[:-1] + (max_peaks,), jnp.float32)
    count0 = jnp.zeros(magnitude.shape[:-1], jnp.int32)
    _, idx, mags, count = jax.lax.fori_loop(
        0, max_peaks, body, (score0, out_idx0, out_mag0, count0)
    )
    freqs = jnp.where(idx >= 0, idx.astype(jnp.float32) * freq_res, 0.0)
    return freqs, mags, count


def harmonic_product_spectrum(
    magnitude: jnp.ndarray, num_harmonics: int = 5
) -> jnp.ndarray:
    """HPS(f) = prod_h power(h*f) over downsampled spectra
    (harmonic_product.go:10-40). [..., F] -> [..., F//num_harmonics]."""
    power = magnitude * magnitude
    f = magnitude.shape[-1]
    out_len = f // num_harmonics
    hps = power[..., :out_len]
    for h in range(2, num_harmonics + 1):
        idx = jnp.arange(out_len) * h
        hps = hps * power[..., idx]
    return hps


def estimate_f0_hps(
    magnitude: jnp.ndarray,
    sample_rate: int,
    window_size: int,
    min_f0: float = 50.0,
    max_f0: float = 2000.0,
    num_harmonics: int = 5,
) -> jnp.ndarray:
    """F0 = argmax of HPS within [min_f0, max_f0]
    (harmonic_product.go:42-60)."""
    hps = harmonic_product_spectrum(magnitude, num_harmonics)
    freq_res = sample_rate / float(window_size)
    freqs = jnp.arange(hps.shape[-1], dtype=jnp.float32) * freq_res
    in_range = (freqs >= min_f0) & (freqs <= max_f0)
    masked = jnp.where(in_range, hps, -jnp.inf)
    best = jnp.argmax(masked, axis=-1)
    return best.astype(jnp.float32) * freq_res


def estimate_f0_autocorrelation(
    frame: jnp.ndarray,
    sample_rate: int,
    min_f0: float = 50.0,
    max_f0: float = 2000.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Autocorrelation F0 with lag bounds from the F0 range
    (fundamental_estimation.go:10-55). Returns (f0, confidence)."""
    from sonido_sonar_tpu.ops.pitch import PitchParams, acf_pitch

    params = PitchParams(
        sample_rate=sample_rate,
        window_size=frame.shape[-1],
        min_freq=min_f0,
        max_freq=max_f0,
    )
    return acf_pitch(frame, params)
