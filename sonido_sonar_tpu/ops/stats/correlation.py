"""Cross-correlation with peak-quality metrics.

Reference parity: algorithms/stats/correlation.go —
  types Pearson / NCC / ZNCC (:12-27); FFT path: z-normalize inputs,
  zero-pad to next pow2 of n1+n2-1, FFT1 * conj(FFT2), IFFT, lag
  re-index negative lags to the tail (:231-290); auto-switch to FFT for
  signals > 1000 samples (:140); max lag clamped to min(len-1) (:452-462);
  peak = max |corr| (:526-545); metrics: SNR excluding +-5 around the
  peak (:572-601), sharpness = -(2nd difference at peak) (:611-619),
  second peak (:622-637), peak-to-sidelobe excluding +-10 (:639-662);
  step-function p-value (:547-569).

TPU design: the correlation lag axis is produced by one rFFT/irFFT pair
over statically padded arrays; peak metrics are masked reductions. The
whole thing jits and batches over leading axes. The reference's
always-zero `getTimeMs` (quirk #6) is *not* replicated — wall time is
measured by the caller when needed.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

_MIN_STD = 1e-10


def _next_pow2(n: int) -> int:
    k = 1
    while k < n:
        k <<= 1
    return k


@dataclass
class CorrelationResult:
    """CorrelationResult (correlation.go:43-73). Arrays batch over
    leading axes; `lags` is shared (static) across the batch."""

    correlations: jnp.ndarray  # [..., 2*max_lag+1]
    lags: jnp.ndarray          # [2*max_lag+1] int32
    peak_correlation: jnp.ndarray  # [...]
    peak_lag: jnp.ndarray          # [...] int32
    peak_index: jnp.ndarray        # [...] int32
    p_value: jnp.ndarray
    snr: jnp.ndarray
    sharpness: jnp.ndarray
    second_peak: jnp.ndarray
    peak_to_sidelobe: jnp.ndarray
    overlap_length: jnp.ndarray
    max_lag: int


jax.tree_util.register_pytree_node(
    CorrelationResult,
    lambda r: (
        (
            r.correlations, r.lags, r.peak_correlation, r.peak_lag,
            r.peak_index, r.p_value, r.snr, r.sharpness, r.second_peak,
            r.peak_to_sidelobe, r.overlap_length,
        ),
        (r.max_lag,),
    ),
    lambda aux, ch: CorrelationResult(*ch, max_lag=aux[0]),
)


def z_normalize(signal: jnp.ndarray) -> jnp.ndarray:
    """Zero mean, unit variance; constant signals only get mean removal
    (correlation.go:464-502)."""
    mean = jnp.mean(signal, axis=-1, keepdims=True)
    centered = signal - mean
    std = jnp.sqrt(jnp.mean(centered * centered, axis=-1, keepdims=True))
    return jnp.where(std < _MIN_STD, centered, centered / jnp.maximum(std, _MIN_STD))


@partial(jax.jit, static_argnames=("max_lag", "n1", "n2", "normalize_inputs"))
def _fft_correlations(
    x1: jnp.ndarray, x2: jnp.ndarray, max_lag: int, n1: int, n2: int,
    normalize_inputs: bool,
) -> jnp.ndarray:
    if normalize_inputs:
        x1 = z_normalize(x1)
        x2 = z_normalize(x2)
    fft_size = _next_pow2(n1 + n2 - 1)
    f1 = jnp.fft.rfft(x1, n=fft_size, axis=-1)
    f2 = jnp.fft.rfft(x2, n=fft_size, axis=-1)
    corr_full = jnp.fft.irfft(f1 * jnp.conj(f2), n=fft_size, axis=-1)
    # lags -max_lag..max_lag; negative lags live at the tail of the ifft
    pos = corr_full[..., : max_lag + 1]                # lags 0..max_lag
    neg = corr_full[..., fft_size - max_lag :]         # lags -max_lag..-1
    return jnp.concatenate([neg, pos], axis=-1)


def _peak_metrics(
    correlations: jnp.ndarray, max_lag: int, n1: int, n2: int
) -> Tuple[jnp.ndarray, ...]:
    num_lags = 2 * max_lag + 1
    idx = jnp.arange(num_lags)
    abs_c = jnp.abs(correlations)

    peak_index = jnp.argmax(abs_c, axis=-1)
    peak_corr = jnp.take_along_axis(
        correlations, peak_index[..., None], axis=-1
    )[..., 0]
    peak_lag = peak_index.astype(jnp.int32) - max_lag

    # SNR: RMS of correlations more than 5 bins from the peak
    far5 = jnp.abs(idx - peak_index[..., None]) > 5
    noise_cnt = jnp.sum(far5, axis=-1)
    noise_pow = jnp.sum(
        jnp.where(far5, correlations * correlations, 0.0), axis=-1
    )
    noise = jnp.sqrt(noise_pow / jnp.maximum(noise_cnt, 1))
    snr = jnp.where(
        noise_cnt == 0,
        0.0,
        jnp.where(
            noise < _MIN_STD,
            jnp.inf,
            20.0 * jnp.log10(jnp.abs(peak_corr) / jnp.maximum(noise, _MIN_STD)),
        ),
    )

    # sharpness: -(c[p+1] - 2c[p] + c[p-1]) with edges giving 0
    pm1 = jnp.clip(peak_index - 1, 0, num_lags - 1)
    pp1 = jnp.clip(peak_index + 1, 0, num_lags - 1)
    c_m = jnp.take_along_axis(correlations, pm1[..., None], axis=-1)[..., 0]
    c_p = jnp.take_along_axis(correlations, pp1[..., None], axis=-1)[..., 0]
    interior = (peak_index > 0) & (peak_index < num_lags - 1)
    sharpness = jnp.where(interior, -(c_p - 2.0 * peak_corr + c_m), 0.0)

    # second peak: max |corr| excluding the peak index itself
    masked = jnp.where(idx == peak_index[..., None], -jnp.inf, abs_c)
    second_idx = jnp.argmax(masked, axis=-1)
    second_peak = jnp.take_along_axis(
        correlations, second_idx[..., None], axis=-1
    )[..., 0]

    # peak-to-sidelobe: max |corr| more than 10 bins away
    far10 = jnp.abs(idx - peak_index[..., None]) > 10
    sidelobe = jnp.max(jnp.where(far10, abs_c, 0.0), axis=-1)
    psl = jnp.where(
        sidelobe < _MIN_STD,
        jnp.inf,
        20.0 * jnp.log10(jnp.abs(peak_corr) / jnp.maximum(sidelobe, _MIN_STD)),
    )

    # step-function p-value (correlation.go:547-569)
    n = min(n1, n2)
    r = jnp.abs(peak_corr)
    t = r * jnp.sqrt(float(max(n - 2, 0))) / jnp.sqrt(jnp.maximum(1.0 - r * r, _MIN_STD))
    p_value = jnp.where(t > 2.0, 0.01, jnp.where(t > 1.5, 0.05, jnp.where(t > 1.0, 0.1, 0.5)))
    if n <= 2:
        p_value = jnp.ones_like(p_value)

    # overlap length at peak lag (correlation.go:664-668)
    overlap = jnp.where(
        peak_lag >= 0,
        jnp.minimum(n1, n2 - peak_lag),
        jnp.minimum(n1 + peak_lag, n2),
    )
    return (
        peak_corr, peak_lag, peak_index.astype(jnp.int32), p_value, snr,
        sharpness, second_peak, psl, overlap,
    )


def cross_correlate_fft(
    signal1: jnp.ndarray,
    signal2: jnp.ndarray,
    max_lag: int,
    normalize_inputs: bool = True,
) -> CorrelationResult:
    """FFT cross-correlation over +-max_lag with full peak metrics.

    corr[lag] = sum_n z(x1)[n] * z(x2)[n - lag] — matching the reference
    FFT path exactly (correlation.go:231-290): a positive peak lag means
    signal2 is *advanced* (signal1 delayed) by that many samples.
    Batches over leading axes.
    """
    n1, n2 = signal1.shape[-1], signal2.shape[-1]
    max_lag = max(min(max_lag, n1 - 1, n2 - 1), 0)
    corr = _fft_correlations(
        signal1.astype(jnp.float32), signal2.astype(jnp.float32),
        max_lag, n1, n2, normalize_inputs,
    )
    lags = jnp.arange(-max_lag, max_lag + 1, dtype=jnp.int32)
    metrics = _peak_metrics(corr, max_lag, n1, n2)
    return CorrelationResult(corr, lags, *metrics, max_lag=max_lag)


def _per_lag_overlap_correlations(
    x1: jnp.ndarray, x2: jnp.ndarray, max_lag: int, kind: str
) -> jnp.ndarray:
    """Per-lag overlap correlations, kind in pearson | ncc | zncc —
    computeAtLag's type dispatch (correlation.go:300-417).

    Lag sign convention note (NOTE deviation): the reference's
    time-domain path pairs x1[i] with x2[i+lag] at positive lag
    (calculateOverlapRegion, correlation.go:419-447), which is the
    OPPOSITE of its own FFT path (FFT1*conj(FFT2): x1[n]*x2[n-lag]).
    We unify on the FFT convention for every method so peak lags mean
    the same thing regardless of signal length; parity tests compare
    against the Go time-domain math at the negated lag.
    """
    n1, n2 = x1.shape[-1], x2.shape[-1]
    if kind == "zncc":
        # subtractMean then NCC (correlation.go:410-417)
        x1 = x1 - jnp.mean(x1, axis=-1, keepdims=True)
        x2 = x2 - jnp.mean(x2, axis=-1, keepdims=True)
        kind = "ncc"
    lags = jnp.arange(-max_lag, max_lag + 1, dtype=jnp.int32)
    n = max(n1, n2)
    i = jnp.arange(n)

    def at_lag(lag):
        # overlap: x1[j] vs x2[j - lag]
        j2 = i - lag
        valid = (i < n1) & (j2 >= 0) & (j2 < n2)
        v1 = jnp.where(valid, x1[..., jnp.clip(i, 0, n1 - 1)], 0.0)
        v2 = jnp.where(valid, x2[..., jnp.clip(j2, 0, n2 - 1)], 0.0)
        if kind == "pearson":
            cnt = jnp.maximum(jnp.sum(valid), 1)
            m1 = jnp.sum(v1, axis=-1) / cnt
            m2 = jnp.sum(v2, axis=-1) / cnt
            v1 = jnp.where(valid, v1 - m1[..., None], 0.0)
            v2 = jnp.where(valid, v2 - m2[..., None], 0.0)
        num = jnp.sum(v1 * v2, axis=-1)
        den = jnp.sqrt(jnp.sum(v1 * v1, axis=-1) * jnp.sum(v2 * v2, axis=-1))
        c = jnp.where(den < _MIN_STD, 0.0, num / jnp.maximum(den, _MIN_STD))
        if kind == "pearson":
            c = jnp.clip(c, -1.0, 1.0)
        return c

    return jax.vmap(at_lag, out_axes=-1)(lags)


def cross_correlate_pearson(
    signal1: jnp.ndarray, signal2: jnp.ndarray, max_lag: int,
    correlation_type: str = "pearson",
) -> CorrelationResult:
    """Per-lag correlation over the overlap region — the reference's
    time-domain/sliding-window path (correlation.go:203-229, 293-417).
    O(L*N); exact local normalization per lag. correlation_type:
    "pearson" (local means + stds), "ncc" (raw energy normalization),
    "zncc" (whole-signal mean removal then ncc).

    NOTE on the sliding-window windowSize knob: the reference's
    SlidingWindow method is a wholesale delegation to computeTimeDomain
    (correlation.go:294-297) — its windowSize config field is read by
    NO code path in the stats package, so there is deliberately no such
    parameter here; this function IS the sliding-window method."""
    n1, n2 = signal1.shape[-1], signal2.shape[-1]
    max_lag = max(min(max_lag, n1 - 1, n2 - 1), 0)
    lags = jnp.arange(-max_lag, max_lag + 1, dtype=jnp.int32)
    corr = _per_lag_overlap_correlations(
        signal1.astype(jnp.float32), signal2.astype(jnp.float32),
        max_lag, correlation_type,
    )
    metrics = _peak_metrics(corr, max_lag, n1, n2)
    return CorrelationResult(corr, lags, *metrics, max_lag=max_lag)


def cross_correlate(
    signal1: jnp.ndarray,
    signal2: jnp.ndarray,
    max_lag: int,
    method: str = "auto",
    normalize_inputs: bool = True,
    fft_threshold: int = 1000,
    correlation_type: str = "pearson",
) -> CorrelationResult:
    """Method dispatch mirroring CrossCorrelation.Compute
    (correlation.go:131-200): auto switches to FFT when either signal
    exceeds fft_threshold samples; "sliding" is the time-domain per-lag
    path with local normalization (computeSlidingWindow delegates to it
    upstream, correlation.go:293-297). correlation_type selects the
    per-lag normalization for the time/sliding path
    (pearson | ncc | zncc, correlation.go:300-417)."""
    n = max(signal1.shape[-1], signal2.shape[-1])
    if method == "fft" or (method == "auto" and n > fft_threshold):
        return cross_correlate_fft(signal1, signal2, max_lag, normalize_inputs)
    if method in ("time", "auto", "sliding"):
        return cross_correlate_pearson(
            signal1, signal2, max_lag, correlation_type
        )
    raise ValueError(f"unknown correlation method {method}")


def autocorrelate(signal: jnp.ndarray, max_lag: int) -> CorrelationResult:
    """AutoCorrelation.Compute (correlation.go:668-690)."""
    return cross_correlate(signal, signal, max_lag)
