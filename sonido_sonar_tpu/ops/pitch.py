"""Pitch detection: YIN (FFT-accelerated), ACF, and frame-wise tracking.

Reference parity: algorithms/tonal/pitch_detection.go —
  YIN (:349-421): difference function d(tau) = sum_{j<H} (x[j]-x[j+tau])^2
  with H = W/2 fixed; CMNDF d'(0)=1, d'(tau) = d(tau)*tau / sum_{1..tau} d;
  first local minimum below threshold 0.15; parabolic interpolation;
  confidence = 1 - cmndf[tau]; frequency validated against [min,max] Hz.
  Defaults: window 1024, 80-1000 Hz (params at :160-175).
  ACF method (:423-...): autocorrelation peak in the lag range.

TPU formulation (SURVEY.md hard-part #5): the O(W^2) difference loop
becomes d(tau) = E1 + S(tau) - 2 r(tau) where E1 = energy of the first
half (constant), S(tau) = sliding half-window energy (cumsum lookup),
and r(tau) = cross-correlation of the first half with the frame (one
rFFT) — O(W log W), batched over all frames at once.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

_EPS = 1e-10

# windows up to this size use the DFT-as-matmul correlation (MXU) in
# the YIN difference function; larger fall back to jnp.fft
_MATMUL_YIN_MAX_W = 2048


@functools.lru_cache(maxsize=16)
def _yin_dft_mats(w: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """Constant matrices for the matmul YIN correlation.

    Returns (M_x [w, 2F], M_first [h, 2F], M_inv [2F, h], n_fft) with
    h = w//2, F = n_fft//2+1: forward rDFT bases for the full frame and
    its first half, and the truncated inverse producing r(tau), tau < h.
    """
    h = w // 2
    # transform length w: circular correlation of length n equals the
    # linear correlation for every needed lag as long as j + tau never
    # wraps, and max(j + tau) = (h-1) + (h-1) = w - 2 < w — so length w
    # (not w + h) suffices, a 33% flop cut at bit-identical math
    n_fft = w
    f_bins = n_fft // 2 + 1
    k = np.arange(f_bins, dtype=np.float64)[None, :]

    nx = np.arange(w, dtype=np.float64)[:, None]
    ang_x = -2.0 * np.pi * nx * k / n_fft
    m_x = np.concatenate([np.cos(ang_x), np.sin(ang_x)], axis=1)

    nf = np.arange(h, dtype=np.float64)[:, None]
    ang_f = -2.0 * np.pi * nf * k / n_fft
    m_first = np.concatenate([np.cos(ang_f), np.sin(ang_f)], axis=1)

    # inverse: r[t] = (1/N) sum_k w_k (Re_k cos(2 pi k t/N) - Im_k sin(...))
    t = np.arange(h, dtype=np.float64)[None, :]
    kk = np.arange(f_bins, dtype=np.float64)[:, None]
    wk = np.full((f_bins, 1), 2.0)
    wk[0, 0] = 1.0
    if n_fft % 2 == 0:
        wk[-1, 0] = 1.0
    ang_i = 2.0 * np.pi * kk * t / n_fft
    m_inv = np.concatenate(
        [wk * np.cos(ang_i), -wk * np.sin(ang_i)], axis=0
    ) / n_fft

    return (
        m_x.astype(np.float32),
        m_first.astype(np.float32),
        m_inv.astype(np.float32),
        n_fft,
    )


@dataclass(frozen=True)
class PitchParams:
    """pitch_detection.go:160-175 defaults."""

    sample_rate: int = 44100
    window_size: int = 1024
    min_freq: float = 80.0
    max_freq: float = 1000.0
    yin_threshold: float = 0.15
    voicing_threshold: float = 0.45


def _yin_difference(frames: jnp.ndarray) -> jnp.ndarray:
    """d(tau) for tau in [0, W/2), batched [..., W] -> [..., W/2].

    d(tau) = sum_{j<H} (x[j] - x[j+tau])^2,  H = W/2
           = E1 + S(tau) - 2 * r(tau)
    """
    w = frames.shape[-1]
    h = w // 2
    x = frames.astype(jnp.float32)
    first = x[..., :h]
    e1 = jnp.sum(first * first, axis=-1, keepdims=True)

    # S(tau) = sum_{j=tau}^{tau+H-1} x[j]^2 via cumsum; the tau windows
    # are contiguous, so both operands are static slices (an arange
    # index here lowers to a gather — measurably slower at scale)
    sq = x * x
    csum = jnp.cumsum(sq, axis=-1)
    zero = jnp.zeros_like(csum[..., :1])
    csum0 = jnp.concatenate([zero, csum], axis=-1)  # csum0[k] = sum x[<k]^2
    s = csum0[..., h : 2 * h] - csum0[..., :h]

    # r(tau) = sum_{j<H} x[j] x[j+tau]: correlation of `first` against x.
    if w <= _MATMUL_YIN_MAX_W:
        # DFT-as-matmul on the MXU: forward transforms of the frame and
        # its first half, conjugate cross-power, truncated inverse
        m_x, m_first, m_inv, n_fft = _yin_dft_mats(w)
        f_bins = n_fft // 2 + 1
        fx = jnp.matmul(
            x, jnp.asarray(m_x), preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGH,
        )
        ff = jnp.matmul(
            first, jnp.asarray(m_first), preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGH,
        )
        rex, imx = fx[..., :f_bins], fx[..., f_bins:]
        ref, imf = ff[..., :f_bins], ff[..., f_bins:]
        # conj(F_first) * F_x
        re = ref * rex + imf * imx
        im = ref * imx - imf * rex
        cross = jnp.concatenate([re, im], axis=-1)
        r = jnp.matmul(
            cross, jnp.asarray(m_inv), preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGH,
        )
    else:
        # circular length >= w - 1 is exact for tau < h (see _yin_dft_mats)
        n_fft = 1
        while n_fft < w - 1:
            n_fft <<= 1
        fx = jnp.fft.rfft(x, n=n_fft, axis=-1)
        ff = jnp.fft.rfft(first, n=n_fft, axis=-1)
        corr = jnp.fft.irfft(jnp.conj(ff) * fx, n=n_fft, axis=-1)
        r = corr[..., :h]

    return e1 + s - 2.0 * r


def _cmndf(diff: jnp.ndarray) -> jnp.ndarray:
    """Cumulative mean normalized difference (pitch_detection.go:365-372)."""
    h = diff.shape[-1]
    tau = jnp.arange(1, h, dtype=jnp.float32)
    running = jnp.cumsum(diff[..., 1:], axis=-1)
    cm = diff[..., 1:] * tau / jnp.maximum(running, _EPS)
    one = jnp.ones_like(diff[..., :1])
    return jnp.concatenate([one, cm], axis=-1)


def _yin_pick(
    d: jnp.ndarray, params: PitchParams
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """CMNDF + threshold pick + parabolic interpolation + validation
    over difference rows d [..., H] (pitch_detection.go:365-421)."""
    cm = _cmndf(d)
    h = cm.shape[-1]

    # first tau >= 1 with cmndf < threshold and cmndf[tau] < cmndf[tau+1]
    nxt = jnp.concatenate([cm[..., 1:], jnp.full_like(cm[..., :1], jnp.inf)], axis=-1)
    cand = (cm < params.yin_threshold) & (cm < nxt)
    cand = cand.at[..., 0].set(False)
    has = jnp.any(cand, axis=-1)
    min_tau = jnp.argmax(cand, axis=-1)  # first True

    # parabolic interpolation on cmndf around min_tau. One-hot masked
    # reductions, not take_along_axis: three per-row single-element
    # gathers on a [B, T, H] lag axis cost ~1.6 ms EACH on-chip (music
    # trace, docs/PERF.md — element gathers are never the answer on
    # TPU); the masked sums fuse into one vector pass.
    tm1 = jnp.clip(min_tau - 1, 0, h - 1)
    tp1 = jnp.clip(min_tau + 1, 0, h - 1)
    iota = jnp.arange(h, dtype=min_tau.dtype)
    y0 = jnp.sum(jnp.where(iota == tm1[..., None], cm, 0.0), axis=-1)
    y1 = jnp.sum(jnp.where(iota == min_tau[..., None], cm, 0.0), axis=-1)
    y2 = jnp.sum(jnp.where(iota == tp1[..., None], cm, 0.0), axis=-1)
    denom = y0 - 2.0 * y1 + y2
    shift = jnp.where(
        jnp.abs(denom) > _EPS, 0.5 * (y0 - y2) / jnp.where(jnp.abs(denom) > _EPS, denom, 1.0), 0.0
    )
    interior = (min_tau > 0) & (min_tau < h - 1)
    period = min_tau.astype(jnp.float32) + jnp.where(interior, shift, 0.0)

    freq = params.sample_rate / jnp.maximum(period, _EPS)
    confidence = 1.0 - y1
    in_range = (freq >= params.min_freq) & (freq <= params.max_freq)
    ok = has & in_range
    pitch = jnp.where(ok, freq, 0.0)
    conf = jnp.where(ok, confidence, 0.0)
    return pitch, conf, conf  # Voicing = confidence (pitch_detection.go:405)


@partial(jax.jit, static_argnames=("params",))
def yin_pitch(
    frames: jnp.ndarray, params: PitchParams = PitchParams()
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """YIN over frames [..., W] -> (pitch_hz, confidence, voicing), each [...].

    Unvoiced / out-of-range frames get pitch 0, confidence 0 — matching
    the reference's empty result (pitch_detection.go:392-421).
    """
    return _yin_pick(_yin_difference(frames), params)


def yin_pitch_from_signal(
    signal: jnp.ndarray,
    frame_size: int,
    hop_size: int,
    params: PitchParams,
    pre_emph: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Frame-wise YIN straight from PCM [..., N] -> each [..., T].

    On TPU this routes through the fused Pallas kernel (framing + DFT
    matmuls + difference function in VMEM; the [.., T, W] frames tensor
    never exists in HBM — ops/pallas_yin.py); elsewhere it frames and
    runs the XLA path. Same (pitch, confidence, voicing) contract as
    yin_pitch.

    pre_emph != 0 applies ops/filters.pre_emphasis to the signal first —
    fused into the Pallas kernel on TPU (the pre-emphasized [B, N]
    intermediate never exists in HBM), an explicit host op elsewhere.
    Identical up to f32 FMA contraction either way.
    """
    from sonido_sonar_tpu.ops.framing import frame_signal
    from sonido_sonar_tpu.ops.pallas_yin import (
        pallas_yin_available,
        yin_pitch_pallas,
    )

    if pallas_yin_available(frame_size, hop_size) and signal.ndim in (1, 2):
        return yin_pitch_pallas(
            signal, frame_size, hop_size, params.sample_rate,
            params.min_freq, params.max_freq, params.yin_threshold,
            pre_emph=pre_emph,
        )
    if pre_emph != 0.0:
        from sonido_sonar_tpu.ops.filters import pre_emphasis

        signal = pre_emphasis(signal.astype(jnp.float32), pre_emph)
    frames = frame_signal(signal, frame_size, hop_size)
    return yin_pitch(frames, params)


def acf_pitch(
    frames: jnp.ndarray, params: PitchParams = PitchParams()
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Autocorrelation pitch: normalized ACF peak within the lag range
    implied by [min_freq, max_freq] (pitch_detection.go:423-...)."""
    w = frames.shape[-1]
    x = frames.astype(jnp.float32)
    x = x - jnp.mean(x, axis=-1, keepdims=True)
    n_fft = 1
    while n_fft < 2 * w:
        n_fft <<= 1
    f = jnp.fft.rfft(x, n=n_fft, axis=-1)
    ac = jnp.fft.irfft(f * jnp.conj(f), n=n_fft, axis=-1)[..., :w]
    ac0 = jnp.maximum(ac[..., :1], _EPS)
    nac = ac / ac0

    min_lag = max(int(params.sample_rate / params.max_freq), 1)
    max_lag = min(int(params.sample_rate / params.min_freq) + 1, w - 1)
    if min_lag >= max_lag:
        z = jnp.zeros(frames.shape[:-1], jnp.float32)
        return z, z
    window = nac[..., min_lag:max_lag]
    best = jnp.argmax(window, axis=-1) + min_lag
    peak = jnp.take_along_axis(nac, best[..., None], axis=-1)[..., 0]
    pitch = params.sample_rate / best.astype(jnp.float32)
    ok = peak > 0.3  # AutocorrThreshold (pitch_detection.go:168)
    return jnp.where(ok, pitch, 0.0), jnp.where(ok, peak, 0.0)


def detect_pitch_track(
    pcm: jnp.ndarray,
    sample_rate: int,
    frame_size: int = 1024,
    hop_size: int = 512,
    params: PitchParams | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Frame-wise YIN pitch track over PCM [..., N] ->
    (pitch, confidence, voicing) each [..., T].

    The fixed 1024/512 framing matches the extractors' hardcoded values
    (extractors/speech.go:468-469 — reference quirk #8, preserved as the
    default but configurable here)."""
    p = params or PitchParams(sample_rate=sample_rate, window_size=frame_size)
    return yin_pitch_from_signal(pcm, frame_size, hop_size, p)


def median_filter_pitch(pitch: jnp.ndarray, width: int = 5) -> jnp.ndarray:
    """Median smoothing of a pitch track (pitch_detection.go:767+)."""
    pad = width // 2
    padded = jnp.pad(pitch, [(0, 0)] * (pitch.ndim - 1) + [(pad, pad)], mode="edge")
    idx = jnp.arange(pitch.shape[-1])[:, None] + jnp.arange(width)[None, :]
    windows = padded[..., idx]
    return jnp.median(windows, axis=-1)
