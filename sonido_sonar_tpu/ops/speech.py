"""Speech analysis: LPC, formants, voice quality, speech detection.

Reference parity: algorithms/speech/*.go —
  lpc.go: autocorrelation method + Levinson-Durbin (:84-134), order
    12 + sr/1000 (:33), LPC spectral envelope 1/|A(e^jw)| (:233-265);
  format.go: pre-emphasis 0.97 + Hamming window -> LPC -> envelope peak
    picking (local maxima > 10% of max) -> validate (min 50 Hz, conf
    >= 0.2, bandwidth (0, 1000], 200 Hz min spacing, max 4 formants) ->
    VTL via (2n-1) * 35000 / (4 Fn) averaged over confident formants in
    [10, 25] cm, default 17.5;
  voice_quality.go: frame 1024 / hop 256 pitch track, voiced frames
    (voicing > 0.5 & conf > 0.5), jitter = mean |dT| / mean T * 100,
    shimmer = mean |dA| / mean A * 100 over period RMS amplitudes,
    F0 stability = max(0, 1 - cv), HNR, overall quality (:429-438);
  speech_analysis.go: is-speech heuristics (ZCR in (0.01, 0.3), RMS >
    0.001, autocorrelation periodicity > 0.1 within lags [20, 400)),
    gender/age estimation from formants / voice quality (:272-314).

NOTE a reference bug not replicated: lpc.go:55-60 takes
`Correlations[:order+1]` from an array indexed from lag -maxLag, i.e.
feeds Levinson-Durbin the most-negative lags instead of R[0..p]. We
compute the textbook autocorrelation R[k] = sum x[n] x[n+k].

TPU design: LPC is a batched rFFT autocorrelation + a lax.scan over the
(static, small) model order; formant peak-picking is fixed-k masked
top-k; voice quality is fully masked fixed-shape arithmetic over the
frame axis.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache, partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sonido_sonar_tpu.ops.filters import pre_emphasis
from sonido_sonar_tpu.ops.pitch import PitchParams, yin_pitch
from sonido_sonar_tpu.ops.windows import make_window
from sonido_sonar_tpu.config.config import WindowType

_EPS = 1e-10


def _register_pytree(cls, static_fields=()):
    """Register a result dataclass as a pytree (static fields in aux)."""
    import dataclasses as _dc

    names = [f.name for f in _dc.fields(cls) if f.name not in static_fields]

    def flatten(obj):
        return tuple(getattr(obj, n) for n in names), tuple(
            getattr(obj, s) for s in static_fields
        )

    def unflatten(aux, children):
        return cls(**dict(zip(names, children)), **dict(zip(static_fields, aux)))

    jax.tree_util.register_pytree_node(cls, flatten, unflatten)
    return cls


def lpc_order_for(sample_rate: int) -> int:
    """12 + sr/1000 (lpc.go:33)."""
    return 12 + sample_rate // 1000


def autocorrelation_r(signal: jnp.ndarray, max_order: int) -> jnp.ndarray:
    """Raw autocorrelation R[0..max_order], [..., N] -> [..., p+1]."""
    n = signal.shape[-1]
    size = 1
    while size < 2 * n:
        size <<= 1
    f = jnp.fft.rfft(signal.astype(jnp.float32), n=size, axis=-1)
    ac = jnp.fft.irfft(f * jnp.conj(f), n=size, axis=-1)
    return ac[..., : max_order + 1]


@partial(jax.jit, static_argnames=("order",))
def levinson_durbin(r: jnp.ndarray, order: int):
    """Levinson-Durbin recursion (lpc.go:84-134).

    r is [..., p+1]; leading axes are vmapped. Returns (a [..., p+1]
    with a[0]=1, k [..., p], gain [...], residual energy [...]).
    """

    def single(r1):
        idx = jnp.arange(order + 1)
        a0 = jnp.zeros(order + 1, jnp.float32).at[0].set(1.0)
        e0 = jnp.maximum(r1[0], _EPS)
        k0 = jnp.zeros(order, jnp.float32)

        def step(carry, i):
            a, e, ks = carry
            mask = (idx >= 1) & (idx < i)
            rij = r1[jnp.clip(i - idx, 0, order)]
            num = r1[i] - jnp.sum(jnp.where(mask, a * rij, 0.0))
            k = num / jnp.maximum(e, _EPS)
            a_rev = a[jnp.clip(i - idx, 0, order)]
            new_a = jnp.where(mask, a - k * a_rev, a)
            new_a = jnp.where(idx == i, k, new_a)
            new_e = jnp.maximum(e * (1.0 - k * k), _EPS)
            return (new_a, new_e, ks.at[i - 1].set(k)), None

        (a, e, ks), _ = jax.lax.scan(step, (a0, e0, k0), jnp.arange(1, order + 1))
        return a, ks, jnp.sqrt(e), e

    batch_shape = r.shape[:-1]
    if batch_shape == ():
        return single(r)
    flat = r.reshape(-1, r.shape[-1])
    a, k, g, e = jax.vmap(single)(flat)
    return (
        a.reshape(batch_shape + (order + 1,)),
        k.reshape(batch_shape + (order,)),
        g.reshape(batch_shape),
        e.reshape(batch_shape),
    )


@dataclass
class LPCResult:
    """LPCResult (lpc.go:13-30)."""

    coefficients: jnp.ndarray      # [..., p+1], a[0] = 1
    reflection: jnp.ndarray        # [..., p]
    gain: jnp.ndarray              # [...]
    residual_energy: jnp.ndarray   # [...]
    order: int


def lpc_analyze(signal: jnp.ndarray, sample_rate: int, order: int = 0) -> LPCResult:
    """LPCAnalyzer.Analyze (lpc.go:44-80)."""
    p = order or lpc_order_for(sample_rate)
    r = autocorrelation_r(signal, p)
    a, k, gain, e = levinson_durbin(r, p)
    return LPCResult(a, k, gain, e, p)


def lpc_is_stable(reflection: jnp.ndarray) -> jnp.ndarray:
    """Filter stability check (lpc.go checkStability): all reflection
    coefficients strictly inside the unit circle."""
    return jnp.all(jnp.abs(reflection) < 1.0, axis=-1)


def lpc_spectral_envelope(coeffs: jnp.ndarray, nfft: int = 1024) -> jnp.ndarray:
    """LPC envelope 1/|A(e^jw)| over nfft/2+1 bins, batched.

    `coeffs` is the Levinson output: a[0]=1, a[1..p] are PREDICTOR-sign
    coefficients (x_hat[n] = sum a_i x[n-i]), matching lpc.go's storage.
    The whitening filter is therefore A(z) = 1 - sum_{i>=1} a_i z^-i.

    NOTE deviation from lpc.go:233-265: the reference evaluates
    |1 + sum a_i e^{-jiw}| with predictor-sign a — the wrong polynomial,
    whose magnitude DIPS at resonances. We evaluate the correct A(z), so
    the envelope peaks at formants (format.go's peak-picking presumes
    this).
    """
    p1 = coeffs.shape[-1]
    # flip predictor sign into error-filter form: [1, -a1, ..., -ap]
    afilt = jnp.concatenate(
        [coeffs[..., :1], -coeffs[..., 1:]], axis=-1
    )
    k = jnp.arange(nfft // 2 + 1, dtype=jnp.float32)
    i = jnp.arange(p1, dtype=jnp.float32)
    omega = 2.0 * jnp.pi * k / nfft
    angles = -i[:, None] * omega[None, :]            # [p+1, F]
    re = jnp.sum(afilt[..., :, None] * jnp.cos(angles), axis=-2)
    im = jnp.sum(afilt[..., :, None] * jnp.sin(angles), axis=-2)
    mag = jnp.sqrt(re * re + im * im)
    return jnp.where(mag > 0, 1.0 / jnp.maximum(mag, _EPS), 0.0)


def lpc_residual(signal: jnp.ndarray, coeffs: jnp.ndarray) -> jnp.ndarray:
    """Prediction error e[n] = x[n] - sum_{i>=1} a_i x[n-i] (the
    whitening filter applied to the signal; see envelope note on the
    reference's sign convention). Unbatched coeffs [p+1]."""
    p1 = coeffs.shape[-1]
    x = signal.astype(jnp.float32)
    out = x
    for i in range(1, p1):
        shifted = jnp.pad(
            x[..., : x.shape[-1] - i], [(0, 0)] * (x.ndim - 1) + [(i, 0)]
        )
        out = out - coeffs[i] * shifted
    return out


# ---------------------------------------------------------------------
# Formants (format.go)
# ---------------------------------------------------------------------

@dataclass
class FormantResult:
    """FormantResult: fixed-size [max_formants] arrays + count."""

    frequencies: jnp.ndarray   # [..., max_formants]
    bandwidths: jnp.ndarray
    amplitudes: jnp.ndarray
    confidences: jnp.ndarray
    count: jnp.ndarray         # [...]
    vocal_tract_length: jnp.ndarray  # [...]
    quality: jnp.ndarray       # [...]


def formant_confidence(freq, amp, bw, max_amp):
    """calculateFormantConfidence (format.go:274-301): amplitude ratio
    and narrow bandwidth raise confidence."""
    amp_score = jnp.where(max_amp > 0, amp / jnp.maximum(max_amp, _EPS), 0.0)
    bw_score = jnp.clip(1.0 - bw / 1000.0, 0.0, 1.0)
    return 0.6 * amp_score + 0.4 * bw_score


@partial(jax.jit, static_argnames=("sample_rate", "window_size", "order", "max_formants", "nfft"))
def analyze_formants(
    signal: jnp.ndarray,
    sample_rate: int,
    window_size: int = 0,
    order: int = 0,
    max_formants: int = 4,
    nfft: int = 1024,
) -> FormantResult:
    """FormantAnalyzer.AnalyzeFormants (format.go:85-122), fixed-shape.

    signal is [N] (unbatched; vmap for batches); uses the first
    window_size samples, as the reference analyzes one window. Window
    defaults: 1024, or 2048 for sr > 22050 (format.go:49-51).
    """
    if window_size == 0:
        window_size = 2048 if sample_rate > 22050 else 1024
    p = order or lpc_order_for(sample_rate)
    x = signal[:window_size].astype(jnp.float32)
    # pre-emphasis 0.97 + symmetric Hamming (format.go:124-140)
    x = pre_emphasis(x, 0.97)
    w = jnp.asarray(
        make_window(WindowType.HAMMING, window_size, normalize=False, symmetric=True)
    )
    x = x * w

    lpc = lpc_analyze(x, sample_rate, p)
    env = lpc_spectral_envelope(lpc.coefficients, nfft)  # [F]
    n_bins = env.shape[-1]
    freq_res = sample_rate / float(nfft)

    # local maxima above 10% of max (format.go:197-230)
    maxv = jnp.max(env)
    inner = (
        (env[1:-1] > env[:-2])
        & (env[1:-1] > env[2:])
        & (env[1:-1] / jnp.maximum(maxv, _EPS) > 0.1)
    )
    peak_mask = jnp.pad(inner, (1, 1))
    freqs = jnp.arange(n_bins, dtype=jnp.float32) * freq_res
    peak_mask = peak_mask & (freqs >= 50.0) & (freqs <= sample_rate / 2.0)

    # candidates: strongest K peaks (K = 3x formant budget)
    k = max_formants * 3
    score = jnp.where(peak_mask, env, -jnp.inf)
    cand_amp, cand_idx = jax.lax.top_k(score, k)
    cand_freq = cand_idx.astype(jnp.float32) * freq_res
    valid = jnp.isfinite(cand_amp)

    # half-height bandwidth: nearest bins left/right where env <= amp/2
    # (format.go:232-271)
    bins = jnp.arange(n_bins, dtype=jnp.float32)

    def bw_for(idx_c, amp_c):
        le = env <= amp_c / 2.0
        dist = bins - idx_c.astype(jnp.float32)
        left = jnp.max(jnp.where(le & (dist < 0), dist, -jnp.inf))
        right = jnp.min(jnp.where(le & (dist > 0), dist, jnp.inf))
        left = jnp.where(jnp.isfinite(left), -left, idx_c.astype(jnp.float32))
        right = jnp.where(
            jnp.isfinite(right), right, (n_bins - 1) - idx_c.astype(jnp.float32)
        )
        return (left + right) * freq_res

    bw = jax.vmap(bw_for)(cand_idx, cand_amp)
    conf = formant_confidence(cand_freq, cand_amp, bw, maxv)

    # validation (format.go:303-329)
    valid = valid & (cand_freq >= 50.0) & (conf >= 0.2) & (bw > 0) & (bw <= 1000.0)

    # sort by frequency, invalid last
    order_idx = jnp.argsort(jnp.where(valid, cand_freq, jnp.inf))
    cand_freq = cand_freq[order_idx]
    cand_amp = cand_amp[order_idx]
    bw = bw[order_idx]
    conf = conf[order_idx]
    valid = valid[order_idx]

    # 200 Hz minimum spacing (format.go:332-357)
    def spacing_scan(last_f, inp):
        f, v = inp
        ok = v & (f - last_f >= 200.0)
        return jnp.where(ok, f, last_f), ok

    _, keep = jax.lax.scan(spacing_scan, jnp.float32(-1e9), (cand_freq, valid))

    # compact the kept candidates into the first `count` slots
    rank = jnp.cumsum(keep.astype(jnp.int32)) - 1
    slot = jnp.where(keep & (rank < max_formants), rank, max_formants)

    def scatter(vals):
        buf = jnp.zeros(max_formants + 1, jnp.float32)
        return buf.at[slot].set(vals)[:max_formants]

    out_f = scatter(cand_freq)
    out_b = scatter(bw)
    out_a = scatter(cand_amp)
    out_c = scatter(conf)
    count = jnp.minimum(jnp.sum(keep), max_formants)

    # VTL (format.go:359-391)
    n = jnp.arange(1, max_formants + 1, dtype=jnp.float32)
    present = jnp.arange(max_formants) < count
    vtl_each = (2 * n - 1) * 35000.0 / (4.0 * jnp.maximum(out_f, _EPS))
    use = present & (out_f > 0) & (out_c > 0.3) & (vtl_each >= 10.0) & (vtl_each <= 25.0)
    n_use = jnp.sum(use)
    vtl = jnp.where(
        n_use > 0, jnp.sum(jnp.where(use, vtl_each, 0.0)) / jnp.maximum(n_use, 1), 17.5
    )
    quality = jnp.minimum(count.astype(jnp.float32) / 3.0, 1.0)
    return FormantResult(out_f, out_b, out_a, out_c, count, vtl, quality)


# ---------------------------------------------------------------------
# Voice quality (voice_quality.go)
# ---------------------------------------------------------------------

@dataclass
class VoiceQualityResult:
    """VoiceQualityResult fields used by the extractors + facade."""

    jitter: jnp.ndarray
    shimmer: jnp.ndarray
    hnr: jnp.ndarray
    f0_stability: jnp.ndarray
    amplitude_stability: jnp.ndarray
    voicing_strength: jnp.ndarray
    noise_measure: jnp.ndarray
    overall_quality: jnp.ndarray
    num_periods: jnp.ndarray
    mean_f0: jnp.ndarray
    f0_range: jnp.ndarray


def analyze_voice_quality(
    signal: jnp.ndarray,
    sample_rate: int,
    min_f0: float = 50.0,
    max_f0: float = 500.0,
) -> VoiceQualityResult:
    """AnalyzeVoiceQuality (voice_quality.go:56-112), fixed-shape.

    Deviation: the reference extracts strictly consecutive pitch periods
    (sequential lastPeriodEnd bookkeeping); we use per-voiced-frame
    period estimates (frame 1024 / hop 256, same as the reference's
    framing) with masked statistics — same jitter/shimmer definitions
    over a slightly different period sampling.
    """
    from sonido_sonar_tpu.ops.framing import num_frames
    from sonido_sonar_tpu.ops.pallas_yin import (
        pallas_yin_available,
        yin_pitch_pallas,
    )
    from sonido_sonar_tpu.ops.pitch import yin_pitch_from_signal

    frame_size, hop = 1024, 256
    params = PitchParams(sample_rate=sample_rate, window_size=frame_size,
                         min_freq=min_f0, max_freq=max_f0)
    if pallas_yin_available(frame_size, hop) and signal.ndim in (1, 2):
        # fused kernel also emits the per-frame period RMS amplitude —
        # no full-signal cumsum/gather pass
        pitch, conf, voicing, amp = yin_pitch_pallas(
            signal, frame_size, hop, sample_rate,
            params.min_freq, params.max_freq, params.yin_threshold,
            with_period_amp=True,
        )
    else:
        pitch, conf, voicing = yin_pitch_from_signal(
            signal, frame_size, hop, params
        )
        # period RMS amplitude ~ RMS over the first `period` samples of
        # each frame, via a GLOBAL cumsum of squares (two gathers per
        # frame — the [.., T, W] frames tensor is never materialized)
        period_len_all = jnp.where(
            pitch > 0, sample_rate / jnp.maximum(pitch, _EPS), 0.0
        )
        x32 = signal.astype(jnp.float32)
        t_frames = num_frames(x32.shape[-1], frame_size, hop)
        csum0 = jnp.concatenate(
            [jnp.zeros_like(x32[..., :1]), jnp.cumsum(x32 * x32, axis=-1)],
            axis=-1,
        )
        starts = jnp.arange(t_frames, dtype=jnp.int32) * hop
        plen_idx = jnp.clip(
            period_len_all.astype(jnp.int32), 1, frame_size - 1
        )
        psum = jnp.take_along_axis(
            csum0, starts + plen_idx, axis=-1
        ) - jnp.take_along_axis(
            csum0, jnp.broadcast_to(starts, plen_idx.shape), axis=-1
        )
        amp = jnp.sqrt(psum / jnp.maximum(plen_idx.astype(jnp.float32), 1.0))
    voiced = (voicing > 0.5) & (conf > 0.5) & (pitch >= min_f0) & (pitch <= max_f0)
    period_len = jnp.where(voiced, sample_rate / jnp.maximum(pitch, _EPS), 0.0)

    num_periods = jnp.sum(voiced, axis=-1)

    def masked_consecutive_reldiff(vals, mask):
        """mean |v[i]-v[prev voiced]| / mean v * 100 over voiced entries.

        Consecutive voiced frames only (pairs where both i-1 and i are
        voiced), matching consecutive-period differences.
        """
        pair = mask[..., 1:] & mask[..., :-1]
        diff = jnp.abs(vals[..., 1:] - vals[..., :-1])
        n_pairs = jnp.sum(pair, axis=-1)
        mean_diff = jnp.sum(jnp.where(pair, diff, 0.0), axis=-1) / jnp.maximum(n_pairs, 1)
        n_vals = jnp.sum(mask, axis=-1)
        mean_val = jnp.sum(jnp.where(mask, vals, 0.0), axis=-1) / jnp.maximum(n_vals, 1)
        out = jnp.where(
            (n_pairs > 0) & (mean_val > _EPS), mean_diff / jnp.maximum(mean_val, _EPS) * 100.0, 0.0
        )
        return out

    jitter = masked_consecutive_reldiff(period_len, voiced)
    shimmer = masked_consecutive_reldiff(amp, voiced)

    # F0 statistics over voiced frames
    nv = jnp.maximum(num_periods, 1)
    mean_f0 = jnp.sum(jnp.where(voiced, pitch, 0.0), axis=-1) / nv
    var_f0 = jnp.sum(jnp.where(voiced, (pitch - mean_f0[..., None]) ** 2, 0.0), axis=-1) / nv
    cv = jnp.sqrt(var_f0) / jnp.maximum(mean_f0, _EPS)
    f0_stability = jnp.where(num_periods >= 2, jnp.maximum(0.0, 1.0 - cv), 0.0)
    f0_min = jnp.min(jnp.where(voiced, pitch, jnp.inf), axis=-1)
    f0_max = jnp.max(jnp.where(voiced, pitch, -jnp.inf), axis=-1)
    f0_range = jnp.where(num_periods > 0, f0_max - f0_min, 0.0)

    # amplitude stability = max(0, 1 - cv of amplitudes)
    mean_a = jnp.sum(jnp.where(voiced, amp, 0.0), axis=-1) / nv
    var_a = jnp.sum(jnp.where(voiced, (amp - mean_a[..., None]) ** 2, 0.0), axis=-1) / nv
    cv_a = jnp.sqrt(var_a) / jnp.maximum(mean_a, _EPS)
    amp_stability = jnp.where(num_periods >= 2, jnp.maximum(0.0, 1.0 - cv_a), 0.0)

    # HNR from normalized autocorrelation at the mean-F0 period
    hnr = hnr_acf(signal, sample_rate, mean_f0)

    # voicing strength: whole-signal pitch detection (first 1024-multiple)
    voicing_strength = jnp.mean(jnp.where(voiced, voicing, 0.0), axis=-1) * 0 + (
        jnp.sum(jnp.where(voiced, voicing, 0.0), axis=-1) / nv
    )

    # noise measure (voice_quality.go:374-399): diff-energy / energy of
    # the first 1024 samples
    fr = signal[..., :1024].astype(jnp.float32)
    d = fr[..., 1:] - fr[..., :-1]
    high = jnp.sum(d * d, axis=-1)
    tot = jnp.sum(fr[..., 1:] * fr[..., 1:], axis=-1)
    noise = jnp.where(tot > 0, high / jnp.maximum(tot, _EPS), 0.0)

    # overall quality (voice_quality.go:429-438)
    jitter_score = jnp.maximum(0.0, 1.0 - jitter / 5.0)
    shimmer_score = jnp.maximum(0.0, 1.0 - shimmer / 10.0)
    hnr_score = jnp.clip(hnr / 20.0, 0.0, 1.0)
    overall = (jitter_score + shimmer_score + hnr_score + f0_stability) / 4.0

    return VoiceQualityResult(
        jitter=jitter,
        shimmer=shimmer,
        hnr=hnr,
        f0_stability=f0_stability,
        amplitude_stability=amp_stability,
        voicing_strength=voicing_strength,
        noise_measure=noise,
        overall_quality=overall,
        num_periods=num_periods,
        mean_f0=mean_f0,
        f0_range=f0_range,
    )


def hnr_acf(signal: jnp.ndarray, sample_rate: int, f0: jnp.ndarray) -> jnp.ndarray:
    """HNR = 10 log10(r_T / (1 - r_T)) at the period lag of f0
    (harmonic_ratio.go ACF method; voice_quality.go:232-295 uses the
    same construction).

    Only ONE autocorrelation lag per row is consumed. Two shapes arrive
    in practice and need different strategies:
    - FEW LONG rows (voice quality: [B, 1.3M]): per-row dynamic-slice
      dot, statically unrolled over the batch. vmap here lowers to a
      sequential while loop (~12 ms of a 27 ms program at B=32); a
      take_along_axis gather is 60x worse (elementwise TPU gather,
      760 ms measured). Unrolled, the rows are independent slice+dot
      DAGs XLA overlaps freely.
    - MANY SHORT rows (per-frame music HNR: [B, T, 256] = 165k rows):
      unrolling would emit one op PER ROW (a 20+ minute XLA compile,
      measured) and the while loop serializes 165k iterations. Instead
      compute ALL lags at once as zero-padded DFT matmuls on the MXU
      (power spectrum -> cosine inverse = exact linear autocorrelation)
      and select the wanted lag with a one-hot reduction — ~100 MFLOP
      per 1k rows, no gathers, no per-row program growth.
    """
    x = signal.astype(jnp.float32)
    x = x - jnp.mean(x, axis=-1, keepdims=True)
    n = x.shape[-1]
    lag = jnp.clip(
        (sample_rate / jnp.maximum(jnp.asarray(f0, jnp.float32), 1.0)).astype(
            jnp.int32
        ),
        1,
        n - 1,
    )
    lag = jnp.broadcast_to(lag, x.shape[:-1])
    r0 = jnp.maximum(jnp.sum(x * x, axis=-1), _EPS)

    # DFT path only for SHORT rows: its bases are [2n, 2(n+1)] — fine at
    # frame scale, catastrophic for 1.3M-sample signals (those always
    # take the unrolled slice-dot path; their row counts stay small)
    if x.ndim >= 2 and n <= 4096:
        fwd, inv = _acf_dft_bases(n)
        xp2 = jnp.concatenate([x, jnp.zeros_like(x)], axis=-1)
        fr = jnp.matmul(
            xp2, jnp.asarray(fwd), precision=jax.lax.Precision.HIGH,
            preferred_element_type=jnp.float32,
        )
        f_bins = n + 1
        p = fr[..., :f_bins] ** 2 + fr[..., f_bins:] ** 2
        r_all = jnp.matmul(
            p, jnp.asarray(inv), precision=jax.lax.Precision.HIGH,
            preferred_element_type=jnp.float32,
        )                                                  # [..., n]
        onehot = jax.nn.one_hot(lag, n, dtype=jnp.float32)
        r_lag = jnp.sum(r_all * onehot, axis=-1)
    else:
        padded = jnp.concatenate([x, jnp.zeros_like(x)], axis=-1)

        def one(row_pad, row, l):
            shifted = jax.lax.dynamic_slice_in_dim(row_pad, l, n, axis=-1)
            return jnp.dot(row, shifted, preferred_element_type=jnp.float32)

        if x.ndim == 1:
            r_lag = one(padded, x, lag)
        else:
            flat_x = x.reshape(-1, n)
            flat_p = padded.reshape(-1, 2 * n)
            flat_l = lag.reshape(-1)
            r_lag = jnp.stack(
                [one(flat_p[b], flat_x[b], flat_l[b])
                 for b in range(flat_x.shape[0])]
            ).reshape(x.shape[:-1])
    r_t = jnp.clip(r_lag / r0, _EPS, 1.0 - 1e-6)
    return 10.0 * jnp.log10(r_t / (1.0 - r_t))


@lru_cache(maxsize=8)
def _acf_dft_bases(n: int):
    """float64-designed rDFT bases for exact linear autocorrelation of
    an n-sample row via 2n-point zero-padded transform:
    R[l] = (1/2n) * sum_k w_k |X_k|^2 cos(2 pi k l / 2n), w = rfft
    symmetry weights. Returns (forward [2n, 2(n+1)] re|im, inverse
    [n+1, n]) as float32."""
    m = 2 * n
    f_bins = n + 1
    i = np.arange(m, dtype=np.float64)[:, None]
    k = np.arange(f_bins, dtype=np.float64)[None, :]
    ang = -2.0 * np.pi * i * k / m
    fwd = np.concatenate([np.cos(ang), np.sin(ang)], axis=1)
    ll = np.arange(n, dtype=np.float64)[None, :]
    kk = np.arange(f_bins, dtype=np.float64)[:, None]
    w = np.ones((f_bins, 1))
    w[1:-1] = 2.0
    inv = (w * np.cos(2.0 * np.pi * kk * ll / m)) / m
    return fwd.astype(np.float32), inv.astype(np.float32)


# ---------------------------------------------------------------------
# Speech analyzer facade (speech_analysis.go)
# ---------------------------------------------------------------------

def detect_speech(signal: jnp.ndarray, sample_rate: int) -> jnp.ndarray:
    """detectSpeech heuristics (speech_analysis.go:105-207): ZCR in
    (0.01, 0.3), RMS energy > 0.001, normalized autocorrelation
    periodicity > 0.1 in lags [20, 400). Returns bool [...]."""
    x = signal.astype(jnp.float32)
    n = x.shape[-1]
    if n < sample_rate // 4:
        return jnp.zeros(x.shape[:-1], bool)

    nonneg = x >= 0
    zcr = jnp.mean(
        (nonneg[..., 1:] != nonneg[..., :-1]).astype(jnp.float32), axis=-1
    )
    energy = jnp.sqrt(jnp.mean(x * x, axis=-1))

    frame = x[..., :1024]
    max_lag = min(400, 1024 // 2)
    size = 2048
    f = jnp.fft.rfft(frame, n=size, axis=-1)
    ac = jnp.fft.irfft(f * jnp.conj(f), n=size, axis=-1)[..., :max_lag]
    counts = 1024.0 - jnp.arange(max_lag, dtype=jnp.float32)
    ac_norm = ac / counts
    lag_ok = jnp.arange(max_lag) >= 20
    max_corr = jnp.max(jnp.where(lag_ok, ac_norm, -jnp.inf), axis=-1)
    fr_energy = jnp.mean(frame * frame, axis=-1)
    periodicity = jnp.where(fr_energy > 0, max_corr / jnp.maximum(fr_energy, _EPS), 0.0)

    return (zcr > 0.01) & (zcr < 0.3) & (energy > 0.001) & (periodicity > 0.1)


@dataclass
class SpeechAnalysisResult:
    """SpeechAnalysisResult (speech_analysis.go:11-49)."""

    is_speech: jnp.ndarray
    formants: Optional[FormantResult]
    voice_quality: Optional[VoiceQualityResult]
    quality_score: jnp.ndarray
    intelligibility: jnp.ndarray


def analyze_speech(signal: jnp.ndarray, sample_rate: int) -> SpeechAnalysisResult:
    """AnalyzeSpeech facade (speech_analysis.go:50-98).

    Batch-clean over leading axes: detect_speech / analyze_voice_quality
    are batched ops (the voice-quality pitch track routes through the
    fused Pallas YIN kernel on TPU); only the single-window formant
    analysis is vmapped."""
    is_speech = detect_speech(signal, sample_rate)
    if signal.ndim == 1:
        formants = analyze_formants(signal, sample_rate)
    else:
        flat = signal.reshape(-1, signal.shape[-1])
        formants = jax.vmap(lambda s: analyze_formants(s, sample_rate))(flat)
        formants = jax.tree_util.tree_map(
            lambda a: a.reshape(signal.shape[:-1] + a.shape[1:]), formants
        )
    vq = analyze_voice_quality(signal, sample_rate)

    # intelligibility (speech_analysis.go:228-268, simplified scoring
    # with the reference's bonuses)
    intel = jnp.asarray(0.5, jnp.float32)
    f1 = formants.frequencies[..., 0]
    f2 = formants.frequencies[..., 1]
    sep_bonus = jnp.where((formants.count >= 2) & (f2 - f1 > 500.0), 0.2, 0.0)
    intel = intel + sep_bonus
    intel = (intel + formants.quality) / 2.0
    intel = intel + jnp.where(vq.hnr > 10.0, 0.1, 0.0)
    intel = intel + jnp.where((vq.jitter < 2.0) & (vq.shimmer < 5.0), 0.1, 0.0)
    intel = jnp.minimum(1.0, intel)

    quality = vq.overall_quality
    return SpeechAnalysisResult(
        is_speech=is_speech,
        formants=formants,
        voice_quality=vq,
        quality_score=quality,
        intelligibility=intel,
    )


def estimate_gender(formants: FormantResult) -> Tuple[str, float]:
    """EstimateGender (speech_analysis.go:272-296). Host-side helper."""
    if int(formants.count) < 2:
        return "unknown", 0.0
    f1 = float(formants.frequencies[0])
    f2 = float(formants.frequencies[1])
    if f1 < 450 and f2 < 2200:
        return "male", 0.7
    if f1 > 500 and f2 > 2400:
        return "female", 0.7
    return "unknown", 0.3


def estimate_age(vq: VoiceQualityResult) -> Tuple[str, float]:
    """EstimateAge (speech_analysis.go:299-314). Host-side helper."""
    if float(vq.jitter) > 3.0 or float(vq.shimmer) > 8.0:
        return "elderly", 0.4
    if float(vq.mean_f0) > 200 and float(vq.f0_range) > 100:
        return "young", 0.4
    return "adult", 0.3


_register_pytree(LPCResult, static_fields=("order",))
_register_pytree(FormantResult)
_register_pytree(VoiceQualityResult)
_register_pytree(SpeechAnalysisResult)
