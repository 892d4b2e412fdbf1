"""Hybrid alignment analyzer: cross-correlation + DTW with confidence
and quality scoring.

Reference parity: algorithms/stats/alignment.go —
  methods DTW / CrossCorrelation / PhaseCorrelation(enum only) / Hybrid
  (:9-17); xcorr path flattens 2-D features to their first component
  (:363-378) and uses normalized cross-correlation over the overlap
  region; hybrid = xcorr first, accept if confidence > 0.7, else DTW,
  else blend 0.6/0.4 confidence and 0.7/0.3 similarity (:308-337);
  hand-tuned confidence/quality constants ported verbatim (:183-305);
  path stability/smoothness/cost-consistency/diagonal-bias (:420-601);
  consistency via deterministic sin-noise trials (:710-749).

Offset-unit/sign note (SURVEY.md quirk #5): the reference divides the
DTW *frame* offset by sampleRate but multiplies the xcorr frame lag by
hopSize first — inconsistent units — and its xcorr lag sign (peak at -D
when the reference stream is delayed by D) is inverted relative to its
own TruncateToAlignmentPCM branches. Here BOTH paths report `offset` in
samples with one convention: POSITIVE offset = reference stream delayed
by that amount (the CDN latency). xcorr: offset = -peak_lag * hop.
DTW: offset = mean(ref_idx - query_idx) * hop (positive when reference
is delayed). TruncateToAlignmentPCM's branch logic is then correct as
written in the reference.

TPU notes: feature series are short (T = seconds * sr / hop), so the
whole analyzer jits per-method; the hybrid's accept-or-refine decision
is a host-side scalar branch, mirroring the reference control flow.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from sonido_sonar_tpu.ops.stats.correlation import CorrelationResult, z_normalize
from sonido_sonar_tpu.ops.stats.correlation import _peak_metrics  # shared metrics
from sonido_sonar_tpu.ops.stats.dtw import DTWResult, dtw_align

_EPS = 1e-10

# Comb-ambiguity penalty constants (NOTE deviation): beat-periodic
# content produces an energy-correlation comb whose secondary peaks sit
# one beat period away from the main peak at 0.9-0.98 of its height;
# the reference's second-peak penalty (alignment.go:222-228) measures
# the ADJACENT bin (always ~1.0 of the peak by continuity) so it cannot
# see this. We measure the strongest peak more than `min_sep` bins away
# and subtract up to _AMBIGUITY_CAP from the correlation confidence —
# enough to push a comb-ambiguous answer below every per-content accept
# threshold (0.4-0.7, config/config.py alignment_config_for_content;
# tests/test_eval_gates.py derives its gate from that table) unless
# PCM-level verification
# (extractors/alignment.py verify_candidate_offsets) confirms the peak.
# Empirically (eval_accuracy.py --full): beat-comb cases score
# ambiguity 0.91-0.98, unambiguous tone/speech score <= 0.41.
_AMBIGUITY_ONSET = 0.75
_AMBIGUITY_SLOPE = 1.6
_AMBIGUITY_CAP = 0.4

# PCM-verification policy (shared by the per-pair extractor and the
# batched aligner): K candidates to GCC-PHAT-verify when the comb is
# ambiguous, and the decisiveness gate — the winning whitened peak must
# clear an absolute floor and beat every differently-refining candidate
# by _VERIFY_MARGIN (measured 9-54x true-vs-false on beat-comb material,
# so 1.5 is conservative). A decisive verification lifts the ambiguity
# penalty; an indecisive one keeps it, so downstream accept thresholds
# reject the measurement instead of publishing a coin flip.
_VERIFY_TOP_K = 5
_VERIFY_FLOOR = 0.02
_VERIFY_MARGIN = 1.5

# Second verification trigger: NCC over a tiny overlap is spuriously
# high (a few frames of noise correlate near 1.0; neither the reference
# nor this port penalizes overlap in the NCC itself —
# correlation.go:421-449). When the winning lag uses less than this
# fraction of the shorter series, the pick is PCM-verified against the
# best HIGH-overlap peak, which otherwise may not survive the top-K
# |corr| cut at all (extreme-lag spurious peaks can occupy every slot).
_VERIFY_OVERLAP = 0.5

# A decisively-verified offset reports confidence >= min(cap, peak):
# the whitened PHAT peak is the fraction of the band coherently
# supporting the offset — direct PCM evidence, stronger than any
# energy-series statistic (which on stationary content is garbage even
# when the PCM evidence is near-perfect: measured peak 0.99 with
# correlation confidence 0.46). Capped below 1 so a verified answer is
# never MORE confident than a clean unambiguous correlation.
_VERIFY_CONF_CAP = 0.9


def comb_ambiguity(correlations, peak_index: int, min_sep: int) -> float:
    """Ratio of the strongest well-separated secondary peak (> min_sep
    bins from the main peak) to the main peak, in [0, 1]. ~1.0 means the
    lag estimate is comb-ambiguous (periodic content); < ~0.5 means the
    peak is unique."""
    c = np.abs(np.asarray(correlations, dtype=np.float64))
    if c.ndim != 1 or c.size == 0:
        return 0.0
    pk = int(peak_index)
    mask = np.abs(np.arange(c.size) - pk) > min_sep
    if not mask.any():
        return 0.0
    peak = float(c[pk])
    if peak <= _EPS:
        return 0.0
    return min(float(c[mask].max()) / peak, 1.0)


def ambiguity_penalty(ambiguity: float) -> float:
    """Confidence penalty for a comb-ambiguous correlation peak."""
    return min(_AMBIGUITY_CAP, _AMBIGUITY_SLOPE * max(0.0, ambiguity - _AMBIGUITY_ONSET))


@dataclass
class AlignmentResult:
    """AlignmentResult (alignment.go:33-58)."""

    method: str
    offset: int                 # samples (negative = query delayed)
    offset_seconds: float
    confidence: float
    similarity: float
    alignment_quality: float
    noise_level: float = 0.0
    stability: float = 0.0
    query_length: int = 0
    reference_length: int = 0
    sample_rate: int = 0
    processing_time: float = 0.0
    dtw_result: Optional[DTWResult] = None
    cross_corr_result: Optional[CorrelationResult] = None
    ambiguity: float = 0.0      # comb-ambiguity of the correlation peak


class AlignmentAnalyzer:
    """AlignmentAnalyzer (alignment.go:22-84)."""

    def __init__(
        self,
        method: str = "hybrid",
        max_lag: int = 0,
        sample_rate: int = 44100,
        hop_size: int = 512,
        window_size: int = 2048,
        confidence_threshold: float = 0.6,
        dtw_band: int = -1,
    ):
        self.method = method
        self.max_lag = max_lag
        self.sample_rate = sample_rate
        self.hop_size = hop_size
        self.window_size = window_size
        self.confidence_threshold = confidence_threshold
        self.dtw_band = dtw_band

    # -- public API ------------------------------------------------------
    def align_features(
        self, query: jnp.ndarray, reference: jnp.ndarray, sample_rate: int = 0
    ) -> AlignmentResult:
        """AlignFeatures (alignment.go:84-106). query/reference: [T, D]
        or [T] feature series."""
        sr = sample_rate or self.sample_rate
        if query.ndim == 1:
            query = query[:, None]
        if reference.ndim == 1:
            reference = reference[:, None]
        if self.method == "dtw":
            return self._align_dtw(query, reference, sr)
        if self.method in ("correlation", "cross_correlation"):
            return self._align_xcorr(query, reference, sr)
        if self.method == "hybrid":
            return self._align_hybrid(query, reference, sr)
        raise ValueError(f"unsupported alignment method {self.method}")

    def align_audio(
        self, query_pcm: jnp.ndarray, reference_pcm: jnp.ndarray, sample_rate: int = 0
    ) -> AlignmentResult:
        """AlignAudio (alignment.go:109-130): short-time RMS energy series
        then feature alignment."""
        from sonido_sonar_tpu.ops.temporal import short_time_energy

        sr = sample_rate or self.sample_rate
        q = short_time_energy(query_pcm, self.window_size, self.hop_size)
        r = short_time_energy(reference_pcm, self.window_size, self.hop_size)
        return self.align_features(q[:, None], r[:, None], sr)

    def find_best_alignment(
        self, query: jnp.ndarray, reference: jnp.ndarray, sample_rate: int = 0
    ) -> AlignmentResult:
        """FindBestAlignment (alignment.go:673-700): try xcorr and DTW,
        keep max(0.6*confidence + 0.4*similarity)."""
        best, best_score = None, -1.0
        for m in ("correlation", "dtw"):
            prev = self.method
            self.method = m
            try:
                res = self.align_features(query, reference, sample_rate)
            finally:
                self.method = prev
            score = 0.6 * res.confidence + 0.4 * res.similarity
            if score > best_score:
                best, best_score = res, score
        if best is None:
            raise RuntimeError("all alignment methods failed")
        return best

    # -- cross-correlation path -------------------------------------------
    def _align_xcorr(
        self, query: jnp.ndarray, reference: jnp.ndarray, sr: int
    ) -> AlignmentResult:
        """alignWithCrossCorrelation (alignment.go:151-181)."""
        qv = query[:, 0]  # flatten2DFeatures: first component (:363-378)
        rv = reference[:, 0]
        n1, n2 = qv.shape[-1], rv.shape[-1]
        max_lag = self.max_lag if self.max_lag > 0 else max(n1, n2) - 1
        max_lag = max(min(max_lag, n1 - 1, n2 - 1), 0)
        corr = ncc_overlap(qv, rv, max_lag)

        peak_corr = float(corr.peak_correlation)
        peak_lag = int(corr.peak_lag)
        similarity = min(1.0, max(0.0, abs(peak_corr)))
        confidence = correlation_confidence(corr)
        quality = correlation_quality(corr, self.max_lag)
        # NOTE deviation: comb-ambiguity penalty (see constants above).
        # The verbatim confidence formula scores a beat-comb peak 0.7+
        # while the answer is a coin flip between beat multiples; the
        # penalty keeps such answers below the accept thresholds until
        # PCM verification confirms the peak.
        min_sep = max(int(0.1 * sr / max(self.hop_size, 1)), 2)
        amb = comb_ambiguity(corr.correlations, int(corr.peak_index), min_sep)
        confidence = max(0.0, confidence - ambiguity_penalty(amb))
        # positive = reference delayed (see module docstring sign note).
        # Sub-frame refinement: parabolic interpolation of the peak's
        # neighbors gives lag accuracy well below one hop (the reference
        # is frame-quantized).
        lag_refined = float(peak_lag)
        idx = int(corr.peak_index)
        c = corr.correlations
        if 0 < idx < c.shape[-1] - 1:
            y0, y1, y2 = float(c[idx - 1]), float(c[idx]), float(c[idx + 1])
            denom = y0 - 2.0 * y1 + y2
            if abs(denom) > 1e-12:
                shift = 0.5 * (y0 - y2) / denom
                if abs(shift) <= 1.0:
                    lag_refined = peak_lag + shift
        offset = int(round(-lag_refined * self.hop_size))
        return AlignmentResult(
            method="correlation",
            offset=offset,
            offset_seconds=offset / float(sr),
            confidence=confidence,
            similarity=similarity,
            alignment_quality=quality,
            noise_level=1.0 - float(corr.snr) / 20.0,
            query_length=n1,
            reference_length=n2,
            sample_rate=sr,
            cross_corr_result=corr,
            ambiguity=amb,
        )

    # -- DTW path -----------------------------------------------------------
    def _align_dtw(
        self, query: jnp.ndarray, reference: jnp.ndarray, sr: int
    ) -> AlignmentResult:
        """alignWithDTW (alignment.go:133-149). Offset = mean path
        displacement in frames, converted to samples via hop_size (see
        offset-unit note in the module docstring).

        Long banded alignments route to the O(T*band) banded fill so the
        dense cost matrix (O(T^2)) never materializes.

        NOTE deviation: the band is widened to cover the configured max
        lag. The reference uses DTWBandRadius (default 50) regardless of
        MaxLagSeconds, so its DTW path physically cannot express offsets
        beyond 50 frames and the hybrid silently returns a near-zero
        offset for large lags."""
        n, m = int(query.shape[0]), int(reference.shape[0])
        band = self.dtw_band
        if band > 0 and self.max_lag > 0:
            band = max(band, self.max_lag)
        use_banded = (
            band > 0 and n * m > 4_000_000 and abs(n - m) <= band
        )
        if use_banded:
            from sonido_sonar_tpu.ops.stats.dtw import dtw_align_banded

            dtw = dtw_align_banded(query, reference, band)
        else:
            dtw = dtw_align(query, reference, constraint_band=band)
        L = int(dtw.path_length)
        qi = np.asarray(dtw.path_qidx)[:L]
        ri = np.asarray(dtw.path_ridx)[:L]
        costs = np.asarray(dtw.path_cost)[:L]

        # NOTE deviation: the reference averages (ri - qi) over the WHOLE
        # path (alignment.go:530-541). For a shift of D frames the path's
        # first/last ~D points are pinned to the matrix edges with
        # displacements sweeping 0..D, biasing the mean low by ~D/T. The
        # median over interior points (both indices off the borders) is
        # the unbiased estimate.
        interior = (
            (qi > 0) & (ri > 0) & (qi < dtw.query_length - 1) & (ri < dtw.ref_length - 1)
        )
        disp = ri - qi
        if interior.any():
            offset_frames = int(np.median(disp[interior]))
        else:
            offset_frames = int(np.sum(disp)) // max(L, 1)
        offset = offset_frames * self.hop_size
        similarity = dtw_similarity(dtw, qi, ri, costs)
        confidence = dtw_confidence(dtw, qi, ri, costs)
        quality = dtw_quality(dtw, qi, ri, costs)
        stability = path_stability(qi, ri)
        return AlignmentResult(
            method="dtw",
            offset=offset,
            offset_seconds=offset / float(sr),
            confidence=confidence,
            similarity=similarity,
            alignment_quality=quality,
            stability=stability,
            query_length=int(query.shape[0]),
            reference_length=int(reference.shape[0]),
            sample_rate=sr,
            dtw_result=dtw,
        )

    # -- hybrid ---------------------------------------------------------------
    def _align_hybrid(
        self, query: jnp.ndarray, reference: jnp.ndarray, sr: int
    ) -> AlignmentResult:
        """alignWithHybrid (alignment.go:308-337).

        NOTE deviation: the reference takes the DTW offset
        unconditionally once it falls through the 0.7 gate; we take the
        offset from whichever path is more confident (the blended
        confidence/similarity weights are unchanged), so a sound
        correlation peak is not overridden by a degenerate DTW path.
        For the winner choice the DTW confidence is additionally scaled
        by sqrt(offset consistency) — the fraction of interior path
        displacements within 5 frames of their median. DTW cost scoring
        is blind to whether the path expresses ONE coherent shift: on a
        large offset the cheapest warp often meanders (displacement IQR
        of hundreds of frames) yet still scores 0.8+ confidence, which
        used to out-vote a correct correlation peak whose confidence had
        sagged with the shrinking overlap. Reported fields keep the
        reference's verbatim weighting."""
        corr_res = self._align_xcorr(query, reference, sr)
        # Route on the UNPENALIZED confidence: comb ambiguity means the
        # peak choice needs external (PCM) verification, which DTW over
        # the same periodic feature series cannot provide — falling
        # through to DTW would cost a banded fill and learn nothing.
        # The reported confidence keeps the penalty, so an unverified
        # ambiguous answer still fails the accept thresholds.
        corr_gate = corr_res.confidence + ambiguity_penalty(corr_res.ambiguity)
        if corr_gate > 0.7:
            return corr_res
        try:
            dtw_res = self._align_dtw(query, reference, sr)
        except Exception:
            return corr_res
        eff_dtw_conf = dtw_res.confidence * float(
            np.sqrt(_offset_consistency(dtw_res.dtw_result))
        )
        winner = dtw_res if eff_dtw_conf >= corr_res.confidence else corr_res
        return AlignmentResult(
            method="hybrid",
            offset=winner.offset,
            offset_seconds=winner.offset_seconds,
            confidence=0.6 * dtw_res.confidence + 0.4 * corr_res.confidence,
            similarity=0.7 * dtw_res.similarity + 0.3 * corr_res.similarity,
            alignment_quality=dtw_res.alignment_quality,
            noise_level=corr_res.noise_level,
            stability=dtw_res.stability,
            query_length=corr_res.query_length,
            reference_length=corr_res.reference_length,
            sample_rate=sr,
            dtw_result=dtw_res.dtw_result,
            cross_corr_result=corr_res.cross_corr_result,
            ambiguity=corr_res.ambiguity,
        )

    # -- consistency (alignment.go:710-795) ---------------------------------
    def analyze_alignment_consistency(
        self,
        query: jnp.ndarray,
        reference: jnp.ndarray,
        sample_rate: int = 0,
        num_trials: int = 5,
    ) -> dict:
        if num_trials < 2:
            num_trials = 5
        if query.ndim == 1:
            query = query[:, None]
        if reference.ndim == 1:
            reference = reference[:, None]
        q = np.asarray(query, dtype=np.float64)
        offsets = []
        for _ in range(num_trials):
            # deterministic pseudo-noise (alignment.go:752-764)
            i = np.arange(q.shape[0])[:, None]
            j = np.arange(q.shape[1])[None, :]
            noise = np.sin((i * j + i + j).astype(np.float64)) * 0.01 * q
            perturbed = jnp.asarray((q + noise).astype(np.float32))
            res = self.align_features(perturbed, reference, sample_rate)
            offsets.append(float(res.offset))
        return offset_stats(offsets)


# ---------------------------------------------------------------------
# NCC over overlap region, FFT-accelerated
# ---------------------------------------------------------------------

@partial(jax.jit, static_argnames=("max_lag", "n1", "n2"))
def _ncc_arrays(qv, rv, max_lag: int, n1: int, n2: int):
    """Per-lag NCC = sum(x1*x2) / sqrt(sum(x1^2) sum(x2^2)) over the
    overlap at each lag, after whole-signal z-normalization — exactly the
    analyzer's NormalizedCrossCorrelation+normalizeInputs configuration
    (alignment.go:62-70, correlation.go:373-410).

    Numerator via one rFFT correlation; denominators via prefix sums of
    squares over the overlap windows (exact, O(L) lookups).
    """
    x1 = z_normalize(qv.astype(jnp.float32))
    x2 = z_normalize(rv.astype(jnp.float32))
    size = 1
    while size < n1 + n2 - 1:
        size <<= 1
    f1 = jnp.fft.rfft(x1, n=size, axis=-1)
    f2 = jnp.fft.rfft(x2, n=size, axis=-1)
    corr_full = jnp.fft.irfft(f1 * jnp.conj(f2), n=size, axis=-1)
    pos = corr_full[..., : max_lag + 1]
    neg = corr_full[..., size - max_lag :] if max_lag > 0 else corr_full[..., :0]
    num = jnp.concatenate([neg, pos], axis=-1)

    # prefix sums of squares, padded with leading 0
    c1 = jnp.concatenate([jnp.zeros(1), jnp.cumsum(x1 * x1)])
    c2 = jnp.concatenate([jnp.zeros(1), jnp.cumsum(x2 * x2)])
    lags = jnp.arange(-max_lag, max_lag + 1)

    # overlap region (correlation.go:421-449): for lag >= 0 x1[0:n2-lag]
    # pairs with x2[lag:n2] (clipped by n1); for lag < 0, x1[-lag:n1]
    # pairs with x2[0:n1+lag] (clipped by n2).
    start1 = jnp.where(lags >= 0, 0, -lags)
    end1 = jnp.where(lags >= 0, jnp.minimum(n1, n2 - lags), n1)
    length = jnp.maximum(end1 - start1, 0)
    start2 = jnp.where(lags >= 0, lags, 0)
    end2 = start2 + length

    e1 = c1[jnp.clip(end1, 0, n1)] - c1[jnp.clip(start1, 0, n1)]
    e2 = c2[jnp.clip(end2, 0, n2)] - c2[jnp.clip(start2, 0, n2)]
    den = jnp.sqrt(jnp.maximum(e1 * e2, 0.0))
    ncc = jnp.where(den < _EPS, 0.0, num / jnp.maximum(den, _EPS))
    return jnp.clip(ncc, -1.0, 1.0)


def ncc_overlap(qv: jnp.ndarray, rv: jnp.ndarray, max_lag: int) -> CorrelationResult:
    n1, n2 = qv.shape[-1], rv.shape[-1]
    max_lag = max(min(max_lag, n1 - 1, n2 - 1), 0)
    corr = _ncc_arrays(qv, rv, max_lag, n1, n2)
    lags = jnp.arange(-max_lag, max_lag + 1, dtype=jnp.int32)
    metrics = _peak_metrics(corr, max_lag, n1, n2)
    return CorrelationResult(corr, lags, *metrics, max_lag=max_lag)


# ---------------------------------------------------------------------
# Confidence / quality scoring (verbatim constants)
# ---------------------------------------------------------------------

def correlation_confidence(corr: CorrelationResult) -> float:
    """calculateCorrelationConfidence (alignment.go:183-243)."""
    peak = abs(float(corr.peak_correlation))
    if peak < 0.1:
        return 0.0
    peak_score = peak + (peak - 0.6) * 0.5 if peak >= 0.6 else peak
    sharpness = float(corr.sharpness)
    sharpness_score = min(0.9, sharpness * 8.0)
    psl = float(corr.peak_to_sidelobe)
    sidelobe_score = min(0.8, psl / 15.0) if (psl > 0 and np.isfinite(psl)) else 0.0
    snr = float(corr.snr)
    snr_score = min(0.7, snr / 25.0) if snr > 0 else 0.0
    second = float(corr.second_peak)
    second_penalty = 0.0
    if second != 0 and peak > 0:
        ratio = abs(second) / peak
        if ratio > 0.7:
            second_penalty = (ratio - 0.7) * 0.25
    excellence = 0.12 if peak >= 0.75 else (0.08 if peak >= 0.6 else 0.0)
    confidence = (
        0.55 * peak_score
        + 0.22 * sharpness_score
        + 0.12 * sidelobe_score
        + 0.06 * snr_score
        + 0.05 * 0.15
        + excellence
        - second_penalty
    )
    return min(0.95, max(0.0, confidence))


def correlation_quality(corr: CorrelationResult, max_lag: int) -> float:
    """calculateCorrelationQuality (alignment.go:245-305)."""
    peak = abs(float(corr.peak_correlation))
    if peak < 0.08:
        return 0.0
    peak_q = peak + (peak - 0.6) * 0.4 if peak >= 0.6 else peak
    sharp_q = min(0.85, float(corr.sharpness) * 5.0)
    psl = float(corr.peak_to_sidelobe)
    side_q = min(0.7, psl / 20.0) if (psl > 0 and np.isfinite(psl)) else 0.0
    snr = float(corr.snr)
    snr_q = min(0.6, snr / 30.0) if snr > 0 else 0.0
    lag_penalty = 0.0
    peak_lag = int(corr.peak_lag)
    if max_lag > 0 and peak_lag < 0:
        neg_ratio = abs(peak_lag) / max_lag
        if neg_ratio > 0.90:
            lag_penalty = (neg_ratio - 0.90) * 4.0
    bonus = 0.10 if peak >= 0.7 else (0.06 if peak >= 0.55 else 0.0)
    q = (
        0.50 * peak_q + 0.25 * sharp_q + 0.15 * side_q + 0.10 * snr_q
        + bonus - lag_penalty
    )
    return min(1.0, max(0.0, q))


def _cost_consistency(costs: np.ndarray) -> float:
    """calculateCostConsistency (alignment.go:455-500)."""
    n = len(costs)
    if n <= 1:
        return 0.0
    w = max(min(5, n // 4), 2)
    smoothed = np.empty(n)
    for i in range(n):
        lo = max(0, i - w // 2)
        hi = min(n - 1, i + w // 2)
        smoothed[i] = costs[lo : hi + 1].mean()
    mean = smoothed.mean()
    if mean <= 1e-10:
        return 1.0
    cv = smoothed.std() / mean
    return 1.0 / (1.0 + cv)


def _diagonal_bias(qi: np.ndarray, ri: np.ndarray) -> float:
    """calculateDiagonalBias (alignment.go:502-529)."""
    if len(qi) <= 1:
        return 1.0
    dq = np.diff(qi)
    dr = np.diff(ri)
    ratio = float(((dq > 0) & (dr > 0)).sum()) / (len(qi) - 1)
    return 1.0 / (1.0 + np.exp(-10.0 * (ratio - 0.3)))


def _path_smoothness(qi: np.ndarray, ri: np.ndarray) -> float:
    """calculatePathSmoothness (alignment.go:570-607)."""
    if len(qi) <= 2:
        return 1.0
    dq = np.diff(qi)
    dr = np.diff(ri)
    changes = int(((dq[1:] != dq[:-1]) | (dr[1:] != dr[:-1])).sum())
    return max(0.0, 1.0 - changes / (len(qi) - 1))


def _offset_consistency(dtw: Optional[DTWResult], tol: int = 5) -> float:
    """Fraction of interior path points whose displacement (ri - qi)
    lies within `tol` frames of the median displacement — 1.0 when the
    path expresses one coherent shift, ~0 when it meanders. Used by the
    hybrid to discount confidently-wrong DTW offsets (see
    _align_hybrid's deviation note)."""
    if dtw is None:
        return 0.0
    L = int(dtw.path_length)
    if L < 3:
        return 0.0
    qi = np.asarray(dtw.path_qidx)[:L]
    ri = np.asarray(dtw.path_ridx)[:L]
    interior = (
        (qi > 0) & (ri > 0)
        & (qi < dtw.query_length - 1) & (ri < dtw.ref_length - 1)
    )
    if not interior.any():
        return 0.0
    disp = (ri - qi)[interior]
    med = np.median(disp)
    return float(np.mean(np.abs(disp - med) <= tol))


def path_stability(qi: np.ndarray, ri: np.ndarray) -> float:
    """calculatePathStability (alignment.go:625-652)."""
    if len(qi) < 3:
        return 0.0
    dq = np.diff(qi)
    dr = np.diff(ri)
    changes = int(((dq[1:] != dq[:-1]) | (dr[1:] != dr[:-1])).sum())
    return max(0.0, 1.0 - changes / (len(qi) - 1))


def dtw_similarity(dtw: DTWResult, qi, ri, costs) -> float:
    """calculateSimilarityFromDTW (alignment.go:380-411)."""
    avg_len = (dtw.query_length + dtw.ref_length) / 2.0
    if avg_len == 0:
        return 0.0
    nd = float(dtw.distance) / avg_len
    dist_sim = 1.0 / (1.0 + nd)
    quality = dtw_quality(dtw, qi, ri, costs)
    mean_cost = float(costs.mean()) if len(costs) else 0.0
    cost_sim = 1.0 / (1.0 + mean_cost)
    return min(1.0, max(0.0, 0.5 * dist_sim + 0.3 * quality + 0.2 * cost_sim))


def dtw_confidence(dtw: DTWResult, qi, ri, costs) -> float:
    """calculateDTWConfidence (alignment.go:418-453)."""
    if len(qi) == 0:
        return 0.0
    avg_len = (dtw.query_length + dtw.ref_length) / 2.0
    if avg_len == 0:
        return 0.0
    nd = float(dtw.distance) / avg_len
    c1 = np.exp(-nd * 2.0)
    expected = max(dtw.query_length, dtw.ref_length)
    eff = min(1.0, expected / len(qi))
    consistency = _cost_consistency(costs)
    diag = _diagonal_bias(qi, ri)
    return float(
        min(1.0, max(0.0, 0.4 * c1 + 0.25 * eff + 0.2 * consistency + 0.15 * diag))
    )


def dtw_quality(dtw: DTWResult, qi, ri, costs) -> float:
    """calculateDTWQuality (alignment.go:544-568)."""
    if len(qi) == 0:
        return 0.0
    expected = max(dtw.query_length, dtw.ref_length)
    eff = min(1.0, expected / len(qi))
    diag = _diagonal_bias(qi, ri)
    smooth = _path_smoothness(qi, ri)
    stability = _cost_consistency(costs)
    return float(
        min(1.0, max(0.0, 0.3 * eff + 0.3 * diag + 0.2 * smooth + 0.2 * stability))
    )


def offset_stats(offsets) -> dict:
    """calculateOffsetStats (alignment.go:766-801) -> AlignmentStats."""
    o = np.asarray(offsets, dtype=np.float64)
    if len(o) == 0:
        return dict(
            mean_offset=0.0, stddev_offset=0.0, median_offset=0.0,
            offset_range=0.0, consistency=1.0,
        )
    mean = o.mean()
    std = o.std()
    med = float(np.median(o))
    rng = float(o.max() - o.min())
    consistency = 1.0
    if mean != 0:
        consistency = 1.0 / (1.0 + std / abs(mean))
    return dict(
        mean_offset=float(mean),
        stddev_offset=float(std),
        median_offset=med,
        offset_range=rng,
        consistency=float(consistency),
    )
