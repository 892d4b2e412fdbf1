"""Batched hybrid alignment: the full accuracy machinery over [B] pairs.

Round-1 gap (VERDICT item #3): the per-pair hybrid analyzer
(ops/stats/alignment.py AlignmentAnalyzer._align_hybrid) carries all the
confidence/quality scoring and the consistency-gated winner selection,
but it is host-orchestrated and single-pair; the batched device paths
computed raw lags only. This module lifts the complete policy —
  NCC xcorr + peak metrics + parabolic sub-frame refinement
  -> correlation confidence/quality (alignment.go:183-305)
  -> 0.7 acceptance gate (alignment.go:318-321)
  -> banded DTW + path metrics (alignment.go:379-607)
  -> consistency-gated winner + verbatim confidence/similarity blends
— into two jitted [B]-pair programs (xcorr-score, dtw-score) plus a thin
host combiner that skips the DTW program entirely when every pair
clears the correlation gate.

Offsets are bit-identical to the per-pair path by construction: the
same _ncc_arrays/_peak_metrics kernels, the same banded fill/backtrack,
the same rounding (round for xcorr, truncate-toward-zero for the DTW
median displacement). Scoring runs in float32 on device vs float64 on
host, so confidences may differ at ~1e-6 — tests assert the offsets
and the winner decisions match on realistic data
(tests/test_batched_alignment.py, eval_accuracy.py --batched).
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from sonido_sonar_tpu.ops.stats.alignment import _ncc_arrays
from sonido_sonar_tpu.ops.stats.correlation import _peak_metrics

_EPS = 1e-10


# ---------------------------------------------------------------------
# vectorized scoring (verbatim constants, alignment.go:183-305)
# ---------------------------------------------------------------------

def correlation_confidence_batch(peak, sharpness, psl, snr, second):
    """calculateCorrelationConfidence (alignment.go:183-243), [B]."""
    peak_mag = jnp.abs(peak)
    peak_score = jnp.where(
        peak_mag >= 0.6, peak_mag + (peak_mag - 0.6) * 0.5, peak_mag
    )
    sharp_score = jnp.minimum(0.9, sharpness * 8.0)
    side_score = jnp.where(
        (psl > 0) & jnp.isfinite(psl), jnp.minimum(0.8, psl / 15.0), 0.0
    )
    snr_score = jnp.where(snr > 0, jnp.minimum(0.7, snr / 25.0), 0.0)
    ratio = jnp.abs(second) / jnp.maximum(peak_mag, _EPS)
    second_penalty = jnp.where(
        (second != 0) & (peak_mag > 0) & (ratio > 0.7), (ratio - 0.7) * 0.25, 0.0
    )
    excellence = jnp.where(
        peak_mag >= 0.75, 0.12, jnp.where(peak_mag >= 0.6, 0.08, 0.0)
    )
    conf = (
        0.55 * peak_score + 0.22 * sharp_score + 0.12 * side_score
        + 0.06 * snr_score + 0.05 * 0.15 + excellence - second_penalty
    )
    conf = jnp.clip(conf, 0.0, 0.95)
    return jnp.where(peak_mag < 0.1, 0.0, conf)


def correlation_quality_batch(peak, sharpness, psl, snr, peak_lag, max_lag: int):
    """calculateCorrelationQuality (alignment.go:245-305), [B]."""
    peak_mag = jnp.abs(peak)
    peak_q = jnp.where(
        peak_mag >= 0.6, peak_mag + (peak_mag - 0.6) * 0.4, peak_mag
    )
    sharp_q = jnp.minimum(0.85, sharpness * 5.0)
    side_q = jnp.where(
        (psl > 0) & jnp.isfinite(psl), jnp.minimum(0.7, psl / 20.0), 0.0
    )
    snr_q = jnp.where(snr > 0, jnp.minimum(0.6, snr / 30.0), 0.0)
    if max_lag > 0:
        neg_ratio = jnp.abs(peak_lag.astype(jnp.float32)) / float(max_lag)
        lag_penalty = jnp.where(
            (peak_lag < 0) & (neg_ratio > 0.90), (neg_ratio - 0.90) * 4.0, 0.0
        )
    else:
        lag_penalty = 0.0
    bonus = jnp.where(
        peak_mag >= 0.7, 0.10, jnp.where(peak_mag >= 0.55, 0.06, 0.0)
    )
    q = (
        0.50 * peak_q + 0.25 * sharp_q + 0.15 * side_q + 0.10 * snr_q
        + bonus - lag_penalty
    )
    q = jnp.clip(q, 0.0, 1.0)
    return jnp.where(peak_mag < 0.08, 0.0, q)


def _dtw_path_scores(qs, rs, cs, length, raw_cost, n: int, m: int):
    """All DTW path metrics for one pair (vectorized internals; vmapped
    by the caller). Mirrors ops/stats/alignment.py dtw_confidence /
    dtw_similarity / dtw_quality / path_stability / _offset_consistency
    and the offset estimator, with traced path length."""
    max_len = qs.shape[0]
    idx = jnp.arange(max_len)
    valid = idx < length
    L = jnp.maximum(length, 1).astype(jnp.float32)
    distance = raw_cost / L  # dtw.go:88-92 path-normalized

    # --- cost consistency (alignment.go:455-500) -----------------------
    # adaptive window w = clamp(min(5, L/4), 2); only its halfwidth
    # w//2 in {1, 2} affects the smoothing window
    h = jnp.where(length // 4 >= 4, 2, 1)
    cs_masked = jnp.where(valid, cs, 0.0)
    csum = jnp.concatenate([jnp.zeros(1), jnp.cumsum(cs_masked)])
    lo = jnp.maximum(0, idx - h)
    hi = jnp.minimum(length - 1, idx + h)
    cnt = jnp.maximum(hi - lo + 1, 1).astype(jnp.float32)
    smoothed = (csum[jnp.maximum(hi + 1, 0)] - csum[lo]) / cnt
    smoothed = jnp.where(valid, smoothed, 0.0)
    sm_mean = jnp.sum(smoothed) / L
    sm_var = jnp.sum(jnp.where(valid, (smoothed - sm_mean) ** 2, 0.0)) / L
    cv = jnp.sqrt(sm_var) / jnp.maximum(sm_mean, _EPS)
    consistency = jnp.where(
        length <= 1, 0.0, jnp.where(sm_mean <= 1e-10, 1.0, 1.0 / (1.0 + cv))
    )

    # --- step geometry ---------------------------------------------------
    dq = qs[1:] - qs[:-1]
    dr = rs[1:] - rs[:-1]
    step_valid = idx[1:] < length
    total_steps = jnp.maximum(length - 1, 1).astype(jnp.float32)
    diag_ratio = (
        jnp.sum(((dq > 0) & (dr > 0) & step_valid)) / total_steps
    )
    diag_bias = jnp.where(
        length <= 1, 1.0, 1.0 / (1.0 + jnp.exp(-10.0 * (diag_ratio - 0.3)))
    )
    changes = jnp.sum(
        (((dq[1:] != dq[:-1]) | (dr[1:] != dr[:-1])) & (idx[2:] < length))
    ).astype(jnp.float32)
    smooth = jnp.where(
        length <= 2, 1.0, jnp.maximum(0.0, 1.0 - changes / total_steps)
    )
    stability = jnp.where(
        length < 3, 0.0, jnp.maximum(0.0, 1.0 - changes / total_steps)
    )

    # --- composite scores (alignment.go:379-453, 545-568) ----------------
    avg_len = (n + m) / 2.0
    nd = distance / avg_len
    eff = jnp.minimum(1.0, max(n, m) / L)
    mean_cost = jnp.sum(cs_masked) / L
    quality = jnp.clip(
        0.3 * eff + 0.3 * diag_bias + 0.2 * smooth + 0.2 * consistency, 0.0, 1.0
    )
    similarity = jnp.clip(
        0.5 * (1.0 / (1.0 + nd)) + 0.3 * quality + 0.2 * (1.0 / (1.0 + mean_cost)),
        0.0, 1.0,
    )
    confidence = jnp.clip(
        0.4 * jnp.exp(-nd * 2.0) + 0.25 * eff + 0.2 * consistency
        + 0.15 * diag_bias,
        0.0, 1.0,
    )
    confidence = jnp.where(length == 0, 0.0, confidence)

    # --- offset: truncated median of interior displacements --------------
    interior = valid & (qs > 0) & (rs > 0) & (qs < n - 1) & (rs < m - 1)
    disp = (rs - qs).astype(jnp.float32)
    disp_masked = jnp.where(interior, disp, jnp.nan)
    med = jnp.nanmedian(disp_masked)
    has_interior = jnp.any(interior)
    offset_frames = jnp.where(
        has_interior,
        jnp.trunc(jnp.where(jnp.isnan(med), 0.0, med)),
        jnp.floor(jnp.sum(jnp.where(valid, disp, 0.0)) / L),
    ).astype(jnp.int32)

    # --- offset consistency gate (hybrid deviation note) ------------------
    within = jnp.sum(interior & (jnp.abs(disp - med) <= 5.0))
    n_interior = jnp.sum(interior)
    offset_consistency = jnp.where(
        (length < 3) | (n_interior == 0),
        0.0,
        within / jnp.maximum(n_interior, 1),
    )

    return {
        "offset_frames": offset_frames,
        "confidence": confidence,
        "similarity": similarity,
        "quality": quality,
        "stability": stability,
        "offset_consistency": offset_consistency,
        "distance": distance,
    }


# ---------------------------------------------------------------------
# jitted batch programs
# ---------------------------------------------------------------------

def ambiguity_penalty_batch(ambiguity):
    """Vectorized ops/stats/alignment.ambiguity_penalty (comb-ambiguity
    confidence penalty — see the constants' NOTE deviation there)."""
    from sonido_sonar_tpu.ops.stats.alignment import (
        _AMBIGUITY_CAP, _AMBIGUITY_ONSET, _AMBIGUITY_SLOPE,
    )

    return jnp.minimum(
        _AMBIGUITY_CAP,
        _AMBIGUITY_SLOPE * jnp.maximum(0.0, ambiguity - _AMBIGUITY_ONSET),
    )


@partial(jax.jit, static_argnames=("max_lag", "hop_size", "t1", "t2", "min_sep", "top_k"))
def xcorr_align_batch(
    query: jnp.ndarray,       # [B, T1] 1-D feature series (energy)
    reference: jnp.ndarray,   # [B, T2]
    max_lag: int,
    hop_size: int,
    t1: int,
    t2: int,
    min_sep: int = 0,
    top_k: int = 1,
) -> Dict[str, jnp.ndarray]:
    """Batched alignWithCrossCorrelation (alignment.go:151-181) with the
    analyzer's parabolic sub-frame peak refinement.

    min_sep > 0 additionally computes the comb-ambiguity ratio (the
    strongest peak more than min_sep bins from the main one, relative to
    it) and applies the analyzer's ambiguity penalty to `confidence`;
    the unpenalized value is returned as `confidence_gate` (used for the
    hybrid 0.7 routing gate, matching AlignmentAnalyzer._align_hybrid).
    top_k > 1 also returns the top-K well-separated peak lags [B, K]
    (candidates for batched PCM verification)."""

    def one(q, r):
        corr = _ncc_arrays(q, r, max_lag, t1, t2)
        peak_corr, peak_lag, peak_idx, _pval, snr, sharp, second, psl, _ov = (
            _peak_metrics(corr, max_lag, t1, t2)
        )
        num_lags = 2 * max_lag + 1
        i = peak_idx
        y0 = corr[jnp.maximum(i - 1, 0)]
        y1 = corr[i]
        y2 = corr[jnp.minimum(i + 1, num_lags - 1)]
        denom = y0 - 2.0 * y1 + y2
        shift = 0.5 * (y0 - y2) / jnp.where(jnp.abs(denom) > 1e-12, denom, 1.0)
        ok = (
            (i > 0) & (i < num_lags - 1)
            & (jnp.abs(denom) > 1e-12) & (jnp.abs(shift) <= 1.0)
        )
        lag_refined = peak_lag.astype(jnp.float32) + jnp.where(ok, shift, 0.0)
        offset = jnp.round(-lag_refined * hop_size).astype(jnp.int32)

        abs_c = jnp.abs(corr)
        idx = jnp.arange(num_lags)
        sep = max(min_sep, 1)
        masked = jnp.where(jnp.abs(idx - peak_idx) <= sep, -jnp.inf, abs_c)
        second_sep = jnp.max(masked)
        amb = jnp.clip(
            jnp.where(
                jnp.isfinite(second_sep),
                second_sep / jnp.maximum(abs_c[peak_idx], _EPS),
                0.0,
            ),
            0.0, 1.0,
        )
        # top-K well-separated peaks (greedy argmax + suppression),
        # mirroring the per-pair candidate picker in
        # extractors/alignment.py align_audio_files
        picks = [peak_idx]
        for _ in range(top_k - 1):
            p = jnp.argmax(masked)
            picks.append(p)
            masked = jnp.where(jnp.abs(idx - p) <= sep, -jnp.inf, masked)
        topk_lags = jnp.stack(picks).astype(jnp.int32) - max_lag
        return peak_corr, peak_lag, snr, sharp, second, psl, offset, amb, topk_lags

    peak_corr, peak_lag, snr, sharp, second, psl, offset, amb, topk_lags = jax.vmap(one)(
        query.astype(jnp.float32), reference.astype(jnp.float32)
    )
    similarity = jnp.clip(jnp.abs(peak_corr), 0.0, 1.0)
    confidence = correlation_confidence_batch(peak_corr, sharp, psl, snr, second)
    quality = correlation_quality_batch(peak_corr, sharp, psl, snr, peak_lag, max_lag)
    out = {
        "offset_samples": offset,
        "peak_lag": peak_lag,
        "peak_correlation": peak_corr,
        "similarity": similarity,
        "confidence": confidence,
        "confidence_gate": confidence,
        "quality": quality,
        "noise_level": 1.0 - snr / 20.0,
    }
    if min_sep > 0:
        out["ambiguity"] = amb
        out["confidence"] = jnp.maximum(
            0.0, confidence - ambiguity_penalty_batch(amb)
        )
    if top_k > 1:
        out["topk_lags"] = topk_lags
    return out


@partial(jax.jit, static_argnames=("band", "hop_size", "n", "m"))
def dtw_align_batch(
    query: jnp.ndarray,       # [B, N] or [B, N, D]
    reference: jnp.ndarray,   # [B, M] or [B, M, D]
    band: int,
    hop_size: int,
    n: int,
    m: int,
) -> Dict[str, jnp.ndarray]:
    """Batched alignWithDTW (alignment.go:133-149) over the banded fill
    + backtrack, with full path scoring."""
    from sonido_sonar_tpu.ops.stats.dtw import _backtrack_banded, _fill_banded
    from sonido_sonar_tpu.ops.stats.pallas_backtrack import (
        backtrack_banded_pallas_batch,
        backtrack_banded_pallas_rev,
        pallas_backtrack_available,
    )
    from sonido_sonar_tpu.ops.stats.pallas_dtw import (
        fill_banded_pallas_batch,
        fill_banded_pallas_scan_batch,
        fill_banded_pallas_scan_pairs_raw,
        pallas_dtw_available,
        pallas_dtw_scan_available,
    )

    if query.ndim == 2:
        query = query[..., None]
    if reference.ndim == 2:
        reference = reference[..., None]
    q = query.astype(jnp.float32)
    r = reference.astype(jnp.float32)
    b = q.shape[0]

    if pallas_dtw_scan_available(band) and not pallas_dtw_available(band) \
            and b > 1:
        # production lag budgets, batched: pairs-on-sublanes fill (B
        # independent DPs advance the same row in one [B, lanes] vector
        # op, ~min(B,8)x the serial-grid batch) with fill AND backtrack
        # run per power-of-two sub-batch so the GB-scale band tensors
        # (dense distances, cost band, move codes) stay TRANSIENT — only
        # the tiny path-coordinate arrays survive to full-batch scoring.
        lanes = max(128, ((2 * band + 1 + 127) // 128) * 128)
        w_arr = max(lanes, ((m + 127) // 128) * 128) + 128
        per_pair = 4 * n * (w_arr + lanes)
        sb = 8
        while sb > 1 and sb * per_pair > 8e9:
            sb //= 2
        part_paths, part_raws = [], []
        for i in range(0, b, sb):
            # raw reversed orientation end-to-end: the backtrack's move
            # codes and path-cost gathers read the kernel's reversed
            # band in place — no multi-GB un-reverse, slice, or row-0
            # concat passes
            costs_rev = fill_banded_pallas_scan_pairs_raw(
                q[i : i + sb], r[i : i + sb], band, n, m
            )
            bt = backtrack_banded_pallas_rev(costs_rev, band, n, m)
            part_paths.append(bt)
            part_raws.append(
                costs_rev[:, n - 1, costs_rev.shape[-1] - 1 - (m - n + band)]
            )
        if len(part_paths) == 1:
            qs_b, rs_b, cs_b, lengths = part_paths[0]
            raw = part_raws[0]
        else:
            qs_b, rs_b, cs_b, lengths = (
                jnp.concatenate([p[j] for p in part_paths])
                for j in range(4)
            )
            raw = jnp.concatenate(part_raws)
    else:
        if pallas_dtw_available(band):
            costs = fill_banded_pallas_batch(q, r, band, n, m)
        elif pallas_dtw_scan_available(band):
            costs = fill_banded_pallas_scan_batch(q, r, band, n, m)
        else:
            costs = jax.vmap(lambda a, b: _fill_banded(a, b, band, n, m))(q, r)
        if pallas_backtrack_available(band):
            qs_b, rs_b, cs_b, lengths = backtrack_banded_pallas_batch(
                costs, band, n, m
            )
        else:
            qs_b, rs_b, cs_b, lengths = jax.vmap(
                lambda c: _backtrack_banded(c, band, n, m)
            )(costs)
        raw = costs[:, n, m - n + band]
    scores = jax.vmap(partial(_dtw_path_scores, n=n, m=m))(
        qs_b, rs_b, cs_b, lengths, raw
    )
    scores["offset_samples"] = scores.pop("offset_frames") * hop_size
    return scores


# ---------------------------------------------------------------------
# host combiner (the hybrid policy)
# ---------------------------------------------------------------------

def batched_hybrid_align(
    query_energy,
    reference_energy,
    max_lag: int,
    hop_size: int,
    sample_rate: int,
    dtw_band: int = 50,
    skip_dtw_if_confident: bool = True,
    top_k: int = 1,
) -> Dict[str, np.ndarray]:
    """Hybrid alignment for B pairs of 1-D feature series.

    Policy identical to AlignmentAnalyzer._align_hybrid (including its
    documented consistency-gate and comb-ambiguity deviations from
    alignment.go:308-337):
      - accept xcorr when its UNPENALIZED confidence > 0.7 (the routing
        gate; the reported confidence carries the ambiguity penalty)
      - otherwise run banded DTW, scale its confidence by
        sqrt(offset_consistency), take the more confident offset,
        report the reference's verbatim 0.6/0.4 + 0.7/0.3 blends
    The DTW program is skipped entirely when every pair clears the gate
    (one host sync on the [B] confidence vector).

    Returns numpy arrays: offset_samples, offset_seconds, confidence,
    similarity, quality, ambiguity, method (0 = correlation accepted,
    1 = hybrid/corr winner, 2 = hybrid/DTW winner); plus topk_lags
    [B, top_k] when top_k > 1 (verification candidates).
    """
    q = jnp.asarray(query_energy)
    r = jnp.asarray(reference_energy)
    t1, t2 = int(q.shape[-1]), int(r.shape[-1])
    max_lag = max(min(max_lag, t1 - 1, t2 - 1), 0)
    min_sep = max(int(0.1 * sample_rate / max(hop_size, 1)), 2)

    xc = jax.device_get(
        xcorr_align_batch(
            q, r, max_lag, hop_size, t1, t2, min_sep=min_sep, top_k=top_k
        )
    )  # ONE host round trip for the whole [B]-sized dict: per-array
    # np.asarray fetches each pay the remote-tunnel latency (measured
    # ~40 ms of pure fetch overhead on 16x60 s pairs)
    corr_off = np.asarray(xc["offset_samples"])
    corr_conf = np.asarray(xc["confidence"])
    corr_gate = np.asarray(xc["confidence_gate"])
    corr_sim = np.asarray(xc["similarity"])
    corr_q = np.asarray(xc["quality"])

    accepted = corr_gate > 0.7
    out = {
        "offset_samples": corr_off.copy(),
        "confidence": corr_conf.copy(),
        "confidence_unpenalized": corr_gate.copy(),
        "similarity": corr_sim.copy(),
        "quality": corr_q.copy(),
        "ambiguity": np.asarray(xc["ambiguity"]),
        "method": np.zeros(corr_off.shape[0], dtype=np.int32),
    }
    if top_k > 1:
        out["topk_lags"] = np.asarray(xc["topk_lags"])

    need_dtw = ~accepted
    if need_dtw.any() or not skip_dtw_if_confident:
        band = dtw_band
        if band > 0 and max_lag > 0:
            band = max(band, max_lag)  # see _align_dtw's deviation note
        band = min(band, max(t1, t2))
        if abs(t1 - t2) > band:
            band = abs(t1 - t2)
        dt = jax.device_get(dtw_align_batch(q, r, band, hop_size, t1, t2))
        dtw_off = np.asarray(dt["offset_samples"])
        dtw_conf = np.asarray(dt["confidence"])
        dtw_sim = np.asarray(dt["similarity"])
        dtw_q = np.asarray(dt["quality"])
        eff_conf = dtw_conf * np.sqrt(np.asarray(dt["offset_consistency"]))

        dtw_wins = need_dtw & (eff_conf >= corr_conf)
        out["offset_samples"] = np.where(dtw_wins, dtw_off, corr_off)
        out["confidence"] = np.where(
            need_dtw, 0.6 * dtw_conf + 0.4 * corr_conf, corr_conf
        )
        out["similarity"] = np.where(
            need_dtw, 0.7 * dtw_sim + 0.3 * corr_sim, corr_sim
        )
        out["quality"] = np.where(need_dtw, dtw_q, corr_q)
        out["method"] = np.where(
            need_dtw, np.where(dtw_wins, 2, 1), 0
        ).astype(np.int32)

    out["offset_seconds"] = out["offset_samples"] / float(sample_rate)
    return out


def batched_hybrid_align_device(
    query_energy,
    reference_energy,
    max_lag: int,
    hop_size: int,
    sample_rate: int,
    dtw_band: int = 50,
) -> Dict[str, jnp.ndarray]:
    """Sync-free hybrid alignment: both scoring programs always run and
    the winner select stays on device, so a fleet monitor can keep many
    batches in flight with zero host round trips per batch (the gated
    variant above costs one sync on the confidence vector but skips the
    DTW program when every pair clears 0.7).

    Same policy and outputs as batched_hybrid_align, as jnp arrays.
    """
    q = jnp.asarray(query_energy)
    r = jnp.asarray(reference_energy)
    t1, t2 = int(q.shape[-1]), int(r.shape[-1])
    max_lag = max(min(max_lag, t1 - 1, t2 - 1), 0)
    min_sep = max(int(0.1 * sample_rate / max(hop_size, 1)), 2)

    xc = xcorr_align_batch(q, r, max_lag, hop_size, t1, t2, min_sep=min_sep)
    band = dtw_band
    if band > 0 and max_lag > 0:
        band = max(band, max_lag)
    band = min(band, max(t1, t2))
    if abs(t1 - t2) > band:
        band = abs(t1 - t2)
    dt = dtw_align_batch(q, r, band, hop_size, t1, t2)

    corr_off, corr_conf = xc["offset_samples"], xc["confidence"]
    corr_gate = xc["confidence_gate"]
    dtw_conf = dt["confidence"]
    eff_conf = dtw_conf * jnp.sqrt(dt["offset_consistency"])
    accepted = corr_gate > 0.7
    need_dtw = ~accepted
    dtw_wins = need_dtw & (eff_conf >= corr_conf)
    offset = jnp.where(dtw_wins, dt["offset_samples"], corr_off)
    return {
        "offset_samples": offset,
        "offset_seconds": offset / float(sample_rate),
        "confidence": jnp.where(
            need_dtw, 0.6 * dtw_conf + 0.4 * corr_conf, corr_conf
        ),
        "confidence_unpenalized": corr_gate,
        "similarity": jnp.where(
            need_dtw,
            0.7 * dt["similarity"] + 0.3 * xc["similarity"],
            xc["similarity"],
        ),
        "quality": jnp.where(need_dtw, dt["quality"], xc["quality"]),
        "ambiguity": xc["ambiguity"],
        "method": jnp.where(
            need_dtw, jnp.where(dtw_wins, 2, 1), 0
        ).astype(jnp.int32),
    }


def batched_align_audio(
    query_pcm,
    reference_pcm,
    sample_rate: int,
    window_size: int = 2048,
    hop_size: int = 512,
    max_lag_seconds: float = 30.0,
    dtw_band: int = 50,
    refine: bool = False,
    energy_impl: str = "framed",
    verify: bool = None,
    max_offset_samples: int = 0,
) -> Dict[str, np.ndarray]:
    """AlignAudio for B pairs (alignment.go:109-130): short-time RMS
    energy series -> batched hybrid alignment; optional fused GCC-PHAT
    sample-level refinement (parallel.pipeline.batched_refine_offsets).

    query_pcm/reference_pcm: [B, N] arrays. energy_impl: "framed" is
    bit-identical to the per-pair analyzer's short_time_energy;
    "cumsum" is the O(N) prefix-sum formulation used by the Pallas
    pipeline (equal to ~1e-6, cheaper for long batches).

    verify controls the beyond-reference PCM disambiguation (the batched
    counterpart of AlignmentExtractor.align_audio_files' adaptive
    default):
      - None (DEFAULT): when any pair's energy-correlation comb is
        ambiguous (ambiguity > _AMBIGUITY_ONSET), its top-K correlation
        peaks are GCC-PHAT-verified on the raw PCM in one batched pass
        and the best-supported offset wins; a decisive verification
        (peak >= _VERIFY_FLOOR, margin >= _VERIFY_MARGIN vs candidates
        refining elsewhere) lifts the comb-ambiguity confidence penalty.
      - False: never verify (wrong periodic answers still arrive at
        LOW confidence via the ambiguity penalty).
      - True: verify every pair.
    Adds output fields: `verified` [B] bool (PCM pass applied),
    `verify_margin` [B] (0 where not verified).

    max_offset_samples bounds |offset| for the PHAT verification and
    refinement windows (static). The helpers default it to N//4, which
    silently clips larger coarse offsets — pass ~the max-lag budget when
    max_lag_seconds exceeds a quarter of the window (the monitor's 30 s
    budget on 60 s windows).
    """
    from sonido_sonar_tpu.ops.stats.alignment import (
        _AMBIGUITY_ONSET,
        _VERIFY_FLOOR,
        _VERIFY_MARGIN,
        _VERIFY_TOP_K,
    )
    from sonido_sonar_tpu.ops.temporal import (
        short_time_energy,
        short_time_energy_cumsum,
    )

    energy = short_time_energy if energy_impl == "framed" else short_time_energy_cumsum
    q = jnp.asarray(query_pcm, dtype=jnp.float32)
    r = jnp.asarray(reference_pcm, dtype=jnp.float32)
    qe = energy(q, window_size, hop_size)
    re_ = energy(r, window_size, hop_size)
    max_lag = int(max_lag_seconds * sample_rate) // hop_size
    top_k = 1 if verify is False else _VERIFY_TOP_K
    out = batched_hybrid_align(
        qe, re_, max_lag, hop_size, sample_rate, dtw_band=dtw_band,
        top_k=top_k,
    )
    b = out["offset_samples"].shape[0]
    out["verified"] = np.zeros(b, dtype=bool)
    out["verify_margin"] = np.zeros(b, dtype=np.float64)
    if verify is True:
        need = np.ones(b, dtype=bool)
    elif verify is False:
        need = np.zeros(b, dtype=bool)
    else:
        # two triggers (same policy as the per-pair align_audio_files):
        # a comb-ambiguous correlation, or a winning lag whose NCC used
        # less than _VERIFY_OVERLAP of the shorter series (tiny-overlap
        # NCC is spuriously high; neither the reference nor this port
        # penalizes overlap in the NCC itself)
        from sonido_sonar_tpu.ops.stats.alignment import _VERIFY_OVERLAP

        t1 = qe.shape[-1]
        t2 = re_.shape[-1]
        lag_f = -np.asarray(out["offset_samples"], dtype=np.float64) / hop_size
        ov = np.maximum(
            0.0, np.minimum(t1, t2 - lag_f) - np.maximum(0.0, -lag_f)
        )
        low_overlap = ov < _VERIFY_OVERLAP * min(t1, t2)
        need = (out["ambiguity"] > _AMBIGUITY_ONSET) | low_overlap
    if need.any():
        from sonido_sonar_tpu.parallel.pipeline import (
            batched_phat_candidates,
            batched_phat_global,
        )

        # candidates: top-K well-separated correlation peaks plus the
        # hybrid's chosen offset (identical to the per-pair picker in
        # extractors/alignment.py align_audio_files) plus the whitened
        # full-range PHAT scan (the true offset may be invisible in the
        # energy series entirely — see batched_phat_global)
        glob_off, glob_peak = jax.device_get(
            batched_phat_global(
                q, r, sample_rate, int(max_lag_seconds * sample_rate)
            )
        )
        glob_off = np.asarray(glob_off, dtype=np.float64)
        glob_peak = np.asarray(glob_peak, dtype=np.float64)
        # a weak global peak falls back to the pair's own offset (a
        # duplicate candidate is corroboration, never competition)
        glob_off = np.where(
            glob_peak >= _VERIFY_FLOOR, glob_off, out["offset_seconds"]
        )
        cand = np.concatenate(
            [
                -out["topk_lags"].astype(np.float64) * hop_size / sample_rate,
                out["offset_seconds"][:, None],
                glob_off[:, None],
            ],
            axis=1,
        )
        refined, peaks = jax.device_get(
            batched_phat_candidates(
                q, r, jnp.asarray(cand, dtype=jnp.float32), sample_rate,
                hop_size=hop_size, max_offset_samples=max_offset_samples,
            )
        )
        refined = np.asarray(refined, dtype=np.float64)
        peaks = np.asarray(peaks, dtype=np.float64)
        rows = np.arange(b)
        k_star = peaks.argmax(axis=1)
        best_off = refined[rows, k_star]
        best_val = peaks[rows, k_star]
        hop_s = hop_size / float(sample_rate)
        rival = np.where(
            np.abs(refined - best_off[:, None]) > hop_s, peaks, 0.0
        ).max(axis=1)
        margin = best_val / np.maximum(rival, 1e-9)
        decisive = (best_val >= _VERIFY_FLOOR) & (margin >= _VERIFY_MARGIN)
        out["offset_samples"] = np.where(
            need,
            np.round(best_off * sample_rate).astype(np.int64),
            out["offset_samples"],
        )
        # a decisive PCM confirmation lifts the comb-ambiguity penalty
        # (the verbatim correlation confidence is the honest score for
        # a verified peak) and floors confidence at the whitened-peak
        # evidence itself (ops/stats/alignment._VERIFY_CONF_CAP — the
        # energy-series statistics can be garbage on stationary content
        # even when the PCM evidence is near-perfect); indecisive keeps
        # the penalized value so accept thresholds reject the measurement
        from sonido_sonar_tpu.ops.stats.alignment import _VERIFY_CONF_CAP

        out["confidence"] = np.where(
            need & decisive,
            np.maximum(
                np.maximum(out["confidence"], out["confidence_unpenalized"]),
                np.minimum(_VERIFY_CONF_CAP, best_val),
            ),
            out["confidence"],
        )
        out["verified"] = need
        out["verify_margin"] = np.where(need, margin, 0.0)
    out["offset_seconds"] = out["offset_samples"] / float(sample_rate)
    if refine:
        from sonido_sonar_tpu.parallel.pipeline import batched_refine_offsets

        refined = batched_refine_offsets(
            q, r, jnp.asarray(out["offset_seconds"], dtype=jnp.float32),
            sample_rate, hop_size=hop_size,
            max_offset_samples=max_offset_samples,
        )
        out["offset_seconds_refined"] = np.asarray(refined)
    return out
