"""Randomized parity tests: production scorers vs the goref float64
oracle (tests/goref.py, a tests-only transliteration of the reference's
heuristic scoring chains).

Closes VERDICT.md round-1 weakness #1: a mistranscribed constant in
calculateCorrelationConfidence / calculateDTWConfidence /
calculateFeatureSimilarity / calculateConfidence / classifyFromFeatures
now fails CI. All trials use float64 end-to-end (the production
comparator converts to float64 on host) so tolerances are tight.
"""

from __future__ import annotations

import math
from types import SimpleNamespace

import numpy as np
import pytest

from tests import goref

from sonido_sonar_tpu.config.config import ContentType
from sonido_sonar_tpu.extractors.features import (
    ExtractedFeatures,
    HarmonicFeatures,
    SpectralFeatures,
    SpeechFeatures,
    TemporalFeatures,
)
from sonido_sonar_tpu.fingerprint.comparison import (
    ComparisonQualityMetrics,
    FingerprintComparator,
    classify_match,
    compare_scalar,
    cosine_similarity,
)
from sonido_sonar_tpu.fingerprint.content_detector import (
    AcousticFeatures,
    ContentDetector,
)
from sonido_sonar_tpu.fingerprint.generator import AudioFingerprint
from sonido_sonar_tpu.ops.stats.alignment import (
    _cost_consistency,
    _diagonal_bias,
    _path_smoothness,
    correlation_confidence,
    correlation_quality,
    dtw_confidence,
    dtw_quality,
    dtw_similarity,
    offset_stats,
    path_stability,
)
from sonido_sonar_tpu.ops.stats.correlation import CorrelationResult

N_TRIALS = 1000


# ---------------------------------------------------------------------
# correlation confidence / quality
# ---------------------------------------------------------------------

def _fake_corr_result(rng, max_lag: int) -> SimpleNamespace:
    peak = float(rng.uniform(-1.1, 1.1))
    # hit the branch boundaries (0.1 / 0.6 / 0.75 / 0.55 / 0.7 / 0.08)
    # often by snapping some draws onto them
    if rng.random() < 0.2:
        peak = float(rng.choice([0.1, 0.6, 0.75, 0.55, 0.7, 0.08, 0.0]))
    psl_mode = rng.random()
    if psl_mode < 0.1:
        psl = float("inf")
    elif psl_mode < 0.2:
        psl = 0.0
    else:
        psl = float(rng.uniform(0, 35))
    return SimpleNamespace(
        peak_correlation=peak,
        sharpness=float(rng.uniform(-0.05, 0.4)),
        peak_to_sidelobe=psl,
        snr=float(rng.uniform(-5, 60)),
        second_peak=float(rng.uniform(-1, 1)) if rng.random() > 0.1 else 0.0,
        peak_lag=int(rng.integers(-max_lag, max_lag + 1)) if max_lag else 0,
    )


def test_correlation_confidence_parity():
    rng = np.random.default_rng(0)
    for _ in range(N_TRIALS):
        c = _fake_corr_result(rng, max_lag=int(rng.integers(0, 500)))
        got = correlation_confidence(c)
        want = goref.correlation_confidence(
            c.peak_correlation, c.sharpness, c.peak_to_sidelobe, c.snr,
            c.second_peak,
        )
        assert got == pytest.approx(want, abs=1e-12), vars(c)


def test_correlation_quality_parity():
    rng = np.random.default_rng(1)
    for _ in range(N_TRIALS):
        max_lag = int(rng.integers(0, 500))
        c = _fake_corr_result(rng, max_lag=max_lag)
        # force the >0.9 negative-lag penalty region sometimes
        if max_lag > 0 and rng.random() < 0.3:
            c.peak_lag = -int(rng.integers(int(0.85 * max_lag), max_lag + 1))
        got = correlation_quality(c, max_lag)
        want = goref.correlation_quality(
            c.peak_correlation, c.sharpness, c.peak_to_sidelobe, c.snr,
            c.peak_lag, max_lag,
        )
        assert got == pytest.approx(want, abs=1e-12), vars(c)


# ---------------------------------------------------------------------
# DTW path scorers
# ---------------------------------------------------------------------

def _random_path(rng):
    """Random monotonic DTW path from (0,0); query/ref lengths derived
    from the endpoint (as the reference's backtrack guarantees)."""
    steps = int(rng.integers(2, 120))
    moves = rng.integers(0, 3, size=steps)  # 0=diag 1=down 2=right
    qi, ri = [0], [0]
    for m in moves:
        qi.append(qi[-1] + (1 if m in (0, 1) else 0))
        ri.append(ri[-1] + (1 if m in (0, 2) else 0))
    qi = np.asarray(qi)
    ri = np.asarray(ri)
    n, m_ = qi[-1] + 1, ri[-1] + 1
    if rng.random() < 0.1:
        costs = np.zeros(len(qi))  # all-zero branch (consistency = 1.0)
    else:
        costs = rng.uniform(0, 3, size=len(qi))
    distance = float(rng.uniform(0, 5))
    return qi, ri, costs, int(n), int(m_), distance


def test_dtw_scorers_parity():
    rng = np.random.default_rng(2)
    for _ in range(500):
        qi, ri, costs, n, m, dist = _random_path(rng)
        dtw = SimpleNamespace(distance=dist, query_length=n, ref_length=m)
        assert _cost_consistency(costs) == pytest.approx(
            goref.cost_consistency(list(costs)), abs=1e-12)
        assert _diagonal_bias(qi, ri) == pytest.approx(
            goref.diagonal_bias(list(qi), list(ri)), abs=1e-12)
        assert _path_smoothness(qi, ri) == pytest.approx(
            goref.path_smoothness(list(qi), list(ri)), abs=1e-12)
        assert path_stability(qi, ri) == pytest.approx(
            goref.path_stability(list(qi), list(ri)), abs=1e-12)
        assert dtw_similarity(dtw, qi, ri, costs) == pytest.approx(
            goref.dtw_similarity(dist, n, m, list(qi), list(ri), list(costs)),
            abs=1e-9)
        assert dtw_confidence(dtw, qi, ri, costs) == pytest.approx(
            goref.dtw_confidence(dist, n, m, list(qi), list(ri), list(costs)),
            abs=1e-9)
        assert dtw_quality(dtw, qi, ri, costs) == pytest.approx(
            goref.dtw_quality(dist, n, m, list(qi), list(ri), list(costs)),
            abs=1e-9)


def test_offset_stats_parity():
    rng = np.random.default_rng(3)
    for _ in range(200):
        n = int(rng.integers(1, 12))
        offsets = list(rng.integers(-5000, 5000, size=n).astype(float))
        got = offset_stats(offsets)
        want = goref.offset_stats(offsets)
        for k in ("mean_offset", "stddev_offset", "median_offset",
                  "offset_range", "consistency"):
            assert got[k] == pytest.approx(want[k], abs=1e-9), k


# ---------------------------------------------------------------------
# comparator chain
# ---------------------------------------------------------------------

def _random_features(rng, present):
    """Build (ExtractedFeatures, goref feature dict) from one random
    draw. `present` is a set of feature-group names to include."""
    T = int(rng.integers(4, 40))
    Tp = int(rng.integers(3, 30))
    fdict = {}
    kw = {}

    if "mfcc" in present:
        mfcc = rng.normal(size=(T, 13))
        kw["mfcc"] = np.float64(mfcc)
        fdict["mfcc"] = mfcc
    if "spectral" in present:
        cent = rng.uniform(200, 4000, size=T)
        roll = rng.uniform(500, 8000, size=T)
        flux = rng.uniform(0, 2, size=T)
        kw["spectral_features"] = SpectralFeatures(
            spectral_centroid=cent, spectral_rolloff=roll, spectral_flux=flux,
        )
        fdict["spectral"] = {"centroid": list(cent), "rolloff": list(roll),
                             "flux": list(flux)}
    if "chroma" in present:
        chroma = rng.uniform(0, 1, size=(T, 12))
        kw["chroma_features"] = chroma
        fdict["chroma"] = chroma
    if "temporal" in present:
        dr = float(rng.choice([0.0, rng.uniform(5, 60)]))
        sil = float(rng.uniform(0, 0.8))
        od = float(rng.choice([0.0, rng.uniform(0.1, 8)]))
        rms = rng.uniform(0, 1, size=Tp)
        kw["temporal_features"] = TemporalFeatures(
            rms_energy=rms, dynamic_range=dr, silence_ratio=sil,
            onset_density=od, peak_amplitude=1.0, average_amplitude=0.3,
        )
        fdict["temporal"] = {"dynamic_range": dr, "silence_ratio": sil,
                             "onset_density": od, "rms_energy": list(rms)}
    if "speech" in present:
        rate = float(rng.choice([0.0, rng.uniform(1, 8)]))
        vtl = float(rng.choice([0.0, rng.uniform(12, 20)]))
        voic = rng.uniform(0, 1, size=Tp)
        kw["speech_features"] = SpeechFeatures(
            speech_rate=rate, vocal_tract_length=vtl,
            voicing_probability=voic,
        )
        fdict["speech"] = {"speech_rate": rate, "vocal_tract_length": vtl,
                           "voicing_probability": list(voic)}
    if "harmonic" in present:
        hr = rng.uniform(0, 1, size=Tp)
        pe = rng.uniform(60, 800, size=Tp)
        kw["harmonic_features"] = HarmonicFeatures(
            harmonic_ratio=hr, pitch_estimate=pe,
        )
        fdict["harmonic"] = {"harmonic_ratio": list(hr),
                             "pitch_estimate": list(pe)}
    return ExtractedFeatures(**kw), fdict


_GROUPS = ("mfcc", "spectral", "chroma", "temporal", "speech", "harmonic")


def _make_fp(rng, ident, content, features, duration):
    return AudioFingerprint(
        id=ident, stream_url="", content_type=content, timestamp=0.0,
        duration=duration, sample_rate=44100, hop_size=512, channels=1,
        features=features,
    )


def test_comparator_chain_parity():
    rng = np.random.default_rng(4)
    contents = [ContentType.NEWS, ContentType.TALK, ContentType.MUSIC,
                ContentType.SPORTS, ContentType.MIXED, ContentType.UNKNOWN]
    for trial in range(300):
        k = int(rng.integers(1, len(_GROUPS) + 1))
        present = set(rng.choice(_GROUPS, size=k, replace=False))
        content = contents[int(rng.integers(0, len(contents)))]
        feats1, dict1 = _random_features(rng, present)
        feats2, dict2 = _random_features(rng, present)
        d1 = float(rng.uniform(5, 120))
        d2 = float(rng.uniform(5, 120))
        fp1 = _make_fp(rng, "a", content, feats1, d1)
        fp2 = _make_fp(rng, "b", content, feats2, d2)

        from sonido_sonar_tpu.config.config import ComparisonConfig
        comparator = FingerprintComparator(
            ComparisonConfig(enable_detailed_metrics=True,
                             enable_content_filter=False))
        got = comparator.compare(fp1, fp2)

        want_sim, want_dist = goref.calculate_feature_similarity(
            dict1, dict2, content.value)
        assert got.feature_similarity == pytest.approx(want_sim, abs=1e-9), (
            trial, present, content)
        assert got.overall_similarity == pytest.approx(want_sim, abs=1e-9)
        for key, dval in want_dist.items():
            assert got.feature_distances[key] == pytest.approx(dval, abs=1e-9)
        assert set(got.feature_distances) == set(want_dist)

        want_q = goref.quality_metrics(dict1, dict2, d1, d2, want_dist)
        q = got.quality_metrics
        assert q.data_availability == pytest.approx(want_q["data_availability"], abs=1e-12)
        assert q.feature_coverage == pytest.approx(want_q["feature_coverage"], abs=1e-12)
        assert q.temporal_alignment == pytest.approx(want_q["temporal_alignment"], abs=1e-12)
        assert q.noise_level == pytest.approx(want_q["noise_level"], abs=1e-9)
        assert q.dynamic_range_match == pytest.approx(want_q["dynamic_range_match"], abs=1e-9)
        assert q.spectral_coherence == pytest.approx(want_q["spectral_coherence"], abs=1e-9)

        want_conf = goref.calculate_confidence(
            want_sim, True, len(want_dist),
            want_q["data_availability"], want_q["noise_level"])
        assert got.confidence == pytest.approx(want_conf, abs=1e-9)
        assert got.match_type == goref.classify_match(want_sim)


def test_comparator_weight_tables_match_goref():
    """The production weight tables must equal goref's independent
    transcription of comparison.go:1055-1104."""
    from sonido_sonar_tpu.fingerprint.comparison import (
        _CONTENT_WEIGHTS, _DEFAULT_WEIGHTS)
    for ct, table in _CONTENT_WEIGHTS.items():
        assert table == goref.CONTENT_WEIGHTS[ct.value], ct
    assert _DEFAULT_WEIGHTS == goref.DEFAULT_WEIGHTS


def test_scalar_helpers_parity():
    rng = np.random.default_rng(5)
    for _ in range(N_TRIALS):
        v1 = float(rng.choice([0.0, rng.normal()]))
        v2 = float(rng.choice([0.0, rng.normal()]))
        assert compare_scalar(v1, v2) == pytest.approx(
            goref.compare_scalar_features(v1, v2), abs=1e-12)
        n = int(rng.integers(0, 6))
        a = rng.normal(size=n)
        b = rng.normal(size=n)
        assert cosine_similarity(a, b) == pytest.approx(
            goref.cosine_similarity(list(a), list(b)), abs=1e-12)
    for s in (0.0, 0.3, 0.6, 0.74999, 0.75, 0.85, 0.949, 0.95, 1.0):
        assert classify_match(s) == goref.classify_match(s)


def test_noise_level_edge_cases():
    """estimateNoiseLevel: empty -> 0.5, single -> 0.0 (comparison.go:938-963)."""
    c = FingerprintComparator()
    from sonido_sonar_tpu.fingerprint.comparison import SimilarityResult
    r = SimilarityResult("a", "b", 0.0, 0.0)
    fp = _make_fp(np.random.default_rng(0), "a", ContentType.UNKNOWN,
                  ExtractedFeatures(), 1.0)
    m = c._quality_metrics(fp, fp, r)
    assert m.noise_level == 0.5
    r.feature_distances = {"mfcc": 0.2}
    m = c._quality_metrics(fp, fp, r)
    assert m.noise_level == 0.0


# ---------------------------------------------------------------------
# content classifier
# ---------------------------------------------------------------------

def test_content_classifier_parity():
    rng = np.random.default_rng(6)
    detector = ContentDetector()
    name_map = {"music": ContentType.MUSIC, "news": ContentType.NEWS,
                "talk": ContentType.TALK, "sports": ContentType.SPORTS}
    n_decided = 0
    for _ in range(N_TRIALS):
        f = AcousticFeatures(
            zero_crossing_rate=float(rng.uniform(0, 0.5)),
            spectral_centroid=float(rng.uniform(0, 6000)),
            energy_variance=float(rng.uniform(0, 1)),
            silence_ratio=float(rng.uniform(0, 1)),
            harmonic_ratio=float(rng.uniform(0, 1)),
            dynamic_range=float(rng.uniform(0, 60)),
            temporal_stability=float(rng.uniform(0, 1)),
        )
        scores, winners, conf = goref.classify_from_features(
            f.zero_crossing_rate, f.spectral_centroid, f.energy_variance,
            f.silence_ratio, f.harmonic_ratio, f.dynamic_range,
            f.temporal_stability)
        got = detector.classify_from_features(f)
        if not winners:
            assert got == ContentType.UNKNOWN, scores
        else:
            # Go resolves max-score ties by random map order; any tied
            # winner is conformant
            assert got in {name_map[w] for w in winners}, scores
            n_decided += 1
        assert f.classification_confidence == pytest.approx(conf, abs=1e-12)
    # the random draw must actually exercise decided classifications
    assert n_decided > N_TRIALS // 4
