"""Device-side batched comparator vs the host float64 comparator.

VERDICT.md round-1 item #2: `batch_compare_device` must equal the host
`compare` (enable_detailed_metrics=False) to ~1e-6 over randomized
corpora, and `find_best_matches` must use it end-to-end.
"""

from __future__ import annotations

import numpy as np
import pytest

from sonido_sonar_tpu.config.config import ComparisonConfig, ContentType
from sonido_sonar_tpu.extractors.features import ExtractedFeatures
from sonido_sonar_tpu.fingerprint.comparison import FingerprintComparator
from sonido_sonar_tpu.fingerprint.device_compare import (
    FEATURE_ORDER,
    comparator_matrix,
    content_weight_vector,
    pack_comparator_stats,
    sharded_batched_similarity,
)

from tests.test_goref_parity import _GROUPS, _make_fp, _random_features

TOL = 2e-6


def _random_corpus(rng, n, content=None, present=None, prefix="fp"):
    fps = []
    for i in range(n):
        if present is None:
            k = int(rng.integers(1, len(_GROUPS) + 1))
            p = set(rng.choice(_GROUPS, size=k, replace=False))
        else:
            p = present
        ct = content or [
            ContentType.NEWS, ContentType.MUSIC, ContentType.SPORTS,
            ContentType.TALK, ContentType.UNKNOWN,
        ][int(rng.integers(0, 5))]
        feats, _ = _random_features(rng, p)
        fps.append(_make_fp(rng, f"{prefix}{i}", ct, feats, float(rng.uniform(5, 90))))
    return fps


@pytest.mark.parametrize("content_filter", [False, True])
def test_device_compare_matches_host(content_filter):
    rng = np.random.default_rng(10)
    comp = FingerprintComparator(
        ComparisonConfig(enable_content_filter=content_filter)
    )
    query = _random_corpus(rng, 1, content=ContentType.NEWS,
                           present=set(_GROUPS))[0]
    cands = _random_corpus(rng, 64)
    got = comp.batch_compare_device(query, cands)
    assert len(got) == len(cands)
    for cand, r in zip(cands, got):
        want = comp.compare(query, cand)
        assert r.overall_similarity == pytest.approx(
            want.overall_similarity, abs=TOL), cand.id
        assert r.feature_similarity == pytest.approx(
            want.feature_similarity, abs=TOL)
        assert r.confidence == pytest.approx(want.confidence, abs=TOL)
        assert r.match_type == want.match_type
        assert r.content_type_match == want.content_type_match
        assert set(r.feature_distances) == set(want.feature_distances)
        for k, v in want.feature_distances.items():
            assert r.feature_distances[k] == pytest.approx(v, abs=TOL), k


def test_device_compare_many_random_pairs():
    """1k random pairs, mixed feature availability (VERDICT item #2
    'done' criterion)."""
    rng = np.random.default_rng(11)
    comp = FingerprintComparator()
    queries = _random_corpus(rng, 10, prefix="q")
    cands = _random_corpus(rng, 100)
    for q in queries:
        got = comp.batch_compare_device(q, cands)
        # spot-check a third of the pairs on the host comparator
        for i in range(0, len(cands), 3):
            try:
                want = comp.compare(q, cands[i])
            except ValueError:
                # no comparable features: the host (like Go) errors and
                # BatchCompare would skip; the device path reports 0
                assert got[i].overall_similarity == 0.0
                continue
            assert got[i].overall_similarity == pytest.approx(
                want.overall_similarity, abs=TOL)
            assert got[i].confidence == pytest.approx(want.confidence, abs=TOL)


def test_find_best_matches_device_end_to_end():
    rng = np.random.default_rng(12)
    comp = FingerprintComparator(ComparisonConfig(similarity_threshold=0.0))
    present = set(_GROUPS)
    query = _random_corpus(rng, 1, content=ContentType.MUSIC, present=present)[0]
    cands = _random_corpus(rng, 40, content=ContentType.MUSIC, present=present)
    dev = comp.find_best_matches(query, cands, max_results=10)
    host = comp.find_best_matches(
        query, cands, max_results=10, use_device_prefilter=False
    )
    assert [m.fingerprint.id for m in dev] == [m.fingerprint.id for m in host]
    for a, b in zip(dev, host):
        assert a.similarity.overall_similarity == pytest.approx(
            b.similarity.overall_similarity, abs=TOL)
        assert a.rank == b.rank


def test_sharded_corpus_matches_unsharded():
    import jax
    from jax.sharding import Mesh

    rng = np.random.default_rng(13)
    query = _random_corpus(rng, 1, present=set(_GROUPS))[0]
    cands = _random_corpus(rng, 30)
    corpus, width = comparator_matrix(cands)
    qv = pack_comparator_stats(query, width)
    wvec = content_weight_vector(query.content_type)
    match = np.ones(len(cands), dtype=bool)

    plain = sharded_batched_similarity(
        qv, corpus, wvec, match, mesh=None, num_mfcc_coeffs=width)
    mesh = Mesh(np.array(jax.devices()), ("data",))
    sharded = sharded_batched_similarity(
        qv, corpus, wvec, match, mesh=mesh, num_mfcc_coeffs=width)
    np.testing.assert_allclose(plain["overall"], sharded["overall"], atol=1e-6)
    np.testing.assert_allclose(plain["confidence"], sharded["confidence"], atol=1e-6)
    assert (plain["match_class"] == sharded["match_class"]).all()


def test_skip_self_and_none():
    rng = np.random.default_rng(14)
    comp = FingerprintComparator(ComparisonConfig(similarity_threshold=0.0))
    present = set(_GROUPS)
    query = _random_corpus(rng, 1, present=present, prefix="q")[0]
    cands = _random_corpus(rng, 5, present=present)
    matches = comp.find_best_matches(query, [None, query] + cands)
    ids = {m.fingerprint.id for m in matches}
    assert query.id not in ids
    assert len(matches) == 5
