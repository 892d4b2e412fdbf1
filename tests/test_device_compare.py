"""Device-side batched comparator vs the host float64 comparator.

VERDICT.md round-1 item #2: `batch_compare_device` must equal the host
`compare` (enable_detailed_metrics=False) to ~1e-6 over randomized
corpora, and `find_best_matches` must use it end-to-end.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest

from sonido_sonar_tpu.config.config import ComparisonConfig, ContentType
from sonido_sonar_tpu.extractors.features import ExtractedFeatures
from sonido_sonar_tpu.fingerprint.comparison import FingerprintComparator
from sonido_sonar_tpu.fingerprint.device_compare import (
    PackedCorpus,
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


@pytest.mark.parametrize("content_filter", [False, True])
def test_device_detailed_metrics_match_host(content_filter):
    """VERDICT round-2 item #5: the EnableDetailedMetrics quality chain
    (comparison.go:892-1008) on device must agree with the host float64
    path — including mixed-availability corpora, constant series (NaN
    Pearson skipped), and zero dynamic range."""
    rng = np.random.default_rng(21)
    comp = FingerprintComparator(
        ComparisonConfig(
            enable_detailed_metrics=True, enable_content_filter=content_filter
        )
    )
    query = _random_corpus(rng, 1, content=ContentType.MIXED,
                           present=set(_GROUPS), prefix="q")[0]
    cands = _random_corpus(rng, 64)
    # exercise the degenerate branches: a constant centroid series
    # (host corrcoef -> NaN -> skipped) on one candidate
    sf = cands[0].features.spectral_features
    if sf is not None and sf.spectral_centroid is not None:
        sf.spectral_centroid = np.full_like(
            np.asarray(sf.spectral_centroid, dtype=np.float64), 1234.5
        )
    got = comp.batch_compare_device(query, cands)
    for cand, r in zip(cands, got):
        want = comp.compare(query, cand)
        assert r.overall_similarity == pytest.approx(
            want.overall_similarity, abs=TOL), cand.id
        if want.quality_metrics is None:
            assert r.quality_metrics is None
            continue
        qm, wm = r.quality_metrics, want.quality_metrics
        assert qm.data_availability == pytest.approx(wm.data_availability, abs=TOL)
        assert qm.feature_coverage == pytest.approx(wm.feature_coverage, abs=TOL)
        assert qm.temporal_alignment == pytest.approx(
            wm.temporal_alignment, abs=1e-5)
        assert qm.noise_level == pytest.approx(wm.noise_level, abs=1e-5)
        assert qm.dynamic_range_match == pytest.approx(
            wm.dynamic_range_match, abs=1e-5)
        # float32 centered two-pass vs float64 corrcoef
        assert qm.spectral_coherence == pytest.approx(
            wm.spectral_coherence, abs=2e-4), cand.id
        assert r.confidence == pytest.approx(want.confidence, abs=1e-5)


def test_find_best_matches_detailed_stays_on_device(monkeypatch):
    """Mixed-content default config (EnableDetailedMetrics ON,
    config.go:151) must never fall back to the host per-pair loop."""
    rng = np.random.default_rng(22)
    comp = FingerprintComparator(
        ComparisonConfig(enable_detailed_metrics=True, similarity_threshold=0.0)
    )
    query = _random_corpus(rng, 1, present=set(_GROUPS), prefix="q")[0]
    cands = _random_corpus(rng, 24, present=set(_GROUPS))

    def _boom(*a, **k):  # host loop must not run
        raise AssertionError("detailed-metrics config routed to host loop")

    monkeypatch.setattr(comp, "batch_compare", _boom)
    dev = comp.find_best_matches(query, cands, max_results=10)
    assert len(dev) == 10
    host = FingerprintComparator(
        ComparisonConfig(enable_detailed_metrics=True, similarity_threshold=0.0)
    ).find_best_matches(query, cands, max_results=10, use_device_prefilter=False)
    assert [m.fingerprint.id for m in dev] == [m.fingerprint.id for m in host]
    for a, b in zip(dev, host):
        assert a.similarity.confidence == pytest.approx(
            b.similarity.confidence, abs=1e-5)
        assert a.similarity.quality_metrics is not None


def test_sharded_detailed_matches_unsharded():
    import jax
    from jax.sharding import Mesh

    rng = np.random.default_rng(23)
    comp = FingerprintComparator(ComparisonConfig(enable_detailed_metrics=True))
    query = _random_corpus(rng, 1, present=set(_GROUPS), prefix="q")[0]
    cands = _random_corpus(rng, 30)
    plain = comp.batch_compare_device(query, cands)
    mesh = Mesh(np.array(jax.devices()), ("data",))
    sharded = comp.batch_compare_device(query, cands, mesh=mesh)
    for a, b in zip(plain, sharded):
        assert a.overall_similarity == pytest.approx(b.overall_similarity, abs=1e-6)
        assert a.confidence == pytest.approx(b.confidence, abs=1e-6)
        if a.quality_metrics is not None:
            assert b.quality_metrics is not None
            assert a.quality_metrics.spectral_coherence == pytest.approx(
                b.quality_metrics.spectral_coherence, abs=1e-6)


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


def test_constant_series_rounding_noise_excluded():
    """A series the host sees as exactly constant (float64 var 0 -> NaN
    corr -> skipped) must ALSO be skipped by the float32 device kernel,
    even when mean-subtraction rounding gives it a tiny nonzero
    variance. Found on-chip (round 3 verify): a pure tone's pinned
    rolloff at 818.3 over ~430 frames slipped past `vx > 0` and halved
    the coherence mean. 1234.5 (exactly representable, short series)
    does NOT reproduce — this constant/length combination does."""
    rng = np.random.default_rng(33)
    comp = FingerprintComparator(ComparisonConfig(enable_detailed_metrics=True))
    query = _random_corpus(rng, 1, content=ContentType.MUSIC,
                           present={"spectral"}, prefix="q")[0]
    cand = _random_corpus(rng, 1, content=ContentType.MUSIC,
                          present={"spectral"})[0]
    T = 430
    qsf, csf = query.features.spectral_features, cand.features.spectral_features
    qsf.spectral_centroid = rng.uniform(4000, 6000, size=T)
    qsf.spectral_rolloff = 732.0 + rng.normal(0, 1.5, size=T)
    qsf.spectral_flux = rng.uniform(0, 2, size=T)
    csf.spectral_centroid = rng.uniform(4000, 6000, size=T)
    csf.spectral_rolloff = np.full(T, 818.2999877929688)  # host var == 0
    csf.spectral_flux = rng.uniform(0, 2, size=T)

    want = comp.compare(query, cand).quality_metrics
    got = comp.batch_compare_device(query, [cand])[0].quality_metrics
    # host: rolloff skipped (NaN), mean over centroid only
    assert got.spectral_coherence == pytest.approx(
        want.spectral_coherence, abs=2e-4)


@pytest.mark.parametrize("content_filter", [False, True])
def test_multi_query_matches_single(content_filter):
    """batched_similarity_multi row i == batched_similarity(query i):
    the one-dispatch fleet search must be a pure reshape of the
    single-query chain, gates and weights included."""
    import jax

    from sonido_sonar_tpu.fingerprint.device_compare import (
        batched_similarity,
        batched_similarity_multi,
    )

    rng = np.random.default_rng(21)
    queries = _random_corpus(rng, 6, prefix="q")
    cands = _random_corpus(rng, 97)
    corpus, k = comparator_matrix(cands)
    qmat, _ = comparator_matrix(queries, num_mfcc_coeffs=k)
    weights = np.stack(
        [content_weight_vector(q.content_type) for q in queries]
    )
    q_codes = np.array(
        [list(ContentType).index(q.content_type) for q in queries], np.int32
    )
    c_codes = np.array(
        [list(ContentType).index(c.content_type) for c in cands], np.int32
    )
    multi = jax.device_get(
        batched_similarity_multi(
            qmat, corpus, weights, q_codes, c_codes,
            num_mfcc_coeffs=k, content_filter=content_filter,
        )
    )
    for i, q in enumerate(queries):
        single = jax.device_get(
            batched_similarity(
                qmat[i], corpus, weights[i], q_codes[i] == c_codes,
                num_mfcc_coeffs=k, content_filter=content_filter,
            )
        )
        np.testing.assert_allclose(
            multi["overall"][i], single["overall"], atol=TOL, rtol=0)
        np.testing.assert_allclose(
            multi["confidence"][i], single["confidence"], atol=TOL, rtol=0)
        np.testing.assert_array_equal(
            multi["match_class"][i], single["match_class"])
        np.testing.assert_allclose(
            multi["feature_sims"][i], single["feature_sims"], atol=TOL, rtol=0)
        np.testing.assert_array_equal(
            multi["feature_present"][i], single["feature_present"])


def test_find_best_matches_multi_end_to_end():
    """find_best_matches_multi == per-query find_best_matches (ids,
    ranks, similarities) for a fleet of queries over one corpus."""
    rng = np.random.default_rng(22)
    comp = FingerprintComparator(ComparisonConfig(similarity_threshold=0.1))
    queries = _random_corpus(rng, 4, prefix="q")
    # include one query that is ALSO in the corpus (self-exclusion)
    cands = _random_corpus(rng, 50) + [queries[0]]
    multi = comp.find_best_matches_multi(queries, [None] + cands)
    assert len(multi) == len(queries)
    for q, got in zip(queries, multi):
        want = comp.find_best_matches(q, [None] + cands)
        assert [m.fingerprint.id for m in got] == [
            m.fingerprint.id for m in want
        ]
        for g, w in zip(got, want):
            assert g.rank == w.rank
            assert g.similarity.overall_similarity == pytest.approx(
                w.similarity.overall_similarity, abs=TOL)
            assert g.similarity.confidence == pytest.approx(
                w.similarity.confidence, abs=TOL)
            assert g.similarity.match_type == w.similarity.match_type
            assert g.similarity.feature_distances.keys() == (
                w.similarity.feature_distances.keys())


def test_search_corpus_matches_host_path():
    """Pre-packed top-k search == the host per-pair loop (feature
    distances and ranks included), with the query present in the corpus
    (self-skip) — VERDICT r3 item #3."""
    rng = np.random.default_rng(21)
    comp = FingerprintComparator(ComparisonConfig(similarity_threshold=0.0))
    present = set(_GROUPS)
    query = _random_corpus(rng, 1, content=ContentType.NEWS, present=present)[0]
    cands = _random_corpus(rng, 48, content=ContentType.NEWS, present=present)
    packed = PackedCorpus.build([query] + cands)  # self included
    got = comp.search_corpus(query, packed, max_results=8)
    want = comp.find_best_matches(
        query, cands, max_results=8, use_device_prefilter=False
    )
    assert [m.fingerprint.id for m in got] == [m.fingerprint.id for m in want]
    for a, b in zip(got, want):
        assert a.similarity.overall_similarity == pytest.approx(
            b.similarity.overall_similarity, abs=TOL)
        assert a.rank == b.rank
        assert set(a.similarity.feature_distances) == set(
            b.similarity.feature_distances)
        for k, v in b.similarity.feature_distances.items():
            assert a.similarity.feature_distances[k] == pytest.approx(
                v, abs=TOL), k


def test_topk_multi_matches_full_multi():
    """Fleet top-k selection returns the same winners as the full [Q, C]
    program, fetching only [Q, k] rows."""
    import jax

    from sonido_sonar_tpu.fingerprint.device_compare import (
        batched_similarity_multi, topk_similarity_multi)

    rng = np.random.default_rng(22)
    queries = _random_corpus(rng, 4, prefix="q", present=set(_GROUPS))
    cands = _random_corpus(rng, 200)
    corpus, width = comparator_matrix(cands)
    qmat, _ = comparator_matrix(queries, num_mfcc_coeffs=width)
    wmat = np.tile(
        np.array([0.35, 0.25, 0.10, 0.20, 0.10, 0.10], np.float32), (4, 1))
    q_codes = jnp.asarray(np.zeros(4, np.int32))
    c_codes = jnp.asarray(np.zeros(len(cands), np.int32))
    full = jax.device_get(batched_similarity_multi(
        jnp.asarray(qmat), jnp.asarray(corpus), jnp.asarray(wmat),
        q_codes, c_codes, num_mfcc_coeffs=width))
    topk = jax.device_get(topk_similarity_multi(
        jnp.asarray(qmat), jnp.asarray(corpus), jnp.asarray(wmat),
        q_codes, c_codes, k=5, num_mfcc_coeffs=width))
    for qi in range(4):
        order = np.argsort(-full["overall"][qi], kind="stable")[:5]
        np.testing.assert_allclose(
            topk["overall"][qi], full["overall"][qi][order], atol=1e-6)
        # winners agree as sets (ties may reorder between the two sorts)
        assert set(np.round(topk["overall"][qi], 5)) == set(
            np.round(full["overall"][qi][order], 5))
        for row, ci in enumerate(topk["index"][qi]):
            np.testing.assert_allclose(
                topk["feature_sims"][qi, row],
                full["feature_sims"][qi, ci], atol=1e-6)


def test_packed_corpus_from_batch_matches_host_pack():
    """PackedCorpus.from_batch (device-side packing of a device-resident
    FingerprintBatch) equals PackedCorpus.build over the materialized
    fingerprints."""
    from sonido_sonar_tpu.config.config import FeatureConfig, FingerprintConfig
    from sonido_sonar_tpu.fingerprint import FingerprintGenerator
    from sonido_sonar_tpu.io.audio import AudioData, AudioMetadata
    from sonido_sonar_tpu.io.synth import speech_like

    sr = 22050
    gen = FingerprintGenerator(FingerprintConfig(
        feature_config=FeatureConfig(
            sample_rate=sr, window_size=1024, hop_size=256)))
    audios = [
        AudioData(
            pcm=speech_like(2.0, sr, seed=s),
            sample_rate=sr,
            metadata=AudioMetadata(genre="talk radio"),
        )
        for s in (1, 2, 3)
    ]
    fb = gen.generate_fingerprints_batch(audios, materialize=False)
    dev = PackedCorpus.from_batch(fb, 13)
    host = PackedCorpus.build(fb.materialize(), 13)
    assert dev.width == host.width
    scale = np.maximum(np.abs(np.asarray(host.matrix)), 1.0)
    np.testing.assert_allclose(
        np.asarray(dev.matrix) / scale,
        np.asarray(host.matrix) / scale, atol=2e-4)
    np.testing.assert_array_equal(
        np.asarray(dev.codes), np.asarray(host.codes))


def test_search_corpus_stream_matches_sequential():
    """The pipelined stream yields the same matches, in input order, as
    one-at-a-time search_corpus."""
    rng = np.random.default_rng(23)
    comp = FingerprintComparator(ComparisonConfig(similarity_threshold=0.0))
    present = set(_GROUPS)
    queries = _random_corpus(rng, 6, prefix="q", present=present,
                             content=ContentType.MUSIC)
    cands = _random_corpus(rng, 64, content=ContentType.MUSIC,
                           present=present)
    packed = PackedCorpus.build(cands)
    streamed = list(comp.search_corpus_stream(
        queries, packed, max_results=5, depth=2))
    assert len(streamed) == len(queries)
    for q, got in zip(queries, streamed):
        want = comp.search_corpus(q, packed, max_results=5)
        assert [m.fingerprint.id for m in got] == [
            m.fingerprint.id for m in want]
        for a, b in zip(got, want):
            assert a.similarity.overall_similarity == pytest.approx(
                b.similarity.overall_similarity, abs=1e-7)
