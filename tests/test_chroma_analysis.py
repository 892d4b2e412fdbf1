"""Chroma vector/sequence analysis, pitch-class relations, tonnetz."""

import jax.numpy as jnp
import numpy as np
import pytest

from sonido_sonar_tpu.ops.chroma import CHROMA_LABELS
from sonido_sonar_tpu.ops import chroma_analysis as CA


def cv(labels, weights=None):
    v = np.zeros(12, np.float32)
    for i, lab in enumerate(labels):
        v[CHROMA_LABELS.index(lab)] = weights[i] if weights else 1.0
    return v / v.sum()


def test_chroma_stats():
    uniform = jnp.ones(12) / 12
    s = CA.chroma_stats(uniform)
    assert float(s["entropy"]) == pytest.approx(np.log2(12), abs=1e-4)
    assert float(s["sparsity"]) == pytest.approx(0.0, abs=0.05)
    single = jnp.asarray(cv(["C"]))
    s2 = CA.chroma_stats(single)
    assert float(s2["entropy"]) == pytest.approx(0.0, abs=1e-5)
    assert float(s2["sparsity"]) == pytest.approx(1.0, abs=0.05)
    assert float(s2["centroid"]) == pytest.approx(0.0, abs=0.1)


def test_chroma_distances():
    a = jnp.asarray(cv(["C", "E", "G"]))
    b = jnp.asarray(cv(["C", "E", "G"]))
    c = jnp.asarray(cv(["C#", "F", "G#"]))
    for m in ("cosine", "euclidean", "correlation", "kl", "js", "hellinger"):
        assert float(CA.chroma_distance(a, b, m)) == pytest.approx(0.0, abs=1e-4), m
        assert float(CA.chroma_distance(a, c, m)) > 0.1, m


def test_optimal_transposition():
    a = jnp.asarray(cv(["C", "E", "G"]))
    b = jnp.asarray(np.roll(cv(["C", "E", "G"]), 5))  # transposed up 5
    shift, sim = CA.optimal_transposition(a, b)
    assert shift == 5
    assert sim == pytest.approx(1.0, abs=1e-5)


def test_smooth_and_template():
    seq = jnp.asarray(np.stack([cv(["C"]), cv(["C"]), cv(["G"]), cv(["C"])]))
    sm = np.asarray(CA.smooth_chroma(seq, 3))
    assert sm.shape == (4, 12)
    tpl = np.asarray(CA.chroma_template(seq))
    assert tpl.sum() == pytest.approx(1.0, abs=1e-5)
    assert tpl[CHROMA_LABELS.index("C")] > tpl[CHROMA_LABELS.index("G")]


@pytest.mark.parametrize("method", ["direct", "binary", "smith_waterman", "dtw", "qmax", "oti"])
def test_sequence_similarity_self_vs_other(method):
    rng = np.random.default_rng(0)
    seq = np.abs(rng.standard_normal((20, 12))).astype(np.float32)
    seq /= seq.sum(axis=1, keepdims=True)
    other = np.abs(rng.standard_normal((20, 12))).astype(np.float32)
    other /= other.sum(axis=1, keepdims=True)
    css = CA.ChromaSequenceSimilarity(method)
    self_sim = css.compute(jnp.asarray(seq), jnp.asarray(seq)).overall_similarity
    other_sim = css.compute(jnp.asarray(seq), jnp.asarray(other)).overall_similarity
    assert self_sim > other_sim, method


def test_oti_recovers_transposition():
    rng = np.random.default_rng(1)
    seq = np.abs(rng.standard_normal((16, 12))).astype(np.float32)
    transposed = np.roll(seq, 4, axis=1)
    res = CA.ChromaSequenceSimilarity("oti").compute(
        jnp.asarray(seq), jnp.asarray(transposed)
    )
    assert res.best_transposition == 4
    # after the optimal shift, matched frames (the diagonal) are identical
    assert float(np.diag(res.similarity_matrix).mean()) > 0.99


def test_dtw_similarity_banded():
    rng = np.random.default_rng(2)
    seq = np.abs(rng.standard_normal((24, 12))).astype(np.float32)
    css = CA.ChromaSequenceSimilarity("dtw", dtw_band_radius=5)
    res = css.compute(jnp.asarray(seq), jnp.asarray(seq))
    assert res.overall_similarity > 0.9


def test_circle_of_fifths():
    C, G, Fs = 0, 7, 6
    assert CA.fifths_distance(C, G) == 1
    assert CA.fifths_distance(C, C) == 0
    assert CA.fifths_distance(C, Fs) == 6  # tritone = farthest


def test_key_relationships():
    C, G, F, A = 0, 7, 5, 9
    assert CA.key_relationship(C, "major", C, "major") == "identical"
    assert CA.key_relationship(C, "major", C, "minor") == "parallel"
    assert CA.key_relationship(C, "major", A, "minor") == "relative"
    assert CA.key_relationship(C, "major", G, "major") == "dominant"
    assert CA.key_relationship(C, "major", F, "major") == "subdominant"
    assert CA.key_relationship(C, "major", 6, "major") == "distant"


def test_diatonic_membership():
    assert CA.diatonic_membership(4, 0, "major")      # E in C major
    assert not CA.diatonic_membership(1, 0, "major")  # C# not in C major
    assert CA.diatonic_membership(3, 0, "minor")      # Eb in C minor


def test_tonal_centroid_properties():
    c_maj = jnp.asarray(cv(["C", "E", "G"]))
    g_maj = jnp.asarray(cv(["G", "B", "D"]))
    fs_maj = jnp.asarray(cv(["F#", "A#", "C#"]))
    tc = CA.tonal_centroid(c_maj)
    assert tc.shape == (6,)
    # related keys are closer in centroid space than distant ones
    d_cg = float(jnp.linalg.norm(CA.tonal_centroid(c_maj) - CA.tonal_centroid(g_maj)))
    d_cfs = float(jnp.linalg.norm(CA.tonal_centroid(c_maj) - CA.tonal_centroid(fs_maj)))
    assert d_cg < d_cfs


def test_tonnetz_trajectory():
    seq = jnp.asarray(np.stack([cv(["C", "E", "G"])] * 10))
    out = CA.tonnetz_trajectory(seq)
    assert float(out["path_length"]) == pytest.approx(0.0, abs=1e-5)
    assert float(out["stability"]) == pytest.approx(1.0, abs=1e-4)


def test_tension_and_consonance():
    c_maj = jnp.asarray(cv(["C", "E", "G"]))
    cluster = jnp.asarray(cv(["C", "C#", "D"]))  # chromatic cluster
    assert float(CA.harmonic_tension(cluster)) > float(CA.harmonic_tension(c_maj))
    assert float(CA.consonance(c_maj)) > float(CA.consonance(cluster))


def test_voice_leading():
    c_maj = jnp.asarray(cv(["C", "E", "G"]))
    same = float(CA.voice_leading_distance(c_maj, c_maj))
    to_g = float(CA.voice_leading_distance(c_maj, jnp.asarray(cv(["G", "B", "D"]))))
    to_far = float(CA.voice_leading_distance(c_maj, jnp.asarray(cv(["C#", "F", "G#"]))))
    assert same == pytest.approx(0.0, abs=1e-6)
    assert to_g > same
    assert to_far > 0
