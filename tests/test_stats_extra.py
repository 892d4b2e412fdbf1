"""distance / entropy / moments / percentiles / clustering tests."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from sonido_sonar_tpu.ops.stats import clustering as C
from sonido_sonar_tpu.ops.stats import distance as D
from sonido_sonar_tpu.ops.stats import entropy as E
from sonido_sonar_tpu.ops.stats import moments as M
from sonido_sonar_tpu.ops.stats import percentiles as P


# ------------------------------ distance ------------------------------

def test_distance_metrics_basic():
    a = jnp.asarray(np.array([1.0, 0.0, 0.0], np.float32))
    b = jnp.asarray(np.array([0.0, 1.0, 0.0], np.float32))
    assert float(D.euclidean(a, b)) == pytest.approx(math.sqrt(2))
    assert float(D.manhattan(a, b)) == pytest.approx(2.0)
    assert float(D.chebyshev(a, b)) == pytest.approx(1.0)
    assert float(D.cosine(a, b)) == pytest.approx(1.0)
    assert float(D.cosine(a, a)) == pytest.approx(0.0, abs=1e-6)
    assert float(D.hamming(a, b)) == pytest.approx(2 / 3)
    assert float(D.minkowski(a, b, 2.0)) == pytest.approx(math.sqrt(2), rel=1e-5)


def test_divergences():
    p = jnp.asarray(np.array([0.5, 0.5, 0.0], np.float32))
    q = jnp.asarray(np.array([0.25, 0.25, 0.5], np.float32))
    assert float(D.kl_divergence(p, p)) == pytest.approx(0.0, abs=1e-6)
    assert float(D.js_divergence(p, q)) > 0
    assert float(D.js_divergence(p, q)) == pytest.approx(float(D.js_divergence(q, p)), abs=1e-6)
    assert float(D.hellinger(p, p)) == pytest.approx(0.0, abs=1e-4)
    assert 0 < float(D.hellinger(p, q)) <= 1.0
    assert float(D.bhattacharyya(p, p)) == pytest.approx(0.0, abs=1e-6)


def test_emd_1d():
    p = jnp.asarray(np.array([1.0, 0.0, 0.0, 0.0], np.float32))
    q = jnp.asarray(np.array([0.0, 0.0, 0.0, 1.0], np.float32))
    assert float(D.emd_1d(p, q)) == pytest.approx(3.0)  # move 1 mass 3 bins


def test_mahalanobis_identity_cov():
    a = jnp.asarray(np.array([1.0, 2.0], np.float32))
    b = jnp.asarray(np.array([4.0, 6.0], np.float32))
    inv_cov = jnp.eye(2)
    assert float(D.mahalanobis(a, b, inv_cov)) == pytest.approx(5.0)


def test_distance_matrix_and_knn():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((10, 4)).astype(np.float32)
    dm = np.asarray(D.distance_matrix(jnp.asarray(x), jnp.asarray(x)))
    assert dm.shape == (10, 10)
    np.testing.assert_allclose(np.diag(dm), 0.0, atol=1e-2)
    idx, dist = D.knn(jnp.asarray(x[3]), jnp.asarray(x), k=3)
    assert int(idx[0]) == 3


def test_registry():
    assert D.get_distance_function("euclidean") is D.euclidean
    with pytest.raises(ValueError):
        D.get_distance_function("nope")


# ------------------------------ entropy -------------------------------

def test_shannon_uniform():
    p = jnp.ones(8) / 8
    assert float(E.shannon_entropy(p)) == pytest.approx(3.0, abs=1e-5)
    assert float(E.min_entropy(p)) == pytest.approx(3.0, abs=1e-5)
    assert float(E.hartley_entropy(p)) == pytest.approx(3.0, abs=1e-5)
    assert float(E.renyi_entropy(p, 2.0)) == pytest.approx(3.0, abs=1e-5)


def test_entropy_degenerate():
    p = jnp.asarray(np.array([1.0, 0, 0, 0], np.float32))
    assert float(E.shannon_entropy(p)) == pytest.approx(0.0, abs=1e-6)
    assert float(E.tsallis_entropy(p, 2.0)) == pytest.approx(0.0, abs=1e-6)


def test_bin_selectors():
    x = np.random.default_rng(0).standard_normal(1000)
    assert E.sturges_bins(1000) == 11
    assert E.select_bins(x, "rice") == E.rice_bins(1000)
    assert E.select_bins(x, "scott") > 3
    assert E.select_bins(x, "fd") > 3
    assert E.select_bins(x, "sqrt") == 32


def test_analyze_profile():
    x = np.random.default_rng(1).standard_normal(500)
    prof = E.analyze(x)
    assert 0 < prof["normalized"] <= 1.0
    assert prof["shannon"] >= prof["renyi_2"] - 1e-5  # Renyi decreasing in alpha
    assert prof["renyi_2"] >= prof["min"] - 1e-5


def test_entropy_rate():
    # deterministic alternation -> rate 0; iid uniform 2 symbols -> 1 bit
    alt = np.tile([0, 1], 500)
    assert E.entropy_rate(alt, 2) == pytest.approx(0.0, abs=1e-9)
    rng = np.random.default_rng(2)
    iid = rng.integers(0, 2, 20000)
    assert E.entropy_rate(iid, 2) == pytest.approx(1.0, abs=0.02)


def test_conditional_entropy():
    # independent: H(Y|X) = H(Y)
    joint = jnp.asarray(np.full((2, 2), 0.25, np.float32))
    assert float(E.conditional_entropy(joint)) == pytest.approx(1.0, abs=1e-5)
    # deterministic: H(Y|X) = 0
    joint2 = jnp.asarray(np.array([[0.5, 0.0], [0.0, 0.5]], np.float32))
    assert float(E.conditional_entropy(joint2)) == pytest.approx(0.0, abs=1e-6)


# ------------------------------ moments -------------------------------

def test_moments_against_numpy():
    x = np.random.default_rng(3).standard_normal(2000).astype(np.float32)
    xj = jnp.asarray(x)
    assert float(M.mean(xj)) == pytest.approx(x.mean(), abs=1e-4)
    assert float(M.variance(xj)) == pytest.approx(x.var(ddof=1), rel=1e-3)
    assert float(M.skewness(xj)) == pytest.approx(0.0, abs=0.15)
    assert float(M.kurtosis(xj)) == pytest.approx(0.0, abs=0.3)


def test_welford_matches_classic():
    x = np.random.default_rng(4).standard_normal(500)
    w = M.welford(x)
    assert w["mean"] == pytest.approx(x.mean(), abs=1e-12)
    assert w["variance"] == pytest.approx(x.var(ddof=1), rel=1e-10)


def test_skewed_distribution():
    x = np.random.default_rng(5).exponential(1.0, 5000).astype(np.float32)
    assert float(M.skewness(jnp.asarray(x))) == pytest.approx(2.0, abs=0.4)
    assert float(M.kurtosis(jnp.asarray(x))) == pytest.approx(6.0, abs=2.5)
    assert float(M.bowley_skewness(jnp.asarray(x))) > 0


def test_l_moments_normal():
    x = np.random.default_rng(6).standard_normal(5000)
    lm = M.l_moments(x)
    assert lm["l1"] == pytest.approx(0.0, abs=0.05)
    # for normal: l2 = sigma/sqrt(pi) ~ 0.5642
    assert lm["l2"] == pytest.approx(0.5642, abs=0.03)
    assert lm["t3"] == pytest.approx(0.0, abs=0.03)   # L-skewness
    assert lm["t4"] == pytest.approx(0.1226, abs=0.03)  # L-kurtosis of normal


def test_cumulants():
    x = np.random.default_rng(7).standard_normal(20000).astype(np.float32)
    c = M.cumulants(jnp.asarray(x))
    assert float(c["k2"]) == pytest.approx(1.0, abs=0.05)
    assert float(c["k4"]) == pytest.approx(0.0, abs=0.15)


# ------------------------------ percentiles ---------------------------

def test_quantile_methods_differ():
    x = np.arange(1, 11, dtype=np.float64)
    linear = P.calculate_percentile(x, 25, "linear")
    weibull = P.calculate_percentile(x, 25, "weibull")
    assert linear == pytest.approx(3.25)
    assert weibull != linear
    for m in P._HF_METHODS:
        v = P.calculate_percentile(x, 50, m)
        assert 5.0 <= v <= 6.0


def test_outlier_fences():
    x = np.concatenate([np.random.default_rng(8).standard_normal(100), [10.0, -10.0]])
    f = P.outlier_fences(x)
    assert f["num_outliers"] >= 2
    assert f["q1"] < f["median"] < f["q3"]


def test_summary():
    s = P.analyze(np.arange(101, dtype=np.float64))
    assert s["median"] == pytest.approx(50.0)
    assert s["p95"] == pytest.approx(95.0)
    assert s["trimean"] == pytest.approx(50.0)


# ------------------------------ clustering ----------------------------

def test_kmeans_separable():
    rng = np.random.default_rng(9)
    a = rng.standard_normal((50, 2)) + [0, 0]
    b = rng.standard_normal((50, 2)) + [10, 10]
    c = rng.standard_normal((50, 2)) + [-10, 10]
    x = np.concatenate([a, b, c]).astype(np.float32)
    res = C.Clustering("kmeans", num_clusters=3, seed=1).fit(x)
    # all samples in a group share a label
    for grp in (res.labels[:50], res.labels[50:100], res.labels[100:]):
        assert len(np.unique(grp)) == 1
    assert len(np.unique(res.labels)) == 3
    assert res.silhouette > 0.7
    assert res.inertia < 1000


def test_kmeans_unknown_algorithm():
    with pytest.raises(NotImplementedError):
        C.Clustering("dbscan")
