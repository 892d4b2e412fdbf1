"""Statistical moments.

Reference parity: algorithms/stats/moments.go:10-625 — mean/variance
(classic + Welford streaming), skewness (moment-based + Pearson's
mode/median variants + Bowley quartile skewness), kurtosis (excess),
raw/central/standardized/absolute moments, L-moments (l1..l4 + ratios),
cumulants (k1..k4).
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

_EPS = 1e-12


def mean(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(x, axis=-1)


def variance(x: jnp.ndarray, sample: bool = True) -> jnp.ndarray:
    """Sample (N-1) by default, matching gonum/the reference."""
    n = x.shape[-1]
    m = jnp.mean(x, axis=-1, keepdims=True)
    ss = jnp.sum((x - m) ** 2, axis=-1)
    return ss / max(n - 1, 1) if sample else ss / n


def raw_moment(x: jnp.ndarray, k: int) -> jnp.ndarray:
    return jnp.mean(x**k, axis=-1)


def central_moment(x: jnp.ndarray, k: int) -> jnp.ndarray:
    m = jnp.mean(x, axis=-1, keepdims=True)
    return jnp.mean((x - m) ** k, axis=-1)


def standardized_moment(x: jnp.ndarray, k: int) -> jnp.ndarray:
    m2 = central_moment(x, 2)
    mk = central_moment(x, k)
    return jnp.where(m2 > _EPS, mk / jnp.maximum(m2, _EPS) ** (k / 2.0), 0.0)


def absolute_moment(x: jnp.ndarray, k: int) -> jnp.ndarray:
    m = jnp.mean(x, axis=-1, keepdims=True)
    return jnp.mean(jnp.abs(x - m) ** k, axis=-1)


def skewness(x: jnp.ndarray) -> jnp.ndarray:
    """Moment-based (g1) skewness."""
    return standardized_moment(x, 3)


def pearson_skewness(x: jnp.ndarray) -> jnp.ndarray:
    """Pearson's second coefficient: 3(mean - median)/std."""
    m = jnp.mean(x, axis=-1)
    med = jnp.median(x, axis=-1)
    s = jnp.sqrt(variance(x, sample=False))
    return jnp.where(s > _EPS, 3.0 * (m - med) / jnp.maximum(s, _EPS), 0.0)


def bowley_skewness(x: jnp.ndarray) -> jnp.ndarray:
    """Quartile skewness (Q3 + Q1 - 2 Q2)/(Q3 - Q1)."""
    q1 = jnp.quantile(x, 0.25, axis=-1)
    q2 = jnp.quantile(x, 0.50, axis=-1)
    q3 = jnp.quantile(x, 0.75, axis=-1)
    iqr = q3 - q1
    return jnp.where(iqr > _EPS, (q3 + q1 - 2 * q2) / jnp.maximum(iqr, _EPS), 0.0)


def kurtosis(x: jnp.ndarray, excess: bool = True) -> jnp.ndarray:
    k = standardized_moment(x, 4)
    return k - 3.0 if excess else k


def welford(x: np.ndarray) -> Dict[str, float]:
    """Streaming mean/variance (Welford, moments.go Welford variant).
    Host-side: validates numerical agreement with the batched path."""
    mean_ = 0.0
    m2 = 0.0
    n = 0
    for v in np.asarray(x, dtype=np.float64):
        n += 1
        delta = v - mean_
        mean_ += delta / n
        m2 += delta * (v - mean_)
    var = m2 / (n - 1) if n > 1 else 0.0
    return {"mean": mean_, "variance": var, "count": n}


def l_moments(x: np.ndarray) -> Dict[str, float]:
    """First four L-moments + ratios (moments.go L-moments), via the
    direct order-statistics formula."""
    xs = np.sort(np.asarray(x, dtype=np.float64))
    n = len(xs)
    if n < 4:
        return {"l1": float(np.mean(xs)) if n else 0.0, "l2": 0.0, "l3": 0.0,
                "l4": 0.0, "t3": 0.0, "t4": 0.0}
    i = np.arange(n)

    def comb(a, b):
        from math import comb as c

        return np.array([c(int(v), b) for v in a], dtype=np.float64)

    c1 = comb(i, 1)
    c2 = comb(i, 2)
    c3 = comb(i, 3)
    r1 = comb(n - 1 - i, 1)
    r2 = comb(n - 1 - i, 2)
    r3 = comb(n - 1 - i, 3)
    from math import comb as mcomb

    b0 = xs.mean()
    b1 = np.sum(c1 * xs) / (n * mcomb(n - 1, 1))
    b2 = np.sum(c2 * xs) / (n * mcomb(n - 1, 2))
    b3 = np.sum(c3 * xs) / (n * mcomb(n - 1, 3))
    l1 = b0
    l2 = 2 * b1 - b0
    l3 = 6 * b2 - 6 * b1 + b0
    l4 = 20 * b3 - 30 * b2 + 12 * b1 - b0
    t3 = l3 / l2 if abs(l2) > _EPS else 0.0
    t4 = l4 / l2 if abs(l2) > _EPS else 0.0
    return {"l1": float(l1), "l2": float(l2), "l3": float(l3), "l4": float(l4),
            "t3": float(t3), "t4": float(t4)}


def cumulants(x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """First four cumulants (moments.go cumulants): k1 = mean,
    k2 = m2, k3 = m3, k4 = m4 - 3 m2^2 (central-moment identities)."""
    m = jnp.mean(x, axis=-1)
    m2 = central_moment(x, 2)
    m3 = central_moment(x, 3)
    m4 = central_moment(x, 4)
    return {"k1": m, "k2": m2, "k3": m3, "k4": m4 - 3.0 * m2 * m2}


def analyze(x) -> Dict[str, float]:
    """Moments.Analyze (moments.go:10-150): full moment profile."""
    xj = jnp.asarray(np.asarray(x, dtype=np.float32))
    out = {
        "mean": float(mean(xj)),
        "variance": float(variance(xj)),
        "std": float(jnp.sqrt(variance(xj))),
        "skewness": float(skewness(xj)),
        "pearson_skewness": float(pearson_skewness(xj)),
        "bowley_skewness": float(bowley_skewness(xj)),
        "kurtosis": float(kurtosis(xj)),
    }
    out.update({k: float(v) for k, v in cumulants(xj).items()})
    out.update(l_moments(np.asarray(x)))
    return out
