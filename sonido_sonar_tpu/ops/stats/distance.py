"""Distance functions, distance matrices, kNN.

Reference parity: algorithms/stats/distance.go:8-436 — metrics Euclid,
Manhattan, Cosine, Pearson, Chebyshev, Minkowski, Hamming, Jaccard,
Canberra, Bray-Curtis, KL, JS, Hellinger, Bhattacharyya, 1-D EMD
(+ Mahalanobis stub in the reference — implemented properly here);
GetDistanceFunction registry, distance matrix, kNN.

All functions are batched jnp ops over the last axis; the registry
returns jit-friendly callables.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp

_EPS = 1e-10


def euclidean(a, b):
    d = a - b
    return jnp.sqrt(jnp.sum(d * d, axis=-1))


def sq_euclidean(a, b):
    d = a - b
    return jnp.sum(d * d, axis=-1)


def manhattan(a, b):
    return jnp.sum(jnp.abs(a - b), axis=-1)


def chebyshev(a, b):
    return jnp.max(jnp.abs(a - b), axis=-1)


def minkowski(a, b, p: float = 3.0):
    return jnp.sum(jnp.abs(a - b) ** p, axis=-1) ** (1.0 / p)


def cosine(a, b):
    """1 - cosine similarity."""
    na = jnp.linalg.norm(a, axis=-1)
    nb = jnp.linalg.norm(b, axis=-1)
    dot = jnp.sum(a * b, axis=-1)
    sim = jnp.where((na > _EPS) & (nb > _EPS), dot / jnp.maximum(na * nb, _EPS), 0.0)
    return 1.0 - sim


def pearson(a, b):
    """1 - Pearson correlation."""
    am = a - jnp.mean(a, axis=-1, keepdims=True)
    bm = b - jnp.mean(b, axis=-1, keepdims=True)
    num = jnp.sum(am * bm, axis=-1)
    den = jnp.sqrt(jnp.sum(am * am, axis=-1) * jnp.sum(bm * bm, axis=-1))
    corr = jnp.where(den > _EPS, num / jnp.maximum(den, _EPS), 0.0)
    return 1.0 - corr


def hamming(a, b):
    """Fraction of differing entries."""
    return jnp.mean((a != b).astype(jnp.float32), axis=-1)


def jaccard(a, b):
    """1 - |min|/|max| (weighted Jaccard for non-negative vectors)."""
    num = jnp.sum(jnp.minimum(a, b), axis=-1)
    den = jnp.sum(jnp.maximum(a, b), axis=-1)
    return 1.0 - jnp.where(den > _EPS, num / jnp.maximum(den, _EPS), 0.0)


def canberra(a, b):
    den = jnp.abs(a) + jnp.abs(b)
    terms = jnp.where(den > _EPS, jnp.abs(a - b) / jnp.maximum(den, _EPS), 0.0)
    return jnp.sum(terms, axis=-1)


def bray_curtis(a, b):
    num = jnp.sum(jnp.abs(a - b), axis=-1)
    den = jnp.sum(jnp.abs(a + b), axis=-1)
    return jnp.where(den > _EPS, num / jnp.maximum(den, _EPS), 0.0)


def _normalize_dist(p):
    s = jnp.sum(p, axis=-1, keepdims=True)
    return jnp.where(s > _EPS, p / jnp.maximum(s, _EPS), p)


def kl_divergence(p, q):
    """sum p log(p/q) over normalized distributions."""
    p = _normalize_dist(jnp.maximum(p, 0.0))
    q = _normalize_dist(jnp.maximum(q, 0.0))
    terms = jnp.where(
        p > _EPS, p * jnp.log(jnp.maximum(p, _EPS) / jnp.maximum(q, _EPS)), 0.0
    )
    return jnp.sum(terms, axis=-1)


def js_divergence(p, q):
    p = _normalize_dist(jnp.maximum(p, 0.0))
    q = _normalize_dist(jnp.maximum(q, 0.0))
    m = 0.5 * (p + q)
    return 0.5 * kl_divergence(p, m) + 0.5 * kl_divergence(q, m)


def hellinger(p, q):
    p = _normalize_dist(jnp.maximum(p, 0.0))
    q = _normalize_dist(jnp.maximum(q, 0.0))
    return jnp.sqrt(
        jnp.maximum(0.0, 0.5 * jnp.sum((jnp.sqrt(p) - jnp.sqrt(q)) ** 2, axis=-1))
    )


def bhattacharyya(p, q):
    p = _normalize_dist(jnp.maximum(p, 0.0))
    q = _normalize_dist(jnp.maximum(q, 0.0))
    bc = jnp.sum(jnp.sqrt(p * q), axis=-1)
    return -jnp.log(jnp.maximum(bc, _EPS))


def emd_1d(p, q):
    """1-D earth mover's distance = L1 of CDF difference."""
    p = _normalize_dist(jnp.maximum(p, 0.0))
    q = _normalize_dist(jnp.maximum(q, 0.0))
    return jnp.sum(jnp.abs(jnp.cumsum(p - q, axis=-1)), axis=-1)


def mahalanobis(a, b, inv_cov):
    """sqrt((a-b)^T S^-1 (a-b)). The reference stubs this
    (distance.go Mahalanobis); implemented properly here."""
    d = a - b
    return jnp.sqrt(jnp.maximum(jnp.einsum("...i,ij,...j->...", d, inv_cov, d), 0.0))


_REGISTRY: Dict[str, Callable] = {
    "euclidean": euclidean,
    "sqeuclidean": sq_euclidean,
    "manhattan": manhattan,
    "chebyshev": chebyshev,
    "minkowski": minkowski,
    "cosine": cosine,
    "pearson": pearson,
    "hamming": hamming,
    "jaccard": jaccard,
    "canberra": canberra,
    "braycurtis": bray_curtis,
    "kl": kl_divergence,
    "js": js_divergence,
    "hellinger": hellinger,
    "bhattacharyya": bhattacharyya,
    "emd": emd_1d,
}


def get_distance_function(metric: str) -> Callable:
    """GetDistanceFunction (distance.go:8-60)."""
    fn = _REGISTRY.get(metric)
    if fn is None:
        raise ValueError(f"unknown distance metric {metric}")
    return fn


def distance_matrix(x: jnp.ndarray, y: jnp.ndarray, metric: str = "euclidean") -> jnp.ndarray:
    """[N, D] x [M, D] -> [N, M] (distance.go DistanceMatrix).

    Euclidean fast-paths through the matmul identity (MXU)."""
    if metric in ("euclidean", "sqeuclidean"):
        from sonido_sonar_tpu.ops.stats.dtw import pairwise_sq_euclidean

        d2 = pairwise_sq_euclidean(x, y)
        return jnp.sqrt(d2) if metric == "euclidean" else d2
    fn = get_distance_function(metric)
    return jax.vmap(lambda xi: jax.vmap(lambda yj: fn(xi, yj))(y))(x)


def knn(
    query: jnp.ndarray, data: jnp.ndarray, k: int, metric: str = "euclidean"
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """k nearest rows of data [M, D] to query [D] -> (indices, distances)
    (distance.go kNN)."""
    d = distance_matrix(query[None, :], data, metric)[0]
    neg_d, idx = jax.lax.top_k(-d, min(k, data.shape[0]))
    return idx, -neg_d
