"""Entropy analysis over histograms.

Reference parity: algorithms/stats/entropy.go:10-707 — Shannon, Renyi,
Tsallis, Hartley (log of support size), Min-entropy over value
histograms; bin-count selectors (Sturges, Rice, Scott,
Freedman-Diaconis, sqrt); entropy rate over symbol transitions;
conditional entropy.
"""

from __future__ import annotations

import math
from typing import Dict

import jax.numpy as jnp
import numpy as np

_EPS = 1e-12


# -- bin-count selectors (entropy.go:319-...) ---------------------------

def sturges_bins(n: int) -> int:
    return max(int(math.ceil(math.log2(max(n, 1)) + 1)), 1)


def rice_bins(n: int) -> int:
    return max(int(math.ceil(2.0 * n ** (1.0 / 3.0))), 1)


def sqrt_bins(n: int) -> int:
    return max(int(math.ceil(math.sqrt(n))), 1)


def scott_bins(x: np.ndarray) -> int:
    n = len(x)
    std = float(np.std(x))
    if std <= 0:
        return 1
    h = 3.49 * std / n ** (1.0 / 3.0)
    rng = float(np.max(x) - np.min(x))
    return max(int(math.ceil(rng / h)) if h > 0 else 1, 1)


def freedman_diaconis_bins(x: np.ndarray) -> int:
    n = len(x)
    q75, q25 = np.percentile(x, [75, 25])
    iqr = float(q75 - q25)
    if iqr <= 0:
        return sturges_bins(n)
    h = 2.0 * iqr / n ** (1.0 / 3.0)
    rng = float(np.max(x) - np.min(x))
    return max(int(math.ceil(rng / h)) if h > 0 else 1, 1)


def select_bins(x: np.ndarray, method: str = "sturges") -> int:
    n = len(x)
    if method == "sturges":
        return sturges_bins(n)
    if method == "rice":
        return rice_bins(n)
    if method == "sqrt":
        return sqrt_bins(n)
    if method == "scott":
        return scott_bins(x)
    if method in ("fd", "freedman-diaconis"):
        return freedman_diaconis_bins(x)
    raise ValueError(f"unknown bin selector {method}")


# -- histogram ------------------------------------------------------------

def histogram_probs(x: jnp.ndarray, num_bins: int) -> jnp.ndarray:
    """Normalized histogram of the last axis, [..., N] -> [..., bins]."""
    import jax.nn

    lo = jnp.min(x, axis=-1, keepdims=True)
    hi = jnp.max(x, axis=-1, keepdims=True)
    width = jnp.maximum(hi - lo, _EPS)
    idx = jnp.clip(((x - lo) / width * num_bins).astype(jnp.int32), 0, num_bins - 1)
    counts = jnp.sum(jax.nn.one_hot(idx, num_bins), axis=-2)
    return counts / x.shape[-1]


import jax  # noqa: E402


# -- entropies (entropy.go:10-165, 515-707) -------------------------------

def shannon_entropy(p: jnp.ndarray, base: float = 2.0) -> jnp.ndarray:
    terms = jnp.where(p > _EPS, -p * jnp.log(jnp.maximum(p, _EPS)), 0.0)
    return jnp.sum(terms, axis=-1) / math.log(base)


def renyi_entropy(p: jnp.ndarray, alpha: float = 2.0, base: float = 2.0) -> jnp.ndarray:
    if abs(alpha - 1.0) < 1e-9:
        return shannon_entropy(p, base)
    s = jnp.sum(jnp.maximum(p, 0.0) ** alpha, axis=-1)
    return jnp.log(jnp.maximum(s, _EPS)) / (1.0 - alpha) / math.log(base)


def tsallis_entropy(p: jnp.ndarray, q: float = 2.0) -> jnp.ndarray:
    if abs(q - 1.0) < 1e-9:
        return shannon_entropy(p, math.e)
    s = jnp.sum(jnp.maximum(p, 0.0) ** q, axis=-1)
    return (1.0 - s) / (q - 1.0)


def hartley_entropy(p: jnp.ndarray, base: float = 2.0) -> jnp.ndarray:
    """log(#nonzero outcomes)."""
    support = jnp.sum((p > _EPS).astype(jnp.float32), axis=-1)
    return jnp.log(jnp.maximum(support, 1.0)) / math.log(base)


def min_entropy(p: jnp.ndarray, base: float = 2.0) -> jnp.ndarray:
    return -jnp.log(jnp.maximum(jnp.max(p, axis=-1), _EPS)) / math.log(base)


def entropy_rate(symbols: np.ndarray, num_symbols: int) -> float:
    """Entropy rate from the first-order transition matrix
    (entropy.go entropy rate): H = -sum_i pi_i sum_j P_ij log2 P_ij."""
    s = np.asarray(symbols, dtype=np.int64)
    if len(s) < 2:
        return 0.0
    trans = np.zeros((num_symbols, num_symbols))
    for a, b in zip(s[:-1], s[1:]):
        trans[a, b] += 1
    row_sums = trans.sum(axis=1, keepdims=True)
    p_cond = np.divide(trans, row_sums, out=np.zeros_like(trans), where=row_sums > 0)
    pi = row_sums[:, 0] / max(row_sums.sum(), 1)
    with np.errstate(divide="ignore", invalid="ignore"):
        logs = np.where(p_cond > 0, np.log2(p_cond), 0.0)
    return float(-np.sum(pi[:, None] * p_cond * logs))


def conditional_entropy(joint: jnp.ndarray, base: float = 2.0) -> jnp.ndarray:
    """H(Y|X) from a joint distribution [..., X, Y]."""
    joint = joint / jnp.maximum(jnp.sum(joint, axis=(-2, -1), keepdims=True), _EPS)
    px = jnp.sum(joint, axis=-1, keepdims=True)
    p_cond = jnp.where(px > _EPS, joint / jnp.maximum(px, _EPS), 0.0)
    terms = jnp.where(
        joint > _EPS, -joint * jnp.log(jnp.maximum(p_cond, _EPS)), 0.0
    )
    return jnp.sum(terms, axis=(-2, -1)) / math.log(base)


def analyze(x: np.ndarray, bin_method: str = "sturges") -> Dict[str, float]:
    """Entropy.Analyze (entropy.go:10-165): the full entropy profile of a
    value series."""
    x = np.asarray(x, dtype=np.float64)
    bins = select_bins(x, bin_method)
    p = np.asarray(histogram_probs(jnp.asarray(x[None, :]), bins))[0]
    pj = jnp.asarray(p)
    return {
        "shannon": float(shannon_entropy(pj)),
        "renyi_2": float(renyi_entropy(pj, 2.0)),
        "tsallis_2": float(tsallis_entropy(pj, 2.0)),
        "hartley": float(hartley_entropy(pj)),
        "min": float(min_entropy(pj)),
        "num_bins": float(bins),
        "normalized": float(shannon_entropy(pj)) / max(math.log2(bins), 1e-9),
    }
