"""Corpus-scale fingerprint matching: one batched similarity matmul.

The reference's FindBestMatches loops Compare() over candidates
(comparison.go:197-263, 1107-1151). Here each fingerprint reduces to a
fixed-size statistics vector (the same statistics the pairwise
comparator uses); a corpus is a [C, D] matrix sharded over the mesh, a
query is a [D] vector, and matching is one cosine-similarity matmul +
top-k with an all-gather — MXU work instead of a Python loop.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sonido_sonar_tpu.fingerprint.comparison import extract_mfcc_statistics
from sonido_sonar_tpu.fingerprint.generator import AudioFingerprint

_EPS = 1e-10


def pack_statistics(fp: AudioFingerprint, num_mfcc_coeffs: int = 13) -> np.ndarray:
    """Reduce a fingerprint to the comparator's statistics vector.

    Layout: [mfcc mean+std (2C) | chroma mean (12, zeros if absent) |
    centroid/rolloff/flux (mean, std) pairs (6)] — the exact quantities
    the pairwise comparator cosines over, concatenated. Segment-wise
    cosine happens in `sharded_top_k_matches`, not over the raw concat.

    num_mfcc_coeffs fixes the layout width; a fingerprint whose MFCC
    width disagrees is an error (a mixed corpus cannot share a packed
    matrix).
    """
    f = fp.features
    parts = []
    if f.mfcc is not None:
        mfcc = np.asarray(f.mfcc, dtype=np.float64)
        if mfcc.shape[-1] != num_mfcc_coeffs:
            raise ValueError(
                f"fingerprint {fp.id} has {mfcc.shape[-1]} MFCC "
                f"coefficients, packed layout expects {num_mfcc_coeffs}"
            )
        parts.append(extract_mfcc_statistics(mfcc))
    else:
        parts.append(np.zeros(2 * num_mfcc_coeffs))
    if f.chroma_features is not None:
        parts.append(np.asarray(f.chroma_features, dtype=np.float64).mean(axis=0))
    else:
        parts.append(np.zeros(12))
    sf = f.spectral_features
    if sf is not None:
        for series in (sf.spectral_centroid, sf.spectral_rolloff, sf.spectral_flux):
            s = np.asarray(series, dtype=np.float64)
            parts.append(np.array([s.mean(), s.std(ddof=1) if len(s) > 1 else 0.0]))
    else:
        parts.append(np.zeros(6))
    return np.concatenate(parts).astype(np.float32)


def corpus_mfcc_width(fps: List[AudioFingerprint], default: int = 13) -> int:
    """MFCC coefficient count shared by a corpus (first one found)."""
    for fp in fps:
        if fp.features is not None and fp.features.mfcc is not None:
            return int(np.asarray(fp.features.mfcc).shape[-1])
    return default


def fingerprint_matrix(
    fps: List[AudioFingerprint], num_mfcc_coeffs: Optional[int] = None
) -> np.ndarray:
    """[C, D] corpus matrix of packed statistics. The MFCC width is
    derived from the corpus unless given explicitly."""
    if num_mfcc_coeffs is None:
        num_mfcc_coeffs = corpus_mfcc_width(fps)
    return np.stack([pack_statistics(fp, num_mfcc_coeffs) for fp in fps])


def _segment_bounds(num_mfcc_coeffs: int = 13) -> Dict[str, Tuple[int, int]]:
    d_mfcc = 2 * num_mfcc_coeffs
    return {
        "mfcc": (0, d_mfcc),
        "chroma": (d_mfcc, d_mfcc + 12),
        "spectral": (d_mfcc + 12, d_mfcc + 18),
    }


@partial(jax.jit, static_argnames=("num_mfcc_coeffs",))
def segment_cosine_similarities(
    query: jnp.ndarray, corpus: jnp.ndarray, weights: jnp.ndarray,
    num_mfcc_coeffs: int = 13,
) -> jnp.ndarray:
    """Weighted mean of per-segment cosine similarities, [C].

    Mirrors calculateFeatureSimilarity's weighted mean over the live
    stats-cosine terms (comparison.go:266-341) in one batched pass.
    weights: [3] (mfcc, chroma, spectral).
    """
    sims = []
    for i, (name, (lo, hi)) in enumerate(_segment_bounds(num_mfcc_coeffs).items()):
        q = query[lo:hi]
        c = corpus[:, lo:hi]
        qn = jnp.linalg.norm(q)
        cn = jnp.linalg.norm(c, axis=-1)
        dot = jnp.matmul(
            c, q, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        sim = jnp.where(
            (qn > _EPS) & (cn > _EPS), dot / jnp.maximum(qn * cn, _EPS), 0.0
        )
        sims.append(sim * weights[i])
    return sum(sims) / jnp.maximum(jnp.sum(weights), _EPS)


def sharded_top_k_matches(
    query_vec: np.ndarray,
    corpus: np.ndarray,
    k: int = 10,
    mesh: Optional[Mesh] = None,
    weights: Tuple[float, float, float] = (0.40, 0.20, 0.25),
    num_mfcc_coeffs: int = 13,
) -> Tuple[np.ndarray, np.ndarray]:
    """Top-k most similar corpus rows. Returns (indices [k], scores [k]).

    With a mesh, the corpus rows are sharded across devices; XLA inserts
    the all-gather for the final top-k (the collective rides ICI). Pads
    the corpus to a device multiple internally.
    """
    c, d = corpus.shape
    w = jnp.asarray(np.asarray(weights, dtype=np.float32))
    if mesh is not None:
        n_dev = int(np.prod(list(mesh.shape.values())))
        pad = (-c) % n_dev
        if pad:
            corpus = np.pad(corpus, ((0, pad), (0, 0)))
        corpus_dev = jax.device_put(
            jnp.asarray(corpus), NamedSharding(mesh, P("data", None))
        )
        query_dev = jax.device_put(
            jnp.asarray(query_vec), NamedSharding(mesh, P())
        )
    else:
        corpus_dev = jnp.asarray(corpus)
        query_dev = jnp.asarray(query_vec)

    sims = segment_cosine_similarities(query_dev, corpus_dev, w, num_mfcc_coeffs)
    if sims.shape[0] > c:
        sims = jnp.where(jnp.arange(sims.shape[0]) < c, sims, -jnp.inf)
    k = min(k, c)
    scores, idx = jax.lax.top_k(sims, k)
    idx_h, scores_h = jax.device_get((idx, scores))  # one round trip
    return idx_h, scores_h
