"""Device-side batched fingerprint comparator.

The reference compares fingerprints one pair at a time on the host
(comparison.go:133-194) and FindBestMatches/BatchCompare loop Compare()
over candidates (comparison.go:197-263, 1107-1151). Every live term of
that scoring chain operates on fixed-size per-feature *statistics* —
cosines of stats vectors, scalar ratios, a weighted mean, a confidence
heuristic — so a corpus packs into one [C, D] matrix and the whole
chain becomes a single jitted elementwise/reduction program over the
candidate axis: one dispatch scores any number of candidates, and the
matrix shards over a device mesh for corpus-scale search.

Parity contract: `batched_similarity` reproduces
FingerprintComparator.compare with enable_detailed_metrics=False (the
default, and the FindBestMatches configuration) exactly:
  - per-feature sims: MFCC stats-cosine (comparison.go:344-401),
    spectral per-series (mean, std) cosines averaged (:646-671),
    chroma mean-vector cosine (:673-688), temporal/speech/harmonic
    scalar ratios + sequence stats (:690-770)
  - weighted mean over present features (:875-882, 1055-1104)
  - OverallSimilarity = FeatureSimilarity (:886-889, quirk #4)
  - confidence heuristic without quality terms (:1011-1037)
  - match classes (:1040-1052)
  - content filter early-out (:160-166): zero similarity, 0.0
    confidence, "weak"
tests/test_device_compare.py asserts equality with the host comparator
to ~1e-6 over randomized corpora (float32 device math vs float64 host).

Packing runs on host in float64 (it is one pass over each fingerprint,
done once per corpus) and the packed vectors are cached/cheap; the
per-query work is all device-side.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sonido_sonar_tpu.config.config import ContentType
from sonido_sonar_tpu.fingerprint.comparison import (
    _CONTENT_WEIGHTS,
    _DEFAULT_WEIGHTS,
    extract_mfcc_statistics,
)
from sonido_sonar_tpu.fingerprint.generator import AudioFingerprint

_EPS = 1e-10

# feature order shared by the packed layout and the weight vector
FEATURE_ORDER = ("mfcc", "spectral", "chroma", "temporal", "speech", "harmonic")

# match classes, indexed by the bucket the device kernel emits
MATCH_CLASSES = ("weak", "somewhat_similar", "similar", "very_similar", "exact")


def layout_size(num_mfcc_coeffs: int) -> int:
    """Packed vector width D for a given MFCC coefficient count."""
    return 44 + 2 * num_mfcc_coeffs


def _offsets(num_mfcc_coeffs: int) -> Dict[str, int]:
    a = 6 + 2 * num_mfcc_coeffs      # end of mfcc stats
    b = a + 9                        # end of spectral block
    c = b + 12                       # end of chroma block
    d = c + 6                        # end of temporal block
    e = d + 5                        # end of speech block
    return {"mfcc": 6, "spectral": a, "chroma": b, "temporal": c,
            "speech": d, "harmonic": e}


def pack_comparator_stats(
    fp: AudioFingerprint, num_mfcc_coeffs: int = 13
) -> np.ndarray:
    """Pack one fingerprint's full comparator statistics into a [D]
    float32 vector (layout documented in _offsets/layout_size).

    All reductions run in float64 on host, matching the host comparator
    bit-for-bit before the final float32 cast.
    """
    f = fp.features
    D = layout_size(num_mfcc_coeffs)
    v = np.zeros(D, dtype=np.float64)
    off = _offsets(num_mfcc_coeffs)

    def seq_stats(x) -> Tuple[float, float, float]:
        """(mean, sample std, present) of a 1-D series."""
        if x is None:
            return 0.0, 0.0, 0.0
        s = np.asarray(x, dtype=np.float64).ravel()
        if s.size == 0:
            return 0.0, 0.0, 0.0
        std = float(np.sqrt(s.var(ddof=1))) if s.size > 1 else 0.0
        return float(s.mean()), std, 1.0

    if f.mfcc is not None and np.asarray(f.mfcc).size > 0:
        mfcc = np.asarray(f.mfcc, dtype=np.float64)
        if mfcc.shape[-1] != num_mfcc_coeffs:
            raise ValueError(
                f"fingerprint {fp.id} has {mfcc.shape[-1]} MFCC "
                f"coefficients, layout expects {num_mfcc_coeffs}"
            )
        v[0] = 1.0
        v[off["mfcc"]: off["mfcc"] + 2 * num_mfcc_coeffs] = (
            extract_mfcc_statistics(mfcc)
        )

    sf = f.spectral_features
    if sf is not None:
        v[1] = 1.0
        base = off["spectral"]
        for i, series in enumerate(
            (sf.spectral_centroid, sf.spectral_rolloff, sf.spectral_flux)
        ):
            m, s, p = seq_stats(series)
            v[base + 2 * i] = m
            v[base + 2 * i + 1] = s
            v[base + 6 + i] = p

    if f.chroma_features is not None:
        ch = np.asarray(f.chroma_features, dtype=np.float64)
        if ch.size:
            v[2] = 1.0
            v[off["chroma"]: off["chroma"] + 12] = ch.mean(axis=0)[:12]

    tf = f.temporal_features
    if tf is not None:
        v[3] = 1.0
        base = off["temporal"]
        v[base + 0] = float(tf.dynamic_range) if tf.dynamic_range is not None else 0.0
        v[base + 1] = float(tf.silence_ratio) if tf.silence_ratio is not None else 0.0
        v[base + 2] = float(tf.onset_density) if tf.onset_density is not None else 0.0
        m, s, p = seq_stats(tf.rms_energy)
        v[base + 3], v[base + 4], v[base + 5] = m, s, p

    sp = f.speech_features
    if sp is not None:
        v[4] = 1.0
        base = off["speech"]
        v[base + 0] = float(sp.speech_rate) if sp.speech_rate is not None else 0.0
        v[base + 1] = (
            float(sp.vocal_tract_length) if sp.vocal_tract_length is not None else 0.0
        )
        m, s, p = seq_stats(sp.voicing_probability)
        v[base + 2], v[base + 3], v[base + 4] = m, s, p

    hf = f.harmonic_features
    if hf is not None:
        v[5] = 1.0
        base = off["harmonic"]
        m, s, p = seq_stats(hf.harmonic_ratio)
        v[base + 0], v[base + 1], v[base + 2] = m, s, p
        m, s, p = seq_stats(hf.pitch_estimate)
        v[base + 3], v[base + 4], v[base + 5] = m, s, p

    return v.astype(np.float32)


def comparator_matrix(
    fps: List[AudioFingerprint], num_mfcc_coeffs: Optional[int] = None
) -> Tuple[np.ndarray, int]:
    """[C, D] packed corpus matrix + the MFCC width used."""
    if num_mfcc_coeffs is None:
        num_mfcc_coeffs = 13
        for fp in fps:
            if fp.features is not None and fp.features.mfcc is not None:
                num_mfcc_coeffs = int(np.asarray(fp.features.mfcc).shape[-1])
                break
    return (
        np.stack([pack_comparator_stats(fp, num_mfcc_coeffs) for fp in fps]),
        num_mfcc_coeffs,
    )


def content_weight_vector(content_type: ContentType) -> np.ndarray:
    """[6] weight vector in FEATURE_ORDER for getEffectiveWeights
    (comparison.go:1055-1104)."""
    table = _CONTENT_WEIGHTS.get(content_type, _DEFAULT_WEIGHTS)
    return np.array([table.get(k, 0.0) for k in FEATURE_ORDER], dtype=np.float32)


# ---------------------------------------------------------------------
# device kernel
# ---------------------------------------------------------------------

def _cosine(dot, n1, n2):
    """cosineSimilarity gating (comparison.go:858-873): zero norm -> 0."""
    return jnp.where((n1 > 0) & (n2 > 0), dot / jnp.maximum(n1 * n2, _EPS), 0.0)


def _stats2_cosine(m1, s1, m2, s2):
    """compareSequenceStats (comparison.go:826-841): cosine of
    (mean, std) 2-vectors."""
    dot = m1 * m2 + s1 * s2
    n1 = jnp.sqrt(m1 * m1 + s1 * s1)
    n2 = jnp.sqrt(m2 * m2 + s2 * s2)
    return _cosine(dot, n1, n2)


def _scalar_sim(v1, v2):
    """compareScalarFeatures (comparison.go:843-856)."""
    maxv = jnp.maximum(jnp.abs(v1), jnp.abs(v2))
    sim = jnp.maximum(0.0, 1.0 - jnp.abs(v1 - v2) / jnp.maximum(maxv, _EPS))
    return jnp.where(maxv == 0.0, 1.0, sim)


@partial(jax.jit, static_argnames=("num_mfcc_coeffs", "content_filter"))
def batched_similarity(
    query: jnp.ndarray,            # [D]
    corpus: jnp.ndarray,           # [C, D]
    weights: jnp.ndarray,          # [6] per-content weights of the query
    content_match: jnp.ndarray,    # [C] bool
    num_mfcc_coeffs: int = 13,
    content_filter: bool = False,
) -> Dict[str, jnp.ndarray]:
    """The full live comparator chain for one query against C packed
    candidates. Returns dict with overall [C], confidence [C],
    match_class [C] int32 (index into MATCH_CLASSES), feature_sims
    [C, 6] and feature_present [C, 6] (both in FEATURE_ORDER).
    """
    off = _offsets(num_mfcc_coeffs)
    q = query.astype(jnp.float32)
    X = corpus.astype(jnp.float32)

    sims = []
    present = []

    # --- MFCC stats cosine ------------------------------------------------
    lo, hi = off["mfcc"], off["mfcc"] + 2 * num_mfcc_coeffs
    qs, Xs = q[lo:hi], X[:, lo:hi]
    dot = Xs @ qs
    mfcc_sim = _cosine(dot, jnp.linalg.norm(qs), jnp.linalg.norm(Xs, axis=-1))
    sims.append(mfcc_sim)
    present.append((q[0] > 0) & (X[:, 0] > 0))

    # --- spectral: mean of per-series (mean, std) cosines ------------------
    base = off["spectral"]
    acc = jnp.zeros(X.shape[0])
    cnt = jnp.zeros(X.shape[0])
    for i in range(3):
        m1, s1 = q[base + 2 * i], q[base + 2 * i + 1]
        m2, s2 = X[:, base + 2 * i], X[:, base + 2 * i + 1]
        p = (q[base + 6 + i] > 0) & (X[:, base + 6 + i] > 0)
        acc = acc + jnp.where(p, _stats2_cosine(m1, s1, m2, s2), 0.0)
        cnt = cnt + p.astype(jnp.float32)
    sims.append(jnp.where(cnt > 0, acc / jnp.maximum(cnt, 1.0), 0.0))
    present.append((q[1] > 0) & (X[:, 1] > 0))

    # --- chroma mean-vector cosine -----------------------------------------
    lo, hi = off["chroma"], off["chroma"] + 12
    qc, Xc = q[lo:hi], X[:, lo:hi]
    sims.append(_cosine(Xc @ qc, jnp.linalg.norm(qc), jnp.linalg.norm(Xc, axis=-1)))
    present.append((q[2] > 0) & (X[:, 2] > 0))

    # --- temporal -----------------------------------------------------------
    base = off["temporal"]
    dr1, dr2 = q[base], X[:, base]
    sil1, sil2 = q[base + 1], X[:, base + 1]
    od1, od2 = q[base + 2], X[:, base + 2]
    acc = jnp.zeros(X.shape[0])
    cnt = jnp.zeros(X.shape[0])
    g = (dr1 > 0) & (dr2 > 0)
    acc += jnp.where(g, _scalar_sim(dr1, dr2), 0.0); cnt += g
    acc += _scalar_sim(sil1, sil2); cnt += 1.0  # silence term unconditional
    g = (od1 > 0) & (od2 > 0)
    acc += jnp.where(g, _scalar_sim(od1, od2), 0.0); cnt += g
    g = (q[base + 5] > 0) & (X[:, base + 5] > 0)
    acc += jnp.where(
        g, _stats2_cosine(q[base + 3], q[base + 4], X[:, base + 3], X[:, base + 4]),
        0.0,
    ); cnt += g
    sims.append(acc / jnp.maximum(cnt, 1.0))
    present.append((q[3] > 0) & (X[:, 3] > 0))

    # --- speech --------------------------------------------------------------
    base = off["speech"]
    acc = jnp.zeros(X.shape[0])
    cnt = jnp.zeros(X.shape[0])
    g = (q[base] > 0) & (X[:, base] > 0)
    acc += jnp.where(g, _scalar_sim(q[base], X[:, base]), 0.0); cnt += g
    g = (q[base + 1] > 0) & (X[:, base + 1] > 0)
    acc += jnp.where(g, _scalar_sim(q[base + 1], X[:, base + 1]), 0.0); cnt += g
    g = (q[base + 4] > 0) & (X[:, base + 4] > 0)
    acc += jnp.where(
        g, _stats2_cosine(q[base + 2], q[base + 3], X[:, base + 2], X[:, base + 3]),
        0.0,
    ); cnt += g
    sims.append(jnp.where(cnt > 0, acc / jnp.maximum(cnt, 1.0), 0.0))
    present.append((q[4] > 0) & (X[:, 4] > 0))

    # --- harmonic --------------------------------------------------------------
    base = off["harmonic"]
    acc = jnp.zeros(X.shape[0])
    cnt = jnp.zeros(X.shape[0])
    g = (q[base + 2] > 0) & (X[:, base + 2] > 0)
    acc += jnp.where(
        g, _stats2_cosine(q[base], q[base + 1], X[:, base], X[:, base + 1]), 0.0
    ); cnt += g
    g = (q[base + 5] > 0) & (X[:, base + 5] > 0)
    acc += jnp.where(
        g, _stats2_cosine(q[base + 3], q[base + 4], X[:, base + 3], X[:, base + 4]),
        0.0,
    ); cnt += g
    sims.append(jnp.where(cnt > 0, acc / jnp.maximum(cnt, 1.0), 0.0))
    present.append((q[5] > 0) & (X[:, 5] > 0))

    feature_sims = jnp.stack(sims, axis=-1)            # [C, 6]
    feature_present = jnp.stack(present, axis=-1)      # [C, 6] bool

    # weighted mean over present features (comparison.go:875-882); a
    # zero weight sum falls back to the plain mean as the host does
    wmask = feature_present.astype(jnp.float32) * weights[None, :]
    wsum = wmask.sum(axis=-1)
    n_present = feature_present.sum(axis=-1).astype(jnp.float32)
    weighted = (feature_sims * wmask).sum(axis=-1) / jnp.maximum(wsum, _EPS)
    unweighted = (
        (feature_sims * feature_present).sum(axis=-1) / jnp.maximum(n_present, 1.0)
    )
    overall = jnp.where(wsum > 0, weighted, unweighted)

    if content_filter:
        keep = content_match
    else:
        keep = jnp.ones_like(content_match)
    overall = jnp.where(keep, overall, 0.0)

    # confidence heuristic, detailed-metrics-off configuration
    # (comparison.go:1011-1037); filtered pairs keep the struct default 0
    conf = (
        0.5
        + jnp.where(overall > 0.8, 0.3, jnp.where(overall > 0.6, 0.2, 0.0))
        + jnp.where(content_match, 0.1, 0.0)
        + n_present * 0.05
    )
    confidence = jnp.where(keep, jnp.clip(conf, 0.0, 1.0), 0.0)

    # match classes (comparison.go:1040-1052) as bucket indices
    match_class = (
        (overall >= 0.6).astype(jnp.int32)
        + (overall >= 0.75).astype(jnp.int32)
        + (overall >= 0.85).astype(jnp.int32)
        + (overall >= 0.95).astype(jnp.int32)
    )
    match_class = jnp.where(keep, match_class, 0)

    return {
        "overall": overall,
        "confidence": confidence,
        "match_class": match_class,
        "feature_sims": jnp.where(keep[:, None], feature_sims, 0.0),
        "feature_present": feature_present & keep[:, None],
    }


def sharded_batched_similarity(
    query_vec: np.ndarray,
    corpus: np.ndarray,
    weights: np.ndarray,
    content_match: np.ndarray,
    mesh: Optional[Mesh] = None,
    num_mfcc_coeffs: int = 13,
    content_filter: bool = False,
) -> Dict[str, np.ndarray]:
    """batched_similarity with the corpus rows sharded over a mesh
    ("data" axis); XLA keeps the whole chain local per shard (no
    collectives until a consumer reduces). Pads to a device multiple."""
    c = corpus.shape[0]
    if mesh is not None:
        n_dev = int(np.prod(list(mesh.shape.values())))
        pad = (-c) % n_dev
        if pad:
            corpus = np.pad(corpus, ((0, pad), (0, 0)))
            content_match = np.pad(content_match, (0, pad))
        corpus_dev = jax.device_put(
            jnp.asarray(corpus), NamedSharding(mesh, P("data", None))
        )
        match_dev = jax.device_put(
            jnp.asarray(content_match), NamedSharding(mesh, P("data"))
        )
        query_dev = jax.device_put(jnp.asarray(query_vec), NamedSharding(mesh, P()))
    else:
        corpus_dev = jnp.asarray(corpus)
        match_dev = jnp.asarray(content_match)
        query_dev = jnp.asarray(query_vec)
    out = batched_similarity(
        query_dev, corpus_dev, jnp.asarray(weights), match_dev,
        num_mfcc_coeffs=num_mfcc_coeffs, content_filter=content_filter,
    )
    return {k: np.asarray(v)[:c] for k, v in out.items()}
