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

import functools
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


@partial(jax.jit, static_argnames=("num_mfcc_coeffs",))
def _pack_batch_jit(leaves: Dict[str, jnp.ndarray], num_mfcc_coeffs: int):
    """[B, ...] feature leaves -> [B, D] packed stats, one program.

    Presence is static (key membership in `leaves` — the jit cache key
    includes the dict's pytree structure), so absent features cost
    nothing and their slots stay zero, exactly like the host packer."""
    some = next(v for v in leaves.values() if v.ndim >= 1)
    b = some.shape[0]
    D = layout_size(num_mfcc_coeffs)
    off = _offsets(num_mfcc_coeffs)
    zero = jnp.zeros((b,), jnp.float32)
    one = jnp.ones((b,), jnp.float32)
    cols: List[jnp.ndarray] = [zero] * D

    def seq(x):
        """(mean, sample std) over the trailing (time) axis of [B, T]."""
        t = x.shape[-1]
        m = jnp.mean(x, axis=-1)
        if t > 1:
            s = jnp.sqrt(jnp.var(x, axis=-1, ddof=1))
        else:
            s = zero
        return m.astype(jnp.float32), s.astype(jnp.float32)

    if "mfcc" in leaves:
        mfcc = leaves["mfcc"]  # [B, T, C]
        cols[0] = one
        means = jnp.mean(mfcc, axis=-2)
        if mfcc.shape[-2] > 1:
            stds = jnp.sqrt(jnp.var(mfcc, axis=-2, ddof=1))
        else:
            stds = jnp.zeros_like(means)
        for c in range(num_mfcc_coeffs):
            cols[off["mfcc"] + c] = means[:, c].astype(jnp.float32)
            cols[off["mfcc"] + num_mfcc_coeffs + c] = stds[:, c].astype(
                jnp.float32
            )

    if "spectral_present" in leaves:
        cols[1] = one
        base = off["spectral"]
        for i, key in enumerate(("sp_centroid", "sp_rolloff", "sp_flux")):
            if key in leaves:
                m, s = seq(leaves[key])
                cols[base + 2 * i] = m
                cols[base + 2 * i + 1] = s
                cols[base + 6 + i] = one

    if "chroma" in leaves:
        cols[2] = one
        ch_mean = jnp.mean(leaves["chroma"], axis=-2)  # [B, 12]
        for i in range(12):
            cols[off["chroma"] + i] = ch_mean[:, i].astype(jnp.float32)

    if "temporal_present" in leaves:
        cols[3] = one
        base = off["temporal"]
        for j, key in enumerate(("t_dynamic_range", "t_silence", "t_onset")):
            if key in leaves:
                cols[base + j] = leaves[key].astype(jnp.float32)
        if "t_rms" in leaves:
            m, s = seq(leaves["t_rms"])
            cols[base + 3], cols[base + 4], cols[base + 5] = m, s, one

    if "speech_present" in leaves:
        cols[4] = one
        base = off["speech"]
        if "s_rate" in leaves:
            cols[base + 0] = leaves["s_rate"].astype(jnp.float32)
        if "s_vtl" in leaves:
            cols[base + 1] = leaves["s_vtl"].astype(jnp.float32)
        if "s_voicing" in leaves:
            m, s = seq(leaves["s_voicing"])
            cols[base + 2], cols[base + 3], cols[base + 4] = m, s, one

    if "harmonic_present" in leaves:
        cols[5] = one
        base = off["harmonic"]
        if "h_hr" in leaves:
            m, s = seq(leaves["h_hr"])
            cols[base + 0], cols[base + 1], cols[base + 2] = m, s, one
        if "h_pitch" in leaves:
            m, s = seq(leaves["h_pitch"])
            cols[base + 3], cols[base + 4], cols[base + 5] = m, s, one

    return jnp.stack(cols, axis=-1)


def pack_comparator_stats_batch(features, num_mfcc_coeffs: int = 13):
    """Device-side pack_comparator_stats over a batched ExtractedFeatures
    pytree ([B, ...] leaves) -> [B, D] float32 ON DEVICE, one jitted
    program — the corpus-ready path for generate_fingerprints_batch
    (features never leave the device; only this small matrix, or
    nothing, is fetched).

    Parity: device float32 vs the host packer's float64 (~1e-6 relative,
    the device-comparator contract), asserted in
    tests/test_generate_batch.py. Sequence stats reduce over the
    trailing time axis, matching the host's per-clip ravel for the 1-D
    series this layout packs.
    """
    f = features
    leaves: Dict[str, jnp.ndarray] = {}
    if f.mfcc is not None and f.mfcc.size > 0:
        if f.mfcc.shape[-1] != num_mfcc_coeffs:
            raise ValueError(
                f"batch has {f.mfcc.shape[-1]} MFCC coefficients, layout "
                f"expects {num_mfcc_coeffs}"
            )
        leaves["mfcc"] = f.mfcc
    sf = f.spectral_features
    if sf is not None:
        leaves["spectral_present"] = jnp.zeros((), jnp.float32)
        for key, series in (
            ("sp_centroid", sf.spectral_centroid),
            ("sp_rolloff", sf.spectral_rolloff),
            ("sp_flux", sf.spectral_flux),
        ):
            if series is not None and series.size > 0:
                leaves[key] = series
    if f.chroma_features is not None and f.chroma_features.size > 0:
        leaves["chroma"] = f.chroma_features
    tf = f.temporal_features
    if tf is not None:
        leaves["temporal_present"] = jnp.zeros((), jnp.float32)
        if tf.dynamic_range is not None:
            leaves["t_dynamic_range"] = tf.dynamic_range
        if tf.silence_ratio is not None:
            leaves["t_silence"] = tf.silence_ratio
        if tf.onset_density is not None:
            leaves["t_onset"] = tf.onset_density
        if tf.rms_energy is not None and tf.rms_energy.size > 0:
            leaves["t_rms"] = tf.rms_energy
    sp = f.speech_features
    if sp is not None:
        leaves["speech_present"] = jnp.zeros((), jnp.float32)
        if sp.speech_rate is not None:
            leaves["s_rate"] = sp.speech_rate
        if sp.vocal_tract_length is not None:
            leaves["s_vtl"] = sp.vocal_tract_length
        if sp.voicing_probability is not None and sp.voicing_probability.size > 0:
            leaves["s_voicing"] = sp.voicing_probability
    hf = f.harmonic_features
    if hf is not None:
        leaves["harmonic_present"] = jnp.zeros((), jnp.float32)
        if hf.harmonic_ratio is not None and hf.harmonic_ratio.size > 0:
            leaves["h_hr"] = hf.harmonic_ratio
        if hf.pitch_estimate is not None and hf.pitch_estimate.size > 0:
            leaves["h_pitch"] = hf.pitch_estimate
    if not leaves:
        raise ValueError("no packable features in batch")
    return _pack_batch_jit(leaves, num_mfcc_coeffs)


def content_code(ct) -> int:
    """Stable integer code per ContentType (shared by every in-kernel
    content-match path)."""
    return {c: i for i, c in enumerate(ContentType)}.get(ct, -1)


class PackedCorpus:
    """A corpus packed ONCE for repeated device search.

    The reference re-walks every candidate per FindBestMatches call
    (comparison.go:197-263); at 262k candidates the repo's old device
    path likewise re-packed the corpus on host per call — seconds of
    float64 reductions before any device work. A monitor searches the
    same corpus for every measurement, so packing is hoisted here:
    build once (host packer, or ON DEVICE from a FingerprintBatch), then
    every `FingerprintComparator.search_corpus` call is one top-k
    dispatch + a [k]-row fetch.
    """

    def __init__(self, fingerprints, matrix, codes, width: int):
        self.fingerprints = fingerprints
        self.matrix = matrix          # [C, D] device float32
        self.codes = codes            # [C] device int32
        self.width = width

    def __len__(self) -> int:
        return len(self.fingerprints)

    @classmethod
    def build(cls, fingerprints, num_mfcc_coeffs: Optional[int] = None):
        """Pack host-side fingerprints (float64 host packer, once)."""
        fps = [fp for fp in fingerprints if fp is not None]
        matrix, width = comparator_matrix(fps, num_mfcc_coeffs)
        codes = np.array(
            [content_code(fp.content_type) for fp in fps], np.int32
        )
        return cls(fps, jnp.asarray(matrix), jnp.asarray(codes), width)

    @classmethod
    def from_batch(cls, batch, num_mfcc_coeffs: int = 13):
        """Pack a device-resident FingerprintBatch WITHOUT the features
        ever leaving the device (generator.FingerprintBatch
        .comparator_matrix -> [C, D] on device)."""
        matrix = batch.comparator_matrix(num_mfcc_coeffs)
        codes = np.array(
            [content_code(fp.content_type) for fp in batch.fingerprints],
            np.int32,
        )
        return cls(
            list(batch.fingerprints), matrix, jnp.asarray(codes),
            num_mfcc_coeffs,
        )


def pack_quality_extras(
    fp: AudioFingerprint, max_frames: int
) -> Tuple[np.ndarray, float, np.ndarray, np.ndarray]:
    """Per-fingerprint inputs of calculateQualityMetrics
    (comparison.go:892-1008) that the stats layout doesn't carry:

      avail  [6] float32 — not-None bits per feature group (the host's
              data-availability test is `is not None`, NOT non-empty)
      duration scalar (seconds)
      series [2, max_frames] float32 — spectral centroid + rolloff
              time series, zero-padded (spectral coherence needs the
              raw series, not summary stats)
      lengths [2] int32 — true series lengths (0 = series absent)
    """
    f = fp.features
    avail = np.array(
        [
            f.mfcc is not None,
            f.spectral_features is not None,
            f.chroma_features is not None,
            f.temporal_features is not None,
            f.speech_features is not None,
            f.harmonic_features is not None,
        ],
        dtype=np.float32,
    )
    series = np.zeros((2, max_frames), dtype=np.float32)
    lengths = np.zeros(2, dtype=np.int32)
    sf = f.spectral_features
    if sf is not None:
        for i, s in enumerate((sf.spectral_centroid, sf.spectral_rolloff)):
            if s is None:
                continue
            s = np.asarray(s, dtype=np.float32).ravel()[:max_frames]
            series[i, : s.size] = s
            lengths[i] = s.size
    return avail, float(fp.duration), series, lengths


def quality_matrix(
    fps: List[AudioFingerprint], max_frames: Optional[int] = None
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Stack pack_quality_extras over a corpus:
    ([C, 6] avail, [C] durations, [C, 2, T] series, [C, 2] lengths)."""
    if max_frames is None:
        max_frames = 1
        for fp in fps:
            sf = fp.features.spectral_features if fp.features else None
            if sf is not None:
                for s in (sf.spectral_centroid, sf.spectral_rolloff):
                    if s is not None:
                        max_frames = max(max_frames, int(np.asarray(s).size))
    packed = [pack_quality_extras(fp, max_frames) for fp in fps]
    return (
        np.stack([p[0] for p in packed]),
        np.array([p[1] for p in packed], dtype=np.float32),
        np.stack([p[2] for p in packed]),
        np.stack([p[3] for p in packed]),
    )


def content_weight_vector(content_type: ContentType) -> np.ndarray:
    """[6] weight vector in FEATURE_ORDER for getEffectiveWeights
    (comparison.go:1055-1104)."""
    table = _CONTENT_WEIGHTS.get(content_type, _DEFAULT_WEIGHTS)
    return np.array([table.get(k, 0.0) for k in FEATURE_ORDER], dtype=np.float32)


# ---------------------------------------------------------------------
# device kernel
# ---------------------------------------------------------------------

@functools.lru_cache(maxsize=8)
def _segment_selectors(num_mfcc_coeffs: int):
    """Static metadata for the segment-matmul formulation of the scoring
    chain: a [D, 9] 0/1 selection matrix (one column per dot/norm
    segment of the packed layout — mfcc stats, 3 spectral series,
    chroma, temporal rms, voicing, 2 harmonic), the presence/gate column
    indices, and the scalar-feature column indices.

    Why this shape: the naive chain slices ~40 individual columns out of
    the [C, D] corpus and runs ~100 small [C]-vector ops — each one a
    relayout + full pass over the candidate axis, which left the kernel
    ~180x above its HBM byte bound on-chip (docs/PERF.md roofline). All
    nine dot products and squared norms collapse into TWO [C, D] x
    [D, 9] matmuls over 0/1 selectors (bf16-exact), and everything
    downstream runs on [C, <=13] tiles — a handful of fused passes."""
    off = _offsets(num_mfcc_coeffs)
    D = layout_size(num_mfcc_coeffs)
    a, b, c, d, e = (off["spectral"], off["chroma"], off["temporal"],
                     off["speech"], off["harmonic"])
    # groups 1-3 and 5-8 are the (mean, std) 2-vectors of
    # compareSequenceStats (comparison.go:826-841) — their cosine is the
    # same segment dot/norm computation as the wide mfcc/chroma blocks
    groups = (
        (off["mfcc"], off["mfcc"] + 2 * num_mfcc_coeffs),  # 0 mfcc stats
        (a, a + 2), (a + 2, a + 4), (a + 4, a + 6),        # 1-3 spectral series
        (b, b + 12),                                       # 4 chroma mean
        (c + 3, c + 5),                                    # 5 temporal rms stats
        (d + 2, d + 4),                                    # 6 speech voicing stats
        (e, e + 2), (e + 3, e + 5),                        # 7-8 harmonic stats
    )
    sel = np.zeros((D, len(groups)), dtype=np.float32)
    for g, (lo, hi) in enumerate(groups):
        sel[lo:hi, g] = 1.0
    sel.setflags(write=False)
    # gate columns: 6 group-present bits, 3 spectral series bits,
    # temporal rms bit, speech voicing bit, 2 harmonic bits
    gate_cols = np.array(
        [0, 1, 2, 3, 4, 5, a + 6, a + 7, a + 8, c + 5, d + 4, e + 2, e + 5],
        dtype=np.int32,
    )
    gate_cols.setflags(write=False)
    # scalar-feature columns: dynamic range, silence, onset density,
    # speech rate, vocal tract length
    scalar_cols = np.array([c, c + 1, c + 2, d, d + 1], dtype=np.int32)
    scalar_cols.setflags(write=False)
    return sel, gate_cols, scalar_cols


def _cosine(dot, n1, n2):
    """cosineSimilarity gating (comparison.go:858-873): zero norm -> 0."""
    return jnp.where((n1 > 0) & (n2 > 0), dot / jnp.maximum(n1 * n2, _EPS), 0.0)


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

    Formulation: all nine dot products / squared norms of the chain ride
    TWO [C, D] x [D, 9] selector matmuls (HIGHEST precision — these also
    carry the MFCC/chroma cosines, where bf16 MXU passes would inject
    ~1e-3 error the CPU parity tests cannot see); the gated means then
    run on [C, <=13] tiles. Values are identical to the per-term chain
    (same expressions, same gates) — see _segment_selectors for why.
    """
    sel_np, gate_cols_np, scalar_cols_np = _segment_selectors(num_mfcc_coeffs)
    sel = jnp.asarray(sel_np)
    q = query.astype(jnp.float32)
    X = corpus.astype(jnp.float32)

    hi = jax.lax.Precision.HIGHEST
    dots = jnp.matmul(X * q[None, :], sel, precision=hi)   # [C, 9]
    sq_x = jnp.matmul(X * X, sel, precision=hi)            # [C, 9]
    sq_q = jnp.matmul(q * q, sel, precision=hi)            # [9]
    cos = _cosine(dots, jnp.sqrt(sq_x), jnp.sqrt(sq_q)[None, :])  # [C, 9]

    Xg = X[:, gate_cols_np]                                # [C, 13]
    qg = q[gate_cols_np]
    gate = (qg[None, :] > 0) & (Xg > 0)                    # [C, 13]

    Xs = X[:, scalar_cols_np]                              # [C, 5]
    qs = q[scalar_cols_np]
    ssim = _scalar_sim(qs[None, :], Xs)                    # [C, 5]

    sims = []
    present = [gate[:, j] for j in range(6)]

    # --- MFCC stats cosine --------------------------------------------
    sims.append(cos[:, 0])

    # --- spectral: mean of gated per-series (mean, std) cosines --------
    acc = jnp.sum(jnp.where(gate[:, 6:9], cos[:, 1:4], 0.0), axis=-1)
    cnt = jnp.sum(gate[:, 6:9].astype(jnp.float32), axis=-1)
    sims.append(jnp.where(cnt > 0, acc / jnp.maximum(cnt, 1.0), 0.0))

    # --- chroma mean-vector cosine --------------------------------------
    sims.append(cos[:, 4])

    # --- temporal: dr + silence (unconditional) + onsets + rms stats ----
    g_dr = (qs[0] > 0) & (Xs[:, 0] > 0)
    g_od = (qs[2] > 0) & (Xs[:, 2] > 0)
    g_rms = gate[:, 9]
    acc = (
        jnp.where(g_dr, ssim[:, 0], 0.0)
        + ssim[:, 1]
        + jnp.where(g_od, ssim[:, 2], 0.0)
        + jnp.where(g_rms, cos[:, 5], 0.0)
    )
    cnt = (
        g_dr.astype(jnp.float32) + 1.0 + g_od.astype(jnp.float32)
        + g_rms.astype(jnp.float32)
    )
    sims.append(acc / jnp.maximum(cnt, 1.0))

    # --- speech: rate + vocal tract length + voicing stats --------------
    g_rate = (qs[3] > 0) & (Xs[:, 3] > 0)
    g_vtl = (qs[4] > 0) & (Xs[:, 4] > 0)
    g_voice = gate[:, 10]
    acc = (
        jnp.where(g_rate, ssim[:, 3], 0.0)
        + jnp.where(g_vtl, ssim[:, 4], 0.0)
        + jnp.where(g_voice, cos[:, 6], 0.0)
    )
    cnt = (
        g_rate.astype(jnp.float32) + g_vtl.astype(jnp.float32)
        + g_voice.astype(jnp.float32)
    )
    sims.append(jnp.where(cnt > 0, acc / jnp.maximum(cnt, 1.0), 0.0))

    # --- harmonic: two gated stats cosines -------------------------------
    g_h1, g_h2 = gate[:, 11], gate[:, 12]
    acc = jnp.where(g_h1, cos[:, 7], 0.0) + jnp.where(g_h2, cos[:, 8], 0.0)
    cnt = g_h1.astype(jnp.float32) + g_h2.astype(jnp.float32)
    sims.append(jnp.where(cnt > 0, acc / jnp.maximum(cnt, 1.0), 0.0))

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


@partial(jax.jit, static_argnames=("k", "num_mfcc_coeffs", "content_filter"))
def topk_similarity(
    query: jnp.ndarray,            # [D]
    corpus: jnp.ndarray,           # [C, D]
    weights: jnp.ndarray,          # [6]
    content_match: jnp.ndarray,    # [C] bool
    k: int,
    num_mfcc_coeffs: int = 13,
    content_filter: bool = False,
) -> Dict[str, jnp.ndarray]:
    """batched_similarity + exact top-k selection in ONE program, so a
    single query over a corpus fetches k rows (~KB) instead of five [C]
    arrays (VERDICT r3 item #3 — the full-[C] fetch and the per-candidate
    host loop were the single-query path's 25x gap, not device math).

    Returns index/overall/confidence/match_class [k] and feature_sims/
    feature_present [k, 6], ordered by descending overall similarity.
    Selection uses approx_max_k at recall 1.0 (the exact TPU lowering —
    one sort of the score vector, PERF.md rule 5)."""
    out = batched_similarity(
        query, corpus, weights, content_match,
        num_mfcc_coeffs=num_mfcc_coeffs, content_filter=content_filter,
    )
    kk = min(k, corpus.shape[0])
    vals, idx = jax.lax.approx_max_k(out["overall"], kk, recall_target=1.0)
    return {
        "index": idx.astype(jnp.int32),
        "overall": vals,
        "confidence": out["confidence"][idx],
        "match_class": out["match_class"][idx],
        "feature_sims": out["feature_sims"][idx],
        "feature_present": out["feature_present"][idx],
        "content_match": content_match[idx],
    }


@partial(jax.jit, static_argnames=("k", "num_mfcc_coeffs", "content_filter"))
def topk_similarity_multi(
    queries: jnp.ndarray,          # [Q, D]
    corpus: jnp.ndarray,           # [C, D]
    weights: jnp.ndarray,          # [Q, 6]
    q_content: jnp.ndarray,        # [Q] int32
    c_content: jnp.ndarray,        # [C] int32
    k: int,
    num_mfcc_coeffs: int = 13,
    content_filter: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Fleet top-k: Q queries x C candidates scored AND selected in one
    dispatch; the fetch is [Q, k] rows instead of [Q, C] matrices (67 MB
    at Q=64 x C=262k — which made the full-matrix multi path unusable at
    corpus scale through any link)."""
    out = batched_similarity_multi(
        queries, corpus, weights, q_content, c_content,
        num_mfcc_coeffs=num_mfcc_coeffs, content_filter=content_filter,
        return_feature_sims=True,
    )
    kk = min(k, corpus.shape[0])
    vals, idx = jax.lax.approx_max_k(
        out["overall"], kk, recall_target=1.0, reduction_dimension=-1
    )
    take = jnp.take_along_axis
    return {
        "index": idx.astype(jnp.int32),
        "overall": vals,
        "confidence": take(out["confidence"], idx, axis=-1),
        "match_class": take(out["match_class"], idx, axis=-1),
        "feature_sims": take(
            out["feature_sims"], idx[:, :, None], axis=1
        ),
        "feature_present": take(
            out["feature_present"], idx[:, :, None], axis=1
        ),
        "content_match": (
            q_content[:, None] == take(
                jnp.broadcast_to(c_content[None, :], out["overall"].shape),
                idx, axis=-1,
            )
        ),
    }


@partial(jax.jit, static_argnames=("num_mfcc_coeffs", "content_filter",
                                   "return_feature_sims"))
def batched_similarity_multi(
    queries: jnp.ndarray,          # [Q, D]
    corpus: jnp.ndarray,           # [C, D]
    weights: jnp.ndarray,          # [Q, 6] per-query content weights
    q_content: jnp.ndarray,        # [Q] int32 content codes
    c_content: jnp.ndarray,        # [C] int32 content codes
    num_mfcc_coeffs: int = 13,
    content_filter: bool = False,
    return_feature_sims: bool = True,
) -> Dict[str, jnp.ndarray]:
    """Q queries scored against C packed candidates in ONE dispatch —
    the corpus-search shape for a fleet of live streams (the reference
    runs FindBestMatches per stream in its worker pool,
    comparison.go:197-263; here the whole fleet's search is one
    program). Single-query dispatch is round-trip-bound on the remote
    chip (~27 ms wall for <1 ms of device work), so amortizing Q
    queries per dispatch is the real throughput lever.

    All Q*9 segment dot products ride one [Q*9, D] x [D, C] HIGHEST
    matmul (the per-query selector expansion W[i,g,j] = Q[i,j]*sel[j,g]
    is built on device, [Q*9, D] is tiny); candidate norms are shared
    across queries. Content matching runs in-kernel from integer codes
    so no [Q, C] host-built mask ships over the link.

    Returns overall/confidence [Q, C], match_class [Q, C] int32, and —
    when return_feature_sims is set — feature_sims [Q, C, 6] /
    feature_present [Q, C, 6]. Row i equals batched_similarity(row i)
    exactly (tests/test_device_compare.py)."""
    sel_np, gate_cols_np, scalar_cols_np = _segment_selectors(num_mfcc_coeffs)
    sel = jnp.asarray(sel_np)                              # [D, 9]
    Q = queries.astype(jnp.float32)
    X = corpus.astype(jnp.float32)
    nq = Q.shape[0]

    hi = jax.lax.Precision.HIGHEST
    Xt = X.T                                               # [D, C]
    W = (Q[:, None, :] * sel.T[None, :, :]).reshape(nq * 9, -1)  # [Q*9, D]
    dots = jnp.matmul(W, Xt, precision=hi).reshape(nq, 9, -1)    # [Q, 9, C]
    sq_x = jnp.matmul(sel.T, Xt * Xt, precision=hi)              # [9, C]
    sq_q = jnp.matmul(Q * Q, sel, precision=hi)                  # [Q, 9]
    cos = _cosine(
        dots, jnp.sqrt(sq_q)[:, :, None], jnp.sqrt(sq_x)[None, :, :]
    )                                                            # [Q, 9, C]

    gx = Xt[gate_cols_np, :]                               # [13, C]
    gq = Q[:, gate_cols_np]                                # [Q, 13]
    gate = (gq[:, :, None] > 0) & (gx[None, :, :] > 0)     # [Q, 13, C]

    sx = Xt[scalar_cols_np, :]                             # [5, C]
    sq = Q[:, scalar_cols_np]                              # [Q, 5]
    ssim = _scalar_sim(sq[:, :, None], sx[None, :, :])     # [Q, 5, C]

    sims = []
    sims.append(cos[:, 0, :])                              # mfcc
    acc = jnp.sum(jnp.where(gate[:, 6:9, :], cos[:, 1:4, :], 0.0), axis=1)
    cnt = jnp.sum(gate[:, 6:9, :].astype(jnp.float32), axis=1)
    sims.append(jnp.where(cnt > 0, acc / jnp.maximum(cnt, 1.0), 0.0))
    sims.append(cos[:, 4, :])                              # chroma
    # temporal
    g_dr = (sq[:, 0, None] > 0) & (sx[None, 0, :] > 0)
    g_od = (sq[:, 2, None] > 0) & (sx[None, 2, :] > 0)
    g_rms = gate[:, 9, :]
    acc = (
        jnp.where(g_dr, ssim[:, 0, :], 0.0)
        + ssim[:, 1, :]
        + jnp.where(g_od, ssim[:, 2, :], 0.0)
        + jnp.where(g_rms, cos[:, 5, :], 0.0)
    )
    cnt = (
        g_dr.astype(jnp.float32) + 1.0 + g_od.astype(jnp.float32)
        + g_rms.astype(jnp.float32)
    )
    sims.append(acc / jnp.maximum(cnt, 1.0))
    # speech
    g_rate = (sq[:, 3, None] > 0) & (sx[None, 3, :] > 0)
    g_vtl = (sq[:, 4, None] > 0) & (sx[None, 4, :] > 0)
    g_voice = gate[:, 10, :]
    acc = (
        jnp.where(g_rate, ssim[:, 3, :], 0.0)
        + jnp.where(g_vtl, ssim[:, 4, :], 0.0)
        + jnp.where(g_voice, cos[:, 6, :], 0.0)
    )
    cnt = (
        g_rate.astype(jnp.float32) + g_vtl.astype(jnp.float32)
        + g_voice.astype(jnp.float32)
    )
    sims.append(jnp.where(cnt > 0, acc / jnp.maximum(cnt, 1.0), 0.0))
    # harmonic
    g_h1, g_h2 = gate[:, 11, :], gate[:, 12, :]
    acc = jnp.where(g_h1, cos[:, 7, :], 0.0) + jnp.where(g_h2, cos[:, 8, :], 0.0)
    cnt = g_h1.astype(jnp.float32) + g_h2.astype(jnp.float32)
    sims.append(jnp.where(cnt > 0, acc / jnp.maximum(cnt, 1.0), 0.0))

    feature_sims = jnp.stack(sims, axis=1)                 # [Q, 6, C]
    feature_present = gate[:, :6, :]                       # [Q, 6, C]

    content_match = q_content[:, None] == c_content[None, :]   # [Q, C]

    wmask = feature_present.astype(jnp.float32) * weights[:, :, None]
    wsum = wmask.sum(axis=1)                               # [Q, C]
    n_present = feature_present.sum(axis=1).astype(jnp.float32)
    weighted = (feature_sims * wmask).sum(axis=1) / jnp.maximum(wsum, _EPS)
    unweighted = (
        (feature_sims * feature_present).sum(axis=1)
        / jnp.maximum(n_present, 1.0)
    )
    overall = jnp.where(wsum > 0, weighted, unweighted)

    keep = content_match if content_filter else jnp.ones_like(content_match)
    overall = jnp.where(keep, overall, 0.0)

    conf = (
        0.5
        + jnp.where(overall > 0.8, 0.3, jnp.where(overall > 0.6, 0.2, 0.0))
        + jnp.where(content_match, 0.1, 0.0)
        + n_present * 0.05
    )
    confidence = jnp.where(keep, jnp.clip(conf, 0.0, 1.0), 0.0)

    match_class = (
        (overall >= 0.6).astype(jnp.int32)
        + (overall >= 0.75).astype(jnp.int32)
        + (overall >= 0.85).astype(jnp.int32)
        + (overall >= 0.95).astype(jnp.int32)
    )
    match_class = jnp.where(keep, match_class, 0)

    out = {
        "overall": overall,
        "confidence": confidence,
        "match_class": match_class,
    }
    if return_feature_sims:
        out["feature_sims"] = jnp.where(
            keep[:, None, :], feature_sims, 0.0
        ).transpose(0, 2, 1)                               # [Q, C, 6]
        out["feature_present"] = (
            feature_present & keep[:, None, :]
        ).transpose(0, 2, 1)
    return out


@partial(jax.jit, static_argnames=("num_mfcc_coeffs", "content_filter"))
def batched_similarity_detailed(
    query: jnp.ndarray,            # [D]
    corpus: jnp.ndarray,           # [C, D]
    weights: jnp.ndarray,          # [6]
    content_match: jnp.ndarray,    # [C] bool
    q_avail: jnp.ndarray,          # [6]
    c_avail: jnp.ndarray,          # [C, 6]
    q_dur: jnp.ndarray,            # [] seconds
    c_dur: jnp.ndarray,            # [C]
    q_series: jnp.ndarray,         # [2, T] centroid + rolloff
    c_series: jnp.ndarray,         # [C, 2, T]
    q_len: jnp.ndarray,            # [2] int32
    c_len: jnp.ndarray,            # [C, 2] int32
    num_mfcc_coeffs: int = 13,
    content_filter: bool = False,
) -> Dict[str, jnp.ndarray]:
    """batched_similarity + the EnableDetailedMetrics quality chain
    (calculateQualityMetrics, comparison.go:892-1008) on device, so
    mixed-content corpora (EnableDetailedMetrics defaults ON there,
    config.go:151) keep the one-dispatch path. Adds keys:
    data_availability, feature_coverage, temporal_alignment,
    noise_level, dynamic_range_match, spectral_coherence (all [C]);
    confidence includes the quality terms (comparison.go:1030-1033).

    Spectral coherence is the masked two-pass Pearson over the first
    min(len_q, len_c) frames of each series — float32 on device vs the
    host's float64 corrcoef agrees to ~1e-4 (centered accumulation),
    ample for a reported diagnostic that feeds nothing downstream.
    """
    base = batched_similarity(
        query, corpus, weights, content_match,
        num_mfcc_coeffs=num_mfcc_coeffs, content_filter=content_filter,
    )
    sims, present = base["feature_sims"], base["feature_present"]
    n_present = present.sum(axis=-1).astype(jnp.float32)          # [C]

    avail_n = (q_avail[None, :] * c_avail).sum(axis=-1)           # [C]
    data_availability = avail_n / 6.0
    feature_coverage = n_present / 6.0

    dur_diff = jnp.abs(q_dur - c_dur)
    max_dur = jnp.maximum(q_dur, c_dur)
    temporal_alignment = jnp.where(
        max_dur > 0, 1.0 - jnp.minimum(1.0, dur_diff / jnp.maximum(max_dur, _EPS)),
        1.0,
    )

    # noise level = sqrt sample-variance of present-feature sims
    # (estimateNoiseLevel, comparison.go:938-963): none -> 0.5, one -> 0
    p = present.astype(jnp.float32)
    mean = (sims * p).sum(axis=-1) / jnp.maximum(n_present, 1.0)
    var = ((sims - mean[:, None]) ** 2 * p).sum(axis=-1) / jnp.maximum(
        n_present - 1.0, 1.0
    )
    noise_level = jnp.where(
        n_present == 0, 0.5,
        jnp.where(n_present <= 1, 0.0, jnp.minimum(1.0, jnp.sqrt(var))),
    )

    # dynamic range match (comparison.go:966-975)
    toff = _offsets(num_mfcc_coeffs)["temporal"]
    dr1, dr2 = query[toff], corpus[:, toff]
    t_avail = (q_avail[3] > 0) & (c_avail[:, 3] > 0)
    dynamic_range_match = jnp.where(
        t_avail & (dr1 > 0) & (dr2 > 0), _scalar_sim(dr1, dr2), 0.5
    )

    # spectral coherence (comparison.go:977-1008): mean |Pearson| over
    # centroid + rolloff series truncated to the common length
    n = jnp.minimum(q_len[None, :], c_len).astype(jnp.float32)    # [C, 2]
    t_axis = jnp.arange(q_series.shape[-1], dtype=jnp.float32)
    mask = t_axis[None, None, :] < n[..., None]                   # [C, 2, T]
    qb = q_series[None, :, :] * mask
    cb = c_series * mask
    nn = jnp.maximum(n, 1.0)
    mx = qb.sum(axis=-1) / nn                                     # [C, 2]
    my = cb.sum(axis=-1) / nn
    dx = (q_series[None, :, :] - mx[..., None]) * mask
    dy = (c_series - my[..., None]) * mask
    cov = (dx * dy).sum(axis=-1)
    vx = (dx * dx).sum(axis=-1)
    vy = (dy * dy).sum(axis=-1)
    # A series the host sees as exactly constant (float64 variance 0 ->
    # NaN corr -> skipped, comparison.py:_quality_metrics) can pick up a
    # tiny float32 variance here from mean-subtraction rounding, turning
    # a skipped series into a garbage near-zero corr that halves the
    # mean (caught on-chip: constant rolloff of a pure tone). Require a
    # relative std of > 1e-4 of the mean magnitude — genuine series sit
    # orders of magnitude above, float32 rounding noise (~1e-7 rel)
    # orders below.
    tol_x = (1e-4 * (jnp.abs(mx) + 1.0)) ** 2 * nn
    tol_y = (1e-4 * (jnp.abs(my) + 1.0)) ** 2 * nn
    valid = (n > 1) & (vx > tol_x) & (vy > tol_y)
    corr = jnp.abs(cov) / jnp.maximum(jnp.sqrt(vx * vy), _EPS)
    n_valid = valid.sum(axis=-1).astype(jnp.float32)
    spectral_coherence = jnp.where(
        n_valid > 0,
        (jnp.where(valid, corr, 0.0)).sum(axis=-1) / jnp.maximum(n_valid, 1.0),
        0.5,
    )

    # confidence WITH quality terms (comparison.go:1011-1037): the
    # availability/noise adjustments land before the [0, 1] clip
    overall = base["overall"]
    keep = content_match if content_filter else jnp.ones_like(content_match)
    conf = (
        0.5
        + jnp.where(overall > 0.8, 0.3, jnp.where(overall > 0.6, 0.2, 0.0))
        + jnp.where(content_match, 0.1, 0.0)
        + n_present * 0.05
        + data_availability * 0.1
        - noise_level * 0.1
    )
    base["confidence"] = jnp.where(keep, jnp.clip(conf, 0.0, 1.0), 0.0)
    base.update(
        data_availability=data_availability,
        feature_coverage=feature_coverage,
        temporal_alignment=temporal_alignment,
        noise_level=noise_level,
        dynamic_range_match=dynamic_range_match,
        spectral_coherence=spectral_coherence,
    )
    return base


def sharded_batched_similarity(
    query_vec: np.ndarray,
    corpus: np.ndarray,
    weights: np.ndarray,
    content_match: np.ndarray,
    mesh: Optional[Mesh] = None,
    num_mfcc_coeffs: int = 13,
    content_filter: bool = False,
    quality: Optional[Tuple] = None,
) -> Dict[str, np.ndarray]:
    """batched_similarity with the corpus rows sharded over a mesh
    ("data" axis); XLA keeps the whole chain local per shard (no
    collectives until a consumer reduces). Pads to a device multiple.

    `quality` = (q_avail, q_dur, q_series, q_len, c_avail, c_dur,
    c_series, c_len) engages the detailed-metrics kernel; the corpus
    series shard over "data" alongside the stats matrix."""
    c = corpus.shape[0]
    if mesh is not None:
        n_dev = int(np.prod(list(mesh.shape.values())))
        pad = (-c) % n_dev

        def shard(x, spec):
            if pad:
                x = np.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))
            return jax.device_put(jnp.asarray(x), NamedSharding(mesh, spec))

        def rep(x):
            return jax.device_put(jnp.asarray(x), NamedSharding(mesh, P()))

        corpus_dev = shard(corpus, P("data", None))
        match_dev = shard(content_match, P("data"))
        query_dev = rep(query_vec)
    else:
        shard = lambda x, spec: jnp.asarray(x)
        rep = jnp.asarray
        corpus_dev = jnp.asarray(corpus)
        match_dev = jnp.asarray(content_match)
        query_dev = jnp.asarray(query_vec)
    if quality is None:
        out = batched_similarity(
            query_dev, corpus_dev, jnp.asarray(weights), match_dev,
            num_mfcc_coeffs=num_mfcc_coeffs, content_filter=content_filter,
        )
    else:
        q_avail, q_dur, q_series, q_len, c_avail, c_dur, c_series, c_len = quality
        out = batched_similarity_detailed(
            query_dev, corpus_dev, jnp.asarray(weights), match_dev,
            rep(q_avail), shard(c_avail, P("data", None)),
            rep(np.float32(q_dur)), shard(c_dur, P("data")),
            rep(q_series), shard(c_series, P("data", None, None)),
            rep(q_len), shard(c_len, P("data", None)),
            num_mfcc_coeffs=num_mfcc_coeffs, content_filter=content_filter,
        )
    # one host round trip for the whole result dict (per-array fetches
    # each pay the remote-link latency — see docs/PERF.md rule 6)
    return {k: v[:c] for k, v in jax.device_get(out).items()}
