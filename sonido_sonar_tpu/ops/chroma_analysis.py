"""Chroma vector/sequence analysis: stats, distances, OTI, sequence
similarity (6 methods), pitch-class relationships, Tonnetz.

Reference parity: algorithms/chroma/ —
  chroma_vector.go: 12-d stats (energy/centroid/entropy/sparsity/
    uniformity), distances (cosine, euclidean, correlation, KL, JS,
    Hellinger), optimal circular shift (OTI), interpolation, smoothing,
    dominant chroma, templates (:12-330);
  chroma_similarity.go: Direct (cross-similarity mean, optional
    transposition invariance), Binary (threshold 0.4), Smith-Waterman
    (gap penalty 0.1), DTW (slanted band, exp(-d) similarity), QMax
    (diagonal maxima), OTI (:8-450);
  pitch_class.go: circle of fifths, key relationships, transposition
    search (:27-441);
  tonnetz.go: lattice coordinates (fifths x-axis, major-third y in
    sqrt(3)/2 steps, :60-107), trajectory/movement, harmonic tension,
    consonance, voice leading (:31-565). The 6-d tonal centroid
    (Harte-style fifth/minor-third/major-third circles) is included as
    the standard embedding the survey names.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sonido_sonar_tpu.ops.chroma import CHROMA_LABELS

_EPS = 1e-10


# ---------------------------------------------------------------------
# Chroma vector analysis (chroma_vector.go)
# ---------------------------------------------------------------------

def chroma_stats(cv: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """ComputeStats (chroma_vector.go:96-144): energy, centroid (circular
    pitch-class mean), entropy, sparsity, uniformity. cv: [..., 12]."""
    energy = jnp.sqrt(jnp.sum(cv * cv, axis=-1))
    total = jnp.sum(cv, axis=-1, keepdims=True)
    p = jnp.where(total > _EPS, cv / jnp.maximum(total, _EPS), 0.0)
    # circular centroid over pitch-class angles
    angles = 2.0 * jnp.pi * jnp.arange(12) / 12.0
    cx = jnp.sum(p * jnp.cos(angles), axis=-1)
    cy = jnp.sum(p * jnp.sin(angles), axis=-1)
    centroid = jnp.mod(jnp.arctan2(cy, cx) / (2.0 * jnp.pi) * 12.0, 12.0)
    entropy = jnp.sum(
        jnp.where(p > _EPS, -p * jnp.log2(jnp.maximum(p, _EPS)), 0.0), axis=-1
    )
    l1 = jnp.sum(jnp.abs(cv), axis=-1)
    l2 = jnp.sqrt(jnp.sum(cv * cv, axis=-1))
    sparsity = jnp.where(
        l1 > _EPS,
        (jnp.sqrt(12.0) - l1 / jnp.maximum(l2, _EPS)) / (jnp.sqrt(12.0) - 1.0),
        0.0,
    )
    uniformity = 1.0 - jnp.std(p, axis=-1) / jnp.maximum(jnp.mean(p, axis=-1), _EPS) / jnp.sqrt(11.0)
    return {
        "energy": energy,
        "centroid": centroid,
        "entropy": entropy,
        "sparsity": jnp.clip(sparsity, 0.0, 1.0),
        "uniformity": jnp.clip(uniformity, 0.0, 1.0),
    }


def chroma_distance(a: jnp.ndarray, b: jnp.ndarray, metric: str = "cosine") -> jnp.ndarray:
    """Distance (chroma_vector.go:146-170)."""
    from sonido_sonar_tpu.ops.stats import distance as D

    fns = {
        "cosine": D.cosine,
        "euclidean": D.euclidean,
        "correlation": D.pearson,
        "kl": D.kl_divergence,
        "js": D.js_divergence,
        "hellinger": D.hellinger,
    }
    if metric not in fns:
        raise ValueError(f"unknown chroma distance {metric}")
    return fns[metric](a, b)


def chroma_similarity(a: jnp.ndarray, b: jnp.ndarray, metric: str = "cosine") -> jnp.ndarray:
    """Similarity = 1 - distance, clamped (chroma_vector.go:172-187)."""
    return jnp.clip(1.0 - chroma_distance(a, b, metric), 0.0, 1.0)


def circular_shift(cv: jnp.ndarray, shift: int) -> jnp.ndarray:
    """CircularShift (chroma_vector.go:207-217)."""
    return jnp.roll(cv, shift, axis=-1)


def optimal_transposition(
    a: jnp.ndarray, b: jnp.ndarray, metric: str = "cosine"
) -> Tuple[int, float]:
    """ShiftOptimal / OTI (chroma_vector.go:189-205): shift of `a`
    maximizing similarity to `b`."""
    best_shift, best_sim = 0, -1.0
    for s in range(12):
        sim = float(chroma_similarity(jnp.roll(a, s, axis=-1), b, metric))
        if sim > best_sim:
            best_shift, best_sim = s, sim
    return best_shift, best_sim


def interpolate_chroma(a: jnp.ndarray, b: jnp.ndarray, t: float) -> jnp.ndarray:
    """Interpolate (chroma_vector.go:219-243)."""
    return (1.0 - t) * a + t * b


def smooth_chroma(seq: jnp.ndarray, window: int = 3) -> jnp.ndarray:
    """Moving-average smoothing over the time axis
    (chroma_vector.go:245-278). seq: [T, 12]."""
    pad = window // 2
    padded = jnp.pad(seq, ((pad, pad), (0, 0)), mode="edge")
    idx = jnp.arange(seq.shape[0])[:, None] + jnp.arange(window)[None, :]
    return jnp.mean(padded[idx], axis=1)


def dominant_chroma(cv: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """FindDominantChroma (chroma_vector.go:280-293)."""
    return jnp.argmax(cv, axis=-1), jnp.max(cv, axis=-1)


def chroma_template(seq: jnp.ndarray) -> jnp.ndarray:
    """ComputeChromaTemplate: normalized mean (chroma_vector.go:295-318)."""
    mean = jnp.mean(seq, axis=-2)
    total = jnp.sum(mean, axis=-1, keepdims=True)
    return jnp.where(total > _EPS, mean / jnp.maximum(total, _EPS), mean)


# ---------------------------------------------------------------------
# Chroma sequence similarity (chroma_similarity.go)
# ---------------------------------------------------------------------

@dataclass
class ChromaSimilarityResult:
    """ChromaSimilarityResult (chroma_similarity.go:30-55)."""

    similarity_matrix: np.ndarray
    overall_similarity: float
    method: str
    best_transposition: int = 0
    query_frames: int = 0
    reference_frames: int = 0


def _cross_similarity_matrix(q: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    """Cosine cross-similarity [Tq, Tr] — one MXU matmul."""
    qn = jnp.linalg.norm(q, axis=-1, keepdims=True)
    rn = jnp.linalg.norm(r, axis=-1, keepdims=True)
    sim = jnp.matmul(
        q, r.T, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ) / jnp.maximum(qn * rn.T, _EPS)
    return jnp.clip(sim, -1.0, 1.0)


class ChromaSequenceSimilarity:
    """ChromaSequenceSimilarity.ComputeSimilarity
    (chroma_similarity.go:59-101). Defaults: binary threshold 0.4, gap
    penalty 0.1, OTI radius 10."""

    def __init__(
        self,
        method: str = "direct",
        binary_threshold: float = 0.4,
        gap_penalty: float = 0.1,
        dtw_band_radius: int = 0,
        transposition_invariant: bool = False,
    ):
        self.method = method
        self.binary_threshold = binary_threshold
        self.gap_penalty = gap_penalty
        self.dtw_band_radius = dtw_band_radius
        self.transposition_invariant = transposition_invariant

    def compute(self, query: jnp.ndarray, reference: jnp.ndarray) -> ChromaSimilarityResult:
        q = jnp.asarray(query, dtype=jnp.float32)
        r = jnp.asarray(reference, dtype=jnp.float32)
        dispatch = {
            "direct": self._direct,
            "binary": self._binary,
            "smith_waterman": self._smith_waterman,
            "dtw": self._dtw,
            "qmax": self._qmax,
            "oti": self._oti,
        }
        if self.method not in dispatch:
            raise ValueError(f"unknown chroma similarity method {self.method}")
        return dispatch[self.method](q, r)

    # -- direct (:105-160) ------------------------------------------------
    def _direct(self, q, r) -> ChromaSimilarityResult:
        shift = 0
        if self.transposition_invariant:
            shift, _ = optimal_transposition(chroma_template(q), chroma_template(r))
            q = jnp.roll(q, shift, axis=-1)
        sim = _cross_similarity_matrix(q, r)
        return ChromaSimilarityResult(
            np.asarray(sim), float(jnp.mean(sim)), "direct", shift,
            q.shape[0], r.shape[0],
        )

    # -- binary (:162-200) ---------------------------------------------------
    def _binary(self, q, r) -> ChromaSimilarityResult:
        direct = self._direct(q, r)
        binary = (direct.similarity_matrix > self.binary_threshold).astype(np.float32)
        return ChromaSimilarityResult(
            binary, float(binary.mean()), "binary", direct.best_transposition,
            q.shape[0], r.shape[0],
        )

    # -- Smith-Waterman (:202-270) --------------------------------------------
    def _smith_waterman(self, q, r) -> ChromaSimilarityResult:
        sim = _cross_similarity_matrix(q, r)
        gap = self.gap_penalty
        tq = sim.shape[0]

        def row_step(prev_row, sim_row):
            # S[j] = max(0, diag + sim, up - gap, S[j-1] - gap)
            up = prev_row[1:]
            diag = prev_row[:-1]
            a = jnp.maximum(0.0, jnp.maximum(diag + sim_row, up - gap))

            def combine(x, y):
                gx, ax = x
                gy, ay = y
                return gx + gy, jnp.maximum(ax - gy, ay)

            g = jnp.full_like(sim_row, gap)
            _, s = jax.lax.associative_scan(combine, (g, a))
            new_row = jnp.concatenate([jnp.zeros(1), s])
            return new_row, s

        row0 = jnp.zeros(sim.shape[1] + 1)
        _, rows = jax.lax.scan(row_step, row0, sim)
        max_score = float(jnp.max(rows))
        # normalize by the shorter sequence (alignment length proxy)
        norm = max_score / max(min(sim.shape), 1)
        return ChromaSimilarityResult(
            np.asarray(rows), norm, "smith_waterman", 0, sim.shape[0], sim.shape[1]
        )

    # -- DTW (:274-352) ----------------------------------------------------------
    def _dtw(self, q, r) -> ChromaSimilarityResult:
        from sonido_sonar_tpu.ops.stats.dtw import _minplus_row_scan

        sim = _cross_similarity_matrix(q, r)
        cost = 1.0 - sim  # cosine distance matrix
        tq, tr = cost.shape
        big = jnp.float32(1e18)

        if self.dtw_band_radius > 0:
            # slanted band: |j - i*Tr/Tq| <= radius (chroma_similarity.go
            # band via expectedJ)
            ii = jnp.arange(tq)[:, None]
            jj = jnp.arange(tr)[None, :]
            expected = (jj * tq / tr).astype(jnp.int32)
            cost = jnp.where(jnp.abs(ii - expected) <= self.dtw_band_radius, cost, big)

        row0 = jnp.concatenate([jnp.zeros(1), jnp.full((tr,), big)])

        def row_step(prev, l_row):
            up = prev[1:]
            diag = prev[:-1]
            v = jnp.minimum(up, diag)
            a = jnp.minimum(l_row + v, big)
            d = _minplus_row_scan(a, jnp.minimum(l_row, big))
            new_row = jnp.concatenate([jnp.full((1,), big), jnp.minimum(d, big)])
            return new_row, None

        last, _ = jax.lax.scan(row_step, row0, cost)
        total = float(last[-1])
        path_len = max(tq, tr)  # proxy; reference normalizes by path length
        dtw_distance = total / path_len
        overall = float(np.exp(-dtw_distance))
        return ChromaSimilarityResult(
            np.asarray(jnp.exp(-cost)), overall, "dtw", 0, tq, tr
        )

    # -- QMax (:360-420) -----------------------------------------------------------
    def _qmax(self, q, r) -> ChromaSimilarityResult:
        sim = np.asarray(_cross_similarity_matrix(q, r))
        tq, tr = sim.shape
        diag_maxima = []
        for d in range(-(tr - 1), tq):
            diag = np.diagonal(sim, offset=-d)
            if len(diag):
                diag_maxima.append(diag.max())
        overall = float(np.mean(diag_maxima)) if diag_maxima else 0.0
        return ChromaSimilarityResult(sim, overall, "qmax", 0, tq, tr)

    # -- OTI (:422-450) ---------------------------------------------------------------
    def _oti(self, q, r) -> ChromaSimilarityResult:
        shift, _ = optimal_transposition(chroma_template(q), chroma_template(r))
        res = self._direct(jnp.roll(q, shift, axis=-1), r)
        res.method = "oti"
        res.best_transposition = shift
        return res


# ---------------------------------------------------------------------
# Pitch-class relationships (pitch_class.go)
# ---------------------------------------------------------------------

CIRCLE_OF_FIFTHS = [0, 7, 2, 9, 4, 11, 6, 1, 8, 3, 10, 5]  # C G D A E B F# C# G# D# A# F


def fifths_distance(pc1: int, pc2: int) -> int:
    """Steps around the circle of fifths (pitch_class.go circle logic)."""
    i1 = CIRCLE_OF_FIFTHS.index(pc1 % 12)
    i2 = CIRCLE_OF_FIFTHS.index(pc2 % 12)
    d = abs(i1 - i2)
    return min(d, 12 - d)


def key_relationship(root1: int, mode1: str, root2: int, mode2: str) -> str:
    """Key relationship classification (pitch_class.go:27-200)."""
    if root1 == root2 and mode1 == mode2:
        return "identical"
    if root1 == root2:
        return "parallel"
    if mode1 == "major" and mode2 == "minor" and (root1 - root2) % 12 == 3:
        return "relative"
    if mode1 == "minor" and mode2 == "major" and (root2 - root1) % 12 == 3:
        return "relative"
    if mode1 == mode2 and (root2 - root1) % 12 in (5, 7):
        return "dominant" if (root2 - root1) % 12 == 7 else "subdominant"
    if fifths_distance(root1, root2) <= 2:
        return "close"
    return "distant"


_MAJOR_SCALE = {0, 2, 4, 5, 7, 9, 11}


def diatonic_membership(pc: int, key_root: int, mode: str = "major") -> bool:
    """Is pitch class diatonic to the key? (pitch_class.go diatonic)."""
    rel = (pc - key_root) % 12
    if mode == "major":
        return rel in _MAJOR_SCALE
    return rel in {0, 2, 3, 5, 7, 8, 10}  # natural minor


def transposition_search(profile: jnp.ndarray, target: jnp.ndarray) -> Tuple[int, float]:
    """Best transposition of profile onto target (pitch_class.go
    transposition search)."""
    return optimal_transposition(profile, target, "cosine")


# ---------------------------------------------------------------------
# Tonnetz (tonnetz.go)
# ---------------------------------------------------------------------

def _tonnetz_lattice_coords() -> np.ndarray:
    """Reference 2-D lattice (tonnetz.go:47-107): x = circle-of-fifths
    position, y in sqrt(3)/2 steps by major-third class."""
    fifths_x = {0: 0, 7: 1, 2: 2, 9: 3, 4: 4, 11: 5, 6: 6,
                1: -5, 8: -4, 3: -3, 10: -2, 5: -1}
    y_groups = {
        (4, 8, 0): 0.0,
        (7, 11, 3): np.sqrt(3.0) / 2.0,
        (10, 2, 6): -np.sqrt(3.0) / 2.0,
        (1, 5, 9): np.sqrt(3.0),
    }
    coords = np.zeros((12, 2))
    for pc in range(12):
        coords[pc, 0] = fifths_x[pc]
        for group, y in y_groups.items():
            if pc in group:
                coords[pc, 1] = y
    return coords


TONNETZ_LATTICE = _tonnetz_lattice_coords()


def _tonal_centroid_matrix() -> np.ndarray:
    """Standard 6-d tonal centroid transform [6, 12] (fifths r=1,
    minor thirds r=1, major thirds r=0.5 circles)."""
    pc = np.arange(12)
    t = np.zeros((6, 12))
    t[0] = np.sin(pc * 7 * np.pi / 6.0)
    t[1] = np.cos(pc * 7 * np.pi / 6.0)
    t[2] = np.sin(pc * 3 * np.pi / 2.0)
    t[3] = np.cos(pc * 3 * np.pi / 2.0)
    t[4] = 0.5 * np.sin(pc * 2 * np.pi / 3.0)
    t[5] = 0.5 * np.cos(pc * 2 * np.pi / 3.0)
    return t.astype(np.float32)


_TONAL_CENTROID = _tonal_centroid_matrix()


def tonal_centroid(chroma: jnp.ndarray) -> jnp.ndarray:
    """6-d tonal centroid per frame, [..., 12] -> [..., 6]."""
    total = jnp.sum(jnp.abs(chroma), axis=-1, keepdims=True)
    normed = jnp.where(total > _EPS, chroma / jnp.maximum(total, _EPS), chroma)
    return jnp.matmul(
        normed, jnp.asarray(_TONAL_CENTROID).T, preferred_element_type=jnp.float32
    )


def tonnetz_point(chroma: jnp.ndarray) -> jnp.ndarray:
    """Weighted 2-D lattice centroid (tonnetz.go ComputeTonnetz),
    [..., 12] -> [..., 2]."""
    total = jnp.sum(chroma, axis=-1, keepdims=True)
    w = jnp.where(total > _EPS, chroma / jnp.maximum(total, _EPS), chroma)
    return jnp.matmul(w, jnp.asarray(TONNETZ_LATTICE, dtype=jnp.float32))


def tonnetz_trajectory(chroma_seq: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Trajectory/movement analysis (tonnetz.go:200-330): per-frame
    centroid, step distances, total path length, mean speed."""
    pts = tonal_centroid(chroma_seq)  # [T, 6]
    steps = jnp.linalg.norm(pts[1:] - pts[:-1], axis=-1)
    return {
        "centroids": pts,
        "step_distances": steps,
        "path_length": jnp.sum(steps),
        "mean_speed": jnp.mean(steps) if steps.shape[0] else jnp.asarray(0.0),
        "stability": 1.0 / (1.0 + jnp.mean(steps)),
    }


_CONSONANT_INTERVALS = {0: 1.0, 7: 0.9, 5: 0.8, 4: 0.7, 3: 0.7, 8: 0.6, 9: 0.6}
_DISSONANT_INTERVALS = {1: 0.9, 11: 0.9, 6: 0.8, 2: 0.5, 10: 0.5}


def harmonic_tension(chroma: jnp.ndarray) -> jnp.ndarray:
    """Pairwise interval dissonance weighted by chroma energy
    (tonnetz.go tension :350-420)."""
    diss = np.zeros((12, 12), dtype=np.float32)
    for i in range(12):
        for j in range(12):
            iv = (j - i) % 12
            diss[i, j] = _DISSONANT_INTERVALS.get(iv, 0.0)
    c = chroma / jnp.maximum(jnp.sum(chroma, axis=-1, keepdims=True), _EPS)
    return jnp.einsum("...i,ij,...j->...", c, jnp.asarray(diss), c)


def consonance(chroma: jnp.ndarray) -> jnp.ndarray:
    """Complement measure with consonant interval weights
    (tonnetz.go consonance)."""
    cons = np.zeros((12, 12), dtype=np.float32)
    for i in range(12):
        for j in range(12):
            iv = (j - i) % 12
            cons[i, j] = _CONSONANT_INTERVALS.get(iv, 0.0)
    c = chroma / jnp.maximum(jnp.sum(chroma, axis=-1, keepdims=True), _EPS)
    return jnp.einsum("...i,ij,...j->...", c, jnp.asarray(cons), c)


def voice_leading_distance(chroma1: jnp.ndarray, chroma2: jnp.ndarray) -> jnp.ndarray:
    """Minimal total pitch-class movement between two chroma
    distributions (tonnetz.go voice leading :480-565) — 1-D circular EMD
    approximated by the best-rotation linear EMD."""
    p = chroma1 / jnp.maximum(jnp.sum(chroma1, axis=-1, keepdims=True), _EPS)
    q = chroma2 / jnp.maximum(jnp.sum(chroma2, axis=-1, keepdims=True), _EPS)
    diff = p - q
    # circular EMD: min over K of sum |cumsum(diff) - K| (exact for circles)
    c = jnp.cumsum(diff, axis=-1)
    k = jnp.median(c, axis=-1, keepdims=True)
    return jnp.sum(jnp.abs(c - k), axis=-1)
