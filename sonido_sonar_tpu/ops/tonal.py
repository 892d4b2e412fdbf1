"""Tonal analysis: key estimation, chord detection, HNR, inharmonicity,
and the multi-method pitch-detection facade.

Reference parity: algorithms/tonal/*.go —
  key_estimation.go: 12-bin chroma x 24 key correlation against 7
    profile sets (Krumhansl-Schmuckler, Temperley, Shaath, EDMA, Bgate,
    Diatonic, TonicTriad — constants verbatim from :404-463), sequence
    mode with temporal stability + modulation detection (:250-273);
  chord_detection.go: template matching over chord qualities and
    inversions, candidate ranking, progression analyzer (:16-247, 1109);
  harmonic_ratio.go: HNR via harmonic-peaks-vs-noise-floor, ACF, HPS,
    comb, spectral methods; voicing decision; temporal tracking
    (:101-205, 297-1080);
  inharmonicity.go: partial deviation vs ideal harmonics (:15-200);
  pitch_detection.go: method facade (YIN, ACF, NSDF/MPM, HPS, cepstrum,
    spectral peaks, zero-crossing + hybrids :730-741), octave
    correction, median filtering, vibrato analysis (:767-1116).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from sonido_sonar_tpu.ops.chroma import CHROMA_LABELS
from sonido_sonar_tpu.ops.harmonic import detect_spectral_peaks, estimate_f0_hps
from sonido_sonar_tpu.ops.pitch import PitchParams, acf_pitch, median_filter_pitch, yin_pitch

_EPS = 1e-10

# ---------------------------------------------------------------------
# Key estimation (key_estimation.go)
# ---------------------------------------------------------------------

# verbatim profile constants (key_estimation.go:404-463)
KEY_PROFILES: Dict[str, Dict[str, np.ndarray]] = {
    "krumhansl": {
        "major": np.array([6.35, 2.23, 3.48, 2.33, 4.38, 4.09, 2.52, 5.19, 2.39, 3.66, 2.29, 2.88]),
        "minor": np.array([6.33, 2.68, 3.52, 5.38, 2.60, 3.53, 2.54, 4.75, 3.98, 2.69, 3.34, 3.17]),
    },
    "temperley": {
        "major": np.array([5.0, 2.0, 3.5, 2.0, 4.5, 4.0, 2.0, 4.5, 2.0, 3.5, 1.5, 4.0]),
        "minor": np.array([5.0, 2.0, 3.5, 4.5, 2.0, 4.0, 2.0, 4.5, 3.5, 2.0, 1.5, 4.0]),
    },
    "shaath": {
        "major": np.array([6.6, 2.0, 3.5, 2.3, 4.6, 4.0, 2.5, 5.2, 2.4, 3.7, 2.3, 3.4]),
        "minor": np.array([6.5, 2.7, 3.5, 5.4, 2.6, 3.5, 2.5, 4.7, 4.0, 2.7, 3.4, 3.2]),
    },
    "edma": {
        "major": np.array([17.7661, 0.145624, 14.9265, 0.160186, 19.8049, 11.3587, 0.291248, 22.062, 0.145624, 8.15494, 0.232998, 4.95122]),
        "minor": np.array([18.2648, 0.737619, 14.0499, 16.8599, 0.702494, 14.4362, 0.702494, 18.6161, 4.56621, 1.93186, 7.37619, 1.75623]),
    },
    "bgate": {
        "major": np.array([16.8, 0.86, 12.95, 1.41, 13.49, 11.93, 1.25, 20.28, 1.80, 8.04, 0.62, 10.57]),
        "minor": np.array([18.16, 0.69, 12.99, 13.34, 1.07, 11.15, 1.38, 21.07, 7.49, 1.53, 6.24, 1.61]),
    },
    "diatonic": {
        "major": np.array([5.0, 0.0, 3.0, 0.0, 4.0, 3.5, 0.0, 4.5, 0.0, 3.0, 0.0, 2.0]),
        "minor": np.array([5.0, 0.0, 3.0, 3.5, 0.0, 3.5, 0.0, 4.5, 3.0, 0.0, 2.0, 0.0]),
    },
    "tonic_triad": {
        "major": np.array([5.0, 0.0, 0.0, 0.0, 3.0, 0.0, 0.0, 4.0, 0.0, 0.0, 0.0, 0.0]),
        "minor": np.array([5.0, 0.0, 0.0, 3.0, 0.0, 0.0, 0.0, 4.0, 0.0, 0.0, 0.0, 0.0]),
    },
}


@dataclass
class KeyEstimationResult:
    """KeyEstimationResult (key_estimation.go:130-160)."""

    key: str
    mode: str  # "major" | "minor"
    strength: float
    confidence: float  # first-vs-second margin
    all_correlations: np.ndarray  # [24]
    profile: str = "krumhansl"
    stability: float = 0.0
    modulations: List[dict] = field(default_factory=list)


def _profile_matrix(profile: str) -> np.ndarray:
    """[24, 12]: rows 0-11 major roots, 12-23 minor roots."""
    p = KEY_PROFILES[profile]
    rows = [np.roll(p["major"], r) for r in range(12)]
    rows += [np.roll(p["minor"], r) for r in range(12)]
    return np.stack(rows).astype(np.float32)


def _pearson_rows(v: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    vm = v - jnp.mean(v)
    mm = m - jnp.mean(m, axis=-1, keepdims=True)
    num = jnp.sum(vm * mm, axis=-1)
    den = jnp.sqrt(jnp.sum(vm * vm) * jnp.sum(mm * mm, axis=-1))
    return jnp.where(den > _EPS, num / jnp.maximum(den, _EPS), 0.0)


class KeyEstimator:
    """KeyEstimator (key_estimation.go:13-124)."""

    def __init__(self, profile: str = "krumhansl"):
        if profile not in KEY_PROFILES:
            raise ValueError(f"unknown key profile {profile}")
        self.profile = profile
        self._matrix = jnp.asarray(_profile_matrix(profile))

    def estimate_key(self, chroma_vector) -> KeyEstimationResult:
        """EstimateKey (key_estimation.go:196-233): Pearson correlation
        against all 24 shifted profiles."""
        v = jnp.asarray(np.asarray(chroma_vector, dtype=np.float32))
        corr = np.asarray(_pearson_rows(v, self._matrix))
        order = np.argsort(corr)[::-1]
        best = int(order[0])
        margin = float(corr[order[0]] - corr[order[1]])
        return KeyEstimationResult(
            key=CHROMA_LABELS[best % 12],
            mode="major" if best < 12 else "minor",
            strength=float(corr[best]),
            confidence=margin,
            all_correlations=corr,
            profile=self.profile,
        )

    def estimate_key_sequence(self, chroma_seq) -> KeyEstimationResult:
        """EstimateKeySequence (key_estimation.go:250-273): average
        chroma + stability + modulation detection."""
        seq = np.asarray(chroma_seq, dtype=np.float32)  # [T, 12]
        result = self.estimate_key(seq.mean(axis=0))
        # temporal stability: fraction of windows agreeing with the key
        win = max(len(seq) // 8, 4)
        keys = []
        for start in range(0, max(len(seq) - win, 1), win):
            sub = seq[start : start + win].mean(axis=0)
            keys.append(self.estimate_key(sub))
        agree = sum(
            1 for k in keys if (k.key, k.mode) == (result.key, result.mode)
        )
        result.stability = agree / max(len(keys), 1)
        # modulation detection: windowed key changes (:260-270)
        if len(seq) > 10:
            prev = None
            for i, k in enumerate(keys):
                cur = (k.key, k.mode)
                if prev is not None and cur != prev and k.confidence > 0.05:
                    result.modulations.append(
                        {"window": i, "from": prev, "to": cur, "strength": k.strength}
                    )
                prev = cur
        return result


# ---------------------------------------------------------------------
# Chord detection (chord_detection.go)
# ---------------------------------------------------------------------

# chord quality templates over pitch classes relative to root
CHORD_QUALITIES: Dict[str, List[int]] = {
    "major": [0, 4, 7],
    "minor": [0, 3, 7],
    "diminished": [0, 3, 6],
    "augmented": [0, 4, 8],
    "sus2": [0, 2, 7],
    "sus4": [0, 5, 7],
    "major7": [0, 4, 7, 11],
    "minor7": [0, 3, 7, 10],
    "dominant7": [0, 4, 7, 10],
}


@dataclass
class ChordCandidate:
    root: str
    quality: str
    score: float
    inversion: int = 0


@dataclass
class ChordDetectionResult:
    chord: str
    root: str
    quality: str
    confidence: float
    candidates: List[ChordCandidate] = field(default_factory=list)


def _chord_template_matrix() -> Tuple[np.ndarray, List[Tuple[str, str]]]:
    rows, labels = [], []
    for quality, intervals in CHORD_QUALITIES.items():
        base = np.zeros(12)
        for iv in intervals:
            base[iv] = 1.0
        base /= np.linalg.norm(base)
        for root in range(12):
            rows.append(np.roll(base, root))
            labels.append((CHROMA_LABELS[root], quality))
    return np.stack(rows).astype(np.float32), labels


_CHORD_MATRIX, _CHORD_LABELS = _chord_template_matrix()


class ChordDetector:
    """ChordDetector (chord_detection.go:16-247): cosine template match
    over qualities x 12 roots."""

    def __init__(self, qualities: Optional[List[str]] = None):
        self._matrix = jnp.asarray(_CHORD_MATRIX)
        self._labels = _CHORD_LABELS
        self._allowed = set(qualities) if qualities else None

    def detect_chord(self, chroma_vector, top_k: int = 5) -> ChordDetectionResult:
        v = np.asarray(chroma_vector, dtype=np.float32)
        nv = np.linalg.norm(v)
        if nv < _EPS:
            return ChordDetectionResult("N", "N", "none", 0.0)
        sims = np.asarray(
            jnp.matmul(self._matrix, jnp.asarray(v / nv), preferred_element_type=jnp.float32)
        )
        if self._allowed is not None:
            for i, (_, q) in enumerate(self._labels):
                if q not in self._allowed:
                    sims[i] = -np.inf
        order = np.argsort(sims)[::-1]
        cands = [
            ChordCandidate(self._labels[i][0], self._labels[i][1], float(sims[i]))
            for i in order[:top_k]
        ]
        best = cands[0]
        margin = float(sims[order[0]] - sims[order[1]]) if len(order) > 1 else 1.0
        return ChordDetectionResult(
            chord=f"{best.root}{'' if best.quality == 'major' else ':' + best.quality}",
            root=best.root,
            quality=best.quality,
            confidence=min(1.0, max(0.0, best.score * 0.5 + margin * 2.0)),
            candidates=cands,
        )

    def detect_sequence(self, chroma_seq) -> List[ChordDetectionResult]:
        return [self.detect_chord(c) for c in np.asarray(chroma_seq)]


class ChordProgressionAnalyzer:
    """ChordProgressionAnalyzer (chord_detection.go:1109-...): smoothing
    + transition statistics."""

    def __init__(self, detector: Optional[ChordDetector] = None, min_run: int = 2):
        self.detector = detector or ChordDetector()
        self.min_run = min_run

    def analyze(self, chroma_seq) -> dict:
        raw = self.detector.detect_sequence(chroma_seq)
        chords = [r.chord for r in raw]
        # run-length smoothing: drop runs shorter than min_run
        smoothed: List[str] = []
        i = 0
        while i < len(chords):
            j = i
            while j < len(chords) and chords[j] == chords[i]:
                j += 1
            if j - i >= self.min_run or not smoothed:
                smoothed.extend(chords[i:j])
            else:
                smoothed.extend([smoothed[-1]] * (j - i))
            i = j
        # progression = deduped sequence
        progression = [smoothed[0]] if smoothed else []
        for c in smoothed[1:]:
            if c != progression[-1]:
                progression.append(c)
        changes = len(progression) - 1
        return {
            "chords": smoothed,
            "progression": progression,
            "num_changes": changes,
            "change_rate": changes / max(len(smoothed), 1),
            "unique_chords": len(set(smoothed)),
        }


# ---------------------------------------------------------------------
# Harmonic ratio / HNR (harmonic_ratio.go)
# ---------------------------------------------------------------------

@dataclass
class HarmonicRatioResult:
    """HarmonicRatioResult fields used downstream."""

    harmonic_ratio: jnp.ndarray   # HNR in dB
    voicing: jnp.ndarray          # bool
    f0: jnp.ndarray


class HarmonicRatioAnalyzer:
    """HarmonicRatioAnalyzer.AnalyzeFrame (harmonic_ratio.go:101-205).

    Methods: 'acf' (normalized autocorrelation at the period — the live
    default), 'yin' (1 - cmndf), 'hps', 'spectral' (harmonic peaks vs
    noise floor from the magnitude spectrum).
    """

    def __init__(self, sample_rate: int, method: str = "acf",
                 min_f0: float = 50.0, max_f0: float = 1000.0,
                 voicing_threshold: float = 0.45):
        self.sample_rate = sample_rate
        self.method = method
        self.params = PitchParams(
            sample_rate=sample_rate, min_freq=min_f0, max_freq=max_f0
        )
        self.voicing_threshold = voicing_threshold

    def analyze_frames(self, frames: jnp.ndarray) -> HarmonicRatioResult:
        """frames: [..., W] -> HNR dB per frame."""
        from sonido_sonar_tpu.ops.speech import hnr_acf

        if self.method == "acf":
            pitch, conf = acf_pitch(frames, self.params)
            hnr = hnr_acf(frames, self.sample_rate, jnp.maximum(pitch, 1.0))
            hnr = jnp.where(pitch > 0, hnr, 0.0)
            voiced = conf > self.voicing_threshold
            return HarmonicRatioResult(hnr, voiced, pitch)
        if self.method == "yin":
            pitch, conf, voicing = yin_pitch(frames, self.params)
            r = jnp.clip(conf, _EPS, 1.0 - 1e-6)
            hnr = 10.0 * jnp.log10(r / (1.0 - r))
            hnr = jnp.where(pitch > 0, hnr, 0.0)
            return HarmonicRatioResult(hnr, voicing > self.voicing_threshold, pitch)
        if self.method in ("hnr", "comb"):
            # analyzeHNR's harmonic-mask energy split on the frame
            # spectra; the reference's comb method falls back to it
            # (harmonic_ratio.go:456-461)
            w = frames.shape[-1]
            window = jnp.asarray(np.hanning(w).astype(np.float32))
            mag = jnp.abs(jnp.fft.rfft(frames * window, axis=-1))
            pitch, conf = acf_pitch(frames, self.params)
            hnr = self.analyze_spectrum_mask(mag, w, f0=pitch)
            voiced = conf > self.voicing_threshold
            return HarmonicRatioResult(hnr, voiced, pitch)
        raise ValueError(f"unknown HNR method {self.method}")

    def analyze_spectrum(
        self, magnitude: jnp.ndarray, window_size: int, num_harmonics: int = 8,
        noise_estimation: str = "percentile", noise_floor_percentile: float = 0.1,
        noise_floor_smoothing: int = 10,
    ) -> jnp.ndarray:
        """Spectral-method HNR: energy at harmonic bins of the HPS f0 vs
        the LOCAL-window noise floor (harmonic_ratio.go:632-705),
        [..., F] -> dB.

        noise_estimation selects the reference's estimator: "percentile"
        (NoiseFloorPercentile=0.1 default), "median", "minimum" — a
        20-bin sliding window over the magnitude spectrum, smoothed with
        a 10-bin moving average."""
        f0 = estimate_f0_hps(magnitude, self.sample_rate, window_size,
                             self.params.min_freq, self.params.max_freq)
        n_bins = magnitude.shape[-1]
        freq_res = self.sample_rate / float(window_size)
        power = magnitude * magnitude
        floor = local_noise_floor(
            magnitude, method=noise_estimation,
            percentile=noise_floor_percentile,
            smoothing_len=noise_floor_smoothing,
        )

        h = jnp.arange(1, num_harmonics + 1, dtype=jnp.float32)
        bins = jnp.clip(
            (f0[..., None] * h / freq_res).astype(jnp.int32), 0, n_bins - 1
        )
        harm_power = jnp.take_along_axis(power, bins, axis=-1)
        valid = bins > 0
        harm = jnp.sum(jnp.where(valid, harm_power, 0.0), axis=-1)
        # per-harmonic-bin local floor (squared: floor is in magnitude
        # units, harmonic_ratio.go:802) as the noise estimate at those
        # bins; floor it relative to total power so the ratio stays
        # finite on sparse spectra, and cap HNR at +-60 dB
        floor_power = jnp.take_along_axis(floor * floor, bins, axis=-1)
        noise_est = jnp.sum(jnp.where(valid, floor_power, 0.0), axis=-1)
        total_power = jnp.sum(power, axis=-1)
        noise = jnp.maximum(noise_est, total_power * 1e-6 + _EPS)
        hnr = 10.0 * jnp.log10(jnp.maximum(harm / noise, _EPS))
        return jnp.where(harm > 0, jnp.clip(hnr, -60.0, 60.0), 0.0)

    def analyze_spectrum_mask(
        self, magnitude: jnp.ndarray, window_size: int,
        num_harmonics: int = 10, peak_width: int = 3,
        f0: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """analyzeHNR's harmonic-mask energy split
        (harmonic_ratio.go:297-360): bins within +-peak_width of each
        expected harmonic of f0 are 'harmonic', the rest of the
        in-range bins are 'noise'; HNR = 10*log10(Eh/En), 60 dB when no
        noise energy. [..., F] -> dB."""
        n_bins = magnitude.shape[-1]
        freq_res = self.sample_rate / float(window_size)
        if f0 is None:
            f0 = estimate_f0_hps(magnitude, self.sample_rate, window_size,
                                 self.params.min_freq, self.params.max_freq)
        power = magnitude * magnitude
        bins = jnp.arange(n_bins)
        h = jnp.arange(1, num_harmonics + 1, dtype=jnp.float32)
        harm_bins = jnp.round(f0[..., None] * h / freq_res)  # [..., H]
        near = (
            jnp.abs(bins[..., None, :] - harm_bins[..., :, None]) <= peak_width
        )  # [..., H, F]
        in_band = (harm_bins * freq_res <= self.params.max_freq)[..., None]
        mask = jnp.any(near & in_band, axis=-2)  # [..., F]
        freqs = bins * freq_res
        in_range = (freqs >= self.params.min_freq) & (freqs <= self.params.max_freq)
        harm = jnp.sum(jnp.where(mask & in_range, power, 0.0), axis=-1)
        noise = jnp.sum(jnp.where((~mask) & in_range, power, 0.0), axis=-1)
        hnr = jnp.where(
            noise > 0,
            10.0 * jnp.log10(jnp.maximum(harm, _EPS) / jnp.maximum(noise, _EPS)),
            60.0,
        )
        return jnp.where(f0 > 0, hnr, 0.0)

    def spectral_snr(
        self, magnitude: jnp.ndarray, window_size: int,
        noise_estimation: str = "percentile",
        noise_floor_percentile: float = 0.1,
        noise_floor_smoothing: int = 10,
    ) -> jnp.ndarray:
        """calculateSNR (harmonic_ratio.go:793-814): total in-range
        signal power vs squared noise floor, dB (60 when floor is 0)."""
        floor = local_noise_floor(
            magnitude, method=noise_estimation,
            percentile=noise_floor_percentile,
            smoothing_len=noise_floor_smoothing,
        )
        n_bins = magnitude.shape[-1]
        freqs = jnp.arange(n_bins) * (self.sample_rate / float(window_size))
        in_range = (freqs >= self.params.min_freq) & (freqs <= self.params.max_freq)
        sig = jnp.sum(jnp.where(in_range, magnitude * magnitude, 0.0), axis=-1)
        noi = jnp.sum(jnp.where(in_range, floor * floor, 0.0), axis=-1)
        return jnp.where(
            noi > 0, 10.0 * jnp.log10(jnp.maximum(sig, _EPS) / jnp.maximum(noi, _EPS)),
            60.0,
        )


def moving_average(x: jnp.ndarray, window_size: int) -> jnp.ndarray:
    """common.MovingAverage (common/math.go:140-165): expanding mean
    over the first `window_size` points, trailing-window mean after.
    [..., N] -> [..., N]; window_size <= 0 or > N returns x unchanged."""
    n = x.shape[-1]
    if window_size <= 0 or window_size > n:
        return x
    zero = jnp.zeros(x.shape[:-1] + (1,), x.dtype)
    csum = jnp.concatenate([zero, jnp.cumsum(x, axis=-1)], axis=-1)
    i = jnp.arange(n)
    lo = jnp.where(i < window_size, 0, i - window_size + 1)
    cnt = jnp.where(i < window_size, i + 1, window_size).astype(x.dtype)
    return (
        jnp.take(csum, i + 1, axis=-1) - jnp.take(csum, lo, axis=-1)
    ) / cnt


def local_noise_floor(
    magnitude: jnp.ndarray,
    method: str = "percentile",
    percentile: float = 0.1,
    smoothing_len: int = 10,
    window_bins: int = 20,
) -> jnp.ndarray:
    """Local-window noise-floor estimators (harmonic_ratio.go:650-705):
    per-bin percentile / median (empirical quantile, as common.Percentile
    -> gonum stat.Quantile(Empirical)) / minimum over the [i-W/2, i+W/2)
    window, then common.MovingAverage smoothing. [..., F] -> [..., F].
    """
    f = magnitude.shape[-1]
    half = window_bins // 2
    i = jnp.arange(f)[:, None]
    k = jnp.arange(window_bins)[None, :]
    pos = i - half + k
    valid = (pos >= 0) & (pos < f)                        # [F, W]
    gathered = magnitude[..., jnp.clip(pos, 0, f - 1)]    # [..., F, W]
    masked = jnp.where(valid, gathered, jnp.inf)
    srt = jnp.sort(masked, axis=-1, stable=False)
    nv = jnp.sum(valid, axis=-1)                          # [F]
    if method == "minimum":
        floor = srt[..., 0]
    else:
        p = 0.5 if method == "median" else percentile
        # gonum Empirical quantile: first sorted value with CDF >= p
        idx = jnp.clip(jnp.ceil(p * nv).astype(jnp.int32) - 1, 0, nv - 1)
        idx_b = jnp.broadcast_to(idx, srt.shape[:-1])
        floor = jnp.take_along_axis(srt, idx_b[..., None], axis=-1)[..., 0]
    if smoothing_len > 1:
        floor = moving_average(floor, smoothing_len)
    return floor


# ---------------------------------------------------------------------
# Inharmonicity (inharmonicity.go)
# ---------------------------------------------------------------------

@dataclass
class InharmonicityResult:
    inharmonicity: jnp.ndarray     # mean relative partial deviation
    b_coefficient: jnp.ndarray     # stiff-string B estimate
    num_partials: jnp.ndarray


def analyze_inharmonicity(
    magnitude: jnp.ndarray,
    f0: jnp.ndarray,
    sample_rate: int,
    window_size: int,
    max_partials: int = 10,
) -> InharmonicityResult:
    """InharmonicityAnalyzer.AnalyzeFrame (inharmonicity.go:15-200):
    measure detected-partial deviation from ideal n*f0; fit the
    stiff-string model f_n = n f0 sqrt(1 + B n^2) for B.

    magnitude: [..., F] frames; f0: [...] per frame.
    """
    freqs, mags, count = detect_spectral_peaks(
        magnitude, sample_rate, window_size, max_peaks=max_partials * 2
    )
    freq_res = sample_rate / float(window_size)
    n_bins = magnitude.shape[-1]

    # sub-bin parabolic refinement of each peak frequency: the FFT bin
    # quantization (sr/window) would swamp small partial deviations
    peak_bins = jnp.clip((freqs / freq_res).astype(jnp.int32), 1, n_bins - 2)
    y0 = jnp.take_along_axis(magnitude, peak_bins - 1, axis=-1)
    y1 = jnp.take_along_axis(magnitude, peak_bins, axis=-1)
    y2 = jnp.take_along_axis(magnitude, peak_bins + 1, axis=-1)
    denom = y0 - 2.0 * y1 + y2
    shift = jnp.where(
        jnp.abs(denom) > _EPS,
        0.5 * (y0 - y2) / jnp.where(jnp.abs(denom) > _EPS, denom, 1.0),
        0.0,
    )
    freqs = jnp.where(
        freqs > 0, (peak_bins.astype(jnp.float32) + shift) * freq_res, 0.0
    )

    n = jnp.arange(1, max_partials + 1, dtype=jnp.float32)
    ideal = f0[..., None] * n  # [..., P]

    # nearest detected peak to each ideal partial (within 3% of n*f0)
    diff = jnp.abs(freqs[..., None, :] - ideal[..., :, None])  # [..., P, K]
    nearest = jnp.min(diff, axis=-1)
    nearest_idx = jnp.argmin(diff, axis=-1)
    found_freq = jnp.take_along_axis(freqs, nearest_idx, axis=-1)
    found_mag = jnp.take_along_axis(mags, nearest_idx, axis=-1)
    max_mag = jnp.max(mags, axis=-1, keepdims=True)
    tol = 0.03 * jnp.maximum(f0[..., None], 1.0) * n
    valid = (
        (nearest < tol)
        & (ideal > 0)
        & (found_freq > 0)
        & (found_mag > 0.01 * jnp.maximum(max_mag, _EPS))
    )

    rel_dev = jnp.where(
        valid, jnp.abs(found_freq - ideal) / jnp.maximum(ideal, _EPS), 0.0
    )
    num = jnp.sum(valid, axis=-1)
    inh = jnp.sum(rel_dev, axis=-1) / jnp.maximum(num, 1)

    # stiff-string B: (f_n/(n f0))^2 = 1 + B n^2 -> least squares on n^2
    y = jnp.where(
        valid, (found_freq / jnp.maximum(ideal, _EPS)) ** 2 - 1.0, 0.0
    )
    x = n * n
    num_b = jnp.sum(jnp.where(valid, x * y, 0.0), axis=-1)
    den_b = jnp.sum(jnp.where(valid, x * x, 0.0), axis=-1)
    b = jnp.where(den_b > _EPS, num_b / jnp.maximum(den_b, _EPS), 0.0)
    return InharmonicityResult(inh, b, num)


# ---------------------------------------------------------------------
# Pitch detection facade (pitch_detection.go)
# ---------------------------------------------------------------------

def nsdf_pitch(frames: jnp.ndarray, params: PitchParams) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """NSDF / McLeod pitch method (pitch_detection.go:485-551):
    n(tau) = 2 r(tau) / (m(tau)) with m = sum x[j]^2 + x[j+tau]^2; peak
    picking above 0.8 * max."""
    w = frames.shape[-1]
    x = frames.astype(jnp.float32)
    n_fft = 1
    while n_fft < 2 * w:
        n_fft <<= 1
    f = jnp.fft.rfft(x, n=n_fft, axis=-1)
    r = jnp.fft.irfft(f * jnp.conj(f), n=n_fft, axis=-1)[..., :w]

    sq = x * x
    csum = jnp.concatenate(
        [jnp.zeros_like(sq[..., :1]), jnp.cumsum(sq, axis=-1)], axis=-1
    )
    total = csum[..., -1:]
    tau = jnp.arange(w)
    # m(tau) = sum_{j<w-tau} x[j]^2 + sum_{j>=tau} x[j]^2
    m = (csum[..., w - tau] - csum[..., 0:1]) + (total - csum[..., tau])
    nsdf = jnp.where(m > _EPS, 2.0 * r / jnp.maximum(m, _EPS), 0.0)

    min_lag = max(int(params.sample_rate / params.max_freq), 2)
    max_lag = min(int(params.sample_rate / params.min_freq) + 1, w - 1)
    lag_valid = (tau >= min_lag) & (tau < max_lag)
    masked = jnp.where(lag_valid, nsdf, -jnp.inf)
    peak_max = jnp.max(masked, axis=-1, keepdims=True)
    # first local max above 0.8 * global max
    local = (
        (masked[..., 1:-1] > masked[..., :-2])
        & (masked[..., 1:-1] >= masked[..., 2:])
        & (masked[..., 1:-1] > 0.8 * peak_max)
    )
    cand = jnp.pad(local, [(0, 0)] * (local.ndim - 1) + [(1, 1)])
    has = jnp.any(cand, axis=-1)
    best = jnp.argmax(cand, axis=-1)
    val = jnp.take_along_axis(nsdf, best[..., None], axis=-1)[..., 0]
    pitch = jnp.where(has, params.sample_rate / jnp.maximum(best, 1), 0.0)
    conf = jnp.where(has, jnp.clip(val, 0.0, 1.0), 0.0)
    ok = (pitch >= params.min_freq) & (pitch <= params.max_freq)
    return jnp.where(ok, pitch, 0.0), jnp.where(ok, conf, 0.0)


def cepstrum_pitch(frames: jnp.ndarray, params: PitchParams) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Cepstral pitch (pitch_detection.go:623-685): peak of the real
    cepstrum within the period range."""
    w = frames.shape[-1]
    spec = jnp.fft.rfft(frames.astype(jnp.float32), axis=-1)
    log_mag = jnp.log(jnp.maximum(jnp.abs(spec), _EPS))
    ceps = jnp.fft.irfft(log_mag, n=w, axis=-1)
    min_q = max(int(params.sample_rate / params.max_freq), 2)
    max_q = min(int(params.sample_rate / params.min_freq) + 1, w // 2)
    q = jnp.arange(w)
    valid = (q >= min_q) & (q < max_q)
    masked = jnp.where(valid, ceps, -jnp.inf)
    best = jnp.argmax(masked, axis=-1)
    val = jnp.take_along_axis(ceps, best[..., None], axis=-1)[..., 0]
    pitch = params.sample_rate / jnp.maximum(best, 1)
    # confidence: cepstral peak vs mean magnitude in range (threshold .3)
    mean_abs = jnp.sum(jnp.where(valid, jnp.abs(ceps), 0.0), axis=-1) / jnp.maximum(
        jnp.sum(valid, axis=-1), 1
    )
    conf = jnp.clip(val / jnp.maximum(mean_abs * 4.0, _EPS), 0.0, 1.0)
    ok = (pitch >= params.min_freq) & (pitch <= params.max_freq) & (val > 0)
    return jnp.where(ok, pitch, 0.0), jnp.where(ok, conf, 0.0)


def zcr_pitch(frames: jnp.ndarray, params: PitchParams) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Zero-crossing pitch (pitch_detection.go:694-728): f ~ crossings
    * sr / (2 W). Low confidence by construction."""
    w = frames.shape[-1]
    nonneg = frames >= 0
    crossings = jnp.sum(
        (nonneg[..., 1:] != nonneg[..., :-1]).astype(jnp.float32), axis=-1
    )
    pitch = crossings * params.sample_rate / (2.0 * w)
    ok = (pitch >= params.min_freq) & (pitch <= params.max_freq)
    conf = jnp.where(ok, 0.3, 0.0)
    return jnp.where(ok, pitch, 0.0), conf


@dataclass
class PitchDetectionResult:
    pitch: jnp.ndarray
    confidence: jnp.ndarray
    voicing: jnp.ndarray
    method: str


class PitchDetector:
    """PitchDetector.DetectPitch facade (pitch_detection.go:14-207).

    Methods: yin, acf, nsdf, hps, cepstrum, zcr; hybrids 'yin+acf' etc.
    average agreeing estimates (:730-741). Octave correction and median
    filtering follow the reference post-processing (:767-900).
    """

    def __init__(self, sample_rate: int, method: str = "yin",
                 params: Optional[PitchParams] = None):
        self.method = method
        self.params = params or PitchParams(sample_rate=sample_rate)
        self.sample_rate = sample_rate

    def _single(self, frames: jnp.ndarray, method: str):
        if method == "yin":
            p, c, v = yin_pitch(frames, self.params)
            return p, c
        if method == "acf":
            return acf_pitch(frames, self.params)
        if method == "nsdf":
            return nsdf_pitch(frames, self.params)
        if method == "cepstrum":
            return cepstrum_pitch(frames, self.params)
        if method == "zcr":
            return zcr_pitch(frames, self.params)
        if method == "peaks":
            # strongest spectral peak as the pitch estimate
            # (pitch_detection.go:687-692)
            w = frames.shape[-1]
            spec = jnp.abs(jnp.fft.rfft(frames.astype(jnp.float32), axis=-1))
            freqs, mags, count = detect_spectral_peaks(
                spec, self.sample_rate, w, max_peaks=4
            )
            p = freqs[..., 0]
            ok = (p >= self.params.min_freq) & (p <= self.params.max_freq) & (count > 0)
            total = jnp.sum(spec, axis=-1)
            conf = jnp.where(
                ok & (total > _EPS), jnp.clip(mags[..., 0] / jnp.maximum(total, _EPS) * 4.0, 0.0, 1.0), 0.0
            )
            return jnp.where(ok, p, 0.0), conf
        if method == "hps":
            w = frames.shape[-1]
            spec = jnp.abs(jnp.fft.rfft(frames.astype(jnp.float32), axis=-1))
            p = estimate_f0_hps(spec, self.sample_rate, w,
                                self.params.min_freq, self.params.max_freq)
            conf = jnp.where(p > 0, 0.5, 0.0)
            return p, conf
        raise ValueError(f"unknown pitch method {method}")

    def detect(self, frames: jnp.ndarray) -> PitchDetectionResult:
        methods = self.method.split("+")
        if len(methods) == 1:
            p, c = self._single(frames, methods[0])
        else:
            # hybrid: average estimates that agree within 10% (:730-741)
            ps, cs = zip(*(self._single(frames, m) for m in methods))
            p0 = ps[0]
            agree_sum = jnp.zeros_like(p0)
            agree_cnt = jnp.zeros_like(p0)
            conf_sum = jnp.zeros_like(p0)
            for p_i, c_i in zip(ps, cs):
                agrees = (p_i > 0) & (p0 > 0) & (
                    jnp.abs(p_i - p0) / jnp.maximum(p0, _EPS) < 0.1
                )
                agree_sum = agree_sum + jnp.where(agrees, p_i, 0.0)
                agree_cnt = agree_cnt + agrees
                conf_sum = conf_sum + jnp.where(agrees, c_i, 0.0)
            p = jnp.where(agree_cnt > 0, agree_sum / jnp.maximum(agree_cnt, 1), 0.0)
            c = jnp.where(agree_cnt > 0, conf_sum / jnp.maximum(agree_cnt, 1), 0.0)
        return PitchDetectionResult(p, c, c, self.method)

    def detect_track(
        self, pcm: jnp.ndarray, frame_size: int = 1024, hop_size: int = 512,
        octave_correct: bool = True, median_width: int = 5,
    ) -> PitchDetectionResult:
        """Frame-wise track + octave correction + median filter
        (pitch_detection.go:767-900)."""
        from sonido_sonar_tpu.ops.framing import frame_signal

        frames = frame_signal(pcm, frame_size, hop_size)
        res = self.detect(frames)
        pitch = res.pitch
        if octave_correct:
            pitch = correct_octave_errors(pitch)
        if median_width > 1:
            voiced = pitch > 0
            filtered = median_filter_pitch(pitch, median_width)
            pitch = jnp.where(voiced, filtered, 0.0)
        return PitchDetectionResult(pitch, res.confidence, res.voicing, self.method)


def correct_octave_errors(pitch: jnp.ndarray) -> jnp.ndarray:
    """Fix isolated octave jumps against the running median
    (pitch_detection.go octave correction)."""
    med = median_filter_pitch(jnp.where(pitch > 0, pitch, jnp.nan), 5)
    med = jnp.where(jnp.isnan(med), 0.0, med)
    ratio = jnp.where(med > 0, pitch / jnp.maximum(med, _EPS), 1.0)
    halved = jnp.where((ratio > 1.8) & (ratio < 2.2), pitch / 2.0, pitch)
    doubled = jnp.where((ratio > 0.45) & (ratio < 0.55), halved * 2.0, halved)
    return jnp.where(pitch > 0, doubled, 0.0)


def analyze_vibrato(
    pitch: jnp.ndarray, hop_size: int, sample_rate: int
) -> Dict[str, jnp.ndarray]:
    """Vibrato rate/extent from the voiced pitch track
    (pitch_detection.go:1000-1116): detrended pitch contour -> dominant
    modulation frequency in 3-10 Hz."""
    voiced = pitch > 0
    frame_rate = sample_rate / hop_size
    mean_p = jnp.sum(jnp.where(voiced, pitch, 0.0), axis=-1) / jnp.maximum(
        jnp.sum(voiced, axis=-1), 1
    )
    contour = jnp.where(voiced, pitch - mean_p[..., None], 0.0)
    t = contour.shape[-1]
    n_fft = 1
    while n_fft < 2 * t:
        n_fft <<= 1
    spec = jnp.abs(jnp.fft.rfft(contour, n=n_fft, axis=-1))
    freqs = jnp.arange(spec.shape[-1]) * frame_rate / n_fft
    band = (freqs >= 3.0) & (freqs <= 10.0)
    masked = jnp.where(band, spec, -jnp.inf)
    best = jnp.argmax(masked, axis=-1)
    rate = jnp.take_along_axis(
        jnp.broadcast_to(freqs, spec.shape), best[..., None], axis=-1
    )[..., 0]
    extent = 2.0 * jnp.take_along_axis(spec, best[..., None], axis=-1)[..., 0] / jnp.maximum(
        jnp.sum(voiced, axis=-1), 1
    )
    present = jnp.isfinite(jnp.max(masked, axis=-1)) & (extent > 1.0)
    return {
        "vibrato_rate_hz": jnp.where(present, rate, 0.0),
        "vibrato_extent_hz": jnp.where(present, extent, 0.0),
        "has_vibrato": present,
    }
