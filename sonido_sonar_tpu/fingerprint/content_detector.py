"""Content-type detection: metadata heuristics + acoustic classifier.

Reference parity: fingerprint/content_detector.go —
  DetectContentType (:31-69): metadata first (explicit type -> genre
  keywords -> station/URL keywords, :492-626), then acoustic, then the
  configured default;
  acoustic features (:120-152): ZCR, spectral centroid of the first 2048
  samples, energy variance (frame 1024 hop 512), silence ratio (RMS <
  0.01), dynamic range 20log10(max/min |x|), low/high split at F/4,
  harmonic peak-ratio, temporal stability (100 ms frames, 1 - cv);
  additive scores vs threshold 2.0 (:156-221) — all constants verbatim.

TPU note: the reference computes its spectrum with a naive O(N^2) DFT
(:452-467, quirk #7); we use an rFFT of the same first-2048-sample
window — identical output, 3 orders of magnitude cheaper.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np

from sonido_sonar_tpu.config.config import ContentAwareConfig, ContentType
from sonido_sonar_tpu.io.audio import AudioData, AudioMetadata
from sonido_sonar_tpu.logging import get_global_logger

_MUSIC_GENRES = [
    "rock", "pop", "jazz", "classical", "hip-hop", "hip hop", "country",
    "electronic", "blues", "reggae", "folk", "metal", "punk", "r&b",
    "soul", "funk", "dance", "techno", "house", "ambient", "indie",
    "alternative", "grunge", "ska", "latin", "world", "gospel",
]
_NEWS_GENRES = [
    "news", "talk", "politics", "current affairs", "public radio",
    "discussion", "interview", "call-in", "spoken word", "commentary",
    "analysis", "reporting", "journalism", "public affairs",
]
_SPORTS_GENRES = [
    "sports", "football", "basketball", "baseball", "soccer", "hockey",
    "tennis", "golf", "racing", "motorsports", "athletics", "cricket",
    "rugby", "boxing", "mma", "sports talk", "sports news",
]
_NEWS_STATIONS = [
    "news", "npr", "bbc", "cnn", "cbc", "abc news", "nbc news",
    "fox news", "public radio", "current affairs", "talk radio",
]
_SPORTS_STATIONS = [
    "sports", "espn", "fox sports", "sports radio", "the fan",
    "sport", "athletic", "game", "stadium",
]
_MUSIC_STATIONS = [
    "fm", "music", "hits", "rock", "pop", "jazz", "country",
    "classic", "radio", "mix", "beat", "sound", "groove",
]


@dataclass
class AcousticFeatures:
    """AcousticFeatures (content_detector.go:103-118)."""

    zero_crossing_rate: float = 0.0
    spectral_centroid: float = 0.0
    energy_variance: float = 0.0
    silence_ratio: float = 0.0
    harmonic_ratio: float = 0.0
    low_freq_energy: float = 0.0
    high_freq_energy: float = 0.0
    dynamic_range: float = 0.0
    temporal_stability: float = 0.0
    classification_confidence: float = 0.0


def infer_from_genre(genre: str) -> ContentType:
    """content_detector.go:490-540."""
    g = genre.lower().strip()
    for kw in _MUSIC_GENRES:
        if kw in g:
            return ContentType.MUSIC
    for kw in _NEWS_GENRES:
        if kw in g:
            return ContentType.NEWS
    for kw in _SPORTS_GENRES:
        if kw in g:
            return ContentType.SPORTS
    if "talk" in g and "sports" not in g:
        return ContentType.TALK
    return ContentType.UNKNOWN


def infer_from_station(station: str, url: str) -> ContentType:
    """content_detector.go:543-590."""
    combined = f"{station.lower().strip()} {url.lower()}"
    for kw in _NEWS_STATIONS:
        if kw in combined:
            return ContentType.NEWS
    for kw in _SPORTS_STATIONS:
        if kw in combined:
            return ContentType.SPORTS
    for kw in _MUSIC_STATIONS:
        if kw in combined:
            return ContentType.MUSIC
    if "talk" in combined and "sports" not in combined:
        return ContentType.TALK
    return ContentType.UNKNOWN


def parse_content_type(content_type: str) -> ContentType:
    """content_detector.go:613-626."""
    ct = content_type.lower()
    if ct in ("music", "audio/music"):
        return ContentType.MUSIC
    if ct in ("news", "talk", "spoken"):
        return ContentType.NEWS
    if ct == "sports":
        return ContentType.SPORTS
    return ContentType.UNKNOWN


def detect_from_metadata(metadata: Optional[AudioMetadata]) -> ContentType:
    """content_detector.go:593-610."""
    if metadata is None:
        return ContentType.UNKNOWN
    explicit = metadata.extra.get("content_type", "")
    if explicit:
        return parse_content_type(explicit)
    if metadata.genre:
        return infer_from_genre(metadata.genre)
    return infer_from_station(metadata.station, metadata.url)


def batched_acoustic_features_device(pcm, sample_rate: int):
    """[B, N] device PCM -> [B, 9] acoustic classifier features, one
    jitted program (the batched replacement for per-clip host numpy in
    extract_acoustic_features — VERDICT r3 item #1).

    Feature order: zcr, centroid, energy_variance, silence_ratio,
    dynamic_range, low_ratio, high_ratio, harmonic_ratio,
    temporal_stability — same math as the host float64 path
    (content_detector.go:120-152) in device float32; parity asserted in
    tests/test_generate_batch.py (feature tolerance + classification
    equality)."""
    return _acoustic_program(pcm, sample_rate)


def _make_acoustic_program():
    import jax
    from functools import partial as _partial

    @_partial(jax.jit, static_argnames=("sr",))
    def _program(x, sr):
        import jax.numpy as jnp

        from sonido_sonar_tpu.ops import temporal as T

        x = x.astype(jnp.float32)
        b, n = x.shape
        zero = jnp.zeros((b,), jnp.float32)

        # ZCR over the whole signal (:225-237)
        if n > 1:
            nonneg = x >= 0
            zcr = jnp.mean(
                (nonneg[:, 1:] != nonneg[:, :-1]).astype(jnp.float32), axis=-1
            )
        else:
            zcr = zero

        # |rFFT| of the first 2048 samples (quirk #7 done sanely)
        w = min(2048, n)
        spec = jnp.abs(jnp.fft.rfft(x[:, :w])).astype(jnp.float32)
        f = spec.shape[-1]
        freqs = jnp.arange(f, dtype=jnp.float32) * (sr / (f * 2.0))
        m_sum = jnp.sum(spec, axis=-1)
        centroid = jnp.where(
            m_sum > 0,
            jnp.sum(spec * freqs, axis=-1) / jnp.maximum(m_sum, 1e-12),
            0.0,
        )

        # energy variance: frame 1024 hop 512 mean-square energies ->
        # population variance (:258-293); hop-block framed sums, no
        # [B, T, W] frames tensor
        frame = 1024
        if n >= frame * 2:
            n_fr = -(-(n - frame) // 512)  # len(arange(0, n-frame, 512))
            e = T.framed_sum_hopblocks(x * x, frame, 512, n_fr) / frame
            energy_var = jnp.var(e, axis=-1) if n_fr > 1 else zero
        else:
            energy_var = zero

        # silence ratio: RMS < 0.01 per non-overlapping 1024 frame (:296-320)
        t_sil = n // 1024
        if t_sil > 0:
            segs = x[:, : t_sil * 1024].reshape(b, t_sil, 1024)
            rms = jnp.sqrt(jnp.mean(segs * segs, axis=-1))
            silence = jnp.mean((rms < 0.01).astype(jnp.float32), axis=-1)
        else:
            silence = zero

        # dynamic range 20log10(max|x| / min nonzero |x|) (:322-345)
        a = jnp.abs(x)
        mx = jnp.max(a, axis=-1)
        mn = jnp.min(jnp.where(a > 1e-10, a, jnp.inf), axis=-1)
        dyn = jnp.where(
            jnp.isfinite(mn) & (mx > 0),
            20.0 * jnp.log10(jnp.maximum(mx, 1e-12) / jnp.maximum(mn, 1e-12)),
            0.0,
        )

        # low/high split at F/4 (:348-371)
        split = f // 4
        p = spec * spec
        low = jnp.sum(p[:, :split], axis=-1)
        high = jnp.sum(p[:, split:], axis=-1)
        tot = low + high
        low_ratio = jnp.where(tot > 0, low / jnp.maximum(tot, 1e-12), 0.0)
        high_ratio = jnp.where(tot > 0, high / jnp.maximum(tot, 1e-12), 0.0)

        # harmonic peak-ratio (:374-407): +-1/+-2 local maxima, first
        # peak = fundamental, count near-integer-ratio later peaks
        if f >= 10:
            core = spec[:, 2 : f - 2]
            mask = (
                (core > spec[:, 1 : f - 3])
                & (core > spec[:, 3 : f - 1])
                & (core > spec[:, 0 : f - 4])
                & (core > spec[:, 4:f])
            )
            idx = jnp.arange(2, f - 2, dtype=jnp.float32)
            npk = jnp.sum(mask, axis=-1)
            first = jnp.argmax(mask, axis=-1)  # first True
            f0 = first.astype(jnp.float32) + 2.0
            ratio = idx[None, :] / jnp.maximum(f0[:, None], 1.0)
            near = jnp.abs(ratio - jnp.round(ratio)) < 0.1
            harm = jnp.sum(
                mask & near & (idx[None, :] > f0[:, None]), axis=-1
            ).astype(jnp.float32)
            harmonic = jnp.where(
                npk >= 2, harm / jnp.maximum(npk - 1, 1).astype(jnp.float32), 0.0
            )
        else:
            harmonic = zero

        # temporal stability: non-overlapping 100 ms frame energies ->
        # 1 - cv (:410-450)
        frame_s = sr // 10
        if n >= frame_s * 3:
            count = -(-(n - frame_s) // frame_s)  # len(arange(0, n-f, f))
            t_full = n // frame_s
            blocks = jnp.sum(
                (x[:, : t_full * frame_s] ** 2).reshape(b, t_full, frame_s),
                axis=-1,
            )
            e = blocks[:, :count]
            mean = jnp.mean(e, axis=-1)
            cv = jnp.where(
                mean > 0,
                jnp.sqrt(jnp.var(e, axis=-1)) / jnp.maximum(mean, 1e-20),
                jnp.inf,
            )
            stability = jnp.where(
                (mean > 0) & (count > 1), jnp.maximum(0.0, 1.0 - cv), 0.0
            )
        else:
            stability = zero

        return jnp.stack(
            [
                zcr, centroid, energy_var, silence, dyn,
                low_ratio, high_ratio, harmonic, stability,
            ],
            axis=-1,
        )

    return _program


# module-level jit: building the jit object per call would RE-TRACE the
# whole program every call (~60-90 ms of host time through the tunnel,
# measured in the round-5 generate-batch stage breakdown, docs/PERF.md)
_acoustic_program = _make_acoustic_program()


class ContentDetector:
    """ContentDetector (content_detector.go:19-118)."""

    def __init__(self, config: Optional[ContentAwareConfig] = None):
        self.config = config or ContentAwareConfig()
        self._log = get_global_logger().with_component("content_detector")

    def detect_content_type(self, audio: AudioData) -> ContentType:
        """DetectContentType (content_detector.go:31-69)."""
        meta_type = detect_from_metadata(audio.metadata)
        if meta_type != ContentType.UNKNOWN:
            return meta_type
        if self.config.enable_content_detection and len(audio.pcm) > 0:
            acoustic = self.detect_from_audio(audio.pcm, audio.sample_rate)
            if acoustic != ContentType.UNKNOWN:
                return acoustic
        return self.config.default_content_type

    def detect_from_audio(self, pcm: np.ndarray, sample_rate: int) -> ContentType:
        """DetectFromAudio (content_detector.go:72-103)."""
        if len(pcm) == 0:
            return ContentType.UNKNOWN
        features = self.extract_acoustic_features(pcm, sample_rate)
        return self.classify_from_features(features)

    def detect_batch(self, audios, pcm_device=None) -> list:
        """detect_content_type over a batch with ONE device program for
        the acoustic stage (VERDICT r3 item #1): metadata cascade per
        clip on host (cheap string checks), then
        `batched_acoustic_features_device` for every clip still UNKNOWN
        and one [K, 9] fetch feeding the verbatim host classifier.

        pcm_device: optional [B, N] device array of ALL clips (the batch
        the generator uploads anyway); when given the program runs on it
        directly instead of re-stacking on host."""
        resolve, _ = self.detect_batch_async(audios, pcm_device)
        return resolve()

    def detect_batch_async(self, audios, pcm_device=None):
        """Split detect_batch: DISPATCH the acoustic device program now,
        defer the [K, 9] fetch + host classification to the returned
        `resolve()` callable. Returns (resolve, dispatched) where
        `dispatched` says whether a device program is actually in flight
        (False when every clip resolved from metadata, or detection is
        disabled). Callers overlap the fetch round trip with other
        device work — the generator dispatches a speculative extractor
        program between the two halves (round-5 stage breakdown: the
        detect fetch is ~46 ms of the public path, all of it hideable
        under the ~226 ms extractor program)."""
        out = []
        need = []
        for i, a in enumerate(audios):
            t = detect_from_metadata(a.metadata)
            out.append(t)
            if (
                t == ContentType.UNKNOWN
                and self.config.enable_content_detection
                and len(a.pcm) > 0
            ):
                need.append(i)
        feats_dev = None
        rows = []
        if need:
            import jax.numpy as jnp

            if pcm_device is None:
                pcm_device = jnp.asarray(
                    np.stack(
                        [np.asarray(audios[i].pcm, np.float32) for i in need]
                    )
                )
                rows = list(range(len(need)))
            else:
                rows = need
            sr = audios[need[0]].sample_rate
            feats_dev = batched_acoustic_features_device(pcm_device, sr)

        def resolve() -> list:
            if feats_dev is not None:
                feats = np.asarray(feats_dev)  # the one [K, 9] fetch
                for row, i in zip(rows, need):
                    z = feats[row]
                    f = AcousticFeatures(
                        zero_crossing_rate=float(z[0]),
                        spectral_centroid=float(z[1]),
                        energy_variance=float(z[2]),
                        silence_ratio=float(z[3]),
                        dynamic_range=float(z[4]),
                        low_freq_energy=float(z[5]),
                        high_freq_energy=float(z[6]),
                        harmonic_ratio=float(z[7]),
                        temporal_stability=float(z[8]),
                    )
                    out[i] = self.classify_from_features(f)
            for i, t in enumerate(out):
                if t == ContentType.UNKNOWN:
                    out[i] = self.config.default_content_type
            return out

        return resolve, feats_dev is not None

    # ------------------------------------------------------------------
    def extract_acoustic_features(
        self, pcm: np.ndarray, sample_rate: int
    ) -> AcousticFeatures:
        """extractAcousticFeatures (content_detector.go:120-152). Uses
        numpy on host — the inputs are tiny (first 2048 samples for the
        spectrum, frame loops over the PCM)."""
        x = np.asarray(pcm, dtype=np.float64)
        f = AcousticFeatures()

        # ZCR over the whole signal (:225-237)
        if len(x) > 1:
            nonneg = x >= 0
            f.zero_crossing_rate = float(
                np.mean(nonneg[1:] != nonneg[:-1])
            )

        # spectrum of the first 2048 samples — rFFT instead of the O(N^2)
        # DFT (quirk #7); |rfft| equals the reference's magnitude output
        w = min(2048, len(x))
        spectrum = np.abs(np.fft.rfft(x[:w]))

        # spectral centroid with freq = i * sr / (len(spectrum) * 2)
        # (:240-255 — note the reference's own resolution convention)
        freqs = np.arange(len(spectrum)) * sample_rate / (len(spectrum) * 2.0)
        mag_sum = spectrum.sum()
        f.spectral_centroid = float(
            (freqs * spectrum).sum() / mag_sum if mag_sum > 0 else 0.0
        )

        f.energy_variance = self._energy_variance(x)
        f.silence_ratio = self._silence_ratio(x)
        f.dynamic_range = self._dynamic_range(x)
        f.low_freq_energy, f.high_freq_energy = self._freq_energy_ratio(spectrum)
        f.harmonic_ratio = self._harmonic_ratio(spectrum)
        f.temporal_stability = self._temporal_stability(x, sample_rate)
        return f

    @staticmethod
    def _energy_variance(x: np.ndarray) -> float:
        """frame 1024 hop 512 mean-square energies -> population variance
        (:258-293). Vectorized via cumsum."""
        frame = 1024
        if len(x) < frame * 2:
            return 0.0
        csum = np.concatenate([[0.0], np.cumsum(x * x)])
        starts = np.arange(0, len(x) - frame, frame // 2)
        energies = (csum[starts + frame] - csum[starts]) / frame
        if len(energies) <= 1:
            return 0.0
        return float(np.var(energies))

    @staticmethod
    def _silence_ratio(x: np.ndarray) -> float:
        """RMS < 0.01 per 1024 frame (:296-320). Vectorized."""
        frame = 1024
        t = len(x) // frame
        if t == 0:
            return 0.0
        segs = x[: t * frame].reshape(t, frame)
        rms = np.sqrt((segs * segs).mean(axis=1))
        return float((rms < 0.01).mean())

    @staticmethod
    def _dynamic_range(x: np.ndarray) -> float:
        """20log10(max|x| / min nonzero |x|) (:322-345)."""
        a = np.abs(x)
        max_v = a.max() if len(a) else 0.0
        nz = a[a > 1e-10]
        if len(nz) == 0 or max_v == 0:
            return 0.0
        return float(20.0 * np.log10(max_v / nz.min()))

    @staticmethod
    def _freq_energy_ratio(spectrum: np.ndarray):
        """low/high split at len/4 (:348-371)."""
        split = len(spectrum) // 4
        low = float((spectrum[:split] ** 2).sum())
        high = float((spectrum[split:] ** 2).sum())
        total = low + high
        if total == 0:
            return 0.0, 0.0
        return low / total, high / total

    @staticmethod
    def _harmonic_ratio(spectrum: np.ndarray) -> float:
        """peak-ratio harmonicity (:374-407)."""
        if len(spectrum) < 10:
            return 0.0
        s = spectrum
        peaks = [
            i
            for i in range(2, len(s) - 2)
            if s[i] > s[i - 1] and s[i] > s[i + 1] and s[i] > s[i - 2] and s[i] > s[i + 2]
        ]
        if len(peaks) < 2:
            return 0.0
        fundamental = peaks[0]
        harmonic = sum(
            1
            for p in peaks[1:]
            if abs(p / fundamental - round(p / fundamental)) < 0.1
        )
        return harmonic / (len(peaks) - 1)

    @staticmethod
    def _temporal_stability(x: np.ndarray, sample_rate: int) -> float:
        """100 ms frame energies -> 1 - cv (:410-450). Vectorized."""
        frame = sample_rate // 10
        if len(x) < frame * 3:
            return 0.0
        t = (len(x) - frame) // frame + ((len(x) - frame) % frame > 0)
        csum = np.concatenate([[0.0], np.cumsum(x * x)])
        starts = np.arange(0, len(x) - frame, frame)
        energies = csum[starts + frame] - csum[starts]
        if len(energies) <= 1:
            return 0.0
        mean = float(np.mean(energies))
        if mean == 0:
            return 0.0
        cv = float(np.std(energies)) / mean
        return max(0.0, 1.0 - cv)

    # ------------------------------------------------------------------
    def classify_from_features(self, f: AcousticFeatures) -> ContentType:
        """classifyFromFeatures (content_detector.go:156-221), constants
        verbatim."""
        scores = {}
        music = 0.0
        if f.zero_crossing_rate < 0.1:
            music += 2.0
        if f.harmonic_ratio > 0.3:
            music += 2.0
        if f.temporal_stability > 0.5:
            music += 1.0
        if f.dynamic_range > 20:
            music += 1.0
        scores[ContentType.MUSIC] = music

        speech = 0.0
        if 0.05 < f.zero_crossing_rate < 0.3:
            speech += 2.0
        if 800 < f.spectral_centroid < 3000:
            speech += 2.0
        if f.harmonic_ratio < 0.2:
            speech += 1.0
        if 0.1 < f.silence_ratio < 0.4:
            speech += 1.0
        scores[ContentType.NEWS] = speech
        scores[ContentType.TALK] = speech * 0.9

        sports = 0.0
        if f.energy_variance > 0.3:
            sports += 2.0
        if f.dynamic_range > 30:
            sports += 1.5
        if f.temporal_stability < 0.4:
            sports += 1.0
        scores[ContentType.SPORTS] = sports

        best_type = ContentType.UNKNOWN
        best_score = self.config.auto_detect_threshold
        for ct, score in scores.items():
            if score > best_score:
                best_score = score
                best_type = ct
        f.classification_confidence = best_score / 6.0
        return best_type
