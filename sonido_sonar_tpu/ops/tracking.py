"""Multi-frame harmonic partial tracking.

Reference parity: algorithms/harmonic/harmonic_tracking.go —
  method enum PeakBased / SinusoidalModel / PartialTracking /
  KalmanFilter / MultiFrame, where only PeakBased is genuinely
  implemented and the others fall back to it (:339-366 — preserved);
  defaults (:179-194): max freq deviation 50 Hz, max amp deviation
  20 dB, continuity weights freq .6 / amp .3 / phase .1, birth
  threshold 0.3, max gap 2 frames, median filter 5, min confidence 0.2;
  greedy match: continue tracks with the best-scoring unused peak,
  birth new tracks for strong unmatched peaks, kill tracks gapped
  longer than max_gap (:297-440).

TPU split: peak detection runs batched on device over the whole
spectrogram (ops.harmonic.detect_spectral_peaks); the track
birth/death bookkeeping is inherently sequential with dynamic state and
runs on host over the small fixed-k peak arrays.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from sonido_sonar_tpu.ops.harmonic import detect_spectral_peaks


@dataclass(frozen=True)
class TrackingParams:
    """HarmonicTrackingParams defaults (harmonic_tracking.go:179-194)."""

    method: str = "peak_based"   # others fall back, as upstream
    max_freq_deviation: float = 50.0
    max_amp_deviation_db: float = 20.0
    freq_continuity_weight: float = 0.6
    amp_continuity_weight: float = 0.3
    phase_continuity_weight: float = 0.1
    birth_threshold: float = 0.3
    max_gap_length: int = 2
    min_track_length: int = 3
    max_peaks: int = 16


@dataclass
class HarmonicTrack:
    """HarmonicTrack (harmonic_tracking.go:13-35)."""

    track_id: int
    start_frame: int
    end_frame: int
    frequencies: List[float] = field(default_factory=list)
    amplitudes: List[float] = field(default_factory=list)
    frames: List[int] = field(default_factory=list)

    @property
    def length(self) -> int:
        return len(self.frequencies)

    @property
    def mean_frequency(self) -> float:
        return float(np.mean(self.frequencies)) if self.frequencies else 0.0


@dataclass
class HarmonicTrackingResult:
    tracks: List[HarmonicTrack]
    num_frames: int

    @property
    def num_tracks(self) -> int:
        return len(self.tracks)


class HarmonicTracking:
    """HarmonicTracking (harmonic_tracking.go:13-214)."""

    def __init__(self, sample_rate: int, params: Optional[TrackingParams] = None):
        self.sample_rate = sample_rate
        self.params = params or TrackingParams()

    def process_magnitude_spectrogram(
        self, magnitude: jnp.ndarray, window_size: int
    ) -> HarmonicTrackingResult:
        """ProcessMagnitudeSpectrogram (harmonic_tracking.go:262-289).

        magnitude: [T, F] frames.
        """
        p = self.params
        freqs, mags, counts = detect_spectral_peaks(
            magnitude, self.sample_rate, window_size, max_peaks=p.max_peaks
        )
        freqs_np = np.asarray(freqs)
        mags_np = np.asarray(mags)
        counts_np = np.asarray(counts)
        t_frames = freqs_np.shape[0]

        # normalize amplitudes for the birth threshold (relative to the
        # spectrogram's global peak)
        global_max = float(mags_np.max()) or 1.0

        tracks: List[HarmonicTrack] = []
        next_id = 1

        for t in range(t_frames):
            k = int(counts_np[t])
            frame_freqs = freqs_np[t, :k]
            frame_mags = mags_np[t, :k]
            used = np.zeros(k, dtype=bool)

            # continue live tracks (greedy best score, :297-336)
            for trk in tracks:
                gap = t - 1 - trk.end_frame
                if gap > p.max_gap_length - 1 or trk.end_frame >= t:
                    continue
                last_f = trk.frequencies[-1]
                last_a = trk.amplitudes[-1]
                best, best_score = -1, -1.0
                for i in range(k):
                    if used[i]:
                        continue
                    df = abs(frame_freqs[i] - last_f)
                    if df > p.max_freq_deviation:
                        continue
                    da_db = abs(
                        20.0 * np.log10(max(frame_mags[i], 1e-10) / max(last_a, 1e-10))
                    )
                    if da_db > p.max_amp_deviation_db:
                        continue
                    freq_score = 1.0 - df / p.max_freq_deviation
                    amp_score = 1.0 - da_db / p.max_amp_deviation_db
                    score = (
                        p.freq_continuity_weight * freq_score
                        + p.amp_continuity_weight * amp_score
                        + p.phase_continuity_weight * 0.5  # no phase info
                    )
                    if score > best_score:
                        best, best_score = i, score
                if best >= 0:
                    trk.frequencies.append(float(frame_freqs[best]))
                    trk.amplitudes.append(float(frame_mags[best]))
                    trk.frames.append(t)
                    trk.end_frame = t
                    used[best] = True

            # birth (:328-333): strong unmatched peaks
            for i in range(k):
                if used[i]:
                    continue
                if frame_mags[i] / global_max >= p.birth_threshold:
                    tracks.append(
                        HarmonicTrack(
                            track_id=next_id,
                            start_frame=t,
                            end_frame=t,
                            frequencies=[float(frame_freqs[i])],
                            amplitudes=[float(frame_mags[i])],
                            frames=[t],
                        )
                    )
                    next_id += 1

        # finalize: drop short tracks (finalizeTracks)
        tracks = [trk for trk in tracks if trk.length >= p.min_track_length]
        return HarmonicTrackingResult(tracks=tracks, num_frames=t_frames)

    def process_spectrogram(
        self, complex_spec: jnp.ndarray, window_size: int
    ) -> HarmonicTrackingResult:
        """ProcessSpectrogram (harmonic_tracking.go:237-260): magnitude
        path (phase tracking off by default upstream)."""
        return self.process_magnitude_spectrogram(jnp.abs(complex_spec), window_size)
