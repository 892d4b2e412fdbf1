"""Continuous CDN latency monitoring — the reference's raison d'etre
(README.md:4-5: "benchmark CDN stream end-to-end latency") packaged as a
streaming facade.

Push PCM chunks from a source stream and a CDN stream; the monitor keeps
rolling windows, periodically aligns them (energy cross-correlation with
the hybrid fallback, exactly the production path), and reports a latency
time series with confidence. Composes the same ops the one-shot
AlignmentExtractor uses.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from sonido_sonar_tpu.config.config import AlignmentConfig, FeatureConfig
from sonido_sonar_tpu.extractors.alignment import AlignmentExtractor
from sonido_sonar_tpu.logging import get_global_logger
from sonido_sonar_tpu.utils.metrics import get_global_metrics


@dataclass
class LatencyMeasurement:
    time_s: float          # stream time at measurement (source samples seen)
    latency_s: float       # positive = CDN behind source
    confidence: float
    similarity: float
    method: str


@dataclass
class LatencyMonitor:
    """Rolling-window latency monitor for a (source, cdn) stream pair.

    window_seconds of audio are kept per stream; every measure() call
    aligns the overlapping windows. Use `push_source` / `push_cdn` as
    chunks arrive (any chunk size).
    """

    feature_config: FeatureConfig
    alignment_config: AlignmentConfig = field(default_factory=AlignmentConfig)
    window_seconds: float = 60.0
    max_lag_seconds: float = 30.0

    def __post_init__(self) -> None:
        self._sr = self.feature_config.sample_rate
        n = int(self.window_seconds * self._sr)
        self._src = np.zeros(0, dtype=np.float32)
        self._cdn = np.zeros(0, dtype=np.float32)
        self._window = n
        self._samples_seen = 0
        self._extractor = AlignmentExtractor(
            self.feature_config, self.alignment_config,
            max_lag_seconds=self.max_lag_seconds,
        )
        self.history: List[LatencyMeasurement] = []
        self._log = get_global_logger().with_component("latency_monitor")

    def push_source(self, pcm: np.ndarray) -> None:
        pcm = np.asarray(pcm, dtype=np.float32)
        self._samples_seen += len(pcm)
        self._src = np.concatenate([self._src, pcm])[-self._window :]

    def push_cdn(self, pcm: np.ndarray) -> None:
        self._cdn = np.concatenate(
            [self._cdn, np.asarray(pcm, dtype=np.float32)]
        )[-self._window :]

    def ready(self) -> bool:
        """Both rolling windows full. Measuring only at the fixed window
        size keeps the aligned shapes constant, so the jitted alignment
        compiles exactly once."""
        return len(self._src) >= self._window and len(self._cdn) >= self._window

    def measure(self, refine: bool = False) -> Optional[LatencyMeasurement]:
        """Align the current windows; returns None until enough audio is
        buffered. With refine=True the frame-level offset is sharpened
        to exact-sample accuracy via GCC-PHAT
        (AlignmentExtractor.refine_offset_with_pcm) — one extra FFT pass
        over the window."""
        if not self.ready():
            return None
        metrics = get_global_metrics()
        with metrics.timer("latency_measure"):
            src = jnp.asarray(self._src[-self._window :])
            cdn = jnp.asarray(self._cdn[-self._window :])
            feats = self._extractor.align_audio_files(src, cdn, self._sr)
            offset = feats.temporal_offset
            method = feats.method
            if refine:
                offset = self._extractor.refine_offset_with_pcm(
                    src, cdn, self._sr, offset
                )
                method = f"{method}+phat"
        metrics.record_audio(len(self._src) / self._sr)
        m = LatencyMeasurement(
            time_s=self._samples_seen / self._sr,
            latency_s=offset,
            confidence=feats.offset_confidence,
            similarity=feats.alignment_similarity,
            method=method,
        )
        self.history.append(m)
        return m

    def current_latency(self) -> Optional[float]:
        """Confidence-weighted median of the recent measurements."""
        recent = [
            m for m in self.history[-10:]
            if m.confidence >= self.alignment_config.min_confidence
        ]
        if not recent:
            return self.history[-1].latency_s if self.history else None
        return float(np.median([m.latency_s for m in recent]))

    def stats(self) -> dict:
        """Offset statistics across history (AlignmentStats shape)."""
        from sonido_sonar_tpu.ops.stats.alignment import offset_stats

        return offset_stats([m.latency_s for m in self.history])
