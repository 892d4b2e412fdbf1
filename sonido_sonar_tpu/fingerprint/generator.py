"""Fingerprint generation: the main user-facing pipeline.

Reference parity: fingerprint/fingerprint.go —
  GenerateFingerprint (:137-236): content detect -> per-content config ->
  extractor -> STFT -> features -> AudioFingerprint{ID (sha256 of
  time+len+rate, utils.go:21-28), URL, content type, duration,
  sample rate, hop size, channels, features, metadata (utils.go:30-58)};
  defaults window 2048 / hop 512 (:70-98).

TPU flow: one H2D upload of the PCM, then the STFT + extractor run as
jitted device programs. Batched generation over many streams lives in
sonido_sonar_tpu.parallel.
"""

from __future__ import annotations

import hashlib
import time
from dataclasses import dataclass, field
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sonido_sonar_tpu.config.config import ContentType, FingerprintConfig, default_fingerprint_config
from sonido_sonar_tpu.config.content_config import ContentAwareConfigManager
from sonido_sonar_tpu.extractors.base import FeatureExtractorFactory
from sonido_sonar_tpu.extractors.features import ExtractedFeatures
from sonido_sonar_tpu.fingerprint.content_detector import ContentDetector
from sonido_sonar_tpu.io.audio import AudioData
from sonido_sonar_tpu.logging import get_global_logger
from sonido_sonar_tpu.ops.stft import stft


@dataclass
class AudioFingerprint:
    """AudioFingerprint (fingerprint.go:14-26)."""

    id: str
    stream_url: str
    content_type: ContentType
    timestamp: float
    duration: float
    sample_rate: int
    hop_size: int
    channels: int
    features: ExtractedFeatures
    metadata: Dict[str, Any] = field(default_factory=dict)


def generate_id(audio: AudioData) -> str:
    """utils.go:21-28: sha256(time_ns, len, rate)[:16]."""
    h = hashlib.sha256(
        f"{time.time_ns()}_{len(audio.pcm)}_{audio.sample_rate}".encode()
    )
    return h.hexdigest()[:16]


class FingerprintGenerator:
    """FingerprintGenerator (fingerprint.go:28-135)."""

    def __init__(
        self,
        config: Optional[FingerprintConfig] = None,
        strict_reference_routing: bool = True,
    ):
        self.config = config or default_fingerprint_config()
        self.content_manager = ContentAwareConfigManager(self.config)
        self.content_detector = ContentDetector(self.config.content_aware)
        self.extractor_factory = FeatureExtractorFactory(strict_reference_routing)
        self._log = get_global_logger().with_component("fingerprint_generator")

    def _detect_content_type(self, audio: AudioData) -> ContentType:
        """Content detection cascade: explicit metadata -> acoustic ->
        UNKNOWN (fingerprint.go:149-170)."""
        content_type = ContentType.UNKNOWN
        if audio.metadata is not None:
            explicit = audio.metadata.extra.get("content_type", "")
            if explicit:
                from sonido_sonar_tpu.config.config import to_content_type

                content_type = to_content_type(explicit)
        if (
            content_type == ContentType.UNKNOWN
            and self.config.content_aware.enable_content_detection
        ):
            content_type = self.content_detector.detect_content_type(audio)
        return content_type

    def generate_fingerprint(self, audio: AudioData) -> AudioFingerprint:
        """GenerateFingerprint (fingerprint.go:137-236)."""
        if audio is None or len(audio.pcm) == 0:
            raise ValueError("audio data cannot be empty")

        content_type = self._detect_content_type(audio)

        generation_config = self.content_manager.get_generation_config(content_type)
        fc = generation_config.feature_config
        # the base config's geometry wins (fingerprint.go:180-186)
        fc = fc.with_(
            window_size=self.config.feature_config.window_size,
            hop_size=self.config.feature_config.hop_size,
            sample_rate=audio.sample_rate,
        )

        extractor = self.extractor_factory.create_extractor(content_type, fc)

        pcm = jnp.asarray(np.asarray(audio.pcm, dtype=np.float32))
        spectrogram = stft(
            pcm,
            fc.window_size,
            fc.hop_size,
            fc.window_type,
            audio.sample_rate,
        )
        features = extractor.extract_features(spectrogram, pcm, audio.sample_rate)

        fp = AudioFingerprint(
            id=generate_id(audio),
            stream_url=audio.metadata.url if audio.metadata else "",
            content_type=content_type,
            timestamp=time.time(),
            duration=audio.duration,
            sample_rate=audio.sample_rate,
            hop_size=self.config.feature_config.hop_size,
            channels=audio.channels,
            features=features,
            metadata={},
        )
        self._add_metadata(fp, audio, extractor)
        return fp

    def generate_fingerprints_batch(self, audios) -> list:
        """Batched GenerateFingerprint for same-rate, equal-length clips.

        The whole feature program runs ONCE per content-type group on a
        stacked [B, N] PCM tensor (the extractors are batch-axis clean),
        then per-clip fingerprints are split out of the batched feature
        pytree — the TPU-shaped replacement for looping
        generate_fingerprint over a corpus. Clips of differing lengths
        or rates must be grouped/padded by the caller (fixed shapes,
        SURVEY hard-part #2).
        """
        if not audios:
            return []
        sr = audios[0].sample_rate
        n = len(audios[0].pcm)
        for a in audios:
            if a is None or len(a.pcm) == 0:
                raise ValueError("audio data cannot be empty")
            if a.sample_rate != sr or len(a.pcm) != n:
                raise ValueError(
                    "generate_fingerprints_batch requires equal-length, "
                    "same-rate clips; group or pad upstream"
                )

        ctypes = [self._detect_content_type(a) for a in audios]
        results: list = [None] * len(audios)
        for ct in dict.fromkeys(ctypes):  # preserve first-seen order
            idxs = [i for i, c in enumerate(ctypes) if c == ct]
            generation_config = self.content_manager.get_generation_config(ct)
            fc = generation_config.feature_config.with_(
                window_size=self.config.feature_config.window_size,
                hop_size=self.config.feature_config.hop_size,
                sample_rate=sr,
            )
            extractor = self.extractor_factory.create_extractor(ct, fc)
            pcm = jnp.asarray(
                np.stack([np.asarray(audios[i].pcm, dtype=np.float32) for i in idxs])
            )
            spectrogram = stft(pcm, fc.window_size, fc.hop_size, fc.window_type, sr)
            features = extractor.extract_features(spectrogram, pcm, sr)
            for pos, i in enumerate(idxs):
                feats_i = jax.tree_util.tree_map(lambda x, p=pos: x[p], features)
                audio = audios[i]
                fp = AudioFingerprint(
                    id=generate_id(audio),
                    stream_url=audio.metadata.url if audio.metadata else "",
                    content_type=ct,
                    timestamp=time.time(),
                    duration=audio.duration,
                    sample_rate=sr,
                    hop_size=self.config.feature_config.hop_size,
                    channels=audio.channels,
                    features=feats_i,
                    metadata={},
                )
                self._add_metadata(fp, audio, extractor)
                results[i] = fp
        return results

    def _add_metadata(self, fp: AudioFingerprint, audio: AudioData, extractor) -> None:
        """utils.go:30-58."""
        fp.metadata["extractor_name"] = extractor.get_name()
        fp.metadata["feature_weights"] = extractor.get_feature_weights()
        fp.metadata["generation_time"] = time.time()
        if audio.metadata is not None:
            fp.metadata["stream_metadata"] = audio.metadata
        stats: Dict[str, Any] = {}
        if fp.features.mfcc is not None:
            stats["mfcc_frames"] = int(fp.features.mfcc.shape[-2])
            stats["mfcc_coefficients"] = int(fp.features.mfcc.shape[-1])
        if fp.features.spectral_features is not None:
            stats["spectral_frames"] = int(
                fp.features.spectral_features.spectral_centroid.shape[-1]
            )
        fp.metadata["feature_stats"] = stats
