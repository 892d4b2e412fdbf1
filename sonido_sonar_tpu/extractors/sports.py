"""Sports and mixed-content feature extractors.

The reference ships these as empty stubs (extractors/sports.go and
extractors/mixed.go contain only package declarations, SURVEY.md
section 2.15) and routes both content types to the speech extractor.
These implementations complete the intent that the config tables
describe: sports comparison weights energy .30 / temporal .25 / mfcc
.25 / spectral .20 (comparison.go:1077-1087) with crowd/commentary/
action tolerances; mixed enables every feature family with weights
mfcc .30 / spectral .20 / temporal .20 / chroma .15 / speech .15
(content_config.go:210-244).

Both reuse the speech/music building blocks; the factory exposes them
behind strict_reference_routing=False.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from sonido_sonar_tpu.config.config import ContentType, FeatureConfig
from sonido_sonar_tpu.extractors.features import ExtractedFeatures
from sonido_sonar_tpu.extractors.music import MusicFeatureExtractor
from sonido_sonar_tpu.extractors.speech import SpeechFeatureExtractor
from sonido_sonar_tpu.logging import get_global_logger
from sonido_sonar_tpu.ops import temporal as T
from sonido_sonar_tpu.ops.filters import pre_emphasis_for_content
from sonido_sonar_tpu.ops.stft import STFTResult


class SportsFeatureExtractor(SpeechFeatureExtractor):
    """Sports content: commentary (speech-like) over crowd noise, with
    high energy variance and event-driven dynamics. Builds on the
    speech extractor but uses broadcast pre-emphasis and adds the
    energy/temporal emphasis the sports comparator weights expect."""

    def __init__(self, config: FeatureConfig):
        super().__init__(config, is_news=False)
        self._log = get_global_logger().with_component("sports_feature_extractor")

    def get_name(self) -> str:
        return "SportsFeatureExtractor"

    def get_content_type(self) -> ContentType:
        return ContentType.SPORTS

    def get_feature_weights(self) -> Dict[str, float]:
        # sports comparator table (comparison.go:1077-1087)
        return {
            "energy": 0.30, "temporal": 0.25, "mfcc": 0.25,
            "spectral": 0.20, "speech": 0.10,
        }

    def extract_features(
        self, spectrogram: STFTResult, pcm: jnp.ndarray, sample_rate: int
    ) -> ExtractedFeatures:
        cfg = self.config
        # broadcast pre-emphasis (alpha 0.96) instead of speech 0.97
        pre = pre_emphasis_for_content(pcm.astype(jnp.float32), "broadcast")

        features = ExtractedFeatures(metadata={})
        if cfg.enable_mfcc:
            from sonido_sonar_tpu.ops.mfcc import MFCCParams, mfcc

            features.mfcc = mfcc(
                spectrogram.magnitude, sample_rate, cfg.window_size,
                MFCCParams(num_coefficients=cfg.mfcc_coefficients),
            )
        features.spectral_features = self._extract_spectral(
            spectrogram, pre, sample_rate
        )
        features.temporal_features = self._extract_temporal(pre, sample_rate)
        features.energy_features = self._extract_energy(pre, spectrogram)
        features.harmonic_features = self._extract_harmonic(pre, sample_rate)
        # crowd/excitement proxies on top of the standard temporal set
        # (kept batch-clean: scalars per clip, or lists when [B, N] PCM
        # comes through the batched generator)
        import numpy as np

        rms = features.energy_features.short_time_energy
        exc_var = np.asarray(T.energy_variance(rms))
        exc_ent = np.asarray(T.energy_entropy(rms))
        features.metadata.update(
            extractor_type="sports",
            algorithms_used="spectral,temporal,filters,tonal",
            sample_rate=sample_rate,
            excitement_variance=(
                float(exc_var) if exc_var.ndim == 0 else exc_var.tolist()
            ),
            excitement_entropy=(
                float(exc_ent) if exc_ent.ndim == 0 else exc_ent.tolist()
            ),
        )
        return features


class MixedFeatureExtractor:
    """Mixed content: the union of the music and speech feature sets,
    weighted per the MIXED preset (content_config.go:210-244)."""

    def __init__(self, config: FeatureConfig):
        # mixed content enables every feature family (the MIXED preset,
        # content_config.go:210-228)
        self.config = config.with_(
            enable_mfcc=True,
            enable_chroma=True,
            enable_spectral_contrast=True,
            enable_harmonic_features=True,
            enable_speech_features=True,
            enable_temporal_features=True,
        )
        self._speech = SpeechFeatureExtractor(self.config, is_news=False)
        self._music = MusicFeatureExtractor(self.config)
        self._log = get_global_logger().with_component("mixed_feature_extractor")

    def get_name(self) -> str:
        return "MixedFeatureExtractor"

    def get_content_type(self) -> ContentType:
        return ContentType.MIXED

    def get_feature_weights(self) -> Dict[str, float]:
        return {
            "mfcc": 0.30, "spectral": 0.20, "temporal": 0.20,
            "chroma": 0.15, "speech": 0.15,
        }

    def extract_features(
        self, spectrogram: STFTResult, pcm: jnp.ndarray, sample_rate: int
    ) -> ExtractedFeatures:
        # speech side: mfcc/spectral/temporal/energy/speech/harmonic
        feats = self._speech.extract_features(spectrogram, pcm, sample_rate)
        # music side: chroma (+ the music harmonic set if enabled)
        if self.config.enable_chroma:
            from sonido_sonar_tpu.ops.chroma import chroma_from_magnitude

            feats.chroma_features = chroma_from_magnitude(
                spectrogram.magnitude, sample_rate, self.config.window_size
            )
        feats.metadata.update(
            extractor_type="mixed",
            algorithms_used="speech,spectral,chroma,temporal,filters,tonal",
        )
        return feats
