"""FingerprintModel: the flagship jittable forward step.

Wraps the batched feature program with a fixed config so it presents a
model-like interface: `model(pcm_batch) -> feature pytree`. This is the
compile target for the driver's entry check and the benchmark.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Optional

import jax.numpy as jnp

from sonido_sonar_tpu.config.config import FeatureConfig
from sonido_sonar_tpu.parallel.pipeline import batched_fingerprint_features


@dataclass
class FingerprintModel:
    """Content-agnostic fingerprint forward step.

    config geometry defaults to the BASELINE benchmark shape
    (window 1024 / hop 256 @ 44.1 kHz).
    """

    config: FeatureConfig = field(
        default_factory=lambda: FeatureConfig(window_size=1024, hop_size=256)
    )
    enable_pitch: bool = True

    def __call__(self, pcm_batch: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        cfg = self.config
        return batched_fingerprint_features(
            pcm_batch,
            sample_rate=cfg.sample_rate,
            window_size=cfg.window_size,
            hop_size=cfg.hop_size,
            window_type=cfg.window_type,
            mfcc_coefficients=cfg.mfcc_coefficients,
            enable_chroma=cfg.enable_chroma,
            enable_contrast=cfg.enable_spectral_contrast,
            enable_pitch=self.enable_pitch,
        )
