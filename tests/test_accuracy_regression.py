"""Alignment accuracy regression: the PHAT-refined path must stay exact
(a compact version of eval_accuracy.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sonido_sonar_tpu.config.config import FeatureConfig
from sonido_sonar_tpu.extractors import AlignmentExtractor
from sonido_sonar_tpu.io.synth import harmonic_tone, shift_signal, white_noise

SR = 22050


@pytest.mark.parametrize("lag_s,noise", [(0.1, 0.02), (1.0, 0.05)])
def test_refined_offset_exact(lag_s, noise):
    rng = np.random.default_rng(7)
    dur = 8.0
    base = harmonic_tone(220.0, dur, SR) + white_noise(dur, SR, 0.05, seed=11)
    env = np.interp(
        np.arange(len(base)), np.linspace(0, len(base), 64), rng.uniform(0.1, 1.0, 64)
    )
    src = (base * env).astype(np.float32)
    lag = int(lag_s * SR) + 89
    cdn = shift_signal(src, lag, noise=noise, gain=0.9)
    fc = FeatureConfig(sample_rate=SR, window_size=1024, hop_size=256)
    ext = AlignmentExtractor(fc, max_lag_seconds=2.0)
    feats = ext.align_audio_files(jnp.asarray(src), jnp.asarray(cdn), SR)
    refined = ext.refine_offset_with_pcm(
        jnp.asarray(src), jnp.asarray(cdn), SR, feats.temporal_offset
    )
    assert abs(refined * SR - lag) <= 1, (
        f"refined err {abs(refined*SR - lag):.1f} samples"
    )
