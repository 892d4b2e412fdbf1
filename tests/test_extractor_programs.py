"""Single-program extractor pipelines == the class composition oracle.

The generator's fast path (extractors/programs.py) must reproduce the
reference-faithful composition (extract_features over a raw-PCM
spectrogram) field by field, and the batched program must equal the
per-clip program stacked (the generate_fingerprints_batch contract).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from sonido_sonar_tpu.config.config import FeatureConfig
from sonido_sonar_tpu.extractors.music import MusicFeatureExtractor
from sonido_sonar_tpu.extractors.speech import SpeechFeatureExtractor
from sonido_sonar_tpu.io.synth import harmonic_tone, speech_like, white_noise
from sonido_sonar_tpu.ops.stft import stft

SR = 22050


def _cfg(**kw):
    base = dict(
        sample_rate=SR, window_size=1024, hop_size=256,
        enable_speech_features=True, enable_harmonic_features=True,
    )
    base.update(kw)
    return FeatureConfig(**base)


def _assert_tree_close(got, want, rtol=2e-4, atol=2e-4, prefix=""):
    """Compare two ExtractedFeatures field by field (None-aware)."""
    from dataclasses import fields as dc_fields

    for f in dc_fields(type(want)):
        if f.name == "metadata":
            continue
        g, w = getattr(got, f.name), getattr(want, f.name)
        name = f"{prefix}{f.name}"
        if w is None:
            assert g is None, name
            continue
        assert g is not None, name
        if hasattr(w, "__dataclass_fields__"):
            _assert_tree_close(g, w, rtol, atol, prefix=name + ".")
            continue
        np.testing.assert_allclose(
            np.asarray(g, dtype=np.float64),
            np.asarray(w, dtype=np.float64),
            rtol=rtol, atol=atol, err_msg=name,
        )


@pytest.fixture(scope="module")
def clips():
    a = speech_like(3.0, SR, seed=1).astype(np.float32)
    b = (harmonic_tone(220.0, 3.0, SR) + white_noise(3.0, SR, 0.02)).astype(
        np.float32
    )
    return a, b


def test_speech_program_matches_composition(clips):
    cfg = _cfg()
    ext = SpeechFeatureExtractor(cfg, is_news=True)
    for clip in clips:
        pcm = jnp.asarray(clip)
        spec = stft(pcm, cfg.window_size, cfg.hop_size, cfg.window_type, SR)
        want = ext.extract_features(spec, pcm, SR)
        got = ext.extract_features_from_pcm(pcm, SR)
        _assert_tree_close(got, want)
        assert got.metadata["extractor_type"] == "speech"


def test_speech_program_batch_equals_per_clip(clips):
    cfg = _cfg()
    ext = SpeechFeatureExtractor(cfg, is_news=True)
    batch = jnp.asarray(np.stack(clips))
    got_b = ext.extract_features_from_pcm(batch, SR)
    for i, clip in enumerate(clips):
        got_1 = ext.extract_features_from_pcm(jnp.asarray(clip), SR)
        import jax

        for (pb, lb), (p1, l1) in zip(
            jax.tree_util.tree_leaves_with_path(got_b),
            jax.tree_util.tree_leaves_with_path(got_1),
        ):
            assert jax.tree_util.keystr(pb) == jax.tree_util.keystr(p1)
            np.testing.assert_allclose(
                np.asarray(lb)[i], np.asarray(l1),
                rtol=1e-5, atol=1e-5,
                err_msg=f"{jax.tree_util.keystr(pb)} clip {i}",
            )


def test_speech_program_respects_toggles(clips):
    cfg = _cfg(
        enable_mfcc=False, enable_speech_features=False,
        enable_spectral_contrast=False, enable_temporal_features=False,
    )
    ext = SpeechFeatureExtractor(cfg)
    got = ext.extract_features_from_pcm(jnp.asarray(clips[0]), SR)
    assert got.mfcc is None
    assert got.speech_features is None
    assert got.temporal_features is None
    assert got.spectral_features.spectral_contrast is None
    assert got.spectral_features.spectral_centroid is not None
    assert got.energy_features is not None


def test_music_program_matches_composition(clips):
    cfg = _cfg(enable_speech_features=False)
    ext = MusicFeatureExtractor(cfg)
    pcm = jnp.asarray(clips[1])
    spec = stft(pcm, cfg.window_size, cfg.hop_size, cfg.window_type, SR)
    want = ext.extract_features(spec, pcm, SR)
    got = ext.extract_features_from_pcm(pcm, SR)
    _assert_tree_close(got, want)
    assert got.metadata["extractor_type"] == "music"
