"""Surface-completeness extras: FFT wrappers, decode_reader, adaptive
pre-emphasis, complex onsets, energy stats, custom contrast bands,
peaks pitch method, LPC stability, with_context."""

import io

import jax.numpy as jnp
import numpy as np
import pytest

from sonido_sonar_tpu.io.decode import Decoder, write_wav
from sonido_sonar_tpu.io.synth import harmonic_tone, sine, white_noise
from sonido_sonar_tpu.logging import new_default_logger
from sonido_sonar_tpu.ops import fft as F
from sonido_sonar_tpu.ops.filters import adaptive_pre_emphasis
from sonido_sonar_tpu.ops.framing import frame_signal
from sonido_sonar_tpu.ops.pitch import PitchParams
from sonido_sonar_tpu.ops.spectral import spectral_contrast_custom_bands
from sonido_sonar_tpu.ops.speech import lpc_analyze, lpc_is_stable
from sonido_sonar_tpu.ops.stft import stft
from sonido_sonar_tpu.ops.temporal import detect_onsets_complex, energy_statistics
from sonido_sonar_tpu.ops.tonal import PitchDetector

SR = 16000


def test_fft_wrappers():
    x = white_noise(0.05, SR, 0.3, seed=1)
    spec = F.compute(jnp.asarray(x))
    back = np.asarray(F.compute_inverse_real(spec, n=len(x)))
    np.testing.assert_allclose(back, x, atol=1e-5)
    c = F.fft_complex(jnp.asarray(x.astype(np.complex64)))
    rt = np.asarray(F.compute_inverse(c))
    np.testing.assert_allclose(rt.real, x, atol=1e-4)


def test_decode_reader(tmp_path):
    x = sine(440, 0.3, SR, 0.5)
    p = str(tmp_path / "r.wav")
    write_wav(p, x, SR)
    with open(p, "rb") as f:
        data = f.read()
    audio = Decoder().decode_reader(io.BytesIO(data))
    assert audio.duration == pytest.approx(0.3, abs=0.01)


def test_adaptive_pre_emphasis_runs():
    x = jnp.asarray(sine(440, 0.2, SR, 0.5))
    y = np.asarray(adaptive_pre_emphasis(x))
    assert y.shape == x.shape
    # behaves like pre-emphasis: attenuates a low tone
    assert np.abs(y[100:]).mean() < np.abs(np.asarray(x)[100:]).mean()


def test_complex_onset_detection():
    burst = sine(880, 0.15, SR, 0.8)
    gap = np.zeros(int(0.3 * SR), np.float32)
    x = np.concatenate([gap, burst, gap, burst, gap])
    res = stft(jnp.asarray(x), 1024, 256, sample_rate=SR, return_phase=True)
    mask, count = detect_onsets_complex(
        res.magnitude, res.phase, 256, SR, threshold=0.3
    )
    assert 1 <= int(count) <= 6


def test_energy_statistics():
    x = jnp.asarray(white_noise(0.5, SR, 0.3, seed=2))
    stats = energy_statistics(x, 1024, 256)
    assert float(stats["mean"]) > 0
    assert float(stats["min"]) <= float(stats["mean"]) <= float(stats["max"])
    assert float(stats["entropy"]) > 0


def test_contrast_custom_bands():
    x = sine(1000, 0.3, SR, 0.5)
    mag = stft(jnp.asarray(x), 2048, 512, sample_rate=SR).magnitude
    con = np.asarray(
        spectral_contrast_custom_bands(mag, SR, (200.0, 800.0, 1500.0, 4000.0))
    )
    assert con.shape[-1] == 3
    # the band containing the tone has the highest contrast
    assert con.mean(axis=0).argmax() == 1


def test_peaks_pitch_method():
    x = sine(440, 0.3, SR, 0.5)
    det = PitchDetector(SR, "peaks", PitchParams(sample_rate=SR, window_size=2048))
    frames = frame_signal(jnp.asarray(x), 2048, 1024)
    res = det.detect(frames)
    p = np.asarray(res.pitch)
    assert np.median(p[p > 0]) == pytest.approx(440, abs=20)


def test_lpc_stability():
    x = jnp.asarray(harmonic_tone(200.0, 0.3, SR))
    res = lpc_analyze(x[:2048], SR, order=12)
    assert bool(lpc_is_stable(res.reflection))


def test_logger_with_context(capsys):
    log = new_default_logger("debug")
    scoped = log.with_context("req-123").with_component("test", "fn")
    scoped.info("hello", extra=1)  # should not raise


def test_mfcc_sequence_and_dtw_variants():
    """The reference's disabled MFCC comparison methods, opt-in here."""
    from sonido_sonar_tpu.config.config import ContentType
    from sonido_sonar_tpu.fingerprint.comparison import (
        combine_mfcc_methods,
        compare_mfcc_sequences,
        compare_mfcc_with_dtw,
    )

    rng = np.random.default_rng(0)
    a = rng.standard_normal((60, 13)).astype(np.float32)
    b = a + 0.01 * rng.standard_normal((60, 13)).astype(np.float32)
    c = rng.standard_normal((60, 13)).astype(np.float32)
    assert compare_mfcc_sequences(a, b) > compare_mfcc_sequences(a, c)
    assert compare_mfcc_with_dtw(a, b) > compare_mfcc_with_dtw(a, c)
    comb = combine_mfcc_methods(0.9, 0.8, 0.7, ContentType.MUSIC)
    assert comb == pytest.approx(0.15 * 0.9 + 0.35 * 0.8 + 0.50 * 0.7)


def test_metrics():
    from sonido_sonar_tpu.utils.metrics import Metrics

    m = Metrics()
    m.record_audio(30.0, 5000)
    with m.timer("stage_a"):
        _ = sum(range(1000))
    snap = m.snapshot()
    assert snap["counters"]["audio_seconds"] == 30.0
    assert snap["stages"]["stage_a"]["calls"] == 1
    assert "throughput_audio_hours_per_hour" in snap
    m.reset()
    assert m.snapshot()["counters"] == {}


def test_generate_fingerprints_batch_matches_loop():
    """Batched generation (one stacked extraction per content group)
    must produce fingerprints equivalent to per-clip generation."""
    import numpy as np

    from sonido_sonar_tpu.config.config import FeatureConfig, FingerprintConfig
    from sonido_sonar_tpu.fingerprint import (
        FingerprintComparator,
        FingerprintGenerator,
    )
    from sonido_sonar_tpu.io.audio import AudioData, AudioMetadata
    from sonido_sonar_tpu.io.synth import harmonic_tone, white_noise

    sr = 8000
    clips = []
    for i in range(3):
        x = np.asarray(
            harmonic_tone(150.0 + 40 * i, 1.0, sr)
            + white_noise(1.0, sr, 0.03, seed=i),
            dtype=np.float32,
        )
        md = AudioMetadata(
            url=f"clip{i}",
            extra={"content_type": "music" if i % 2 else "news"},
        )
        clips.append(AudioData(pcm=x, sample_rate=sr, channels=1, metadata=md))

    cfg = FingerprintConfig(
        feature_config=FeatureConfig(sample_rate=sr, window_size=512, hop_size=128)
    )
    gen = FingerprintGenerator(cfg)
    fps_batch = gen.generate_fingerprints_batch(clips)
    fps_loop = [gen.generate_fingerprint(c) for c in clips]
    comp = FingerprintComparator()
    import jax

    for a, b in zip(fps_batch, fps_loop):
        assert a.content_type == b.content_type
        # feature-tree parity: every array of the batched fingerprint
        # matches its per-clip counterpart
        la = jax.tree_util.tree_leaves(a.features)
        lb = jax.tree_util.tree_leaves(b.features)
        assert len(la) == len(lb)
        for xa, xb in zip(la, lb):
            if hasattr(xa, "shape"):
                assert xa.shape == xb.shape
                assert np.allclose(
                    np.asarray(xa), np.asarray(xb), rtol=1e-4, atol=1e-5
                )
        # and the comparator sees them as the same fingerprint
        assert (
            comp.compare(a, b).overall_similarity
            == comp.compare(b, b).overall_similarity
        )

    # guardrails
    import pytest

    with pytest.raises(ValueError):
        gen.generate_fingerprints_batch(
            [clips[0], AudioData(pcm=np.zeros(123, np.float32), sample_rate=sr, channels=1)]
        )
    assert gen.generate_fingerprints_batch([]) == []


def test_speech_extractor_batch_axis():
    """The speech extractor (speech features enabled) must accept
    [B, N] PCM and produce leading batch axes matching single-clip runs."""
    import numpy as np
    import jax.numpy as jnp

    from sonido_sonar_tpu.config.config import FeatureConfig
    from sonido_sonar_tpu.extractors.speech import SpeechFeatureExtractor
    from sonido_sonar_tpu.io.synth import harmonic_tone, white_noise
    from sonido_sonar_tpu.ops.stft import stft

    sr = 8000
    cfg = FeatureConfig(sample_rate=sr, window_size=512, hop_size=128).with_(
        enable_speech_features=True
    )
    pcm = jnp.stack(
        [
            jnp.asarray(
                harmonic_tone(160.0 + 30 * i, 1.0, sr)
                + white_noise(1.0, sr, 0.02, seed=i)
            )
            for i in range(2)
        ]
    ).astype(jnp.float32)
    spec = stft(pcm, 512, 128, cfg.window_type, sr)
    ext = SpeechFeatureExtractor(cfg)
    feats = ext.extract_features(spec, pcm, sr)
    assert feats.speech_features is not None
    spec0 = stft(pcm[0], 512, 128, cfg.window_type, sr)
    f0 = ext.extract_features(spec0, pcm[0], sr).speech_features
    fb = feats.speech_features
    for k in ("formant_frequencies", "voicing_probability", "jitter",
              "spectral_tilt", "speech_rate", "pause_count"):
        a = np.asarray(getattr(fb, k))[0]
        b = np.asarray(getattr(f0, k))
        assert np.allclose(a, b, rtol=1e-5, atol=1e-6), k


def test_all_extractors_batch_axis_parity():
    """Every content extractor must accept [B, N] PCM and reproduce its
    single-clip outputs on each batch row (the batched generator relies
    on this)."""
    import jax
    import numpy as np
    import jax.numpy as jnp

    from sonido_sonar_tpu.config.config import FeatureConfig
    from sonido_sonar_tpu.extractors.music import MusicFeatureExtractor
    from sonido_sonar_tpu.extractors.speech import SpeechFeatureExtractor
    from sonido_sonar_tpu.extractors.sports import (
        MixedFeatureExtractor,
        SportsFeatureExtractor,
    )
    from sonido_sonar_tpu.io.synth import harmonic_tone, white_noise
    from sonido_sonar_tpu.ops.stft import stft

    sr = 8000
    cfg = FeatureConfig(sample_rate=sr, window_size=512, hop_size=128).with_(
        enable_harmonic_features=True,
        enable_chroma=True,
        enable_speech_features=True,
    )
    pcm = jnp.stack(
        [
            jnp.asarray(
                harmonic_tone(160.0 + 30 * i, 1.0, sr)
                + white_noise(1.0, sr, 0.02, seed=i)
            )
            for i in range(2)
        ]
    ).astype(jnp.float32)
    spec = stft(pcm, 512, 128, cfg.window_type, sr)
    spec0 = stft(pcm[0], 512, 128, cfg.window_type, sr)

    for cls in (
        SpeechFeatureExtractor,
        MusicFeatureExtractor,
        SportsFeatureExtractor,
        MixedFeatureExtractor,
    ):
        ext = cls(cfg)
        fb = ext.extract_features(spec, pcm, sr)
        f0 = ext.extract_features(spec0, pcm[0], sr)
        lb = jax.tree_util.tree_leaves(fb)
        l0 = jax.tree_util.tree_leaves(f0)
        assert len(lb) == len(l0), cls.__name__
        for a, b in zip(lb, l0):
            if hasattr(a, "shape"):
                assert a.shape[1:] == b.shape, (cls.__name__, a.shape, b.shape)
                assert np.allclose(
                    np.asarray(a)[0], np.asarray(b), rtol=1e-4, atol=1e-4
                ), cls.__name__
