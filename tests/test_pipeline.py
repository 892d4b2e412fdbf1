"""End-to-end pipeline: generate -> compare -> align (SURVEY.md section 4)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sonido_sonar_tpu.config.config import (
    ContentType,
    FeatureConfig,
    FingerprintConfig,
)
from sonido_sonar_tpu.extractors import (
    AlignmentExtractor,
    FeatureExtractorFactory,
    MusicFeatureExtractor,
    SpeechFeatureExtractor,
)
from sonido_sonar_tpu.fingerprint import (
    ContentDetector,
    FingerprintComparator,
    FingerprintGenerator,
)
from sonido_sonar_tpu.fingerprint.content_detector import (
    detect_from_metadata,
    infer_from_genre,
    infer_from_station,
)
from sonido_sonar_tpu.io.audio import AudioData, AudioMetadata
from sonido_sonar_tpu.io.synth import harmonic_tone, shift_signal, speech_like, white_noise
from sonido_sonar_tpu.ops.stft import stft

SR = 22050


def make_audio(pcm, genre=""):
    meta = AudioMetadata(genre=genre) if genre else None
    return AudioData(pcm=np.asarray(pcm, np.float32), sample_rate=SR, metadata=meta)


@pytest.fixture(scope="module")
def music_clip():
    return (harmonic_tone(220.0, 4.0, SR) + white_noise(4.0, SR, 0.02)).astype(np.float32)


@pytest.fixture(scope="module")
def broadcast_clip():
    """Non-stationary clip for alignment: energy-correlation alignment
    needs amplitude structure (a stationary tone's energy series is flat
    and gives a degenerate correlation peak — in the reference too)."""
    x = harmonic_tone(220.0, 6.0, SR) + white_noise(6.0, SR, 0.05, seed=11)
    # aperiodic amplitude envelope (smoothed noise): a periodic envelope
    # would create ambiguous correlation peaks at its own period
    rng = np.random.default_rng(17)
    knots = rng.uniform(0.15, 1.0, 60)
    env = np.interp(np.arange(len(x)), np.linspace(0, len(x), 60), knots)
    return (x * env).astype(np.float32)


@pytest.fixture(scope="module")
def speech_clip():
    return speech_like(4.0, SR)


@pytest.fixture(scope="module")
def generator():
    cfg = FingerprintConfig(feature_config=FeatureConfig(sample_rate=SR))
    return FingerprintGenerator(cfg)


def test_factory_reference_routing():
    """Quirk #1: all content types route to the speech extractor."""
    fc = FeatureConfig(sample_rate=SR)
    factory = FeatureExtractorFactory(strict_reference_routing=True)
    assert isinstance(factory.create_extractor(ContentType.MUSIC, fc), SpeechFeatureExtractor)
    assert isinstance(factory.create_extractor(ContentType.SPORTS, fc), SpeechFeatureExtractor)
    factory2 = FeatureExtractorFactory(strict_reference_routing=False)
    assert isinstance(factory2.create_extractor(ContentType.MUSIC, fc), MusicFeatureExtractor)


def test_extractor_weights():
    fc = FeatureConfig(sample_rate=SR, similarity_weights=())
    news = SpeechFeatureExtractor(fc, is_news=True)
    talk = SpeechFeatureExtractor(fc, is_news=False)
    assert news.get_feature_weights() == {"mfcc": 0.35, "speech": 0.40, "spectral": 0.15, "temporal": 0.10}
    assert talk.get_feature_weights() == {"mfcc": 0.40, "speech": 0.35, "spectral": 0.15, "temporal": 0.10}


def test_content_detector_metadata():
    assert infer_from_genre("Classic Rock") == ContentType.MUSIC
    assert infer_from_genre("breaking news") == ContentType.NEWS
    assert infer_from_genre("football highlights") == ContentType.SPORTS
    assert infer_from_station("WNYC public radio", "") == ContentType.NEWS
    assert infer_from_station("ESPN Radio", "") == ContentType.SPORTS
    meta = AudioMetadata(genre="jazz")
    assert detect_from_metadata(meta) == ContentType.MUSIC


def test_content_detector_acoustic(music_clip, speech_clip):
    det = ContentDetector()
    t_music = det.detect_from_audio(music_clip, SR)
    # strongly harmonic + stable: should lean music (or at least classify)
    assert t_music in (ContentType.MUSIC, ContentType.NEWS, ContentType.UNKNOWN)
    feats = det.extract_acoustic_features(music_clip, SR)
    assert feats.harmonic_ratio >= 0.0
    assert 0 <= feats.silence_ratio <= 1


def test_generate_fingerprint(generator, music_clip):
    fp = generator.generate_fingerprint(make_audio(music_clip, genre="rock"))
    assert fp.content_type == ContentType.MUSIC
    assert fp.features.mfcc is not None
    assert fp.features.spectral_features is not None
    assert fp.features.energy_features is not None
    assert fp.duration == pytest.approx(4.0, abs=0.01)
    assert len(fp.id) == 16
    assert fp.metadata["extractor_name"] == "SpeechFeatureExtractor"  # quirk #1


def test_compare_identical(generator, music_clip, speech_clip):
    comp = FingerprintComparator()
    # Music through the speech extractor (quirk #1): the speech
    # pre-emphasis kills the fundamental, the pitch track is all zeros,
    # and the reference's cosine on zero-stat vectors returns 0 — so even
    # identical fingerprints score harmonic=0. With music weights
    # (mfcc .35, spectral .15, harmonic .20) that caps at 0.5/0.7.
    fp1 = generator.generate_fingerprint(make_audio(music_clip, genre="rock"))
    fp2 = generator.generate_fingerprint(make_audio(music_clip, genre="rock"))
    res = comp.compare(fp1, fp2)
    assert res.overall_similarity == pytest.approx(0.5 / 0.7, abs=0.02)
    assert res.feature_distances["mfcc"] == pytest.approx(0.0, abs=1e-5)
    assert res.feature_distances["spectral"] == pytest.approx(0.0, abs=1e-5)
    assert res.content_type_match

    # Speech-like audio: pitch detected -> all live terms match -> exact.
    sp1 = generator.generate_fingerprint(make_audio(speech_clip, genre="talk"))
    sp2 = generator.generate_fingerprint(make_audio(speech_clip, genre="talk"))
    res2 = comp.compare(sp1, sp2)
    assert res2.overall_similarity > 0.95
    assert res2.match_type == "exact"
    assert res2.confidence > 0.8


def test_compare_different(generator, music_clip, speech_clip):
    fp1 = generator.generate_fingerprint(make_audio(music_clip, genre="rock"))
    fp2 = generator.generate_fingerprint(make_audio(speech_clip, genre="talk"))
    comp = FingerprintComparator()
    res = comp.compare(fp1, fp2)
    same = comp.compare(fp1, generator.generate_fingerprint(make_audio(music_clip, genre="rock")))
    assert res.overall_similarity < same.overall_similarity


def test_find_best_matches(generator, music_clip, speech_clip):
    # speech clips reach full similarity (music is capped by the
    # zero-pitch quirk below the 0.75 default threshold — see
    # test_compare_identical)
    comp = FingerprintComparator()
    query = generator.generate_fingerprint(make_audio(speech_clip, genre="talk"))
    same = generator.generate_fingerprint(make_audio(speech_clip, genre="talk"))
    noisy = generator.generate_fingerprint(
        make_audio(speech_clip + white_noise(4.0, SR, 0.01), genre="talk")
    )
    other = generator.generate_fingerprint(make_audio(music_clip, genre="rock"))
    matches = comp.find_best_matches(query, [same, noisy, other])
    assert len(matches) >= 1
    assert matches[0].fingerprint.id == same.id
    assert matches[0].rank == 1
    # all above threshold, sorted descending
    sims = [m.similarity.overall_similarity for m in matches]
    assert sims == sorted(sims, reverse=True)


def test_quality_metrics(generator, music_clip):
    from sonido_sonar_tpu.config.config import ComparisonConfig

    comp = FingerprintComparator(ComparisonConfig(enable_detailed_metrics=True))
    fp1 = generator.generate_fingerprint(make_audio(music_clip, genre="rock"))
    fp2 = generator.generate_fingerprint(make_audio(music_clip, genre="rock"))
    res = comp.compare(fp1, fp2)
    assert res.quality_metrics is not None
    # music config via speech extractor: mfcc + spectral + harmonic = 3/6
    assert res.quality_metrics.data_availability == pytest.approx(0.5)
    assert res.quality_metrics.temporal_alignment == pytest.approx(1.0)
    assert res.quality_metrics.spectral_coherence == pytest.approx(1.0)


def test_alignment_end_to_end(broadcast_clip):
    """The headline use case: recover a known CDN delay within one hop."""
    lag_samples = int(0.75 * SR)  # CDN stream 750 ms late
    source = broadcast_clip
    cdn = shift_signal(source, lag_samples, noise=0.02, gain=0.9)

    fc = FeatureConfig(sample_rate=SR, window_size=1024, hop_size=256)
    gen = FingerprintGenerator(FingerprintConfig(feature_config=fc))
    fp_src = gen.generate_fingerprint(make_audio(source, genre="rock"))
    fp_cdn = gen.generate_fingerprint(make_audio(cdn, genre="rock"))

    ext = AlignmentExtractor(fc, max_lag_seconds=2.0)
    feats = ext.extract_alignment_features(
        fp_src.features, fp_cdn.features,
        jnp.asarray(source), jnp.asarray(cdn), SR,
    )
    assert feats.best_alignment is not None
    # offset sign: cdn delayed by lag -> query (source) leads
    got = abs(feats.temporal_offset)
    want = lag_samples / SR
    hop_tolerance = 256 / SR
    assert got == pytest.approx(want, abs=hop_tolerance + 1e-3), (
        f"offset {got:.4f}s vs true {want:.4f}s"
    )
    assert feats.offset_confidence > 0.3
    summary = ext.get_alignment_summary(feats)
    assert summary["status"] == "success"


def test_truncate_to_alignment(broadcast_clip):
    lag = int(0.5 * SR)
    source = broadcast_clip
    cdn = shift_signal(source, lag, noise=0.01)
    fc = FeatureConfig(sample_rate=SR, window_size=1024, hop_size=256)
    ext = AlignmentExtractor(fc, max_lag_seconds=2.0)
    feats = ext.align_audio_files(jnp.asarray(source), jnp.asarray(cdn), SR)
    a, b = ext.truncate_to_alignment_pcm(source, cdn, SR, feats)
    assert len(a) == len(b)
    assert len(a) > 0
    # after truncation the ENVELOPES should correlate highly (the raw PCM
    # decorrelates from residual sub-window offset at 220 Hz period)
    import jax.numpy as _jnp
    from sonido_sonar_tpu.ops.temporal import rms_envelope
    ea = np.asarray(rms_envelope(_jnp.asarray(a), 1024, 256))
    eb = np.asarray(rms_envelope(_jnp.asarray(b), 1024, 256))
    corr = np.corrcoef(ea, eb)[0, 1]
    assert corr > 0.9


def test_align_audio_files_direct(broadcast_clip):
    lag = int(0.3 * SR)
    cdn = shift_signal(broadcast_clip, lag, noise=0.02)
    fc = FeatureConfig(sample_rate=SR, window_size=1024, hop_size=256)
    ext = AlignmentExtractor(fc, max_lag_seconds=1.0)
    feats = ext.align_audio_files(jnp.asarray(broadcast_clip), jnp.asarray(cdn), SR)
    # energy-series alignment is frame-quantized and smeared by the
    # 1024-sample energy window (4 hops) -> allow ~3 hops on this coarse
    # path; the full multi-feature path (test_alignment_end_to_end) holds
    # the 1-hop budget
    assert abs(abs(feats.temporal_offset) - lag / SR) < 3 * 256 / SR + 1e-3


def test_pcm_refinement_sample_accuracy(broadcast_clip):
    """Frame-level estimate + PCM refinement -> exact-sample latency."""
    lag = int(0.5 * SR) + 137  # deliberately off the hop grid
    source = broadcast_clip
    cdn = shift_signal(source, lag, noise=0.005)
    fc = FeatureConfig(sample_rate=SR, window_size=1024, hop_size=256)
    ext = AlignmentExtractor(fc, max_lag_seconds=2.0)
    feats = ext.align_audio_files(jnp.asarray(source), jnp.asarray(cdn), SR)
    refined = ext.refine_offset_with_pcm(
        jnp.asarray(source), jnp.asarray(cdn), SR, feats.temporal_offset,
    )
    err_samples = abs(refined * SR - lag)
    assert err_samples <= 2, f"refined err {err_samples:.1f} samples"


def test_music_extractor_end_to_end():
    """Music path via strict_reference_routing=False: chroma + harmonic
    fields populated, music weights attached. Uses a low-noise clip:
    the music pre-emphasis (alpha=0.95, applied before pitch tracking in
    the reference too) costs ~10 dB of SNR, so a noisy tone yields an
    all-zero pitch track in both implementations."""
    clip = (harmonic_tone(220.0, 4.0, SR) + white_noise(4.0, SR, 0.005)).astype(np.float32)
    cfg = FingerprintConfig(feature_config=FeatureConfig(sample_rate=SR))
    gen = FingerprintGenerator(cfg, strict_reference_routing=False)
    fp = gen.generate_fingerprint(make_audio(clip, genre="rock"))
    assert fp.metadata["extractor_name"] == "MusicFeatureExtractor"
    f = fp.features
    assert f.chroma_features is not None
    assert f.harmonic_features is not None
    assert f.temporal_features.crest_factor is not None
    ch = np.asarray(f.chroma_features).mean(axis=0)
    # 220 Hz = A: chroma should peak at A through the music path
    from sonido_sonar_tpu.ops.chroma import CHROMA_LABELS
    assert ch.argmax() == CHROMA_LABELS.index("A")
    # pitch detected (no speech pre-emphasis killing the fundamental here)
    pitch = np.asarray(f.harmonic_features.pitch_estimate)
    voiced = pitch[pitch > 0]
    assert len(voiced) > 0
    # comparator handles music fingerprints end-to-end
    fp2 = gen.generate_fingerprint(make_audio(clip, genre="rock"))
    res = FingerprintComparator().compare(fp, fp2)
    assert res.overall_similarity > 0.9


def test_find_best_matches_prefilter(generator, speech_clip, music_clip):
    """Device prefilter path returns the same top match as exhaustive."""
    comp = FingerprintComparator()
    query = generator.generate_fingerprint(make_audio(speech_clip, genre="talk"))
    same = generator.generate_fingerprint(make_audio(speech_clip, genre="talk"))
    others = [
        generator.generate_fingerprint(
            make_audio(music_clip + white_noise(4.0, SR, 0.02, seed=i), genre="rock")
        )
        for i in range(3)
    ]
    cands = [same] + others
    exhaustive = comp.find_best_matches(query, cands, use_device_prefilter=False)
    prefiltered = comp.find_best_matches(
        query, cands, use_device_prefilter=True, prefilter_threshold=2
    )
    assert exhaustive[0].fingerprint.id == prefiltered[0].fingerprint.id == same.id


def test_decode_files_parallel(tmp_path):
    from sonido_sonar_tpu.io.decode import decode_files_parallel
    from sonido_sonar_tpu.io.decode import write_wav
    from sonido_sonar_tpu.io.synth import sine

    paths = []
    for i, f in enumerate([220, 440, 880]):
        p = str(tmp_path / f"c{i}.wav")
        write_wav(p, sine(f, 0.2, SR), SR)
        paths.append(p)
    paths.append(str(tmp_path / "missing.wav"))
    out = decode_files_parallel(paths)
    assert len(out) == 4
    assert all(a is not None for a in out[:3])
    assert out[3] is None
    assert out[0].sample_rate == 44100  # resampled to decoder default


def test_sports_and_mixed_extractors(speech_clip):
    """Completed stubs: sports + mixed routes under non-strict routing."""
    from sonido_sonar_tpu.extractors import MixedFeatureExtractor, SportsFeatureExtractor

    fc = FeatureConfig(sample_rate=SR)
    factory = FeatureExtractorFactory(strict_reference_routing=False)
    sports = factory.create_extractor(ContentType.SPORTS, fc)
    mixed = factory.create_extractor(ContentType.MIXED, fc)
    assert isinstance(sports, SportsFeatureExtractor)
    assert isinstance(mixed, MixedFeatureExtractor)
    assert sports.get_feature_weights()["energy"] == 0.30
    assert mixed.get_feature_weights()["chroma"] == 0.15

    res = stft(jnp.asarray(speech_clip), fc.window_size, fc.hop_size, sample_rate=SR)
    sf = sports.extract_features(res, jnp.asarray(speech_clip), SR)
    assert sf.energy_features is not None
    assert "excitement_variance" in sf.metadata
    mf = mixed.extract_features(res, jnp.asarray(speech_clip), SR)
    assert mf.chroma_features is not None
    assert mf.speech_features is not None
    # both compare cleanly through the comparator
    from sonido_sonar_tpu.fingerprint.generator import AudioFingerprint
    import time as _time

    def wrap(feats, ct):
        return AudioFingerprint(
            id=f"t{ct.value}", stream_url="", content_type=ct,
            timestamp=_time.time(), duration=4.0, sample_rate=SR,
            hop_size=fc.hop_size, channels=1, features=feats, metadata={},
        )

    r = FingerprintComparator().compare(
        wrap(sf, ContentType.SPORTS), wrap(sf, ContentType.SPORTS)
    )
    assert r.overall_similarity > 0.9
