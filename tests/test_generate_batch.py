"""Public batched generation == per-clip generation (VERDICT r3 #1).

generate_fingerprints_batch groups clips by detected content type, runs
ONE extractor program per group, assembles with one device_get per
group — and must equal per-clip generate_fingerprint on every feature
field. Content detection's acoustic stage runs as one device program
whose features must match the host float64 classifier path.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from sonido_sonar_tpu.config.config import ContentType, FeatureConfig, FingerprintConfig
from sonido_sonar_tpu.fingerprint import ContentDetector, FingerprintGenerator
from sonido_sonar_tpu.fingerprint.content_detector import (
    batched_acoustic_features_device,
)
from sonido_sonar_tpu.io.audio import AudioData, AudioMetadata
from sonido_sonar_tpu.io.synth import harmonic_tone, speech_like, white_noise

SR = 22050


def _audio(pcm, genre=""):
    meta = AudioMetadata(genre=genre) if genre else None
    return AudioData(pcm=np.asarray(pcm, np.float32), sample_rate=SR, metadata=meta)


@pytest.fixture(scope="module")
def clips():
    music = (harmonic_tone(220.0, 3.0, SR) + white_noise(3.0, SR, 0.02)).astype(
        np.float32
    )
    talk = speech_like(3.0, SR, seed=3)
    talk2 = speech_like(3.0, SR, seed=4)
    return music, talk, talk2


@pytest.fixture(scope="module")
def generator():
    cfg = FingerprintConfig(
        feature_config=FeatureConfig(sample_rate=SR, window_size=1024, hop_size=256)
    )
    return FingerprintGenerator(cfg, strict_reference_routing=False)


def _assert_features_close(got, want, err):
    import jax

    got_l = jax.tree_util.tree_leaves_with_path(got)
    want_l = jax.tree_util.tree_leaves_with_path(want)
    assert [jax.tree_util.keystr(p) for p, _ in got_l] == [
        jax.tree_util.keystr(p) for p, _ in want_l
    ], err
    for (p, g), (_, w) in zip(got_l, want_l):
        np.testing.assert_allclose(
            np.asarray(g, np.float64), np.asarray(w, np.float64),
            rtol=1e-4, atol=1e-4,
            err_msg=f"{err}: {jax.tree_util.keystr(p)}",
        )


def test_batch_equals_per_clip(clips, generator):
    """The verdict's done-condition: grouped-by-content batch output
    equals per-clip generate_fingerprint, across TWO content groups."""
    music, talk, talk2 = clips
    audios = [
        _audio(music, genre="rock"),
        _audio(talk, genre="talk radio"),
        _audio(talk2, genre="talk radio"),
    ]
    batch = generator.generate_fingerprints_batch(audios)
    assert len(batch) == 3
    for fp, audio in zip(batch, audios):
        single = generator.generate_fingerprint(audio)
        assert fp.content_type == single.content_type
        assert fp.metadata["extractor_name"] == single.metadata["extractor_name"]
        assert isinstance(np.asarray(fp.features.spectral_features.spectral_centroid), np.ndarray)
        _assert_features_close(
            fp.features, single.features, f"clip {fp.content_type}"
        )
        assert len(fp.id) == 16
        assert fp.metadata["feature_stats"] == single.metadata["feature_stats"]


def test_batch_device_resident_and_pack_parity(clips, generator):
    """materialize=False keeps features on device; .materialize() gives
    the same results, and the device comparator packing equals the host
    float64 packer row for row."""
    from sonido_sonar_tpu.fingerprint.device_compare import comparator_matrix

    music, talk, _ = clips
    audios = [_audio(music, genre="rock"), _audio(talk, genre="talk radio")]
    fb = generator.generate_fingerprints_batch(audios, materialize=False)
    assert fb.fingerprints[0].features is None

    dev_matrix = np.asarray(fb.comparator_matrix(13))
    fps = fb.materialize()
    assert fps[0].features is not None
    host_matrix, _ = comparator_matrix(fps, 13)
    assert dev_matrix.shape == host_matrix.shape
    scale = np.maximum(np.abs(host_matrix), 1.0)
    np.testing.assert_allclose(
        dev_matrix / scale, host_matrix / scale, atol=2e-4
    )


def test_acoustic_device_features_match_host(clips):
    """One device program's [B, 9] classifier features reproduce the
    host float64 path, and classification decisions agree."""
    det = ContentDetector()
    music, talk, talk2 = clips
    batch = np.stack([music, talk, talk2])
    dev = np.asarray(batched_acoustic_features_device(jnp.asarray(batch), SR))
    for i, clip in enumerate((music, talk, talk2)):
        host = det.extract_acoustic_features(clip, SR)
        want = np.array(
            [
                host.zero_crossing_rate, host.spectral_centroid,
                host.energy_variance, host.silence_ratio,
                host.dynamic_range, host.low_freq_energy,
                host.high_freq_energy, host.harmonic_ratio,
                host.temporal_stability,
            ]
        )
        scale = np.maximum(np.abs(want), 1e-3)
        np.testing.assert_allclose(
            dev[i] / scale, want / scale, atol=2e-3, err_msg=f"clip {i}"
        )
        # classification equality through the verbatim host classifier
        from sonido_sonar_tpu.fingerprint.content_detector import AcousticFeatures

        z = dev[i]
        f_dev = AcousticFeatures(
            zero_crossing_rate=float(z[0]), spectral_centroid=float(z[1]),
            energy_variance=float(z[2]), silence_ratio=float(z[3]),
            dynamic_range=float(z[4]), low_freq_energy=float(z[5]),
            high_freq_energy=float(z[6]), harmonic_ratio=float(z[7]),
            temporal_stability=float(z[8]),
        )
        assert det.classify_from_features(f_dev) == det.classify_from_features(
            host
        ), f"clip {i}"


def test_batch_detect_cascade(clips):
    """detect_batch mirrors detect_content_type per clip (metadata ->
    acoustic -> default) for a mixed batch."""
    det = ContentDetector()
    music, talk, _ = clips
    audios = [
        _audio(music, genre="jazz"),       # metadata -> MUSIC
        _audio(talk),                      # acoustic (or default)
        _audio(music),                     # acoustic (or default)
    ]
    got = det.detect_batch(audios)
    want = [det.detect_content_type(a) for a in audios]
    assert got == want
    assert got[0] == ContentType.MUSIC


def test_batch_audios_buckets_mixed_corpus(clips, generator):
    """batch_audios groups by (rate, pow2 length); generate_fingerprints_mixed
    equals per-clip generation on the PADDED pcm (padding only extends the
    silent tail — batching.py semantics note) and keeps original metadata."""
    from sonido_sonar_tpu.fingerprint import batch_audios

    music, talk, _ = clips
    lens = [len(music), len(music) - 5000, len(talk) - 12000]
    audios = [
        _audio(music[: lens[0]], genre="rock"),
        _audio(music[: lens[1]], genre="rock"),
        _audio(talk[: lens[2]], genre="news"),
    ]
    buckets = batch_audios(audios, quantum=16384)
    # all three clips land in pow2 buckets; indices cover the input
    covered = sorted(i for b in buckets for i in b.indices)
    assert covered == [0, 1, 2]
    for b in buckets:
        assert b.pcm_matrix.shape[0] == len(b.audios)
        assert (b.pcm_matrix.shape[1] & (b.pcm_matrix.shape[1] - 1)) == 0
        for row, a in enumerate(b.audios):
            n = len(a.pcm)
            assert b.valid_lengths[row] == n
            np.testing.assert_array_equal(
                b.pcm_matrix[row, :n], np.asarray(a.pcm, np.float32)
            )
            assert not b.pcm_matrix[row, n:].any()

    fps = generator.generate_fingerprints_mixed(audios)
    assert [fp is not None for fp in fps] == [True] * 3
    for i, (fp, a) in enumerate(zip(fps, audios)):
        # metadata reflects the ORIGINAL clip
        assert fp.duration == pytest.approx(len(a.pcm) / SR)
        # features equal per-clip generation on the padded pcm
        bucket = next(b for b in buckets if i in b.indices)
        row = bucket.indices.index(i)
        padded = _audio(bucket.pcm_matrix[row], genre="rock" if i < 2 else "news")
        want = generator.generate_fingerprint(padded)
        assert fp.content_type == want.content_type
        # cross-BATCH-SIZE comparison (bucket of 2 vs per-clip of 1):
        # XLA tiles reductions differently per batch size, so f32
        # threshold ops (voicing gates) may flip on isolated frames —
        # allow <=0.5% mismatched elements per leaf at the tight tol
        import jax

        got_l = jax.tree_util.tree_leaves(fp.features)
        want_l = jax.tree_util.tree_leaves(want.features)
        assert len(got_l) == len(want_l)
        for g, w in zip(got_l, want_l):
            g = np.asarray(g, np.float64)
            w = np.asarray(w, np.float64)
            bad = ~np.isclose(g, w, rtol=1e-4, atol=1e-4)
            assert bad.mean() <= 0.005, f"clip {i}: {bad.mean():.4f} mismatched"


def test_prepare_batch_pcm_matrix_validation(generator, clips):
    music, _, _ = clips
    a = _audio(music, genre="rock")
    bad = np.zeros((2, 100), np.float32)
    with pytest.raises(ValueError):
        generator.generate_fingerprints_batch([a], pcm_matrix=bad)


def test_speculative_routing_parity(clips, generator):
    """Speculative content routing (detect-fetch overlap) must be
    invisible in results: hit, miss, and mixed-batch fall-back all equal
    speculate=False, and the uniform-type memory updates correctly."""
    music, talk, _ = clips
    ms = [_audio(music * (0.8 + 0.1 * i)) for i in range(3)]

    gen = FingerprintGenerator(
        FingerprintConfig(
            feature_config=FeatureConfig(
                sample_rate=SR, window_size=1024, hop_size=256
            )
        ),
        strict_reference_routing=False,
    )
    assert gen._spec_ct is None  # cold start: no speculation
    base = gen.generate_fingerprints_batch(ms, speculate=False)
    got1 = gen.generate_fingerprints_batch(ms)  # primes the memory
    ct = base[0].content_type
    assert gen._spec_ct == ct

    # hit path: memory matches the (uniform) detected type
    got2 = gen.generate_fingerprints_batch(ms)
    for g, w in zip(got2, base):
        assert g.content_type == w.content_type
        _assert_features_close(g.features, w.features, "speculation hit")

    # miss path: force a wrong memory; results still equal baseline
    gen._spec_ct = ContentType.SPORTS if ct != ContentType.SPORTS else ContentType.NEWS
    got3 = gen.generate_fingerprints_batch(ms)
    for g, w in zip(got3, base):
        assert g.content_type == w.content_type
        _assert_features_close(g.features, w.features, "speculation miss")
    assert gen._spec_ct == ct  # memory re-learned from the actual batch

    # mixed batch: memory clears (no speculation next call), parity holds
    mixed = [ms[0], _audio(talk)]
    w_mixed = gen.generate_fingerprints_batch(mixed, speculate=False)
    g_mixed = gen.generate_fingerprints_batch(mixed)
    if len({f.content_type for f in w_mixed}) > 1:
        assert gen._spec_ct is None
    for g, w in zip(g_mixed, w_mixed):
        assert g.content_type == w.content_type
        _assert_features_close(g.features, w.features, "mixed batch")
