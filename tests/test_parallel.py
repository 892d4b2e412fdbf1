"""Sharding/mesh tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sonido_sonar_tpu.config.config import FeatureConfig
from sonido_sonar_tpu.io.synth import shift_signal, white_noise
from sonido_sonar_tpu.parallel.matcher import (
    fingerprint_matrix,
    pack_statistics,
    sharded_top_k_matches,
)
from sonido_sonar_tpu.parallel.mesh import data_sharding, make_mesh, pad_to_multiple
from sonido_sonar_tpu.parallel.pipeline import (
    BatchedFingerprintPipeline,
    batched_fingerprint_features,
    batched_pair_alignment,
)

SR = 8000


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert int(np.prod(list(mesh.shape.values()))) == 8


def test_batched_features_match_single():
    """Sharded batch result == per-sample result."""
    mesh = make_mesh()
    rng = np.random.default_rng(0)
    pcm = rng.standard_normal((8, SR)).astype(np.float32) * 0.1
    cfg = FeatureConfig(sample_rate=SR, window_size=512, hop_size=128)
    pipe = BatchedFingerprintPipeline(mesh, cfg)
    feats = pipe(pcm)
    single = batched_fingerprint_features(
        jnp.asarray(pcm[3:4]), sample_rate=SR, window_size=512, hop_size=128
    )
    np.testing.assert_allclose(
        np.asarray(feats["mfcc"][3]), np.asarray(single["mfcc"][0]), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(feats["spectral_centroid"][3]),
        np.asarray(single["spectral_centroid"][0]),
        rtol=1e-5,
    )


def test_batched_pair_alignment_lags():
    mesh = make_mesh()
    rng = np.random.default_rng(1)
    base = rng.standard_normal((8, 500)).astype(np.float32)
    lags = [0, 2, 5, -3, 7, 1, 4, -6]
    shifted = np.stack([np.roll(base[i], lags[i]) for i in range(8)])
    from jax.sharding import NamedSharding, PartitionSpec as P

    q = jax.device_put(jnp.asarray(base), data_sharding(mesh))
    r = jax.device_put(jnp.asarray(shifted), data_sharding(mesh))
    res = batched_pair_alignment(q, r, max_lag=16)
    got = np.asarray(res["lag_frames"])
    np.testing.assert_array_equal(got, lags)
    assert (np.asarray(res["peak_correlation"]) > 0.9).all()


def test_sharded_top_k():
    mesh = make_mesh()
    rng = np.random.default_rng(2)
    corpus = rng.standard_normal((21, 44)).astype(np.float32)  # non-multiple of 8
    query = corpus[7] + 0.01 * rng.standard_normal(44).astype(np.float32)
    idx, scores = sharded_top_k_matches(query, corpus, k=5, mesh=mesh)
    assert idx[0] == 7
    assert scores[0] > scores[1]
    assert len(idx) == 5


def test_top_k_no_mesh():
    rng = np.random.default_rng(3)
    corpus = rng.standard_normal((10, 44)).astype(np.float32)
    idx, scores = sharded_top_k_matches(corpus[2], corpus, k=3, mesh=None)
    assert idx[0] == 2


def test_pad_to_multiple():
    x = np.ones((5, 3))
    padded, n = pad_to_multiple(x, 4)
    assert padded.shape == (8, 3)
    assert n == 5


def test_pack_statistics_roundtrip():
    """Packed vectors: identical fingerprints -> identical vectors."""
    from sonido_sonar_tpu.config.config import FingerprintConfig
    from sonido_sonar_tpu.fingerprint import FingerprintGenerator
    from sonido_sonar_tpu.io.audio import AudioData, AudioMetadata
    from sonido_sonar_tpu.io.synth import speech_like

    clip = speech_like(2.0, SR)
    gen = FingerprintGenerator(
        FingerprintConfig(feature_config=FeatureConfig(sample_rate=SR))
    )
    fp1 = gen.generate_fingerprint(
        AudioData(clip, SR, metadata=AudioMetadata(genre="talk"))
    )
    fp2 = gen.generate_fingerprint(
        AudioData(clip, SR, metadata=AudioMetadata(genre="talk"))
    )
    v1, v2 = pack_statistics(fp1), pack_statistics(fp2)
    np.testing.assert_allclose(v1, v2, atol=1e-6)
    mat = fingerprint_matrix([fp1, fp2])
    assert mat.shape[0] == 2


def test_graft_entry_contract():
    """The driver contract: entry() compiles; dryrun_multichip(8) runs."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out["mfcc"])
    assert out["mfcc"].shape[0] == 2

    g.dryrun_multichip(8)


def test_run_stream_overlap():
    from sonido_sonar_tpu.parallel.pipeline import run_stream

    mesh = make_mesh()
    cfg = FeatureConfig(sample_rate=SR, window_size=512, hop_size=128)
    pipe = BatchedFingerprintPipeline(mesh, cfg)
    rng = np.random.default_rng(3)
    batches = [rng.standard_normal((8, SR)).astype(np.float32) * 0.1 for _ in range(5)]
    outs = list(run_stream(pipe, iter(batches)))
    assert len(outs) == 5
    # order preserved: recompute batch 0 directly
    direct = pipe(batches[0])
    np.testing.assert_allclose(
        np.asarray(outs[0]["mfcc"]), np.asarray(direct["mfcc"]), atol=1e-5
    )


def test_batched_pair_dtw():
    from sonido_sonar_tpu.parallel.pipeline import batched_pair_dtw

    rng = np.random.default_rng(6)
    base = np.cumsum(rng.standard_normal((4, 140, 3), dtype=np.float32), axis=1)
    shifts = [0, 5, 10, -7]
    T = 100
    q = np.stack([base[i, 20 : 20 + T] for i in range(4)])
    r = np.stack([base[i, 20 + s : 20 + s + T] for i, s in enumerate(shifts)])
    out = batched_pair_dtw(jnp.asarray(q), jnp.asarray(r), band=20)
    got = np.asarray(out["offset_frames"])
    # r[i] = q shifted by +s -> reference index leads -> offset = -s
    np.testing.assert_allclose(got, [-s for s in shifts], atol=2)
    assert (np.asarray(out["distance"]) >= 0).all()


def test_batched_refine_offsets_exact():
    """Vectorized GCC-PHAT refinement recovers exact-sample offsets for
    a batch of pairs from coarse estimates several hops off."""
    import numpy as np
    from sonido_sonar_tpu.io.synth import harmonic_tone, shift_signal, white_noise
    from sonido_sonar_tpu.parallel.pipeline import batched_refine_offsets

    sr = 8000
    rng = np.random.default_rng(3)
    base = np.asarray(
        harmonic_tone(150.0, 4.0, sr) + white_noise(4.0, sr, 0.05, seed=5)
    )
    env = np.interp(
        np.arange(len(base)), np.linspace(0, len(base), 32),
        rng.uniform(0.2, 1.0, 32),
    )
    src = (base * env).astype(np.float32)

    true_lags = [801, -403, 1537, 97]
    qs, rs, coarse = [], [], []
    for lag in true_lags:
        cdn = np.asarray(shift_signal(src, lag, noise=0.01, gain=0.9))
        qs.append(src)
        rs.append(cdn.astype(np.float32))
        coarse.append((lag + rng.integers(-300, 300)) / sr)  # a few hops off

    refined = batched_refine_offsets(
        jnp.asarray(np.stack(qs)), jnp.asarray(np.stack(rs)),
        jnp.asarray(coarse, jnp.float32), sr,
        hop_size=128, search_hops=8, max_offset_samples=2000,
    )
    got = np.round(np.asarray(refined) * sr).astype(int)
    np.testing.assert_array_equal(got, np.asarray(true_lags))


def test_batched_music_extractor_matches_per_signal():
    """VERDICT r2 item #4: the one-program batched music extractor
    equals the per-signal MusicFeatureExtractor on every shared field
    (plus key/chord/CQT/HPCP extras are well-formed)."""
    from sonido_sonar_tpu.extractors.music import MusicFeatureExtractor
    from sonido_sonar_tpu.io.synth import music_like
    from sonido_sonar_tpu.ops.stft import stft
    from sonido_sonar_tpu.parallel.pipeline import (
        batched_music_extractor_features,
    )

    sr, w, h = SR, 512, 128
    pcm = np.stack(
        [music_like(4.0, sr, seed=s).astype(np.float32) for s in (1, 2)]
    )
    out = batched_music_extractor_features(
        jnp.asarray(pcm), sample_rate=sr, window_size=w, hop_size=h,
        enable_cqt=True, enable_hpcp=True,
    )

    cfg = FeatureConfig(
        sample_rate=sr, window_size=w, hop_size=h,
        enable_harmonic_features=True,
    )
    ext = MusicFeatureExtractor(cfg)
    for b in range(2):
        spec = stft(jnp.asarray(pcm[b]), w, h, sample_rate=sr)
        ref = ext.extract_features(spec, jnp.asarray(pcm[b]), sr)
        sf, tf, ef, hf = (
            ref.spectral_features, ref.temporal_features,
            ref.energy_features, ref.harmonic_features,
        )
        pairs = [
            (out["mfcc"][b], ref.mfcc),
            (out["chroma"][b], ref.chroma_features),
            (out["spectral_centroid"][b], sf.spectral_centroid),
            (out["spectral_contrast"][b], sf.spectral_contrast),
            (out["zcr"][b], sf.zero_crossing_rate),
            (out["rms_energy"][b], tf.rms_energy),
            (out["onset_mask"][b], tf.onset_mask),
            (out["onset_density"][b], tf.onset_density),
            (out["dynamic_range"][b], tf.dynamic_range),
            (out["crest_factor"][b], tf.crest_factor),
            (out["silence_ratio"][b], tf.silence_ratio),
            (out["envelope_shape"][b], tf.envelope_shape),
            (out["tempo_bpm"][b], tf.tempo_bpm),
            (out["energy_variance"][b], ef.energy_variance),
            (out["energy_entropy"][b], ef.energy_entropy),
            (out["loudness_range"][b], ef.loudness_range),
            (out["low_energy_ratio"][b], ef.low_energy_ratio),
            (out["high_energy_ratio"][b], ef.high_energy_ratio),
            (out["pitch"][b], hf.pitch_estimate),
            (out["pitch_confidence"][b], hf.pitch_confidence),
            (out["hnr"][b], hf.harmonic_ratio),
            (out["inharmonicity"][b], hf.inharmonicity_ratio),
            (out["tonal_centroid"][b], hf.tonal_centroid),
        ]
        for i, (got, want) in enumerate(pairs):
            np.testing.assert_allclose(
                np.asarray(got, dtype=np.float32),
                np.asarray(want, dtype=np.float32),
                rtol=2e-4, atol=2e-4, err_msg=f"field {i} (batch {b})",
            )

    # tonal extras: 24 key correlations in [-1, 1]; per-frame chord
    # match against the template bank; CQT/HPCP chromas normalized
    assert out["key_correlations"].shape == (2, 24)
    assert float(jnp.max(jnp.abs(out["key_correlations"]))) <= 1.0 + 1e-6
    t = out["chroma"].shape[1]
    assert out["chord_index"].shape == (2, t)
    assert out["chroma_cqt"].shape[-1] == 12
    sums = np.asarray(jnp.sum(out["chroma_cqt"], axis=-1))
    assert np.all((sums < 1.0 + 1e-4))
    assert out["hpcp"].shape[-1] == 12


def test_batched_speech_extractor_matches_per_signal():
    """The batched speech-extractor surface covers the per-signal
    SpeechFeatureExtractor payload: tilt/pauses/speech-rate (added in
    round 3 via hop-block framed sums — no frames tensor) equal the
    extractor's values field by field. The oracle applies the same
    speech pre-emphasis the public extract_features path applies before
    _extract_speech (extractors/speech.py:85) so the comparison covers
    the real signal flow, not the private helper on raw PCM."""
    from sonido_sonar_tpu.extractors.speech import SpeechFeatureExtractor
    from sonido_sonar_tpu.io.synth import speech_like
    from sonido_sonar_tpu.ops.filters import pre_emphasis_for_content
    from sonido_sonar_tpu.parallel.pipeline import (
        batched_speech_extractor_features,
    )

    sr, w, h = SR, 512, 128
    pcm = np.stack(
        [speech_like(3.0, sr, seed=s).astype(np.float32) for s in (1, 2)]
    )
    out = batched_speech_extractor_features(
        jnp.asarray(pcm), sample_rate=sr, window_size=w, hop_size=h,
    )
    cfg = FeatureConfig(sample_rate=sr, window_size=w, hop_size=h)
    ext = SpeechFeatureExtractor(cfg)
    for b in range(2):
        pre = pre_emphasis_for_content(jnp.asarray(pcm[b]), "speech")
        spf = ext._extract_speech(pre, sr)
        # guard against a vacuous all-zero comparison (is_speech gate)
        assert np.any(np.asarray(spf.spectral_tilt) != 0.0), "tilt gated off"
        np.testing.assert_allclose(
            np.asarray(out["spectral_tilt"][b]),
            np.asarray(spf.spectral_tilt),
            rtol=2e-4, atol=2e-3, err_msg=f"tilt (batch {b})",
        )
        np.testing.assert_allclose(
            np.asarray(out["pause_duration"][b]),
            np.asarray(spf.pause_duration),
            atol=1e-5, err_msg=f"pauses (batch {b})",
        )
        assert int(out["pause_count"][b]) == int(spf.pause_count)
        np.testing.assert_allclose(
            float(out["speech_rate"][b]), float(spf.speech_rate),
            rtol=1e-5, atol=1e-6,
        )
        np.testing.assert_allclose(
            float(out["jitter"][b]), float(spf.jitter),
            rtol=1e-4, atol=1e-4,
        )
