"""Spectral descriptor tests: synthetic signals with known properties."""

import jax.numpy as jnp
import numpy as np
import pytest

from sonido_sonar_tpu.io.synth import chirp, sine, white_noise
from sonido_sonar_tpu.ops.framing import frame_signal
from sonido_sonar_tpu.ops.spectral import (
    contrast_band_edges,
    spectral_bandwidth,
    spectral_centroid,
    spectral_contrast,
    spectral_crest,
    spectral_flatness,
    spectral_rolloff,
    spectral_slope,
    zcr,
    zcr_normalized,
)
from sonido_sonar_tpu.ops.stft import stft

SR = 44100


def mag_of(x, w=2048, h=512):
    return stft(jnp.asarray(x), w, h, sample_rate=SR).magnitude


def test_centroid_tracks_tone():
    for f in [500.0, 2000.0, 8000.0]:
        mag = mag_of(sine(f, 0.3, SR))
        c = np.asarray(spectral_centroid(mag, SR)).mean()
        assert c == pytest.approx(f, rel=0.05)


def test_centroid_chirp_monotonic():
    mag = mag_of(chirp(200, 8000, 1.0, SR))
    c = np.asarray(spectral_centroid(mag, SR))
    # centroid should broadly rise through the chirp
    third = len(c) // 3
    assert c[:third].mean() < c[-third:].mean()


def test_rolloff_above_centroid_for_noise():
    mag = mag_of(white_noise(0.3, SR, 0.2))
    roll = np.asarray(spectral_rolloff(mag, SR, 0.85)).mean()
    # white noise: 85% energy rolloff ~ 85% of nyquist
    assert roll == pytest.approx(0.85 * SR / 2, rel=0.08)


def test_bandwidth_tone_vs_noise():
    bw_tone = np.asarray(spectral_bandwidth(mag_of(sine(1000, 0.3, SR)), SR)).mean()
    bw_noise = np.asarray(spectral_bandwidth(mag_of(white_noise(0.3, SR, 0.2)), SR)).mean()
    assert bw_tone < bw_noise / 3


def test_flatness_tone_vs_noise():
    f_tone = np.asarray(spectral_flatness(mag_of(sine(1000, 0.3, SR)))).mean()
    f_noise = np.asarray(spectral_flatness(mag_of(white_noise(0.3, SR, 0.2)))).mean()
    assert f_tone < 0.1
    assert f_noise > 0.3


def test_crest_tone_vs_noise():
    c_tone = np.asarray(spectral_crest(mag_of(sine(1000, 0.3, SR)))).mean()
    c_noise = np.asarray(spectral_crest(mag_of(white_noise(0.3, SR, 0.2)))).mean()
    assert c_tone > 2 * c_noise


def test_slope_sign():
    """Pink-ish (low-passed) spectrum slopes down; rising chirp average
    spectrum is flat-to-rising vs a 1/f shape."""
    mag_noise = mag_of(white_noise(0.3, SR, 0.2))
    s_noise = np.asarray(spectral_slope(mag_noise, SR)).mean()
    # white noise log-log slope ~ 0
    assert abs(s_noise) < 1.0


def test_contrast_band_edges_monotonic():
    edges = contrast_band_edges(6, 1025, SR)
    assert len(edges) == 7
    assert all(edges[i] < edges[i + 1] for i in range(6))


def test_contrast_tone_high_in_its_band():
    mag = mag_of(sine(1000, 0.3, SR))
    con = np.asarray(spectral_contrast(mag, SR, 6)).mean(axis=0)
    assert con.shape == (6,)
    # tonal content: at least one band with very high peak/valley contrast
    assert con.max() > 20.0


def test_zcr_of_tone():
    """A f Hz sine crosses zero 2f times/sec."""
    f = 1000.0
    frames = frame_signal(jnp.asarray(sine(f, 0.3, SR)), 1024, 512)
    rate = np.asarray(zcr(frames, SR)).mean()
    assert rate == pytest.approx(2 * f, rel=0.03)


def test_zcr_normalized_range():
    frames = frame_signal(jnp.asarray(white_noise(0.2, SR, 0.2)), 1024, 512)
    zn = np.asarray(zcr_normalized(frames))
    assert (zn >= 0).all() and (zn <= 1).all()
    assert zn.mean() == pytest.approx(0.5, abs=0.1)  # white noise ~ 0.5


def test_vad_and_segments():
    """ZCR-based VAD: speech-band frames pass, silence/noise fail."""
    from sonido_sonar_tpu.io.synth import speech_like
    from sonido_sonar_tpu.ops.spectral import (
        classify_frame_type,
        detect_speech_segments,
        detect_voice_activity,
        zcr_with_threshold,
    )

    speech = speech_like(1.0, SR)
    silence = np.zeros(SR, np.float32)
    sig = np.concatenate([silence, speech, silence])
    frames = frame_signal(jnp.asarray(sig), 1024, 512)
    vad = np.asarray(detect_voice_activity(frames))
    t = len(vad)
    assert vad[: t // 4].mean() < 0.1        # leading silence
    assert vad[t // 3 : t // 2].mean() > 0.5  # speech region

    starts, ends = detect_speech_segments(
        jnp.asarray(sig), 1024, 512, min_segment_samples=SR // 10
    )
    assert len(starts) >= 1
    assert abs(int(starts[0]) - SR) < 3 * 512  # segment begins ~ at 1s

    cls = np.asarray(classify_frame_type(frames))
    assert (cls[: t // 4] == 0).mean() > 0.9  # silence class

    z = np.asarray(zcr_with_threshold(frames, SR, 0.01))
    assert (z >= 0).all()


def test_contrast_chunked_merge_exact_wide_spectra():
    """The chunked sort path (band width > _SORT_CLIFF) must be exact at
    EVERY window size: F=513 exercises the 2-chunk split-max prefix
    merge (production widest band, 278 wide), F >= 1025 the recursive
    candidate merge (ADVICE r3 #2). Oracle: means of a brute-force
    numpy full sort per band."""
    rng = np.random.default_rng(7)
    for f_bins in (513, 1025, 2049):
        mag = jnp.asarray(
            rng.standard_normal((5, f_bins)).astype(np.float32) ** 2
        )
        got = np.asarray(spectral_contrast(mag, SR, 6))
        p = np.asarray(mag, dtype=np.float64) ** 2
        edges = contrast_band_edges(6, f_bins, SR)
        for b in range(6):
            lo, hi = edges[b], min(edges[b + 1], f_bins)
            band = np.sort(p[:, lo:hi], axis=-1)
            k = max(int(0.2 * (hi - lo)), 1)
            valley = np.maximum(band[:, :k].mean(axis=-1), 1e-10)
            peak = band[:, -k:].mean(axis=-1)
            want = np.where(peak > 0, 10.0 * np.log10(peak / valley), 0.0)
            np.testing.assert_allclose(got[:, b], want, rtol=2e-4)
