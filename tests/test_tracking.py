"""Harmonic partial tracking tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from sonido_sonar_tpu.io.synth import sine
from sonido_sonar_tpu.ops.stft import stft
from sonido_sonar_tpu.ops.tracking import HarmonicTracking, TrackingParams

SR = 22050


def test_tracks_steady_partials():
    """Two steady tones -> two long tracks at the right frequencies."""
    x = sine(440, 1.0, SR, 0.5) + sine(1320, 1.0, SR, 0.4)
    mag = stft(jnp.asarray(x.astype(np.float32)), 2048, 512, sample_rate=SR).magnitude
    res = HarmonicTracking(SR).process_magnitude_spectrogram(mag, 2048)
    assert res.num_tracks >= 2
    long_tracks = sorted(res.tracks, key=lambda t: -t.length)[:2]
    freqs = sorted(t.mean_frequency for t in long_tracks)
    assert freqs[0] == pytest.approx(440, abs=15)
    assert freqs[1] == pytest.approx(1320, abs=15)
    # long tracks span most frames
    assert long_tracks[0].length > mag.shape[0] * 0.8


def test_track_birth_and_death():
    """Tone that starts midway -> a track born midway."""
    n = SR
    x = np.zeros(n, np.float32)
    x[n // 2 :] = sine(880, 0.5, SR, 0.6)
    x[: n // 2] = sine(220, 0.5, SR, 0.6)
    mag = stft(jnp.asarray(x), 2048, 512, sample_rate=SR).magnitude
    res = HarmonicTracking(SR).process_magnitude_spectrogram(mag, 2048)
    t_frames = mag.shape[0]
    born_late = [t for t in res.tracks if t.start_frame > t_frames * 0.4
                 and abs(t.mean_frequency - 880) < 30]
    died_mid = [t for t in res.tracks if t.end_frame < t_frames * 0.6
                and abs(t.mean_frequency - 220) < 30]
    assert born_late, [(t.mean_frequency, t.start_frame, t.end_frame) for t in res.tracks]
    assert died_mid


def test_glide_tracked_continuously():
    """A slow glide stays one track (within the 50 Hz/frame deviation)."""
    dur = 1.0
    t = np.arange(int(dur * SR)) / SR
    f = 400 + 100 * t  # 100 Hz/s glide: ~2.3 Hz per 512-hop frame
    phase = 2 * np.pi * np.cumsum(f) / SR
    x = (0.5 * np.sin(phase)).astype(np.float32)
    mag = stft(jnp.asarray(x), 2048, 512, sample_rate=SR).magnitude
    res = HarmonicTracking(SR).process_magnitude_spectrogram(mag, 2048)
    longest = max(res.tracks, key=lambda tr: tr.length)
    assert longest.length > mag.shape[0] * 0.8
    assert longest.frequencies[-1] > longest.frequencies[0] + 50


def test_min_track_length_filter():
    x = sine(440, 0.5, SR, 0.5)
    mag = stft(jnp.asarray(x), 2048, 512, sample_rate=SR).magnitude
    res = HarmonicTracking(SR, TrackingParams(min_track_length=5)).process_magnitude_spectrogram(mag, 2048)
    assert all(t.length >= 5 for t in res.tracks)
