"""Extractor-COMPOSITION parity vs the float64 goref oracle.

VERDICT round-2 item #9: the per-module ops were already goref-oracled;
this file pins the step math the speech extractor performs BETWEEN them
(fingerprint/extractors/speech.go:320-461, 587-777 +
algorithms/temporal/energy.go) — frame assembly, the onset mean+2sigma
threshold with its derivative-index quirk, the sorted[n/10] silence
threshold, pause run-length rules, energy entropy, band splits,
spectral tilt, the fixed 512/256 envelope — so the extractor goldens
in tests/golden/ are cross-validated against an independent
re-derivation rather than self-pinned.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest

from sonido_sonar_tpu.ops import temporal as T

from tests import goref


def _clip(seed=0, seconds=1.5, sr=8000):
    """Speech-like test signal: tone bursts + pauses + noise."""
    rng = np.random.default_rng(seed)
    n = int(seconds * sr)
    t = np.arange(n) / sr
    x = np.zeros(n)
    for f0, s0, s1 in ((180, 0.05, 0.35), (240, 0.5, 0.9), (200, 1.05, 1.4)):
        seg = (t >= s0) & (t < s1)
        x += seg * np.sin(2 * np.pi * f0 * t) * (0.4 + 0.2 * np.sin(2 * np.pi * 3 * t))
    x += 0.01 * rng.standard_normal(n)
    return x.astype(np.float64), sr


FRAME, HOP = 400, 160  # extractor-config-scale framing at sr=8000


def test_short_time_energy_and_variance():
    x, _ = _clip()
    want = goref.short_time_energy_go(x, FRAME, HOP)
    got = np.asarray(T.short_time_energy(jnp.asarray(x, jnp.float32), FRAME, HOP))
    assert got.shape[-1] == len(want)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(
        float(T.energy_variance(jnp.asarray(want, jnp.float32))),
        goref.energy_variance_go(want), rtol=1e-4, atol=1e-8)


def test_onset_detection_composition():
    """Derivative -> mean+2sigma threshold -> interior local maxima,
    including the derivative-index-into-energy quirk on attack times."""
    x, sr = _clip(seed=3)
    ste = goref.short_time_energy_go(x, FRAME, HOP)
    want_onsets = goref.detect_onsets_go(ste)
    assert len(want_onsets) > 0, "test clip must produce onsets"

    e32 = jnp.asarray(ste, jnp.float32)
    mask, count = T.detect_onsets_from_energy(e32)
    got_onsets = np.flatnonzero(np.asarray(mask))
    assert int(count) == len(want_onsets)
    np.testing.assert_array_equal(got_onsets, want_onsets)

    want_attacks = goref.attack_times_go(want_onsets, ste, HOP, sr)
    at = np.asarray(T.attack_times_from_onsets(mask, e32, HOP, sr))
    got_attacks = at[got_onsets]
    np.testing.assert_allclose(got_attacks, want_attacks, atol=1e-6)


def test_silence_ratio_and_pauses():
    x, sr = _clip(seed=4)
    ste = goref.short_time_energy_go(x, FRAME, HOP)
    e32 = jnp.asarray(ste, jnp.float32)

    want_ratio = goref.silence_ratio_go(x, FRAME, HOP)
    got_ratio = float(T.silence_ratio_percentile(e32))
    assert got_ratio == pytest.approx(want_ratio, abs=1e-6)

    want_pauses = goref.pause_durations_go(x, FRAME, HOP, sr)
    durs, count = T.pause_durations(e32, HOP, sr)
    durs = np.asarray(durs)[: int(count)]
    assert int(count) == len(want_pauses)
    np.testing.assert_allclose(durs, want_pauses, atol=1e-6)


def test_envelope_entropy_tilt_bands():
    x, _ = _clip(seed=5)
    want_env = goref.simple_envelope_go(x)
    got_env = np.asarray(T.rms_envelope(jnp.asarray(x, jnp.float32), 512, 256))
    assert got_env.shape[-1] == len(want_env)
    np.testing.assert_allclose(got_env, want_env, rtol=2e-5, atol=1e-6)

    ste = goref.short_time_energy_go(x, FRAME, HOP)
    want_ent = goref.energy_entropy_go(ste)
    e32 = jnp.asarray(ste, jnp.float32)
    got_ent = np.asarray(jnp.where(e32 > 0, -e32 * jnp.log(e32 + 1e-10), 0.0))
    np.testing.assert_allclose(got_ent, want_ent, rtol=2e-4, atol=1e-6)

    # one spectral frame's band split
    rng = np.random.default_rng(6)
    mag = rng.uniform(0, 2.0, size=257)
    lo, hi = goref.band_energy_ratios_go(mag)
    p = mag * mag
    split = len(mag) // 4
    assert lo == pytest.approx(p[:split].sum() / p.sum(), rel=1e-12)
    assert lo + hi == pytest.approx(1.0, rel=1e-12)

    # spectral tilt at the fixed 1024/512 framing
    x44, _ = _clip(seed=7, seconds=0.5, sr=44100)
    want_tilt = goref.spectral_tilt_go(x44)
    fr = np.lib.stride_tricks.sliding_window_view(x44, 1024)[::512]
    d = fr[:, 1:] - fr[:, :-1]
    he = (d * d).sum(-1)
    le = (fr[:, 1:] ** 2).sum(-1)
    got_tilt = np.where(le > 0, -10 * np.log10(np.maximum(he / le, 1e-300)), 0.0)
    np.testing.assert_allclose(got_tilt[: len(want_tilt)], want_tilt, rtol=1e-9)


def test_loudness_range_fixed_semantics():
    x, sr = _clip(seed=8, seconds=3.0)
    want = goref.loudness_range_go(x, sr)
    got = float(T.loudness_range(jnp.asarray(x, jnp.float32), sr))
    assert got == pytest.approx(want, abs=2e-3)


def test_extractor_end_to_end_composition():
    """The ASSEMBLED extractor output (TemporalFeatures/EnergyFeatures/
    SpeechFeatures scalars) matches the oracle composition — this is
    the piece module-level tests cannot see (frame counts, which series
    feeds which threshold, config plumbing)."""
    from sonido_sonar_tpu.config.config import FeatureConfig
    from sonido_sonar_tpu.extractors.speech import SpeechFeatureExtractor

    x, sr = _clip(seed=9, seconds=2.0, sr=22050)
    cfg = FeatureConfig(sample_rate=sr, window_size=1024, hop_size=256)
    ext = SpeechFeatureExtractor(cfg)
    tf = ext._extract_temporal(jnp.asarray(x, jnp.float32), sr)

    ste = goref.short_time_energy_go(x, cfg.window_size, cfg.hop_size)
    np.testing.assert_allclose(
        np.asarray(tf.rms_energy), ste, rtol=3e-5, atol=1e-6)
    onsets = goref.detect_onsets_go(ste)
    duration = len(x) / sr
    assert float(tf.onset_density) == pytest.approx(
        len(onsets) / duration, rel=1e-5)
    assert float(tf.silence_ratio) == pytest.approx(
        goref.silence_ratio_go(x, cfg.window_size, cfg.hop_size), abs=1e-6)
    assert float(tf.peak_amplitude) == pytest.approx(
        max(abs(v) for v in x), rel=1e-5)
    assert float(tf.average_amplitude) == pytest.approx(
        sum(abs(v) for v in x) / len(x), rel=1e-4)
    env = goref.simple_envelope_go(x)
    np.testing.assert_allclose(
        np.asarray(tf.envelope_shape)[: len(env)], env, rtol=3e-5, atol=1e-6)


def test_music_onset_flux_peaks():
    """Greedy min-interval flux peak picking (onset_detection.go:97-120)
    at the music extractor's 0.3/50 ms settings (absolute threshold)."""
    rng = np.random.default_rng(12)
    sr, hop = 44100, 256
    flux = np.abs(rng.standard_normal(400)) * 0.25
    flux[[20, 23, 100, 105, 300]] = [0.9, 0.8, 1.2, 1.1, 0.7]
    want = goref.find_flux_peaks_go(flux, 0.3, 0.05, hop, sr)
    assert len(want) >= 2  # the 23/105 peaks must be suppressed
    mask, count = T.detect_onsets_from_flux(
        jnp.asarray(flux, jnp.float32), hop, sr,
        threshold=0.3, min_interval_sec=0.05, relative=False)
    got = np.flatnonzero(np.asarray(mask))
    assert int(count) == len(want)
    np.testing.assert_array_equal(got, want)


def test_music_dynamic_range_and_silence():
    x, sr = _clip(seed=13, seconds=2.0, sr=22050)
    ste = goref.short_time_energy_go(x, 2048, 512)
    want_dr = goref.percentile_range_db_go(ste, 0.10, 0.95)
    got_dr = float(T.dynamic_range_db(jnp.asarray(x, jnp.float32), 2048, 512))
    assert got_dr == pytest.approx(want_dr, abs=5e-3)

    want_sr = goref.music_silence_ratio_fixed(x, 1024, 256, -40.0)
    silent = T.silence_mask_db(jnp.asarray(x, jnp.float32), 1024, 256, -40.0)
    got_sr = float(np.mean(np.asarray(silent)))
    assert got_sr == pytest.approx(want_sr, abs=1e-6)
