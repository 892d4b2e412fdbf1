"""Local-window HNR noise-floor estimators (VERDICT round-1 item #7).

Parity vs the goref float64 re-derivation of
harmonic_ratio.go:632-705/793-814 and common/math.go:38-50,140-165,
plus the white-noise/harmonic-tone property tests.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest

from tests import goref

from sonido_sonar_tpu.ops.tonal import (
    HarmonicRatioAnalyzer,
    local_noise_floor,
    moving_average,
)

SR = 8000
WINDOW = 1024


def test_moving_average_parity():
    rng = np.random.default_rng(60)
    for n, ws in [(50, 10), (20, 3), (5, 5), (8, 1), (4, 9)]:
        x = rng.uniform(0, 2, size=n)
        want = goref.moving_average(list(x), ws)
        got = np.asarray(moving_average(jnp.asarray(x, jnp.float32), ws))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("method", ["percentile", "median", "minimum"])
def test_local_noise_floor_parity(method):
    rng = np.random.default_rng(61)
    for _ in range(10):
        mag = rng.uniform(0, 3, size=129)
        want = goref.noise_floor(list(mag), method)
        got = np.asarray(
            local_noise_floor(jnp.asarray(mag, jnp.float32), method=method)
        )
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5), method


def test_spectral_snr_parity():
    rng = np.random.default_rng(62)
    analyzer = HarmonicRatioAnalyzer(SR, min_f0=50.0, max_f0=1000.0)
    mag = rng.uniform(0, 2, size=WINDOW // 2 + 1)
    freq_res = SR / WINDOW
    freqs = np.arange(len(mag)) * freq_res
    floor = goref.noise_floor(list(mag), "percentile")
    want = goref.spectral_snr(list(mag), floor, list(freqs), 50.0, 1000.0)
    got = float(analyzer.spectral_snr(jnp.asarray(mag, jnp.float32), WINDOW))
    assert got == pytest.approx(want, abs=1e-3)


def _tone_plus_noise(noise_amp: float, seed: int = 0) -> np.ndarray:
    t = np.arange(SR * 2) / SR
    x = np.zeros_like(t, dtype=np.float64)
    for h in range(1, 6):
        x += np.sin(2 * np.pi * 200.0 * h * t) / h
    rng = np.random.default_rng(seed)
    return (x + noise_amp * rng.standard_normal(len(t))).astype(np.float32)


def _frame_mag(x: np.ndarray) -> jnp.ndarray:
    from sonido_sonar_tpu.ops.stft import stft

    return stft(jnp.asarray(x), WINDOW, 512, sample_rate=SR).magnitude


def test_hnr_tone_vs_noise_property():
    """Harmonic tone must score far higher HNR than white noise, and
    HNR must fall as the noise floor rises — for every estimator."""
    analyzer = HarmonicRatioAnalyzer(SR, min_f0=80.0, max_f0=500.0)
    mag_clean = _frame_mag(_tone_plus_noise(0.01))
    mag_noisy = _frame_mag(_tone_plus_noise(0.5))
    rng = np.random.default_rng(63)
    mag_white = _frame_mag(
        rng.standard_normal(SR * 2).astype(np.float32)
    )
    for method in ("percentile", "median", "minimum"):
        clean = float(jnp.median(analyzer.analyze_spectrum(
            mag_clean, WINDOW, noise_estimation=method)))
        noisy = float(jnp.median(analyzer.analyze_spectrum(
            mag_noisy, WINDOW, noise_estimation=method)))
        white = float(jnp.median(analyzer.analyze_spectrum(
            mag_white, WINDOW, noise_estimation=method)))
        assert clean > noisy > white, (method, clean, noisy, white)
        assert clean > 20.0, method


def test_method_switch_changes_hnr_on_colored_noise():
    """The estimator choice must actually change HNR values for
    colored-noise spectra (the round-1 gap: a global median couldn't)."""
    analyzer = HarmonicRatioAnalyzer(SR, min_f0=80.0, max_f0=500.0)
    rng = np.random.default_rng(64)
    # pink-ish noise + tone: sloped noise floor
    n = SR * 2
    white = rng.standard_normal(n)
    spec = np.fft.rfft(white)
    spec /= np.maximum(np.sqrt(np.arange(len(spec)) + 1.0), 1.0)
    pink = np.fft.irfft(spec, n=n)
    pink = (pink / np.abs(pink).max()).astype(np.float32)
    x = _tone_plus_noise(0.0) + 0.3 * pink
    mag = _frame_mag(x)
    vals = {
        m: float(jnp.median(analyzer.analyze_spectrum(
            mag, WINDOW, noise_estimation=m)))
        for m in ("percentile", "median", "minimum")
    }
    # minimum floor < percentile(0.1) floor < median floor => HNR ordering
    assert vals["minimum"] > vals["percentile"] > vals["median"], vals


def test_hnr_mask_split_methods():
    """comb/hnr method: harmonic-mask energy split (analyzeHNR fallback,
    harmonic_ratio.go:456-461) — high for a harmonic tone, low for
    white noise, frame path agrees with the spectrum path."""
    from sonido_sonar_tpu.ops.framing import frame_signal
    import jax.numpy as jnp

    analyzer = HarmonicRatioAnalyzer(SR, method="comb", min_f0=80.0, max_f0=500.0)
    tone = _tone_plus_noise(0.02, seed=1)
    rng = np.random.default_rng(2)
    noise = rng.standard_normal(SR * 2).astype(np.float32)
    frames_t = frame_signal(jnp.asarray(tone), WINDOW, 512)
    frames_n = frame_signal(jnp.asarray(noise), WINDOW, 512)
    res_t = analyzer.analyze_frames(frames_t)
    res_n = analyzer.analyze_frames(frames_n)
    assert float(jnp.median(res_t.harmonic_ratio)) > float(jnp.median(res_n.harmonic_ratio)) + 10.0
    assert float(jnp.median(res_t.harmonic_ratio)) > 10.0
