"""Speech ops: LPC parity, formants on synthetic vowels, voice quality."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sonido_sonar_tpu.io.synth import harmonic_tone, sine, speech_like, white_noise
from sonido_sonar_tpu.ops.pitch import PitchParams, acf_pitch, detect_pitch_track, yin_pitch
from sonido_sonar_tpu.ops.speech import (
    analyze_formants,
    analyze_voice_quality,
    autocorrelation_r,
    detect_speech,
    hnr_acf,
    levinson_durbin,
    lpc_analyze,
    lpc_order_for,
    lpc_spectral_envelope,
)

SR = 16000


def numpy_levinson(r, order):
    """Float64 mirror of lpc.go:84-134."""
    a = np.zeros(order + 1)
    a[0] = 1.0
    k = np.zeros(order)
    e = r[0]
    for i in range(1, order + 1):
        num = r[i] - sum(a[j] * r[i - j] for j in range(1, i))
        ki = num / e
        k[i - 1] = ki
        new_a = a.copy()
        new_a[i] = ki
        for j in range(1, i):
            new_a[j] = a[j] - ki * a[i - j]
        a = new_a
        e *= 1 - ki * ki
        if e <= 0:
            break
    return a, k, np.sqrt(max(e, 0)), e


def test_levinson_parity():
    rng = np.random.default_rng(1)
    # AR(4) process with known coefficients
    true_a = [1.0, -1.5, 0.9, -0.2, 0.05]
    n = 4096
    x = np.zeros(n)
    noise = rng.standard_normal(n) * 0.1
    for t in range(4, n):
        x[t] = noise[t] - sum(true_a[i] * x[t - i] for i in range(1, 5))
    x = x.astype(np.float32)
    order = 8
    r = np.asarray(autocorrelation_r(jnp.asarray(x), order)).astype(np.float64)
    a_ref, k_ref, g_ref, e_ref = numpy_levinson(r, order)
    a, k, g, e = levinson_durbin(jnp.asarray(r, dtype=jnp.float32), order)
    np.testing.assert_allclose(np.asarray(a), a_ref, atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(k), k_ref, atol=1e-3, rtol=1e-3)
    # the Go recursion stores predictor-sign coefficients: a[i] ~ -true_a[i]
    np.testing.assert_allclose(np.asarray(a)[1:5], [-v for v in true_a[1:]], atol=0.15)


def test_lpc_order_rule():
    assert lpc_order_for(44100) == 12 + 44
    assert lpc_order_for(16000) == 28


def test_lpc_envelope_peaks_at_resonance():
    """AR(2) resonator at 1000 Hz -> envelope peak near 1000 Hz."""
    f0 = 1000.0
    r_pole = 0.98
    w = 2 * np.pi * f0 / SR
    a1, a2 = -2 * r_pole * np.cos(w), r_pole**2
    rng = np.random.default_rng(2)
    n = 8192
    x = np.zeros(n)
    noise = rng.standard_normal(n)
    for t in range(2, n):
        x[t] = noise[t] - a1 * x[t - 1] - a2 * x[t - 2]
    x = (x / np.abs(x).max()).astype(np.float32)
    res = lpc_analyze(jnp.asarray(x), SR, order=8)
    env = np.asarray(lpc_spectral_envelope(res.coefficients, 1024))
    peak_bin = env.argmax()
    peak_freq = peak_bin * SR / 1024
    assert peak_freq == pytest.approx(f0, abs=100)


def test_yin_pitch_pure_tone():
    for f in [110.0, 220.0, 440.0]:
        x = sine(f, 0.2, SR, 0.5)
        frames = x[:1024][None, :]
        p = PitchParams(sample_rate=SR, window_size=1024, min_freq=80, max_freq=1000)
        pitch, conf, _ = yin_pitch(jnp.asarray(frames), p)
        assert float(pitch[0]) == pytest.approx(f, rel=0.03), f
        assert float(conf[0]) > 0.8


def test_yin_unvoiced_noise():
    x = white_noise(0.1, SR, 0.3, seed=3)
    p = PitchParams(sample_rate=SR, window_size=1024)
    pitch, conf, _ = yin_pitch(jnp.asarray(x[:1024][None, :]), p)
    assert float(conf[0]) < 0.5


def test_acf_pitch():
    x = sine(220.0, 0.2, SR, 0.5)
    p = PitchParams(sample_rate=SR, window_size=1024, min_freq=80, max_freq=1000)
    pitch, conf = acf_pitch(jnp.asarray(x[:1024][None, :]), p)
    assert float(pitch[0]) == pytest.approx(220.0, rel=0.05)


def test_pitch_track():
    x = np.concatenate([sine(150, 0.5, SR, 0.5), sine(300, 0.5, SR, 0.5)])
    pitch, conf, _ = detect_pitch_track(jnp.asarray(x), SR, 1024, 512)
    t = pitch.shape[-1]
    first = np.asarray(pitch)[: t // 3]
    last = np.asarray(pitch)[-t // 3 :]
    assert np.median(first[first > 0]) == pytest.approx(150, rel=0.05)
    assert np.median(last[last > 0]) == pytest.approx(300, rel=0.05)


def test_formants_on_synthetic_vowel():
    """Two strong resonances -> formant candidates near them."""
    rng = np.random.default_rng(4)
    n = 4096
    noise = rng.standard_normal(n)
    # cascade two AR(2) resonators at 700 and 1800 Hz
    def resonate(src, f, r=0.97):
        w = 2 * np.pi * f / SR
        a1, a2 = -2 * r * np.cos(w), r * r
        y = np.zeros_like(src)
        for t in range(2, len(src)):
            y[t] = src[t] - a1 * y[t - 1] - a2 * y[t - 2]
        return y

    x = resonate(resonate(noise, 700.0), 1800.0)
    x = (x / np.abs(x).max()).astype(np.float32)
    res = analyze_formants(jnp.asarray(x), SR)
    count = int(res.count)
    assert count >= 2
    f = np.asarray(res.frequencies)[:count]
    assert np.min(np.abs(f - 700.0)) < 150
    assert np.min(np.abs(f - 1800.0)) < 250
    assert 10.0 <= float(res.vocal_tract_length) <= 25.0


def test_voice_quality_stable_tone():
    """A perfectly periodic tone: near-zero jitter/shimmer, high HNR."""
    x = harmonic_tone(150.0, 2.0, SR)
    vq = analyze_voice_quality(jnp.asarray(x), SR)
    assert int(vq.num_periods) > 10
    assert float(vq.jitter) < 2.0
    assert float(vq.shimmer) < 3.0
    assert float(vq.hnr) > 10.0
    assert float(vq.f0_stability) > 0.9
    assert float(vq.mean_f0) == pytest.approx(150.0, rel=0.05)
    assert 0.5 < float(vq.overall_quality) <= 1.0


def test_voice_quality_jittery_vs_stable():
    stable = harmonic_tone(150.0, 2.0, SR)
    jittery = speech_like(2.0, SR, f0=150.0)
    vq_s = analyze_voice_quality(jnp.asarray(stable), SR)
    vq_j = analyze_voice_quality(jnp.asarray(jittery), SR)
    assert float(vq_j.jitter) > float(vq_s.jitter)


def test_detect_speech():
    speech = speech_like(1.0, SR)
    assert bool(detect_speech(jnp.asarray(speech), SR))
    silence = np.zeros(SR, np.float32)
    assert not bool(detect_speech(jnp.asarray(silence), SR))
    # white noise: high ZCR, no periodicity
    noise = white_noise(1.0, SR, 0.3, seed=5)
    assert not bool(detect_speech(jnp.asarray(noise), SR))


def test_hnr_tone_vs_noise():
    tone = harmonic_tone(200.0, 1.0, SR)
    noise = white_noise(1.0, SR, 0.3, seed=6)
    f0 = jnp.asarray(200.0)
    hnr_tone = float(hnr_acf(jnp.asarray(tone), SR, f0))
    hnr_noise = float(hnr_acf(jnp.asarray(noise), SR, f0))
    assert hnr_tone > 15.0
    assert hnr_noise < 5.0
