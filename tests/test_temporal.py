"""Temporal features: parity with energy.go formulas + properties."""

import jax.numpy as jnp
import numpy as np
import pytest

from sonido_sonar_tpu.io.synth import sine, white_noise
from sonido_sonar_tpu.ops import temporal as T
from sonido_sonar_tpu.ops.filters import (
    bandpass,
    biquad_response,
    bandpass_coefficients,
    dc_removal,
    pre_emphasis,
    pre_emphasis_coefficient,
)

SR = 8000


def test_short_time_energy_formula():
    """RMS per frame (energy.go:25-50)."""
    x = white_noise(0.5, SR, 0.3, seed=1)
    e = np.asarray(T.short_time_energy(jnp.asarray(x), 256, 128))
    for i in [0, 5, len(e) - 1]:
        frame = x[i * 128 : i * 128 + 256].astype(np.float64)
        assert e[i] == pytest.approx(np.sqrt(np.mean(frame**2)), rel=1e-5)


def test_energy_variance_sample():
    """N-1 denominator (energy.go:97-119)."""
    e = jnp.asarray(np.array([1.0, 2.0, 3.0, 4.0], np.float32))
    assert float(T.energy_variance(e)) == pytest.approx(np.var([1, 2, 3, 4], ddof=1))


def test_energy_entropy():
    """Uniform energies -> log2(T) bits."""
    e = jnp.ones(16)
    assert float(T.energy_entropy(e)) == pytest.approx(4.0, abs=1e-5)
    single = jnp.asarray(np.array([1.0] + [0.0] * 15, np.float32))
    assert float(T.energy_entropy(single)) == pytest.approx(0.0, abs=1e-6)


def test_loudness_range_louder_vs_steady():
    steady = sine(440, 3.0, SR, amplitude=0.5)
    dyn = np.concatenate([sine(440, 1.5, SR, amplitude=0.05), sine(440, 1.5, SR, amplitude=0.8)])
    lr_steady = float(T.loudness_range(jnp.asarray(steady), SR))
    lr_dyn = float(T.loudness_range(jnp.asarray(dyn), SR))
    assert lr_dyn > lr_steady + 10.0


def test_onsets_from_energy():
    """Bursts of tone separated by silence -> one onset per burst."""
    burst = sine(440, 0.2, SR, amplitude=0.8)
    gap = np.zeros(int(0.3 * SR), np.float32)
    x = np.concatenate([gap, burst, gap, burst, gap, burst, gap])
    e = T.short_time_energy(jnp.asarray(x), 512, 256)
    mask, count = T.detect_onsets_from_energy(e)
    assert 2 <= int(count) <= 5  # ~3 bursts, threshold-dependent


def test_onsets_min_interval():
    """Flux onsets respect the minimum interval."""
    flux = np.zeros(200, np.float32)
    flux[10] = flux[12] = flux[50] = flux[150] = 1.0
    mask, count = T.detect_onsets_from_flux(jnp.asarray(flux), 256, SR, 0.3, 0.05)
    # min interval 0.05s * 8000 / 256 hop = 1.5625 -> 2 frames: the peak
    # at 12 is 2 frames after 10 so allowed; all 4 isolated maxima found
    assert int(count) >= 3


def test_silence_ratio():
    x = np.concatenate([np.zeros(SR, np.float32), sine(440, 1.0, SR, 0.5)])
    e = T.short_time_energy(jnp.asarray(x), 512, 256)
    ratio = float(T.silence_ratio_percentile(e))
    assert 0.05 < ratio < 0.7


def test_silence_mask_db():
    x = np.concatenate([np.zeros(SR, np.float32), sine(440, 1.0, SR, 0.5)])
    m = np.asarray(T.silence_mask_db(jnp.asarray(x), 512, 256, -40.0))
    t_half = len(m) // 2
    assert m[: t_half - 2].mean() > 0.9
    assert m[t_half + 2 :].mean() < 0.1


def test_pause_durations():
    x = np.concatenate([
        sine(440, 0.5, SR, 0.5),
        np.zeros(int(0.4 * SR), np.float32),
        sine(440, 0.5, SR, 0.5),
    ])
    e = T.short_time_energy(jnp.asarray(x), 512, 256)
    durs, count = T.pause_durations(e, 256, SR)
    assert int(count) >= 1
    d = np.asarray(durs)[: int(count)]
    assert (d > 0.1).all()
    assert d.max() == pytest.approx(0.4, abs=0.15)


def test_tempo_estimation():
    """Click track at 125 BPM (period = 3840 samples = exactly 15 frames
    at hop 256 — avoids splitting ACF energy between adjacent lags)."""
    bpm_true = 125.0
    dur = 10.0
    x = np.zeros(int(dur * SR), np.float32)
    period = int(SR * 60.0 / bpm_true)
    for start in range(0, len(x) - 200, period):
        x[start : start + 200] += sine(880, 200 / SR, SR, 0.9)[:200]
    e = T.short_time_energy(jnp.asarray(x), 512, 256)
    strength = jnp.maximum(T.energy_derivative(e), 0.0)
    bpm = float(T.estimate_tempo_autocorrelation(strength, 256, SR))
    assert bpm == pytest.approx(bpm_true, rel=0.08)
    assert int(T.tempo_category(jnp.asarray(bpm))) == 1  # moderate


def test_attack_decay():
    """Fast attack, slow decay envelope."""
    t = np.arange(int(1.0 * SR)) / SR
    env_sig = np.minimum(t / 0.01, 1.0) * np.exp(-np.maximum(t - 0.01, 0) / 0.3)
    x = (env_sig * sine(440, 1.0, SR, 1.0)).astype(np.float32)
    env = T.rms_envelope(jnp.asarray(x), 256, 128)
    frame_rate = SR / 128
    at = float(T.attack_time(env, frame_rate))
    dt = float(T.decay_time(env, frame_rate))
    assert at < 0.1
    assert dt > at


def test_dynamic_range_and_crest():
    quiet = sine(440, 1.0, SR, 0.01)
    loud = sine(440, 1.0, SR, 0.9)
    x = np.concatenate([quiet, loud])
    dr = float(T.dynamic_range_db(jnp.asarray(x), 1024, 256))
    assert dr > 30.0
    cf = float(T.crest_factor(jnp.asarray(sine(440, 1.0, SR, 0.5))))
    assert cf == pytest.approx(np.sqrt(2), rel=0.01)


def test_hilbert_envelope():
    x = sine(100, 0.5, SR, 0.7)
    env = np.asarray(T.hilbert_envelope(jnp.asarray(x)))
    # envelope of a pure tone ~ its amplitude
    assert env[200:-200].mean() == pytest.approx(0.7, rel=0.02)


# --------------------------- filters ---------------------------------

def test_pre_emphasis_formula():
    x = white_noise(0.1, SR, 0.3, seed=2)
    y = np.asarray(pre_emphasis(jnp.asarray(x), 0.97))
    ref = x.astype(np.float64).copy()
    ref[1:] = x[1:] - 0.97 * x[:-1].astype(np.float64)
    np.testing.assert_allclose(y, ref, atol=1e-6)
    assert pre_emphasis_coefficient("speech") == 0.97
    assert pre_emphasis_coefficient("music") == 0.95
    assert pre_emphasis_coefficient("unknown-content") == 0.95


def test_dc_removal():
    x = (sine(100, 1.0, SR, 0.5) + 0.5).astype(np.float32)  # big DC offset
    y = np.asarray(dc_removal(jnp.asarray(x)))
    assert abs(y[SR // 2 :].mean()) < 0.01
    # AC component preserved
    assert y[SR // 2 :].std() == pytest.approx(x[SR // 2 :].std(), rel=0.05)


def test_dc_removal_matches_sequential_recurrence():
    """The block-scan evaluation (chunk matmul + carry scan) must equal
    the per-sample recurrence y[n] = x[n] - x[n-1] + R*y[n-1] — exact up
    to float reassociation. Covers odd lengths (partial last chunk),
    batches, and the 1-D path."""
    rng = np.random.default_rng(11)
    for shape in ((2, 5000), (3000,), (2, 3, 1537)):
        x = (rng.standard_normal(shape) * 0.5 + 0.3).astype(np.float32)
        got = np.asarray(dc_removal(jnp.asarray(x)))
        flat = x.reshape(-1, x.shape[-1]).astype(np.float64)
        ref = np.zeros_like(flat)
        for b in range(flat.shape[0]):
            yp = xp = 0.0
            for i in range(flat.shape[1]):
                ref[b, i] = flat[b, i] - xp + 0.995 * yp
                xp, yp = flat[b, i], ref[b, i]
        np.testing.assert_allclose(
            got.reshape(ref.shape), ref, atol=5e-5, rtol=1e-4)


def test_bandpass_selects_band():
    lo = sine(100, 1.0, SR, 0.5)
    hi = sine(3000, 1.0, SR, 0.5)
    mid = sine(1000, 1.0, SR, 0.5)
    x = lo + hi + mid

    y = np.asarray(bandpass(jnp.asarray(x), 1000.0, 2.0, SR))
    spec = np.abs(np.fft.rfft(y[SR // 2 :]))
    freqs = np.fft.rfftfreq(len(y[SR // 2 :]), 1 / SR)

    def band_power(f):
        i = np.argmin(np.abs(freqs - f))
        return spec[max(i - 3, 0) : i + 4].max()

    assert band_power(1000) > 4 * band_power(100)
    assert band_power(1000) > 4 * band_power(3000)


def test_biquad_response_peak():
    b, a = bandpass_coefficients(1000.0, 2.0, SR)
    freqs = jnp.asarray(np.array([100.0, 1000.0, 3000.0], np.float32))
    mag = np.asarray(biquad_response(b, a, freqs, SR))
    assert mag[1] > mag[0] and mag[1] > mag[2]


def test_framed_sum_hopblocks_exact_long_clip():
    """Hop-block framed sums stay within float32 budget on LONG clips,
    where the old difference-of-prefix-sums lost ~1e-3 of frame energy
    (catastrophic cancellation grows with N; the block scheme's error
    is O(frame) regardless of length)."""
    rng = np.random.default_rng(7)
    n = 1_323_000  # 30 s at 44.1k
    x = rng.standard_normal(n).astype(np.float32) * 0.3
    w, h = 1024, 512
    t = (n - w) // h + 1
    got = np.asarray(T.framed_sum_hopblocks(jnp.asarray(x * x), w, h, t))
    x64 = x.astype(np.float64)
    idx = np.arange(w)[None, :] + (np.arange(t) * h)[:, None]
    want = np.sum(x64[idx] ** 2, axis=-1)
    rel = np.max(np.abs(got - want) / np.maximum(want, 1e-12))
    assert rel < 1e-5, rel


def test_short_time_energy_cumsum_long_clip_matches_framed():
    """STE via hop blocks == framed STE to ~1e-6 on a 30 s clip (the
    regression the cumsum path could not hold)."""
    rng = np.random.default_rng(8)
    x = (rng.standard_normal(1_323_000) * 0.2).astype(np.float32)
    a = np.asarray(T.short_time_energy_cumsum(jnp.asarray(x), 1024, 256))
    # float64 oracle on a sample of frames (full framed tensor is 5 GB)
    x64 = x.astype(np.float64)
    t = (x.shape[0] - 1024) // 256 + 1
    sample = np.linspace(0, t - 1, 64).astype(int)
    for j in sample:
        s = j * 256
        want = np.sqrt(np.mean(x64[s : s + 1024] ** 2))
        np.testing.assert_allclose(a[j], want, rtol=3e-6, atol=1e-9)
