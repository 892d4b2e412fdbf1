"""Cross-correlation: known-lag recovery + parity with float64 reference."""

import jax.numpy as jnp
import numpy as np
import pytest

from sonido_sonar_tpu.io.synth import shift_signal, white_noise
from sonido_sonar_tpu.ops.stats.correlation import (
    autocorrelate,
    cross_correlate,
    cross_correlate_fft,
    cross_correlate_pearson,
    z_normalize,
)


def numpy_fft_xcorr(x1, x2, max_lag):
    """Float64 mirror of correlation.go:231-290."""
    def znorm(x):
        x = x.astype(np.float64)
        m, s = x.mean(), x.std()
        return (x - m) / s if s >= 1e-10 else x - m

    n1, n2 = len(x1), len(x2)
    x1, x2 = znorm(x1), znorm(x2)
    size = 1
    while size < n1 + n2 - 1:
        size <<= 1
    f1, f2 = np.fft.fft(x1, size), np.fft.fft(x2, size)
    corr = np.real(np.fft.ifft(f1 * np.conj(f2)))
    out = np.empty(2 * max_lag + 1)
    for i, lag in enumerate(range(-max_lag, max_lag + 1)):
        out[i] = corr[lag if lag >= 0 else size + lag]
    return out


def test_fft_parity():
    rng = np.random.default_rng(0)
    x1 = rng.standard_normal(2000).astype(np.float32)
    x2 = rng.standard_normal(2000).astype(np.float32)
    got = np.asarray(cross_correlate_fft(jnp.asarray(x1), jnp.asarray(x2), 100).correlations)
    ref = numpy_fft_xcorr(x1, x2, 100)
    np.testing.assert_allclose(got, ref, atol=2e-2, rtol=1e-4)


def test_known_lag_recovery():
    """signal2 delayed by D -> peak at lag -D (conjugate-of-x2 convention:
    corr[lag] = sum x1[n] x2[n-lag])."""
    x = white_noise(2.0, 8000, 0.3, seed=5)
    for lag_true in [0, 37, 500, -250]:
        y = shift_signal(x, lag_true, noise=0.01)
        res = cross_correlate_fft(jnp.asarray(x), jnp.asarray(y), 600)
        assert int(res.peak_lag) == -lag_true, f"true={lag_true} got={int(res.peak_lag)}"


def test_peak_metrics_reasonable():
    x = white_noise(1.0, 8000, 0.3, seed=6)
    y = shift_signal(x, 100, noise=0.05)
    res = cross_correlate_fft(jnp.asarray(x), jnp.asarray(y), 300)
    assert float(res.snr) > 10.0
    assert float(res.sharpness) > 0.0
    assert abs(float(res.second_peak)) < abs(float(res.peak_correlation))
    assert float(res.peak_to_sidelobe) > 3.0
    assert float(res.p_value) <= 0.05
    assert int(res.overlap_length) == 8000 - 100


def test_pearson_time_domain():
    """Pearson per-lag path: identical signals -> corr 1.0 at lag 0."""
    x = white_noise(0.1, 8000, 0.3, seed=7)
    res = cross_correlate_pearson(jnp.asarray(x), jnp.asarray(x), 50)
    assert float(res.peak_correlation) == pytest.approx(1.0, abs=1e-5)
    assert int(res.peak_lag) == 0
    # all values in [-1, 1]
    c = np.asarray(res.correlations)
    assert (np.abs(c) <= 1.0 + 1e-6).all()


def test_auto_method_switch():
    """>1000 samples -> FFT path (unbounded values), small -> Pearson."""
    x = white_noise(0.5, 8000, 0.3, seed=8)  # 4000 samples -> FFT
    res = cross_correlate(jnp.asarray(x), jnp.asarray(x), 50, method="auto")
    assert float(jnp.abs(res.peak_correlation)) > 100.0  # unnormalized sum
    short = x[:500]
    res2 = cross_correlate(jnp.asarray(short), jnp.asarray(short), 50, method="auto")
    assert float(res2.peak_correlation) == pytest.approx(1.0, abs=1e-5)


def test_autocorrelation_peak_at_zero():
    x = white_noise(0.5, 8000, 0.3, seed=9)
    res = autocorrelate(jnp.asarray(x), 100)
    assert int(res.peak_lag) == 0


def test_znorm():
    x = jnp.asarray(np.array([1.0, 2.0, 3.0, 4.0], np.float32))
    z = np.asarray(z_normalize(x))
    assert z.mean() == pytest.approx(0.0, abs=1e-6)
    assert z.std() == pytest.approx(1.0, abs=1e-5)
    const = np.asarray(z_normalize(jnp.ones(10)))
    np.testing.assert_allclose(const, 0.0, atol=1e-7)


def test_batched():
    x = white_noise(0.25, 8000, 0.3, seed=10).reshape(1, -1).repeat(3, axis=0)
    y = np.stack([shift_signal(x[0], d) for d in [10, 20, 30]])
    res = cross_correlate_fft(jnp.asarray(x), jnp.asarray(y), 64)
    np.testing.assert_array_equal(np.asarray(res.peak_lag), [-10, -20, -30])
