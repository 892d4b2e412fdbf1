"""Window generation parity + property tests.

Golden values computed from the Go reference formulas re-derived in
float64 numpy (algorithms/windowing/*.go, analyzers/windowing.go).
"""

import numpy as np
import pytest

from sonido_sonar_tpu.config.config import WindowType
from sonido_sonar_tpu.ops.windows import (
    make_window,
    window_properties,
)

ALL_TYPES = list(WindowType)


@pytest.mark.parametrize("wt", ALL_TYPES)
def test_power_gain_normalization(wt):
    """Production windows are normalized to unity power gain
    (analyzers/windowing.go:426-437): mean(w^2) == 1."""
    w = make_window(wt, 1024, normalize=True, symmetric=True, dtype=np.float64)
    assert np.mean(w**2) == pytest.approx(1.0, rel=1e-9)


@pytest.mark.parametrize("wt", ALL_TYPES)
def test_symmetry(wt):
    w = make_window(wt, 513, normalize=False, symmetric=True, dtype=np.float64)
    np.testing.assert_allclose(w, w[::-1], atol=1e-12)


def test_hann_formula():
    """hann[i] = 0.5(1 - cos(2 pi i/(N-1))) (hann.go:35)."""
    n = 8
    w = make_window(WindowType.HANN, n, normalize=False, symmetric=True, dtype=np.float64)
    i = np.arange(n)
    expected = 0.5 * (1 - np.cos(2 * np.pi * i / (n - 1)))
    np.testing.assert_allclose(w, expected, atol=1e-15)


def test_hamming_endpoints():
    """hamming endpoints = 0.54 - 0.46 = 0.08 (hamming.go:35)."""
    w = make_window(WindowType.HAMMING, 64, normalize=False, symmetric=True, dtype=np.float64)
    assert w[0] == pytest.approx(0.08)
    assert w[-1] == pytest.approx(0.08)


def test_blackman_harris_coefficients():
    """peak = a0 + a1 + a2 + a3 at center (blackman_harris.go:34)."""
    w = make_window(
        WindowType.BLACKMAN_HARRIS, 65, normalize=False, symmetric=True, dtype=np.float64
    )
    assert w[32] == pytest.approx(0.35875 + 0.48829 + 0.14128 + 0.01168, rel=1e-9)


def test_kaiser_matches_numpy():
    w = make_window(WindowType.KAISER, 128, beta=8.6, normalize=False, symmetric=True, dtype=np.float64)
    np.testing.assert_allclose(w, np.kaiser(128, 8.6), rtol=1e-9)


def test_tukey_limits():
    """alpha=0 -> rectangular; alpha=1 -> hann (tukey.go:17-50)."""
    rect = make_window(WindowType.TUKEY, 64, alpha=0.0, normalize=False, dtype=np.float64)
    np.testing.assert_allclose(rect, np.ones(64))
    hann_like = make_window(WindowType.TUKEY, 64, alpha=1.0, normalize=False, dtype=np.float64)
    hann = make_window(WindowType.HANN, 64, normalize=False, dtype=np.float64)
    np.testing.assert_allclose(hann_like, hann, atol=1e-12)


def test_window_properties():
    w = make_window(WindowType.RECTANGULAR, 100, normalize=False, dtype=np.float64)
    p = window_properties(np.asarray(w))
    assert p.power_gain == pytest.approx(1.0)
    assert p.noise_gain == pytest.approx(1.0)
    assert p.enbw == pytest.approx(1.0)
    assert p.coherent


def test_periodic_vs_symmetric():
    sym = make_window(WindowType.HANN, 64, normalize=False, symmetric=True, dtype=np.float64)
    per = make_window(WindowType.HANN, 64, normalize=False, symmetric=False, dtype=np.float64)
    assert not np.allclose(sym, per)
    # periodic window of size N = first N points of symmetric size N+1
    sym65 = make_window(WindowType.HANN, 65, normalize=False, symmetric=True, dtype=np.float64)
    np.testing.assert_allclose(per, sym65[:64], atol=1e-12)


def test_cache_returns_same_object():
    a = make_window(WindowType.HANN, 2048)
    b = make_window(WindowType.HANN, 2048)
    assert a is b
