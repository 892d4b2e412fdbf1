"""Per-lag time-domain/sliding correlations vs the goref float64
re-derivation of correlation.go:293-447 (VERDICT round-1 item #10).

The unified implementation uses the FFT-path lag convention
(x1[n]*x2[n-lag]); the Go time-domain math pairs x1[i] with x2[i+lag],
so parity compares our corr at lag L with goref at lag -L.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest

from tests import goref

from sonido_sonar_tpu.ops.stats.correlation import (
    cross_correlate,
    cross_correlate_pearson,
)


@pytest.mark.parametrize("kind,go_fn", [
    ("pearson", goref.pearson_at_lag),
    ("ncc", goref.ncc_at_lag),
    ("zncc", goref.zncc_at_lag),
])
def test_per_lag_correlation_parity(kind, go_fn):
    rng = np.random.default_rng(70)
    for trial in range(8):
        n1 = int(rng.integers(20, 80))
        n2 = int(rng.integers(20, 80))
        s1 = rng.standard_normal(n1)
        s2 = rng.standard_normal(n2)
        max_lag = int(rng.integers(1, min(n1, n2)))
        res = cross_correlate_pearson(
            jnp.asarray(s1, jnp.float32), jnp.asarray(s2, jnp.float32),
            max_lag, correlation_type=kind,
        )
        corr = np.asarray(res.correlations)
        lags = np.asarray(res.lags)
        for i, lag in enumerate(lags):
            want = go_fn(list(s1), list(s2), -int(lag))  # sign note above
            assert corr[i] == pytest.approx(want, abs=2e-5), (
                trial, kind, int(lag))


def test_sliding_method_routes_to_time_domain():
    rng = np.random.default_rng(71)
    s1 = jnp.asarray(rng.standard_normal(64), jnp.float32)
    s2 = jnp.asarray(rng.standard_normal(64), jnp.float32)
    a = cross_correlate(s1, s2, 20, method="sliding")
    b = cross_correlate_pearson(s1, s2, 20)
    np.testing.assert_allclose(
        np.asarray(a.correlations), np.asarray(b.correlations), atol=1e-7)


def test_known_lag_recovered_all_types():
    rng = np.random.default_rng(72)
    base = rng.standard_normal(200).astype(np.float32)
    delayed = np.roll(base, 7)  # signal2 delayed by 7
    for kind in ("pearson", "ncc", "zncc"):
        res = cross_correlate_pearson(
            jnp.asarray(base), jnp.asarray(delayed), 30,
            correlation_type=kind,
        )
        # FFT convention: peak at lag -7 when signal2 is delayed by 7
        assert int(res.peak_lag) == -7, kind
