"""Interpret-mode parity of the sort-free contrast band selection
(ops/pallas_contrast.py) vs the numpy sort formulation.

The kernel is a MEASURED NEGATIVE RESULT for the hot path (127.6 ms vs
76.5 ms for the XLA sort pipeline at B=128 x 30 s on v5e — docs/PERF.md
round 5) and is NOT wired into spectral_contrast; this test keeps the
artifact honest: the bit-reconstruction threshold search + tie-fill
means must match full sorts to well under the 1e-4 parity budget.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402

import sonido_sonar_tpu.ops.pallas_contrast as pc  # noqa: E402
from sonido_sonar_tpu.ops.spectral import contrast_band_edges  # noqa: E402


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    orig = pl.pallas_call

    def interp(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pc.pl, "pallas_call", interp)


@pytest.mark.parametrize("shape", [(2, 300, 513), (300, 257)])
def test_band_select_matches_sort(shape):
    sr = 44100
    f = shape[-1]
    rng = np.random.default_rng(0)
    mag = jnp.asarray(np.abs(rng.standard_normal(shape)).astype(np.float32))
    edges = contrast_band_edges(6, f, sr)

    peak, valley = pc.band_select_means_pallas(mag, edges)
    assert peak.shape == shape[:-1] + (6,)

    p = np.asarray(mag, np.float64) ** 2
    for b in range(6):
        lo, hi = edges[b], min(edges[b + 1], f)
        w = hi - lo
        k = max(int(0.2 * w), 1)
        band = np.sort(p[..., lo:hi], axis=-1)
        want_peak = band[..., -k:].mean(-1)
        want_valley = band[..., :k].mean(-1)
        gp = np.asarray(peak[..., b], np.float64)
        gv = np.asarray(valley[..., b], np.float64)
        np.testing.assert_allclose(gp, want_peak, rtol=2e-5, atol=1e-12)
        np.testing.assert_allclose(gv, want_valley, rtol=2e-5, atol=1e-12)


def test_band_select_handles_ties_and_zeros():
    """All-equal and all-zero bands: tie-fill must be exact, zero
    valleys must come out exactly 0 (bit pattern 0 handled uniformly)."""
    sr = 44100
    f = 513
    edges = contrast_band_edges(6, f, sr)
    mag = np.zeros((1, 16, f), np.float32)
    mag[0, :, edges[3]:edges[4]] = 0.25  # one band constant, rest zero
    peak, valley = pc.band_select_means_pallas(jnp.asarray(mag), edges)
    peak = np.asarray(peak)
    valley = np.asarray(valley)
    np.testing.assert_allclose(peak[0, :, 3], 0.0625, rtol=1e-6)
    np.testing.assert_allclose(valley[0, :, 3], 0.0625, rtol=1e-6)
    for b in (0, 1, 2, 5):
        np.testing.assert_array_equal(peak[0, :, b], 0.0)
        np.testing.assert_array_equal(valley[0, :, b], 0.0)
