"""IIR filters as vectorized ops / linear recurrences.

Reference parity: algorithms/filters/*.go —
  pre_emphasis.go: y[n] = x[n] - a*x[n-1], per-content a (speech .97,
    music .95, broadcast .96, narrowband .94, wideband .98, general .95,
    :84-133), adaptive variant, frequency response;
  dc_removal.go: 1-pole DC blocker y[n] = x[n] - x[n-1] + R*y[n-1],
    default R = 0.995, R = 1 - 2*pi*fc/fs for a given cutoff;
  bandpass.go: RBJ biquad bandpass (constant-skirt), Q/bandwidth params.

TPU design: pre-emphasis is a shifted difference (pure vector op). The
recursive filters (DC blocker, biquad) are linear recurrences evaluated
with `lax.scan`; they are outside the hot fingerprint path (SURVEY.md
hard-part #4) so scan throughput is acceptable.
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

PRE_EMPHASIS_COEFFICIENTS = {
    # GetOptimalPreEmphasisCoefficient (pre_emphasis.go:112-133)
    "speech": 0.97,
    "music": 0.95,
    "broadcast": 0.96,
    "narrowband": 0.94,
    "wideband": 0.98,
    "general": 0.95,
}


def pre_emphasis_coefficient(content_type: str) -> float:
    return PRE_EMPHASIS_COEFFICIENTS.get(content_type, 0.95)


def pre_emphasis(signal: jnp.ndarray, coefficient: float = 0.97) -> jnp.ndarray:
    """y[n] = x[n] - a*x[n-1], y[0] = x[0] (pre_emphasis.go Process/
    ProcessBuffer). Shifted difference — no recurrence needed."""
    shifted = jnp.pad(signal[..., :-1], [(0, 0)] * (signal.ndim - 1) + [(1, 0)])
    return signal - coefficient * shifted


def pre_emphasis_for_content(signal: jnp.ndarray, content_type: str) -> jnp.ndarray:
    """NewPreEmphasisForContent + ProcessBuffer (pre_emphasis.go:84-110)."""
    return pre_emphasis(signal, pre_emphasis_coefficient(content_type))


def pre_emphasis_response(
    coefficient: float, freqs_hz: jnp.ndarray, sample_rate: int
) -> jnp.ndarray:
    """|H(e^jw)| = |1 - a e^{-jw}| (pre_emphasis.go frequency response)."""
    w = 2.0 * jnp.pi * freqs_hz / sample_rate
    return jnp.sqrt(1.0 + coefficient**2 - 2.0 * coefficient * jnp.cos(w))


# ---------------------------------------------------------------------
# DC removal (dc_removal.go:20-128)
# ---------------------------------------------------------------------

def dc_pole_for_cutoff(cutoff_hz: float, sample_rate: int) -> float:
    """R = 1 - 2*pi*fc/fs (dc_removal.go:48-50)."""
    return 1.0 - 2.0 * math.pi * cutoff_hz / sample_rate


@lru_cache(maxsize=8)
def _dc_chunk_kernel(pole: float, k: int):
    """[K, K] upper-triangular pole^(j-i) prefix kernel + [K] pole^(j+1)
    carry powers, designed in float64."""
    i = np.arange(k)[:, None]
    j = np.arange(k)[None, :]
    t = np.where(j >= i, float(pole) ** np.maximum(j - i, 0), 0.0)
    powj = float(pole) ** (np.arange(k) + 1.0)
    return t.astype(np.float32), powj.astype(np.float32)


def dc_removal(signal: jnp.ndarray, pole: float = 0.995) -> jnp.ndarray:
    """DC blocker y[n] = x[n] - x[n-1] + R*y[n-1].

    The first-order affine recurrence is evaluated as a BLOCK scan, not
    a per-sample lax.scan: the sequential scan over a 1.3M-sample clip
    measured 1.28 s on v5e (it dominated the whole music-extractor
    program), and a full-length associative_scan does not even finish
    compiling. Instead: chunk into K=1024 blocks, in-chunk prefixes as
    ONE matmul against the precomputed pole^(j-i) triangular kernel
    (rides the MXU), chunk-boundary carries via a ~log(C)-depth
    associative scan over the C~1300 chunk axis, then broadcast the
    carries back with pole^(j+1). Exact same recurrence up to float
    reassociation (~1e-6 rel; kernel designed in float64)."""
    diff = signal.astype(jnp.float32) - jnp.pad(
        signal.astype(jnp.float32)[..., :-1],
        [(0, 0)] * (signal.ndim - 1) + [(1, 0)],
    )
    n = diff.shape[-1]
    k = min(1024, n)
    # chunk count rounded to a sublane multiple: an 8-aligned [C, K]
    # reshape is a bitcast, a misaligned one relayouts through a serial
    # copy (~2 ms on 32 x 30 s, traced); pad chunks are all-zero diffs
    # and their outputs are sliced away
    c = ((-(-n // k) + 7) // 8) * 8
    pad = c * k - n
    if pad:
        diff = jnp.pad(diff, [(0, 0)] * (diff.ndim - 1) + [(0, pad)])
    chunks = diff.reshape(diff.shape[:-1] + (c, k))
    t_kernel, powj = _dc_chunk_kernel(pole, k)
    y_in = jnp.matmul(
        chunks, jnp.asarray(t_kernel),
        precision=jax.lax.Precision.HIGH,
        preferred_element_type=jnp.float32,
    )                                                   # [..., C, K]
    # z[c] = pole^K * z[c-1] + y_in[c, -1] — the running value at each
    # chunk's last sample, via a short associative scan over C
    last = y_in[..., -1]
    a = jnp.full_like(last, float(pole) ** k)

    def combine(left, right):
        al, bl = left
        ar, br = right
        return al * ar, bl * ar + br

    _, z = jax.lax.associative_scan(combine, (a, last), axis=-1)
    carry_prev = jnp.pad(
        z[..., :-1], [(0, 0)] * (z.ndim - 1) + [(1, 0)]
    )                                                   # z[c-1], 0 at c=0
    y = y_in + carry_prev[..., None] * jnp.asarray(powj)
    return y.reshape(diff.shape[:-1] + (c * k,))[..., :n]


# ---------------------------------------------------------------------
# Biquad bandpass (bandpass.go:13-151)
# ---------------------------------------------------------------------

def bandpass_coefficients(
    center_hz: float, q: float, sample_rate: int
) -> Tuple[Tuple[float, float, float], Tuple[float, float, float]]:
    """RBJ audio-EQ-cookbook bandpass (constant skirt gain, peak gain Q).

    Returns ((b0, b1, b2), (a0, a1, a2)) normalized so a0 = 1.
    """
    w0 = 2.0 * math.pi * center_hz / sample_rate
    alpha = math.sin(w0) / (2.0 * q)
    b0 = q * alpha
    b1 = 0.0
    b2 = -q * alpha
    a0 = 1.0 + alpha
    a1 = -2.0 * math.cos(w0)
    a2 = 1.0 - alpha
    return (b0 / a0, b1 / a0, b2 / a0), (1.0, a1 / a0, a2 / a0)


def biquad(
    signal: jnp.ndarray,
    b: Tuple[float, float, float],
    a: Tuple[float, float, float],
) -> jnp.ndarray:
    """Direct-form-II-transposed biquad via lax.scan."""
    b0, b1, b2 = b
    _, a1, a2 = a

    def step(carry, x):
        z1, z2 = carry
        y = b0 * x + z1
        z1_new = b1 * x - a1 * y + z2
        z2_new = b2 * x - a2 * y
        return (z1_new, z2_new), y

    flat = signal.reshape(-1, signal.shape[-1])

    def per_row(row):
        zeros = jnp.zeros((), row.dtype)
        _, ys = jax.lax.scan(step, (zeros, zeros), row)
        return ys

    out = jax.vmap(per_row)(flat)
    return out.reshape(signal.shape)


def bandpass(
    signal: jnp.ndarray, center_hz: float, q: float, sample_rate: int
) -> jnp.ndarray:
    """BandpassFilter.ProcessBuffer (bandpass.go:13-151)."""
    b, a = bandpass_coefficients(center_hz, q, sample_rate)
    return biquad(signal, b, a)


def biquad_response(
    b: Tuple[float, float, float],
    a: Tuple[float, float, float],
    freqs_hz: jnp.ndarray,
    sample_rate: int,
) -> jnp.ndarray:
    """|H(e^jw)| for the biquad (bandpass.go frequency response)."""
    w = 2.0 * jnp.pi * freqs_hz / sample_rate
    z1 = jnp.exp(-1j * w)
    z2 = jnp.exp(-2j * w)
    num = b[0] + b[1] * z1 + b[2] * z2
    den = a[0] + a[1] * z1 + a[2] * z2
    return jnp.abs(num / den).astype(jnp.float32)


def adaptive_pre_emphasis(
    signal: jnp.ndarray,
    base_coefficient: float = 0.95,
    adaptation_rate: float = 0.01,
) -> jnp.ndarray:
    """Adaptive pre-emphasis (pre_emphasis.go NewAdaptivePreEmphasis):
    the coefficient tracks the signal's spectral tilt — frames with more
    high-frequency energy get less emphasis. Implemented as a lax.scan
    over samples updating a running energy ratio, as upstream."""
    x = signal.astype(jnp.float32)

    def step(carry, xn):
        alpha, prev, energy = carry
        y = xn - alpha * prev
        # track high-frequency proxy (first-difference energy ratio)
        energy = (1.0 - adaptation_rate) * energy + adaptation_rate * (
            (xn - prev) ** 2 / jnp.maximum(xn * xn + 1e-10, 1e-10)
        )
        target = jnp.clip(base_coefficient + 0.03 * (1.0 - jnp.clip(energy, 0.0, 1.0)), 0.9, 0.99)
        alpha = alpha + adaptation_rate * (target - alpha)
        return (alpha, xn, energy), y

    flat = x.reshape(-1, x.shape[-1])

    def per_row(row):
        init = (jnp.float32(base_coefficient), jnp.float32(0.0), jnp.float32(0.0))
        _, ys = jax.lax.scan(step, init, row)
        return ys

    return jax.vmap(per_row)(flat).reshape(x.shape)
