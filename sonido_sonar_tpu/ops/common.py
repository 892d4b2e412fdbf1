"""Common utilities: normalization, interpolation, buffers, math helpers.

Reference parity: algorithms/common/*.go —
  normalization.go: z-score, min-max, energy (unit L2), peak, RMS,
    quantile, robust (median/MAD), adaptive, dB-target, simplified LUFS
    target (400 ms windows, -0.691 + 10log10(ms), integrated loudness,
    gain to target, :344-409), frame-wise with overlap blending;
  interpolation.go: linear/cubic/Hermite/Lanczos point interpolation,
    resample/up/down-sample;
  math.go: mean/variance/std/percentile/RMS, moving average, median
    filter, correlation, covariance, linear regression, FindPeaks,
    clamp/lerp, power-of-two helpers;
  buffers.go: CircularBuffer, SlidingWindow, DelayLine, OverlapAddBuffer
    (host-side streaming utilities).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_EPS = 1e-10


# ---------------------------------------------------------------------
# Normalization (normalization.go)
# ---------------------------------------------------------------------

def z_score_normalize(x: jnp.ndarray) -> jnp.ndarray:
    m = jnp.mean(x, axis=-1, keepdims=True)
    s = jnp.std(x, axis=-1, keepdims=True)
    return jnp.where(s > _EPS, (x - m) / jnp.maximum(s, _EPS), x - m)


def min_max_normalize(x: jnp.ndarray) -> jnp.ndarray:
    lo = jnp.min(x, axis=-1, keepdims=True)
    hi = jnp.max(x, axis=-1, keepdims=True)
    rng = hi - lo
    return jnp.where(rng > _EPS, (x - lo) / jnp.maximum(rng, _EPS), jnp.zeros_like(x))


def energy_normalize(x: jnp.ndarray) -> jnp.ndarray:
    """Unit L2 norm."""
    n = jnp.linalg.norm(x, axis=-1, keepdims=True)
    return jnp.where(n > _EPS, x / jnp.maximum(n, _EPS), x)


def peak_normalize(x: jnp.ndarray) -> jnp.ndarray:
    p = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    return jnp.where(p > _EPS, x / jnp.maximum(p, _EPS), x)


def rms_normalize(x: jnp.ndarray, target_rms: float = 1.0) -> jnp.ndarray:
    r = jnp.sqrt(jnp.mean(x * x, axis=-1, keepdims=True))
    return jnp.where(r > _EPS, x * (target_rms / jnp.maximum(r, _EPS)), x)


def quantile_normalize(x: jnp.ndarray, low: float = 0.05, high: float = 0.95) -> jnp.ndarray:
    lo = jnp.quantile(x, low, axis=-1, keepdims=True)
    hi = jnp.quantile(x, high, axis=-1, keepdims=True)
    rng = hi - lo
    scaled = jnp.where(rng > _EPS, (x - lo) / jnp.maximum(rng, _EPS), jnp.zeros_like(x))
    return jnp.clip(scaled, 0.0, 1.0)


def robust_normalize(x: jnp.ndarray) -> jnp.ndarray:
    """(x - median) / MAD."""
    med = jnp.median(x, axis=-1, keepdims=True)
    mad = jnp.median(jnp.abs(x - med), axis=-1, keepdims=True)
    return jnp.where(mad > _EPS, (x - med) / jnp.maximum(mad, _EPS), x - med)


def adaptive_normalize(x: jnp.ndarray) -> jnp.ndarray:
    """AdaptiveNormalize (normalization.go:247-290): robust for
    outlier-heavy signals (kurtosis proxy), z-score otherwise."""
    m = jnp.mean(x, axis=-1, keepdims=True)
    s = jnp.std(x, axis=-1, keepdims=True)
    z = jnp.where(s > _EPS, (x - m) / jnp.maximum(s, _EPS), x - m)
    kurt = jnp.mean(z**4, axis=-1, keepdims=True)
    return jnp.where(kurt > 5.0, robust_normalize(x), z)


def normalize_db(x: jnp.ndarray, target_db: float) -> jnp.ndarray:
    """Scale so RMS hits target dBFS (normalization.go:317-341)."""
    r = jnp.sqrt(jnp.mean(x * x, axis=-1, keepdims=True))
    cur_db = 20.0 * jnp.log10(jnp.maximum(r, _EPS))
    gain = 10.0 ** ((target_db - cur_db) / 20.0)
    return jnp.where(r > _EPS, x * gain, x)


def normalize_lufs(x: jnp.ndarray, target_lufs: float, sample_rate: int) -> jnp.ndarray:
    """Simplified LUFS-target normalization (normalization.go:344-409):
    400 ms / 25% hop momentary loudness -0.691 + 10log10(ms), energy-mean
    integration, then a single linear gain."""
    from sonido_sonar_tpu.ops.framing import num_frames
    from sonido_sonar_tpu.ops.temporal import short_time_energy

    n = x.shape[-1]
    window = min(int(0.4 * sample_rate), n)
    hop = max(window // 4, 1)
    if num_frames(n, window, hop) <= 0:
        return normalize_db(x, target_lufs)
    rms = short_time_energy(x, window, hop)
    valid = rms > _EPS
    loud = -0.691 + 10.0 * jnp.log10(jnp.maximum(rms * rms, _EPS))
    lin = jnp.where(valid, 10.0 ** (loud / 10.0), 0.0)
    cnt = jnp.sum(valid, axis=-1)
    integrated = -0.691 + 10.0 * jnp.log10(
        jnp.maximum(jnp.sum(lin, axis=-1) / jnp.maximum(cnt, 1), _EPS)
    )
    gain = 10.0 ** ((target_lufs - integrated) / 20.0)
    return jnp.where(cnt[..., None] > 0, x * gain[..., None], x)


_NORMALIZERS = {
    "zscore": z_score_normalize,
    "minmax": min_max_normalize,
    "energy": energy_normalize,
    "peak": peak_normalize,
    "rms": rms_normalize,
    "quantile": quantile_normalize,
    "robust": robust_normalize,
    "adaptive": adaptive_normalize,
}


def normalize(x: jnp.ndarray, method: str = "zscore") -> jnp.ndarray:
    """Normalizer.Normalize (normalization.go:33-53)."""
    fn = _NORMALIZERS.get(method)
    if fn is None:
        raise ValueError(f"unknown normalization {method}")
    return fn(x)


# ---------------------------------------------------------------------
# Interpolation (interpolation.go)
# ---------------------------------------------------------------------

def interp_linear(data: jnp.ndarray, index: jnp.ndarray) -> jnp.ndarray:
    n = data.shape[-1]
    i0 = jnp.clip(jnp.floor(index).astype(jnp.int32), 0, n - 1)
    i1 = jnp.clip(i0 + 1, 0, n - 1)
    t = index - i0
    return data[..., i0] * (1 - t) + data[..., i1] * t


def interp_cubic(data: jnp.ndarray, index: jnp.ndarray) -> jnp.ndarray:
    """Catmull-Rom-style 4-point cubic (interpolation.go:69-105)."""
    n = data.shape[-1]
    i1 = jnp.clip(jnp.floor(index).astype(jnp.int32), 0, n - 1)
    i0 = jnp.clip(i1 - 1, 0, n - 1)
    i2 = jnp.clip(i1 + 1, 0, n - 1)
    i3 = jnp.clip(i1 + 2, 0, n - 1)
    t = index - jnp.floor(index)
    p0, p1, p2, p3 = data[..., i0], data[..., i1], data[..., i2], data[..., i3]
    a = -0.5 * p0 + 1.5 * p1 - 1.5 * p2 + 0.5 * p3
    b = p0 - 2.5 * p1 + 2.0 * p2 - 0.5 * p3
    c = -0.5 * p0 + 0.5 * p2
    return ((a * t + b) * t + c) * t + p1


def interp_hermite(data: jnp.ndarray, index: jnp.ndarray) -> jnp.ndarray:
    """4-point Hermite with finite-difference tangents
    (interpolation.go:107-150)."""
    n = data.shape[-1]
    i1 = jnp.clip(jnp.floor(index).astype(jnp.int32), 0, n - 1)
    i0 = jnp.clip(i1 - 1, 0, n - 1)
    i2 = jnp.clip(i1 + 1, 0, n - 1)
    i3 = jnp.clip(i1 + 2, 0, n - 1)
    t = index - jnp.floor(index)
    p0, p1, p2, p3 = data[..., i0], data[..., i1], data[..., i2], data[..., i3]
    m1 = 0.5 * (p2 - p0)
    m2 = 0.5 * (p3 - p1)
    t2 = t * t
    t3 = t2 * t
    return (
        (2 * t3 - 3 * t2 + 1) * p1
        + (t3 - 2 * t2 + t) * m1
        + (-2 * t3 + 3 * t2) * p2
        + (t3 - t2) * m2
    )


def _lanczos_kernel(x: jnp.ndarray, a: float) -> jnp.ndarray:
    px = jnp.pi * x
    sinc = jnp.where(jnp.abs(x) < _EPS, 1.0, jnp.sin(px) / jnp.maximum(jnp.abs(px), _EPS) * jnp.sign(px) * jnp.sign(px))
    sinc = jnp.where(jnp.abs(x) < _EPS, 1.0, jnp.sin(px) / px)
    sinc_a = jnp.where(jnp.abs(x) < _EPS, 1.0, jnp.sin(px / a) / (px / a))
    return jnp.where(jnp.abs(x) < a, sinc * sinc_a, 0.0)


def interp_lanczos(data: jnp.ndarray, index: jnp.ndarray, a: int = 3) -> jnp.ndarray:
    """Lanczos-a interpolation (interpolation.go:152-193)."""
    n = data.shape[-1]
    base = jnp.floor(index).astype(jnp.int32)
    total = jnp.zeros_like(index, dtype=jnp.float32)
    wsum = jnp.zeros_like(index, dtype=jnp.float32)
    for k in range(-a + 1, a + 1):
        i = jnp.clip(base + k, 0, n - 1)
        w = _lanczos_kernel(index - (base + k).astype(jnp.float32), float(a))
        total = total + w * data[..., i]
        wsum = wsum + w
    return jnp.where(jnp.abs(wsum) > _EPS, total / jnp.maximum(wsum, _EPS), total)


def resample_signal(
    signal: jnp.ndarray, original_rate: int, target_rate: int, method: str = "linear"
) -> jnp.ndarray:
    """ResampleSignal (interpolation.go:195-216)."""
    n = signal.shape[-1]
    n_out = int(round(n * target_rate / original_rate))
    idx = jnp.arange(n_out, dtype=jnp.float32) * (original_rate / target_rate)
    fn = {"linear": interp_linear, "cubic": interp_cubic,
          "hermite": interp_hermite, "lanczos": interp_lanczos}[method]
    return fn(signal, idx)


def bilinear_interpolate(grid: jnp.ndarray, yi: jnp.ndarray, xi: jnp.ndarray) -> jnp.ndarray:
    """2-D bilinear (interpolation.go bilinear)."""
    h, w = grid.shape[-2], grid.shape[-1]
    y0 = jnp.clip(jnp.floor(yi).astype(jnp.int32), 0, h - 1)
    x0 = jnp.clip(jnp.floor(xi).astype(jnp.int32), 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    ty = yi - y0
    tx = xi - x0
    return (
        grid[..., y0, x0] * (1 - ty) * (1 - tx)
        + grid[..., y0, x1] * (1 - ty) * tx
        + grid[..., y1, x0] * ty * (1 - tx)
        + grid[..., y1, x1] * ty * tx
    )


# ---------------------------------------------------------------------
# Math utils (math.go)
# ---------------------------------------------------------------------

def moving_average(x: jnp.ndarray, window: int) -> jnp.ndarray:
    """Centered moving average, same length (math.go:140-167)."""
    k = jnp.ones(window, dtype=x.dtype) / window
    flat = x.reshape(-1, x.shape[-1])
    out = jax.vmap(lambda v: jnp.convolve(v, k, mode="same"))(flat)
    return out.reshape(x.shape)


def median_filter(x: jnp.ndarray, window: int) -> jnp.ndarray:
    """Sliding median, same length (math.go:169-209)."""
    pad = window // 2
    padded = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="edge")
    idx = jnp.arange(x.shape[-1])[:, None] + jnp.arange(window)[None, :]
    return jnp.median(padded[..., idx], axis=-1)


def correlation(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Pearson correlation (math.go:211-218)."""
    xm = x - jnp.mean(x, axis=-1, keepdims=True)
    ym = y - jnp.mean(y, axis=-1, keepdims=True)
    num = jnp.sum(xm * ym, axis=-1)
    den = jnp.sqrt(jnp.sum(xm * xm, axis=-1) * jnp.sum(ym * ym, axis=-1))
    return jnp.where(den > _EPS, num / jnp.maximum(den, _EPS), 0.0)


def covariance(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    xm = x - jnp.mean(x, axis=-1, keepdims=True)
    ym = y - jnp.mean(y, axis=-1, keepdims=True)
    n = x.shape[-1]
    return jnp.sum(xm * ym, axis=-1) / max(n - 1, 1)


def linear_regression(x: jnp.ndarray, y: jnp.ndarray):
    """(slope, intercept, r_squared) (math.go:237-263)."""
    mx = jnp.mean(x, axis=-1)
    my = jnp.mean(y, axis=-1)
    sxy = jnp.mean(x * y, axis=-1) - mx * my
    sxx = jnp.mean(x * x, axis=-1) - mx * mx
    slope = jnp.where(jnp.abs(sxx) > _EPS, sxy / jnp.maximum(jnp.abs(sxx), _EPS) * jnp.sign(sxx), 0.0)
    intercept = my - slope * mx
    r = correlation(x, y)
    return slope, intercept, r * r


def find_peaks(
    x: jnp.ndarray, min_height: float = 0.0, min_distance: int = 1, max_peaks: int = 32
):
    """FindPeaks (math.go:265-303) -> fixed-k (indices, values, count)
    via greedy max-first suppression."""
    n = x.shape[-1]
    inner = (x[..., 1:-1] > x[..., :-2]) & (x[..., 1:-1] > x[..., 2:]) & (
        x[..., 1:-1] >= min_height
    )
    cand = jnp.pad(inner, [(0, 0)] * (inner.ndim - 1) + [(1, 1)])
    score0 = jnp.where(cand, x, -jnp.inf)
    bins = jnp.arange(n)

    def body(i, state):
        score, out_idx, out_val, count = state
        best = jnp.argmax(score, axis=-1)
        val = jnp.take_along_axis(score, best[..., None], axis=-1)[..., 0]
        ok = jnp.isfinite(val)
        out_idx = out_idx.at[..., i].set(jnp.where(ok, best, -1))
        out_val = out_val.at[..., i].set(jnp.where(ok, val, 0.0))
        count = count + ok.astype(jnp.int32)
        near = jnp.abs(bins - best[..., None]) < max(min_distance, 1)
        score = jnp.where(near, -jnp.inf, score)
        return score, out_idx, out_val, count

    init = (
        score0,
        jnp.full(x.shape[:-1] + (max_peaks,), -1, jnp.int32),
        jnp.zeros(x.shape[:-1] + (max_peaks,), jnp.float32),
        jnp.zeros(x.shape[:-1], jnp.int32),
    )
    _, idx, vals, count = jax.lax.fori_loop(0, max_peaks, body, init)
    return idx, vals, count


def next_power_of_two(n: int) -> int:
    k = 1
    while k < n:
        k <<= 1
    return k


# ---------------------------------------------------------------------
# Host-side streaming buffers (buffers.go)
# ---------------------------------------------------------------------

class CircularBuffer:
    """CircularBuffer (buffers.go:8-105)."""

    def __init__(self, size: int):
        self._buf = np.zeros(size, dtype=np.float32)
        self._size = size
        self._read = 0
        self._count = 0

    def write(self, data: np.ndarray) -> int:
        data = np.asarray(data, dtype=np.float32)
        n = min(len(data), self.space())
        for v in data[:n]:
            self._buf[(self._read + self._count) % self._size] = v
            self._count += 1
        return n

    def read(self, n: int) -> np.ndarray:
        n = min(n, self._count)
        out = np.empty(n, dtype=np.float32)
        for i in range(n):
            out[i] = self._buf[(self._read + i) % self._size]
        self._read = (self._read + n) % self._size
        self._count -= n
        return out

    def peek(self, n: int) -> np.ndarray:
        n = min(n, self._count)
        return np.array(
            [self._buf[(self._read + i) % self._size] for i in range(n)],
            dtype=np.float32,
        )

    def available(self) -> int:
        return self._count

    def space(self) -> int:
        return self._size - self._count

    def clear(self) -> None:
        self._read = 0
        self._count = 0

    @property
    def is_full(self) -> bool:
        return self._count == self._size

    @property
    def is_empty(self) -> bool:
        return self._count == 0


class SlidingWindow:
    """SlidingWindow framer (buffers.go:107-171): push samples, get
    complete [k, window] frames back."""

    def __init__(self, window_size: int, hop_size: int):
        self.window_size = window_size
        self.hop_size = hop_size
        self._buf = np.zeros(0, dtype=np.float32)

    def add_samples(self, samples: np.ndarray) -> np.ndarray:
        self._buf = np.concatenate(
            [self._buf, np.asarray(samples, dtype=np.float32)]
        )
        frames = []
        while len(self._buf) >= self.window_size:
            frames.append(self._buf[: self.window_size].copy())
            self._buf = self._buf[self.hop_size :]
        return np.stack(frames) if frames else np.zeros((0, self.window_size), np.float32)

    def reset(self) -> None:
        self._buf = np.zeros(0, dtype=np.float32)


class DelayLine:
    """DelayLine with optional fractional (linear-interp) delay
    (buffers.go:174-236)."""

    def __init__(self, max_delay_samples: int):
        self._buf = np.zeros(max_delay_samples + 1, dtype=np.float32)
        self._pos = 0

    def process(self, sample: float, delay_samples: int) -> float:
        self._buf[self._pos] = sample
        idx = (self._pos - delay_samples) % len(self._buf)
        out = float(self._buf[idx])
        self._pos = (self._pos + 1) % len(self._buf)
        return out

    def process_interpolated(self, sample: float, delay_samples: float) -> float:
        self._buf[self._pos] = sample
        d0 = int(np.floor(delay_samples))
        frac = delay_samples - d0
        i0 = (self._pos - d0) % len(self._buf)
        i1 = (self._pos - d0 - 1) % len(self._buf)
        out = float(self._buf[i0] * (1 - frac) + self._buf[i1] * frac)
        self._pos = (self._pos + 1) % len(self._buf)
        return out

    def clear(self) -> None:
        self._buf[:] = 0.0


class OverlapAddBuffer:
    """OverlapAddBuffer (buffers.go:239-296): reconstruct a stream from
    overlapping frames."""

    def __init__(self, window_size: int, hop_size: int):
        self.window_size = window_size
        self.hop_size = hop_size
        self._acc = np.zeros(window_size, dtype=np.float32)

    def add_frame(self, frame: np.ndarray) -> np.ndarray:
        frame = np.asarray(frame, dtype=np.float32)
        if len(frame) != self.window_size:
            raise ValueError("frame size mismatch")
        self._acc += frame
        out = self._acc[: self.hop_size].copy()
        self._acc = np.concatenate(
            [self._acc[self.hop_size :], np.zeros(self.hop_size, np.float32)]
        )
        return out

    def reset(self) -> None:
        self._acc[:] = 0.0
