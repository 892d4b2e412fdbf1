"""STFT engine: the single production STFT for the whole framework.

Reference parity: fingerprint/analyzers/spectral.go:385-517
(ComputeSTFTWithWindow: frame -> window (power-gain-normalized) -> real
FFT -> magnitude/phase) and algorithms/spectral/stft.go (the duplicate
implementation — the TPU build has exactly one, per SURVEY.md section 1).

Replaces both goroutine worker pools with one batched jitted program:
  signal [B, N] -> frames [B, T, W] -> windowed -> rfft -> [B, T, W/2+1]
Frame and batch axes are vectorized; multi-chip scaling shards B via
`jax.sharding` (see sonido_sonar_tpu.parallel).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from sonido_sonar_tpu.config.config import WindowType
from sonido_sonar_tpu.ops.framing import frame_signal, num_frames
from sonido_sonar_tpu.ops.windows import make_window

# log-power floor, matches reference dB floor behavior
# (spectral/power_spectrum.go:46-70)
_LOG_FLOOR = 1e-10

# Window sizes up to this use the DFT-as-matmul path on the MXU (the
# windowed DFT matrix is a [W, 2F] constant; at W=1024 the matmul runs
# ~10x faster than XLA's FFT on TPU despite the extra FLOPs — the
# GEMM-native NDFT frontend idea, cf. MelT, arXiv:2606.01009).
_MATMUL_FFT_MAX_W = 2048


@functools.lru_cache(maxsize=32)
def _windowed_dft_matrix(
    window_type: WindowType, window_size: int
) -> np.ndarray:
    """[W, 2F] real matrix: columns are Re then Im of the rDFT basis,
    each row pre-scaled by the (power-normalized, symmetric) window —
    frames @ M yields [.., 2F] = [Re | Im] of the windowed rFFT."""
    w = make_window(
        window_type, window_size, normalize=True, symmetric=True, dtype=np.float64
    )
    f_bins = window_size // 2 + 1
    n = np.arange(window_size, dtype=np.float64)[:, None]
    k = np.arange(f_bins, dtype=np.float64)[None, :]
    ang = -2.0 * np.pi * n * k / window_size
    m = np.concatenate([np.cos(ang), np.sin(ang)], axis=1)  # [W, 2F]
    m *= w[:, None]
    out = m.astype(np.float32)
    out.setflags(write=False)
    return out


@dataclass
class STFTResult:
    """Equivalent of SpectrogramResult/STFTResult (analyzers/spectral.go:14-60).

    All arrays are [..., T, F] with F = window_size//2 + 1. `complex_spec`
    and `phase` are optional (phase costs an atan2 pass; complex doubles
    the HBM footprint) — production fingerprinting only needs magnitude.
    """

    magnitude: jnp.ndarray
    phase: Optional[jnp.ndarray]
    complex_spec: Optional[jnp.ndarray]
    sample_rate: int
    window_size: int
    hop_size: int

    @property
    def freq_bins(self) -> int:
        return self.window_size // 2 + 1

    @property
    def time_frames(self) -> int:
        return self.magnitude.shape[-2]


jax.tree_util.register_pytree_node(
    STFTResult,
    lambda r: (
        (r.magnitude, r.phase, r.complex_spec),
        (r.sample_rate, r.window_size, r.hop_size),
    ),
    lambda aux, ch: STFTResult(ch[0], ch[1], ch[2], *aux),
)


@partial(
    jax.jit,
    static_argnames=(
        "window_size",
        "hop_size",
        "window_type",
        "sample_rate",  # static: it is pytree metadata on STFTResult
        "return_phase",
        "return_complex",
    ),
)
def stft(
    signal: jnp.ndarray,
    window_size: int = 2048,
    hop_size: int = 512,
    window_type: WindowType = WindowType.HANN,
    sample_rate: int = 44100,
    return_phase: bool = False,
    return_complex: bool = False,
) -> STFTResult:
    """Batched STFT over the last axis of `signal` [..., N].

    Window is symmetric + unity-power-gain normalized, matching the
    production path (analyzers/spectral.go:290-295, windowing.go:426-437).
    """
    frames = frame_signal(signal.astype(jnp.float32), window_size, hop_size)
    if window_size <= _MATMUL_FFT_MAX_W:
        # DFT-as-matmul: [.., T, W] @ [W, 2F] on the MXU, window folded in
        m = jnp.asarray(_windowed_dft_matrix(window_type, window_size))
        f_bins = window_size // 2 + 1
        reim = jnp.matmul(
            frames, m, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        re, im = reim[..., :f_bins], reim[..., f_bins:]
        mag = jnp.sqrt(re * re + im * im)
        phase = jnp.arctan2(im, re) if return_phase else None
        cplx = (re + 1j * im) if return_complex else None
    else:
        w = jnp.asarray(
            make_window(window_type, window_size, normalize=True, symmetric=True)
        )
        spec = jnp.fft.rfft(frames * w, axis=-1)
        mag = jnp.abs(spec).astype(jnp.float32)
        phase = jnp.angle(spec).astype(jnp.float32) if return_phase else None
        cplx = spec if return_complex else None
    return STFTResult(
        magnitude=mag,
        phase=phase,
        complex_spec=cplx,
        sample_rate=sample_rate,
        window_size=window_size,
        hop_size=hop_size,
    )


@partial(jax.jit, static_argnames=("window_size", "window_type"))
def fft_frame(
    frame: jnp.ndarray,
    window_size: int = 2048,
    window_type: WindowType = WindowType.HANN,
) -> jnp.ndarray:
    """Single-frame windowed rFFT (SpectralAnalyzer.ComputeFFT, spectral.go:63)."""
    w = jnp.asarray(
        make_window(window_type, window_size, normalize=True, symmetric=True)
    )
    return jnp.fft.rfft(frame.astype(jnp.float32) * w, axis=-1)


def power_spectrum(magnitude: jnp.ndarray) -> jnp.ndarray:
    """mag^2 (spectral/power_spectrum.go:18-44)."""
    return magnitude * magnitude


def log_power_spectrum(magnitude: jnp.ndarray, floor: float = _LOG_FLOOR) -> jnp.ndarray:
    """10*log10(mag^2 + floor) dB (power_spectrum.go:46-102)."""
    return 10.0 * jnp.log10(jnp.maximum(power_spectrum(magnitude), floor))


def spectral_flux(magnitude: jnp.ndarray) -> jnp.ndarray:
    """Half-wave-rectified L2 frame-to-frame flux, [..., T]
    (spectral/spectral_flux.go:17-56). Frame 0 has flux 0."""
    diff = magnitude[..., 1:, :] - magnitude[..., :-1, :]
    rect = jnp.maximum(diff, 0.0)
    flux = jnp.sqrt(jnp.sum(rect * rect, axis=-1))
    pad = [(0, 0)] * (flux.ndim - 1) + [(1, 0)]
    return jnp.pad(flux, pad)


def spectral_flux_all_changes(magnitude: jnp.ndarray) -> jnp.ndarray:
    """Unrectified variant counting decreases too
    (SpectralFlux.ComputeAllChanges, spectral/spectral_flux.go:41-56)."""
    diff = magnitude[..., 1:, :] - magnitude[..., :-1, :]
    flux = jnp.sqrt(jnp.sum(diff * diff, axis=-1))
    pad = [(0, 0)] * (flux.ndim - 1) + [(1, 0)]
    return jnp.pad(flux, pad)


class STFTStreamer:
    """Streaming STFT with an internal ring buffer.

    Reference parity: analyzers/spectral.go:289-374 (ComputeSTFTStreaming).

    Two modes:
    - block_frames == 0 (legacy): every push consumes all complete
      frames immediately. Each distinct chunk length compiles a new
      program — fine for offline use.
    - block_frames > 0 (streaming monitors): frames are emitted in
      fixed blocks so exactly ONE shape ever compiles; `flush()` drains
      the sub-block remainder at end of stream. This is the
      single-compile treatment the LatencyMonitor path uses.
    """

    def __init__(
        self,
        window_size: int = 2048,
        hop_size: int = 512,
        window_type: WindowType = WindowType.HANN,
        sample_rate: int = 44100,
        block_frames: int = 0,
    ):
        self.window_size = window_size
        self.hop_size = hop_size
        self.window_type = window_type
        self.sample_rate = sample_rate
        self.block_frames = block_frames
        self._buffer = np.zeros(0, dtype=np.float32)

    def _run(self, chunk: np.ndarray) -> STFTResult:
        # streaming monitors only consume magnitude: ride the fused
        # Pallas framing+DFT+magnitude kernel on TPU (3.9x the XLA
        # matmul path; frames never hit HBM). bf16 hi/lo 3-pass numerics
        # (~1e-5 rel of the HIGHEST-precision stft()) — block mode keeps
        # the shape fixed so exactly one kernel compiles.
        from sonido_sonar_tpu.ops.pallas_stft import (
            pallas_stft_available,
            stft_magnitude_pallas,
        )

        if pallas_stft_available(self.window_size, self.hop_size):
            sig = jnp.asarray(chunk)[None, :]
            mag = stft_magnitude_pallas(
                sig, self.window_size, self.hop_size, self.window_type
            )[0]
            return STFTResult(
                magnitude=mag,
                phase=None,
                complex_spec=None,
                sample_rate=self.sample_rate,
                window_size=self.window_size,
                hop_size=self.hop_size,
            )
        return stft(
            jnp.asarray(chunk),
            self.window_size,
            self.hop_size,
            self.window_type,
            self.sample_rate,
        )

    def push(self, samples: np.ndarray) -> Optional[STFTResult]:
        """Append samples; return the STFT of newly completed frames
        (all complete frames in legacy mode, whole blocks in block
        mode), or None if not enough data yet."""
        self._buffer = np.concatenate(
            [self._buffer, np.asarray(samples, dtype=np.float32)]
        )
        if self.block_frames > 0:
            b = self.block_frames
            block_samples = (b - 1) * self.hop_size + self.window_size
            results = []
            while len(self._buffer) >= block_samples:
                results.append(self._run(self._buffer[:block_samples]))
                self._buffer = self._buffer[b * self.hop_size :]
            if not results:
                return None
            if len(results) == 1:
                return results[0]
            def _cat(parts):
                return (
                    jnp.concatenate(parts, axis=0)
                    if all(p is not None for p in parts) else None
                )

            return STFTResult(
                magnitude=_cat([r.magnitude for r in results]),
                phase=_cat([r.phase for r in results]),
                complex_spec=_cat([r.complex_spec for r in results]),
                sample_rate=self.sample_rate,
                window_size=self.window_size,
                hop_size=self.hop_size,
            )
        t = num_frames(len(self._buffer), self.window_size, self.hop_size)
        if t == 0:
            return None
        used = (t - 1) * self.hop_size + self.window_size
        chunk = self._buffer[:used]
        # keep unconsumed tail: next frame starts at t*hop
        self._buffer = self._buffer[t * self.hop_size :]
        return self._run(chunk)

    def flush(self) -> Optional[STFTResult]:
        """Drain remaining complete frames (block mode's sub-block tail)."""
        t = num_frames(len(self._buffer), self.window_size, self.hop_size)
        if t == 0:
            return None
        used = (t - 1) * self.hop_size + self.window_size
        chunk = self._buffer[:used]
        self._buffer = self._buffer[t * self.hop_size :]
        return self._run(chunk)

    def reset(self) -> None:
        self._buffer = np.zeros(0, dtype=np.float32)
