"""Fused YIN difference-function Pallas kernel.

The XLA path materializes [B, T, W] frames (a 2-4x HBM blow-up), runs
three HIGH-precision DFT matmuls with [*, 2F] intermediates in HBM, and
a cumsum pass. This kernel fuses framing + the whole difference-function
computation per frame-tile: the signal stays in HBM, each grid step DMAs
only the ~(tile*hop + W) samples it needs, and writes just the
[tile, H] difference rows back. All matmuls run as bf16 hi/lo 3-pass
products (Precision.HIGH semantics — Mosaic can't lower HIGH itself).

Three algebraic savings over the XLA path (see ops/pitch.py):
  - n_fft = W (not W+H): circular wraparound can't occur for tau < H;
  - the first-half forward transform is the FIRST TERM of the full
    forward transform (same basis rows), so two matmuls become one
    split matmul: fx = first @ M[:H] + second @ M[H:], ff = first @ M[:H];
  - the sliding half-window energy S(tau) is a banded-ones matmul on
    the MXU instead of a lane cumsum.

Reference parity: the YIN definition of algorithms/tonal/
pitch_detection.go:349-372 (d(tau) = sum_{j<H} (x[j]-x[j+tau])^2).
"""

from __future__ import annotations

import functools
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_FRAME_TILE = 64  # frames per grid step (VMEM-bounded: ~9.6 MB at W=1024)


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


@functools.lru_cache(maxsize=8)
def _yin_kernel_mats(w: int):
    """Constant matrices for the fused kernel, bf16 hi/lo split.

    Returns (mx_hi, mx_lo [W, 2F], minv_hi, minv_lo [2F, H],
    band [W, H] bf16 exact 0/1) with n_fft = W, F = W//2+1, H = W//2.
    """
    h = w // 2
    f_bins = w // 2 + 1
    n = np.arange(w, dtype=np.float64)[:, None]
    k = np.arange(f_bins, dtype=np.float64)[None, :]
    ang = -2.0 * np.pi * n * k / w
    m_x = np.concatenate([np.cos(ang), np.sin(ang)], axis=1)  # [W, 2F]

    t = np.arange(h, dtype=np.float64)[None, :]
    kk = np.arange(f_bins, dtype=np.float64)[:, None]
    wk = np.full((f_bins, 1), 2.0)
    wk[0, 0] = 1.0
    if w % 2 == 0:
        wk[-1, 0] = 1.0
    ang_i = 2.0 * np.pi * kk * t / w
    m_inv = np.concatenate(
        [wk * np.cos(ang_i), -wk * np.sin(ang_i)], axis=0
    ) / w  # [2F, H]

    # banded ones: S(tau) = sum_{j=tau}^{tau+H-1} x[j]^2 = sq @ band
    j = np.arange(w)[:, None]
    tau = np.arange(h)[None, :]
    band = ((j >= tau) & (j < tau + h)).astype(np.float32)

    def split(m):
        hi = m.astype(np.float32).astype(jnp.bfloat16)
        lo = (m.astype(np.float32) - np.asarray(hi, np.float32)).astype(
            jnp.bfloat16
        )
        return np.asarray(hi), np.asarray(lo)

    mx_hi, mx_lo = split(m_x)
    minv_hi, minv_lo = split(m_inv)
    band_bf = band.astype(jnp.bfloat16)  # 0/1: exact in bf16
    for arr in (mx_hi, mx_lo, minv_hi, minv_lo, band_bf):
        arr.setflags(write=False)
    return mx_hi, mx_lo, minv_hi, minv_lo, band_bf


@partial(jax.jit, static_argnames=("window_size", "hop_size", "interpret"))
def yin_difference_pallas(
    signal: jnp.ndarray,
    window_size: int = 1024,
    hop_size: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """[B, N] -> d [B, T, H] with H = W//2, T = (N - W)//hop + 1."""
    from sonido_sonar_tpu.ops.framing import num_frames

    if signal.ndim == 1:
        return yin_difference_pallas(
            signal[None, :], window_size, hop_size, interpret
        )[0]
    w = window_size
    h = w // 2
    f_bins = w // 2 + 1
    assert w % hop_size == 0
    k = w // hop_size

    b, n = signal.shape
    t = num_frames(n, w, hop_size)
    tile = _FRAME_TILE
    n_tiles = _cdiv(t, tile)
    slice_len = tile * hop_size + w

    pad_to = (n_tiles - 1) * tile * hop_size + slice_len
    pad_to = _cdiv(max(pad_to, n), 1024) * 1024
    sig = jnp.pad(signal.astype(jnp.float32), ((0, 0), (0, pad_to - n)))
    row_stride = pad_to
    sig = sig.reshape(b * row_stride)

    mx_hi, mx_lo, minv_hi, minv_lo, band = _yin_kernel_mats(w)

    def dot3(a_hi, a_lo, b_hi, b_lo):
        return (
            jnp.dot(a_hi, b_hi, preferred_element_type=jnp.float32)
            + jnp.dot(a_hi, b_lo, preferred_element_type=jnp.float32)
            + jnp.dot(a_lo, b_hi, preferred_element_type=jnp.float32)
        )

    def kernel(
        sig_ref, mxh_ref, mxl_ref, mih_ref, mil_ref, band_ref,
        out_ref, sig_vmem, sem,
    ):
        bi = pl.program_id(0)
        i = pl.program_id(1)
        start = bi * row_stride + i * tile * hop_size
        start = pl.multiple_of(start, 1024)
        dma = pltpu.make_async_copy(
            sig_ref.at[pl.ds(start, slice_len)], sig_vmem, sem
        )
        dma.start()
        dma.wait()
        s = sig_vmem[:]

        per = tile // k
        parts = []
        for r in range(k):
            seg = s[r * hop_size : r * hop_size + per * w]
            parts.append(seg.reshape(per, w))
        frames = jnp.stack(parts, axis=1).reshape(tile, w)

        fr_hi = frames.astype(jnp.bfloat16)
        fr_lo = (frames - fr_hi.astype(jnp.float32)).astype(jnp.bfloat16)

        # forward: a = first @ M[:H]  (this IS the first-half transform),
        # fx = a + second @ M[H:]
        a = dot3(fr_hi[:, :h], fr_lo[:, :h], mxh_ref[:h, :], mxl_ref[:h, :])
        bt = dot3(fr_hi[:, h:], fr_lo[:, h:], mxh_ref[h:, :], mxl_ref[h:, :])
        fx = a + bt
        ff = a

        rex, imx = fx[:, :f_bins], fx[:, f_bins:]
        ref_, imf = ff[:, :f_bins], ff[:, f_bins:]
        cross = jnp.concatenate(
            [ref_ * rex + imf * imx, ref_ * imx - imf * rex], axis=1
        )
        cr_hi = cross.astype(jnp.bfloat16)
        cr_lo = (cross - cr_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        r_corr = dot3(cr_hi, cr_lo, mih_ref[:], mil_ref[:])

        sq = frames * frames
        sq_hi = sq.astype(jnp.bfloat16)
        sq_lo = (sq - sq_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        s_win = jnp.dot(
            sq_hi, band_ref[:], preferred_element_type=jnp.float32
        ) + jnp.dot(sq_lo, band_ref[:], preferred_element_type=jnp.float32)
        e1 = s_win[:, 0:1]
        out_ref[0, :, :] = e1 + s_win - 2.0 * r_corr

    grid = (b, n_tiles)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(sig.shape, lambda bi, ti: (0,), memory_space=pltpu.ANY),
            pl.BlockSpec((w, 2 * f_bins), lambda bi, ti: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w, 2 * f_bins), lambda bi, ti: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * f_bins, h), lambda bi, ti: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * f_bins, h), lambda bi, ti: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w, h), lambda bi, ti: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile, h), lambda bi, ti: (bi, ti, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, n_tiles * tile, h), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((slice_len,), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(sig, jnp.asarray(mx_hi), jnp.asarray(mx_lo), jnp.asarray(minv_hi),
      jnp.asarray(minv_lo), jnp.asarray(band))
    return out[:, :t, :]


def pallas_yin_available(window_size: int, hop_size: int) -> bool:
    """Whether the fused YIN kernel supports this geometry here."""
    try:
        if jax.default_backend() not in ("tpu",):
            return False
    except Exception:
        return False
    if window_size % 2 != 0 or window_size % hop_size != 0:
        return False
    if _FRAME_TILE % (window_size // hop_size) != 0:
        return False
    if (_FRAME_TILE * hop_size) % 1024 != 0:
        return False
    h = window_size // 2
    f2 = 2 * (window_size // 2 + 1)
    vmem = (
        2 * 2 * window_size * f2          # mx hi/lo bf16
        + 2 * 2 * f2 * h                  # minv hi/lo bf16
        + 2 * window_size * h             # band bf16
        + 4 * (_FRAME_TILE * hop_size + window_size)   # slice f32
        + 4 * _FRAME_TILE * (3 * window_size + 3 * f2 + 3 * h)  # activations
    )
    return vmem < 12 * 1024 * 1024
