"""Fused YIN Pallas kernels.

The XLA path materializes [B, T, W] frames (a 2-4x HBM blow-up), runs
three HIGH-precision DFT matmuls with [*, 2F] intermediates in HBM, a
cumsum pass over the [*, H] difference rows, and gather-based parabolic
interpolation. These kernels fuse framing + the whole difference
function — and optionally the full CMNDF + threshold pick — per
frame-tile: the signal stays in HBM, each grid step DMAs only the
~(tile*hop + W) samples it needs, and the full-pick variant writes just
three numbers per frame (the [B, T, H] difference tensor never exists).
All matmuls run as bf16 hi/lo 3-pass products (Precision.HIGH
semantics — Mosaic can't lower HIGH itself).

Algebraic savings over the XLA path (see ops/pitch.py):
  - n_fft = W (not W+H): circular wraparound can't occur for tau < H;
  - the first-half forward transform is the FIRST TERM of the full
    forward transform (same basis rows), so two matmuls become one
    split matmul: fx = first @ M[:H] + second @ M[H:], ff = first @ M[:H];
  - the sliding half-window energy S(tau) and the CMNDF running sum are
    banded-/triangular-ones matmuls on the MXU instead of lane cumsums;
  - the parabolic-interpolation gathers become one-hot reductions.

Reference parity: the YIN definition of algorithms/tonal/
pitch_detection.go:349-421 (difference function, CMNDF, first minimum
below threshold 0.15, parabolic interpolation, range validation).
"""

from __future__ import annotations

import functools
from functools import partial
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_FRAME_TILE = 64  # frames per grid step (VMEM-bounded: ~10 MB at W=1024)


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


@functools.lru_cache(maxsize=8)
def _yin_kernel_mats(w: int):
    """Constant matrices for the fused kernel, bf16 hi/lo split.

    Returns (mx_hi, mx_lo [W, 2F], minv_hi, minv_lo [2F, H],
    band [W, H], tri [H, H]) with n_fft = W, F = W//2+1, H = W//2.
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

    # lower-triangular ones (incl. diagonal): (d @ tri)[t] = sum_{u<=t} d[u]
    # — the CMNDF cumulative sum as an MXU matmul
    tri = (np.arange(h)[:, None] <= np.arange(h)[None, :]).astype(np.float32)

    def split(m):
        hi = m.astype(np.float32).astype(jnp.bfloat16)
        lo = (m.astype(np.float32) - np.asarray(hi, np.float32)).astype(
            jnp.bfloat16
        )
        return np.asarray(hi), np.asarray(lo)

    mx_hi, mx_lo = split(m_x)
    minv_hi, minv_lo = split(m_inv)
    band_bf = band.astype(jnp.bfloat16)  # 0/1: exact in bf16
    tri_bf = tri.astype(jnp.bfloat16)
    for arr in (mx_hi, mx_lo, minv_hi, minv_lo, band_bf, tri_bf):
        arr.setflags(write=False)
    return mx_hi, mx_lo, minv_hi, minv_lo, band_bf, tri_bf


def _dot3(a_hi, a_lo, b_hi, b_lo):
    return (
        jnp.dot(a_hi, b_hi, preferred_element_type=jnp.float32)
        + jnp.dot(a_hi, b_lo, preferred_element_type=jnp.float32)
        + jnp.dot(a_lo, b_hi, preferred_element_type=jnp.float32)
    )


def _bf16_split(x):
    hi = x.astype(jnp.bfloat16)
    return hi, (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)


def _yin_pallas_common(signal, window_size, hop_size, lead=0):
    """Shared geometry + flattened/padded signal prep.

    lead=1024 prepends one aligned zero block per row so the kernel can
    apply pre-emphasis in VMEM (it needs x[-1] for each tile's first
    sample; the zero lead makes y[0] = x[0], matching
    ops/filters.pre_emphasis)."""
    from sonido_sonar_tpu.ops.framing import num_frames

    w = window_size
    assert w % hop_size == 0
    b, n = signal.shape
    t = num_frames(n, w, hop_size)
    tile = _FRAME_TILE
    n_tiles = _cdiv(t, tile)
    slice_len = tile * hop_size + w
    # geometry-independent padding so this flat signal is byte-identical
    # to the STFT kernel's over the same input — XLA CSEs the pad +
    # 1-D-relayout chain (framing.flatten_padded_rows)
    from sonido_sonar_tpu.ops.framing import flatten_padded_rows

    sig, pad_to, row_stride = flatten_padded_rows(
        signal.astype(jnp.float32), lead
    )
    assert (n_tiles - 1) * tile * hop_size + slice_len <= pad_to
    return sig, b, t, n_tiles, slice_len, row_stride


def _d_from_frames(frames, mxh_ref, mxl_ref, mih_ref, mil_ref, band_ref,
                   w, h, f_bins):
    fr_hi, fr_lo = _bf16_split(frames)
    # forward: a = first @ M[:H] (this IS the first-half transform),
    # fx = a + second @ M[H:]
    a = _dot3(fr_hi[:, :h], fr_lo[:, :h], mxh_ref[:h, :], mxl_ref[:h, :])
    bt = _dot3(fr_hi[:, h:], fr_lo[:, h:], mxh_ref[h:, :], mxl_ref[h:, :])
    fx = a + bt
    ff = a
    rex, imx = fx[:, :f_bins], fx[:, f_bins:]
    ref_, imf = ff[:, :f_bins], ff[:, f_bins:]
    cross = jnp.concatenate(
        [ref_ * rex + imf * imx, ref_ * imx - imf * rex], axis=1
    )
    cr_hi, cr_lo = _bf16_split(cross)
    r_corr = _dot3(cr_hi, cr_lo, mih_ref[:], mil_ref[:])
    sq = frames * frames
    sq_hi, sq_lo = _bf16_split(sq)
    s_win = jnp.dot(
        sq_hi, band_ref[:], preferred_element_type=jnp.float32
    ) + jnp.dot(sq_lo, band_ref[:], preferred_element_type=jnp.float32)
    e1 = s_win[:, 0:1]
    return e1 + s_win - 2.0 * r_corr


@partial(jax.jit, static_argnames=("window_size", "hop_size", "interpret"))
def yin_difference_pallas(
    signal: jnp.ndarray,
    window_size: int = 1024,
    hop_size: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """[B, N] -> d [B, T, H] with H = W//2, T = (N - W)//hop + 1."""
    if signal.ndim == 1:
        return yin_difference_pallas(
            signal[None, :], window_size, hop_size, interpret
        )[0]
    w = window_size
    h = w // 2
    f_bins = w // 2 + 1
    k = w // hop_size
    sig, b, t, n_tiles, slice_len, row_stride = _yin_pallas_common(
        signal, w, hop_size
    )
    tile = _FRAME_TILE
    mx_hi, mx_lo, minv_hi, minv_lo, band, _ = _yin_kernel_mats(w)

    def kernel(sig_ref, mxh_ref, mxl_ref, mih_ref, mil_ref, band_ref,
               out_ref, sig_vmem, sem):
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
        out_ref[0, :, :] = _d_from_frames(
            frames, mxh_ref, mxl_ref, mih_ref, mil_ref, band_ref,
            w, h, f_bins,
        )

    out = pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
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


@partial(
    jax.jit,
    static_argnames=(
        "window_size", "hop_size", "sample_rate", "min_freq", "max_freq",
        "yin_threshold", "interpret", "with_period_amp", "pre_emph",
    ),
)
def yin_pitch_pallas(
    signal: jnp.ndarray,
    window_size: int,
    hop_size: int,
    sample_rate: int,
    min_freq: float,
    max_freq: float,
    yin_threshold: float = 0.15,
    interpret: bool = False,
    with_period_amp: bool = False,
    pre_emph: float = 0.0,
):
    """Full fused YIN: [B, N] -> (pitch, confidence, voicing) each [B, T].

    The difference rows, CMNDF, threshold pick, parabolic interpolation
    and range validation all stay in VMEM; only three numbers per frame
    reach HBM. Matches ops.pitch._yin_pick semantics.

    with_period_amp=True appends the per-frame RMS over the first
    pitch-period samples (voice_quality.go's period amplitude) as a
    fourth array — computed from the same in-VMEM frames, replacing a
    full-signal cumsum + gather pass in analyze_voice_quality.
    """
    if signal.ndim == 1:
        res = yin_pitch_pallas(
            signal[None, :], window_size, hop_size, sample_rate,
            min_freq, max_freq, yin_threshold, interpret, with_period_amp,
            pre_emph,
        )
        return tuple(r[0] for r in res)
    w = window_size
    h = w // 2
    f_bins = w // 2 + 1
    k = w // hop_size
    lead = 1024 if pre_emph != 0.0 else 0
    sig, b, t, n_tiles, slice_len, row_stride = _yin_pallas_common(
        signal, w, hop_size, lead
    )
    tile = _FRAME_TILE
    mx_hi, mx_lo, minv_hi, minv_lo, band, tri = _yin_kernel_mats(w)
    eps = 1e-10
    n_out = 3 if with_period_amp else 2

    def kernel(sig_ref, mxh_ref, mxl_ref, mih_ref, mil_ref, band_ref,
               tri_ref, out_ref, sig_vmem, sem):
        bi = pl.program_id(0)
        i = pl.program_id(1)
        start = bi * row_stride + i * tile * hop_size
        start = pl.multiple_of(start, 1024)
        dma = pltpu.make_async_copy(
            sig_ref.at[pl.ds(start, slice_len + lead)], sig_vmem, sem
        )
        dma.start()
        dma.wait()
        if lead:
            # fused pre-emphasis on the in-VMEM slice (see
            # _yin_pallas_common): y[n] = x[n] - a*x[n-1], zero lead
            raw = sig_vmem[:]
            s = raw[lead:] - pre_emph * raw[lead - 1 : lead - 1 + slice_len]
        else:
            s = sig_vmem[:]
        per = tile // k
        parts = []
        for r in range(k):
            seg = s[r * hop_size : r * hop_size + per * w]
            parts.append(seg.reshape(per, w))
        frames = jnp.stack(parts, axis=1).reshape(tile, w)
        d = _d_from_frames(
            frames, mxh_ref, mxl_ref, mih_ref, mil_ref, band_ref,
            w, h, f_bins,
        )

        # CMNDF (pitch_detection.go:365-372): cm[0]=1,
        # cm[t] = d[t]*t / sum_{1..t} d
        d_hi, d_lo = _bf16_split(d)
        cums = jnp.dot(
            d_hi, tri_ref[:], preferred_element_type=jnp.float32
        ) + jnp.dot(d_lo, tri_ref[:], preferred_element_type=jnp.float32)
        running = cums - d[:, 0:1]  # sum over u in [1, t]
        tau_i = jax.lax.broadcasted_iota(jnp.int32, (tile, h), 1)
        tau_f = tau_i.astype(jnp.float32)
        cm = d * tau_f / jnp.maximum(running, eps)
        cm = jnp.where(tau_i == 0, 1.0, cm)

        # first tau >= 1 with cm < threshold and cm < cm[tau+1]
        nxt = jnp.concatenate(
            [cm[:, 1:], jnp.full((tile, 1), jnp.inf, jnp.float32)], axis=1
        )
        cand = (cm < yin_threshold) & (cm < nxt) & (tau_i >= 1)
        has = jnp.any(cand, axis=1)
        # first True: min of tau with a sentinel where not candidate
        min_tau = jnp.min(
            jnp.where(cand, tau_i, jnp.int32(2 * h)), axis=1
        )
        min_tau = jnp.where(has, min_tau, 0)

        # parabolic interpolation via one-hot reductions (no gathers)
        oh1 = tau_i == min_tau[:, None]
        oh0 = tau_i == jnp.maximum(min_tau - 1, 0)[:, None]
        oh2 = tau_i == jnp.minimum(min_tau + 1, h - 1)[:, None]
        y1 = jnp.sum(jnp.where(oh1, cm, 0.0), axis=1)
        y0 = jnp.sum(jnp.where(oh0, cm, 0.0), axis=1)
        y2 = jnp.sum(jnp.where(oh2, cm, 0.0), axis=1)
        denom = y0 - 2.0 * y1 + y2
        shift = jnp.where(
            jnp.abs(denom) > eps,
            0.5 * (y0 - y2) / jnp.where(jnp.abs(denom) > eps, denom, 1.0),
            0.0,
        )
        interior = (min_tau > 0) & (min_tau < h - 1)
        period = min_tau.astype(jnp.float32) + jnp.where(interior, shift, 0.0)
        freq = sample_rate / jnp.maximum(period, eps)
        confidence = 1.0 - y1
        ok = has & (freq >= min_freq) & (freq <= max_freq)
        pitch = jnp.where(ok, freq, 0.0)
        conf = jnp.where(ok, confidence, 0.0)
        out_ref[0, :, 0] = pitch
        out_ref[0, :, 1] = conf
        if with_period_amp:
            # RMS over the first pitch-period samples of each frame
            # (voice_quality.go period amplitudes); period 0 -> 1 sample
            period_f = jnp.where(pitch > 0, sample_rate / jnp.maximum(pitch, eps), 0.0)
            plen = jnp.clip(period_f.astype(jnp.int32), 1, w - 1)
            j_w = jax.lax.broadcasted_iota(jnp.int32, (tile, w), 1)
            sq = frames * frames
            psum = jnp.sum(
                jnp.where(j_w < plen[:, None], sq, 0.0), axis=1
            )
            out_ref[0, :, 2] = jnp.sqrt(
                psum / jnp.maximum(plen.astype(jnp.float32), 1.0)
            )

    out = pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec(sig.shape, lambda bi, ti: (0,), memory_space=pltpu.ANY),
            pl.BlockSpec((w, 2 * f_bins), lambda bi, ti: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w, 2 * f_bins), lambda bi, ti: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * f_bins, h), lambda bi, ti: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * f_bins, h), lambda bi, ti: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w, h), lambda bi, ti: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, h), lambda bi, ti: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile, n_out), lambda bi, ti: (bi, ti, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, n_tiles * tile, n_out), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((slice_len + lead,), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(sig, jnp.asarray(mx_hi), jnp.asarray(mx_lo), jnp.asarray(minv_hi),
      jnp.asarray(minv_lo), jnp.asarray(band), jnp.asarray(tri))
    pitch = out[:, :t, 0]
    conf = out[:, :t, 1]
    if with_period_amp:
        return pitch, conf, conf, out[:, :t, 2]
    return pitch, conf, conf


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
        + 2 * h * h                       # tri bf16
        + 4 * (_FRAME_TILE * hop_size + window_size)   # slice f32
        + 4 * _FRAME_TILE * (3 * window_size + 3 * f2 + 4 * h)  # activations
    )
    return vmem < 12 * 1024 * 1024
