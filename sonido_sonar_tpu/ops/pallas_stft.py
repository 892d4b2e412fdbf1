"""Fused STFT-magnitude Pallas kernel.

The XLA path materializes the framed signal ([B, T, W] float32 — a 4x
HBM blow-up at 75% overlap) before the DFT matmul. This kernel fuses
framing + windowed-DFT matmul + magnitude per frame-tile: the signal
stays in HBM, each grid step DMAs only the ~(tile*hop + W) samples it
needs into VMEM, builds the frame tile with static reshapes, hits the
MXU with the [W, 2F] windowed-DFT constant, and writes just the
[tile, F] magnitudes back. HBM traffic drops from ~9x the signal size
to ~1x + outputs.

Used by `stft()` when running on TPU with window sizes that fit the
VMEM budget; the XLA path remains the fallback (and the CPU/test path
via interpret mode).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sonido_sonar_tpu.config.config import WindowType

_FRAME_TILE = 256  # frames per grid step


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


@partial(
    jax.jit,
    static_argnames=(
        "window_size", "hop_size", "window_type", "interpret", "with_aux",
        "pre_emph",
    ),
)
def stft_magnitude_pallas(
    signal: jnp.ndarray,
    window_size: int = 1024,
    hop_size: int = 256,
    window_type: WindowType = WindowType.HANN,
    interpret: bool = False,
    with_aux: bool = False,
    pre_emph: float = 0.0,
):
    """[B, N] -> magnitude [B, T, F] with F = window_size//2 + 1.

    Requires hop_size | window_size (the production geometries). T is
    the reference frame count (N - W)//hop + 1.

    with_aux=True additionally returns an aux dict of [B, T] series
    computed from the SAME in-VMEM frames/magnitudes:
      rms, zero_crossings   — frame-local definitions, identical to
        ops.temporal.short_time_energy / ops.spectral.zero_crossings
        (replacing two ~20-pass full-signal cumsum programs);
      rolloff, low_energy_ratio, high_energy_ratio — from ONE in-VMEM
        power-cumsum tri matmul (the XLA rolloff alone spent ~17 ms/step
        on HBM-resident bf16 splits + layout churn; here power never
        leaves VMEM and the band ratios fall out of the same cumsum).
    """
    from sonido_sonar_tpu.ops.framing import num_frames
    from sonido_sonar_tpu.ops.stft import _windowed_dft_matrix

    if signal.ndim == 1:
        res = stft_magnitude_pallas(
            signal[None, :], window_size, hop_size, window_type, interpret,
            with_aux, pre_emph,
        )
        if with_aux:
            return res[0][0], {k: v[0] for k, v in res[1].items()}
        return res[0]
    assert window_size % hop_size == 0, "pallas stft needs hop | window"

    b, n = signal.shape
    t = num_frames(n, window_size, hop_size)
    f_bins = window_size // 2 + 1
    k = window_size // hop_size

    tile = _FRAME_TILE
    n_tiles = _cdiv(t, tile)
    # samples each tile reads: tile frames spanning (tile-1)*hop + W,
    # rounded up so the static reshape below is exact
    slice_len = tile * hop_size + window_size  # >= needed; static

    # pre_emph != 0 fuses y[n] = x[n] - a*x[n-1] (y[0] = x[0],
    # ops/filters.pre_emphasis) into the kernel: each row gets one
    # 1024-zero lead block so every tile's DMA window can reach x[-1]
    # while staying 1024-aligned, and the filter runs on the in-VMEM
    # slice — the [B, N] pre-emphasized intermediate (a ~3 ms fusion
    # plus ~4 ms of layout copies at B=128 x 30 s, device trace) never
    # exists in HBM. Identical up to f32 FMA contraction (~1e-6).
    lead = 1024 if pre_emph != 0.0 else 0

    # pad rows so every tile's DMA window is in bounds, then flatten to
    # 1-D (row stride a multiple of 1024 keeps DMA slices tile-aligned)
    pad_to = (n_tiles - 1) * tile * hop_size + slice_len
    pad_to = _cdiv(max(pad_to, n), 1024) * 1024
    sig = jnp.pad(signal.astype(jnp.float32), ((0, 0), (lead, pad_to - n)))
    row_stride = pad_to + lead
    sig = sig.reshape(b * row_stride)

    m_dft = jnp.asarray(_windowed_dft_matrix(window_type, window_size))  # [W, 2F]
    # bf16x3 split of the DFT basis (precomputed): Mosaic only lowers
    # DEFAULT/HIGHEST dot precision in-kernel, and HIGHEST (6 bf16
    # passes) costs ~2x what the STFT needs. hi + lo carries ~16
    # mantissa bits of the basis; with the frames split likewise the
    # three-pass product (f_hi d_hi + f_hi d_lo + f_lo d_hi) matches
    # Precision.HIGH semantics (~1e-5 relative, validated on-chip in
    # tests/test_pallas_stft.py).
    m_hi = m_dft.astype(jnp.bfloat16)
    m_lo = (m_dft - m_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    if with_aux:
        from sonido_sonar_tpu.ops.spectral import _rolloff_tri

        tri = jnp.asarray(_rolloff_tri(f_bins))  # [F, F] bf16 exact 0/1
    split = f_bins // 4
    rolloff_threshold = 0.85  # rolloff emitted in BIN units (no sr here)

    def kernel(sig_ref, dft_hi_ref, dft_lo_ref, *refs):
        if with_aux:
            tri_ref, out_ref, aux_ref, sig_vmem, sem = refs
        else:
            out_ref, sig_vmem, sem = refs
        bi = pl.program_id(0)  # batch row
        i = pl.program_id(1)   # tile index
        start = bi * row_stride + i * tile * hop_size
        start = pl.multiple_of(start, 1024)
        # DMA the signal slice HBM -> VMEM (the lead block, when
        # present, carries the previous sample for the first frame)
        dma = pltpu.make_async_copy(
            sig_ref.at[pl.ds(start, slice_len + lead)],
            sig_vmem,
            sem,
        )
        dma.start()
        dma.wait()
        if lead:
            raw = sig_vmem[:]
            s = raw[lead:] - pre_emph * raw[lead - 1 : lead - 1 + slice_len]
        else:
            s = sig_vmem[:]

        # build [tile, W] frames from k shifted contiguous reshapes:
        # frames[j] = s[j*hop : j*hop + W]; rows j with j % k == r come
        # from reshape of s[r*hop : r*hop + tile//k * W]
        per = tile // k
        parts = []
        for r in range(k):
            seg = s[r * hop_size : r * hop_size + per * window_size]
            parts.append(seg.reshape(per, window_size))
        stacked = jnp.stack(parts, axis=1)  # [per, k, W]
        frames = stacked.reshape(tile, window_size)

        f_hi = frames.astype(jnp.bfloat16)
        f_lo = (frames - f_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        d_hi = dft_hi_ref[:]
        reim = (
            jnp.dot(f_hi, d_hi, preferred_element_type=jnp.float32)
            + jnp.dot(f_hi, dft_lo_ref[:], preferred_element_type=jnp.float32)
            + jnp.dot(f_lo, d_hi, preferred_element_type=jnp.float32)
        )
        re = reim[:, :f_bins]
        im = reim[:, f_bins:]
        out_ref[0, :, :] = jnp.sqrt(re * re + im * im)

        if with_aux:
            # epilogue on the in-VMEM frames: short-time RMS + sign-change
            # count (temporal/energy.go:9-60, zero_crossing_rate.go:42-48)
            sq = frames * frames
            rms = jnp.sqrt(jnp.sum(sq, axis=1) / float(window_size))
            nonneg = frames >= 0
            zc = jnp.sum(
                (nonneg[:, 1:] != nonneg[:, :-1]).astype(jnp.float32), axis=1
            )
            # power cumsum as ONE tri matmul on the in-VMEM magnitudes:
            # rolloff bin (spectral_rolloff.go:19-70) and the quarter-band
            # energy ratios all read off the same cumulative row
            mag = out_ref[0, :, :]
            power = mag * mag
            p_hi = power.astype(jnp.bfloat16)
            p_lo = (power - p_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            cum = jnp.dot(
                p_hi, tri_ref[:], preferred_element_type=jnp.float32
            ) + jnp.dot(p_lo, tri_ref[:], preferred_element_type=jnp.float32)
            p_sum = cum[:, f_bins - 1]
            reached = cum >= rolloff_threshold * p_sum[:, None]
            lane = jax.lax.broadcasted_iota(jnp.int32, (tile, f_bins), 1)
            first = jnp.min(
                jnp.where(reached, lane, jnp.int32(f_bins)), axis=1
            )
            rolloff_bin = jnp.minimum(first, f_bins - 1).astype(jnp.float32)
            rolloff_bin = jnp.where(p_sum > 0, rolloff_bin, 0.0)
            low_e = cum[:, split - 1]
            eps = 1e-10
            low_ratio = jnp.where(
                p_sum > 0, low_e / jnp.maximum(p_sum, eps), 0.0
            )
            high_ratio = jnp.where(
                p_sum > 0, (p_sum - low_e) / jnp.maximum(p_sum, eps), 0.0
            )
            aux_ref[0, :, 0] = rms
            aux_ref[0, :, 1] = zc
            aux_ref[0, :, 2] = rolloff_bin
            aux_ref[0, :, 3] = low_ratio
            aux_ref[0, :, 4] = high_ratio
            for j in range(5, 8):
                aux_ref[0, :, j] = jnp.zeros((tile,), jnp.float32)

    out_padded_t = n_tiles * tile
    grid = (b, n_tiles)
    out_specs = [
        pl.BlockSpec(
            (1, tile, f_bins),
            lambda bi, ti: (bi, ti, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    out_shapes = [jax.ShapeDtypeStruct((b, out_padded_t, f_bins), jnp.float32)]
    if with_aux:
        out_specs.append(
            pl.BlockSpec(
                (1, tile, 8), lambda bi, ti: (bi, ti, 0),
                memory_space=pltpu.VMEM,
            )
        )
        out_shapes.append(
            jax.ShapeDtypeStruct((b, out_padded_t, 8), jnp.float32)
        )
    in_specs = [
        # full flattened signal stays in HBM (ANY requires the whole
        # array + trivial index map); the kernel DMAs slices itself
        pl.BlockSpec(
            sig.shape,
            lambda bi, ti: (0,),
            memory_space=pltpu.ANY,
        ),
        pl.BlockSpec(
            (window_size, 2 * f_bins),
            lambda bi, ti: (0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (window_size, 2 * f_bins),
            lambda bi, ti: (0, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    operands = [sig, m_hi, m_lo]
    if with_aux:
        in_specs.append(
            pl.BlockSpec(
                (f_bins, f_bins), lambda bi, ti: (0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        operands.append(tri)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((slice_len + lead,), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(*operands)
    if with_aux:
        mag, aux = out
        aux_dict = {
            "rms": aux[:, :t, 0],
            "zero_crossings": aux[:, :t, 1],
            "rolloff_bin": aux[:, :t, 2],
            "low_energy_ratio": aux[:, :t, 3],
            "high_energy_ratio": aux[:, :t, 4],
        }
        return mag[:, :t, :], aux_dict
    return out[0][:, :t, :]


def pallas_stft_available(window_size: int, hop_size: int) -> bool:
    """Whether the fused kernel supports this geometry on this backend."""
    try:
        if jax.default_backend() not in ("tpu",):
            return False
    except Exception:
        return False
    if window_size % hop_size != 0:
        return False
    if _FRAME_TILE % (window_size // hop_size) != 0:
        return False
    # the kernel promises pl.multiple_of(i * _FRAME_TILE * hop_size, 1024)
    # for its 1-D DMA slices (Mosaic tiling); only true when the per-tile
    # stride is itself 1024-aligned
    if (_FRAME_TILE * hop_size) % 1024 != 0:
        return False
    # VMEM budget: dft matrix + frames + slice + out tile (float32) +
    # the aux epilogue's tri matrix (bf16) and power/cumsum tiles
    f_bins = window_size // 2 + 1
    vmem = 4 * (
        window_size * 2 * f_bins
        + _FRAME_TILE * window_size
        + _FRAME_TILE * hop_size + window_size
        + _FRAME_TILE * f_bins
    ) + 2 * f_bins * f_bins + 4 * _FRAME_TILE * f_bins * 3
    return vmem < 12 * 1024 * 1024
