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

import functools
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sonido_sonar_tpu.config.config import WindowType

_FRAME_TILE = 256  # frames per grid step

# Lane layout of the `with_features` epilogue output [B, T, 64]: the
# kernel computes mel energies, the normalized chroma-STFT fold, and the
# FINISHED spectral descriptors. The moment sums ride FOUR
# constant-matrix matmuls on the in-VMEM magnitude tile (MXU work —
# round-2's negative result showed in-kernel cross-lane VPU reductions
# don't pay, but MXU matmuls riding the existing frame pass do); the
# descriptor finalization is per-frame column math on the [tile, 64]
# block (finishing in-kernel matters: XLA evaluated the same expressions
# on [B, T, 1]-shaped lane slices whose degenerate minor dim forced
# ~14 ms/step of relayout-bound fusions at B=128 x 30 s, device trace).
FEAT_LANES = {
    "mel": (0, 26),          # power @ mel_filterbank.T  (26 filters)
    "chroma": (26, 38),      # normalized chromagram (12 classes)
    "spectral_centroid": 38,
    "spectral_bandwidth": 39,
    "spectral_flatness": 40,
    "spectral_crest": 41,
    "spectral_slope": 42,
}
# scratch lanes used between the moment matmuls and finalization (their
# final values are overwritten or ignored; documented for the tests)
_MOMENT_LANES = {
    "p_sum": 43,             # sum(power)
    "m_sum": 44,             # sum(mag)
    "fm_sum": 45,            # sum(mag * f)
    "f2m_sum": 46,           # sum(mag * f^2)   (HIGHEST: bandwidth
    #                          cancellation f2m - fm^2/m_sum needs it)
    "count_f": 47,           # sum(mag > eps)
    "n_s": 48,               # sum((mag > eps) & (f > 0))
    "sum_x": 49,             # sum(log10 f   over valid_s)
    "sum_xx": 50,            # sum(log10^2 f over valid_s)
    "log_sum": 51,           # sum(ln mag    over valid_f)
    "sum_y": 52,             # sum(log10 mag over valid_s)
    "sum_xy": 53,            # sum(log10 f * log10 mag over valid_s)
}
_N_FEAT = 64
_FEAT_EPS = 1e-10


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


@functools.lru_cache(maxsize=8)
def _feature_weight_mats(f_bins: int, sample_rate: int, window_size: int):
    """The four [F, 64] constant matrices of the feature epilogue
    (float64 construction, float32 on device), one per matmul operand:
    power, magnitude, valid mask, masked log-magnitude. Columns follow
    FEAT_LANES; each matrix is zero outside its own lanes so the four
    products simply add."""
    import numpy as np

    from sonido_sonar_tpu.ops.chroma import chroma_fold_matrix
    from sonido_sonar_tpu.ops.mel import mel_filterbank
    from sonido_sonar_tpu.ops.spectral import _freq_bins

    inv_ln10 = 1.0 / np.log(10.0)
    freqs = _freq_bins(f_bins, sample_rate).astype(np.float64)
    fpos = (freqs > 0).astype(np.float64)
    logf = np.where(freqs > 0, np.log10(np.maximum(freqs, _FEAT_EPS)), 0.0)

    wp = np.zeros((f_bins, _N_FEAT), dtype=np.float64)
    wm = np.zeros((f_bins, _N_FEAT), dtype=np.float64)
    wv = np.zeros((f_bins, _N_FEAT), dtype=np.float64)
    wl = np.zeros((f_bins, _N_FEAT), dtype=np.float64)

    M = _MOMENT_LANES
    fb = mel_filterbank(26, window_size, sample_rate, 0.0, sample_rate / 2.0)
    wp[:, 0:26] = np.asarray(fb, dtype=np.float64).T
    fold = chroma_fold_matrix(f_bins, sample_rate, window_size)
    wp[:, 26:38] = np.asarray(fold, dtype=np.float64).T
    wp[:, M["p_sum"]] = 1.0

    wm[:, M["m_sum"]] = 1.0
    wm[:, M["fm_sum"]] = freqs
    wm[:, M["f2m_sum"]] = freqs * freqs

    wv[:, M["count_f"]] = 1.0
    wv[:, M["n_s"]] = fpos
    wv[:, M["sum_x"]] = logf * fpos
    wv[:, M["sum_xx"]] = logf * logf * fpos

    wl[:, M["log_sum"]] = 1.0
    wl[:, M["sum_y"]] = fpos * inv_ln10
    wl[:, M["sum_xy"]] = logf * fpos * inv_ln10

    # per-consumer precision tiers (all-HIGHEST measured +10.7 ms/step on
    # the kernel at B=128 x 30 s): power and masked-log operands take the
    # bf16 hi/lo 3-pass route (~1.5e-5 relative — the mel error budget,
    # same tier as the DFT basis); the 0/1 valid mask is EXACT in bf16 so
    # its weights split into a 2-pass; only the magnitude moments stay
    # HIGHEST (f32 weights) because bandwidth's f2m - fm^2/m_sum
    # cancellation amplifies operand error ~sqrt(eps)*centroid.
    def split(w):
        hi = w.astype(jnp.bfloat16)
        lo = (w - np.asarray(hi, dtype=np.float64)).astype(jnp.bfloat16)
        return hi, lo

    wp_hi, wp_lo = split(wp)
    wv_hi, wv_lo = split(wv)
    wl_hi, wl_lo = split(wl)
    out = (wp_hi, wp_lo, wm.astype(np.float32), wv_hi, wv_lo, wl_hi, wl_lo)
    for w in out:
        w.setflags(write=False)
    return out


@partial(
    jax.jit,
    static_argnames=(
        "window_size", "hop_size", "window_type", "interpret", "with_aux",
        "pre_emph", "with_features", "sample_rate",
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
    with_features: bool = False,
    sample_rate: int = 44100,
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
            with_aux, pre_emph, with_features, sample_rate,
        )
        if with_features:
            return res[0][0], {k: v[0] for k, v in res[1].items()}, res[2][0]
        if with_aux:
            return res[0][0], {k: v[0] for k, v in res[1].items()}
        return res[0]
    assert window_size % hop_size == 0, "pallas stft needs hop | window"
    assert not (with_features and not with_aux), "with_features needs with_aux"

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
    # 1-D (row stride a multiple of 1024 keeps DMA slices tile-aligned;
    # geometry-independent padding so the YIN kernel's flat signal CSEs
    # with this one — see framing.flatten_padded_rows)
    from sonido_sonar_tpu.ops.framing import flatten_padded_rows

    sig, pad_to, row_stride = flatten_padded_rows(
        signal.astype(jnp.float32), lead
    )
    assert (n_tiles - 1) * tile * hop_size + slice_len <= pad_to

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
    if with_features:
        w_feat = [
            jnp.asarray(w)
            for w in _feature_weight_mats(f_bins, sample_rate, window_size)
        ]
    split = f_bins // 4
    rolloff_threshold = 0.85  # rolloff emitted in BIN units (no sr here)

    def kernel(sig_ref, dft_hi_ref, dft_lo_ref, *refs):
        if with_features:
            (tri_ref, wp_hi_ref, wp_lo_ref, wm_ref, wv_hi_ref, wv_lo_ref,
             wl_hi_ref, wl_lo_ref,
             out_ref, aux_ref, feat_ref, sig_vmem, sem) = refs
        elif with_aux:
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

            if with_features:
                # feature epilogue: mel + chroma fold + descriptor moment
                # sums as four constant-matrix matmuls on the in-VMEM
                # magnitudes (FEAT_LANES / _MOMENT_LANES; precision tiers
                # documented at _feature_weight_mats), then the finished
                # descriptors as per-frame column math. The magnitude
                # tensor is never re-read from HBM for MFCC, chroma, or
                # the descriptor bundle.
                hp = jax.lax.Precision.HIGHEST
                f32 = jnp.float32
                vf = (mag > _FEAT_EPS).astype(jnp.bfloat16)  # 0/1: exact
                lm = jnp.log(jnp.maximum(mag, _FEAT_EPS))
                vlm = jnp.where(mag > _FEAT_EPS, lm, 0.0)
                p_hi2 = power.astype(jnp.bfloat16)
                p_lo2 = (power - p_hi2.astype(f32)).astype(jnp.bfloat16)
                l_hi = vlm.astype(jnp.bfloat16)
                l_lo = (vlm - l_hi.astype(f32)).astype(jnp.bfloat16)

                def dot(a, w):
                    return jnp.dot(a, w, preferred_element_type=f32)

                feat = (
                    dot(p_hi2, wp_hi_ref[:]) + dot(p_hi2, wp_lo_ref[:])
                    + dot(p_lo2, wp_hi_ref[:])
                    + jnp.dot(mag, wm_ref[:],
                              preferred_element_type=f32, precision=hp)
                    + dot(vf, wv_hi_ref[:]) + dot(vf, wv_lo_ref[:])
                    + dot(l_hi, wl_hi_ref[:]) + dot(l_hi, wl_lo_ref[:])
                    + dot(l_lo, wl_hi_ref[:])
                )

                # ---- finalization (per-frame column math; [tile]-sized
                # vectors, VPU-trivial — finishing here keeps XLA from
                # re-deriving these on [B, T, 1] relayout-bound slices)
                M = _MOMENT_LANES
                eps = _FEAT_EPS
                p_sum2 = feat[:, M["p_sum"]]
                m_sum = feat[:, M["m_sum"]]
                fm = feat[:, M["fm_sum"]]
                f2m = feat[:, M["f2m_sum"]]
                count_f = feat[:, M["count_f"]]
                n_s = feat[:, M["n_s"]]
                sum_x = feat[:, M["sum_x"]]
                sum_xx = feat[:, M["sum_xx"]]
                log_sum2 = feat[:, M["log_sum"]]
                sum_y = feat[:, M["sum_y"]]
                sum_xy = feat[:, M["sum_xy"]]
                m_max = jnp.max(mag, axis=1)

                centroid = jnp.where(m_sum > 0, fm / jnp.maximum(m_sum, eps), 0.0)
                bw_num = jnp.maximum(f2m - fm * centroid, 0.0)
                bandwidth = jnp.where(
                    m_sum > 0, jnp.sqrt(bw_num / jnp.maximum(m_sum, eps)), 0.0
                )
                arith = m_sum / float(f_bins)
                geo = jnp.exp(log_sum2 / jnp.maximum(count_f, 1.0))
                flatness = jnp.where(
                    (count_f > 0) & (arith > eps),
                    geo / jnp.maximum(arith, eps), 0.0,
                )
                rms_s = jnp.sqrt(p_sum2 / float(f_bins))
                crest = jnp.where(
                    rms_s > 0, m_max / jnp.maximum(rms_s, eps), 0.0
                )
                den_s = n_s * sum_xx - sum_x * sum_x
                slope = jnp.where(
                    (n_s >= 2) & (jnp.abs(den_s) > eps),
                    (n_s * sum_xy - sum_x * sum_y)
                    / jnp.where(jnp.abs(den_s) > eps, den_s, 1.0),
                    0.0,
                )
                energy12 = feat[:, 26:38]
                ctotal = jnp.sum(energy12, axis=1, keepdims=True)
                chroma_n = jnp.where(
                    ctotal > eps, energy12 / jnp.maximum(ctotal, eps), energy12
                )

                feat_ref[0, :, :] = feat
                feat_ref[0, :, 26:38] = chroma_n
                feat_ref[0, :, FEAT_LANES["spectral_centroid"]] = centroid
                feat_ref[0, :, FEAT_LANES["spectral_bandwidth"]] = bandwidth
                feat_ref[0, :, FEAT_LANES["spectral_flatness"]] = flatness
                feat_ref[0, :, FEAT_LANES["spectral_crest"]] = crest
                feat_ref[0, :, FEAT_LANES["spectral_slope"]] = slope

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
    if with_features:
        out_specs.append(
            pl.BlockSpec(
                (1, tile, _N_FEAT), lambda bi, ti: (bi, ti, 0),
                memory_space=pltpu.VMEM,
            )
        )
        out_shapes.append(
            jax.ShapeDtypeStruct((b, out_padded_t, _N_FEAT), jnp.float32)
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
    if with_features:
        for w in w_feat:
            in_specs.append(
                pl.BlockSpec(
                    (f_bins, _N_FEAT), lambda bi, ti: (0, 0),
                    memory_space=pltpu.VMEM,
                )
            )
            operands.append(w)
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
        mag = out[0]
        aux = out[1]
        aux_dict = {
            "rms": aux[:, :t, 0],
            "zero_crossings": aux[:, :t, 1],
            "rolloff_bin": aux[:, :t, 2],
            "low_energy_ratio": aux[:, :t, 3],
            "high_energy_ratio": aux[:, :t, 4],
        }
        if with_features:
            return mag[:, :t, :], aux_dict, out[2][:, :t, :]
        return mag[:, :t, :], aux_dict
    return out[0][:, :t, :]


def pallas_stft_available(
    window_size: int, hop_size: int, with_features: bool = False
) -> bool:
    """Whether the fused kernel supports this geometry on this backend.

    with_features: charge the optional feature epilogue's VMEM (four
    [F, _N_FEAT] weight mats + temporaries, ~1.6 MB at F=513) only when
    the caller will actually request it (ADVICE r4 #3) — the default
    kernel must not lose the fast path to an epilogue it never runs."""
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
    # the aux epilogue's tri matrix (bf16) and power/cumsum tiles +
    # the feature epilogue's four [F, 64] weights and vf/lm temporaries
    f_bins = window_size // 2 + 1
    vmem = (
        4 * (
            window_size * 2 * f_bins
            + _FRAME_TILE * window_size
            + _FRAME_TILE * hop_size + window_size
            + _FRAME_TILE * f_bins
        )
        + 2 * f_bins * f_bins
        + 4 * _FRAME_TILE * f_bins * 3
    )
    if with_features:
        vmem += 4 * (4 * f_bins * _N_FEAT + 2 * _FRAME_TILE * f_bins)
    return vmem < 12 * 1024 * 1024
