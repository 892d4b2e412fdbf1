"""Sort-free spectral-contrast band selection — a MEASURED NEGATIVE
RESULT, kept as the evidence that the sort pipeline is at its floor.

On-chip (v5e, B=128 x 30 s, median-of-7): this kernel 127.6 ms vs the
XLA sort pipeline's 76.5 ms isolated (~46 ms in-program). Why it loses
(docs/PERF.md round 5): the per-iteration count matmuls use 6-12 of 128
MXU output lanes (~90% padded waste, ~20 ms over the 22-bit search) and
the compare/select/FMA passes floor at ~8 VPU ops/element/iteration;
int8 count dots and radix-16 rounds would each roughly halve one term
and still land ~60 ms > 46 ms. NOT wired into spectral_contrast;
tests/test_pallas_contrast.py keeps the artifact honest.

Reference behavior: algorithms/spectral/spectral_contrast.go:71-137 —
per log-spaced band, sort the power spectrum, mean of the top 20% =
peak, mean of the bottom 20% = valley, contrast = 10*log10(peak/valley).

The XLA formulation (ops/spectral.spectral_contrast) is a sort
pipeline: one [B, T, F] -> [B, F, T] transpose, seven sublane sorts,
layout copies bracketing every sort, candidate extraction, and the
split-max merge — ~45 ms of the 200 ms fingerprint step at B=128 x 30 s
(round-4 device trace, docs/PERF.md), and four alternative XLA
formulations measured within noise of it (tools/micro_contrast.py):
that pipeline is at XLA's floor. This kernel computes the SAME means a
different way, chosen for the TPU's strengths:

  Only the MEANS of the top-k / bottom-k are consumed, and mean-of-top-k
  needs only the K-TH LARGEST VALUE t: sum(top-k) = sum(x where x > t)
  + (k - #{x > t}) * t. For non-negative f32 (power), the int32 bit
  pattern is order-isomorphic to the value, so t can be found by
  MSB-to-LSB bit reconstruction: t' = t | bit; keep the bit iff
  #{x >= t'} >= k. Each trial needs only per-band COUNTS, and a count
  over arbitrary (non-8-aligned) band slices is one matmul with a
  static 0/1 indicator matrix [F, NB] — exact on the MXU (0/1 inputs
  are exact in bf16; accumulation is f32). The per-(frame, band)
  threshold rides back to the lanes through the transposed indicator
  [NB, F] (0/1 again), so the whole search is compare/select/FMA on
  the natural [T_tile, F] layout: NO transpose, NO sort, NO layout
  copies, one HBM read of the magnitude.

  Keys are quantized to the top 22 bits (vq = bits >> 9, exact in f32):
  the search finds the exact k-th QUANTIZED key, strict-above sums are
  exact, and the remaining k - #above slots are filled with the mean of
  the tie bucket (keys == t). Tied keys span < 2^-14 relative in value,
  so the mean error is <= 2^-14 relative — an order under the 1e-4
  parity budget. Value sums split hi/lo in bf16 and take two DEFAULT
  dots (Mosaic cannot lower HIGH precision; the indicator operand is
  exact), the CLAUDE.md-documented pattern for constant-operand matmuls
  feeding log-domain math.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_FRAME_TILE = 256  # frames per grid step (sublanes; multiple of 8)
_KEY_BITS = 22     # quantized key width: bits >> (31 - 22 + ... ) = >> 9
_KEY_SHIFT = 9     # f32 has 31 magnitude bits; keep the top 22


@functools.lru_cache(maxsize=16)
def _band_constants(
    edges: Tuple[int, ...], num_bins: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Static (indicator [F, NB], indicator^T [NB, F], k [1, NB])."""
    nb = len(edges) - 1
    m = np.zeros((num_bins, nb), np.float32)
    k = np.zeros((1, nb), np.float32)
    for b in range(nb):
        lo, hi = edges[b], min(edges[b + 1], num_bins)
        if lo >= hi:
            k[0, b] = 1.0  # degenerate band; kernel emits zeros there
            continue
        m[lo:hi, b] = 1.0
        k[0, b] = max(int(0.2 * (hi - lo)), 1)
    return m, np.ascontiguousarray(m.T), k


def _contrast_kernel(mag_ref, m_ref, mt_ref, k_ref, peak_ref, valley_ref):
    x = mag_ref[0]  # [Tt, F] f32 magnitude
    p = x * x
    vi = pltpu.bitcast(p, jnp.int32)  # p >= 0: bit pattern ~ order
    vq = (vi >> _KEY_SHIFT).astype(jnp.float32)  # ints < 2^22: exact f32
    maxq = jnp.float32(1 << _KEY_BITS)
    uq = maxq - vq  # reversed order for the bottom-k search

    m = m_ref[:]    # [F, NB] 0/1
    mt = mt_ref[:]  # [NB, F] 0/1
    kv = k_ref[:]   # [1, NB]

    def dot(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32)

    def bit_step(_, carry):
        t_top, t_bot, c = carry
        sel = jnp.where(vq >= t_top + c, 1.0, 0.0)
        keep = jnp.where(dot(sel, m) >= kv, 1.0, 0.0)  # [Tt, NB]
        t_top = t_top + dot(keep, mt) * c
        selb = jnp.where(uq >= t_bot + c, 1.0, 0.0)
        keepb = jnp.where(dot(selb, m) >= kv, 1.0, 0.0)
        t_bot = t_bot + dot(keepb, mt) * c
        return t_top, t_bot, c * 0.5

    zeros = jnp.zeros_like(vq)
    t_top, t_bot, _ = jax.lax.fori_loop(
        0,
        _KEY_BITS,
        bit_step,
        (zeros, zeros, jnp.float32(1 << (_KEY_BITS - 1))),
    )

    def band_mean(keys, thresh):
        """Mean of the k largest `keys` per band, valued in p: exact
        strict-above sum + tie-bucket-mean fill for the rest."""
        sel = jnp.where(keys > thresh, 1.0, 0.0)
        tie = jnp.where(keys == thresh, 1.0, 0.0)

        def value_sum(w):
            pw = p * w
            hi = pw.astype(jnp.bfloat16).astype(jnp.float32)
            return dot(hi, m) + dot(pw - hi, m)

        cnt = dot(sel, m)                      # < k by construction
        s = value_sum(sel)
        cnt_tie = dot(tie, m)                  # >= k - cnt
        s_tie = value_sum(tie)
        fill = (kv - cnt) * (s_tie / jnp.maximum(cnt_tie, 1.0))
        return (s + fill) / kv

    peak_ref[0] = band_mean(vq, t_top)
    valley_ref[0] = band_mean(uq, t_bot)


def band_select_means_pallas(
    magnitude: jnp.ndarray, edges: Tuple[int, ...]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(peak, valley) [..., T, NB]: per-band means of the top/bottom 20%
    of power, equal (to ~2^-14 relative) to the sort formulation."""
    squeeze = magnitude.ndim == 2
    if squeeze:
        magnitude = magnitude[None]
    b, t, f = magnitude.shape
    nb = len(edges) - 1
    m, mt, k = _band_constants(tuple(edges), f)
    tiles = -(-t // _FRAME_TILE)

    grid_spec = pl.GridSpec(
        grid=(b, tiles),
        in_specs=[
            pl.BlockSpec(
                (1, _FRAME_TILE, f), lambda i, j: (i, j, 0)
            ),
            pl.BlockSpec((f, nb), lambda i, j: (0, 0)),
            pl.BlockSpec((nb, f), lambda i, j: (0, 0)),
            pl.BlockSpec((1, nb), lambda i, j: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, _FRAME_TILE, nb), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, _FRAME_TILE, nb), lambda i, j: (i, j, 0)),
        ],
    )
    out_shape = [
        jax.ShapeDtypeStruct((b, tiles * _FRAME_TILE, nb), jnp.float32)
        for _ in range(2)
    ]
    peak, valley = pl.pallas_call(
        _contrast_kernel, grid_spec=grid_spec, out_shape=out_shape
    )(magnitude, jnp.asarray(m), jnp.asarray(mt), jnp.asarray(k))
    peak, valley = peak[:, :t], valley[:, :t]
    # degenerate (lo >= hi) bands: the indicator column is all-zero, so
    # both means come out 0 — matching the XLA path's explicit zeros
    if squeeze:
        return peak[0], valley[0]
    return peak, valley


def pallas_contrast_available(num_bins: int, num_bands: int) -> bool:
    """Geometry/backend gate, same contract as pallas_stft_available."""
    try:
        if jax.default_backend() not in ("tpu",):
            return False
    except Exception:
        return False
    # VMEM: magnitude tile + ~8 same-shape temporaries through the
    # search loop, plus the two indicator mats
    vmem = 4 * _FRAME_TILE * num_bins * 10 + 8 * num_bins * num_bands
    return vmem < 12 * 1024 * 1024
