"""Pallas TPU kernel for the banded DTW backtrack.

Reference parity: algorithms/stats/dtw.go:165-217 (greedy backtrack,
strict-less preference vertical < horizontal < diagonal, border
handling). Semantically identical to `dtw._backtrack_banded`; exists
for speed: the XLA while_loop pays ~3 us of step overhead per path
cell, so a 60 s alignment (~20k cells) costs ~60 ms for microseconds
of actual work.

Split of labor:
1. XLA (vectorized): every band cell's greedy move is precomputed as a
   2-bit code (0 = up, 1 = left, 2 = diag) in one pass over the cost
   band, then packed 16 codes per int32 word.
2. Pallas kernel: a scalar while-loop walks the chain from (n, m) to
   (0, 0) reading codes from SMEM. The grid steps over row segments
   (highest first) so each segment's code rows fit in an SMEM block;
   the walker state (i, j, t) carries across segments in SMEM scratch.
   The move sequence is emitted packed (2 bits/step) into an SMEM
   output revisited by every segment.
3. XLA (vectorized): the move sequence is integrated (cumulative sums)
   back into path indices and per-step local costs.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROWS_BLK = 512    # code rows per grid step (SMEM block), narrow bands
_BLK_WORDS = 96 * 1024  # SMEM words per walk block: SMEM is 1 MB on
# v5e and blocks are double-buffered, so the block must stay under
# ~480 KB (measured: a 766 KB block fails with "would exceed memory
# (size=1048576) ... 2 buffering levels"); 96K words = 384 KB + the
# moves/state outputs leaves ~240 KB slack.


def _rows_blk(band: int) -> int:
    """Code rows per SMEM walk block, shrunk for wide bands so the
    double-buffered block fits v5e's 1 MB SMEM (multiple of 8 rows)."""
    words_row = (2 * band + 1 + 15) // 16
    rows = min(_ROWS_BLK, max(8, (_BLK_WORDS // max(words_row, 1)) & ~7))
    return rows


def pallas_backtrack_available(band: int = 64) -> bool:
    """TPU backend + a band whose packed move-code rows fit the SMEM
    walk blocks. Wide bands shrink the rows-per-block (see _rows_blk),
    so the ceiling tracks the split fill kernel's gate
    (pallas_dtw.pallas_dtw_scan_available) rather than the fused one."""
    try:
        if jax.default_backend() != "tpu":
            return False
    except Exception:
        return False
    lanes = max(128, ((2 * band + 1 + 127) // 128) * 128)
    return lanes <= 21504


@partial(jax.jit, static_argnames=("band", "n", "m"))
def _move_codes(cost_band: jnp.ndarray, band: int, n: int, m: int):
    """[B, n+1, w] cost band -> [B, n+1, ceil(w/16)] packed 2-bit moves.

    Exactly replicates _backtrack_banded's comparisons: neighbors read
    with +inf outside the band/borders, preference up < left < diag on
    strict less-than, and the border overrides (i==0 -> left,
    j==0 -> up)."""
    w = 2 * band + 1
    inf = jnp.float32(jnp.inf)
    bsz = cost_band.shape[0]

    ii = jnp.arange(n + 1)[None, :, None]
    kk = jnp.arange(w)[None, None, :]
    jj = ii - band + kk

    inf_row = jnp.full((bsz, 1, w), inf)
    inf_col = jnp.full((bsz, n + 1, 1), inf)
    row_above = jnp.concatenate([inf_row, cost_band[:, :-1, :]], axis=1)
    up = jnp.concatenate([row_above[:, :, 1:], inf_col], axis=2)  # (i-1, j)
    left = jnp.concatenate([inf_col, cost_band[:, :, :-1]], axis=2)  # (i, j-1)
    diag = row_above  # (i-1, j-1): same band column k
    # out-of-range j for the left/diag neighbors (j-1 < 0) only occurs
    # at j == 0 cells, which the border override below rewrites anyway.
    pick_left = left < up
    pick_diag = (diag < up) & (diag < left)
    code = jnp.where(pick_diag, 2, jnp.where(pick_left, 1, 0)).astype(jnp.int32)
    code = jnp.where(ii == 0, 1, code)   # border: only j decreases
    code = jnp.where(jj == 0, 0, code)   # border: only i decreases

    # pack 16 codes per int32 word
    words = (w + 15) // 16
    pad = words * 16 - w
    code = jnp.pad(code, ((0, 0), (0, 0), (0, pad)))
    code = code.reshape(code.shape[0], n + 1, words, 16)
    shifts = (2 * jnp.arange(16, dtype=jnp.int32))[None, None, None, :]
    return jnp.sum(code << shifts, axis=-1).astype(jnp.int32)


def _walk_kernel(band, n, m, n_words, rows_blk, codes_ref, moves_ref, len_ref,
                 state_ref):
    seg = pl.program_id(1)
    n_seg = pl.num_programs(1)

    @pl.when(seg == 0)
    def _init():
        state_ref[0] = n
        state_ref[1] = m
        state_ref[2] = 0

        def zero(t, _):
            moves_ref[0, 0, t] = 0
            return 0

        jax.lax.fori_loop(0, n_words, zero, 0)

    row_lo = (n_seg - 1 - seg) * rows_blk

    def cond(st):
        i, j, t = st
        return (i >= row_lo) & ((i > 0) | (j > 0))

    def body(st):
        i, j, t = st
        kk = j - i + band
        word = codes_ref[0, i - row_lo, kk >> 4]
        code = (word >> (2 * (kk & 15))) & 3
        wi = t >> 4
        moves_ref[0, 0, wi] = moves_ref[0, 0, wi] | (code << (2 * (t & 15)))
        di = jnp.where(code == 1, 0, 1)
        dj = jnp.where(code == 0, 0, 1)
        return i - di, j - dj, t + 1

    i, j, t = jax.lax.while_loop(
        cond, body, (state_ref[0], state_ref[1], state_ref[2])
    )
    state_ref[0] = i
    state_ref[1] = j
    state_ref[2] = t

    @pl.when(seg == n_seg - 1)
    def _fin():
        len_ref[0, 0, 0] = t


@partial(jax.jit, static_argnames=("band", "n", "m", "interpret"))
def backtrack_banded_pallas_batch(
    cost_band: jnp.ndarray, band: int, n: int, m: int,
    interpret: bool = False,
):
    """Batched drop-in for vmap(dtw._backtrack_banded):
    [B, n+1, 2*band+1] -> (qs, rs, cs, length) with qs/rs/cs [B, n+m]
    (start -> end order, padded by repeating the first point)."""
    w = 2 * band + 1
    b = cost_band.shape[0]
    codes = _move_codes(cost_band, band, n, m)
    n_words_row = codes.shape[-1]
    rows_blk = _rows_blk(band)
    n_seg = (n + 1 + rows_blk - 1) // rows_blk
    codes = jnp.pad(codes, ((0, 0), (0, n_seg * rows_blk - (n + 1)), (0, 0)))

    max_len = n + m
    n_words = (max_len + 15) // 16

    moves, length = pl.pallas_call(
        partial(_walk_kernel, band, n, m, n_words, rows_blk),
        grid=(b, n_seg),
        in_specs=[
            pl.BlockSpec(
                (1, rows_blk, n_words_row),
                lambda bi, si, n_seg=n_seg: (bi, n_seg - 1 - si, 0),
                memory_space=pltpu.SMEM,
            )
        ],
        out_specs=[
            pl.BlockSpec(
                (1, 1, n_words), lambda bi, si: (bi, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (1, 1, 1), lambda bi, si: (bi, 0, 0), memory_space=pltpu.SMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, n_words), jnp.int32),
            jax.ShapeDtypeStruct((b, 1, 1), jnp.int32),
        ],
        scratch_shapes=[pltpu.SMEM((3,), jnp.int32)],
        interpret=interpret,
    )(codes)
    moves = moves[:, 0, :]
    length = length[:, 0, 0]

    # ---- vectorized reconstruction (XLA) ----
    # unpack the move sequence: step t lives in word t>>4, bits 2*(t&15)
    tt = jnp.arange(max_len)
    code_seq = (moves[:, tt >> 4] >> (2 * (tt & 15))[None, :]) & 3
    di = jnp.where(code_seq == 1, 0, 1)
    dj = jnp.where(code_seq == 0, 0, 1)
    # cell at step t: (n, m) minus the moves already taken (exclusive sum)
    i_seq = n - (jnp.cumsum(di, axis=-1) - di)
    j_seq = m - (jnp.cumsum(dj, axis=-1) - dj)
    qs = (i_seq - 1).astype(jnp.int32)
    rs = (j_seq - 1).astype(jnp.int32)
    # local cost: cost(i,j) - cost(i-1,j-1); both share band column k
    k_seq = jnp.clip(j_seq - i_seq + band, 0, w - 1)
    bb = jnp.arange(b)[:, None]
    c_here = cost_band[bb, jnp.clip(i_seq, 0, n), k_seq]
    c_prev = cost_band[bb, jnp.clip(i_seq - 1, 0, n), k_seq]
    cs = jnp.where((i_seq > 0) & (j_seq > 0), c_here - c_prev, 0.0)
    # band-edge diagonal predecessors are sentinel-valued; clamp to 0
    # (same NOTE deviation as dtw._backtrack / _backtrack_banded)
    cs = jnp.where(jnp.abs(cs) < 1e30, cs, 0.0)

    # reverse the filled prefix into start -> end order (same contract
    # as dtw._backtrack_banded)
    lm = length[:, None]
    src = jnp.clip(lm - 1 - tt[None, :], 0, max_len - 1)
    valid = tt[None, :] < lm
    last = jnp.clip(lm - 1, 0, max_len - 1)
    qs_f = jnp.where(valid, jnp.take_along_axis(qs, src, 1),
                     jnp.take_along_axis(qs, last, 1))
    rs_f = jnp.where(valid, jnp.take_along_axis(rs, src, 1),
                     jnp.take_along_axis(rs, last, 1))
    cs_f = jnp.where(valid, jnp.take_along_axis(cs, src, 1), 0.0)
    return qs_f, rs_f, cs_f, length


def backtrack_banded_pallas(
    cost_band: jnp.ndarray, band: int, n: int, m: int,
    interpret: bool = False,
):
    """Single-pair wrapper matching dtw._backtrack_banded's signature."""
    qs, rs, cs, length = backtrack_banded_pallas_batch(
        cost_band[None], band, n, m, interpret=interpret
    )
    return qs[0], rs[0], cs[0], length[0]
