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


def _rows_blk(band: int, words_row: int = 0) -> int:
    """Code rows per SMEM walk block, shrunk for wide bands so the
    double-buffered block fits v5e's 1 MB SMEM (multiple of 8 rows)."""
    if not words_row:
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

    ii = jnp.arange(n + 1)[None, :, None]
    kk = jnp.arange(w)[None, None, :]
    jj = ii - band + kk

    # ONE padded copy; the three neighbors are then slice views XLA
    # fuses straight into the comparisons (the old concat-per-neighbor
    # formulation materialized three full-size f32 temps plus an s32
    # code tensor — ~13 GB of HLO temps at the 60 s lag budget x8 pairs)
    cb_pad = jnp.pad(
        cost_band, ((0, 0), (1, 0), (1, 1)), constant_values=inf
    )                                                  # [B, n+2, w+2]
    up = cb_pad[:, :-1, 2:]                            # (i-1, j):  k+1
    left = cb_pad[:, 1:, :-2]                          # (i, j-1):  k-1
    diag = cb_pad[:, :-1, 1:-1]                        # (i-1, j-1): k
    pick_left = left < up
    pick_diag = (diag < up) & (diag < left)
    code = jnp.where(pick_diag, 2, jnp.where(pick_left, 1, 0)).astype(jnp.int8)
    code = jnp.where(ii == 0, jnp.int8(1), code)  # border: only j decreases
    code = jnp.where(jj == 0, jnp.int8(0), code)  # border: only i decreases

    # pack 16 codes per int32 word (int8 until the fused shift-reduce)
    words = (w + 15) // 16
    pad = words * 16 - w
    code = jnp.pad(code, ((0, 0), (0, 0), (0, pad)))
    code = code.reshape(code.shape[0], n + 1, words, 16)
    shifts = (2 * jnp.arange(16, dtype=jnp.int32))[None, None, None, :]
    return jnp.sum(code.astype(jnp.int32) << shifts, axis=-1).astype(jnp.int32)


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


def _walk_moves(codes_words, band, n, m, interpret):
    """SMEM walk over packed code words [B, n+1, words] ->
    (moves [B, n_words], length [B])."""
    b, rows, n_words_row = codes_words.shape
    rows_blk = _rows_blk(band, n_words_row)
    n_seg = (n + 1 + rows_blk - 1) // rows_blk
    codes = jnp.pad(
        codes_words, ((0, 0), (0, n_seg * rows_blk - rows), (0, 0))
    )
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
    return moves[:, 0, :], length[:, 0, 0]


def _reconstruct(moves, length, band, n, m, cost_at):
    """Integrate the packed move sequence into path indices and
    per-step local costs. `cost_at(i_seq, k_seq)` gathers cost band
    values (orientation-specific)."""
    max_len = n + m
    w = 2 * band + 1
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
    c_here = cost_at(i_seq, j_seq, k_seq)
    c_prev = cost_at(i_seq - 1, j_seq - 1, k_seq)
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


@partial(jax.jit, static_argnames=("band", "n", "m", "interpret"))
def backtrack_banded_pallas_batch(
    cost_band: jnp.ndarray, band: int, n: int, m: int,
    interpret: bool = False,
):
    """Batched drop-in for vmap(dtw._backtrack_banded):
    [B, n+1, 2*band+1] -> (qs, rs, cs, length) with qs/rs/cs [B, n+m]
    (start -> end order, padded by repeating the first point)."""
    b = cost_band.shape[0]
    codes = _move_codes(cost_band, band, n, m)
    moves, length = _walk_moves(codes, band, n, m, interpret)
    bb = jnp.arange(b)[:, None]

    def cost_at(i_seq, j_seq, k_seq):
        return cost_band[bb, jnp.clip(i_seq, 0, n), k_seq]

    return _reconstruct(moves, length, band, n, m, cost_at)


def _move_codes_rev(cost_rev: jnp.ndarray, band: int, n: int, m: int):
    """_move_codes on the pairs kernel's RAW reversed band (no row 0,
    lane p = band col lanes-1-p): [B, n_pad, lanes] -> [B, n, lanes]
    int8 codes for DP rows 1..n, still in reversed lane order."""
    b, n_pad, lanes = cost_rev.shape
    inf = jnp.float32(jnp.inf)
    # ONE padded copy; cb[:, 0] is the synthetic DP row 0 (cost 0 only
    # at j == 0, i.e. band col band -> lane lanes-1-band)
    cb = jnp.pad(
        cost_rev[:, :n, :], ((0, 0), (1, 0), (1, 1)), constant_values=inf
    )                                                  # [B, n+1, lanes+2]
    cb = cb.at[:, 0, 1 + (lanes - 1 - band)].set(0.0)
    up = cb[:, :-1, :-2]      # DP[i-1, k+1]  (lane p-1)
    left = cb[:, 1:, 2:]      # DP[i,   k-1]  (lane p+1)
    diag = cb[:, :-1, 1:-1]   # DP[i-1, k]    (lane p)
    pick_left = left < up
    pick_diag = (diag < up) & (diag < left)
    code = jnp.where(
        pick_diag, jnp.int8(2), jnp.where(pick_left, jnp.int8(1), jnp.int8(0))
    )
    # border: j == 0 -> only i decreases; j = (r+1) - band + (lanes-1-p)
    rr = jnp.arange(1, n + 1)[None, :, None]
    pp = jnp.arange(lanes)[None, None, :]
    jj = rr - band + (lanes - 1 - pp)
    return jnp.where(jj == 0, jnp.int8(0), code)


@partial(jax.jit, static_argnames=("band", "n", "m", "interpret"))
def backtrack_banded_pallas_rev(
    cost_rev: jnp.ndarray, band: int, n: int, m: int,
    interpret: bool = False,
):
    """Backtrack directly from the pairs fill kernel's RAW output
    (pallas_dtw.fill_banded_pallas_scan_pairs_raw): reversed lane order,
    no prepended row 0.

    Equivalent to `backtrack_banded_pallas_batch` on the un-reversed
    band — but skips the multi-GB un-reverse/slice/row0-concat passes
    (the move codes and the path-cost gathers read the reversed band
    in place; ~90 ms combined per 8 pairs at the 60 s lag budget,
    device trace)."""
    b, n_pad, lanes = cost_rev.shape
    w = 2 * band + 1
    codes_rev = _move_codes_rev(cost_rev, band, n, m)

    # pack int8 codes (reversed lanes) into natural-order int32 words:
    # natural k = lanes-1-p, so word g of the natural order is the
    # WITHIN-GROUP-FLIPPED group (n_groups-1-g) of the reversed order —
    # the within-group flip folds into the shift table, the group flip
    # is one cheap reverse on the small words axis.
    groups = lanes // 16
    cr = codes_rev.reshape(b, n, groups, 16)
    shifts = (2 * (15 - jnp.arange(16, dtype=jnp.int32)))[None, None, None, :]
    words_rev = jnp.sum(cr.astype(jnp.int32) << shifts, axis=-1)
    words_nat = words_rev[:, :, ::-1]                  # [B, n, groups]
    # DP row 0: only j decreases (code 1 in all 16 slots per word)
    row0 = jnp.full((b, 1, groups), 0x55555555, jnp.int32)
    codes_words = jnp.concatenate([row0, words_nat], axis=1)

    moves, length = _walk_moves(codes_words, band, n, m, interpret)
    bb = jnp.arange(b)[:, None]
    big = jnp.float32(3.4e38 / 4)

    def cost_at(i_seq, j_seq, k_seq):
        # cost_rev row r holds DP row r+1 at lane lanes-1-k; DP row 0 is
        # synthetic: cost[0, j] = 0 iff j == 0 (k == band) else BIG
        p_seq = (lanes - 1) - k_seq
        vals = cost_rev[bb, jnp.clip(i_seq - 1, 0, n_pad - 1), p_seq]
        row0_val = jnp.where(j_seq == 0, 0.0, big)
        return jnp.where(i_seq >= 1, vals, row0_val)

    return _reconstruct(moves, length, band, n, m, cost_at)


def backtrack_banded_pallas(
    cost_band: jnp.ndarray, band: int, n: int, m: int,
    interpret: bool = False,
):
    """Single-pair wrapper matching dtw._backtrack_banded's signature."""
    qs, rs, cs, length = backtrack_banded_pallas_batch(
        cost_band[None], band, n, m, interpret=interpret
    )
    return qs[0], rs[0], cs[0], length[0]
