"""Fused Pallas TPU kernel for the banded DTW cost fill.

Reference parity: algorithms/stats/dtw.go:62-135 (symmetric2 fill with a
Sakoe-Chiba band). Numerically equivalent to `dtw._fill_banded` (the
lax.scan formulation); this kernel exists purely for speed: the scan
spends ~15 us of dispatch overhead per row, so a 60 s chroma alignment
(10k rows) costs ~150 ms even though the math is ~3M cells. Here the
whole DP runs inside one kernel and the carried row never leaves VMEM.

Per grid step (one 32-row chunk of the DP):
1. Local band distances on the MXU: sequences are pre-augmented so one
   matmul yields squared euclidean distances directly —
   QA = [-2q, |q|^2, 1], RA = [r, 1, |r|^2], QA @ RA^T =
   |q|^2 + |r|^2 - 2 q.r. The chunk needs reference rows
   [c*32, c*32 + W + 127]; they are fetched as 32-row tiles via offset
   BlockSpecs over the same array (overlapping windows).
2. Band diagonals l[r, k] = M[r, r + k] via one per-row strided rotate
   (pltpu.roll stride=1) + a static slice. Mosaic's strided rotate
   only turns toward higher lanes with per-row amounts <= vreg width,
   so the whole DP runs in REVERSED lane order (lane p holds band
   column k = lanes-1-p) and the reference tiles are fetched from a
   lane-reversed copy of RA; then the required rotate amounts are just
   r in [0, 31]. The output is un-reversed outside the kernel.
3. The DP recurrence, rows unrolled on-core: the band window lives in
   vector lanes (W = 2*band+1 padded to 128), and the horizontal
   min-plus scan D[k] = min(a[k], D[k-1] + l[k]) runs as a
   Hillis-Steele doubling scan over the (min, +) semiring
   (identity element (c, a) = (0, BIG)).

Layout: cost_band[i, k] = cost[i, i - band + k]. Memory is O(N * W),
never O(N * M).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = float(3.4e38) / 4  # finite 'inf', matches dtw._fill_banded

_CHUNK = 32  # DP rows per grid step (statically unrolled in-kernel)


def pallas_dtw_available(band: int = 64) -> bool:
    """The compiled kernel needs a real TPU backend (Mosaic) AND a band
    that fits VMEM: the fill's scoped allocation scales with the padded
    band width (~1.7 KB per lane; band 5168 -> 10368 lanes was measured
    to exceed the 16 MB scoped-vmem limit). Oversized bands — e.g. the
    hybrid policy's band >= max_lag with a 30 s lag budget at hop 256 —
    take the split fill (pallas_dtw_scan_available /
    fill_banded_pallas_scan_batch); only bands past its ~21.5k-lane
    gate fall to the lax fill."""
    try:
        if jax.default_backend() != "tpu":
            return False
    except Exception:
        return False
    lanes = max(128, ((2 * band + 1 + 127) // 128) * 128)
    return lanes <= 6144


def pallas_dtw_scan_available(band: int = 64) -> bool:
    """Gate for the split fill (XLA band distances + DP-only scan
    kernel, `fill_banded_pallas_scan_batch`): the scan kernel holds only
    the distance/cost tiles (~0.6 KB per lane: double-buffered in+out
    blocks + the carried row), so its band ceiling is ~3.4x the fused
    kernel's — production lag budgets (30 s -> band 5168 -> 10368
    lanes; 60 s -> 10336 -> 20736 lanes at hop 256,
    fingerprint/config/config.go:105) run in-kernel instead of falling
    to the lax scan fill."""
    try:
        if jax.default_backend() != "tpu":
            return False
    except Exception:
        return False
    lanes = max(128, ((2 * band + 1 + 127) // 128) * 128)
    return lanes <= 21504


@partial(jax.jit, static_argnames=("band", "n", "m", "lanes"))
def _banded_local_distances(
    query: jnp.ndarray, reference: jnp.ndarray, band: int, n: int, m: int,
    lanes: int,
) -> jnp.ndarray:
    """Band-windowed euclidean distances in banded layout, computed by
    XLA (not in-kernel): l_band[b, i, k] = ||q_i - r_{i-band+k}|| for DP
    row i+1, BIG outside the band/borders, padded to `lanes`.

    Rationale: the fused kernel's VMEM ceiling comes from its in-kernel
    matmul window tiles, and its MXU work pads the feature dim to 128
    lanes (10x waste for chroma d=12). XLA contracts d=12 without that
    padding (HIGHEST precision for parity with the fused kernel), and
    the band extraction is a pure pad+reshape+slice — the flat-stride
    trick: pad rows to width P, then reading the flat buffer with row
    stride P+1 walks one column to the right per row, which IS the band
    diagonal. No gather."""
    b = query.shape[0]
    q = query.astype(jnp.float32)
    r = reference.astype(jnp.float32)
    w = 2 * band + 1
    cross = jax.lax.dot_general(
        q, r, (((2,), (2,)), ((0,), (0,))),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )                                                  # [B, n, m]
    q_sq = jnp.sum(q * q, axis=-1)[:, :, None]
    r_sq = jnp.sum(r * r, axis=-1)[:, None, :]
    dense = jnp.sqrt(jnp.maximum(q_sq + r_sq - 2.0 * cross, 0.0))
    big = jnp.float32(_BIG)
    p_w = n + w                                        # >= n-1 + W columns
    dense = jnp.pad(
        dense, ((0, 0), (0, 0), (band, p_w - band - m)),
        constant_values=_BIG,
    )                                                  # col c = r index c-band
    flat = dense.reshape(b, n * p_w)
    flat = jnp.pad(flat, ((0, 0), (0, n)), constant_values=_BIG)
    l_band = flat[:, : n * (p_w + 1)].reshape(b, n, p_w + 1)[:, :, :w]
    l_band = jnp.minimum(l_band, big)
    return jnp.pad(
        l_band, ((0, 0), (0, 0), (0, lanes - w)), constant_values=_BIG
    )


def _scan_kernel(band, lanes, l_ref, out_ref, prev_ref):
    """DP-only banded fill chunk: natural lane order (lane p = band
    column k = p), local distances precomputed. Same recurrence and
    masking as `_fill_kernel` / dtw._fill_banded.

    Rows run in an in-kernel fori_loop (dynamic-sublane block access)
    rather than a Python unroll: measured bit-identical and equally
    fast on-chip, and compile drops ~6x (74.5 s -> 11.6 s at band 5168
    — the unrolled 32 rows x 15 scan rounds blow up the MLIR)."""
    chunk_idx = pl.program_id(1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, lanes), 1)
    big = jnp.float32(_BIG)

    @pl.when(chunk_idx == 0)
    def _init():
        prev_ref[...] = jnp.where(lane == band, 0.0, big)

    n_rounds = int(math.ceil(math.log2(lanes)))

    def row(r, prev):
        l = l_ref[0, pl.ds(r, 1), :]
        # up = cost[i-1, j] lives at band col k+1 = lane p+1
        up = jnp.where(
            lane == lanes - 1, big, pltpu.roll(prev, shift=lanes - 1, axis=1)
        )
        v = jnp.minimum(up, prev)  # prev itself is diag = cost[i-1, j-1]
        a = jnp.minimum(l + v, big)
        # inclusive min-plus scan D[k] = min(a[k], D[k-1] + l[k]);
        # predecessor k-s sits at lane p-s.
        acc_a, acc_c = a, jnp.minimum(l, big)
        for s_exp in range(n_rounds):
            s = 1 << s_exp
            sh_a = jnp.where(lane < s, big, pltpu.roll(acc_a, shift=s, axis=1))
            sh_c = jnp.where(lane < s, 0.0, pltpu.roll(acc_c, shift=s, axis=1))
            acc_a = jnp.minimum(sh_a + acc_c, acc_a)
            acc_c = sh_c + acc_c
        d = jnp.minimum(acc_a, big)
        out_ref[0, pl.ds(r, 1), :] = d
        return d

    prev_ref[...] = jax.lax.fori_loop(0, _CHUNK, row, prev_ref[...])


@partial(jax.jit, static_argnames=("band", "n", "m", "interpret"))
def fill_banded_pallas_scan_batch(
    query: jnp.ndarray, reference: jnp.ndarray, band: int, n: int, m: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Split banded fill for bands past the fused kernel's VMEM gate:
    XLA computes the band-local distances (efficient d-dim contraction +
    flat-stride band extraction), the Pallas kernel runs only the DP
    (min-plus row scans with the carried row in VMEM). Same output
    contract as `fill_banded_pallas_batch`."""
    w = 2 * band + 1
    lanes = max(128, ((w + 127) // 128) * 128)
    b = query.shape[0]
    n_pad = ((n + _CHUNK - 1) // _CHUNK) * _CHUNK
    l_band = _banded_local_distances(query, reference, band, n, m, lanes)
    l_band = jnp.pad(
        l_band, ((0, 0), (0, n_pad - n), (0, 0)), constant_values=_BIG
    )
    out = pl.pallas_call(
        partial(_scan_kernel, band, lanes),
        grid=(b, n_pad // _CHUNK),
        in_specs=[pl.BlockSpec((1, _CHUNK, lanes), lambda bi, ci: (bi, ci, 0))],
        out_specs=pl.BlockSpec((1, _CHUNK, lanes), lambda bi, ci: (bi, ci, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, lanes), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, lanes), jnp.float32)],
        interpret=interpret,
    )(l_band)
    lane = jnp.arange(w)
    row0 = jnp.where(lane == band, 0.0, jnp.float32(_BIG))
    row0 = jnp.broadcast_to(row0, (b, 1, w))
    return jnp.concatenate([row0, out[:, :n, :w]], axis=1)


def _scan_kernel_pairs(band, lanes, w_arr, pb, chunk, n, m, d_ref, out_ref,
                       prev_ref):
    """Pairs-on-sublanes DP chunk with IN-KERNEL band extraction.

    Why pairs-on-sublanes: the single-pair row op is a [1, lanes] vector
    pass — 1 of 8 sublanes per vreg — so the latency-bound row chain
    wastes 7/8 of the VPU. B independent pairs share the same row index,
    so stacking them on the sublane axis runs B DPs for (nearly) the
    wall-clock of one (VERDICT r3 item #4).

    Why in-kernel extraction: the XLA banded-layout conversion (the
    flat-stride trick) is a tile-relayout by construction and measured
    ~65 ms/pair at production bands — more than the whole DP. Here the
    kernel reads rows of the DENSE reversed squared distances
    ([pb, w_arr] per row) and extracts the band diagonal with ONE
    dynamic-shift pltpu.roll per row (amount depends only on the row
    index, shared by every pair); masking reconstructs the band borders
    exactly as _fill_kernel does. The banded distance tensor never
    exists in HBM.

    Orientation: reversing the REFERENCE rows (cheap: [m, d]) makes the
    extraction a positive rotate, at the price of running the DP in
    REVERSED lane order (lane p = band col k = lanes-1-p), exactly like
    _fill_kernel; the caller un-reverses the output."""
    chunk_idx = pl.program_id(0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (pb, lanes), 1)
    big = jnp.float32(_BIG)

    @pl.when(chunk_idx == 0)
    def _init():
        prev_ref[...] = jnp.where(lane == lanes - 1 - band, 0.0, big)

    n_rounds = int(math.ceil(math.log2(lanes)))
    kk = (lanes - 1) - lane                            # band column index

    def row(r, prev):
        t = chunk_idx * chunk + r                      # 0-based data row
        rowd = d_ref[:, pl.ds(r, 1), :][:, 0, :]       # [pb, w_arr]
        # l_rev[p] = dsq[t, (m + band - t - lanes) + p]  (see wrapper)
        a_shift = jnp.mod(t + lanes - (m + band), w_arr)
        rolled = pltpu.roll(rowd, shift=a_shift, axis=1)
        l = jnp.sqrt(jnp.maximum(rolled[:, :lanes], 0.0))
        # validity: DP row t+1, column j = t+1-band+kk must be in [1, m]
        j_col = t + 1 - band + kk
        valid = (j_col >= 1) & (j_col <= m) & (kk < 2 * band + 1) & (t < n)
        l = jnp.where(valid, jnp.minimum(l, big), big)

        # reversed-lane recurrence (as _fill_kernel): up = cost[i-1, j]
        # (band col k+1) sits one lane to the LEFT
        up = pltpu.roll(prev, shift=1, axis=1)
        up = jnp.where(lane == 0, big, up)
        v = jnp.minimum(up, prev)
        acc_a = jnp.minimum(l + v, big)
        acc_c = jnp.minimum(l, big)
        for s_exp in range(n_rounds):
            s = 1 << s_exp
            sh_a = jnp.where(
                lane >= lanes - s, big,
                pltpu.roll(acc_a, shift=lanes - s, axis=1),
            )
            sh_c = jnp.where(
                lane >= lanes - s, 0.0,
                pltpu.roll(acc_c, shift=lanes - s, axis=1),
            )
            acc_a = jnp.minimum(sh_a + acc_c, acc_a)
            acc_c = sh_c + acc_c
        d = jnp.minimum(acc_a, big)
        out_ref[:, pl.ds(r, 1), :] = d[:, None, :]
        return d

    prev_ref[...] = jax.lax.fori_loop(0, chunk, row, prev_ref[...])


def _pairs_chunk(b: int, lanes: int, w_arr: int) -> int:
    """Largest DP-row chunk whose in+out double-buffered blocks fit the
    scoped-VMEM budget (~12 MB of blocks + the carried row). Floor 8:
    Mosaic requires block second-minor dims divisible by 8 (callers'
    sub-batching keeps 8-row blocks within VMEM at every gated band).

    An in-kernel int8 move-code output was tried and rejected: i8
    single-row dynamic stores don't lower ("index in dimension 1 is a
    multiple of 8"), and a third f32/i32 block at production bands blows
    the VMEM budget at any useful pair count — the codes are instead
    computed by XLA from the REVERSED band (pallas_backtrack
    ._move_codes_rev), which still avoids every un-reverse pass."""
    for c in (32, 16):
        if 2 * c * b * (lanes + w_arr) * 4 <= 12 * 1024 * 1024:
            return c
    return 8


@partial(jax.jit, static_argnames=("band", "n", "m", "interpret"))
def _fill_pairs_raw(
    query: jnp.ndarray, reference: jnp.ndarray, band: int, n: int, m: int,
    interpret: bool = False,
):
    """Banded fill with the batch packed into sublanes AND the band
    extraction fused into the kernel: [B, n, d] x [B, m, d] ->
    cost_rev [B, n_pad, lanes] f32 in the kernel's reversed lane order
    (lane p = band col lanes-1-p) and WITHOUT the prepended row 0 — row
    r holds DP row r+1. `fill_banded_pallas_scan_pairs` un-reverses into
    the standard cost-band contract; the production path consumes the
    raw orientation directly (pallas_backtrack
    .backtrack_banded_pallas_rev).

    XLA's only job is the dense reversed squared-distance matrix
    dsq[b, t, c] = |q_t|^2 + |r_rev_c|^2 - 2 q_t.r_rev_c — one fused
    batched matmul epilogue, no banded-layout relayout passes. The
    kernel extracts band diagonals with per-row dynamic rotates (see
    _scan_kernel_pairs). Memory: dense [B, n_pad, w_arr] + the cost
    band; callers sub-batch pairs at the 60 s lag budget
    (dtw_align_batch)."""
    w = 2 * band + 1
    lanes = max(128, ((w + 127) // 128) * 128)
    m_pad = ((m + 127) // 128) * 128
    w_arr = max(lanes, m_pad) + 128
    b = query.shape[0]
    chunk = _pairs_chunk(b, lanes, w_arr)
    n_pad = ((n + chunk - 1) // chunk) * chunk

    q = query.astype(jnp.float32)
    r = reference.astype(jnp.float32)
    q_pad = jnp.pad(q, ((0, 0), (0, n_pad - n), (0, 0)))
    r_rev = r[:, ::-1, :]                              # [B, m, d] (small)
    r_rev = jnp.pad(r_rev, ((0, 0), (0, w_arr - m), (0, 0)))
    cross = jax.lax.dot_general(
        q_pad, r_rev, (((2,), (2,)), ((0,), (0,))),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )                                                  # [B, n_pad, w_arr]
    q_sq = jnp.sum(q_pad * q_pad, axis=-1)[:, :, None]
    r_sq = jnp.sum(r_rev * r_rev, axis=-1)[:, None, :]
    dsq = q_sq + r_sq - 2.0 * cross                    # garbage cols masked

    out = pl.pallas_call(
        partial(_scan_kernel_pairs, band, lanes, w_arr, b, chunk, n, m),
        grid=(n_pad // chunk,),
        in_specs=[pl.BlockSpec((b, chunk, w_arr), lambda ci: (0, ci, 0))],
        out_specs=pl.BlockSpec((b, chunk, lanes), lambda ci: (0, ci, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, lanes), jnp.float32),
        scratch_shapes=[pltpu.VMEM((b, lanes), jnp.float32)],
        interpret=interpret,
    )(dsq)
    return out


@partial(jax.jit, static_argnames=("band", "n", "m", "interpret"))
def fill_banded_pallas_scan_pairs(
    query: jnp.ndarray, reference: jnp.ndarray, band: int, n: int, m: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Natural-orientation wrapper over the fused pairs kernel: same
    output contract as `fill_banded_pallas_scan_batch` ([B, n+1, w]
    cost band, row 0 prepended, natural lane order). The production
    big-band path (batched_alignment.dtw_align_batch) stays in the
    kernel's reversed orientation end-to-end instead — the un-reverse
    of a multi-GB band costs ~23 ms/sub-batch on-chip."""
    w = 2 * band + 1
    b = query.shape[0]
    out = _fill_pairs_raw(query, reference, band, n, m, interpret)
    lane = jnp.arange(w)
    row0 = jnp.where(lane == band, 0.0, jnp.float32(_BIG))
    row0 = jnp.broadcast_to(row0, (b, 1, w))
    return jnp.concatenate(
        [row0, out[:, :n, ::-1][:, :, :w]], axis=1
    )


def _fill_kernel(band, lanes, n, m, q_ref, *refs):
    """Lane p stores band column k = lanes-1-p (reversed orientation)."""
    *r_tiles, out_ref, prev_ref = refs
    chunk_idx = pl.program_id(1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, lanes), 1)
    big = jnp.float32(_BIG)

    @pl.when(chunk_idx == 0)
    def _init():
        # row 0 of the banded storage: cost[0, j] = 0 at j == 0 (k == band)
        prev_ref[...] = jnp.where(lane == lanes - 1 - band, 0.0, big)

    # ---- local band distances for all CHUNK rows (one MXU matmul) ----
    # win_rev[c'] = reference_pad[chunk*32 + (W+127) - c']  (reversed)
    win_rev = jnp.concatenate([t[0] for t in r_tiles], axis=0)
    m_rev = jax.lax.dot_general(
        q_ref[0], win_rev, (((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )  # [CHUNK, lanes+128]: m_rev[r, c'] = |q_i - ref_pad[c*32+wl-1-c']|^2
    # rotate row r right by r, then drop the first 128 lanes:
    # l2[r, p] = m_rev[r, p+128-r] = |q_i - ref_pad[c*32 + r + k]|^2
    # with k = lanes-1-p — exactly the band diagonal, reversed.
    l2 = pltpu.roll(m_rev, shift=0, axis=1, stride=1, stride_axis=0)
    l2 = l2[:, 128:]
    l_all = jnp.sqrt(jnp.maximum(l2, 0.0))
    # validity: DP row i = c*32 + r + 1, column j = i - band + k must be
    # in [1, m]; lanes beyond the band width W are dead.
    row = chunk_idx * _CHUNK + jax.lax.broadcasted_iota(
        jnp.int32, (_CHUNK, lanes), 0
    )
    kk = (lanes - 1) - jax.lax.broadcasted_iota(jnp.int32, (_CHUNK, lanes), 1)
    j_col = row + 1 - band + kk
    valid = (j_col >= 1) & (j_col <= m) & (kk < 2 * band + 1)
    l_all = jnp.where(valid, l_all, big)

    # ---- DP rows, unrolled (reversed lanes: k-1 lives at p+1) ----
    prev = prev_ref[...]
    n_rounds = int(math.log2(lanes))
    for r in range(_CHUNK):
        l = l_all[r : r + 1, :]
        # up = cost[i-1, j] (band col k+1) sits one lane to the LEFT
        up = pltpu.roll(prev, shift=1, axis=1)
        up = jnp.where(lane == 0, big, up)
        v = jnp.minimum(up, prev)  # prev itself is diag = cost[i-1, j-1]
        a = jnp.minimum(l + v, big)
        # inclusive min-plus scan D[k] = min(a[k], D[k-1] + l[k]) runs
        # toward DECREASING p; predecessor k-s sits at p+s.
        acc_a, acc_c = a, jnp.minimum(l, big)
        for s_exp in range(n_rounds):
            s = 1 << s_exp
            sh_a = jnp.where(
                lane >= lanes - s, big, pltpu.roll(acc_a, shift=lanes - s, axis=1)
            )
            sh_c = jnp.where(
                lane >= lanes - s, 0.0, pltpu.roll(acc_c, shift=lanes - s, axis=1)
            )
            acc_a = jnp.minimum(sh_a + acc_c, acc_a)
            acc_c = sh_c + acc_c
        d = jnp.minimum(acc_a, big)
        out_ref[0, r, :] = d.reshape(lanes)
        prev = d
    prev_ref[...] = prev


@partial(jax.jit, static_argnames=("band", "n", "m", "interpret"))
def fill_banded_pallas_batch(
    query: jnp.ndarray, reference: jnp.ndarray, band: int, n: int, m: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Batched banded symmetric2 cost fill: [B, n, d] x [B, m, d] ->
    cost_band [B, n+1, 2*band+1]; cost_band[b, i, k] = cost[i, i-band+k].
    Drop-in replacement for vmap(dtw._fill_banded)."""
    w = 2 * band + 1
    lanes = max(128, ((w + 127) // 128) * 128)
    wl = lanes + 128                      # matmul window rows per chunk
    tiles = wl // _CHUNK
    b = query.shape[0]
    q = query.astype(jnp.float32)
    r = reference.astype(jnp.float32)
    d_feat = q.shape[-1]
    dpad = ((d_feat + 2 + 127) // 128) * 128
    n_pad = ((n + _CHUNK - 1) // _CHUNK) * _CHUNK

    # augmented operands: QA @ RA^T = |q|^2 + |r|^2 - 2 q.r
    q_sq = jnp.sum(q * q, axis=-1, keepdims=True)
    ones_q = jnp.ones_like(q_sq)
    qa = jnp.concatenate([-2.0 * q, q_sq, ones_q], axis=-1)
    qa = jnp.pad(qa, ((0, 0), (0, n_pad - n), (0, dpad - d_feat - 2)))

    # RA row t = ref_pad[t] = reference[t - band]; the kernel reads it
    # in reversed row order (see module docstring), so flip here (XLA).
    r_sq = jnp.sum(r * r, axis=-1, keepdims=True)
    ones_r = jnp.ones_like(r_sq)
    ra = jnp.concatenate([r, ones_r, r_sq], axis=-1)
    ref_rows = n_pad + wl
    ra = jnp.pad(
        ra, ((0, 0), (band, ref_rows - band - m), (0, dpad - d_feat - 2))
    )
    ra_rev = ra[:, ::-1, :]
    # chunk c needs ra rows [c*32, c*32+wl-1] reversed = ra_rev rows
    # starting at ref_rows - wl - c*32 -> block index n_pad/32 - c
    base = n_pad // _CHUNK
    ra_spec = lambda s: pl.BlockSpec(
        (1, _CHUNK, dpad), lambda bi, ci, s=s: (bi, base - ci + s, 0)
    )
    out = pl.pallas_call(
        partial(_fill_kernel, band, lanes, n, m),
        grid=(b, n_pad // _CHUNK),
        in_specs=[pl.BlockSpec((1, _CHUNK, dpad), lambda bi, ci: (bi, ci, 0))]
        + [ra_spec(s) for s in range(tiles)],
        out_specs=pl.BlockSpec((1, _CHUNK, lanes), lambda bi, ci: (bi, ci, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, lanes), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, lanes), jnp.float32)],
        interpret=interpret,
    )(qa, *([ra_rev] * tiles))

    lane = jnp.arange(w)
    row0 = jnp.where(lane == band, 0.0, jnp.float32(_BIG))
    row0 = jnp.broadcast_to(row0, (b, 1, w))
    return jnp.concatenate([row0, out[:, :n, ::-1][:, :, :w]], axis=1)


def fill_banded_pallas(
    query: jnp.ndarray, reference: jnp.ndarray, band: int, n: int, m: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Single-pair wrapper: [n, d] x [m, d] -> cost_band [n+1, 2*band+1]."""
    return fill_banded_pallas_batch(
        query[None], reference[None], band, n, m, interpret=interpret
    )[0]


# raw (reversed-orientation) fill for the production big-band path
fill_banded_pallas_scan_pairs_raw = _fill_pairs_raw
