"""Dynamic Time Warping as a TPU-friendly wavefront DP.

Reference parity: algorithms/stats/dtw.go —
  cost matrix with +inf borders and cost[0][0]=0 (:62-77); step patterns
  symmetric2 / asymmetric / symmetric1 (:138-162); optional Sakoe-Chiba
  band |i-j| > band -> cell skipped (stays +inf) (:115-119); greedy
  backtrack preferring vertical < horizontal < diagonal on strict
  less-than (:195-217); final distance normalized by path length
  (:88-92); quality metrics (:246-283); step-pattern auto-select
  (:286-311).

TPU formulation (SURVEY.md hard-part #1): the inner recurrence
  D[i][j] = min(A[j], D[i][j-1] + c[j]),
  A[j] = l[j] + f(D[i-1][j], D[i-1][j-1])
is a min-plus linear scan, solved per-row with jax.lax.associative_scan
(O(log M) depth, fully vectorized), with an outer lax.scan over query
rows. Local distances for vector sequences are precomputed as one
[N, M] pairwise-distance matrix (a matmul — MXU). Backtrack runs on
device in a fixed-bound while_loop producing a fixed-size path buffer
plus length.

Memory is O(N*M) for the cost matrix (float32): ~27 MB for 60 s of
chroma frames at hop 512 — fine in HBM. A band-only O(N*band) Pallas
variant is the planned optimization for very long sequences.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

# plain Python float, NOT jnp.float32(...): a module-level jnp constant
# materializes a device array at import, which initializes the XLA
# backend and breaks jax.distributed.initialize() in multi-host
# deployments (it must run before any backend init)
_INF = float("inf")


@dataclass
class DTWResult:
    """DTWResult (dtw.go:18-27) with a fixed-size path buffer.

    path_qidx/path_ridx are [N+M] int32; entries beyond path_length are
    padding (repeats of the first point). Path runs start -> end.
    """

    distance: jnp.ndarray          # normalized (cost / path length)
    raw_distance: jnp.ndarray      # cost[N][M]
    path_qidx: jnp.ndarray         # [N+M]
    path_ridx: jnp.ndarray         # [N+M]
    path_cost: jnp.ndarray         # [N+M] local cost along path
    path_length: jnp.ndarray       # scalar int32
    cost_matrix: jnp.ndarray       # [N+1, M+1] (includes padding borders)
    query_length: int
    ref_length: int
    step_pattern: str
    constraint: int


jax.tree_util.register_pytree_node(
    DTWResult,
    lambda r: (
        (
            r.distance, r.raw_distance, r.path_qidx, r.path_ridx,
            r.path_cost, r.path_length, r.cost_matrix,
        ),
        (r.query_length, r.ref_length, r.step_pattern, r.constraint),
    ),
    lambda aux, ch: DTWResult(*ch, *aux),
)


def pairwise_sq_euclidean(query: jnp.ndarray, reference: jnp.ndarray) -> jnp.ndarray:
    """[N, D] x [M, D] -> [N, M] squared distances via the |q|^2 + |r|^2
    - 2 q.r identity (MXU matmul)."""
    qn = jnp.sum(query * query, axis=-1, keepdims=True)
    rn = jnp.sum(reference * reference, axis=-1, keepdims=True)
    cross = jnp.matmul(
        query, reference.T, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    d2 = qn + rn.T - 2.0 * cross
    return jnp.maximum(d2, 0.0)


def local_distance_matrix(
    query: jnp.ndarray, reference: jnp.ndarray, metric: str = "euclidean"
) -> jnp.ndarray:
    """Local-cost matrix [N, M] for the DP fill (dtw.go uses the distance
    registry; euclidean is the DTW default, dtw.go:42)."""
    if query.ndim == 1:
        query = query[:, None]
    if reference.ndim == 1:
        reference = reference[:, None]
    if metric == "euclidean":
        return jnp.sqrt(pairwise_sq_euclidean(query, reference))
    if metric == "sqeuclidean":
        return pairwise_sq_euclidean(query, reference)
    if metric == "manhattan":
        return jnp.sum(
            jnp.abs(query[:, None, :] - reference[None, :, :]), axis=-1
        )
    if metric == "cosine":
        qn = jnp.linalg.norm(query, axis=-1, keepdims=True)
        rn = jnp.linalg.norm(reference, axis=-1, keepdims=True)
        sim = jnp.matmul(query, reference.T) / jnp.maximum(qn * rn.T, 1e-10)
        return 1.0 - sim
    raise ValueError(f"unknown metric {metric}")


def _minplus_row_scan(a: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    """Solve D[j] = min(A[j], D[j-1] + c[j]) for j = 0..M-1 with
    D[-1] = +inf, via associative min-plus scan.

    Elements are (decay, value): combine((c1,a1),(c2,a2)) =
    (c1+c2, min(a1+c2, a2)).
    """

    def combine(x, y):
        cx, ax = x
        cy, ay = y
        return cx + cy, jnp.minimum(ax + cy, ay)

    _, d = jax.lax.associative_scan(combine, (c, a), axis=-1)
    return d


@partial(jax.jit, static_argnames=("step_pattern", "band"))
def _fill_cost_matrix(
    local: jnp.ndarray, step_pattern: str, band: int
) -> jnp.ndarray:
    """Returns the padded cost matrix [(N+1), (M+1)] (dtw.go:105-135)."""
    n, m = local.shape
    big = jnp.float32(3.4e38) / 4  # finite 'inf': keeps min-plus sums finite

    # band mask: reference skips |i-j| > band for i,j in 1..N,1..M
    if band > 0:
        ii = jnp.arange(1, n + 1)[:, None]
        jj = jnp.arange(1, m + 1)[None, :]
        in_band = jnp.abs(ii - jj) <= band
        local = jnp.where(in_band, local, big)

    row0 = jnp.concatenate([jnp.zeros((1,), jnp.float32), jnp.full((m,), big)])

    extra = jnp.float32(1.0) if step_pattern == "symmetric1" else jnp.float32(0.0)

    def row_step(prev_row, l_row):
        # prev_row: [M+1] = cost[i-1][0..M]; l_row: [M] local costs of row i
        up = prev_row[1:]          # D[i-1][j],   j=1..M
        diag = prev_row[:-1]       # D[i-1][j-1], j=1..M
        if step_pattern == "symmetric2":
            v = jnp.minimum(jnp.minimum(up, diag), big)
        elif step_pattern == "asymmetric":
            # NOTE deviation from dtw.go:147-149: the reference's
            # "asymmetric" = min(vertical, horizontal) never reaches
            # cost[0][0] (no diagonal), so every cell is +Inf — dead code
            # (SURVEY.md quirk policy). We implement the textbook
            # Sakoe-Chiba asymmetric pattern instead: predecessors
            # (i-1,j), (i-1,j-1), (i-1,j-2) — query index always advances.
            diag2 = jnp.concatenate([jnp.full((1,), big), prev_row[:-2]])
            v = jnp.minimum(jnp.minimum(up, diag), diag2)
            a = jnp.minimum(l_row + v, big)
            new_row = jnp.concatenate([jnp.full((1,), big), a])
            return new_row, new_row
        elif step_pattern == "symmetric1":
            # min(up+1, diag); horizontal chain carries +1 (dtw.go:151-159)
            v = jnp.minimum(up + 1.0, diag)
        else:
            raise ValueError(f"unknown step pattern {step_pattern}")
        a = jnp.minimum(l_row + v, big)
        c = jnp.minimum(l_row + extra, big)
        d = _minplus_row_scan(a, c)
        d = jnp.minimum(d, big)
        new_row = jnp.concatenate([jnp.full((1,), big), d])
        return new_row, new_row

    _, rows = jax.lax.scan(row_step, row0, local, unroll=8)
    cost = jnp.concatenate([row0[None, :], rows], axis=0)
    return cost


@partial(jax.jit, static_argnames=("n", "m"))
def _backtrack(cost: jnp.ndarray, n: int, m: int):
    """Greedy backtrack (dtw.go:165-217): from (N, M) step to the strict
    minimum of [vertical (i-1,j), horizontal (i,j-1), diagonal (i-1,j-1)]
    — ties break toward vertical, matching the Go loop order. Emits the
    path end -> start; we reverse into start -> end order."""
    max_len = n + m

    def cond(state):
        i, j, k, *_ = state
        return (i > 0) | (j > 0)

    def body(state):
        i, j, k, qs, rs, cs = state
        local_cost = jnp.where(
            (i > 0) & (j > 0),
            cost[i, j] - cost[i - 1, j - 1],
            0.0,
        )
        # NOTE deviation: with a band constraint the diagonal predecessor
        # can be an unfilled (+inf / big-sentinel) cell, making the
        # "local cost" meaningless (in Go it would be -Inf, silently
        # neutralizing cost-consistency via its mean<=1e-10 branch, a
        # case the unbanded upstream default never reaches). Clamp such
        # points to 0 like the matrix border.
        local_cost = jnp.where(jnp.abs(local_cost) < 1e30, local_cost, 0.0)
        qs = qs.at[k].set(i - 1)
        rs = rs.at[k].set(j - 1)
        cs = cs.at[k].set(local_cost)

        up = jnp.where(i > 0, cost[i - 1, j], _INF)
        left = jnp.where(j > 0, cost[i, j - 1], _INF)
        diag = jnp.where((i > 0) & (j > 0), cost[i - 1, j - 1], _INF)
        # strict-less preference order: up, left, diag
        pick_left = left < up
        pick_diag = (diag < up) & (diag < left)
        ni = jnp.where(pick_diag, i - 1, jnp.where(pick_left, i, i - 1))
        nj = jnp.where(pick_diag, j - 1, jnp.where(pick_left, j - 1, j))
        # border handling (dtw.go:196-201)
        ni = jnp.where(i == 0, 0, jnp.where(j == 0, i - 1, ni))
        nj = jnp.where(i == 0, j - 1, jnp.where(j == 0, 0, nj))
        return ni, nj, k + 1, qs, rs, cs

    init = (
        jnp.int32(n),
        jnp.int32(m),
        jnp.int32(0),
        jnp.zeros(max_len, jnp.int32),
        jnp.zeros(max_len, jnp.int32),
        jnp.zeros(max_len, jnp.float32),
    )
    _, _, length, qs, rs, cs = jax.lax.while_loop(cond, body, init)

    # reverse the filled prefix into start -> end order
    idx = jnp.arange(max_len)
    src = jnp.clip(length - 1 - idx, 0, max_len - 1)
    valid = idx < length
    qs_f = jnp.where(valid, qs[src], qs[jnp.clip(length - 1, 0, max_len - 1)])
    rs_f = jnp.where(valid, rs[src], rs[jnp.clip(length - 1, 0, max_len - 1)])
    cs_f = jnp.where(valid, cs[src], 0.0)
    return qs_f, rs_f, cs_f, length


def dtw_align(
    query: jnp.ndarray,
    reference: jnp.ndarray,
    step_pattern: str = "symmetric2",
    constraint_band: int = -1,
    metric: str = "euclidean",
) -> DTWResult:
    """DTWAlignment.Align (dtw.go:56-103) for [N, D] x [M, D] sequences."""
    if query.ndim == 1:
        query = query[:, None]
    if reference.ndim == 1:
        reference = reference[:, None]
    n, m = query.shape[0], reference.shape[0]
    local = local_distance_matrix(
        query.astype(jnp.float32), reference.astype(jnp.float32), metric
    )
    cost = _fill_cost_matrix(local, step_pattern, constraint_band)
    qs, rs, cs, length = _backtrack(cost, n, m)
    raw = cost[n, m]
    distance = raw / jnp.maximum(length, 1).astype(jnp.float32)
    return DTWResult(
        distance=distance,
        raw_distance=raw,
        path_qidx=qs,
        path_ridx=rs,
        path_cost=cs,
        path_length=length,
        cost_matrix=cost,
        query_length=n,
        ref_length=m,
        step_pattern=step_pattern,
        constraint=constraint_band,
    )


def dtw_align_vectors(
    query: jnp.ndarray,
    reference: jnp.ndarray,
    step_pattern: str = "symmetric2",
    constraint_band: int = -1,
) -> DTWResult:
    """1-D helper (dtw.go:220-236)."""
    return dtw_align(
        query[:, None], reference[:, None], step_pattern, constraint_band
    )


def alignment_quality(result: DTWResult) -> dict:
    """GetAlignmentQuality (dtw.go:246-283)."""
    length = result.path_length
    lf = jnp.maximum(length, 1).astype(jnp.float32)
    expected = float(max(result.query_length, result.ref_length))
    idx = jnp.arange(result.path_qidx.shape[0] - 1)
    valid_step = idx + 1 < length
    q_inc = result.path_qidx[1:] > result.path_qidx[:-1]
    r_inc = result.path_ridx[1:] > result.path_ridx[:-1]
    diag = jnp.sum((q_inc & r_inc & valid_step).astype(jnp.float32))
    valid_pts = jnp.arange(result.path_cost.shape[0]) < length
    total_cost = jnp.sum(jnp.where(valid_pts, result.path_cost, 0.0))
    return {
        "path_efficiency": expected / lf,
        "diagonal_ratio": diag / jnp.maximum(lf - 1.0, 1.0),
        "average_cost": total_cost / lf,
        "normalized_distance": result.distance,
    }


def optimize_step_pattern(query: jnp.ndarray, reference: jnp.ndarray) -> str:
    """OptimizeStepPattern (dtw.go:286-311): try all three, pick the
    lowest normalized distance."""
    best, best_d = "symmetric2", float("inf")
    for pattern in ("symmetric2", "asymmetric", "symmetric1"):
        d = float(dtw_align(query, reference, step_pattern=pattern).distance)
        if d < best_d:
            best, best_d = pattern, d
    return best


# ---------------------------------------------------------------------
# Banded DTW with O(T * band) memory — the long-sequence path
# ---------------------------------------------------------------------

@partial(jax.jit, static_argnames=("band", "n", "m"))
def _fill_banded(query: jnp.ndarray, reference: jnp.ndarray, band: int,
                 n: int, m: int):
    """Sakoe-Chiba-banded fill storing only the band window per row.

    Returns cost_band [(n+1), W] with W = 2*band+1, where
    cost_band[i, k] = cost[i, i - band + k] (out-of-range -> big).
    Local distances are computed on the fly from a dynamic slice of the
    reference — the full [N, M] matrices never exist. Memory is
    O(n * band) instead of O(n * m): a 60 s / hop-256 alignment fits in
    ~4 MB instead of ~430 MB.
    """
    w = 2 * band + 1
    big = jnp.float32(3.4e38) / 4
    d_feat = query.shape[-1]

    # pad reference rows so dynamic_slice windows never clip:
    # ref_pad[t] = reference[t - (band+1)] for valid t. The slice start
    # runs up to n, so the tail pad must absorb n - m extra rows when
    # the query is longer (otherwise dynamic_slice clamps the start and
    # silently shifts the window for rows i > m + 1).
    pad_lo = band + 1
    pad_hi = band + 1 + max(0, n - m)
    ref_pad = jnp.pad(reference, ((pad_lo, pad_hi), (0, 0)))
    ref_sq = jnp.sum(ref_pad * ref_pad, axis=-1)

    # row 0: cost[0, j]: j=0 -> 0 else big. Window of row 0 = [-band, band]
    k_idx = jnp.arange(w)
    row0 = jnp.where(k_idx == band, 0.0, big)  # j = 0 - band + k == 0 at k=band

    def row_step(prev_band, i):
        # window columns for row i: j = i - band + k, k = 0..w-1
        j_cols = i - band + k_idx
        valid = (j_cols >= 1) & (j_cols <= m)

        # local distances l[k] = ||q[i-1] - r[j-1]|| for the window
        q_i = query[i - 1]
        q_sq = jnp.sum(q_i * q_i)
        # r rows j-1 for j in window -> ref_pad index (j-1) + pad_lo
        start = i - band - 1 + pad_lo
        r_win = jax.lax.dynamic_slice(ref_pad, (start, 0), (w, d_feat))
        r_win_sq = jax.lax.dynamic_slice(ref_sq, (start,), (w,))
        cross = jnp.matmul(r_win, q_i, preferred_element_type=jnp.float32)
        l = jnp.sqrt(jnp.maximum(q_sq + r_win_sq - 2.0 * cross, 0.0))
        l = jnp.where(valid, l, big)

        # prev row window is [i-1-band, i-1+band]; current j maps to
        # prev k' = k + 1 (same j) and k (j-1):
        up = jnp.concatenate([prev_band[1:], jnp.full((1,), big)])   # cost[i-1, j]
        diag = prev_band                                              # cost[i-1, j-1]
        v = jnp.minimum(up, diag)
        a = jnp.minimum(l + v, big)
        c = jnp.minimum(l, big)
        d = jnp.minimum(_minplus_row_scan(a, c), big)
        d = jnp.where(valid, d, big)
        return d, d

    _, rows = jax.lax.scan(row_step, row0, jnp.arange(1, n + 1), unroll=8)
    cost_band = jnp.concatenate([row0[None, :], rows], axis=0)
    return cost_band


@partial(jax.jit, static_argnames=("band", "n", "m"))
def _backtrack_banded(cost_band: jnp.ndarray, band: int, n: int, m: int):
    """Backtrack on the banded cost storage (same preference order as
    the dense path: vertical, horizontal, diagonal on strict less)."""
    w = 2 * band + 1
    big = jnp.float32(3.4e38) / 8
    max_len = n + m

    def get(i, j):
        k = j - i + band
        ok = (i >= 0) & (j >= 0) & (k >= 0) & (k < w)
        val = cost_band[jnp.clip(i, 0, n), jnp.clip(k, 0, w - 1)]
        return jnp.where(ok, val, jnp.inf)

    def cond(state):
        i, j, *_ = state
        return (i > 0) | (j > 0)

    def body(state):
        i, j, k, qs, rs, cs = state
        local = jnp.where(
            (i > 0) & (j > 0), get(i, j) - get(i - 1, j - 1), 0.0
        )
        # band-edge diagonal predecessors are sentinel-valued; clamp to 0
        # (see the matching NOTE deviation in _backtrack)
        local = jnp.where(jnp.abs(local) < 1e30, local, 0.0)
        qs = qs.at[k].set(i - 1)
        rs = rs.at[k].set(j - 1)
        cs = cs.at[k].set(local)
        up = jnp.where(i > 0, get(i - 1, j), jnp.inf)
        left = jnp.where(j > 0, get(i, j - 1), jnp.inf)
        diag = jnp.where((i > 0) & (j > 0), get(i - 1, j - 1), jnp.inf)
        pick_left = left < up
        pick_diag = (diag < up) & (diag < left)
        ni = jnp.where(pick_diag, i - 1, jnp.where(pick_left, i, i - 1))
        nj = jnp.where(pick_diag, j - 1, jnp.where(pick_left, j - 1, j))
        ni = jnp.where(i == 0, 0, jnp.where(j == 0, i - 1, ni))
        nj = jnp.where(i == 0, j - 1, jnp.where(j == 0, 0, nj))
        return ni, nj, k + 1, qs, rs, cs

    init = (
        jnp.int32(n), jnp.int32(m), jnp.int32(0),
        jnp.zeros(max_len, jnp.int32),
        jnp.zeros(max_len, jnp.int32),
        jnp.zeros(max_len, jnp.float32),
    )
    _, _, length, qs, rs, cs = jax.lax.while_loop(cond, body, init)
    idx = jnp.arange(max_len)
    src = jnp.clip(length - 1 - idx, 0, max_len - 1)
    valid = idx < length
    qs_f = jnp.where(valid, qs[src], qs[jnp.clip(length - 1, 0, max_len - 1)])
    rs_f = jnp.where(valid, rs[src], rs[jnp.clip(length - 1, 0, max_len - 1)])
    cs_f = jnp.where(valid, cs[src], 0.0)
    return qs_f, rs_f, cs_f, length


@partial(jax.jit, static_argnames=("band", "n", "m"))
def _banded_align_device(query, reference, band: int, n: int, m: int):
    """Whole banded alignment (fill + backtrack + scoring) as ONE jitted
    program so a single dispatch reaches the device. Picks the Pallas
    kernels (ops/stats/pallas_dtw.py, pallas_backtrack.py) at trace
    time when a TPU backend is present, lax formulations otherwise."""
    from sonido_sonar_tpu.ops.stats.pallas_backtrack import (
        backtrack_banded_pallas,
        pallas_backtrack_available,
    )
    from sonido_sonar_tpu.ops.stats.pallas_dtw import (
        fill_banded_pallas,
        fill_banded_pallas_scan_batch,
        pallas_dtw_available,
        pallas_dtw_scan_available,
    )

    if pallas_dtw_available(band):
        cost_band = fill_banded_pallas(query, reference, band, n, m)
    elif pallas_dtw_scan_available(band):
        # production lag budgets (band >= max_lag, e.g. 30-60 s at hop
        # 256) exceed the fused kernel's VMEM gate: split fill — XLA
        # band distances + DP-only Pallas scan
        cost_band = fill_banded_pallas_scan_batch(
            query[None], reference[None], band, n, m
        )[0]
    else:
        cost_band = _fill_banded(query, reference, band, n, m)
    if pallas_backtrack_available(band):
        qs, rs, cs, length = backtrack_banded_pallas(cost_band, band, n, m)
    else:
        qs, rs, cs, length = _backtrack_banded(cost_band, band, n, m)
    raw = cost_band[n, m - n + band]
    distance = raw / jnp.maximum(length, 1).astype(jnp.float32)
    return cost_band, qs, rs, cs, length, raw, distance


def dtw_align_banded(
    query: jnp.ndarray,
    reference: jnp.ndarray,
    constraint_band: int,
) -> DTWResult:
    """Banded symmetric2 DTW with O(T * band) memory. Semantically
    identical to `dtw_align(..., constraint_band=R)` (euclidean local
    distance); use for long sequences where the dense cost matrix would
    not fit. Requires |N - M| <= band for a finite path."""
    if query.ndim == 1:
        query = query[:, None]
    if reference.ndim == 1:
        reference = reference[:, None]
    n, m = int(query.shape[0]), int(reference.shape[0])
    if abs(n - m) > constraint_band:
        raise ValueError(
            f"|N-M| = {abs(n-m)} exceeds band {constraint_band}: no path"
        )
    cost_band, qs, rs, cs, length, raw, distance = _banded_align_device(
        query.astype(jnp.float32), reference.astype(jnp.float32),
        constraint_band, n, m,
    )
    return DTWResult(
        distance=distance,
        raw_distance=raw,
        path_qidx=qs,
        path_ridx=rs,
        path_cost=cs,
        path_length=length,
        cost_matrix=cost_band,  # banded storage [N+1, 2R+1]
        query_length=n,
        ref_length=m,
        step_pattern="symmetric2",
        constraint=constraint_band,
    )
