"""Parity tests for the fused Pallas banded-DTW fill.

The kernel (ops/stats/pallas_dtw.py) must be numerically equivalent to
the lax.scan fill (dtw._fill_banded) and, transitively, to the dense
fill (dtw._fill_cost_matrix) restricted to the band. On CPU these run
the kernel in interpreter mode; on a real TPU the same code path is
exercised compiled (tests remain green either way).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from sonido_sonar_tpu.ops.stats.dtw import (
    _fill_banded,
    _fill_cost_matrix,
    dtw_align,
    dtw_align_banded,
    local_distance_matrix,
)
from sonido_sonar_tpu.ops.stats.pallas_dtw import (
    fill_banded_pallas,
    fill_banded_pallas_batch,
)

_BIG_CUT = 1e37


def _rand(rng, n, m, d):
    q = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
    r = jnp.asarray(rng.normal(size=(m, d)), jnp.float32)
    return q, r


@pytest.mark.parametrize(
    "n,m,band,d",
    [
        (200, 200, 20, 12),
        (300, 290, 15, 5),   # query longer than reference
        (290, 300, 15, 5),   # reference longer than query
        (97, 100, 8, 1),     # scalar features, n not a chunk multiple
        (257, 250, 64, 13),  # band width pads past one lane tile
        (272, 272, 100, 12), # wide band (lanes = 256)
    ],
)
def test_pallas_fill_matches_lax_fill(n, m, band, d):
    rng = np.random.default_rng(7)
    q, r = _rand(rng, n, m, d)
    ref = np.asarray(_fill_banded(q, r, band, n, m))
    got = np.asarray(fill_banded_pallas(q, r, band, n, m, interpret=True))
    finite = ref < _BIG_CUT
    assert np.array_equal(ref >= _BIG_CUT, got >= _BIG_CUT)
    rel = np.abs(ref - got)[finite].max() / np.abs(ref[finite]).max()
    assert rel < 1e-5


def test_pallas_fill_matches_dense_fill():
    """End-to-end ground truth: the banded kernel agrees with the dense
    cost matrix on every in-band cell (including n != m, which once
    exposed a window-clamping bug in the lax banded fill)."""
    rng = np.random.default_rng(3)
    n, m, band, d = 150, 143, 12, 6
    q, r = _rand(rng, n, m, d)
    dense = np.asarray(
        _fill_cost_matrix(local_distance_matrix(q, r), "symmetric2", band)
    )
    got = np.asarray(fill_banded_pallas(q, r, band, n, m, interpret=True))
    w = 2 * band + 1
    for i in range(n + 1):
        for k in range(w):
            j = i - band + k
            if 0 <= j <= m and dense[i, j] < _BIG_CUT:
                assert abs(dense[i, j] - got[i, k]) <= 1e-3 + 1e-5 * abs(
                    dense[i, j]
                ), (i, k)


def test_lax_banded_fill_query_longer_regression():
    """dtw._fill_banded once clamped its reference window for rows
    i > m + 1 when n > m (dynamic_slice saturation), silently shifting
    local costs. Locked against the dense fill."""
    rng = np.random.default_rng(11)
    n, m, band, d = 120, 100, 25, 4
    q, r = _rand(rng, n, m, d)
    dense = np.asarray(
        _fill_cost_matrix(local_distance_matrix(q, r), "symmetric2", band)
    )
    banded = np.asarray(_fill_banded(q, r, band, n, m))
    w = 2 * band + 1
    for i in range(max(0, m - 2), n + 1):  # the once-broken tail rows
        for k in range(w):
            j = i - band + k
            if 0 <= j <= m and dense[i, j] < _BIG_CUT:
                assert abs(dense[i, j] - banded[i, k]) <= 1e-3 + 1e-5 * abs(
                    dense[i, j]
                ), (i, k)


def test_pallas_fill_batch():
    rng = np.random.default_rng(5)
    bsz, n, m, band, d = 3, 240, 240, 30, 12
    q = jnp.asarray(rng.normal(size=(bsz, n, d)), jnp.float32)
    r = jnp.asarray(rng.normal(size=(bsz, m, d)), jnp.float32)
    got = np.asarray(
        fill_banded_pallas_batch(q, r, band, n, m, interpret=True)
    )
    for b in range(bsz):
        ref = np.asarray(_fill_banded(q[b], r[b], band, n, m))
        finite = ref < _BIG_CUT
        rel = np.abs(ref - got[b])[finite].max() / np.abs(ref[finite]).max()
        assert rel < 1e-5


def test_banded_alignment_distance_matches_dense():
    """dtw_align_banded (whichever fill backend it picks) agrees with
    the dense banded alignment on distance and path endpoints."""
    rng = np.random.default_rng(9)
    n = m = 180
    base = np.cumsum(rng.normal(size=(n + 4, 8)), axis=0).astype(np.float32)
    q = jnp.asarray(base[:n])
    r = jnp.asarray(base[4 : 4 + m])
    band = 16
    dense = dtw_align(q, r, constraint_band=band)
    banded = dtw_align_banded(q, r, band)
    # random-walk magnitudes stress the |q|^2+|r|^2-2qr identity, and a
    # near-tie in the backtrack can legally flip a step — compare at the
    # accumulation-noise level, not bitwise
    np.testing.assert_allclose(
        float(dense.raw_distance), float(banded.raw_distance), rtol=2e-3
    )
    assert abs(int(dense.path_length) - int(banded.path_length)) <= 2
    # endpoints are invariant
    pl_d, pl_b = int(dense.path_length), int(banded.path_length)
    assert int(dense.path_qidx[0]) == int(banded.path_qidx[0]) == 0
    assert (
        int(dense.path_qidx[pl_d - 1])
        == int(banded.path_qidx[pl_b - 1])
        == n - 1
    )


def test_pallas_backtrack_matches_lax():
    """The SMEM walker must reproduce dtw._backtrack_banded bit-for-bit
    (indices and length; local costs to float tolerance)."""
    from sonido_sonar_tpu.ops.stats.dtw import _backtrack_banded
    from sonido_sonar_tpu.ops.stats.pallas_backtrack import (
        backtrack_banded_pallas,
    )

    rng = np.random.default_rng(13)
    for n, m, band, d in [(200, 200, 20, 12), (300, 290, 15, 5),
                          (290, 300, 15, 5), (97, 100, 8, 1)]:
        q = jnp.asarray(
            np.cumsum(rng.normal(size=(n, d)), 0) * 0.1, jnp.float32
        )
        r = jnp.asarray(
            np.cumsum(rng.normal(size=(m, d)), 0) * 0.1, jnp.float32
        )
        cost = _fill_banded(q, r, band, n, m)
        qs0, rs0, cs0, l0 = _backtrack_banded(cost, band, n, m)
        qs1, rs1, cs1, l1 = backtrack_banded_pallas(
            cost, band, n, m, interpret=True
        )
        assert int(l0) == int(l1)
        np.testing.assert_array_equal(np.asarray(qs0), np.asarray(qs1))
        np.testing.assert_array_equal(np.asarray(rs0), np.asarray(rs1))
        np.testing.assert_allclose(
            np.asarray(cs0), np.asarray(cs1), rtol=1e-5, atol=1e-5
        )


def test_pallas_backtrack_batch():
    from sonido_sonar_tpu.ops.stats.dtw import _backtrack_banded
    from sonido_sonar_tpu.ops.stats.pallas_backtrack import (
        backtrack_banded_pallas_batch,
    )

    rng = np.random.default_rng(17)
    bsz, n, m, band, d = 3, 240, 240, 30, 12
    q = jnp.asarray(rng.normal(size=(bsz, n, d)), jnp.float32)
    r = jnp.asarray(rng.normal(size=(bsz, m, d)), jnp.float32)
    costs = fill_banded_pallas_batch(q, r, band, n, m, interpret=True)
    qs, rs, cs, lengths = backtrack_banded_pallas_batch(
        costs, band, n, m, interpret=True
    )
    for b in range(bsz):
        qs0, rs0, cs0, l0 = _backtrack_banded(costs[b], band, n, m)
        assert int(l0) == int(lengths[b])
        np.testing.assert_array_equal(np.asarray(qs0), np.asarray(qs[b]))
        np.testing.assert_array_equal(np.asarray(rs0), np.asarray(rs[b]))


@pytest.mark.parametrize(
    "n,m,band,d",
    [
        (10, 10, 3, 2),     # n far below one chunk
        (32, 32, 1, 1),     # exactly one chunk, minimal band
        (33, 30, 4, 3),     # one row past a chunk boundary, n > m
        (64, 64, 63, 12),   # band width exactly one lane tile (w=127)
        (70, 64, 64, 12),   # w=129 crosses into the second lane tile
    ],
)
def test_pallas_kernels_edge_shapes(n, m, band, d):
    """Chunk/lane boundary cases through both kernels (interpret mode)."""
    from sonido_sonar_tpu.ops.stats.dtw import _backtrack_banded
    from sonido_sonar_tpu.ops.stats.pallas_backtrack import (
        backtrack_banded_pallas,
    )

    rng = np.random.default_rng(n * 1000 + m)
    q, r = _rand(rng, n, m, d)
    ref = np.asarray(_fill_banded(q, r, band, n, m))
    got_cost = fill_banded_pallas(q, r, band, n, m, interpret=True)
    got = np.asarray(got_cost)
    finite = ref < _BIG_CUT
    assert np.array_equal(ref >= _BIG_CUT, got >= _BIG_CUT)
    assert np.abs(ref - got)[finite].max() <= 1e-4 + 1e-5 * np.abs(
        ref[finite]
    ).max()

    qs0, rs0, _, l0 = _backtrack_banded(jnp.asarray(ref), band, n, m)
    qs1, rs1, _, l1 = backtrack_banded_pallas(
        jnp.asarray(ref), band, n, m, interpret=True
    )
    assert int(l0) == int(l1)
    np.testing.assert_array_equal(np.asarray(qs0), np.asarray(qs1))
    np.testing.assert_array_equal(np.asarray(rs0), np.asarray(rs1))


# ---------------------------------------------------------------------
# split fill (XLA band distances + DP-only scan kernel) — the
# big-band path past the fused kernel's VMEM gate (VERDICT r2 item #3)
# ---------------------------------------------------------------------

@pytest.mark.parametrize(
    "n,m,band,d",
    [
        (200, 200, 20, 12),
        (300, 290, 15, 5),    # query longer than reference
        (290, 300, 15, 5),    # reference longer than query
        (97, 100, 8, 1),      # scalar features, n not a chunk multiple
        (272, 272, 100, 12),  # wide band (lanes = 256)
        (128, 120, 120, 6),   # band ~ sequence length (the 'band >=
                              # max_lag' hybrid geometry, scaled down)
    ],
)
def test_scan_fill_matches_lax_fill(n, m, band, d):
    from sonido_sonar_tpu.ops.stats.pallas_dtw import (
        fill_banded_pallas_scan_batch,
    )

    rng = np.random.default_rng(17)
    q, r = _rand(rng, n, m, d)
    ref = np.asarray(_fill_banded(q, r, band, n, m))
    got = np.asarray(
        fill_banded_pallas_scan_batch(
            q[None], r[None], band, n, m, interpret=True
        )[0]
    )
    finite = ref < _BIG_CUT
    assert np.array_equal(ref >= _BIG_CUT, got >= _BIG_CUT)
    rel = np.abs(ref - got)[finite].max() / np.abs(ref[finite]).max()
    assert rel < 1e-5


def test_scan_fill_batch_and_backtrack_wide_band():
    """Batched split fill + the SMEM walker with its adaptive
    rows-per-block (wide bands shrink the block; _rows_blk < 512)."""
    from sonido_sonar_tpu.ops.stats.dtw import _backtrack_banded
    from sonido_sonar_tpu.ops.stats.pallas_backtrack import (
        _rows_blk,
        backtrack_banded_pallas,
    )
    from sonido_sonar_tpu.ops.stats.pallas_dtw import (
        fill_banded_pallas_scan_batch,
    )

    rng = np.random.default_rng(23)
    bsz, n, m, d = 2, 96, 90, 4
    band = 8000  # forces words_row ~1001 -> rows_blk 192
    assert _rows_blk(band) < 512
    q = jnp.asarray(rng.normal(size=(bsz, n, d)), jnp.float32)
    r = jnp.asarray(rng.normal(size=(bsz, m, d)), jnp.float32)
    got = np.asarray(
        fill_banded_pallas_scan_batch(q, r, band, n, m, interpret=True)
    )
    for b in range(bsz):
        ref = np.asarray(_fill_banded(q[b], r[b], band, n, m))
        finite = ref < _BIG_CUT
        rel = np.abs(ref - got[b])[finite].max() / np.abs(ref[finite]).max()
        assert rel < 1e-5

    ref0 = jnp.asarray(np.asarray(_fill_banded(q[0], r[0], band, n, m)))
    qs0, rs0, _, l0 = _backtrack_banded(ref0, band, n, m)
    qs1, rs1, _, l1 = backtrack_banded_pallas(ref0, band, n, m, interpret=True)
    assert int(l0) == int(l1)
    np.testing.assert_array_equal(np.asarray(qs0), np.asarray(qs1))
    np.testing.assert_array_equal(np.asarray(rs0), np.asarray(rs1))


@pytest.mark.parametrize(
    "n,m,band,d,b",
    [
        (100, 100, 10, 3, 3),
        (97, 100, 8, 1, 8),      # n not a chunk multiple, full sublanes
        (128, 120, 120, 6, 2),   # band ~ sequence length (lag-budget shape)
    ],
)
def test_pairs_fill_matches_scan_fill(n, m, band, d, b):
    """Pairs-on-sublanes fill == the serial-grid scan fill, pair by
    pair (VERDICT r3 item #4)."""
    from sonido_sonar_tpu.ops.stats.pallas_dtw import (
        fill_banded_pallas_scan_batch,
        fill_banded_pallas_scan_pairs,
    )

    rng = np.random.default_rng(23)
    qs = np.stack([_rand(rng, n, m, d)[0] for _ in range(b)])
    rs = np.stack([_rand(rng, n, m, d)[1] for _ in range(b)])
    want = np.asarray(
        fill_banded_pallas_scan_batch(
            jnp.asarray(qs), jnp.asarray(rs), band, n, m, interpret=True
        )
    )
    got = np.asarray(
        fill_banded_pallas_scan_pairs(
            jnp.asarray(qs), jnp.asarray(rs), band, n, m, interpret=True
        )
    )
    finite = want < _BIG_CUT
    assert np.array_equal(want >= _BIG_CUT, got >= _BIG_CUT)
    rel = np.abs(want - got)[finite].max() / np.abs(want[finite]).max()
    # the fused kernel computes sqrt(|q|^2+|r|^2-2qr) with a different
    # f32 association than the XLA banded-layout path
    assert rel < 5e-6


@pytest.mark.parametrize(
    "n,m,band,d,b",
    [
        (100, 100, 10, 3, 2),
        (97, 100, 8, 1, 3),
        (128, 120, 120, 6, 2),   # band ~ sequence length (lag-budget shape)
    ],
)
def test_rev_backtrack_matches_natural(n, m, band, d, b):
    """The raw reversed pipeline (in-kernel codes + reversed-band
    backtrack) == the natural pipeline (scan fill + XLA move codes +
    backtrack), path for path."""
    from sonido_sonar_tpu.ops.stats.pallas_backtrack import (
        backtrack_banded_pallas_batch,
        backtrack_banded_pallas_rev,
    )
    from sonido_sonar_tpu.ops.stats.pallas_dtw import (
        fill_banded_pallas_scan_batch,
        fill_banded_pallas_scan_pairs_raw,
    )

    rng = np.random.default_rng(31)
    qs = np.stack([_rand(rng, n, m, d)[0] for _ in range(b)])
    rs = np.stack([_rand(rng, n, m, d)[1] for _ in range(b)])
    costs = fill_banded_pallas_scan_batch(
        jnp.asarray(qs), jnp.asarray(rs), band, n, m, interpret=True
    )
    want = backtrack_banded_pallas_batch(costs, band, n, m, interpret=True)
    cost_rev = fill_banded_pallas_scan_pairs_raw(
        jnp.asarray(qs), jnp.asarray(rs), band, n, m, interpret=True
    )
    got = backtrack_banded_pallas_rev(
        cost_rev, band, n, m, interpret=True
    )
    for name, g, wv in zip(("qs", "rs", "cs", "len"), got, want):
        if name == "cs":
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(wv), atol=1e-4, err_msg=name)
        else:
            np.testing.assert_array_equal(
                np.asarray(g), np.asarray(wv), err_msg=name)
    # raw distance off the reversed band == natural band corner
    lanes = cost_rev.shape[-1]
    np.testing.assert_allclose(
        np.asarray(cost_rev[:, n - 1, lanes - 1 - (m - n + band)]),
        np.asarray(costs[:, n, m - n + band]), rtol=1e-6)
