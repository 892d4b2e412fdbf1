"""DTW: parity vs a direct float64 port of dtw.go + property tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from sonido_sonar_tpu.ops.stats.dtw import (
    alignment_quality,
    dtw_align,
    dtw_align_vectors,
    local_distance_matrix,
)


def numpy_dtw(query, reference, step_pattern="symmetric2", band=-1):
    """Direct float64 port of dtw.go:56-217."""
    n, m = len(query), len(reference)
    cost = np.full((n + 1, m + 1), np.inf)
    cost[0][0] = 0.0
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            if band > 0 and abs(i - j) > band:
                continue
            local = np.linalg.norm(np.atleast_1d(query[i - 1]) - np.atleast_1d(reference[j - 1]))
            if step_pattern == "symmetric2":
                prev = min(cost[i - 1][j], cost[i][j - 1], cost[i - 1][j - 1])
            elif step_pattern == "asymmetric":
                prev = min(cost[i - 1][j], cost[i][j - 1])
            else:  # symmetric1
                prev = min(cost[i - 1][j] + 1, cost[i][j - 1] + 1, cost[i - 1][j - 1])
            cost[i][j] = local + prev
    # backtrack
    path = []
    i, j = n, m
    while i > 0 or j > 0:
        c = cost[i][j] - cost[i - 1][j - 1] if (i > 0 and j > 0) else 0.0
        path.insert(0, (i - 1, j - 1, c))
        if i == 0:
            j -= 1
        elif j == 0:
            i -= 1
        else:
            cands = [(cost[i - 1][j], i - 1, j), (cost[i][j - 1], i, j - 1), (cost[i - 1][j - 1], i - 1, j - 1)]
            best = 0
            for k in range(1, 3):
                if cands[k][0] < cands[best][0]:
                    best = k
            i, j = cands[best][1], cands[best][2]
    return cost[n][m] / len(path), cost, path


def test_asymmetric_functional():
    """The reference's 'asymmetric' pattern is dead code (min(up,left)
    with Inf borders never reaches cost[0][0] -> all Inf). Ours is the
    textbook asymmetric pattern: finite distances, query index strictly
    advancing along the path."""
    rng = np.random.default_rng(2)
    q = rng.standard_normal((20, 4)).astype(np.float32)
    r = rng.standard_normal((25, 4)).astype(np.float32)
    res = dtw_align(jnp.asarray(q), jnp.asarray(r), step_pattern="asymmetric")
    assert np.isfinite(float(res.distance))
    assert float(res.distance) < 1e6


@pytest.mark.parametrize("pattern", ["symmetric2", "symmetric1"])
def test_parity_random(pattern):
    rng = np.random.default_rng(3)
    q = rng.standard_normal((20, 4)).astype(np.float32)
    r = rng.standard_normal((25, 4)).astype(np.float32)
    ref_dist, ref_cost, ref_path = numpy_dtw(q, r, pattern)
    res = dtw_align(jnp.asarray(q), jnp.asarray(r), step_pattern=pattern)
    assert float(res.distance) == pytest.approx(ref_dist, rel=1e-4)
    L = int(res.path_length)
    assert L == len(ref_path)
    got_path = list(zip(np.asarray(res.path_qidx)[:L], np.asarray(res.path_ridx)[:L]))
    assert got_path == [(p[0], p[1]) for p in ref_path]


def test_parity_banded():
    rng = np.random.default_rng(4)
    q = rng.standard_normal((30, 3)).astype(np.float32)
    r = rng.standard_normal((30, 3)).astype(np.float32)
    ref_dist, _, ref_path = numpy_dtw(q, r, "symmetric2", band=5)
    res = dtw_align(jnp.asarray(q), jnp.asarray(r), constraint_band=5)
    assert float(res.distance) == pytest.approx(ref_dist, rel=1e-4)
    assert int(res.path_length) == len(ref_path)


def test_identical_sequences_zero_distance():
    rng = np.random.default_rng(5)
    q = rng.standard_normal((40, 12)).astype(np.float32)
    res = dtw_align(jnp.asarray(q), jnp.asarray(q))
    # float32 |q|^2+|r|^2-2qr cancellation leaves ~1e-4 residual per step
    assert float(res.distance) == pytest.approx(0.0, abs=1e-2)
    # path should be the pure diagonal
    L = int(res.path_length)
    assert L == 40
    np.testing.assert_array_equal(np.asarray(res.path_qidx)[:L], np.arange(40))
    np.testing.assert_array_equal(np.asarray(res.path_ridx)[:L], np.arange(40))


def test_path_monotonic():
    rng = np.random.default_rng(6)
    q = rng.standard_normal((30, 2)).astype(np.float32)
    r = rng.standard_normal((50, 2)).astype(np.float32)
    res = dtw_align(jnp.asarray(q), jnp.asarray(r))
    L = int(res.path_length)
    qi = np.asarray(res.path_qidx)[:L]
    ri = np.asarray(res.path_ridx)[:L]
    assert (np.diff(qi) >= 0).all() and (np.diff(ri) >= 0).all()
    assert qi[0] == 0 and ri[0] == 0
    assert qi[-1] == 29 and ri[-1] == 49


def test_shifted_sequence_offset():
    """A time-shifted copy: mean path displacement ~ the shift."""
    rng = np.random.default_rng(7)
    base = np.cumsum(rng.standard_normal(120)).astype(np.float32)
    shift = 15
    q = base[shift:100 + shift]
    r = base[:100]
    res = dtw_align_vectors(jnp.asarray(q), jnp.asarray(r))
    L = int(res.path_length)
    disp = (np.asarray(res.path_ridx)[:L] - np.asarray(res.path_qidx)[:L]).mean()
    assert disp == pytest.approx(shift, abs=3.0)


def test_quality_metrics():
    rng = np.random.default_rng(8)
    q = rng.standard_normal((20, 2)).astype(np.float32)
    res = dtw_align(jnp.asarray(q), jnp.asarray(q))
    qual = alignment_quality(res)
    assert float(qual["diagonal_ratio"]) > 0.9
    assert float(qual["normalized_distance"]) == pytest.approx(0.0, abs=1e-2)


def test_distance_matrix_metrics():
    q = jnp.asarray(np.eye(3, dtype=np.float32))
    r = jnp.asarray(np.eye(3, dtype=np.float32))
    d = np.asarray(local_distance_matrix(q, r, "euclidean"))
    np.testing.assert_allclose(np.diag(d), 0.0, atol=1e-4)
    assert d[0, 1] == pytest.approx(np.sqrt(2), rel=1e-5)
    c = np.asarray(local_distance_matrix(q, r, "cosine"))
    np.testing.assert_allclose(np.diag(c), 0.0, atol=1e-6)
    assert c[0, 1] == pytest.approx(1.0, rel=1e-5)


def test_banded_matches_dense():
    """dtw_align_banded == dtw_align with the same band."""
    from sonido_sonar_tpu.ops.stats.dtw import dtw_align_banded

    rng = np.random.default_rng(11)
    q = rng.standard_normal((60, 4)).astype(np.float32)
    r = rng.standard_normal((64, 4)).astype(np.float32)
    band = 12
    dense = dtw_align(jnp.asarray(q), jnp.asarray(r), constraint_band=band)
    banded = dtw_align_banded(jnp.asarray(q), jnp.asarray(r), band)
    assert float(banded.distance) == pytest.approx(float(dense.distance), rel=1e-4)
    Ld, Lb = int(dense.path_length), int(banded.path_length)
    assert Ld == Lb
    np.testing.assert_array_equal(
        np.asarray(dense.path_qidx)[:Ld], np.asarray(banded.path_qidx)[:Lb]
    )
    np.testing.assert_array_equal(
        np.asarray(dense.path_ridx)[:Ld], np.asarray(banded.path_ridx)[:Lb]
    )


def test_banded_rejects_out_of_band_lengths():
    from sonido_sonar_tpu.ops.stats.dtw import dtw_align_banded

    q = jnp.zeros((10, 2))
    r = jnp.zeros((40, 2))
    with pytest.raises(ValueError):
        dtw_align_banded(q, r, 5)


def test_banded_long_sequence_memory():
    """10k-frame banded alignment runs (dense would need ~400 MB)."""
    from sonido_sonar_tpu.ops.stats.dtw import dtw_align_banded

    rng = np.random.default_rng(12)
    base = np.cumsum(rng.standard_normal(5100), dtype=np.float32)
    q = base[50:5050, None]
    r = base[:5000, None]
    res = dtw_align_banded(jnp.asarray(q), jnp.asarray(r), 80)
    L = int(res.path_length)
    disp = float(
        (np.asarray(res.path_ridx)[:L] - np.asarray(res.path_qidx)[:L]).mean()
    )
    assert disp == pytest.approx(50, abs=10)  # q[i]=base[i+50] matches r[i+50]
    assert res.cost_matrix.shape == (5001, 161)  # banded storage only
