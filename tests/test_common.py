"""ops.common: normalization, interpolation, math utils, buffers."""

import jax.numpy as jnp
import numpy as np
import pytest

from sonido_sonar_tpu.ops import common as C


def test_normalizers():
    x = jnp.asarray(np.array([1.0, 2.0, 3.0, 4.0], np.float32))
    z = np.asarray(C.z_score_normalize(x))
    assert z.mean() == pytest.approx(0, abs=1e-6)
    mm = np.asarray(C.min_max_normalize(x))
    assert mm.min() == 0 and mm.max() == 1
    e = np.asarray(C.energy_normalize(x))
    assert np.linalg.norm(e) == pytest.approx(1.0, rel=1e-5)
    p = np.asarray(C.peak_normalize(x))
    assert np.abs(p).max() == pytest.approx(1.0)
    r = np.asarray(C.rms_normalize(x))
    assert np.sqrt((r**2).mean()) == pytest.approx(1.0, rel=1e-5)
    rob = np.asarray(C.robust_normalize(x))
    assert np.median(rob) == pytest.approx(0.0, abs=1e-6)
    with pytest.raises(ValueError):
        C.normalize(x, "nope")


def test_normalize_db():
    x = jnp.asarray(np.random.default_rng(0).standard_normal(4096).astype(np.float32))
    y = np.asarray(C.normalize_db(x, -20.0))
    rms_db = 20 * np.log10(np.sqrt((y**2).mean()))
    assert rms_db == pytest.approx(-20.0, abs=0.1)


def test_normalize_lufs():
    sr = 8000
    x = jnp.asarray(
        0.01 * np.sin(2 * np.pi * 440 * np.arange(sr * 3) / sr).astype(np.float32)
    )
    y = np.asarray(C.normalize_lufs(x, -23.0, sr))
    # measure back with the same simplified loudness model
    from sonido_sonar_tpu.ops.temporal import short_time_energy

    rms = np.asarray(short_time_energy(jnp.asarray(y), int(0.4 * sr), int(0.4 * sr) // 4))
    loud = -0.691 + 10 * np.log10(rms**2)
    integrated = -0.691 + 10 * np.log10(np.mean(10 ** (loud / 10)))
    assert integrated == pytest.approx(-23.0, abs=0.5)


def test_interpolation_methods():
    data = jnp.asarray(np.array([0.0, 1.0, 4.0, 9.0, 16.0], np.float32))  # x^2
    idx = jnp.asarray(np.array([1.5], np.float32))
    lin = float(C.interp_linear(data, idx)[0])
    cub = float(C.interp_cubic(data, idx)[0])
    her = float(C.interp_hermite(data, idx)[0])
    lan = float(C.interp_lanczos(data, idx)[0])
    assert lin == pytest.approx(2.5)
    # cubic/hermite closer to the true 2.25 than linear
    assert abs(cub - 2.25) < abs(lin - 2.25)
    assert abs(her - 2.25) < abs(lin - 2.25)
    assert abs(lan - 2.25) < 1.0


def test_resample_tone():
    sr1, sr2 = 8000, 12000
    t1 = np.arange(sr1) / sr1
    x = np.sin(2 * np.pi * 100 * t1).astype(np.float32)
    y = np.asarray(C.resample_signal(jnp.asarray(x), sr1, sr2, "cubic"))
    assert len(y) == sr2
    t2 = np.arange(sr2) / sr2
    expected = np.sin(2 * np.pi * 100 * t2)
    assert np.abs(y[100:-100] - expected[100:-100]).max() < 0.01


def test_bilinear():
    grid = jnp.asarray(np.array([[0.0, 1.0], [2.0, 3.0]], np.float32))
    v = float(C.bilinear_interpolate(grid, jnp.asarray(0.5), jnp.asarray(0.5)))
    assert v == pytest.approx(1.5)


def test_moving_average_and_median():
    x = jnp.asarray(np.array([0, 0, 9, 0, 0], np.float32))
    ma = np.asarray(C.moving_average(x, 3))
    assert ma[2] == pytest.approx(3.0)
    mf = np.asarray(C.median_filter(x, 3))
    assert mf[2] == 0.0  # median kills the spike


def test_linear_regression():
    x = jnp.asarray(np.arange(10, dtype=np.float32))
    y = 2.0 * x + 1.0
    slope, intercept, r2 = C.linear_regression(x, y)
    assert float(slope) == pytest.approx(2.0, rel=1e-4)
    assert float(intercept) == pytest.approx(1.0, abs=1e-3)
    assert float(r2) == pytest.approx(1.0, abs=1e-5)


def test_find_peaks():
    x = jnp.asarray(np.array([0, 3, 0, 0, 5, 0, 2, 0], np.float32))
    idx, vals, count = C.find_peaks(x, min_height=1.0, min_distance=1, max_peaks=4)
    c = int(count)
    assert c == 3
    assert int(idx[0]) == 4  # strongest first
    assert float(vals[0]) == 5.0


def test_circular_buffer():
    cb = C.CircularBuffer(4)
    assert cb.write(np.array([1, 2, 3])) == 3
    assert cb.available() == 3
    np.testing.assert_array_equal(cb.peek(2), [1, 2])
    np.testing.assert_array_equal(cb.read(2), [1, 2])
    assert cb.write(np.array([4, 5, 6])) == 3  # exactly 3 slots free
    assert cb.is_full
    np.testing.assert_array_equal(cb.read(4), [3, 4, 5, 6])
    assert cb.is_empty


def test_sliding_window():
    sw = C.SlidingWindow(4, 2)
    frames = sw.add_samples(np.arange(10, dtype=np.float32))
    assert frames.shape == (4, 4)
    np.testing.assert_array_equal(frames[0], [0, 1, 2, 3])
    np.testing.assert_array_equal(frames[1], [2, 3, 4, 5])


def test_delay_line():
    dl = C.DelayLine(10)
    outs = [dl.process(float(i), 3) for i in range(6)]
    assert outs[:3] == [0.0, 0.0, 0.0]
    assert outs[3:] == [0.0, 1.0, 2.0]
    dl2 = C.DelayLine(10)
    out = [dl2.process_interpolated(float(i), 2.5) for i in range(5)]
    assert out[3] == pytest.approx(0.5)  # between x[0]=0 and x[1]=1


def test_overlap_add():
    oab = C.OverlapAddBuffer(4, 2)
    w = np.ones(4, dtype=np.float32)
    o1 = oab.add_frame(w)
    o2 = oab.add_frame(w)
    np.testing.assert_array_equal(o1, [1, 1])
    np.testing.assert_array_equal(o2, [2, 2])  # overlap sums
