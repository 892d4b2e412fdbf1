"""LatencyMonitor: streaming CDN latency measurement."""

import numpy as np
import pytest

from sonido_sonar_tpu.config.config import AlignmentConfig, FeatureConfig
from sonido_sonar_tpu.io.synth import harmonic_tone, shift_signal, white_noise
from sonido_sonar_tpu.monitor import LatencyMonitor

SR = 8000


def make_streams(duration=20.0, lag_s=0.8):
    x = harmonic_tone(220.0, duration, SR) + white_noise(duration, SR, 0.05, seed=3)
    rng = np.random.default_rng(5)
    env = np.interp(
        np.arange(len(x)), np.linspace(0, len(x), 80), rng.uniform(0.1, 1.0, 80)
    )
    src = (x * env).astype(np.float32)
    cdn = shift_signal(src, int(lag_s * SR), noise=0.02, gain=0.9)
    return src, cdn


def test_monitor_measures_latency():
    lag_s = 0.8
    src, cdn = make_streams(20.0, lag_s)
    cfg = FeatureConfig(sample_rate=SR, window_size=1024, hop_size=256)
    mon = LatencyMonitor(cfg, AlignmentConfig(), window_seconds=12.0, max_lag_seconds=3.0)

    assert not mon.ready()
    assert mon.measure() is None

    # stream in 0.5 s chunks
    chunk = SR // 2
    results = []
    for i in range(0, len(src), chunk):
        mon.push_source(src[i : i + chunk])
        mon.push_cdn(cdn[i : i + chunk])
        if mon.ready() and (i // chunk) % 8 == 0:
            m = mon.measure()
            if m is not None:
                results.append(m)

    assert len(results) >= 2
    final = mon.current_latency()
    assert final == pytest.approx(lag_s, abs=3 * 256 / SR)
    s = mon.stats()
    assert s["consistency"] > 0.5


def test_monitor_history_and_stats():
    src, cdn = make_streams(16.0, 0.5)
    cfg = FeatureConfig(sample_rate=SR, window_size=1024, hop_size=256)
    mon = LatencyMonitor(cfg, window_seconds=10.0, max_lag_seconds=2.0)
    mon.push_source(src)
    mon.push_cdn(cdn)
    m1 = mon.measure()
    m2 = mon.measure()
    assert m1 is not None and m2 is not None
    assert len(mon.history) == 2
    assert m1.confidence > 0


def test_monitor_device_resident_windows():
    """push_* keeps the rolling windows on device: repeated small chunks
    roll correctly (window content == last W samples pushed)."""
    cfg = FeatureConfig(sample_rate=SR, window_size=1024, hop_size=256)
    mon = LatencyMonitor(cfg, window_seconds=2.0, max_lag_seconds=0.5)
    rng = np.random.default_rng(0)
    total = np.array([], dtype=np.float32)
    for n in (1000, 37, 9000, 256, 16001, 2 * SR + 5):
        chunk = rng.standard_normal(n).astype(np.float32)
        mon.push_source(chunk)
        total = np.concatenate([total, chunk])
    w = int(2.0 * SR)
    np.testing.assert_array_equal(np.asarray(mon._src.buf), total[-w:])
    assert mon._samples_seen == len(total)


def test_fleet_monitor_measures_all_streams():
    from sonido_sonar_tpu.monitor import FleetMonitor

    n_streams = 3
    lags = [0.3, -0.2, 0.55]
    cfg = FeatureConfig(sample_rate=SR, window_size=1024, hop_size=256)
    fleet = FleetMonitor(
        cfg, n_streams=n_streams, window_seconds=8.0, max_lag_seconds=1.0,
        measure_batch=2,  # forces sub-batching + tail padding
    )
    src, _ = make_streams(12.0, 0.0)
    assert fleet.measure_all() == [None] * n_streams  # nothing buffered

    for i, lag in enumerate(lags):
        cdn = shift_signal(src, int(lag * SR), noise=0.02, gain=0.9)
        # stream in uneven chunks through the per-stream push
        for lo in range(0, len(src), 3 * SR // 2):
            fleet.push_source(i, src[lo : lo + 3 * SR // 2])
            fleet.push_cdn(i, cdn[lo : lo + 3 * SR // 2])
    assert fleet.ready_mask().all()

    results = fleet.measure_all(refine=True)
    for i, (m, lag) in enumerate(zip(results, lags)):
        assert m is not None
        assert m.latency_s == pytest.approx(lag, abs=2 * 256 / SR), f"stream {i}"
        assert m.confidence > 0
        assert fleet.current_latency(i) == pytest.approx(lag, abs=2 * 256 / SR)
    assert all(len(h) == 1 for h in fleet.history)


def test_fleet_monitor_broadcast_push():
    from sonido_sonar_tpu.monitor import FleetMonitor

    cfg = FeatureConfig(sample_rate=SR, window_size=1024, hop_size=256)
    fleet = FleetMonitor(cfg, n_streams=2, window_seconds=6.0, max_lag_seconds=1.0)
    src, cdn = make_streams(8.0, 0.4)
    # [N, L] chunk pushes: one upload + one roll-update for the fleet
    pairs_src = np.stack([src, src])
    pairs_cdn = np.stack([cdn, cdn])
    step = SR  # 1 s chunks
    for lo in range(0, pairs_src.shape[1], step):
        fleet.push_source_all(pairs_src[:, lo : lo + step])
        fleet.push_cdn_all(pairs_cdn[:, lo : lo + step])
    results = fleet.measure_all(refine=True)
    for m in results:
        assert m is not None
        assert m.latency_s == pytest.approx(0.4, abs=2 * 256 / SR)
