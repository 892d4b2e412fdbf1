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
