"""Interval-histogram tempo estimation (VERDICT round-1 item #6).

Parity vs the goref float64 re-derivation of tempo_estimation.go:22-119
and onset_detection.go:148-182, plus end-to-end BPM recovery on
synthetic click tracks at three tempi.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest

from tests import goref

from sonido_sonar_tpu.ops.temporal import (
    combine_onset_positions,
    estimate_tempo,
    estimate_tempo_range,
    onset_positions_from_mask,
    tempo_from_intervals,
    tempo_from_onset_positions,
)

SR = 8000


def test_tempo_from_intervals_parity():
    rng = np.random.default_rng(50)
    for _ in range(400):
        k = int(rng.integers(0, 40))
        # mix of in-range beat intervals and out-of-range junk
        intervals = np.concatenate([
            rng.uniform(0.25, 1.9, size=k // 2),
            rng.uniform(0.0, 3.0, size=k - k // 2),
        ])
        rng.shuffle(intervals)
        want = goref.find_tempo_from_intervals(list(intervals))
        pad = np.zeros(8, dtype=np.float32)  # padded invalid tail
        got = float(tempo_from_intervals(
            jnp.asarray(np.concatenate([intervals, pad]).astype(np.float32)),
            jnp.asarray(np.concatenate([np.ones(k, bool), np.zeros(8, bool)])),
        ))
        if k == 0:
            # Go returns 0.0 for an empty interval list; the batched op
            # handles that gate one level up (tempo_from_onset_positions)
            assert got == 120.0
        else:
            assert got == pytest.approx(want), intervals


def test_tempo_from_onsets_parity():
    rng = np.random.default_rng(51)
    for _ in range(200):
        n = int(rng.integers(0, 30))
        onsets = np.sort(rng.choice(SR * 30, size=n, replace=False)).astype(int)
        want = goref.estimate_tempo_from_onsets(list(onsets), SR)
        K = 64
        pos = np.zeros(K, dtype=np.int32)
        pos[:n] = onsets
        valid = np.arange(K) < n
        got = float(tempo_from_onset_positions(
            jnp.asarray(pos), jnp.asarray(valid), SR))
        assert got == pytest.approx(want), onsets


def test_combine_onsets_parity():
    rng = np.random.default_rng(52)
    tol = 400  # 50 ms at 8 kHz
    for _ in range(100):
        n1 = int(rng.integers(0, 20))
        n2 = int(rng.integers(0, 20))
        o1 = np.sort(rng.choice(SR * 20, size=n1, replace=False)).astype(int)
        o2 = np.sort(rng.choice(SR * 20, size=n2, replace=False)).astype(int)
        want = goref.combine_onsets(list(o1), list(o2), tol)
        K = 32
        p1 = np.zeros(K, np.int32); p1[:n1] = o1
        p2 = np.zeros(K, np.int32); p2[:n2] = o2
        pos, valid = combine_onset_positions(
            jnp.asarray(p1), jnp.asarray(np.arange(K) < n1),
            jnp.asarray(p2), jnp.asarray(np.arange(K) < n2), tol,
        )
        got = list(np.asarray(pos)[np.asarray(valid)])
        assert got == want, (o1, o2)


def test_onset_positions_from_mask():
    mask = np.zeros(100, bool)
    mask[[3, 17, 42]] = True
    pos, valid = onset_positions_from_mask(jnp.asarray(mask), 256, 8)
    assert list(np.asarray(pos)[np.asarray(valid)]) == [3 * 256, 17 * 256, 42 * 256]


def _click_track(bpm: float, dur: float, sr: int, seed: int = 0) -> np.ndarray:
    n = int(dur * sr)
    x = np.zeros(n, dtype=np.float32)
    period = int(sr * 60.0 / bpm)
    for start in range(0, n - 200, period):
        t = np.arange(200)
        x[start:start + 200] += (
            np.exp(-t / 40.0) * np.sin(2 * np.pi * 1000 * t / sr)
        ).astype(np.float32)
    rng = np.random.default_rng(seed)
    return x + 0.01 * rng.standard_normal(n).astype(np.float32)


@pytest.mark.parametrize("bpm", [80.0, 120.0, 160.0])
def test_click_track_bpm(bpm):
    x = _click_track(bpm, 10.0, SR)
    got = float(estimate_tempo(jnp.asarray(x), SR))
    assert got == pytest.approx(bpm, abs=10.0), bpm


def test_estimate_tempo_range_click():
    x = _click_track(120.0, 10.0, SR)
    avg, conf, diff = estimate_tempo_range(jnp.asarray(x), SR)
    assert float(avg) == pytest.approx(120.0, abs=15.0)
    assert float(conf) > 0.5


def test_estimate_tempo_batched():
    xs = np.stack([_click_track(80.0, 8.0, SR), _click_track(160.0, 8.0, SR)])
    got = np.asarray(estimate_tempo(jnp.asarray(xs), SR))
    assert got[0] == pytest.approx(80.0, abs=10.0)
    assert got[1] == pytest.approx(160.0, abs=10.0)
