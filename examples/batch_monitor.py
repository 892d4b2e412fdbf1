"""Fleet-scale CDN latency monitoring: one jitted step per batch.

Aligns B source/CDN stream pairs at once — frame-level coarse offsets
from batched energy cross-correlation, then exact-sample GCC-PHAT
refinement — the production shape of the reference's one-pair
AlignAudioFiles loop (alignment.go:489-553) on a TPU batch axis.

Usage: python examples/batch_monitor.py [n_pairs] [seconds]
(synthesizes pairs with known offsets and reports recovery).
"""

import sys
import time

import jax.numpy as jnp
import numpy as np

from sonido_sonar_tpu.ops.temporal import short_time_energy
from sonido_sonar_tpu.parallel import batched_pair_alignment, batched_refine_offsets


def main(n_pairs: int = 8, seconds: float = 12.0) -> None:
    sr = 44100
    hop = 256
    rng = np.random.default_rng(42)

    from sonido_sonar_tpu.io.synth import harmonic_tone, shift_signal, white_noise

    base = np.asarray(
        harmonic_tone(220.0, seconds, sr) + white_noise(seconds, sr, 0.05, seed=1)
    )
    env = np.interp(
        np.arange(len(base)),
        np.linspace(0, len(base), int(8 * seconds)),
        rng.uniform(0.1, 1.0, int(8 * seconds)),
    )
    src = (base * env).astype(np.float32)

    max_off = int(seconds * sr / 4)
    true_lags = rng.integers(-max_off, max_off, n_pairs)
    queries = np.stack([src] * n_pairs)
    refs = np.stack(
        [
            np.asarray(shift_signal(src, int(l), noise=0.02, gain=0.9))
            for l in true_lags
        ]
    ).astype(np.float32)

    q_j, r_j = jnp.asarray(queries), jnp.asarray(refs)
    max_lag_frames = max_off // hop + 2

    # warm up the compile, then time one monitoring step
    def step():
        e1 = short_time_energy(q_j, 1024, hop)
        e2 = short_time_energy(r_j, 1024, hop)
        coarse_frames = batched_pair_alignment(e1, e2, max_lag=max_lag_frames)
        coarse_s = np.asarray(coarse_frames["lag_frames"]) * hop / sr
        refined = batched_refine_offsets(
            q_j, r_j, jnp.asarray(coarse_s, jnp.float32), sr,
            hop_size=hop, max_offset_samples=max_off + hop,
        )
        return np.asarray(refined), np.asarray(coarse_frames["peak_correlation"])

    step()
    t0 = time.perf_counter()
    refined, peak_corr = step()
    dt = (time.perf_counter() - t0) * 1000

    got = np.round(refined * sr).astype(int)
    print(f"{n_pairs} pairs x {seconds:.0f}s monitored in {dt:.1f} ms")
    for i in range(n_pairs):
        err = abs(got[i] - true_lags[i])
        print(
            f"  pair {i}: latency {refined[i]*1000:9.3f} ms "
            f"(true {true_lags[i]/sr*1000:9.3f} ms, err {err} samples, "
            f"corr {peak_corr[i]:.2f})"
        )
    exact = int((got == true_lags).sum())
    print(f"exact-sample recovery: {exact}/{n_pairs}")


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 8,
        float(sys.argv[2]) if len(sys.argv) > 2 else 12.0,
    )
