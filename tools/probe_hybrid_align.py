"""Probe the batched hybrid-align bench line's run-to-run spread
(VERDICT r4 item #4: 441 -> 368 pairs/s round-over-round on identical
geometry, unexplained).

Runs the exact BENCH geometry (16 x 60 s pairs, energy_impl=cumsum,
max_lag 30 s) N times on the real chip and prints every sample plus
median/best/worst, so "noise vs real" is a measurement, not a guess.

Usage: python -u tools/probe_hybrid_align.py [N]
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from sonido_sonar_tpu.ops.stats.batched_alignment import batched_align_audio


def main() -> None:
    n_iter = int(sys.argv[1]) if len(sys.argv) > 1 else 15
    sr = 44100
    n_pairs = 16
    rng = np.random.default_rng(0)
    src60 = jnp.asarray(
        rng.standard_normal((n_pairs, sr * 60)).astype(np.float32) * 0.1
    )
    cdn60 = jnp.roll(src60, 4321, axis=-1) * 0.9
    jax.block_until_ready((src60, cdn60))

    def run():
        return batched_align_audio(
            src60, cdn60, sr, window_size=1024, hop_size=256,
            max_lag_seconds=30.0, energy_impl="cumsum")

    t0 = time.perf_counter()
    out = run()  # compile + warm
    print(f"[probe] warm call (incl. compile): "
          f"{(time.perf_counter()-t0)*1000:.1f} ms", flush=True)
    _ = int((out["method"] == 0).sum())

    times = []
    for i in range(n_iter):
        t0 = time.perf_counter()
        out = run()
        dt = time.perf_counter() - t0
        times.append(dt)
        print(f"[probe] iter {i:2d}: {dt*1000:7.1f} ms "
              f"({n_pairs/dt:5.0f} pairs/s)", flush=True)
    ts = sorted(times)
    med = ts[len(ts) // 2]
    print(f"[probe] N={n_iter}  median {med*1000:.1f} ms "
          f"({n_pairs/med:.0f} pairs/s)  best {ts[0]*1000:.1f}  "
          f"worst {ts[-1]*1000:.1f}  "
          f"spread {(ts[-1]-ts[0])*1000:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
