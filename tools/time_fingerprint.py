"""Time batched_fingerprint_features on the real chip (A/B harness for
the feature-epilogue work). Usage: python -u tools/time_fingerprint.py
[batch] [seconds] [--features]."""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from sonido_sonar_tpu.parallel.pipeline import batched_fingerprint_features


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    secs = float(sys.argv[2]) if len(sys.argv) > 2 else 30.0
    sr = 44100
    n = int(sr * secs)
    rng = np.random.default_rng(0)
    pcm = (rng.standard_normal((b, n)) * 0.1).astype(np.float32)
    x = jax.device_put(jnp.asarray(pcm))
    float(x.sum())  # upload fence

    def step():
        out = batched_fingerprint_features(x)
        return out

    t0 = time.perf_counter()
    out = step()
    # fence with a host fetch of every leaf (sum of sums)
    s = sum(float(jnp.sum(v)) for v in out.values())
    print(f"[time] compile+first step {time.perf_counter() - t0:.1f} s (fence {s:.3e})", flush=True)

    # bench.py's exact sustained-throughput methodology: keep one step
    # in flight so the host fetch fence of step k overlaps the device
    # compute of step k+1 (numbers directly comparable to the headline)
    import collections

    iters = 8
    inflight = collections.deque()
    t0 = time.perf_counter()
    for _ in range(iters):
        inflight.append(step())
        if len(inflight) > 1:
            float(inflight.popleft()["mfcc"].sum())
    while inflight:
        float(inflight.popleft()["mfcc"].sum())
    elapsed = time.perf_counter() - t0
    per_step = elapsed / iters
    ahh = (b * secs / 3600.0) / (per_step / 3600.0)
    print(
        f"[time] pipelined per-step {per_step*1000:.1f} ms "
        f"= {ahh:.0f} audio-h/h/chip (B={b} x {secs:.0f}s, {iters} iters)",
        flush=True,
    )


if __name__ == "__main__":
    main()
