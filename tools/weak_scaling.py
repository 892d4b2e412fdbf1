"""Weak-scaling proof on the virtual CPU mesh (VERDICT r3 item #6).

Runs the sharded fingerprint pipeline and the batched-alignment pipeline
at n = 1/2/4/8 virtual devices with a FIXED per-device batch, and
reports t(n) / (n * t(1)) — the work-inflation factor.

On this 1-vCPU host all virtual devices share one core, so classic
parallel efficiency is unmeasurable; what IS measurable is whether the
sharded program does any REPLICATED or SERIAL work: with perfect SPMD
decomposition total CPU work grows linearly in n (factor ~1.0), while a
replicated stage or a serial section shows up as factor >> 1 at n=8.
That is exactly the failure a real multi-chip run would hit, measured
without the chips.

Usage:  python tools/weak_scaling.py  (sets its own CPU-mesh env; run
from the repo root; ~2 min).
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

import numpy as np


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    import time

    from sonido_sonar_tpu.config.config import FeatureConfig
    from sonido_sonar_tpu.parallel.mesh import shard_over_batch
    from sonido_sonar_tpu.parallel.pipeline import (
        BatchedFingerprintPipeline,
        batched_pair_alignment,
    )

    sr = 22050
    secs = 2.0
    per_dev = 2          # clips per device (weak scaling)
    n_samples = int(sr * secs)
    rng = np.random.default_rng(0)

    devices = jax.devices()
    assert len(devices) >= 8, f"need 8 virtual devices, got {len(devices)}"
    cfg = FeatureConfig(sample_rate=sr, window_size=1024, hop_size=256)

    def time_fn(fn, reps=5):
        fn()  # compile
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn()
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t0)
        return min(ts)

    rows = []
    base = {}
    for n in (1, 2, 4, 8):
        mesh = Mesh(np.array(devices[:n]), ("data",))
        b = per_dev * n
        pcm = (rng.standard_normal((b, n_samples)) * 0.1).astype(np.float32)

        pipe = BatchedFingerprintPipeline(mesh, cfg)
        t_fp = time_fn(lambda: pipe(pcm))

        # batched pair alignment (energy xcorr) over the same mesh.
        # Sharded path at n=1 too, so the baseline carries the same
        # shard_map dispatch overhead and the ratio isolates REPLICATED
        # or SERIAL work rather than fixed wrapper cost.
        t_e = 8192
        q = (rng.standard_normal((b, t_e)) * 0.1).astype(np.float32)
        r = np.roll(q, 7, axis=-1)
        sharding = NamedSharding(mesh, P("data"))
        qj = jax.device_put(jnp.asarray(q), sharding)
        rj = jax.device_put(jnp.asarray(r), sharding)
        align = shard_over_batch(
            lambda a, c: batched_pair_alignment(a, c, max_lag=512),
            mesh, "data",
        )
        t_al = time_fn(lambda: align(qj, rj))

        if n == 1:
            base = {"fp": t_fp, "al": t_al}
        rows.append(
            (
                n,
                t_fp,
                t_fp / (n * base["fp"]),
                t_al,
                t_al / (n * base["al"]),
            )
        )
        print(
            f"[weak-scaling] n={n}: fingerprint {t_fp*1000:8.1f} ms "
            f"(work-inflation {t_fp/(n*base['fp']):.2f}), "
            f"alignment {t_al*1000:7.1f} ms "
            f"(work-inflation {t_al/(n*base['al']):.2f})",
            flush=True,
        )

    worst_fp = max(r[2] for r in rows)
    worst_al = max(r[4] for r in rows)
    print(
        f"[weak-scaling] worst inflation: fingerprint {worst_fp:.2f}, "
        f"alignment {worst_al:.2f} (1.0 = perfectly sharded; > ~1.15 "
        f"means replicated work or a serial section)",
        flush=True,
    )
    return rows


if __name__ == "__main__":
    main()
