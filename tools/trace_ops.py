"""Capture + parse a real TPU device trace through the axon tunnel.

jax.profiler DOES produce a device plane over the remote tunnel; the
tensorboard profile plugin in this image is broken (pywrap mismatch),
but the raw xplane protobuf parses fine with the pure-python protobuf
implementation. This script prints per-HLO-op device time — the tool
that exposed e.g. approx_max_k's double-sort lowering (see PERF.md).

Usage:
  PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python python tools/trace_ops.py \
      [fingerprint|speech|music] [batch] [secs]
"""

from __future__ import annotations

import collections
import glob
import os
import shutil
import sys


def capture(
    trace_dir: str = "/tmp/jaxtrace",
    steps: int = 2,
    which: str = "fingerprint",
    batch: int = 128,
    secs: int = 30,
) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sonido_sonar_tpu.parallel import pipeline as P

    sr = 44100
    rng = np.random.default_rng(0)
    if which == "comparator":
        # batch = candidate count C; secs unused. Mirrors the bench's
        # device-comparator workload (one query vs a packed corpus).
        from sonido_sonar_tpu.fingerprint.device_compare import (
            batched_similarity,
            layout_size,
        )

        d = layout_size(13)
        corpus = jnp.asarray(rng.standard_normal((batch, d)).astype(np.float32))
        query = jnp.asarray(rng.standard_normal((d,)).astype(np.float32))
        weights = jnp.asarray(np.full(6, 1 / 6, dtype=np.float32))
        match = jnp.asarray(np.ones(batch, dtype=bool))
        x = corpus
        step = lambda v: batched_similarity(query, v, weights, match)
    else:
        fns = {
            "fingerprint": P.batched_fingerprint_features,
            "speech": P.batched_speech_extractor_features,
            "music": P.batched_music_extractor_features,
        }
        fn = fns[which]
        x = jnp.asarray(
            rng.standard_normal((batch, sr * secs)).astype(np.float32) * 0.1
        )
        step = lambda v: fn(v, sample_rate=sr, window_size=1024, hop_size=256)
    jax.block_until_ready(x)
    float(jax.tree_util.tree_leaves(step(x))[0].sum())  # compile + warm
    shutil.rmtree(trace_dir, ignore_errors=True)
    import jax.profiler

    with jax.profiler.trace(trace_dir):
        for _ in range(steps):
            float(jax.tree_util.tree_leaves(step(x))[0].sum())


def report(trace_dir: str = "/tmp/jaxtrace", steps: int = 2, top: int = 30) -> None:
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    files = glob.glob(os.path.join(trace_dir, "plugins/profile/*/*.xplane.pb"))
    if not files:
        print("no xplane found", file=sys.stderr)
        return
    xs = xplane_pb2.XSpace()
    with open(sorted(files)[-1], "rb") as f:
        xs.ParseFromString(f.read())
    for plane in xs.planes:
        if plane.name != "/device:TPU:0":
            continue
        names = {i: m.name for i, m in plane.event_metadata.items()}
        agg = collections.Counter()
        async_agg = collections.Counter()
        for line in plane.lines:
            for ev in line.events:
                name = names.get(ev.metadata_id, "?")
                # async DMA events span their wait time and overlap
                # compute — report them separately so they cannot be
                # misread as serial cost
                if ("copy-start" in name or "slice-start" in name
                        or "copy-done" in name or "slice-done" in name
                        or "async" in name):
                    async_agg[name] += ev.duration_ps
                else:
                    agg[name] += ev.duration_ps
        for name, ps in agg.most_common(top):
            print(f"{ps / steps / 1e9:9.2f} ms/step  {name[:110]}")
        print("---- async (overlapped; duration includes wait) ----")
        for name, ps in async_agg.most_common(10):
            print(f"{ps / steps / 1e9:9.2f} ms/step  {name[:110]}")


if __name__ == "__main__":
    if os.environ.get("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION") != "python":
        # the compiled-proto path raises descriptor errors in this image
        os.environ["PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION"] = "python"
        os.execv(sys.executable, [sys.executable] + sys.argv)
    which = sys.argv[1] if len(sys.argv) > 1 else "fingerprint"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    secs = int(sys.argv[3]) if len(sys.argv) > 3 else 30
    capture(which=which, batch=batch, secs=secs)
    report()
