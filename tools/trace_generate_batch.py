"""Per-stage wall-clock breakdown of the public generate-batch path.

VERDICT r4 item #1: BENCH_r04 measured `generate_fingerprints_batch` at
1047.8 ms vs the bare extractor program's 215.4 ms (21%), with no
accounting of the ~830 ms difference. This probe times each stage of the
public path separately on the real chip (host perf_counter fences, the
same methodology as bench.py) so PERF.md can name where the time goes.

Stages:
  1. prepare   — `_prepare_batch` (stacking 128 per-clip device rows)
  2. detect    — `_detect_content_types_batch` (device program + [B,9]
                 fetch + host classifier)
  3. extract   — the per-group extractor program (dispatch + fence)
  4. assemble  — host fingerprint-object assembly loop
  5. pack      — `comparator_matrix` (device stats packing, fenced)

Usage: python -u tools/trace_generate_batch.py [batch] [seconds] [reps]
"""

from __future__ import annotations

import sys
import time

import numpy as np


def main(batch: int = 128, seconds: int = 30, reps: int = 3) -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from sonido_sonar_tpu.config.config import FeatureConfig, FingerprintConfig
    from sonido_sonar_tpu.fingerprint import FingerprintGenerator
    from sonido_sonar_tpu.io.audio import AudioData

    sr = 44100
    n = sr * seconds
    rng = np.random.default_rng(0)
    gen = FingerprintGenerator(
        FingerprintConfig(
            feature_config=FeatureConfig(
                sample_rate=sr, window_size=1024, hop_size=256
            )
        )
    )
    inputs = [
        jnp.asarray(rng.standard_normal((batch, n)).astype(np.float32) * 0.1)
        for _ in range(2)
    ]
    jax.block_until_ready(inputs)
    audio_sets = [
        [AudioData(pcm=x[i], sample_rate=sr) for i in range(batch)]
        for x in inputs
    ]
    jax.block_until_ready([a.pcm for s in audio_sets for a in s])

    # warmup: full public path once (compiles everything)
    fb = gen.generate_fingerprints_batch(audio_sets[0], materialize=False)
    float(fb.comparator_matrix(13).sum())

    stages = {k: [] for k in ("prepare", "detect", "extract", "assemble", "pack", "total")}
    for rep in range(reps):
        audios = audio_sets[rep % len(audio_sets)]
        t_all0 = time.perf_counter()

        t0 = time.perf_counter()
        pcm_all = gen._prepare_batch(audios)
        jax.block_until_ready(pcm_all)
        stages["prepare"].append(time.perf_counter() - t0)

        t0 = time.perf_counter()
        ctypes = gen._detect_content_types_batch(audios, pcm_all)
        stages["detect"].append(time.perf_counter() - t0)

        t0 = time.perf_counter()
        ct = ctypes[0]
        fc = gen._feature_config_for(ct, sr)
        ext = gen.extractor_factory.create_extractor(ct, fc)
        feats = gen._extract(ext, pcm_all, fc, sr)
        jax.block_until_ready(jax.tree_util.tree_leaves(feats))
        stages["extract"].append(time.perf_counter() - t0)

        t0 = time.perf_counter()
        from sonido_sonar_tpu.fingerprint.generator import (
            AudioFingerprint,
            generate_id,
        )

        fps = []
        for i, audio in enumerate(audios):
            fp = AudioFingerprint(
                id=generate_id(audio),
                stream_url="",
                content_type=ct,
                timestamp=time.time(),
                duration=audio.duration,
                sample_rate=sr,
                hop_size=256,
                channels=audio.channels,
                features=None,
                metadata={},
            )
            gen._add_metadata(fp, audio, ext, feats)
            fps.append(fp)
        stages["assemble"].append(time.perf_counter() - t0)

        t0 = time.perf_counter()
        from sonido_sonar_tpu.fingerprint.generator import FingerprintBatch

        fb = FingerprintBatch(fps, [(ct, list(range(batch)), feats)])
        float(fb.comparator_matrix(13).sum())
        stages["pack"].append(time.perf_counter() - t0)

        stages["total"].append(time.perf_counter() - t_all0)

    # end-to-end public call for cross-checking (sum of stages should
    # roughly match; divergence = cost the stage split itself hides)
    e2e = []
    for rep in range(reps):
        audios = audio_sets[rep % len(audio_sets)]
        t0 = time.perf_counter()
        fb = gen.generate_fingerprints_batch(audios, materialize=False)
        float(fb.comparator_matrix(13).sum())
        e2e.append(time.perf_counter() - t0)

    print(f"generate-batch stage breakdown ({batch}x{seconds}s, {reps} reps, median ms):")
    for k, v in stages.items():
        med = sorted(v)[len(v) // 2]
        print(f"  {k:9s} {med * 1000:8.1f}  (all: {[round(x * 1000, 1) for x in v]})")
    med_e2e = sorted(e2e)[len(e2e) // 2]
    print(f"  e2e call  {med_e2e * 1000:8.1f}  (all: {[round(x * 1000, 1) for x in e2e]})")


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 128,
        int(sys.argv[2]) if len(sys.argv) > 2 else 30,
        int(sys.argv[3]) if len(sys.argv) > 3 else 3,
    )
