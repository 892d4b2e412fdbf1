"""Per-stage wall-clock breakdown of the flagship pipelines on the real
TPU chip.

Each stage is jitted and fenced independently (host fetch of a scalar
reduction — block_until_ready is not a reliable fence over the remote
tunnel, see CLAUDE.md), so numbers include the ~30 ms dispatch+fetch
round trip; subtract the `noop` line for per-stage compute. Inputs are
pre-uploaded once.

Usage: python tools/profile_stages.py [batch] [seconds]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def bench(name, fn, *args, iters=4):
    out = fn(*args)
    jax.block_until_ready(out)
    # fence via host fetch of one leaf
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.sum(leaf))
        times.append(time.perf_counter() - t0)
    med = sorted(times)[len(times) // 2]
    print(f"{name:42s} {med * 1000:8.2f} ms")
    return out


def main() -> None:
    from sonido_sonar_tpu.config.config import WindowType
    from sonido_sonar_tpu.ops import spectral as S
    from sonido_sonar_tpu.ops import temporal as T
    from sonido_sonar_tpu.ops.chroma import chroma_from_magnitude
    from sonido_sonar_tpu.ops.filters import pre_emphasis
    from sonido_sonar_tpu.ops.framing import frame_signal
    from sonido_sonar_tpu.ops.mfcc import MFCCParams, mfcc
    from sonido_sonar_tpu.ops.pallas_stft import (
        pallas_stft_available,
        stft_magnitude_pallas,
    )
    from sonido_sonar_tpu.ops.pitch import PitchParams, yin_pitch
    from sonido_sonar_tpu.parallel.pipeline import (
        batched_fingerprint_features,
        batched_speech_analysis,
    )

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    secs = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    sr, w, hop = 44100, 1024, 256
    n = sr * secs

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, n)).astype(np.float32) * 0.1)
    jax.block_until_ready(x)
    print(f"batch={batch} clip={secs}s  pallas={pallas_stft_available(w, hop)}")

    bench("noop (dispatch+fetch floor)", jax.jit(lambda v: v.sum()), x[:, :1024])

    xp = bench("pre_emphasis", jax.jit(lambda v: pre_emphasis(v, 0.97)), x)

    mag = bench(
        "pallas STFT magnitude",
        jax.jit(lambda v: stft_magnitude_pallas(v, w, hop, WindowType.HANN)),
        xp,
    )
    bench(
        "mfcc (mel+log+DCT+lifter)",
        jax.jit(lambda m: mfcc(m, sr, w, MFCCParams(num_coefficients=13))),
        mag,
    )
    bench("chroma fold", jax.jit(lambda m: chroma_from_magnitude(m, sr, w)), mag)
    bench(
        "descriptor bundle",
        jax.jit(lambda m: S.spectral_descriptor_bundle(m, sr)),
        mag,
    )
    bench(
        "spectral contrast (6 bands)",
        jax.jit(lambda m: S.spectral_contrast(m, sr, 6)),
        mag,
    )
    bench(
        "zcr_from_signal",
        jax.jit(lambda v: S.zcr_from_signal(v, w, hop, sr)),
        xp,
    )
    bench(
        "short_time_energy_cumsum",
        jax.jit(lambda v: T.short_time_energy_cumsum(v, w, hop)),
        xp,
    )

    pframes = bench(
        "frame_signal 1024/512", jax.jit(lambda v: frame_signal(v, 1024, 512)), xp
    )
    bench(
        "yin_pitch (hop 512 frames)",
        jax.jit(lambda f: yin_pitch(f, PitchParams(sample_rate=sr, window_size=1024))),
        pframes,
    )

    bench(
        "FULL batched_fingerprint_features",
        lambda v: batched_fingerprint_features(
            v, sample_rate=sr, window_size=w, hop_size=hop
        ),
        x,
    )

    # ---- speech stack (batch 32 to match bench.py) ----
    sb = min(batch, 32)
    xs = x[:sb]
    from sonido_sonar_tpu.ops import speech as SP

    bench(
        "speech: detect_speech",
        jax.jit(jax.vmap(lambda v: SP.detect_speech(v, sr))),
        xs,
    )
    bench(
        "speech: analyze_formants",
        jax.jit(jax.vmap(lambda v: SP.analyze_formants(v, sr))),
        xs,
    )
    bench(
        "speech: voice quality (yin 1024/256 + hnr)",
        jax.jit(jax.vmap(lambda v: SP.analyze_voice_quality(v, sr))),
        xs,
    )
    f256 = jax.jit(lambda v: frame_signal(v, 1024, 256))(xs)
    jax.block_until_ready(f256)
    bench(
        "speech:   - yin_pitch hop-256 frames alone",
        jax.jit(
            lambda f: yin_pitch(
                f, PitchParams(sample_rate=sr, window_size=1024,
                               min_freq=50.0, max_freq=500.0)
            )
        ),
        f256,
    )
    bench(
        "speech:   - hnr_acf (full-signal FFT) alone",
        jax.jit(lambda v: SP.hnr_acf(v, sr, jnp.full((v.shape[0],), 120.0))),
        xs,
    )
    bench(
        "FULL batched_speech_analysis",
        lambda v: batched_speech_analysis(v, sr),
        xs,
    )


if __name__ == "__main__":
    main()
