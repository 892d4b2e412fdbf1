"""Cold-start management: AOT-prime the XLA persistent compile cache.

First-call compiles of the big programs run minutes on a cold process
(the fused Pallas kernels up to ~3 min each; a cold full bench >30 min).
XLA's persistent compilation cache makes every LATER process skip those
compiles entirely — but only for (program, shape) pairs that some
process has already built. `warmup()` is the deployment hook that
builds them deliberately: point it at the feature configs and batch
geometries a service will run, call it once per image/node (CI, a
deploy step, a container build), and every serving process that uses
the same cache directory jits straight from disk.

Typical use:

    from sonido_sonar_tpu import warmup
    report = warmup(
        feature_config=FeatureConfig(sample_rate=44100,
                                     window_size=1024, hop_size=256),
        batch_sizes=(128,), clip_seconds=(30,),
        cache_dir="/var/cache/sonido_jax",
    )

The warmed inputs are zeros — XLA executables are keyed on program +
shapes + flags, never on values, so a zeros run compiles exactly the
executables production traffic will request. Reference counterpart:
none (the Go reference has no compilation step); this is the TPU-native
cost the framework owes an answer for (VERDICT r4 item #7).
"""

from __future__ import annotations

import time
from typing import Dict, Iterable, Optional, Sequence, Tuple

import numpy as np

_DEFAULT_COMPONENTS = (
    "fingerprint",  # public generate_fingerprints_batch + comparator pack
    "alignment",    # batched hybrid aligner (monitor/measure path)
    "search",       # packed-corpus top-k search program
)


def enable_persistent_cache(
    cache_dir: str, min_compile_time_secs: float = 1.0
) -> None:
    """Point THIS process at a persistent XLA executable cache. Safe to
    call more than once; later calls win. Serving processes call this
    (or pass cache_dir= to warmup()) with the same directory the warmup
    run used."""
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs", min_compile_time_secs
    )


def cache_hit_counter():
    """Register a process-wide listener counting persistent-cache hits
    (the '/jax/compilation_cache/cache_hits' monitoring event). Returns
    a zero-arg callable yielding the count so far. Used by the warm-path
    assertion test; handy for deployment smoke checks."""
    from jax._src import monitoring

    hits = [0]

    def _listener(event: str, **kw) -> None:
        if event == "/jax/compilation_cache/cache_hits":
            hits[0] += 1

    monitoring.register_event_listener(_listener)
    return lambda: hits[0]


def warmup(
    feature_config=None,
    *,
    batch_sizes: Sequence[int] = (128,),
    clip_seconds: Sequence[float] = (30.0,),
    content_types: Optional[Iterable] = None,
    components: Sequence[str] = _DEFAULT_COMPONENTS,
    alignment_pairs: Sequence[int] = (1,),
    window_seconds: float = 60.0,
    max_lag_seconds: float = 30.0,
    corpus_sizes: Sequence[int] = (),
    cache_dir: Optional[str] = None,
    min_compile_time_secs: float = 1.0,
    group_buckets: bool = False,
) -> Dict[str, float]:
    """Compile (or load from the persistent cache) every program the
    given deployment geometry will run. Returns {stage: seconds}.

    feature_config: the production FeatureConfig (geometry + rate). The
        default matches the bench: 44.1 kHz, window 1024, hop 256.
    batch_sizes x clip_seconds: the [B, N] shapes generation will see.
    content_types: which per-content extractor programs to build
        (default: every type the detector can emit — UNKNOWN covers the
        reference's default routing; MUSIC adds the music extractor).
    components: subset of ("fingerprint", "alignment", "search").
    alignment_pairs: batch sizes for the hybrid aligner (LatencyMonitor
        uses 1; FleetMonitor uses its measure_batch).
    corpus_sizes: packed-corpus candidate counts for the top-k search
        program (skipped when empty).
    group_buckets: also compile the power-of-two sub-batch extractor
        variants that mixed-content batches route through (log2(B)
        extra full-program compiles per content type — only worth it
        when production batches genuinely mix content types).
    """
    import jax
    import jax.numpy as jnp

    if cache_dir is not None:
        enable_persistent_cache(cache_dir, min_compile_time_secs)

    from sonido_sonar_tpu.config.config import (
        ContentType,
        FeatureConfig,
        FingerprintConfig,
    )

    fc = feature_config or FeatureConfig(
        sample_rate=44100, window_size=1024, hop_size=256
    )
    sr = fc.sample_rate
    report: Dict[str, float] = {}

    def _stage(name: str, fn) -> None:
        t0 = time.perf_counter()
        fn()
        report[name] = time.perf_counter() - t0

    if "fingerprint" in components:
        from sonido_sonar_tpu.fingerprint import FingerprintGenerator
        from sonido_sonar_tpu.io.audio import AudioData

        gen = FingerprintGenerator(FingerprintConfig(feature_config=fc))
        cts = list(content_types) if content_types is not None else [
            ContentType.UNKNOWN,
            ContentType.MUSIC,
        ]
        for b in batch_sizes:
            for secs in clip_seconds:
                n = int(sr * secs)
                pcm = jnp.zeros((b, n), jnp.float32)

                def _fp(b=b, n=n, pcm=pcm):
                    # the public path end-to-end: stack program, detect
                    # program, detected-type extractor, stats packing
                    audios = [
                        AudioData(pcm=pcm[i], sample_rate=sr)
                        for i in range(b)
                    ]
                    fb = gen.generate_fingerprints_batch(
                        audios, materialize=False, pcm_matrix=pcm
                    )
                    fb.comparator_matrix(13).block_until_ready()
                    # every requested content type's extractor program
                    # (detection on zeros only exercises one route)
                    sizes = [b]
                    if group_buckets:
                        g = 1
                        while g < b:
                            sizes.append(g)
                            g <<= 1
                    for ct in cts:
                        fcc = gen._feature_config_for(ct, sr)
                        ext = gen.extractor_factory.create_extractor(ct, fcc)
                        for g in sizes:
                            feats = gen._extract(ext, pcm[:g], fcc, sr)
                            jax.block_until_ready(
                                jax.tree_util.tree_leaves(feats)
                            )

                _stage(f"fingerprint[b={b},s={secs:g}]", _fp)

    if "alignment" in components:
        from sonido_sonar_tpu.ops.stats.batched_alignment import (
            batched_align_audio,
        )

        wn = int(window_seconds * sr)
        max_off = min(
            int(max_lag_seconds * sr) + 32 * fc.hop_size, 3 * wn // 4
        )
        for p in alignment_pairs:
            z = jnp.zeros((p, wn), jnp.float32)

            def _al(z=z):
                out = batched_align_audio(
                    z, z, sr,
                    window_size=fc.window_size, hop_size=fc.hop_size,
                    max_lag_seconds=max_lag_seconds,
                    energy_impl="cumsum", refine=True,
                    max_offset_samples=max_off,
                )
                jax.block_until_ready(list(out.values()))

            _stage(f"alignment[pairs={p}]", _al)

    if "search" in components and corpus_sizes:
        from sonido_sonar_tpu.fingerprint.device_compare import (
            layout_size,
            topk_similarity,
        )

        d = layout_size(13)
        wvec = jnp.asarray(
            np.array([0.35, 0.25, 0.10, 0.20, 0.10, 0.10], np.float32)
        )
        for c in corpus_sizes:
            corpus = jnp.zeros((c, d), jnp.float32)
            q = jnp.zeros((d,), jnp.float32)

            def _se(corpus=corpus, q=q, c=c):
                out = topk_similarity(
                    q, corpus, wvec, jnp.ones(c, bool), k=16
                )
                jax.block_until_ready(list(out.values()))

            _stage(f"search[corpus={c}]", _se)

    return report
