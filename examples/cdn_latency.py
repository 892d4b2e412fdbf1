"""Measure CDN end-to-end latency between two audio files.

Usage: python examples/cdn_latency.py source.wav cdn.wav [max_lag_seconds]
"""

import sys

import jax.numpy as jnp

from sonido_sonar_tpu.config.config import FeatureConfig, FingerprintConfig
from sonido_sonar_tpu.extractors import AlignmentExtractor
from sonido_sonar_tpu.fingerprint import FingerprintGenerator
from sonido_sonar_tpu.io.decode import Decoder


def main(src_path: str, cdn_path: str, max_lag: float = 30.0) -> None:
    dec = Decoder()
    source = dec.decode_file(src_path)
    cdn = dec.decode_file(cdn_path)

    cfg = FeatureConfig(
        sample_rate=source.sample_rate, window_size=1024, hop_size=256
    )
    gen = FingerprintGenerator(FingerprintConfig(feature_config=cfg))
    fp_src = gen.generate_fingerprint(source)
    fp_cdn = gen.generate_fingerprint(cdn)

    ext = AlignmentExtractor(cfg, max_lag_seconds=max_lag)
    al = ext.extract_alignment_features(
        fp_src.features, fp_cdn.features,
        jnp.asarray(source.pcm), jnp.asarray(cdn.pcm), source.sample_rate,
    )
    refined = ext.refine_offset_with_pcm(
        jnp.asarray(source.pcm), jnp.asarray(cdn.pcm),
        source.sample_rate, al.temporal_offset,
    )
    print(f"content type : {fp_src.content_type.value}")
    print(f"latency      : {refined*1000:.2f} ms "
          f"(frame-level {al.temporal_offset*1000:.1f} ms)")
    print(f"confidence   : {al.offset_confidence:.2f} ({al.method})")
    print(f"similarity   : {al.alignment_similarity:.3f}")
    for k, v in ext.get_alignment_summary(al).items():
        print(f"  {k}: {v}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], float(sys.argv[3]) if len(sys.argv) > 3 else 30.0)
