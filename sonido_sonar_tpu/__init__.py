"""sonido-sonar-tpu: TPU-native audio fingerprinting + temporal alignment.

A ground-up JAX/XLA/Pallas rebuild of the capability surface of
RyanBlaney/sonido-sonar (a pure-Go audio fingerprinting library): audio
decode -> content-aware acoustic feature extraction ("fingerprints") ->
similarity comparison -> temporal alignment (DTW + FFT cross-correlation)
for CDN end-to-end latency measurement.

Design stance (see SURVEY.md section 7): everything after decode is a pure
function over [B, T, ...] float32 tensors resident in HBM, jitted end to
end. Per-frame loops in the reference collapse into batched fused XLA
kernels; variable-length results become fixed-shape tensors plus validity
masks; scale-out is a sharded batch axis over a `jax.sharding.Mesh`.

Layer map (mirrors the reference's 5 layers):
  io/          L0  host-side decode -> device arrays
  logging/     L0  structured logging
  ops/         L1  DSP primitives (windows, stft, mfcc, chroma, speech,
                   temporal, filters, stats: dtw/xcorr/distance/...)
  config/      L2  typed configs + per-content preset tables
  extractors/  L3  content-specific feature extraction + alignment
  fingerprint/ L4  public API: generate, detect, compare
  parallel/        mesh/sharding utilities (the TPU replacement for the
                   reference's goroutine worker pools)
"""

__version__ = "0.1.0"

from sonido_sonar_tpu.config import (  # noqa: F401
    AlignmentConfig,
    ComparisonConfig,
    ContentType,
    FeatureConfig,
    FingerprintConfig,
)

from sonido_sonar_tpu.monitor import (  # noqa: F401
    FleetMonitor,
    LatencyMeasurement,
    LatencyMonitor,
)

from sonido_sonar_tpu.warmup import (  # noqa: F401
    enable_persistent_cache,
    warmup,
)
