"""Statistical / alignment primitives (reference: algorithms/stats).

The alignment core of the framework: DTW, cross-correlation, the hybrid
alignment analyzer, plus distance functions, clustering, entropy,
moments, and percentiles.
"""

from sonido_sonar_tpu.ops.stats.correlation import (  # noqa: F401
    CorrelationResult,
    cross_correlate,
    cross_correlate_fft,
    autocorrelate,
    z_normalize,
)
from sonido_sonar_tpu.ops.stats.dtw import DTWResult, dtw_align, dtw_align_vectors  # noqa: F401
