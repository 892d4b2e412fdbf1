"""L4 public API: generate, detect, compare.

Reference parity: fingerprint/*.go top level.
"""

from sonido_sonar_tpu.fingerprint.generator import (  # noqa: F401
    AudioFingerprint,
    FingerprintBatch,
    FingerprintGenerator,
)
from sonido_sonar_tpu.fingerprint.batching import (  # noqa: F401
    AudioBucket,
    batch_audios,
)
from sonido_sonar_tpu.fingerprint.content_detector import (  # noqa: F401
    AcousticFeatures,
    ContentDetector,
)
from sonido_sonar_tpu.fingerprint.comparison import (  # noqa: F401
    FingerprintComparator,
    Match,
    SimilarityResult,
    get_similarity_statistics,
)
