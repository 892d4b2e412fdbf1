"""L3 content-specific feature extraction + alignment orchestration.

Reference parity: fingerprint/extractors/*.go.
"""

from sonido_sonar_tpu.extractors.features import (  # noqa: F401
    EnergyFeatures,
    ExtractedFeatures,
    HarmonicFeatures,
    SpectralFeatures,
    SpeechFeatures,
    TemporalFeatures,
)
from sonido_sonar_tpu.extractors.base import (  # noqa: F401
    FeatureExtractorFactory,
    create_extractor,
)
from sonido_sonar_tpu.extractors.speech import SpeechFeatureExtractor  # noqa: F401
from sonido_sonar_tpu.extractors.music import MusicFeatureExtractor  # noqa: F401
from sonido_sonar_tpu.extractors.sports import (  # noqa: F401
    MixedFeatureExtractor,
    SportsFeatureExtractor,
)
from sonido_sonar_tpu.extractors.alignment import (  # noqa: F401
    AlignmentExtractor,
    AlignmentFeatures,
)
