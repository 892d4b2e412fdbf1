"""Typed configuration + per-content-type preset tables.

Reference parity: fingerprint/config/config.go and
fingerprint/content_config.go — every preset constant is carried over
verbatim so golden-parity tests can lock behavior.
"""

from sonido_sonar_tpu.config.config import (  # noqa: F401
    AlignmentConfig,
    ComparisonConfig,
    ContentAwareConfig,
    ContentType,
    FeatureConfig,
    FingerprintConfig,
    alignment_config_for_content,
    comparison_config_for_content,
    default_alignment_config,
    default_comparison_config,
    default_fingerprint_config,
    to_content_type,
)
from sonido_sonar_tpu.config.content_config import (  # noqa: F401
    ComparisonSettings,
    ContentAwareConfigManager,
    ContentSettings,
    FeatureSettings,
    get_content_configs,
)
