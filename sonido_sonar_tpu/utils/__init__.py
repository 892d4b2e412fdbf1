"""Small shared utilities (serialization, timers)."""

from sonido_sonar_tpu.utils.serialize import (  # noqa: F401
    fingerprint_to_json,
    load_fingerprint_npz,
    save_fingerprint_npz,
)
from sonido_sonar_tpu.utils.metrics import (  # noqa: F401
    Metrics,
    get_global_metrics,
    profiler_trace,
)
