"""Small shared utilities (serialization, timers)."""

from sonido_sonar_tpu.utils.serialize import (  # noqa: F401
    fingerprint_to_json,
    load_fingerprint_npz,
    save_fingerprint_npz,
)
