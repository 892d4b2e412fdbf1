"""Flagship pipeline models.

This framework's "model families" are its content-aware fingerprint
pipelines (the analog of the reference's extractor classes), packaged as
jittable end-to-end programs:

  - FingerprintModel: PCM -> feature tensors (the flagship forward step;
    see sonido_sonar_tpu.parallel.pipeline.batched_fingerprint_features)
  - alignment pair model: energy series pair -> offset/confidence

Host-orchestrated, reference-shaped APIs live in
sonido_sonar_tpu.fingerprint / .extractors.
"""

from sonido_sonar_tpu.models.pipeline import FingerprintModel  # noqa: F401
