"""Fingerprint persistence: npz round-trip + JSON export."""

import numpy as np
import pytest

from sonido_sonar_tpu.config.config import FeatureConfig, FingerprintConfig
from sonido_sonar_tpu.fingerprint import FingerprintComparator, FingerprintGenerator
from sonido_sonar_tpu.io.audio import AudioData, AudioMetadata
from sonido_sonar_tpu.io.synth import speech_like
from sonido_sonar_tpu.utils import (
    fingerprint_to_json,
    load_fingerprint_npz,
    save_fingerprint_npz,
)

SR = 8000


def test_npz_roundtrip(tmp_path):
    clip = speech_like(2.0, SR)
    gen = FingerprintGenerator(
        FingerprintConfig(feature_config=FeatureConfig(sample_rate=SR))
    )
    fp = gen.generate_fingerprint(
        AudioData(clip, SR, metadata=AudioMetadata(genre="talk"))
    )
    p = str(tmp_path / "fp.npz")
    save_fingerprint_npz(p, fp)
    fp2 = load_fingerprint_npz(p)
    assert fp2.id == fp.id
    assert fp2.content_type == fp.content_type
    assert fp2.sample_rate == SR
    np.testing.assert_allclose(
        np.asarray(fp.features.mfcc), fp2.features.mfcc, atol=1e-6
    )
    # a loaded fingerprint compares as identical to its source
    res = FingerprintComparator().compare(fp, fp2)
    assert res.overall_similarity > 0.999


def test_json_export():
    import json

    clip = speech_like(1.0, SR)
    gen = FingerprintGenerator(
        FingerprintConfig(feature_config=FeatureConfig(sample_rate=SR))
    )
    fp = gen.generate_fingerprint(
        AudioData(clip, SR, metadata=AudioMetadata(genre="talk"))
    )
    blob = json.loads(fingerprint_to_json(fp))
    assert blob["id"] == fp.id
    assert "mfcc" in blob["features"]
    assert len(blob["features"]["mfcc"]) == fp.features.mfcc.shape[0]
