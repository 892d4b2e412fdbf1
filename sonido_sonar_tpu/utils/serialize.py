"""Fingerprint persistence: npz tensors + JSON metadata.

The reference serializes fingerprints as JSON value objects (struct tags
throughout extractors/features.go; Complex matrices excluded,
analyzers/spectral.go:25). Here the tensor payload goes to npz (compact,
mmap-able) and the metadata to JSON — the SURVEY.md section 5 plan for
the checkpoint/store subsystem.
"""

from __future__ import annotations

import dataclasses
import io
import json
from typing import Any, Dict, Optional

import numpy as np

from sonido_sonar_tpu.config.config import ContentType
from sonido_sonar_tpu.extractors.features import (
    EnergyFeatures,
    ExtractedFeatures,
    HarmonicFeatures,
    SpectralFeatures,
    SpeechFeatures,
    TemporalFeatures,
)
from sonido_sonar_tpu.fingerprint.generator import AudioFingerprint

_SUBSTRUCTS = {
    "spectral_features": SpectralFeatures,
    "speech_features": SpeechFeatures,
    "temporal_features": TemporalFeatures,
    "energy_features": EnergyFeatures,
    "harmonic_features": HarmonicFeatures,
}


def _flatten_features(features: ExtractedFeatures) -> Dict[str, np.ndarray]:
    arrays: Dict[str, np.ndarray] = {}
    if features.mfcc is not None:
        arrays["mfcc"] = np.asarray(features.mfcc)
    if features.chroma_features is not None:
        arrays["chroma_features"] = np.asarray(features.chroma_features)
    for prefix, cls in _SUBSTRUCTS.items():
        sub = getattr(features, prefix)
        if sub is None:
            continue
        for f in dataclasses.fields(cls):
            v = getattr(sub, f.name)
            if v is not None:
                arrays[f"{prefix}.{f.name}"] = np.asarray(v)
    return arrays


def _unflatten_features(arrays: Dict[str, np.ndarray]) -> ExtractedFeatures:
    feats = ExtractedFeatures(metadata={})
    if "mfcc" in arrays:
        feats.mfcc = arrays["mfcc"]
    if "chroma_features" in arrays:
        feats.chroma_features = arrays["chroma_features"]
    for prefix, cls in _SUBSTRUCTS.items():
        keys = {k.split(".", 1)[1]: k for k in arrays if k.startswith(prefix + ".")}
        if not keys:
            continue
        sub = cls(**{name: arrays[k] for name, k in keys.items()})
        setattr(feats, prefix, sub)
    return feats


def save_fingerprint_npz(path: str, fp: AudioFingerprint) -> None:
    arrays = _flatten_features(fp.features)
    header = json.dumps(
        {
            "id": fp.id,
            "stream_url": fp.stream_url,
            "content_type": fp.content_type.value,
            "timestamp": fp.timestamp,
            "duration": fp.duration,
            "sample_rate": fp.sample_rate,
            "hop_size": fp.hop_size,
            "channels": fp.channels,
            "feature_weights": fp.metadata.get("feature_weights", {}),
            "extractor_name": fp.metadata.get("extractor_name", ""),
        }
    )
    np.savez_compressed(path, __header__=np.frombuffer(header.encode(), np.uint8), **arrays)


def load_fingerprint_npz(path: str) -> AudioFingerprint:
    data = np.load(path, allow_pickle=False)
    header = json.loads(bytes(data["__header__"]).decode())
    arrays = {k: data[k] for k in data.files if k != "__header__"}
    features = _unflatten_features(arrays)
    fp = AudioFingerprint(
        id=header["id"],
        stream_url=header["stream_url"],
        content_type=ContentType(header["content_type"]),
        timestamp=header["timestamp"],
        duration=header["duration"],
        sample_rate=header["sample_rate"],
        hop_size=header["hop_size"],
        channels=header["channels"],
        features=features,
        metadata={
            "feature_weights": header.get("feature_weights", {}),
            "extractor_name": header.get("extractor_name", ""),
        },
    )
    return fp


def fingerprint_to_json(fp: AudioFingerprint) -> str:
    """Reference-style full-JSON export (arrays as nested lists)."""
    arrays = {k: v.tolist() for k, v in _flatten_features(fp.features).items()}
    return json.dumps(
        {
            "id": fp.id,
            "stream_url": fp.stream_url,
            "content_type": fp.content_type.value,
            "duration": fp.duration,
            "sample_rate": fp.sample_rate,
            "hop_size": fp.hop_size,
            "channels": fp.channels,
            "features": arrays,
        }
    )
