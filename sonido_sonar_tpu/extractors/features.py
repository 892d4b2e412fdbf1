"""ExtractedFeatures schema as a pytree of fixed-shape arrays.

Reference parity: fingerprint/extractors/features.go:5-124. Ragged Go
slices become fixed-shape jnp arrays plus (mask, count) pairs for
variable-length results (onsets, pauses, formants) — the TPU contract
from SURVEY.md hard-part #2. All sub-structures are optional (None when
the content config disables them), mirroring the omitempty JSON tags.
"""

from __future__ import annotations

from dataclasses import dataclass, field, fields as dc_fields
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def _register(cls):
    """Register a dataclass of (optional) arrays as a pytree node."""
    names = [f.name for f in dc_fields(cls) if f.name != "metadata"]

    def flatten(obj):
        children = tuple(getattr(obj, n) for n in names)
        aux = getattr(obj, "metadata", None)
        return children, aux

    def unflatten(aux, children):
        kwargs = dict(zip(names, children))
        if any(f.name == "metadata" for f in dc_fields(cls)):
            kwargs["metadata"] = aux if aux is not None else {}
        return cls(**kwargs)

    jax.tree_util.register_pytree_node(cls, flatten, unflatten)
    return cls


@_register
@dataclass
class SpectralFeatures:
    """features.go:32-44. All series are [..., T]; contrast is
    [..., T, num_bands]."""

    spectral_centroid: jnp.ndarray = None
    spectral_rolloff: jnp.ndarray = None
    spectral_bandwidth: jnp.ndarray = None
    spectral_flatness: jnp.ndarray = None
    spectral_crest: jnp.ndarray = None
    spectral_slope: jnp.ndarray = None
    spectral_flux: jnp.ndarray = None
    zero_crossing_rate: jnp.ndarray = None
    spectral_contrast: Optional[jnp.ndarray] = None


@_register
@dataclass
class SpeechFeatures:
    """features.go:49-71. formant_frequencies is [..., T_f, max_formants]
    with formant_count giving validity."""

    formant_frequencies: Optional[jnp.ndarray] = None
    formant_count: Optional[jnp.ndarray] = None
    vocal_tract_length: jnp.ndarray = None          # scalar [...]
    voicing_probability: jnp.ndarray = None         # [..., T_p]
    spectral_tilt: jnp.ndarray = None               # [..., T_p]
    speech_rate: jnp.ndarray = None                 # scalar [...]
    pause_duration: jnp.ndarray = None              # [..., max_pauses]
    pause_count: jnp.ndarray = None                 # scalar [...]
    jitter: jnp.ndarray = None                      # scalar [...]
    shimmer: jnp.ndarray = None                     # scalar [...]


@_register
@dataclass
class TemporalFeatures:
    """features.go:76-97."""

    rms_energy: jnp.ndarray = None          # [..., T_e]
    peak_amplitude: jnp.ndarray = None      # scalar [...]
    average_amplitude: jnp.ndarray = None   # scalar [...]
    dynamic_range: jnp.ndarray = None       # scalar [...]
    crest_factor: Optional[jnp.ndarray] = None  # [..., T_e]
    silence_ratio: jnp.ndarray = None       # scalar [...]
    activity_level: Optional[jnp.ndarray] = None
    onset_density: jnp.ndarray = None       # scalar [...]
    onset_mask: Optional[jnp.ndarray] = None  # [..., T_e-1] bool
    attack_time: Optional[jnp.ndarray] = None  # [..., T_e-1] (0 off-onset)
    envelope_shape: jnp.ndarray = None      # [..., T_env]
    tempo_bpm: Optional[jnp.ndarray] = None  # scalar [...] (music extractor)


@_register
@dataclass
class EnergyFeatures:
    """features.go:102-113."""

    short_time_energy: jnp.ndarray = None   # [..., T_e]
    energy_variance: jnp.ndarray = None     # scalar [...]
    energy_entropy: jnp.ndarray = None      # [..., T_e]
    loudness_range: jnp.ndarray = None      # scalar [...]
    low_energy_ratio: jnp.ndarray = None    # [..., T]
    high_energy_ratio: jnp.ndarray = None   # [..., T]


@_register
@dataclass
class HarmonicFeatures:
    """features.go:118-131."""

    pitch_estimate: jnp.ndarray = None       # [..., T_p]
    pitch_confidence: jnp.ndarray = None     # [..., T_p]
    voicing_strength: jnp.ndarray = None     # [..., T_p]
    harmonic_ratio: jnp.ndarray = None       # [..., T_p]
    inharmonicity_ratio: jnp.ndarray = None  # [..., T_p]
    tonal_centroid: jnp.ndarray = None       # [..., T_p]


@_register
@dataclass
class ExtractedFeatures:
    """features.go:5-27: the fingerprint payload."""

    spectral_features: Optional[SpectralFeatures] = None
    mfcc: Optional[jnp.ndarray] = None            # [..., T, C]
    chroma_features: Optional[jnp.ndarray] = None  # [..., T, 12]
    speech_features: Optional[SpeechFeatures] = None
    temporal_features: Optional[TemporalFeatures] = None
    energy_features: Optional[EnergyFeatures] = None
    harmonic_features: Optional[HarmonicFeatures] = None
    metadata: Dict[str, Any] = field(default_factory=dict)


def to_numpy(tree):
    """Pull a feature pytree to host numpy (for JSON export)."""
    return jax.tree_util.tree_map(
        lambda x: np.asarray(x) if isinstance(x, jnp.ndarray) else x, tree
    )
