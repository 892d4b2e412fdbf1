"""Audio value objects (transcode/decoder.go:21-64,117-143)."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Optional

import numpy as np


@dataclass
class StreamMetadata:
    """Probe results for one stream (decoder.go:117-130)."""

    codec: str = ""
    sample_rate: int = 0
    channels: int = 0
    duration: float = 0.0
    bit_rate: int = 0
    format_name: str = ""


@dataclass
class AudioMetadata:
    """Container-level metadata (decoder.go:132-143)."""

    url: str = ""
    format_name: str = ""
    duration: float = 0.0
    bit_rate: int = 0
    sample_rate: int = 0
    channels: int = 0
    codec: str = ""
    genre: str = ""
    station: str = ""
    title: str = ""
    extra: Dict[str, Any] = field(default_factory=dict)


@dataclass
class AudioData:
    """Decoded mono PCM (decoder.go:21-36).

    `pcm` is float32 on host (numpy); pipelines upload it once per batch.
    """

    pcm: np.ndarray
    sample_rate: int
    channels: int = 1
    metadata: Optional[AudioMetadata] = None

    @property
    def duration(self) -> float:
        return len(self.pcm) / float(self.sample_rate)

    def __len__(self) -> int:
        return len(self.pcm)
