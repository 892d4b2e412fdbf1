"""L0 host-side audio ingest: decode -> float32 PCM -> device arrays.

Reference parity: transcode/decoder.go. The FFmpeg/ffprobe subprocess
boundary is preserved (gated on binary availability); a pure-Python WAV
path covers environments without ffmpeg. The contract is the same as the
reference's: downstream code sees mono float PCM at the target rate.
"""

from sonido_sonar_tpu.io.audio import AudioData, AudioMetadata, StreamMetadata  # noqa: F401
from sonido_sonar_tpu.io.decode import (  # noqa: F401
    Decoder,
    DecoderConfig,
    content_optimized_decoder_config,
    default_decoder_config,
)
from sonido_sonar_tpu.io.synth import chirp, shift_signal, sine, white_noise  # noqa: F401
