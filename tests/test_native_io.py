"""Native C++ wavio loader: parity with the pure-Python WAV path."""

import numpy as np
import pytest

from sonido_sonar_tpu.io import native
from sonido_sonar_tpu.io.decode import Decoder, write_wav
from sonido_sonar_tpu.io.synth import sine

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native wavio not built (no g++?)"
)

SR = 22050


def test_roundtrip_16bit(tmp_path):
    x = sine(440, 0.5, SR, 0.5)
    data = native.encode_wav16(x, SR)
    y, rate, ch = native.decode_wav_bytes(data)
    assert rate == SR and ch == 1
    assert len(y) == len(x)
    np.testing.assert_allclose(y, x, atol=2.0 / 32768)  # 2 LSB quantization


def test_matches_python_wav_path(tmp_path):
    x = sine(220, 0.3, SR, 0.4)
    p = str(tmp_path / "t.wav")
    write_wav(p, x, SR)
    with open(p, "rb") as f:
        data = f.read()
    y_native, rate, _ = native.decode_wav_bytes(data)
    # python path via wave module
    import io as _io
    import wave

    with wave.open(_io.BytesIO(data), "rb") as w:
        frames = w.readframes(w.getnframes())
    y_py = np.frombuffer(frames, dtype="<i2").astype(np.float32) / 32768.0
    np.testing.assert_allclose(y_native, y_py, atol=1e-6)


def test_bytes_to_f32():
    x = np.random.default_rng(0).standard_normal(100).astype(np.float32)
    out = native.bytes_to_f32(x.tobytes(), "f32le")
    np.testing.assert_array_equal(out, x)
    d = x.astype(np.float64)
    out64 = native.bytes_to_f32(d.tobytes(), "f64le")
    np.testing.assert_allclose(out64, x, atol=1e-6)
    s16 = (x * 0.4 * 32767).astype("<i2")
    out16 = native.bytes_to_f32(s16.tobytes(), "s16le")
    np.testing.assert_allclose(out16, s16.astype(np.float32) / 32768.0, atol=1e-6)


def test_resample():
    x = sine(100, 1.0, 8000, 0.5)
    y = native.resample_linear(x, 8000, 16000)
    assert len(y) == pytest.approx(16000, abs=2)
    t = np.arange(len(y)) / 16000
    expected = 0.5 * np.sin(2 * np.pi * 100 * t)
    assert np.abs(y[100:-100] - expected[100:-100]).max() < 0.01


def test_decoder_uses_native(tmp_path):
    x = sine(440, 0.5, SR, 0.5)
    p = str(tmp_path / "clip.wav")
    write_wav(p, x, SR)
    dec = Decoder()
    audio = dec.decode_file(p)
    assert audio.sample_rate == 44100  # resampled to default target
    assert abs(audio.duration - 0.5) < 0.01


def test_stereo_mixdown():
    # hand-build a stereo 16-bit wav: L = tone, R = silence -> mono = tone/2
    import struct

    sr, n = 8000, 800
    tone = (0.5 * np.sin(2 * np.pi * 440 * np.arange(n) / sr) * 32767).astype("<i2")
    silent = np.zeros(n, "<i2")
    interleaved = np.empty(n * 2, "<i2")
    interleaved[0::2] = tone
    interleaved[1::2] = silent
    data_bytes = interleaved.tobytes()
    header = b"RIFF" + struct.pack("<I", 36 + len(data_bytes)) + b"WAVE"
    header += b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, sr, sr * 4, 4, 16)
    header += b"data" + struct.pack("<I", len(data_bytes))
    y, rate, ch = native.decode_wav_bytes(header + data_bytes)
    assert ch == 2 and rate == sr
    np.testing.assert_allclose(
        y, tone.astype(np.float32) / 32768.0 / 2.0, atol=1e-5
    )
