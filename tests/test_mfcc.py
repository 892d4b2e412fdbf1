"""Mel filterbank + MFCC parity vs float64 re-derivation of mfcc.go."""

import jax.numpy as jnp
import numpy as np
import pytest

from sonido_sonar_tpu.io.synth import sine, white_noise
from sonido_sonar_tpu.ops.mel import (
    apply_filterbank,
    hz_to_mel,
    mel_filterbank,
    mel_to_hz,
)
from sonido_sonar_tpu.ops.mfcc import MFCCParams, dct_matrix, lifter_vector, mfcc
from sonido_sonar_tpu.ops.stft import stft

SR = 44100


def test_mel_roundtrip():
    hz = np.array([0.0, 100.0, 440.0, 1000.0, 8000.0, 22050.0])
    np.testing.assert_allclose(mel_to_hz(hz_to_mel(hz)), hz, rtol=1e-10)


def test_mel_anchor():
    """mel(1000 Hz) = 2595 log10(1 + 1000/700) ~= 999.9855 (mel_scale.go:20)."""
    assert hz_to_mel(1000.0) == pytest.approx(999.9855, abs=1e-3)


def numpy_filterbank(num_filters, fft_size, sr, low, high):
    """Direct float64 port of mel_scale.go:29-87 loop structure."""
    low_mel = 2595.0 * np.log10(1.0 + low / 700.0)
    high_mel = 2595.0 * np.log10(1.0 + high / 700.0)
    mel_points = [
        low_mel + i * (high_mel - low_mel) / (num_filters + 1)
        for i in range(num_filters + 2)
    ]
    hz_points = [700.0 * (10 ** (m / 2595.0) - 1.0) for m in mel_points]
    bins = [
        min(int(np.floor((fft_size + 1.0) * hz / sr + 0.5)), fft_size // 2)
        for hz in hz_points
    ]
    fb = np.zeros((num_filters, fft_size // 2 + 1))
    for m in range(1, num_filters + 1):
        left, center, right = bins[m - 1], bins[m], bins[m + 1]
        for k in range(left, min(center, fb.shape[1])):
            if center != left:
                fb[m - 1, k] = (k - left) / (center - left)
        for k in range(center, min(right, fb.shape[1])):
            if right != center:
                fb[m - 1, k] = (right - k) / (right - center)
    return fb


def test_filterbank_parity():
    got = mel_filterbank(26, 2048, SR, 0.0, SR / 2.0, dtype=np.float64)
    ref = numpy_filterbank(26, 2048, SR, 0.0, SR / 2.0)
    np.testing.assert_allclose(got, ref, atol=1e-12)


def test_filterbank_rows_nonzero():
    fb = mel_filterbank(26, 2048, SR, 0.0, SR / 2.0)
    assert (np.asarray(fb).sum(axis=1) > 0).all()


def test_dct_orthonormal():
    """Full square DCT-II matrix is orthonormal (mfcc.go:194-212)."""
    d = dct_matrix(26, 26, dtype=np.float64)
    np.testing.assert_allclose(d @ d.T, np.eye(26), atol=1e-12)


def test_lifter():
    """lifter[i] = 1 + 11 sin(pi i/22), C0 = 1 (mfcc.go:230-245)."""
    lv = lifter_vector(13, 22.0, dtype=np.float64)
    assert lv[0] == 1.0
    i = np.arange(1, 13)
    np.testing.assert_allclose(lv[1:], 1.0 + 11.0 * np.sin(np.pi * i / 22.0), rtol=1e-9)


def numpy_mfcc_frame(mag, sr, fft_size, n_coef=13, n_mel=26):
    power = mag.astype(np.float64) ** 2
    fb = numpy_filterbank(n_mel, fft_size, sr, 0.0, sr / 2.0)
    mel_spec = fb @ power
    log_mel = np.where(mel_spec > 0, np.log(np.maximum(mel_spec, 1e-300)), np.log(1e-10))
    k = np.arange(n_coef)[:, None]
    n = np.arange(n_mel)[None, :]
    d = np.cos(np.pi * k * (n + 0.5) / n_mel)
    d[0] *= np.sqrt(1.0 / n_mel)
    d[1:] *= np.sqrt(2.0 / n_mel)
    c = d @ log_mel
    lift = 1.0 + 11.0 * np.sin(np.pi * np.arange(n_coef) / 22.0)
    lift[0] = 1.0
    return c * lift


def test_mfcc_parity():
    x = (sine(440, 0.3, SR) + white_noise(0.3, SR, 0.05)).astype(np.float32)
    res = stft(jnp.asarray(x), 2048, 512)
    mag = np.asarray(res.magnitude)
    got = np.asarray(mfcc(res.magnitude, SR, 2048))
    for t in [0, mag.shape[0] // 2, mag.shape[0] - 1]:
        ref = numpy_mfcc_frame(mag[t], SR, 2048)
        np.testing.assert_allclose(got[t], ref, atol=5e-3, rtol=1e-3)


def test_mfcc_shape_and_batch():
    x = np.stack([sine(440, 0.2, SR), sine(880, 0.2, SR)])
    res = stft(jnp.asarray(x), 1024, 256)
    out = mfcc(res.magnitude, SR, 1024, MFCCParams(num_coefficients=13))
    assert out.shape == (2, res.time_frames, 13)


def test_mfcc_discriminates():
    """Different tones give different MFCCs; same tone gives the same."""
    a = np.asarray(mfcc(stft(jnp.asarray(sine(440, 0.2, SR)), 1024, 256).magnitude, SR, 1024)).mean(0)
    b = np.asarray(mfcc(stft(jnp.asarray(sine(880, 0.2, SR)), 1024, 256).magnitude, SR, 1024)).mean(0)
    a2 = np.asarray(mfcc(stft(jnp.asarray(sine(440, 0.2, SR)), 1024, 256).magnitude, SR, 1024)).mean(0)
    assert np.linalg.norm(a - b) > 1.0
    np.testing.assert_allclose(a, a2, atol=1e-5)
