"""Polyphase Kaiser-sinc resampler (VERDICT round-2 item #8).

The reference always resamples through ffmpeg's soxr
(transcode/decoder.go:75-83); the native WAV ingest path (the only path
in ffmpeg-less environments) must match that grade: stopband > 60 dB on
anything that would alias, flat passband, and exact agreement with a
brute-force float64 zero-stuff evaluation of the same filter.
"""

from __future__ import annotations

import numpy as np
import pytest

from sonido_sonar_tpu.io.decode import (
    _resample_linear,
    _resample_polyphase,
    design_resample_filter,
)
from math import gcd


def _brute_force(x, sr_in, sr_out):
    """Direct float64 evaluation: y[n] = sum_j x[j] h[nM + D - jL]."""
    g = gcd(sr_in, sr_out)
    L, M = sr_out // g, sr_in // g
    h = design_resample_filter(L, M)
    N = len(h)
    D = (N - 1) // 2
    x = np.asarray(x, dtype=np.float64)
    n_out = int(round(len(x) * sr_out / sr_in))
    y = np.zeros(n_out)
    j = np.arange(len(x))
    for n in range(n_out):
        k = n * M + D - j * L
        sel = (k >= 0) & (k < N)
        y[n] = np.dot(x[sel], h[k[sel]])
    return y


@pytest.mark.parametrize("sr_in,sr_out", [(48000, 44100), (22050, 44100),
                                          (8000, 44100), (44100, 16000)])
def test_polyphase_matches_brute_force(sr_in, sr_out):
    rng = np.random.default_rng(5)
    x = rng.standard_normal(2000)
    got = _resample_polyphase(x, sr_in, sr_out)
    want = _brute_force(x, sr_in, sr_out)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want.astype(np.float32), atol=2e-6)


def test_matches_scipy_resample_poly():
    """Independent cross-check: scipy's polyphase engine driven with OUR
    filter must agree (validates the phase decomposition and indexing,
    not the filter design)."""
    scipy_signal = pytest.importorskip("scipy.signal")
    rng = np.random.default_rng(6)
    x = rng.standard_normal(5000)
    sr_in, sr_out = 48000, 44100
    g = gcd(sr_in, sr_out)
    L, M = sr_out // g, sr_in // g
    h = design_resample_filter(L, M)
    want = scipy_signal.upfirdn(h, x, up=L, down=M)
    got = _resample_polyphase(x, sr_in, sr_out)
    # align: upfirdn output n corresponds to upsampled index n*M; ours
    # is delayed-compensated by D = (N-1)/2
    D = (len(h) - 1) // 2
    # our y[n] = upfirdn-style sum at upsampled index n*M + D; D % ...
    # brute force already pins the indexing; here just check the overlap
    # region sample-for-sample via the brute-force-verified convention
    off = D // L  # approximate; verify by best-alignment search
    best = None
    for o in range(max(0, off - 2), off + 3):
        n = min(len(got) - 200, len(want) - o - 200)
        if n <= 0:
            continue
        err = np.max(np.abs(got[100:100 + n] - want[o + 100:o + 100 + n]))
        best = err if best is None else min(best, err)
    assert best is not None and best < 1e-5


def test_alias_rejection_tone():
    """A 23 kHz tone at 48k sits above the 22.05 kHz output Nyquist and
    must be annihilated, not folded to 21.1 kHz. (The linear resampler
    fails this by ~55 dB.)"""
    sr_in, sr_out = 48000, 44100
    t = np.arange(sr_in) / sr_in
    x = np.sin(2 * np.pi * 23000.0 * t)
    y = _resample_polyphase(x, sr_in, sr_out).astype(np.float64)
    # skip filter edges
    core = y[2000:-2000]
    rej_db = 20 * np.log10(np.sqrt(np.mean(core ** 2)) / np.sqrt(0.5))
    assert rej_db < -60.0, f"alias rejection only {rej_db:.1f} dB"
    lin = _resample_linear(x, sr_in, sr_out).astype(np.float64)[2000:-2000]
    lin_db = 20 * np.log10(np.sqrt(np.mean(lin ** 2)) / np.sqrt(0.5))
    assert lin_db > -30.0  # documents why linear was replaced


def test_alias_rejection_sweep():
    """Energy of a 22.2->23.8 kHz sweep after 48k->44.1k must drop by
    >60 dB — the whole would-alias band is in the stopband."""
    sr_in, sr_out = 48000, 44100
    dur = 2.0
    t = np.arange(int(sr_in * dur)) / sr_in
    f0, f1 = 22200.0, 23800.0
    phase = 2 * np.pi * (f0 * t + (f1 - f0) * t ** 2 / (2 * dur))
    x = np.sin(phase)
    y = _resample_polyphase(x, sr_in, sr_out).astype(np.float64)[4000:-4000]
    rej_db = 20 * np.log10(np.sqrt(np.mean(y ** 2)) / np.sqrt(0.5))
    assert rej_db < -60.0, f"sweep rejection only {rej_db:.1f} dB"


@pytest.mark.parametrize("freq", [440.0, 4000.0, 10000.0, 15000.0])
def test_passband_flatness(freq):
    """In-band tones pass at unity gain (+-0.1 dB) with the correct
    frequency after 48k->44.1k."""
    sr_in, sr_out = 48000, 44100
    t = np.arange(2 * sr_in) / sr_in
    x = np.sin(2 * np.pi * freq * t)
    y = _resample_polyphase(x, sr_in, sr_out).astype(np.float64)[4000:-4000]
    gain_db = 20 * np.log10(np.sqrt(np.mean(y ** 2)) / np.sqrt(0.5))
    assert abs(gain_db) < 0.1, f"{freq} Hz gain {gain_db:+.3f} dB"
    # frequency preserved: count zero crossings
    zc = np.sum(np.abs(np.diff(np.signbit(y)))) / 2
    f_est = zc / (len(y) / sr_out)
    assert abs(f_est - freq) / freq < 0.01


def test_dc_and_identity():
    x = np.full(4000, 0.7071)
    y = _resample_polyphase(x, 48000, 44100).astype(np.float64)
    assert np.max(np.abs(y[1000:-1000] - 0.7071)) < 1e-4
    same = _resample_polyphase(x, 44100, 44100)
    np.testing.assert_allclose(same, x.astype(np.float32))
    assert _resample_polyphase(np.zeros(0), 48000, 44100).shape == (0,)


def test_decoder_wav_path_uses_polyphase(tmp_path):
    """End-to-end: a 48 kHz WAV with an aliasing tone decodes to 44.1 k
    with the tone suppressed."""
    from sonido_sonar_tpu.io.decode import Decoder, write_wav

    sr_in = 48000
    t = np.arange(sr_in) / sr_in
    x = 0.5 * np.sin(2 * np.pi * 23000.0 * t)
    p = str(tmp_path / "hi.wav")
    write_wav(p, x, sr_in)
    audio = Decoder().decode_file(p)
    assert audio.sample_rate == 44100
    core = np.asarray(audio.pcm, dtype=np.float64)[2000:-2000]
    rms_in = 0.5 * np.sqrt(0.5)
    rej_db = 20 * np.log10(max(np.sqrt(np.mean(core ** 2)), 1e-12) / rms_in)
    assert rej_db < -60.0, f"decode path rejection only {rej_db:.1f} dB"
