"""STFT engine: parity vs float64 numpy reference + properties."""

import jax.numpy as jnp
import numpy as np
import pytest

from sonido_sonar_tpu.config.config import WindowType
from sonido_sonar_tpu.io.synth import sine, white_noise
from sonido_sonar_tpu.ops.framing import frame_signal, num_frames
from sonido_sonar_tpu.ops.stft import (
    STFTStreamer,
    log_power_spectrum,
    spectral_flux,
    stft,
)
from sonido_sonar_tpu.ops.windows import make_window

SR = 44100


def numpy_stft_mag(x, w_size, hop, window):
    """Float64 reference mirroring analyzers/spectral.go:443-517."""
    t = (len(x) - w_size) // hop + 1
    out = np.zeros((t, w_size // 2 + 1))
    for i in range(t):
        frame = x[i * hop : i * hop + w_size].astype(np.float64) * window
        out[i] = np.abs(np.fft.rfft(frame))
    return out


def test_frame_count_formula():
    assert num_frames(44100, 1024, 256) == (44100 - 1024) // 256 + 1
    assert num_frames(1023, 1024, 256) == 0
    assert num_frames(1024, 1024, 256) == 1


def test_framing_matches_loop():
    x = white_noise(0.1, SR)
    frames = np.asarray(frame_signal(jnp.asarray(x), 512, 128))
    for i in [0, 3, frames.shape[0] - 1]:
        np.testing.assert_array_equal(frames[i], x[i * 128 : i * 128 + 512])


def test_stft_parity_float64():
    """Magnitudes match the float64 reference to float32 tolerance."""
    x = (sine(440, 0.5, SR) + white_noise(0.5, SR, 0.05)).astype(np.float32)
    w = make_window(WindowType.HANN, 1024, normalize=True, symmetric=True, dtype=np.float64)
    ref = numpy_stft_mag(x, 1024, 256, w)
    got = np.asarray(stft(jnp.asarray(x), 1024, 256, WindowType.HANN, SR).magnitude)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-3, rtol=1e-4)


def test_stft_peak_bin():
    """A pure tone peaks at the right FFT bin."""
    f = 1000.0
    x = sine(f, 0.5, SR)
    res = stft(jnp.asarray(x), 2048, 512, WindowType.HANN, SR)
    mag = np.asarray(res.magnitude)
    peak_bins = mag.mean(axis=0).argmax()
    expected_bin = round(f * 2048 / SR)
    assert abs(peak_bins - expected_bin) <= 1


def test_parseval():
    """Windowed-frame energy is preserved by the rFFT (property test)."""
    x = white_noise(0.05, SR, seed=3)
    w_size = 512
    w = make_window(WindowType.HANN, w_size, dtype=np.float64)
    frame = x[:w_size].astype(np.float64) * w
    spec = np.fft.rfft(frame)
    # Parseval for rfft: sum|x|^2 = (|X0|^2 + 2 sum|Xk|^2 + |XN/2|^2)/N
    power = (
        np.abs(spec[0]) ** 2
        + 2 * np.sum(np.abs(spec[1:-1]) ** 2)
        + np.abs(spec[-1]) ** 2
    ) / w_size
    assert power == pytest.approx(np.sum(frame**2), rel=1e-9)


def test_batched_stft():
    xs = np.stack([sine(440, 0.2, SR), sine(880, 0.2, SR)])
    res = stft(jnp.asarray(xs), 1024, 256, WindowType.HANN, SR)
    assert res.magnitude.shape[0] == 2
    single = stft(jnp.asarray(xs[1]), 1024, 256, WindowType.HANN, SR)
    # batched and single shapes tile the DFT matmul differently -> f32
    # accumulation-order differences up to ~1e-4
    np.testing.assert_allclose(
        np.asarray(res.magnitude[1]), np.asarray(single.magnitude), atol=1e-3
    )


def test_phase_and_complex_optional():
    x = sine(440, 0.1, SR)
    r1 = stft(jnp.asarray(x), 1024, 256)
    assert r1.phase is None and r1.complex_spec is None
    r2 = stft(jnp.asarray(x), 1024, 256, return_phase=True, return_complex=True)
    assert r2.phase is not None and r2.complex_spec is not None
    recon = np.abs(np.asarray(r2.complex_spec))
    np.testing.assert_allclose(recon, np.asarray(r2.magnitude), atol=1e-4)


def test_spectral_flux_zero_for_stationary():
    x = sine(440, 0.3, SR)
    res = stft(jnp.asarray(x), 1024, 256)
    flux = np.asarray(spectral_flux(res.magnitude))
    assert flux[0] == 0.0
    # stationary tone: flux small relative to magnitude scale
    assert flux[2:].mean() < 0.05 * np.asarray(res.magnitude).mean() * res.freq_bins


def test_log_power_floor():
    mag = jnp.zeros((4, 129))
    lp = np.asarray(log_power_spectrum(mag))
    assert np.all(lp == pytest.approx(-100.0))  # 10*log10(1e-10)


def test_streamer_matches_batch():
    x = white_noise(0.4, SR, seed=7)
    full = np.asarray(stft(jnp.asarray(x), 1024, 256).magnitude)
    s = STFTStreamer(1024, 256)
    chunks = np.array_split(x, 7)
    parts = []
    for c in chunks:
        r = s.push(c)
        if r is not None:
            parts.append(np.asarray(r.magnitude))
    got = np.concatenate(parts, axis=0)
    assert got.shape[0] == full.shape[0]
    np.testing.assert_allclose(got, full, atol=1e-4)


def test_spectral_flux_all_changes():
    """The unrectified flux counts decreases; on a decaying spectrum it
    exceeds the half-wave-rectified flux."""
    from sonido_sonar_tpu.ops.stft import spectral_flux, spectral_flux_all_changes

    mag = jnp.asarray(
        np.stack([np.full(9, 2.0), np.full(9, 1.0), np.full(9, 3.0)]).astype(
            np.float32
        )
    )
    hw = np.asarray(spectral_flux(mag))
    ac = np.asarray(spectral_flux_all_changes(mag))
    assert hw[0] == ac[0] == 0.0
    assert hw[1] == 0.0 and ac[1] > 0.0      # pure decrease
    assert np.isclose(hw[2], ac[2])          # pure increase


def test_streamer_block_mode_single_compile_shape():
    """Block mode emits fixed-size blocks (one compiled shape) and
    flush() drains the tail; total equals the batch STFT."""
    x = white_noise(0.6, SR, seed=8)
    full = np.asarray(stft(jnp.asarray(x), 1024, 256).magnitude)
    s = STFTStreamer(1024, 256, block_frames=16)
    parts = []
    for c in np.array_split(x, 11):
        r = s.push(c)
        if r is not None:
            parts.append(np.asarray(r.magnitude))
    tail = s.flush()
    if tail is not None:
        parts.append(np.asarray(tail.magnitude))
    # every non-tail block has exactly 16 frames
    assert all(p.shape[0] % 16 == 0 for p in parts[:-1])
    got = np.concatenate(parts, axis=0)
    assert got.shape[0] == full.shape[0]
    np.testing.assert_allclose(got, full, atol=1e-4)
