"""Fused Pallas STFT kernel: interpret-mode correctness on CPU."""

import jax.numpy as jnp
import numpy as np
import pytest

from sonido_sonar_tpu.io.synth import sine, white_noise
from sonido_sonar_tpu.ops.pallas_stft import pallas_stft_available, stft_magnitude_pallas
from sonido_sonar_tpu.ops.stft import stft

SR = 22050


def test_pallas_matches_xla_interpret():
    x = (sine(440, 1.0, SR) + white_noise(1.0, SR, 0.05)).astype(np.float32)
    xb = jnp.asarray(np.stack([x, x * 0.5]))
    ref = stft(xb, 1024, 256, sample_rate=SR).magnitude
    got = stft_magnitude_pallas(xb, 1024, 256, interpret=True)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)


def test_pallas_1d_input():
    x = jnp.asarray(white_noise(0.5, SR, 0.2))
    ref = stft(x, 512, 128, sample_rate=SR).magnitude
    got = stft_magnitude_pallas(x, 512, 128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)


def test_aux_epilogue_interpret():
    """with_aux returns frame-local RMS, zero-crossing counts, rolloff
    bin and quarter-band energy ratios equal to the XLA definitions."""
    from sonido_sonar_tpu.ops.framing import frame_signal
    from sonido_sonar_tpu.ops.spectral import (
        spectral_rolloff,
        zero_crossings,
    )

    x = (sine(440, 1.0, SR) + white_noise(1.0, SR, 0.05)).astype(np.float32)
    xb = jnp.asarray(np.stack([x, x * 0.3]))
    mag, aux = stft_magnitude_pallas(
        xb, 1024, 256, interpret=True, with_aux=True
    )
    ref_mag = stft_magnitude_pallas(xb, 1024, 256, interpret=True)
    np.testing.assert_allclose(np.asarray(mag), np.asarray(ref_mag))
    frames = frame_signal(xb, 1024, 256)
    np.testing.assert_allclose(
        np.asarray(aux["rms"]),
        np.asarray(jnp.sqrt(jnp.mean(frames * frames, axis=-1))),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(aux["zero_crossings"]), np.asarray(zero_crossings(frames))
    )
    f_bins = mag.shape[-1]
    roll_hz = np.asarray(aux["rolloff_bin"]) * (SR / 2.0) / (f_bins - 1)
    ref_roll = np.asarray(spectral_rolloff(ref_mag, SR))
    np.testing.assert_allclose(roll_hz, ref_roll, atol=1e-3)
    power = np.asarray(ref_mag) ** 2
    split = f_bins // 4
    tot = power.sum(-1)
    np.testing.assert_allclose(
        np.asarray(aux["low_energy_ratio"]),
        np.where(tot > 0, power[..., :split].sum(-1) / np.maximum(tot, 1e-10), 0.0),
        rtol=1e-4, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(aux["high_energy_ratio"]),
        np.where(tot > 0, power[..., split:].sum(-1) / np.maximum(tot, 1e-10), 0.0),
        rtol=1e-4, atol=1e-6,
    )


def test_availability_gate():
    # CPU backend in tests -> not available (real path gated to TPU)
    assert not pallas_stft_available(1024, 256)
    # bad geometry rejected regardless
    assert not pallas_stft_available(1000, 256)


def test_cumsum_feature_parity():
    from sonido_sonar_tpu.ops.framing import frame_signal
    from sonido_sonar_tpu.ops.spectral import zcr, zcr_from_signal
    from sonido_sonar_tpu.ops.temporal import short_time_energy, short_time_energy_cumsum

    x = jnp.asarray(white_noise(1.0, SR, 0.3, seed=4))
    rms_a = np.asarray(short_time_energy(x, 1024, 256))
    rms_b = np.asarray(short_time_energy_cumsum(x, 1024, 256))
    np.testing.assert_allclose(rms_a, rms_b, rtol=2e-4)

    frames = frame_signal(x, 1024, 256)
    z_a = np.asarray(zcr(frames, SR))
    z_b = np.asarray(zcr_from_signal(x, 1024, 256, SR))
    # the cumsum variant may count one extra boundary crossing per frame
    assert np.abs(z_a - z_b).max() <= SR / 1024 + 1e-3


def test_bf16x3_dft_precision_on_tpu():
    """The kernel's three-pass bf16 DFT product must stay within ~1e-5
    of the float32 reference STFT. Only meaningful on a real TPU (CPU
    interpret mode computes in full float32); skipped elsewhere."""
    import jax
    import numpy as np

    if jax.default_backend() != "tpu":
        pytest.skip("needs a TPU backend (MXU bf16 passes)")
    from sonido_sonar_tpu.config.config import WindowType
    from sonido_sonar_tpu.ops.pallas_stft import stft_magnitude_pallas
    from sonido_sonar_tpu.ops.stft import stft

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 44100)).astype(np.float32))
    mag_k = np.asarray(stft_magnitude_pallas(x, 1024, 256, WindowType.HANN))
    mag_r = np.asarray(stft(x, 1024, 256, WindowType.HANN, 44100).magnitude)
    assert np.abs(mag_k - mag_r).max() / mag_r.max() < 1e-5


def test_fused_pre_emphasis_interpret():
    """pre_emph fuses ops/filters.pre_emphasis into the kernel: output
    equals running the host filter first up to f32 FMA contraction
    (zero lead block makes y[0] = x[0])."""
    from sonido_sonar_tpu.ops.filters import pre_emphasis

    # 4 s / batch 3 so the grid has >= 2 frame tiles (tile 256 at hop
    # 256): tile boundaries exercise the raw[lead-1] previous-sample
    # read and the row_stride = pad_to + lead row shifts (ADVICE r3 #1)
    x = (sine(330, 4.0, SR) + white_noise(4.0, SR, 0.05)).astype(np.float32)
    xb = jnp.asarray(np.stack([x, x * 0.5, x[::-1].copy()]))
    ref = stft_magnitude_pallas(
        pre_emphasis(xb, 0.97), 1024, 256, interpret=True
    )
    got = stft_magnitude_pallas(xb, 1024, 256, interpret=True, pre_emph=0.97)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-4)
    # aux epilogue sees the pre-emphasized frames too
    _, aux_ref = stft_magnitude_pallas(
        pre_emphasis(xb, 0.97), 1024, 256, interpret=True, with_aux=True
    )
    _, aux_got = stft_magnitude_pallas(
        xb, 1024, 256, interpret=True, with_aux=True, pre_emph=0.97
    )
    for key in aux_ref:
        np.testing.assert_allclose(
            np.asarray(aux_got[key]), np.asarray(aux_ref[key]), rtol=1e-5,
            atol=1e-4, err_msg=key,
        )


def test_feature_epilogue_interpret():
    """with_features lanes reproduce mel energies, the normalized
    chromagram, and every descriptor-bundle output computed by the XLA
    functions on the SAME kernel magnitudes (4 s / batch 2 so the tile
    boundary case n_tiles >= 2 is exercised)."""
    from sonido_sonar_tpu.ops.mel import apply_filterbank, mel_filterbank
    from sonido_sonar_tpu.ops.mfcc import MFCCParams, mfcc_from_mel, mfcc
    from sonido_sonar_tpu.ops.pallas_stft import FEAT_LANES
    from sonido_sonar_tpu.ops.spectral import (
        descriptors_from_feat,
        spectral_descriptor_bundle,
    )

    x = (
        sine(440, 4.0, SR)
        + 0.3 * sine(1234.5, 4.0, SR)
        + white_noise(4.0, SR, 0.05)
    ).astype(np.float32)
    xb = jnp.asarray(np.stack([x, x * 0.3]))
    mag, aux, feat = stft_magnitude_pallas(
        xb, 1024, 256, interpret=True, with_aux=True, with_features=True,
        sample_rate=SR, pre_emph=0.97,
    )
    assert feat.shape == mag.shape[:-1] + (64,)

    # mel lanes == HIGHEST filterbank matmul on the kernel magnitudes
    # (kernel: bf16 hi/lo 3-pass, ~1.5e-5 relative)
    fb = mel_filterbank(26, 1024, SR, 0.0, SR / 2.0)
    mel_ref = np.asarray(apply_filterbank(mag * mag, fb))
    lo, hi = FEAT_LANES["mel"]
    np.testing.assert_allclose(
        np.asarray(feat[..., lo:hi]), mel_ref, rtol=1e-4, atol=1e-7
    )
    # ... and the MFCC tail over them matches mfcc(mag)
    got_mfcc = np.asarray(mfcc_from_mel(feat[..., lo:hi], MFCCParams()))
    ref_mfcc = np.asarray(mfcc(mag, SR, 1024, MFCCParams()))
    np.testing.assert_allclose(got_mfcc, ref_mfcc, atol=2e-3)

    # chroma lanes == normalized chromagram
    from sonido_sonar_tpu.ops.chroma import chroma_from_magnitude

    clo, chi = FEAT_LANES["chroma"]
    ref_ch = np.asarray(chroma_from_magnitude(mag, SR, 1024))
    np.testing.assert_allclose(
        np.asarray(feat[..., clo:chi]), ref_ch, rtol=1e-3, atol=2e-5
    )

    # finished in-kernel descriptors == the bundle on the same magnitudes
    got_d = {k: np.asarray(v) for k, v in descriptors_from_feat(feat).items()}
    ref_d = spectral_descriptor_bundle(mag, SR)
    for k in got_d:
        ref = np.asarray(ref_d[k])
        scale = np.maximum(np.abs(ref), 1.0)
        np.testing.assert_allclose(
            got_d[k] / scale, ref / scale, atol=2e-3,
            err_msg=f"descriptor {k}",
        )
    # bandwidth via the moment expansion (HIGHEST moments): loose only
    # where ref ~ 0
    np.testing.assert_allclose(
        got_d["spectral_bandwidth"], np.asarray(ref_d["spectral_bandwidth"]),
        rtol=1e-3, atol=2.0,
    )
