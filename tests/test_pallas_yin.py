"""Fused Pallas YIN kernel: interpret-mode correctness on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sonido_sonar_tpu.io.synth import sine, white_noise
from sonido_sonar_tpu.ops.framing import frame_signal
from sonido_sonar_tpu.ops.pallas_yin import (
    pallas_yin_available,
    yin_difference_pallas,
)
from sonido_sonar_tpu.ops.pitch import (
    PitchParams,
    _yin_difference,
    _yin_pick,
    yin_pitch,
    yin_pitch_from_signal,
)

SR = 22050


def _clip(seed=0):
    return (
        sine(220, 1.5, SR) + white_noise(1.5, SR, 0.05, seed=seed)
    ).astype(np.float32)


def test_pallas_yin_matches_xla_interpret():
    xb = jnp.asarray(np.stack([_clip(0), _clip(1) * 0.5]))
    frames = frame_signal(xb, 1024, 512)
    ref = np.asarray(_yin_difference(frames))
    got = np.asarray(yin_difference_pallas(xb, 1024, 512, interpret=True))
    assert got.shape == ref.shape
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got, ref, atol=2e-4 * scale)


def test_pallas_yin_hop256_and_1d():
    x = jnp.asarray(_clip(2))
    frames = frame_signal(x, 1024, 256)
    ref = np.asarray(_yin_difference(frames))
    got = np.asarray(yin_difference_pallas(x, 1024, 256, interpret=True))
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got, ref, atol=2e-4 * scale)


def test_pick_equivalence_through_signal_entry():
    """yin_pitch_from_signal (XLA fallback on CPU) == frame + yin_pitch."""
    xb = jnp.asarray(np.stack([_clip(3), _clip(4)]))
    p = PitchParams(sample_rate=SR, window_size=1024)
    pitch_a, conf_a, _ = yin_pitch_from_signal(xb, 1024, 512, p)
    pitch_b, conf_b, _ = yin_pitch(frame_signal(xb, 1024, 512), p)
    np.testing.assert_allclose(np.asarray(pitch_a), np.asarray(pitch_b))
    np.testing.assert_allclose(np.asarray(conf_a), np.asarray(conf_b))


def test_pick_on_pallas_d_interpret():
    """End-to-end pitch through the kernel's d (interpret mode) matches
    the XLA path's pitch on a clean periodic signal."""
    x = jnp.asarray(_clip(5))
    p = PitchParams(sample_rate=SR, window_size=1024)
    d = yin_difference_pallas(x, 1024, 512, interpret=True)
    pitch_k, conf_k, _ = _yin_pick(d, p)
    pitch_r, conf_r, _ = yin_pitch(frame_signal(x, 1024, 512), p)
    voiced = np.asarray(pitch_r) > 0
    assert voiced.any()
    np.testing.assert_allclose(
        np.asarray(pitch_k)[voiced], np.asarray(pitch_r)[voiced], rtol=1e-3
    )


def test_full_pick_kernel_interpret():
    """yin_pitch_pallas (interpret) == XLA yin_pitch on voiced frames."""
    from sonido_sonar_tpu.ops.pallas_yin import yin_pitch_pallas

    xb = jnp.asarray(np.stack([_clip(6), _clip(7)]))
    p = PitchParams(sample_rate=SR, window_size=1024)
    pk, ck, vk = yin_pitch_pallas(
        xb, 1024, 512, SR, p.min_freq, p.max_freq, p.yin_threshold,
        interpret=True,
    )
    pr, cr, _ = yin_pitch(frame_signal(xb, 1024, 512), p)
    pk, pr = np.asarray(pk), np.asarray(pr)
    both = (pk > 0) & (pr > 0)
    assert both.mean() > 0.9
    np.testing.assert_allclose(pk[both], pr[both], rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(ck)[both], np.asarray(cr)[both], atol=1e-3
    )


def test_period_amp_output_interpret():
    """with_period_amp emits RMS over the first pitch-period samples,
    matching the framed-signal derivation."""
    from sonido_sonar_tpu.ops.pallas_yin import yin_pitch_pallas

    x = jnp.asarray(_clip(8))
    p = PitchParams(sample_rate=SR, window_size=1024)
    pitch, conf, _, amp = yin_pitch_pallas(
        x, 1024, 256, SR, p.min_freq, p.max_freq, p.yin_threshold,
        interpret=True, with_period_amp=True,
    )
    frames = np.asarray(frame_signal(x, 1024, 256))
    pitch_n = np.asarray(pitch)
    plen = np.clip(
        np.where(pitch_n > 0, SR / np.maximum(pitch_n, 1e-10), 0.0).astype(int),
        1, 1023,
    )
    ref = np.sqrt(
        np.array([
            (frames[i, : plen[i]] ** 2).sum() / plen[i]
            for i in range(frames.shape[0])
        ])
    )
    np.testing.assert_allclose(np.asarray(amp), ref, rtol=1e-5, atol=1e-7)


def test_availability_gate():
    assert not pallas_yin_available(1024, 512)  # CPU backend here
    assert not pallas_yin_available(1000, 256)  # bad geometry regardless


def test_bf16x3_yin_precision_on_tpu():
    """On a real TPU the kernel's bf16 hi/lo three-pass products must
    track the XLA HIGH path: identical pitch picks on voiced frames and
    small relative error on the difference rows."""
    if jax.default_backend() != "tpu":
        pytest.skip("needs a TPU backend (MXU bf16 passes)")
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        (np.sin(2 * np.pi * 220 * np.arange(SR * 2) / SR)
         * rng.uniform(0.3, 1.0)).astype(np.float32)
        + rng.normal(size=SR * 2).astype(np.float32) * 0.03
    )
    d_k = np.asarray(yin_difference_pallas(x, 1024, 512))
    d_r = np.asarray(_yin_difference(frame_signal(x, 1024, 512)))
    assert np.abs(d_k - d_r).max() / np.abs(d_r).max() < 1e-4
    p = PitchParams(sample_rate=SR, window_size=1024)
    pk = np.asarray(_yin_pick(jnp.asarray(d_k), p)[0])
    pr = np.asarray(_yin_pick(jnp.asarray(d_r), p)[0])
    both = (pk > 0) & (pr > 0)
    assert both.mean() > 0.9
    np.testing.assert_allclose(pk[both], pr[both], rtol=1e-3)


def test_fused_pre_emphasis_interpret():
    """yin_pitch_pallas(pre_emph=a) == yin_pitch_pallas(pre_emphasis(x, a))."""
    from sonido_sonar_tpu.ops.filters import pre_emphasis
    from sonido_sonar_tpu.ops.pallas_yin import yin_pitch_pallas

    rng = np.random.default_rng(7)
    # 4 s / batch 3 so the grid has >= 2 frame tiles (tile 64 at hop
    # 512): tile boundaries exercise the raw[lead-1] previous-sample
    # read and the row_stride = pad_to + lead row shifts (ADVICE r3 #1)
    x = (sine(220, 4.0, SR) + 0.02 * rng.standard_normal(4 * SR)).astype(
        np.float32
    )
    xb = jnp.asarray(np.stack([x, x * 0.5, x[::-1].copy()]))
    ref = yin_pitch_pallas(
        pre_emphasis(xb, 0.97), 1024, 512, SR, 50.0, 5000.0, interpret=True
    )
    got = yin_pitch_pallas(
        xb, 1024, 512, SR, 50.0, 5000.0, interpret=True, pre_emph=0.97
    )
    for a, b in zip(got, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)
