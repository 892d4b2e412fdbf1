"""Tonal analysis: key estimation, chords, HNR, inharmonicity, pitch facade."""

import jax.numpy as jnp
import numpy as np
import pytest

from sonido_sonar_tpu.io.synth import harmonic_tone, sine, white_noise
from sonido_sonar_tpu.ops.chroma import CHROMA_LABELS, chroma_stft
from sonido_sonar_tpu.ops.framing import frame_signal
from sonido_sonar_tpu.ops.pitch import PitchParams
from sonido_sonar_tpu.ops.stft import stft
from sonido_sonar_tpu.ops import tonal as T

SR = 22050


def note_freq(label, octave=4):
    semis = CHROMA_LABELS.index(label) - 9 + (octave - 4) * 12
    return 440.0 * 2 ** (semis / 12)


def chroma_of(labels, octave=4, weights=None):
    v = np.zeros(12)
    for i, lab in enumerate(labels):
        v[CHROMA_LABELS.index(lab)] = weights[i] if weights else 1.0
    return v / v.sum()


# ------------------------------ key ------------------------------------

def test_key_profiles_all_present():
    assert set(T.KEY_PROFILES) == {
        "krumhansl", "temperley", "shaath", "edma", "bgate",
        "diatonic", "tonic_triad",
    }
    for p in T.KEY_PROFILES.values():
        assert len(p["major"]) == 12 and len(p["minor"]) == 12


def test_key_estimation_c_major_scale():
    """Full C major scale chroma -> C major under Krumhansl."""
    scale = chroma_of(["C", "D", "E", "F", "G", "A", "B"])
    # weight tonic/dominant higher, as in real music
    scale[CHROMA_LABELS.index("C")] *= 3
    scale[CHROMA_LABELS.index("G")] *= 2
    res = T.KeyEstimator("krumhansl").estimate_key(scale)
    assert res.key == "C" and res.mode == "major"
    assert res.strength > 0.5
    assert len(res.all_correlations) == 24


def test_key_estimation_a_minor_scale():
    scale = chroma_of(["A", "B", "C", "D", "E", "F", "G"])
    scale[CHROMA_LABELS.index("A")] *= 3
    scale[CHROMA_LABELS.index("E")] *= 2
    res = T.KeyEstimator("krumhansl").estimate_key(scale)
    assert res.key == "A" and res.mode == "minor"


@pytest.mark.parametrize("profile", list(T.KEY_PROFILES))
def test_key_all_profiles_run(profile):
    scale = chroma_of(["C", "E", "G"], weights=[3, 1, 2])
    res = T.KeyEstimator(profile).estimate_key(scale)
    assert res.key in CHROMA_LABELS


def test_key_sequence_stability_and_modulation():
    c_major = chroma_of(["C", "D", "E", "F", "G", "A", "B"])
    c_major[0] *= 3
    g_major = np.roll(c_major, 7)
    seq = np.stack([c_major] * 24 + [g_major] * 24)
    res = T.KeyEstimator().estimate_key_sequence(seq)
    assert 0 <= res.stability <= 1.0
    assert len(res.modulations) >= 1  # C -> G change detected


# ------------------------------ chords ---------------------------------

def test_chord_detection_major_minor():
    det = T.ChordDetector()
    c_maj = chroma_of(["C", "E", "G"])
    res = det.detect_chord(c_maj)
    assert res.root == "C" and res.quality == "major"
    a_min = chroma_of(["A", "C", "E"])
    res2 = det.detect_chord(a_min)
    assert res2.root == "A" and res2.quality == "minor"


def test_chord_detection_seventh():
    g7 = chroma_of(["G", "B", "D", "F"])
    res = T.ChordDetector().detect_chord(g7)
    assert res.root == "G" and res.quality == "dominant7"


def test_chord_silence():
    res = T.ChordDetector().detect_chord(np.zeros(12))
    assert res.chord == "N"


def test_chord_progression():
    c = chroma_of(["C", "E", "G"])
    f = chroma_of(["F", "A", "C"])
    g = chroma_of(["G", "B", "D"])
    seq = np.stack([c] * 8 + [f] * 8 + [g] * 8 + [c] * 8)
    out = T.ChordProgressionAnalyzer().analyze(seq)
    assert out["progression"] == ["C", "F", "G", "C"]
    assert out["num_changes"] == 3


# ------------------------------ HNR ------------------------------------

def test_hnr_analyzer_tone_vs_noise():
    tone = harmonic_tone(200.0, 0.5, SR)
    noise = white_noise(0.5, SR, 0.3, seed=1)
    an = T.HarmonicRatioAnalyzer(SR, "acf")
    frames_t = frame_signal(jnp.asarray(tone), 2048, 1024)
    frames_n = frame_signal(jnp.asarray(noise), 2048, 1024)
    r_t = an.analyze_frames(frames_t)
    r_n = an.analyze_frames(frames_n)
    assert float(jnp.mean(r_t.harmonic_ratio)) > 10.0
    assert float(jnp.mean(r_n.harmonic_ratio)) < 5.0
    assert bool(jnp.mean(r_t.voicing.astype(jnp.float32)) > 0.8)


def test_hnr_spectral_method():
    tone = harmonic_tone(220.0, 0.5, SR)
    mag = stft(jnp.asarray(tone), 4096, 1024, sample_rate=SR).magnitude
    an = T.HarmonicRatioAnalyzer(SR, "acf")
    hnr = an.analyze_spectrum(mag, 4096)
    assert float(jnp.median(hnr)) > 10.0


# --------------------------- inharmonicity ------------------------------

def test_inharmonicity_pure_harmonic():
    tone = harmonic_tone(220.0, 0.5, SR, num_harmonics=6)
    mag = stft(jnp.asarray(tone), 8192, 2048, sample_rate=SR).magnitude
    f0 = jnp.full(mag.shape[0], 220.0)
    res = T.analyze_inharmonicity(mag, f0, SR, 8192)
    assert float(jnp.mean(res.inharmonicity)) < 0.01
    assert int(jnp.median(res.num_partials)) >= 3


def test_inharmonicity_stretched_partials():
    """Piano-like stretched partials f_n = n f0 sqrt(1 + B n^2)."""
    B = 0.001
    f0 = 220.0
    t = np.arange(int(0.5 * SR)) / SR
    x = np.zeros_like(t)
    for n in range(1, 7):
        fn = n * f0 * np.sqrt(1 + B * n * n)
        x += (0.7 ** (n - 1)) * np.sin(2 * np.pi * fn * t)
    x = (0.5 * x / np.abs(x).max()).astype(np.float32)
    mag = stft(jnp.asarray(x), 8192, 2048, sample_rate=SR).magnitude
    res = T.analyze_inharmonicity(mag, jnp.full(mag.shape[0], f0), SR, 8192)
    assert float(jnp.mean(res.inharmonicity)) > 0.002
    assert float(jnp.median(res.b_coefficient)) == pytest.approx(B, rel=0.5)


# --------------------------- pitch facade -------------------------------

@pytest.mark.parametrize("method", ["yin", "acf", "nsdf", "cepstrum", "hps"])
def test_pitch_methods_on_tone(method):
    x = harmonic_tone(220.0, 0.3, SR)
    det = T.PitchDetector(SR, method, PitchParams(sample_rate=SR, window_size=2048))
    frames = frame_signal(jnp.asarray(x), 2048, 1024)
    res = det.detect(frames)
    p = np.asarray(res.pitch)
    valid = p[p > 0]
    assert len(valid) > 0, method
    med = np.median(valid)
    # hps/cepstrum can octave-err; accept f0 or 2*f0
    assert min(abs(med - 220), abs(med - 440)) < 25, (method, med)


def test_hybrid_pitch():
    x = harmonic_tone(150.0, 0.3, SR)
    det = T.PitchDetector(SR, "yin+acf", PitchParams(sample_rate=SR, window_size=2048))
    frames = frame_signal(jnp.asarray(x), 2048, 1024)
    res = det.detect(frames)
    p = np.asarray(res.pitch)
    assert np.median(p[p > 0]) == pytest.approx(150.0, rel=0.05)


def test_octave_correction():
    pitch = jnp.asarray(np.array([220.0] * 10 + [440.0] + [220.0] * 10, np.float32))
    fixed = np.asarray(T.correct_octave_errors(pitch))
    assert fixed[10] == pytest.approx(220.0, rel=0.01)


def test_vibrato_detection():
    """5 Hz vibrato with +-10 Hz extent on a 220 Hz tone."""
    hop, frame_rate = 256, SR / 256
    t = np.arange(400) / frame_rate
    pitch = (220.0 + 10.0 * np.sin(2 * np.pi * 5.0 * t)).astype(np.float32)
    out = T.analyze_vibrato(jnp.asarray(pitch), hop, SR)
    assert bool(out["has_vibrato"])
    assert float(out["vibrato_rate_hz"]) == pytest.approx(5.0, abs=0.5)
    flat = jnp.asarray(np.full(400, 220.0, np.float32))
    out2 = T.analyze_vibrato(flat, hop, SR)
    assert not bool(out2["has_vibrato"])
