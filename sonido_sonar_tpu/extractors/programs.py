"""Single-program extractor pipelines for the public generator surface.

The extractor classes (extractors/speech.py, extractors/music.py) mirror
the reference composition op by op — dozens of individually jitted calls
over a spectrogram the generator computes with the XLA STFT. That is the
faithful oracle, but on a TPU each extra dispatch costs fixed overhead
and the XLA STFT materializes the [B, T, W] frames tensor in HBM.

These programs recompose the SAME math as ONE jitted function per
extractor, riding the fused Pallas STFT (+aux epilogue) when available:

  - MFCC / spectral descriptors / band ratios read the RAW-signal
    magnitude, exactly like the reference generator hands the extractor
    a raw-PCM spectrogram (fingerprint.go:189-199, speech.go:135-243);
  - the content pre-emphasized signal feeds ZCR, the speech chain,
    temporal and energy features (speech.go:247-253);
  - no [B, T, W] frames tensor anywhere: ZCR and spectral tilt use
    hop-block framed sums (exact — the counts are integers, the sums
    differ only in f32 accumulation order).

`FingerprintGenerator` uses these for BOTH the per-clip and the batched
path, so grouped batch output == per-clip output by construction (same
program, batch-axis-clean ops). The class-method composition remains the
parity oracle (tests/test_extractor_programs.py asserts program ==
composition field by field).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from sonido_sonar_tpu.config.config import FeatureConfig, WindowType
from sonido_sonar_tpu.extractors.features import (
    EnergyFeatures,
    ExtractedFeatures,
    HarmonicFeatures,
    SpectralFeatures,
    SpeechFeatures,
    TemporalFeatures,
)
from sonido_sonar_tpu.ops import spectral as S
from sonido_sonar_tpu.ops import temporal as T
from sonido_sonar_tpu.ops.filters import pre_emphasis_for_content
from sonido_sonar_tpu.ops.framing import num_frames
from sonido_sonar_tpu.ops.mfcc import MFCCParams, mfcc
from sonido_sonar_tpu.ops.pitch import detect_pitch_track
from sonido_sonar_tpu.ops.stft import stft

_EPS = 1e-10


@partial(
    jax.jit,
    static_argnames=(
        "sample_rate", "window_size", "hop_size", "window_type",
        "mfcc_coefficients", "enable_mfcc", "enable_speech",
        "enable_temporal", "enable_contrast", "contrast_bands",
    ),
)
def speech_extractor_program(
    pcm: jnp.ndarray,
    sample_rate: int,
    window_size: int = 1024,
    hop_size: int = 256,
    window_type: WindowType = WindowType.HANN,
    mfcc_coefficients: int = 13,
    enable_mfcc: bool = True,
    enable_speech: bool = True,
    enable_temporal: bool = True,
    enable_contrast: bool = True,
    contrast_bands: int = 6,
) -> Dict[str, jnp.ndarray]:
    """[..., N] PCM -> flat dict of [..., ...] feature arrays: the full
    SpeechFeatureExtractor payload (speech.go:135-243) as one program.

    Composition parity (extractors/speech.py):
      - mfcc / descriptors / contrast / low-high ratios: raw magnitude;
      - zcr / speech / temporal / energy: speech-pre-emphasized signal;
      - pitch track at the reference's fixed 1024/512 (quirk #8).
    """
    from sonido_sonar_tpu.ops import speech as SP
    from sonido_sonar_tpu.ops.pallas_stft import (
        pallas_stft_available,
        stft_magnitude_pallas,
    )

    x = pcm.astype(jnp.float32)
    pre = pre_emphasis_for_content(x, "speech")
    use_pallas = pallas_stft_available(window_size, hop_size)
    if use_pallas:
        mag, aux = stft_magnitude_pallas(
            x, window_size, hop_size, window_type, with_aux=True
        )
    else:
        mag = stft(x, window_size, hop_size, window_type, sample_rate).magnitude
    t = mag.shape[-2]
    out: Dict[str, jnp.ndarray] = {}

    if enable_mfcc:
        out["mfcc"] = mfcc(
            mag, sample_rate, window_size,
            MFCCParams(num_coefficients=mfcc_coefficients),
        )

    # ---- spectral (speech.go:320-367): raw magnitude + pre'd ZCR ----
    out.update(
        S.spectral_descriptor_bundle(mag, sample_rate, skip_rolloff=use_pallas)
    )
    if use_pallas:
        out["spectral_rolloff"] = aux["rolloff_bin"] * (
            (sample_rate / 2.0) / float(mag.shape[-1] - 1)
        )
        low_ratio = aux["low_energy_ratio"]
        high_ratio = aux["high_energy_ratio"]
    else:
        power = mag * mag
        split = mag.shape[-1] // 4
        total = jnp.sum(power, axis=-1)
        low_ratio = jnp.where(
            total > 0,
            jnp.sum(power[..., :split], axis=-1) / jnp.maximum(total, _EPS),
            0.0,
        )
        high_ratio = jnp.where(
            total > 0,
            jnp.sum(power[..., split:], axis=-1) / jnp.maximum(total, _EPS),
            0.0,
        )
    out["zcr"] = S.zcr_from_signal(pre, window_size, hop_size, sample_rate)[
        ..., :t
    ]
    if enable_contrast:
        out["spectral_contrast"] = S.spectral_contrast(
            mag, sample_rate, contrast_bands
        )

    # ---- energy (speech.go:411-461) ---------------------------------
    ste = T.short_time_energy(pre, window_size, hop_size)
    out["short_time_energy"] = ste
    out["energy_variance"] = T.energy_variance(ste)
    out["energy_entropy"] = jnp.where(ste > 0, -ste * jnp.log(ste + 1e-10), 0.0)
    out["loudness_range"] = T.loudness_range(pre, sample_rate)
    out["low_energy_ratio"] = low_ratio
    out["high_energy_ratio"] = high_ratio

    # ---- temporal (speech.go:370-407) -------------------------------
    if enable_temporal:
        onset_mask, onset_count = T.detect_onsets_from_energy(ste)
        duration = x.shape[-1] / float(sample_rate)
        out["onset_mask"] = onset_mask
        out["onset_density"] = onset_count.astype(jnp.float32) / duration
        out["attack_time"] = T.attack_times_from_onsets(
            onset_mask, ste, hop_size, sample_rate
        )
        out["peak_amplitude"] = jnp.max(jnp.abs(pre), axis=-1)
        out["average_amplitude"] = jnp.mean(jnp.abs(pre), axis=-1)
        out["silence_ratio"] = T.silence_ratio_percentile(ste)
        out["envelope_shape"] = T.rms_envelope(pre, 512, 256)

    # ---- harmonic (speech.go:464-509, fixed 1024/512 quirk #8) ------
    pitch, conf, voicing = detect_pitch_track(pre, sample_rate, 1024, 512)
    out["pitch"] = pitch
    out["pitch_confidence"] = conf
    out["voicing"] = voicing

    # ---- speech chain (speech.go:278-317) ---------------------------
    if enable_speech:
        analysis = SP.analyze_speech(pre, sample_rate)
        is_speech = analysis.is_speech
        out["is_speech"] = is_speech
        out["formant_frequencies"] = analysis.formants.frequencies
        out["formant_count"] = analysis.formants.count
        out["vocal_tract_length"] = analysis.formants.vocal_tract_length
        out["jitter"] = analysis.voice_quality.jitter
        out["shimmer"] = analysis.voice_quality.shimmer

        # frame tilt at fixed 1024/512 via hop-block framed sums — the
        # per-frame diff/energy sums of extractors/speech.py:234-244
        # computed without the [.., T, 1024] frames tensor (exact frame
        # boundaries; accumulation order differs ~1e-7)
        n = pre.shape[-1]
        t_tilt = num_frames(n, 1024, 512)
        d = pre[..., 1:] - pre[..., :-1]
        d2 = jnp.pad(d * d, [(0, 0)] * (pre.ndim - 1) + [(0, 1)])
        p2 = pre * pre
        starts = jnp.arange(t_tilt) * 512
        high_e = T.framed_sum_hopblocks(d2, 1024, 512, t_tilt) - d2[
            ..., starts + 1023
        ]
        low_e = T.framed_sum_hopblocks(p2, 1024, 512, t_tilt) - p2[..., starts]
        out["spectral_tilt"] = jnp.where(
            low_e > 0,
            -10.0
            * jnp.log10(jnp.maximum(high_e / jnp.maximum(low_e, _EPS), _EPS)),
            0.0,
        )

        pauses, pause_count = T.pause_durations(ste, hop_size, sample_rate)
        out["pause_duration"] = pauses
        out["pause_count"] = pause_count
        silence_ratio = T.silence_ratio_percentile(ste)
        out["speech_rate"] = jnp.where(
            is_speech, 4.0 * (1.0 - silence_ratio), 0.0
        )
    return out


def assemble_speech_features(
    out: Dict[str, jnp.ndarray],
    config: FeatureConfig,
    is_news: bool,
    sample_rate: int,
) -> ExtractedFeatures:
    """Structure the program dict into the ExtractedFeatures schema,
    applying the same is_speech gates as extractors/speech.py:253-273.
    Pure restructuring — no compute beyond the gating wheres."""
    features = ExtractedFeatures(metadata={})
    if config.enable_mfcc:
        features.mfcc = out["mfcc"]

    features.spectral_features = SpectralFeatures(
        spectral_centroid=out["spectral_centroid"],
        spectral_rolloff=out["spectral_rolloff"],
        spectral_bandwidth=out["spectral_bandwidth"],
        spectral_flatness=out["spectral_flatness"],
        spectral_crest=out["spectral_crest"],
        spectral_slope=out["spectral_slope"],
        spectral_flux=out["spectral_flux"],
        zero_crossing_rate=out["zcr"],
        spectral_contrast=(
            out["spectral_contrast"]
            if config.enable_spectral_contrast
            else None
        ),
    )

    if config.enable_speech_features and "is_speech" in out:
        is_speech = jnp.asarray(out["is_speech"])
        is_sp = is_speech[..., None]
        zero = jnp.zeros_like(out["jitter"])
        features.speech_features = SpeechFeatures(
            formant_frequencies=jnp.where(
                is_sp,
                out["formant_frequencies"],
                jnp.zeros_like(out["formant_frequencies"]),
            )[..., None, :],
            formant_count=jnp.where(is_speech, out["formant_count"], 0),
            vocal_tract_length=jnp.where(
                is_speech, out["vocal_tract_length"], 17.5
            ),
            voicing_probability=jnp.where(
                is_sp, out["voicing"], jnp.zeros_like(out["voicing"])
            ),
            spectral_tilt=jnp.where(
                is_sp, out["spectral_tilt"], jnp.zeros_like(out["spectral_tilt"])
            ),
            speech_rate=out["speech_rate"],
            pause_duration=out["pause_duration"],
            pause_count=out["pause_count"],
            jitter=jnp.where(is_speech, out["jitter"], zero),
            shimmer=jnp.where(is_speech, out["shimmer"], zero),
        )

    if config.enable_temporal_features and "onset_mask" in out:
        features.temporal_features = TemporalFeatures(
            rms_energy=out["short_time_energy"],
            peak_amplitude=out["peak_amplitude"],
            average_amplitude=out["average_amplitude"],
            dynamic_range=out["loudness_range"],
            silence_ratio=out["silence_ratio"],
            onset_density=out["onset_density"],
            onset_mask=out["onset_mask"],
            attack_time=out["attack_time"],
            envelope_shape=out["envelope_shape"],
        )

    features.energy_features = EnergyFeatures(
        short_time_energy=out["short_time_energy"],
        energy_variance=out["energy_variance"],
        energy_entropy=out["energy_entropy"],
        loudness_range=out["loudness_range"],
        low_energy_ratio=out["low_energy_ratio"],
        high_energy_ratio=out["high_energy_ratio"],
    )

    features.harmonic_features = HarmonicFeatures(
        pitch_estimate=out["pitch"],
        pitch_confidence=out["pitch_confidence"],
        voicing_strength=out["voicing"],
        harmonic_ratio=out["voicing"] * 10.0,
        inharmonicity_ratio=1.0 - out["voicing"],
        tonal_centroid=jnp.where(out["pitch"] > 0, out["pitch"], 0.0),
    )

    features.metadata.update(
        extractor_type="speech",
        content_subtype="news" if is_news else "talk",
        algorithms_used="speech,spectral,temporal,filters,tonal",
        pre_emphasis_applied=True,
        sample_rate=sample_rate,
        spectrogram_frames=int(out["spectral_centroid"].shape[-1]),
        optimization="speech_optimized",
    )
    return features


def assemble_music_features(
    out: Dict[str, jnp.ndarray],
    config: FeatureConfig,
    sample_rate: int,
) -> ExtractedFeatures:
    """Structure `parallel.pipeline.batched_music_extractor_features`
    output (the faithful music recomposition, parity-tested in
    tests/test_parallel.py) into the ExtractedFeatures schema exactly as
    extractors/music.py assembles it."""
    features = ExtractedFeatures(metadata={})
    if config.enable_mfcc:
        features.mfcc = out["mfcc"]
    if config.enable_chroma:
        features.chroma_features = out["chroma"]

    features.spectral_features = SpectralFeatures(
        spectral_centroid=out["spectral_centroid"],
        spectral_rolloff=out["spectral_rolloff"],
        spectral_bandwidth=out["spectral_bandwidth"],
        spectral_flatness=out["spectral_flatness"],
        spectral_crest=out["spectral_crest"],
        spectral_slope=out["spectral_slope"],
        spectral_flux=out["spectral_flux"],
        zero_crossing_rate=out["zcr"],
        spectral_contrast=out["spectral_contrast"],
    )

    features.temporal_features = TemporalFeatures(
        rms_energy=out["rms_energy"],
        peak_amplitude=out["peak_amplitude"],
        average_amplitude=out["average_amplitude"],
        dynamic_range=out["dynamic_range"],
        crest_factor=out["crest_factor"],
        silence_ratio=out["silence_ratio"],
        onset_density=out["onset_density"],
        onset_mask=out["onset_mask"],
        attack_time=out["attack_time"],
        envelope_shape=out["envelope_shape"],
        tempo_bpm=out["tempo_bpm"],
    )

    features.energy_features = EnergyFeatures(
        short_time_energy=out["rms_energy"],
        energy_variance=out["energy_variance"],
        energy_entropy=out["energy_entropy"],
        loudness_range=out["loudness_range"],
        low_energy_ratio=out["low_energy_ratio"],
        high_energy_ratio=out["high_energy_ratio"],
    )

    if config.enable_harmonic_features:
        features.harmonic_features = HarmonicFeatures(
            pitch_estimate=out["pitch"],
            pitch_confidence=out["pitch_confidence"],
            voicing_strength=out["voicing"],
            harmonic_ratio=out["hnr"],
            inharmonicity_ratio=out["inharmonicity"],
            tonal_centroid=out["tonal_centroid"],
        )

    features.metadata.update(
        extractor_type="music",
        algorithms_used="spectral,chroma,temporal,tonal,harmonic,filters",
        sample_rate=sample_rate,
        spectrogram_frames=int(out["spectral_centroid"].shape[-1]),
    )
    return features
