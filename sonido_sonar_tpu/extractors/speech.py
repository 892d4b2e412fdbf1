"""Speech/news/talk feature extractor.

Reference parity: fingerprint/extractors/speech.go —
  pipeline (:135-243): speech pre-emphasis -> MFCC from the spectrogram
  -> speech analysis (formants/voice quality; non-fatal on failure) ->
  per-frame spectral features + ZCR from PCM -> temporal (RMS energy,
  onsets via energy derivative with mean+2*std threshold :672-716,
  attack times :744-775, envelope 512/256 :719-745) -> energy features
  (elementwise entropy -E*ln(E+1e-10), low/high split at F/4 bins
  :411-461) -> harmonic via frame-wise pitch at fixed 1024/512
  (:464-509, quirk #8);
  weights (:111-133): mfcc .40 / speech .35 / spectral .15 / temporal
  .10; news flips speech .40 / mfcc .35.

TPU design: the whole extraction is one jitted program over device
arrays; every reference per-frame loop is a batched op from
sonido_sonar_tpu.ops.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from sonido_sonar_tpu.config.config import ContentType, FeatureConfig
from sonido_sonar_tpu.extractors.features import (
    EnergyFeatures,
    ExtractedFeatures,
    HarmonicFeatures,
    SpectralFeatures,
    SpeechFeatures,
    TemporalFeatures,
)
from sonido_sonar_tpu.logging import get_global_logger
from sonido_sonar_tpu.ops import spectral as S
from sonido_sonar_tpu.ops import speech as SP
from sonido_sonar_tpu.ops import temporal as T
from sonido_sonar_tpu.ops.filters import pre_emphasis_for_content
from sonido_sonar_tpu.ops.framing import frame_signal
from sonido_sonar_tpu.ops.mfcc import MFCCParams, mfcc
from sonido_sonar_tpu.ops.pitch import detect_pitch_track
from sonido_sonar_tpu.ops.stft import STFTResult, spectral_flux

_EPS = 1e-10


class SpeechFeatureExtractor:
    """SpeechFeatureExtractor (speech.go:20-98)."""

    def __init__(self, config: FeatureConfig, is_news: bool = False):
        self.config = config
        self.is_news = is_news
        self._log = get_global_logger().with_component(
            "speech_feature_extractor"
        )

    def get_name(self) -> str:
        return "SpeechFeatureExtractor"

    def get_content_type(self) -> ContentType:
        return ContentType.NEWS if self.is_news else ContentType.TALK

    def get_feature_weights(self) -> Dict[str, float]:
        """speech.go:111-133."""
        if self.config.similarity_weights:
            return self.config.weights_dict()
        weights = {"mfcc": 0.40, "speech": 0.35, "spectral": 0.15, "temporal": 0.10}
        if self.is_news:
            weights["speech"] = 0.40
            weights["mfcc"] = 0.35
        return weights

    def extract_features(
        self,
        spectrogram: STFTResult,
        pcm: jnp.ndarray,
        sample_rate: int,
    ) -> ExtractedFeatures:
        """ExtractFeatures (speech.go:135-243). pcm: [N] float32 on
        device; spectrogram from ops.stft over the same pcm."""
        cfg = self.config
        # Step 1: speech pre-emphasis (speech.go:247-253)
        pre = pre_emphasis_for_content(pcm.astype(jnp.float32), "speech")

        features = ExtractedFeatures(metadata={})

        # Step 2: MFCC from the (un-pre-emphasized) spectrogram
        if cfg.enable_mfcc:
            features.mfcc = mfcc(
                spectrogram.magnitude,
                sample_rate,
                cfg.window_size,
                MFCCParams(num_coefficients=cfg.mfcc_coefficients),
            )

        # Step 3: speech-specific features — optional: log-warn and
        # continue on failure (speech.go:179-189)
        if cfg.enable_speech_features:
            try:
                features.speech_features = self._extract_speech(pre, sample_rate)
            except Exception as e:
                self._log.warn("speech feature extraction failed", error=str(e))

        # Step 4: spectral features (critical)
        features.spectral_features = self._extract_spectral(
            spectrogram, pre, sample_rate
        )

        # Step 5: temporal features — optional (speech.go:201-211)
        if cfg.enable_temporal_features:
            try:
                features.temporal_features = self._extract_temporal(
                    pre, sample_rate
                )
            except Exception as e:
                self._log.warn("temporal feature extraction failed", error=str(e))

        # Step 6: energy features (critical)
        features.energy_features = self._extract_energy(pre, spectrogram)

        # Step 7: harmonic features (voicing) — optional (speech.go:222-230)
        try:
            features.harmonic_features = self._extract_harmonic(pre, sample_rate)
        except Exception as e:
            self._log.warn("harmonic feature extraction failed", error=str(e))

        features.metadata.update(
            extractor_type="speech",
            content_subtype="news" if self.is_news else "talk",
            algorithms_used="speech,spectral,temporal,filters,tonal",
            pre_emphasis_applied=True,
            sample_rate=sample_rate,
            spectrogram_frames=int(spectrogram.time_frames),
            optimization="speech_optimized",
        )
        return features

    def extract_features_from_pcm(
        self, pcm: jnp.ndarray, sample_rate: int
    ) -> ExtractedFeatures:
        """extract_features recomposed as ONE jitted program riding the
        fused Pallas STFT (extractors/programs.py) — same math, same
        gates, no per-op dispatch overhead and no [B, T, W] frames
        tensor. Used by FingerprintGenerator for both the per-clip and
        the batched path; `extract_features` remains the composition
        oracle (parity asserted in tests/test_extractor_programs.py)."""
        from sonido_sonar_tpu.extractors.programs import (
            assemble_speech_features,
            speech_extractor_program,
        )

        cfg = self.config
        out = speech_extractor_program(
            pcm,
            sample_rate=sample_rate,
            window_size=cfg.window_size,
            hop_size=cfg.hop_size,
            window_type=cfg.window_type,
            mfcc_coefficients=cfg.mfcc_coefficients,
            enable_mfcc=cfg.enable_mfcc,
            enable_speech=cfg.enable_speech_features,
            enable_temporal=cfg.enable_temporal_features,
            enable_contrast=cfg.enable_spectral_contrast,
            contrast_bands=cfg.contrast_bands,
        )
        return assemble_speech_features(out, cfg, self.is_news, sample_rate)

    # ------------------------------------------------------------------
    def _extract_spectral(
        self, spec: STFTResult, pcm: jnp.ndarray, sr: int
    ) -> SpectralFeatures:
        """speech.go:320-367: per-frame descriptors + ZCR from PCM."""
        mag = spec.magnitude
        t = mag.shape[-2]
        pcm_frames = frame_signal(pcm, spec.window_size, spec.hop_size)
        # align frame counts (PCM framing yields the same T by formula)
        zcr = S.zcr(pcm_frames[..., :t, :], sr)
        d = S.spectral_descriptor_bundle(mag, sr)  # shared passes
        return SpectralFeatures(
            spectral_centroid=d["spectral_centroid"],
            spectral_rolloff=d["spectral_rolloff"],
            spectral_bandwidth=d["spectral_bandwidth"],
            spectral_flatness=d["spectral_flatness"],
            spectral_crest=d["spectral_crest"],
            spectral_slope=d["spectral_slope"],
            spectral_flux=d["spectral_flux"],
            zero_crossing_rate=zcr,
            spectral_contrast=(
                S.spectral_contrast(mag, sr, self.config.contrast_bands)
                if self.config.enable_spectral_contrast
                else None
            ),
        )

    def _extract_temporal(self, pcm: jnp.ndarray, sr: int) -> TemporalFeatures:
        """speech.go:370-407."""
        cfg = self.config
        rms = T.short_time_energy(pcm, cfg.window_size, cfg.hop_size)
        onset_mask, onset_count = T.detect_onsets_from_energy(rms)
        duration = pcm.shape[-1] / float(sr)
        attack = T.attack_times_from_onsets(onset_mask, rms, cfg.hop_size, sr)
        return TemporalFeatures(
            rms_energy=rms,
            peak_amplitude=jnp.max(jnp.abs(pcm), axis=-1),
            average_amplitude=jnp.mean(jnp.abs(pcm), axis=-1),
            dynamic_range=T.loudness_range(pcm, sr),
            silence_ratio=T.silence_ratio_percentile(rms),
            onset_density=onset_count.astype(jnp.float32) / duration,
            onset_mask=onset_mask,
            attack_time=attack,
            envelope_shape=T.rms_envelope(pcm, 512, 256),
        )

    def _extract_energy(self, pcm: jnp.ndarray, spec: STFTResult) -> EnergyFeatures:
        """speech.go:411-461."""
        cfg = self.config
        ste = T.short_time_energy(pcm, cfg.window_size, cfg.hop_size)
        # elementwise 'entropy' -E*ln(E + 1e-10) (speech.go:430-433)
        entropy = jnp.where(ste > 0, -ste * jnp.log(ste + 1e-10), 0.0)
        mag = spec.magnitude
        power = mag * mag
        split = mag.shape[-1] // 4
        total = jnp.sum(power, axis=-1)
        low = jnp.sum(power[..., :split], axis=-1)
        high = jnp.sum(power[..., split:], axis=-1)
        low_ratio = jnp.where(total > 0, low / jnp.maximum(total, _EPS), 0.0)
        high_ratio = jnp.where(total > 0, high / jnp.maximum(total, _EPS), 0.0)
        # pad band ratios to the energy-frame length contract: reference
        # indexes spectrogram frames by energy-frame index (same hop)
        return EnergyFeatures(
            short_time_energy=ste,
            energy_variance=T.energy_variance(ste),
            energy_entropy=entropy,
            loudness_range=T.loudness_range(pcm, cfg.sample_rate),
            low_energy_ratio=low_ratio,
            high_energy_ratio=high_ratio,
        )

    def _extract_harmonic(self, pcm: jnp.ndarray, sr: int) -> HarmonicFeatures:
        """speech.go:464-509: fixed 1024/512 pitch track (quirk #8);
        harmonic ratio = voicing * 10, inharmonicity = 1 - voicing,
        tonal centroid = pitch."""
        pitch, conf, voicing = detect_pitch_track(pcm, sr, 1024, 512)
        return HarmonicFeatures(
            pitch_estimate=pitch,
            pitch_confidence=conf,
            voicing_strength=voicing,
            harmonic_ratio=voicing * 10.0,
            inharmonicity_ratio=1.0 - voicing,
            tonal_centroid=jnp.where(pitch > 0, pitch, 0.0),
        )

    def _extract_speech(self, pcm: jnp.ndarray, sr: int) -> SpeechFeatures:
        """speech.go:278-317 + helpers."""
        cfg = self.config
        # analyze_speech is batch-clean (it vmaps only the single-window
        # formant analysis internally) — no outer vmap, so the
        # voice-quality YIN track reaches the Pallas kernel on TPU
        analysis = SP.analyze_speech(pcm, sr)
        is_speech = analysis.is_speech

        # frame-by-frame voicing + tilt at fixed 1024/512 (speech.go:530-585)
        pitch, conf, voicing = detect_pitch_track(pcm, sr, 1024, 512)
        frames = frame_signal(pcm.astype(jnp.float32), 1024, 512)
        d = frames[..., 1:] - frames[..., :-1]
        high_e = jnp.sum(d * d, axis=-1)
        low_e = jnp.sum(frames[..., 1:] * frames[..., 1:], axis=-1)
        tilt = jnp.where(
            low_e > 0,
            -10.0 * jnp.log10(jnp.maximum(high_e / jnp.maximum(low_e, _EPS), _EPS)),
            0.0,
        )

        ste = T.short_time_energy(pcm, cfg.window_size, cfg.hop_size)
        pauses, pause_count = T.pause_durations(ste, cfg.hop_size, sr)

        # speech rate (speech.go:748-775): 4 * speechTime / duration
        silence_ratio = T.silence_ratio_percentile(ste)
        speech_rate = jnp.where(is_speech, 4.0 * (1.0 - silence_ratio), 0.0)

        f = analysis.formants
        vq = analysis.voice_quality
        zero = jnp.zeros_like(vq.jitter)
        # is_speech is scalar per clip: add a trailing axis so it
        # broadcasts against per-frame / per-formant feature axes when
        # the clip axis is batched
        is_sp = jnp.asarray(is_speech)[..., None]
        return SpeechFeatures(
            formant_frequencies=jnp.where(
                is_sp, f.frequencies, jnp.zeros_like(f.frequencies)
            )[..., None, :],  # [..., 1, max_formants]: one analysis frame (:516-527)
            formant_count=jnp.where(is_speech, f.count, 0),
            vocal_tract_length=jnp.where(is_speech, f.vocal_tract_length, 17.5),
            voicing_probability=jnp.where(is_sp, voicing, jnp.zeros_like(voicing)),
            spectral_tilt=jnp.where(is_sp, tilt, jnp.zeros_like(tilt)),
            speech_rate=speech_rate,
            pause_duration=pauses,
            pause_count=pause_count,
            jitter=jnp.where(is_speech, vq.jitter, zero),
            shimmer=jnp.where(is_speech, vq.shimmer, zero),
        )
