"""Music feature extractor.

Reference parity: fingerprint/extractors/music.go —
  pipeline (:178-243): DC removal + music pre-emphasis (:245-259) ->
  per-frame spectral incl. 6-band contrast (:261-302) -> MFCC per frame
  {13 coeffs, 26 filters, lifter 22} (:114-123, 304-325) -> chroma via
  ChromaSTFT with Hann (:327-376) -> temporal (onsets threshold 0.3 /
  min interval 50 ms :406-416, per-frame crest factor, silence -40 dB)
  -> energy -> harmonic per frame: pitch, HNR, inharmonicity gated on
  pitch confidence > 0.5, tonal centroid = spectral centroid * voicing
  (:528-592); weight table (:144-175).

Note: this extractor is complete but unreachable through the reference's
factory (quirk #1); our factory exposes it behind
strict_reference_routing=False.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from sonido_sonar_tpu.config.config import ContentType, FeatureConfig
from sonido_sonar_tpu.extractors.features import (
    EnergyFeatures,
    ExtractedFeatures,
    HarmonicFeatures,
    SpectralFeatures,
    TemporalFeatures,
)
from sonido_sonar_tpu.logging import get_global_logger
from sonido_sonar_tpu.ops import spectral as S
from sonido_sonar_tpu.ops import temporal as T
from sonido_sonar_tpu.ops.chroma import chroma_from_magnitude
from sonido_sonar_tpu.ops.filters import dc_removal, pre_emphasis_for_content
from sonido_sonar_tpu.ops.framing import frame_signal
from sonido_sonar_tpu.ops.mfcc import MFCCParams, mfcc
from sonido_sonar_tpu.ops.speech import hnr_acf
from sonido_sonar_tpu.ops.stft import STFTResult, spectral_flux

_EPS = 1e-10

# music.go:144-175
MUSIC_FEATURE_WEIGHTS: Dict[str, float] = {
    "chroma_features": 1.0,
    "pitch_estimate": 0.9,
    "harmonic_ratio": 0.9,
    "key_detection": 0.8,
    "chord_detection": 0.8,
    "inharmonicity": 0.7,
    "spectral_centroid": 0.8,
    "spectral_rolloff": 0.7,
    "spectral_bandwidth": 0.7,
    "spectral_flatness": 0.6,
    "spectral_contrast": 0.8,
    "mfcc": 0.7,
    "onset_detection": 0.8,
    "tempo_estimation": 0.8,
    "attack_decay": 0.7,
    "dynamic_range": 0.7,
    "rms_energy": 0.6,
    "zero_crossing_rate": 0.4,
    "silence_ratio": 0.3,
    "speech_features": 0.1,
}


class MusicFeatureExtractor:
    """MusicFeatureExtractor (music.go:22-142)."""

    def __init__(self, config: FeatureConfig):
        self.config = config
        self._log = get_global_logger().with_component("music_feature_extractor")

    def get_name(self) -> str:
        return "MusicFeatureExtractor"

    def get_content_type(self) -> ContentType:
        return ContentType.MUSIC

    def get_feature_weights(self) -> Dict[str, float]:
        return dict(MUSIC_FEATURE_WEIGHTS)

    def extract_features(
        self, spectrogram: STFTResult, pcm: jnp.ndarray, sample_rate: int
    ) -> ExtractedFeatures:
        cfg = self.config
        # preprocessing: DC removal + music pre-emphasis (music.go:245-259)
        pre = pre_emphasis_for_content(
            dc_removal(pcm.astype(jnp.float32)), "music"
        )

        features = ExtractedFeatures(metadata={})

        features.spectral_features = self._extract_spectral(
            spectrogram, pre, sample_rate
        )

        if cfg.enable_mfcc:
            features.mfcc = mfcc(
                spectrogram.magnitude,
                sample_rate,
                cfg.window_size,
                MFCCParams(
                    num_coefficients=cfg.mfcc_coefficients,
                    num_mel_filters=26,
                    lifter_coeff=22.0,
                ),
            )

        if cfg.enable_chroma:
            # ChromaSTFT fold on the already-computed magnitudes
            # (music.go:327-376 recomputes an STFT with Hann; the
            # production spectrogram already is Hann, so we fold it)
            features.chroma_features = chroma_from_magnitude(
                spectrogram.magnitude, sample_rate, cfg.window_size
            )

        if cfg.enable_temporal_features or True:  # music always extracts temporal
            features.temporal_features = self._extract_temporal(
                pre, spectrogram, sample_rate
            )

        features.energy_features = self._extract_energy(pre, spectrogram)

        if cfg.enable_harmonic_features:
            features.harmonic_features = self._extract_harmonic(
                pre, spectrogram, sample_rate
            )

        features.metadata.update(
            extractor_type="music",
            algorithms_used="spectral,chroma,temporal,tonal,harmonic,filters",
            sample_rate=sample_rate,
            spectrogram_frames=int(spectrogram.time_frames),
        )
        return features

    def extract_features_from_pcm(
        self, pcm: jnp.ndarray, sample_rate: int
    ) -> ExtractedFeatures:
        """extract_features recomposed as ONE jitted program: the
        faithful music recomposition already exists as
        parallel.pipeline.batched_music_extractor_features (parity
        asserted in tests/test_parallel.py); this assembles its dict
        into the ExtractedFeatures schema. Used by FingerprintGenerator
        for both the per-clip and the batched path."""
        from sonido_sonar_tpu.extractors.programs import (
            assemble_music_features,
        )
        from sonido_sonar_tpu.parallel.pipeline import (
            batched_music_extractor_features,
        )

        cfg = self.config
        out = batched_music_extractor_features(
            pcm,
            sample_rate=sample_rate,
            window_size=cfg.window_size,
            hop_size=cfg.hop_size,
        )
        return assemble_music_features(out, cfg, sample_rate)

    # ------------------------------------------------------------------
    def _extract_spectral(self, spec: STFTResult, pcm, sr) -> SpectralFeatures:
        """music.go:261-302 (6 contrast bands at :111)."""
        mag = spec.magnitude
        t = mag.shape[-2]
        pcm_frames = frame_signal(pcm, spec.window_size, spec.hop_size)
        d = S.spectral_descriptor_bundle(mag, sr)  # shared passes
        return SpectralFeatures(
            spectral_centroid=d["spectral_centroid"],
            spectral_rolloff=d["spectral_rolloff"],
            spectral_bandwidth=d["spectral_bandwidth"],
            spectral_flatness=d["spectral_flatness"],
            spectral_crest=d["spectral_crest"],
            spectral_slope=d["spectral_slope"],
            spectral_flux=d["spectral_flux"],
            zero_crossing_rate=S.zcr(pcm_frames[..., :t, :], sr),
            spectral_contrast=S.spectral_contrast(mag, sr, 6),
        )

    def _extract_temporal(self, pcm, spec: STFTResult, sr) -> TemporalFeatures:
        """music.go:378-430: flux-onsets threshold 0.3 / 50 ms min
        interval, per-frame crest, -40 dB silence."""
        cfg = self.config
        rms = T.short_time_energy(pcm, cfg.window_size, cfg.hop_size)
        flux = spectral_flux(spec.magnitude)
        onset_mask, onset_count = T.detect_onsets_from_flux(
            flux, cfg.hop_size, sr, threshold=0.3, min_interval_sec=0.05
        )
        duration = pcm.shape[-1] / float(sr)
        silence = T.silence_mask_db(pcm, cfg.window_size, cfg.hop_size, -40.0)
        return TemporalFeatures(
            rms_energy=rms,
            peak_amplitude=jnp.max(jnp.abs(pcm), axis=-1),
            average_amplitude=jnp.mean(jnp.abs(pcm), axis=-1),
            # ComputeRange frames at FIXED 1024/512 internally regardless of
            # extractor config (dynamic_range.go:27-28)
            dynamic_range=T.dynamic_range_db(pcm, 1024, 512),
            crest_factor=T.crest_factor_frames(pcm, cfg.window_size, cfg.hop_size),
            silence_ratio=jnp.mean(silence.astype(jnp.float32), axis=-1),
            onset_density=onset_count.astype(jnp.float32) / duration,
            onset_mask=onset_mask,
            # the reference hardcodes 0.01 s per onset (music.go:418-424,
            # its own TODO) — exact parity
            attack_time=jnp.where(onset_mask, 0.01, 0.0),
            # music envelope framing: frameSize = len/numFrames (~hop),
            # hop = config hop (music.go:383-386) — NOT speech's fixed
            # 512/256 (speech.go:751-777)
            envelope_shape=T.rms_envelope(
                pcm, max(pcm.shape[-1] // rms.shape[-1], 1), cfg.hop_size
            ),
            # the music comparator weight table names tempo_estimation
            # (music.go:159); the interval-histogram primary path
            # (tempo_estimation.go:22-48) feeds it here
            tempo_bpm=T.estimate_tempo(pcm, sr),
        )

    def _extract_energy(self, pcm, spec: STFTResult) -> EnergyFeatures:
        """music.go:478-525 (same structure as the speech variant)."""
        cfg = self.config
        ste = T.short_time_energy(pcm, cfg.window_size, cfg.hop_size)
        entropy = jnp.where(ste > 0, -ste * jnp.log(ste + 1e-10), 0.0)
        power = spec.magnitude * spec.magnitude
        split = spec.magnitude.shape[-1] // 4
        total = jnp.sum(power, axis=-1)
        low = jnp.sum(power[..., :split], axis=-1)
        high = jnp.sum(power[..., split:], axis=-1)
        return EnergyFeatures(
            short_time_energy=ste,
            energy_variance=T.energy_variance(ste),
            energy_entropy=entropy,
            loudness_range=T.loudness_range(pcm, cfg.sample_rate),
            low_energy_ratio=jnp.where(total > 0, low / jnp.maximum(total, _EPS), 0.0),
            high_energy_ratio=jnp.where(total > 0, high / jnp.maximum(total, _EPS), 0.0),
        )

    def _extract_harmonic(self, pcm, spec: STFTResult, sr) -> HarmonicFeatures:
        """music.go:528-592: per-frame pitch/HNR/inharmonicity with the
        extractor's contiguous frame split (len(pcm)/numFrames)."""
        t = spec.time_frames
        frame_size = pcm.shape[-1] // t
        frames = pcm[..., : t * frame_size].reshape(pcm.shape[:-1] + (t, frame_size))

        from sonido_sonar_tpu.ops.pitch import PitchParams, yin_pitch

        params = PitchParams(sample_rate=sr, window_size=frame_size)
        pitch, conf, voicing = yin_pitch(frames, params)

        # frame-wise HNR at the detected pitch
        hnr = hnr_acf(frames, sr, jnp.maximum(pitch, 1.0))
        hnr = jnp.where(pitch > 0, hnr, 0.0)

        # inharmonicity gated on confident pitch (music.go:576-585):
        # partial-deviation proxy = 1 - normalized ACF at the period
        inh = jnp.where((pitch > 0) & (conf > 0.5), 1.0 - jnp.clip(voicing, 0.0, 1.0), 0.0)

        centroid = S.spectral_centroid(spec.magnitude, sr)
        return HarmonicFeatures(
            pitch_estimate=pitch,
            pitch_confidence=conf,
            voicing_strength=voicing,
            harmonic_ratio=hnr,
            inharmonicity_ratio=inh,
            tonal_centroid=centroid[..., :t] * voicing,
        )
