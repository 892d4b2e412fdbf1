"""Batched sharded fingerprint pipeline — the framework's flagship
compute program.

One jitted SPMD program maps [B, N] PCM (batch sharded over the mesh)
to the full jit-friendly feature set: STFT -> MFCC + chroma + spectral
descriptors + temporal/energy series + pitch track. This subsumes the
reference's two goroutine pools (frame- and batch-level, SURVEY.md
section 2.17) with zero steady-state communication: XLA partitions
everything along the batch axis.

The host-orchestrated per-stream API (FingerprintGenerator) uses the
same ops; this module is the throughput path for corpus-scale work and
the benchmark target (BASELINE.md: >= 1000 audio-hours/wall-hour).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sonido_sonar_tpu.config.config import FeatureConfig, WindowType
from sonido_sonar_tpu.ops import spectral as S
from sonido_sonar_tpu.ops import temporal as T
from sonido_sonar_tpu.ops.chroma import chroma_from_magnitude
from sonido_sonar_tpu.ops.filters import pre_emphasis, pre_emphasis_for_content
from sonido_sonar_tpu.ops.framing import frame_signal, num_frames
from sonido_sonar_tpu.ops.mfcc import MFCCParams, mfcc
from sonido_sonar_tpu.ops.pitch import PitchParams
from sonido_sonar_tpu.ops.stft import stft

_EPS = 1e-10


@partial(
    jax.jit,
    static_argnames=(
        "sample_rate", "window_size", "hop_size", "window_type",
        "mfcc_coefficients", "enable_chroma", "enable_contrast",
        "enable_pitch", "pre_emphasis_coeff",
    ),
)
def batched_fingerprint_features(
    pcm: jnp.ndarray,
    sample_rate: int = 44100,
    window_size: int = 1024,
    hop_size: int = 256,
    window_type: WindowType = WindowType.HANN,
    mfcc_coefficients: int = 13,
    enable_chroma: bool = True,
    enable_contrast: bool = True,
    enable_pitch: bool = True,
    pre_emphasis_coeff: float = 0.97,
) -> Dict[str, jnp.ndarray]:
    """[B, N] PCM -> dict of [B, ...] feature tensors, one fused program.

    Covers the fingerprint payload the comparator consumes: MFCC, chroma,
    spectral series (centroid/rolloff/bandwidth/flatness/crest/slope/
    flux/zcr/contrast), energy series + stats, pitch/voicing.
    """
    from sonido_sonar_tpu.ops.pallas_stft import (
        pallas_stft_available,
        stft_magnitude_pallas,
    )

    use_pallas = pallas_stft_available(window_size, hop_size)
    # The in-kernel feature epilogue (mel + chroma fold + finished
    # descriptors from the STFT kernel's VMEM magnitudes) is OFF by
    # default: a measured NEGATIVE result at B=128 x 30 s on v5e —
    # 203.2/206.0 ms/step ON vs 200.1/200.9 ms OFF, same harness,
    # interleaved A/B. The device trace shows why: the XLA bundle +
    # mel/chroma work it absorbs is only ~5 ms/step after the round-3
    # layout fixes, less than the epilogue's ~5 ms of extra in-kernel
    # matmul passes (14 bf16 [F, 64] passes/tile); the real post-STFT
    # churn is spectral contrast's sort pipeline (~45 ms/step),
    # which no magnitude-pass fusion can absorb (docs/PERF.md). The
    # kernel stays available (SONIDO_ENABLE_FEAT_EPILOGUE=1, read at
    # trace time) with full interpret-mode parity tests; it wins only
    # for configs that skip contrast+flux but keep mel/chroma (then
    # the magnitude never re-enters HBM math at all).
    import os

    # NOTE: the env var is read AT TRACE TIME — once a geometry's
    # executable is cached, flipping it in the same process has no
    # effect (jit caches key on program + shapes, not environment).
    # Restart the process (or call jax.clear_caches()) to A/B it
    # (ADVICE r4 #2).
    use_feat = (
        use_pallas
        and bool(os.environ.get("SONIDO_ENABLE_FEAT_EPILOGUE"))
        and MFCCParams(num_coefficients=mfcc_coefficients).num_mel_filters
        == 26
        and pallas_stft_available(window_size, hop_size, with_features=True)
    )
    out: Dict[str, jnp.ndarray] = {}
    if use_pallas:
        # fused framing+DFT+magnitude kernel with the aux epilogue: the
        # [B, T, W] frames tensor never exists in HBM; RMS/ZCR replace
        # two ~20-pass full-signal cumsum programs, and rolloff + the
        # quarter-band energy ratios ride one in-VMEM power-cumsum tri
        # matmul instead of HBM-resident bf16 splits. Pre-emphasis is
        # fused too (pre_emph): the pre-emphasized [B, N] signal never
        # exists in HBM either (saved ~7 ms/step of filter fusion +
        # layout copies at B=128 x 30 s, device trace). with_features
        # additionally emits mel + chroma-fold energies and the
        # descriptor bundle's moment sums from four in-kernel HIGHEST
        # matmuls, so the magnitude tensor is only re-read by flux and
        # contrast below.
        x = None
        res = stft_magnitude_pallas(
            pcm.astype(jnp.float32), window_size, hop_size, window_type,
            with_aux=True, pre_emph=pre_emphasis_coeff,
            with_features=use_feat, sample_rate=sample_rate,
        )
        if use_feat:
            mag, aux, feat = res
        else:
            mag, aux = res
    else:
        x = pre_emphasis(pcm.astype(jnp.float32), pre_emphasis_coeff)
        mag = stft(x, window_size, hop_size, window_type, sample_rate).magnitude

    if use_feat:
        from sonido_sonar_tpu.ops.mfcc import mfcc_from_mel
        from sonido_sonar_tpu.ops.pallas_stft import FEAT_LANES

        lo, hi = FEAT_LANES["mel"]
        out["mfcc"] = mfcc_from_mel(
            feat[..., lo:hi], MFCCParams(num_coefficients=mfcc_coefficients)
        )
        if enable_chroma:
            clo, chi = FEAT_LANES["chroma"]
            out["chroma"] = feat[..., clo:chi]
        out.update(S.descriptors_from_feat(feat))
        from sonido_sonar_tpu.ops.stft import spectral_flux

        out["spectral_flux"] = spectral_flux(mag)
    else:
        out["mfcc"] = mfcc(
            mag, sample_rate, window_size,
            MFCCParams(num_coefficients=mfcc_coefficients),
        )
        if enable_chroma:
            out["chroma"] = chroma_from_magnitude(mag, sample_rate, window_size)

        # shared-pass descriptor bundle: ~4 reads of the magnitude tensor
        # instead of ~10 (values identical to the standalone functions)
        out.update(
            S.spectral_descriptor_bundle(
                mag, sample_rate, skip_rolloff=use_pallas
            )
        )
    if enable_contrast:
        out["spectral_contrast"] = S.spectral_contrast(mag, sample_rate, 6)

    if use_pallas:
        # from the kernel epilogue: crossings/sec like ops.spectral.zcr;
        # rolloff bin -> Hz with the same freq grid as _freq_bins
        out["zcr"] = aux["zero_crossings"] / (window_size / float(sample_rate))
        rms = aux["rms"]
        nyquist = sample_rate / 2.0
        out["spectral_rolloff"] = aux["rolloff_bin"] * (
            nyquist / float(mag.shape[-1] - 1)
        )
        out["low_energy_ratio"] = aux["low_energy_ratio"]
        out["high_energy_ratio"] = aux["high_energy_ratio"]
    else:
        frames = frame_signal(x, window_size, hop_size)
        out["zcr"] = S.zcr(frames, sample_rate)
        rms = jnp.sqrt(jnp.mean(frames * frames, axis=-1))
        power = mag * mag
        split = mag.shape[-1] // 4
        total = jnp.sum(power, axis=-1)
        out["low_energy_ratio"] = jnp.where(
            total > 0,
            jnp.sum(power[..., :split], axis=-1) / jnp.maximum(total, _EPS),
            0.0,
        )
        out["high_energy_ratio"] = jnp.where(
            total > 0,
            jnp.sum(power[..., split:], axis=-1) / jnp.maximum(total, _EPS),
            0.0,
        )
    out["rms_energy"] = rms
    out["energy_entropy"] = jnp.where(rms > 0, -rms * jnp.log(rms + 1e-10), 0.0)
    out["energy_variance"] = T.energy_variance(rms)

    if enable_pitch:
        # fused Pallas YIN on TPU (frames never hit HBM); XLA fallback
        # frames + matmul path elsewhere. Pre-emphasis rides the kernel
        # when the STFT kernel path is active (x is None then).
        from sonido_sonar_tpu.ops.pitch import yin_pitch_from_signal

        pitch, conf, voicing = yin_pitch_from_signal(
            pcm.astype(jnp.float32) if x is None else x,
            1024, 512, PitchParams(sample_rate=sample_rate, window_size=1024),
            pre_emph=pre_emphasis_coeff if x is None else 0.0,
        )
        out["pitch"] = pitch
        out["pitch_confidence"] = conf
        out["voicing"] = voicing

    return out


@partial(jax.jit, static_argnames=("sample_rate",))
def batched_speech_analysis(pcm: jnp.ndarray, sample_rate: int) -> Dict[str, jnp.ndarray]:
    """The speech-analysis stack (LPC -> formants -> voice quality ->
    speech detection, ops/speech.py) batched over [B, N] PCM — the
    reference's AnalyzeSpeech hot path (speech/lpc.go:44-134 inside the
    GenerateFingerprint loop, SURVEY.md 3.2) as one jitted program.
    Returns [B]-leading scalars/series for the benchmarkable surface."""
    from sonido_sonar_tpu.ops import speech as SP

    # analyze_speech is batch-clean (no outer vmap): the voice-quality
    # YIN track must reach the Pallas kernel as a real [B, N] call
    res = SP.analyze_speech(pcm.astype(jnp.float32), sample_rate)
    return {
        "formant_frequencies": res.formants.frequencies,
        "formant_count": res.formants.count,
        "vocal_tract_length": res.formants.vocal_tract_length,
        "jitter": res.voice_quality.jitter,
        "shimmer": res.voice_quality.shimmer,
        "hnr": res.voice_quality.hnr,
        "f0_mean": res.voice_quality.mean_f0,
        "voicing_strength": res.voice_quality.voicing_strength,
        "is_speech": res.is_speech,
        "quality": res.quality_score,
    }


@partial(jax.jit, static_argnames=("sample_rate", "window_size", "hop_size"))
def batched_speech_extractor_features(
    pcm: jnp.ndarray,
    sample_rate: int = 44100,
    window_size: int = 1024,
    hop_size: int = 256,
) -> Dict[str, jnp.ndarray]:
    """Full speech-extractor surface: fingerprint features + the speech
    analysis chain, [B, N] -> dict, one jitted program. This is the
    complete per-stream work the reference's speech extractor performs
    (extractors/speech.go), benchmarked as audio-hours/hour/chip
    alongside the fingerprint path.

    Parity: the per-signal extractor pre-emphasizes (speech, 0.97)
    before the whole speech chain (extractors/speech.py:85 /
    speech.go:96) — everything below analyzes the same signal. STE
    accumulation order differs from the framed path by ~1e-7 relative
    (hop-block sums), which can flip a frame sitting exactly at the
    silence-percentile threshold: speech_rate/pause classification may
    differ by one frame quantum from the per-signal extractor."""
    out = batched_fingerprint_features(
        pcm, sample_rate=sample_rate, window_size=window_size,
        hop_size=hop_size, enable_chroma=False, enable_contrast=True,
    )
    x = pre_emphasis_for_content(pcm.astype(jnp.float32), "speech")
    out.update(batched_speech_analysis(x, sample_rate))

    # remaining SpeechFeatures payload (speech.go:278-317 helpers) so
    # the batched surface covers everything the per-signal extractor
    # emits: spectral tilt, pauses, speech rate — all via hop-block
    # framed sums (no [B, T, W] frames tensor, no full-length cumsum
    # whose cancellation error grows with clip length)
    n = x.shape[-1]
    t_tilt = num_frames(n, 1024, 512)
    d = x[..., 1:] - x[..., :-1]
    d2 = jnp.pad(d * d, [(0, 0)] * (x.ndim - 1) + [(0, 1)])
    x2 = x * x
    starts = jnp.arange(t_tilt) * 512
    # frame j covers samples [s, s+1024); the per-frame tilt sums run
    # over diffs [s, s+1023) and samples [s+1, s+1024) — a full-window
    # block sum minus the one boundary term, exactly
    high_e = T.framed_sum_hopblocks(d2, 1024, 512, t_tilt) - d2[..., starts + 1023]
    low_e = T.framed_sum_hopblocks(x2, 1024, 512, t_tilt) - x2[..., starts]
    tilt = jnp.where(
        low_e > 0,
        -10.0 * jnp.log10(jnp.maximum(high_e / jnp.maximum(low_e, _EPS), _EPS)),
        0.0,
    )
    # extractor gates tilt on is_speech (extractors/speech.py)
    out["spectral_tilt"] = jnp.where(
        jnp.asarray(out["is_speech"])[..., None], tilt, jnp.zeros_like(tilt)
    )

    ste = T.short_time_energy_cumsum(x, window_size, hop_size)
    pauses, pause_count = T.pause_durations(ste, hop_size, sample_rate)
    out["pause_duration"] = pauses
    out["pause_count"] = pause_count
    silence_ratio = T.silence_ratio_percentile(ste)
    out["speech_rate"] = jnp.where(
        out["is_speech"], 4.0 * (1.0 - silence_ratio), 0.0
    )
    return out


@partial(
    jax.jit,
    static_argnames=(
        "sample_rate", "window_size", "hop_size", "enable_cqt",
        "enable_hpcp",
    ),
)
def batched_music_extractor_features(
    pcm: jnp.ndarray,
    sample_rate: int = 44100,
    window_size: int = 1024,
    hop_size: int = 256,
    enable_cqt: bool = False,
    enable_hpcp: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Full music-extractor surface batched over [B, N] PCM as ONE
    jitted program (VERDICT r2 item #4): everything
    extractors/music.MusicFeatureExtractor computes per signal
    (fingerprint/extractors/music.go:178-243 — DC removal + music
    pre-emphasis, 6-band contrast spectral set, MFCC 13/26/lifter-22,
    chroma, flux onsets 0.3/50 ms, -40 dB silence, interval-histogram
    tempo, per-frame pitch/HNR/inharmonicity) plus the tonal payload the
    music comparator weights reference (key correlations, per-frame
    chord match) and optional CQT/HPCP chromas (precomputed-kernel
    matmuls on the MXU).

    Parity: tests/test_parallel.py asserts equality with the per-signal
    MusicFeatureExtractor on every shared field."""
    from sonido_sonar_tpu.ops.chroma import (
        chroma_cqt,
        chroma_from_magnitude,
        hpcp_from_magnitude,
        key_correlations,
    )
    from sonido_sonar_tpu.ops.filters import dc_removal, pre_emphasis_for_content
    from sonido_sonar_tpu.ops.mfcc import MFCCParams, mfcc
    from sonido_sonar_tpu.ops.pitch import PitchParams, yin_pitch
    from sonido_sonar_tpu.ops.speech import hnr_acf
    from sonido_sonar_tpu.ops.stft import spectral_flux, stft
    from sonido_sonar_tpu.ops.tonal import _CHORD_MATRIX

    x = pcm.astype(jnp.float32)
    pre = pre_emphasis_for_content(dc_removal(x), "music")
    from sonido_sonar_tpu.ops.pallas_stft import (
        pallas_stft_available,
        stft_magnitude_pallas,
    )

    if pallas_stft_available(window_size, hop_size):
        # fused framing+DFT+magnitude kernel, as in the fingerprint
        # pipeline (bf16 hi/lo 3-pass, ~1e-5 of the HIGHEST XLA path —
        # within the extractor parity tolerance)
        mag = stft_magnitude_pallas(x, window_size, hop_size)
    else:
        mag = stft(x, window_size, hop_size, sample_rate=sample_rate).magnitude
    t = mag.shape[-2]
    out: Dict[str, jnp.ndarray] = {}

    # ---- spectral (music.go:261-302): shared-pass bundle + 6-band
    # contrast; ZCR on the preprocessed signal's frames --------------
    out.update(S.spectral_descriptor_bundle(mag, sample_rate))
    out["spectral_contrast"] = S.spectral_contrast(mag, sample_rate, 6)
    # prefix-sum ZCR: the preprocessed signal differs from mag's input,
    # so the Pallas aux epilogue can't serve it — but materializing a
    # [B, T, W] frames tensor (~680 MB at B=32 x 30 s) just to count
    # sign changes is pure HBM waste
    out["zcr"] = S.zcr_from_signal(
        pre, window_size, hop_size, sample_rate
    )[..., :t]

    # ---- MFCC {13, 26 filters, lifter 22} (music.go:114-123) -------
    out["mfcc"] = mfcc(
        mag, sample_rate, window_size,
        MFCCParams(num_coefficients=13, num_mel_filters=26, lifter_coeff=22.0),
    )

    # ---- chroma + key + chords -------------------------------------
    chroma = chroma_from_magnitude(mag, sample_rate, window_size)
    out["chroma"] = chroma
    out["key_correlations"] = key_correlations(jnp.mean(chroma, axis=-2))
    cn = chroma / jnp.maximum(
        jnp.linalg.norm(chroma, axis=-1, keepdims=True), _EPS
    )
    chord_sims = jnp.matmul(
        cn, jnp.asarray(_CHORD_MATRIX).T, preferred_element_type=jnp.float32
    )                                                  # [B, T, n_chords]
    out["chord_index"] = jnp.argmax(chord_sims, axis=-1).astype(jnp.int32)
    out["chord_score"] = jnp.max(chord_sims, axis=-1)

    # ---- temporal (music.go:378-430) -------------------------------
    out["rms_energy"] = T.short_time_energy(pre, window_size, hop_size)
    flux = spectral_flux(mag)
    onset_mask, onset_count = T.detect_onsets_from_flux(
        flux, hop_size, sample_rate, threshold=0.3, min_interval_sec=0.05
    )
    duration = x.shape[-1] / float(sample_rate)
    out["onset_mask"] = onset_mask
    out["onset_density"] = onset_count.astype(jnp.float32) / duration
    out["attack_time"] = jnp.where(onset_mask, 0.01, 0.0)
    out["peak_amplitude"] = jnp.max(jnp.abs(pre), axis=-1)
    out["average_amplitude"] = jnp.mean(jnp.abs(pre), axis=-1)
    # fixed 1024/512 framing per dynamic_range.go:27-28
    out["dynamic_range"] = T.dynamic_range_db(pre, 1024, 512)
    out["crest_factor"] = T.crest_factor_frames(pre, window_size, hop_size)
    silence = T.silence_mask_db(pre, window_size, hop_size, -40.0)
    out["silence_ratio"] = jnp.mean(silence.astype(jnp.float32), axis=-1)
    # music envelope framing per music.go:383-386: frameSize =
    # len/numFrames (~hop), hop = config hop
    env_frame = max(pre.shape[-1] // out["rms_energy"].shape[-1], 1)
    out["envelope_shape"] = T.rms_envelope(pre, env_frame, hop_size)
    out["tempo_bpm"] = T.estimate_tempo(pre, sample_rate)

    # ---- energy (music.go:478-525) ---------------------------------
    ste = out["rms_energy"]
    out["energy_variance"] = T.energy_variance(ste)
    out["energy_entropy"] = jnp.where(ste > 0, -ste * jnp.log(ste + 1e-10), 0.0)
    out["loudness_range"] = T.loudness_range(pre, sample_rate)
    power = mag * mag
    split = mag.shape[-1] // 4
    total = jnp.sum(power, axis=-1)
    out["low_energy_ratio"] = jnp.where(
        total > 0, jnp.sum(power[..., :split], axis=-1) / jnp.maximum(total, _EPS), 0.0
    )
    out["high_energy_ratio"] = jnp.where(
        total > 0, jnp.sum(power[..., split:], axis=-1) / jnp.maximum(total, _EPS), 0.0
    )

    # ---- harmonic (music.go:528-592): contiguous frame split -------
    # frame count padded to a sublane multiple so the reshape is a
    # bitcast, not a relayout copy (docs/PERF.md); pad frames sliced off
    frame_size = x.shape[-1] // t
    t8 = ((t + 7) // 8) * 8
    need = t8 * frame_size
    pre_pad = jnp.pad(
        pre, [(0, 0)] * (pre.ndim - 1) + [(0, max(0, need - pre.shape[-1]))]
    )
    frames = pre_pad[..., :need].reshape(pre.shape[:-1] + (t8, frame_size))
    pitch, conf, voicing = yin_pitch(
        frames, PitchParams(sample_rate=sample_rate, window_size=frame_size)
    )
    pitch, conf, voicing = pitch[..., :t], conf[..., :t], voicing[..., :t]
    hnr = hnr_acf(frames, sample_rate, jnp.maximum(jnp.pad(
        pitch, [(0, 0)] * (pitch.ndim - 1) + [(0, t8 - t)]
    ), 1.0))[..., :t]
    out["pitch"] = pitch
    out["pitch_confidence"] = conf
    out["voicing"] = voicing
    out["hnr"] = jnp.where(pitch > 0, hnr, 0.0)
    out["inharmonicity"] = jnp.where(
        (pitch > 0) & (conf > 0.5), 1.0 - jnp.clip(voicing, 0.0, 1.0), 0.0
    )
    out["tonal_centroid"] = out["spectral_centroid"][..., :t] * voicing

    # ---- optional CQT/HPCP chromas (beyond the per-signal payload):
    # both are precomputed-constant matmuls that ride the MXU ---------
    if enable_cqt:
        out["chroma_cqt"] = chroma_cqt(x, sample_rate)
    if enable_hpcp:
        out["hpcp"] = hpcp_from_magnitude(mag, sample_rate, window_size)
    return out


@dataclass
class BatchedFingerprintPipeline:
    """Mesh-sharded fingerprint pipeline.

    Usage:
        pipe = BatchedFingerprintPipeline(mesh, config)
        feats = pipe(pcm_batch)   # [B, N] numpy/jnp, B % n_devices == 0
    """

    mesh: Mesh
    config: FeatureConfig
    axis: str = "data"

    def __call__(self, pcm_batch) -> Dict[str, jnp.ndarray]:
        sharding = NamedSharding(self.mesh, P(self.axis))
        pcm = jax.device_put(jnp.asarray(pcm_batch, dtype=jnp.float32), sharding)
        return self._step_fn()(pcm)

    def _step_fn(self):
        # built once per (config, mesh, axis) so repeated calls reuse
        # the jitted shard_map executable instead of re-tracing
        # (weak-scaling fix); keying on the settings means mutating
        # pipe.config / pipe.mesh invalidates the cache instead of
        # silently serving stale features (ADVICE r4 #1)
        cfg = self.config
        key = (cfg, id(self.mesh), self.axis)
        cached = getattr(self, "_cached_step", None)
        if cached is not None and cached[0] == key:
            return cached[1]

        def step(x):
            return batched_fingerprint_features(
                x,
                sample_rate=cfg.sample_rate,
                window_size=cfg.window_size,
                hop_size=cfg.hop_size,
                window_type=cfg.window_type,
                mfcc_coefficients=cfg.mfcc_coefficients,
                enable_chroma=cfg.enable_chroma,
                enable_contrast=cfg.enable_spectral_contrast,
            )

        if self.mesh.size > 1:
            # shard_map, not sharded-jit: the TPU path contains Pallas
            # kernels, which the SPMD partitioner cannot split — each
            # device must run the per-shard program (see
            # mesh.shard_over_batch)
            from sonido_sonar_tpu.parallel.mesh import shard_over_batch

            fn = shard_over_batch(step, self.mesh, self.axis)
        else:
            fn = step
        object.__setattr__(self, "_cached_step", (key, fn))
        return fn


@partial(jax.jit, static_argnames=("max_lag",))
def batched_pair_alignment(
    query_energy: jnp.ndarray,
    reference_energy: jnp.ndarray,
    max_lag: int,
) -> Dict[str, jnp.ndarray]:
    """Batched source/CDN alignment over energy series [B, T].

    Returns per-pair peak lag (frames; positive = reference delayed),
    peak correlation, and SNR — the BASELINE config-5 workload, batch
    sharded like everything else.
    """
    from sonido_sonar_tpu.ops.stats.alignment import _ncc_arrays
    from sonido_sonar_tpu.ops.stats.correlation import _peak_metrics

    t1 = query_energy.shape[-1]
    t2 = reference_energy.shape[-1]

    def one(q, r):
        corr = _ncc_arrays(q, r, max_lag, t1, t2)
        (peak_corr, peak_lag, *_rest) = _peak_metrics(corr, max_lag, t1, t2)
        snr = _rest[2]
        return -peak_lag, peak_corr, snr  # positive = reference delayed

    lags, corrs, snrs = jax.vmap(one)(query_energy, reference_energy)
    return {"lag_frames": lags, "peak_correlation": corrs, "snr": snrs}


def run_stream(
    pipeline: "BatchedFingerprintPipeline",
    batches,
    drain_every: int = 2,
):
    """Process an iterator of [B, N] PCM batches with input overlap.

    JAX's async dispatch overlaps the H2D upload + compute of batch k+1
    with the host-side consumption of batch k; `drain_every` bounds the
    number of in-flight steps (the double-buffering depth). Yields the
    completed feature dicts in order (SURVEY.md phase-6 input-pipeline
    overlap).
    """
    import collections

    import jax

    inflight = collections.deque()
    for batch in batches:
        inflight.append(pipeline(batch))
        if len(inflight) > drain_every:
            done = inflight.popleft()
            jax.block_until_ready(done)
            yield done
    while inflight:
        done = inflight.popleft()
        jax.block_until_ready(done)
        yield done


@partial(jax.jit, static_argnames=("band",))
def batched_pair_dtw(
    query_feats: jnp.ndarray,
    reference_feats: jnp.ndarray,
    band: int,
) -> Dict[str, jnp.ndarray]:
    """Batched banded DTW over feature-sequence pairs [B, T, D].

    Runs the fused Pallas banded fill across the pair axis (one kernel,
    batch as the outer grid dimension) when a TPU backend is present,
    falling back to a vmapped lax.scan fill elsewhere; the backtrack is
    vmapped either way. Returns per-pair normalized distance and the
    median interior path displacement in frames (positive = reference
    delayed) — the batched counterpart of the analyzer's DTW path for
    corpus-scale source/CDN alignment (BASELINE config 5).
    """
    from sonido_sonar_tpu.ops.stats.dtw import _backtrack_banded, _fill_banded
    from sonido_sonar_tpu.ops.stats.pallas_backtrack import (
        backtrack_banded_pallas_batch,
        pallas_backtrack_available,
    )
    from sonido_sonar_tpu.ops.stats.pallas_dtw import (
        fill_banded_pallas_batch,
        pallas_dtw_available,
    )

    n = query_feats.shape[1]
    m = reference_feats.shape[1]

    if pallas_dtw_available(band):
        costs = fill_banded_pallas_batch(
            query_feats.astype(jnp.float32),
            reference_feats.astype(jnp.float32),
            band, n, m,
        )
    else:
        costs = jax.vmap(lambda q, r: _fill_banded(q, r, band, n, m))(
            query_feats.astype(jnp.float32),
            reference_feats.astype(jnp.float32),
        )

    if pallas_backtrack_available(band):
        qs_b, rs_b, _, lengths = backtrack_banded_pallas_batch(
            costs, band, n, m
        )
    else:
        qs_b, rs_b, _, lengths = jax.vmap(
            lambda c: _backtrack_banded(c, band, n, m)
        )(costs)

    def one(cost, qs, rs, length):
        raw = cost[n, m - n + band]
        dist = raw / jnp.maximum(length, 1).astype(jnp.float32)
        idx = jnp.arange(qs.shape[0])
        valid = idx < length
        interior = valid & (qs > 0) & (rs > 0) & (qs < n - 1) & (rs < m - 1)
        disp = jnp.where(interior, (rs - qs).astype(jnp.float32), jnp.nan)
        offset = jnp.nanmedian(disp)
        offset = jnp.where(jnp.isnan(offset), 0.0, offset)
        return dist, offset, length

    dists, offsets, lengths = jax.vmap(one)(costs, qs_b, rs_b, lengths)
    return {
        "distance": dists,
        "offset_frames": offsets,
        "path_length": lengths,
    }


@partial(
    jax.jit,
    static_argnames=("sample_rate", "hop_size", "search_hops", "max_offset_samples"),
)
def batched_refine_offsets(
    query_pcm: jnp.ndarray,
    reference_pcm: jnp.ndarray,
    coarse_offsets_seconds: jnp.ndarray,
    sample_rate: int,
    hop_size: int = 256,
    search_hops: int = 24,
    max_offset_samples: int = 0,
) -> jnp.ndarray:
    """Exact-sample offset refinement for a batch of stream pairs: the
    vectorized counterpart of AlignmentExtractor.refine_offset_with_pcm
    (GCC-PHAT around a frame-level coarse estimate; cf. arXiv:2204.13622).

    query_pcm [B, N1], reference_pcm [B, N2], coarse_offsets_seconds [B]
    (positive = reference delayed) -> refined offsets [B] in seconds.
    `max_offset_samples` bounds |coarse| (static; defaults to N/4) so the
    per-pair analysis window length stays shape-stable.
    """
    b, n1 = query_pcm.shape
    n2 = reference_pcm.shape[-1]
    if max_offset_samples <= 0:
        max_offset_samples = min(n1, n2) // 4
    length = min(n1, n2) - max_offset_samples
    if length <= 0:
        raise ValueError("max_offset_samples leaves no analysis window")
    max_lag = max(search_hops * hop_size, 8)
    n_fft = 1
    while n_fft < length + max_lag:
        n_fft <<= 1

    coarse = jnp.round(coarse_offsets_seconds * sample_rate).astype(jnp.int32)
    coarse = jnp.clip(coarse, -max_offset_samples, max_offset_samples)
    # reference delayed by `coarse`: compare query[t] with ref[t + coarse]
    start_q = jnp.clip(-coarse, 0, n1 - length)
    start_r = jnp.clip(coarse, 0, n2 - length)
    q = jax.vmap(
        lambda x, s: jax.lax.dynamic_slice_in_dim(x, s, length, axis=-1)
    )(query_pcm.astype(jnp.float32), start_q)
    r = jax.vmap(
        lambda x, s: jax.lax.dynamic_slice_in_dim(x, s, length, axis=-1)
    )(reference_pcm.astype(jnp.float32), start_r)

    f1 = jnp.fft.rfft(q, n=n_fft, axis=-1)
    f2 = jnp.fft.rfft(r, n=n_fft, axis=-1)
    cross = f1 * jnp.conj(f2)
    # energy-weighted PHAT (same soft floor as the per-pair refiner:
    # empty bands must not contribute random unit phases)
    mag = jnp.abs(cross)
    delta = 1e-3 * jnp.mean(mag, axis=-1, keepdims=True)
    phat = cross / jnp.maximum(mag + delta, 1e-12)
    cc = jnp.fft.irfft(phat, n=n_fft, axis=-1)
    window = jnp.concatenate(
        [cc[:, n_fft - max_lag :], cc[:, : max_lag + 1]], axis=-1
    )
    residual_lag = jnp.argmax(window, axis=-1).astype(jnp.int32) - max_lag
    residual = -residual_lag  # positive = reference (still) delayed
    return (coarse + residual).astype(jnp.float32) / float(sample_rate)


@partial(
    jax.jit,
    static_argnames=("sample_rate", "hop_size", "search_hops", "max_offset_samples"),
)
def batched_phat_candidates(
    query_pcm: jnp.ndarray,
    reference_pcm: jnp.ndarray,
    cand_offsets_seconds: jnp.ndarray,   # [B, K]
    sample_rate: int,
    hop_size: int = 256,
    search_hops: int = 24,
    max_offset_samples: int = 0,
) -> tuple:
    """GCC-PHAT refinement + whitened-peak strength for K candidate
    coarse offsets per pair: the vectorized counterpart of
    AlignmentExtractor.verify_candidate_offsets (beat-periodic content
    makes the energy-correlation comb ambiguous; the whitened PCM
    correlation is not, because waveform phase differs across beats).

    query_pcm [B, N1], reference_pcm [B, N2], cand_offsets_seconds
    [B, K] -> (refined [B, K] seconds, peaks [B, K]). The caller picks
    the strongest candidate per pair and gates on the peak/margin policy
    (ops/stats/alignment._VERIFY_FLOOR/_VERIFY_MARGIN)."""
    b, n1 = query_pcm.shape
    n2 = reference_pcm.shape[-1]
    if max_offset_samples <= 0:
        max_offset_samples = min(n1, n2) // 4
    length = min(n1, n2) - max_offset_samples
    if length <= 0:
        raise ValueError("max_offset_samples leaves no analysis window")
    max_lag = max(search_hops * hop_size, 8)
    n_fft = 1
    while n_fft < length + max_lag:
        n_fft <<= 1

    coarse = jnp.round(cand_offsets_seconds * sample_rate).astype(jnp.int32)
    coarse = jnp.clip(coarse, -max_offset_samples, max_offset_samples)
    start_q = jnp.clip(-coarse, 0, n1 - length)   # [B, K]
    start_r = jnp.clip(coarse, 0, n2 - length)
    slice_k = jax.vmap(
        lambda x, s: jax.lax.dynamic_slice_in_dim(x, s, length, axis=-1),
        in_axes=(None, 0),
    )
    q = jax.vmap(slice_k)(query_pcm.astype(jnp.float32), start_q)      # [B,K,L]
    r = jax.vmap(slice_k)(reference_pcm.astype(jnp.float32), start_r)

    f1 = jnp.fft.rfft(q, n=n_fft, axis=-1)
    f2 = jnp.fft.rfft(r, n=n_fft, axis=-1)
    cross = f1 * jnp.conj(f2)
    mag = jnp.abs(cross)
    delta = 1e-3 * jnp.mean(mag, axis=-1, keepdims=True)
    phat = cross / jnp.maximum(mag + delta, 1e-12)
    cc = jnp.fft.irfft(phat, n=n_fft, axis=-1)
    window = jnp.concatenate(
        [cc[..., n_fft - max_lag :], cc[..., : max_lag + 1]], axis=-1
    )
    idx = jnp.argmax(window, axis=-1)
    peaks = jnp.take_along_axis(window, idx[..., None], axis=-1)[..., 0]
    residual = -(idx.astype(jnp.int32) - max_lag)
    refined = (coarse + residual).astype(jnp.float32) / float(sample_rate)
    return refined, peaks


@partial(jax.jit, static_argnames=("sample_rate", "max_lag_samples"))
def batched_phat_global(
    query_pcm: jnp.ndarray,
    reference_pcm: jnp.ndarray,
    sample_rate: int,
    max_lag_samples: int,
) -> tuple:
    """Whitened full-range GCC-PHAT scan per pair, [B, N] x2 ->
    ([B] offset_seconds, [B] peak). The batched counterpart of
    AlignmentExtractor._phat_global: on stationary/periodic content the
    true offset can be invisible in the energy-series correlation
    (tone-alias combs reach |NCC| 1.0 while the true lag scores ~0.1),
    so it never enters the top-K candidate cut — the whitened PCM scan
    supplies it directly. Positive offset = reference delayed."""
    n1 = query_pcm.shape[-1]
    n2 = reference_pcm.shape[-1]
    length = min(n1, n2)
    max_lag = min(max_lag_samples, length - 1)
    n_fft = 1
    while n_fft < length + max_lag:
        n_fft <<= 1
    f1 = jnp.fft.rfft(query_pcm.astype(jnp.float32)[..., :length], n=n_fft, axis=-1)
    f2 = jnp.fft.rfft(reference_pcm.astype(jnp.float32)[..., :length], n=n_fft, axis=-1)
    cross = f1 * jnp.conj(f2)
    mag = jnp.abs(cross)
    delta = 1e-3 * jnp.mean(mag, axis=-1, keepdims=True)
    phat = cross / jnp.maximum(mag + delta, 1e-12)
    cc = jnp.fft.irfft(phat, n=n_fft, axis=-1)
    window = jnp.concatenate(
        [cc[..., n_fft - max_lag :], cc[..., : max_lag + 1]], axis=-1
    )
    idx = jnp.argmax(window, axis=-1)
    peaks = jnp.take_along_axis(window, idx[..., None], axis=-1)[..., 0]
    offsets = -(idx.astype(jnp.int32) - max_lag).astype(jnp.float32) / float(
        sample_rate
    )
    return offsets, peaks
