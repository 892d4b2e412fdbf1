"""Alignment accuracy evaluation: recovered CDN offset vs ground truth.

Sweeps lag values and degradation levels (noise, gain), reports the
error distribution for the frame-level path and the GCC-PHAT-refined
path against the BASELINE budget (one hop = 5.8 ms @ 44.1 kHz hop 256).

Usage: python eval_accuracy.py [--sr 44100] [--quick]
Prints a JSON summary line last.
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def run(sr: int = 44100, quick: bool = False, batched: bool = False) -> dict:
    import jax.numpy as jnp

    from sonido_sonar_tpu.config.config import FeatureConfig
    from sonido_sonar_tpu.extractors import AlignmentExtractor
    from sonido_sonar_tpu.io.synth import harmonic_tone, shift_signal, white_noise

    rng = np.random.default_rng(7)
    dur = 12.0
    base = harmonic_tone(220.0, dur, sr) + white_noise(dur, sr, 0.05, seed=11)
    env = np.interp(
        np.arange(len(base)), np.linspace(0, len(base), 96), rng.uniform(0.1, 1.0, 96)
    )
    source = (base * env).astype(np.float32)

    fc = FeatureConfig(sample_rate=sr, window_size=1024, hop_size=256)
    ext = AlignmentExtractor(fc, max_lag_seconds=4.0)
    hop_s = fc.hop_size / sr

    lags_s = [0.1, 0.5, 1.234, 2.5] if quick else [0.05, 0.1, 0.5, 1.234, 2.0, 3.5]
    noises = [0.01, 0.05] if quick else [0.005, 0.02, 0.05, 0.1]

    coarse_errs, refined_errs, confs = [], [], []
    coarse_offsets, cdns, true_lags = [], [], []
    src_j = jnp.asarray(source)
    for lag_s in lags_s:
        lag = int(lag_s * sr) + 137  # off the hop grid on purpose
        for noise in noises:
            cdn = shift_signal(source, lag, noise=noise, gain=0.9)
            cdn_j = jnp.asarray(cdn)
            feats = ext.align_audio_files(src_j, cdn_j, sr)
            refined = ext.refine_offset_with_pcm(
                src_j, cdn_j, sr, feats.temporal_offset
            )
            coarse_errs.append(abs(feats.temporal_offset - lag / sr))
            refined_errs.append(abs(refined - lag / sr))
            confs.append(feats.offset_confidence)
            coarse_offsets.append(feats.temporal_offset)
            cdns.append(cdn)
            true_lags.append(lag)
            print(
                f"lag={lag/sr*1000:8.1f}ms noise={noise:.3f} "
                f"coarse_err={coarse_errs[-1]*1000:6.2f}ms "
                f"refined_err={refined_errs[-1]*1000:7.3f}ms "
                f"conf={confs[-1]:.2f}",
                file=sys.stderr,
            )

    batched_summary = None
    if batched:
        # [B]-pair device program (ops/stats/batched_alignment): must
        # reproduce the per-pair offsets exactly (VERDICT r1 item #3)
        from sonido_sonar_tpu.ops.stats.batched_alignment import (
            batched_align_audio,
        )

        q = np.broadcast_to(source, (len(cdns), len(source))).copy()
        r = np.stack(cdns)
        out = batched_align_audio(
            q, r, sr, window_size=fc.window_size, hop_size=fc.hop_size,
            max_lag_seconds=4.0, dtw_band=ext.alignment_config.dtw_band_radius,
            refine=True,
        )
        per_pair = np.round(np.asarray(coarse_offsets) * sr).astype(np.int64)
        got = np.asarray(out["offset_samples"], dtype=np.int64)
        mismatches = int((per_pair != got).sum())
        ref_err = np.abs(out["offset_seconds_refined"] - np.asarray(true_lags) / sr)
        batched_summary = {
            "coarse_identical_to_per_pair": mismatches == 0,
            "coarse_mismatches": mismatches,
            "refined_within_one_hop": float((ref_err <= hop_s + 1e-6).mean()),
            "refined_err_ms_median": float(np.median(ref_err) * 1000),
        }
        print(f"[batched] {batched_summary}", file=sys.stderr)

    ce = np.array(coarse_errs)
    re_ = np.array(refined_errs)
    summary = {
        "cases": len(ce),
        "hop_ms": hop_s * 1000,
        "coarse_err_ms": {
            "median": float(np.median(ce) * 1000),
            "p95": float(np.percentile(ce, 95) * 1000),
            "within_one_hop": float((ce <= hop_s + 1e-6).mean()),
        },
        "refined_err_ms": {
            "median": float(np.median(re_) * 1000),
            "p95": float(np.percentile(re_, 95) * 1000),
            "within_one_hop": float((re_ <= hop_s + 1e-6).mean()),
        },
        "mean_confidence": float(np.mean(confs)),
    }
    if batched_summary is not None:
        summary["batched"] = batched_summary
    return summary


def run_extended(sr: int = 44100, quick: bool = False) -> dict:
    """Hardened categorized sweep (VERDICT round-1 item #5): speech-like
    and music-like sources, band-limited CDN simulation, SNR down to
    0 dB, both offset signs, and time-stretch (clock-skew) cases scored
    via estimate_time_stretch. Reports per-category within-one-hop rates
    and a time-stretch error metric."""
    import jax.numpy as jnp

    from sonido_sonar_tpu.config.config import FeatureConfig
    from sonido_sonar_tpu.extractors import AlignmentExtractor
    from sonido_sonar_tpu.extractors.features import EnergyFeatures, ExtractedFeatures
    from sonido_sonar_tpu.io.synth import (
        band_limit,
        harmonic_tone,
        music_like,
        shift_signal,
        speech_like,
        time_stretch,
        white_noise,
    )
    from sonido_sonar_tpu.ops.chroma import chroma_from_magnitude
    from sonido_sonar_tpu.ops.stft import stft
    from sonido_sonar_tpu.ops.temporal import short_time_energy

    rng = np.random.default_rng(7)
    dur = 12.0
    fc = FeatureConfig(sample_rate=sr, window_size=1024, hop_size=256)
    ext = AlignmentExtractor(fc, max_lag_seconds=4.0)
    hop_s = fc.hop_size / sr

    def tone_src(seed):
        base = harmonic_tone(220.0, dur, sr) + white_noise(dur, sr, 0.05, seed=seed)
        env = np.interp(
            np.arange(len(base)), np.linspace(0, len(base), 96),
            rng.uniform(0.1, 1.0, 96),
        )
        return (base * env).astype(np.float32)

    sources = {
        "tone": tone_src(11),
        "speech": speech_like(dur, sr, seed=12, random_syllables=True),
        "music": music_like(dur, sr, seed=13),
    }
    lags = [0.1, 1.234] if quick else [0.1, 0.5, 1.234, 2.5]
    lags = [int(s * sr) + 137 for s in lags]
    lags += [-l for l in lags[:2]]  # both offset signs

    def one_case(src, cdn, true_lag, verify_top_peaks=None):
        feats = ext.align_audio_files(
            jnp.asarray(src), jnp.asarray(cdn), sr,
            verify_top_peaks=verify_top_peaks,
        )
        refined = ext.refine_offset_with_pcm(
            jnp.asarray(src), jnp.asarray(cdn), sr, feats.temporal_offset
        )
        return (
            abs(feats.temporal_offset - true_lag / sr),
            abs(refined - true_lag / sr),
            feats.offset_confidence,
        )

    categories: dict = {}

    def record(cat, coarse, refined, conf):
        c = categories.setdefault(cat, {"coarse": [], "refined": [], "conf": []})
        c["coarse"].append(coarse)
        c["refined"].append(refined)
        c["conf"].append(conf)

    for name, src in sources.items():
        rms = float(np.sqrt(np.mean(src**2)))
        for lag in lags:
            # moderate degradation
            cdn = shift_signal(src, lag, noise=0.05, gain=0.9)
            record(name, *one_case(src, cdn, lag))
            # 0 dB SNR: noise amplitude equals the signal RMS
            cdn0 = shift_signal(src, lag, noise=rms, gain=0.9, seed=3)
            record(f"{name}_snr0db", *one_case(src, cdn0, lag))
        # band-limited CDN (codec simulation), moderate noise
        band = (300.0, 3400.0) if name == "speech" else (50.0, 8000.0)
        for lag in lags[:2]:
            cdn = shift_signal(src, lag, noise=0.02, gain=0.9)
            cdn = band_limit(cdn, sr, *band)
            # DEFAULT path: adaptive PCM verification (comb-ambiguous
            # pairs get top-K GCC-PHAT disambiguation automatically)
            record(f"{name}_bandlimited", *one_case(src, cdn, lag))
            # verification forced OFF (the reference's raw behavior):
            # a comb-ambiguous wrong answer must arrive at LOW
            # confidence (the ambiguity penalty), never self-assured
            record(
                f"{name}_bandlimited_unverified",
                *one_case(src, cdn, lag, verify_top_peaks=1),
            )

    # stationary content (no envelope): the energy-series NCC is blind
    # here — tone-alias combs reach |NCC| 1.0 at wrong lags while the
    # true lag scores ~0.1, so only the overlap/ambiguity-triggered
    # whitened full-range PHAT candidate (_phat_global) recovers it
    stat_src = (
        white_noise(dur, sr, 0.3, seed=21)
        + np.asarray(harmonic_tone(220.0, dur, sr)) * 0.3
    ).astype(np.float32)
    for lag in lags[:2] + [-lags[0]]:
        cdn = shift_signal(stat_src, lag, noise=0.05, gain=0.9)
        record("stationary", *one_case(stat_src, cdn, lag))

    # time-stretch (clock skew): estimate_time_stretch via chroma DTW
    stretch_errs = []
    src = sources["music"]

    def features_for(pcm):
        mag = stft(jnp.asarray(pcm), fc.window_size, fc.hop_size,
                   sample_rate=sr).magnitude
        return ExtractedFeatures(
            chroma_features=chroma_from_magnitude(mag, sr, fc.window_size),
            energy_features=EnergyFeatures(
                short_time_energy=short_time_energy(
                    jnp.asarray(pcm), fc.window_size, fc.hop_size
                )
            ),
        )

    dtw_stretch_errs = []
    for factor in ([0.99, 1.01] if quick else [0.98, 0.99, 1.005, 1.01, 1.02]):
        cdn = time_stretch(src, factor)
        qf, rf = features_for(src), features_for(cdn)
        af = ext.extract_alignment_features(
            qf, rf, jnp.asarray(src), jnp.asarray(cdn), sr,
        )
        # estimateTimeStretch semantics: query_span / reference_span
        expected = 1.0 / factor
        stretch_errs.append(abs(af.time_stretch - expected))
        # DTW-slope path specifically (alignment.go:448-476): force the
        # chroma-DTW alignment as "best" so the slope term is exercised
        # (when correlation wins, upstream falls back to length ratio)
        alignments = ext.perform_multi_feature_alignment(qf, rf, sr)
        dtw_fa = alignments.get("dtw_chroma")
        if dtw_fa is not None and dtw_fa.success:
            est = ext.estimate_time_stretch(
                dtw_fa, len(src) / sr, len(cdn) / sr
            )
            dtw_stretch_errs.append(abs(est - expected))
        print(
            f"[stretch] factor={factor} est={af.time_stretch:.4f} "
            f"dtw_est={est if dtw_fa else float('nan'):.4f} "
            f"expected~{expected:.4f}", file=sys.stderr,
        )

    out: dict = {"hop_ms": hop_s * 1000, "categories": {}}
    for cat, c in categories.items():
        co = np.array(c["coarse"])
        re_ = np.array(c["refined"])
        out["categories"][cat] = {
            "cases": len(co),
            "coarse_within_one_hop": float((co <= hop_s + 1e-6).mean()),
            "refined_within_one_hop": float((re_ <= hop_s + 1e-6).mean()),
            "refined_err_ms_median": float(np.median(re_) * 1000),
            "mean_confidence": float(np.mean(c["conf"])),
        }
        print(f"[{cat}] {out['categories'][cat]}", file=sys.stderr)
    out["time_stretch"] = {
        "cases": len(stretch_errs),
        "max_abs_error": float(np.max(stretch_errs)),
        "median_abs_error": float(np.median(stretch_errs)),
        "dtw_slope_max_abs_error": (
            float(np.max(dtw_stretch_errs)) if dtw_stretch_errs else None
        ),
    }
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sr", type=int, default=44100)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--batched", action="store_true")
    ap.add_argument("--full", action="store_true",
                    help="hardened categorized sweep (sources x degradations)")
    args = ap.parse_args()
    if args.full:
        summary = run_extended(args.sr, args.quick)
    else:
        summary = run(args.sr, args.quick, args.batched)
    print(json.dumps(summary))
