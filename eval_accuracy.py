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


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sr", type=int, default=44100)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--batched", action="store_true")
    args = ap.parse_args()
    summary = run(args.sr, args.quick, args.batched)
    print(json.dumps(summary))
