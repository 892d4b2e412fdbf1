"""CI smoke for the examples/ scripts (VERDICT r3 item #5): each example
runs end-to-end on the CPU mesh against synthesized inputs — imported and
driven through its own main(), not reimplemented here."""

import importlib.util
import os
import sys

import numpy as np
import pytest

_EXAMPLES = os.path.join(os.path.dirname(__file__), os.pardir, "examples")


def _load(name: str):
    spec = importlib.util.spec_from_file_location(
        f"examples_{name}", os.path.join(_EXAMPLES, f"{name}.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _write_pair(tmp_path, seconds=4.0, sr=22050, lag_s=0.25):
    from sonido_sonar_tpu.io.decode import write_wav
    from sonido_sonar_tpu.io.synth import harmonic_tone, shift_signal, white_noise

    rng = np.random.default_rng(7)
    base = np.asarray(
        harmonic_tone(220.0, seconds, sr) + white_noise(seconds, sr, 0.05, seed=3)
    )
    env = np.interp(
        np.arange(len(base)),
        np.linspace(0, len(base), int(6 * seconds)),
        rng.uniform(0.1, 1.0, int(6 * seconds)),
    )
    src = (base * env).astype(np.float32)
    cdn = np.asarray(
        shift_signal(src, int(lag_s * sr), noise=0.02, gain=0.9)
    ).astype(np.float32)
    src_path = str(tmp_path / "src.wav")
    cdn_path = str(tmp_path / "cdn.wav")
    write_wav(src_path, src, sr)
    write_wav(cdn_path, cdn, sr)
    return src_path, cdn_path, sr


def test_cdn_latency_example(tmp_path, capsys):
    src_path, cdn_path, _ = _write_pair(tmp_path)
    _load("cdn_latency").main(src_path, cdn_path, max_lag=1.5)
    out = capsys.readouterr().out
    assert "latency" in out and "confidence" in out
    # the synthesized pair has a known 0.25 s lag; the printed refined
    # latency must recover it (cdn delayed => positive)
    line = [l for l in out.splitlines() if l.startswith("latency")][0]
    ms = float(line.split(":")[1].strip().split(" ")[0])
    assert abs(ms - 250.0) < 6.0  # within one hop


def test_corpus_search_example(tmp_path, capsys):
    from sonido_sonar_tpu.io.decode import write_wav
    from sonido_sonar_tpu.io.synth import harmonic_tone, white_noise

    sr = 22050
    corpus_dir = tmp_path / "corpus"
    corpus_dir.mkdir()
    rng = np.random.default_rng(11)
    target = None
    for i, f0 in enumerate([180.0, 261.6, 392.0]):
        # rich slow-decay harmonic stacks: music pre-emphasis (0.95)
        # attenuates the fundamental ~20 dB, so thin default tones turn
        # unvoiced in the extractor's YIN and the harmonic feature
        # (zero-vector cosine = 0, as in the reference) caps every
        # similarity below the 0.75 match threshold
        pcm = np.asarray(
            harmonic_tone(f0, 3.0, sr, num_harmonics=12, decay=0.95)
            + white_noise(3.0, sr, 0.01, seed=20 + i)
        ).astype(np.float32)
        pcm *= np.interp(
            np.arange(len(pcm)),
            np.linspace(0, len(pcm), 18),
            rng.uniform(0.2, 1.0, 18),
        ).astype(np.float32)
        write_wav(str(corpus_dir / f"clip{i}.wav"), pcm, sr)
        if i == 1:
            target = pcm
    # query = corpus clip 1 + light noise: its own entry must win
    query = (target + 0.01 * rng.standard_normal(len(target))).astype(np.float32)
    qpath = str(tmp_path / "query.wav")
    write_wav(qpath, query, sr)

    _load("corpus_search").main(qpath, str(corpus_dir), k=3)
    out = capsys.readouterr().out
    assert "top" in out
    first = [l for l in out.splitlines() if l.strip().startswith("#1")][0]
    assert "clip1.wav" in first


def test_batch_monitor_example(capsys):
    _load("batch_monitor").main(n_pairs=2, seconds=3.0)
    out = capsys.readouterr().out
    assert "exact" in out.lower() or "pairs" in out.lower()
