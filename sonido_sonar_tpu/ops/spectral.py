"""Frame-parallel spectral descriptors over magnitude spectrograms.

Reference parity: algorithms/spectral/*.go — centroid (:18-56), rolloff
(:19-70), bandwidth (:22-62), flatness (:31-166, threshold 1e-10), crest
(:18-51), slope (:24-82, log-log masked regression), contrast
(spectral_contrast.go:26-188: log-spaced bands from 200 Hz, top/bottom
20% power mean, dB), zero-crossing rate (zero_crossing_rate.go:37-110).

All functions take [..., F] magnitude frames (or [..., T, W] sample
frames for ZCR) and vectorize over every leading axis — the reference's
per-frame loops become one fused reduction pass on the VPU.

Frequency axis convention (reference): freqs[i] = i * nyquist / (F - 1)
(spectral_centroid.go initializeFreqBins et al.).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=8)
def _rolloff_tri(n: int) -> np.ndarray:
    """Upper-left triangular ones [n, n] (cumsum-as-matmul), bf16."""
    tri = (np.arange(n)[:, None] <= np.arange(n)[None, :]).astype(np.float32)
    out = tri.astype(jnp.bfloat16)
    out.setflags(write=False)
    return out

_EPS = 1e-10
# XLA sublane-sort width above which the lowering falls off its
# in-register path (28 vregs; device-measured cliff between 224 and 256
# on v5e) — spectral_contrast chunks wider bands (see below).
_SORT_CLIFF = 224


def _freq_bins(num_bins: int, sample_rate: int) -> np.ndarray:
    nyquist = sample_rate / 2.0
    return (np.arange(num_bins, dtype=np.float64) * nyquist / (num_bins - 1)).astype(
        np.float32
    )


def spectral_centroid(magnitude: jnp.ndarray, sample_rate: int) -> jnp.ndarray:
    """Magnitude-weighted mean frequency, [..., F] -> [...]."""
    freqs = jnp.asarray(_freq_bins(magnitude.shape[-1], sample_rate))
    num = jnp.sum(magnitude * freqs, axis=-1)
    den = jnp.sum(magnitude, axis=-1)
    return jnp.where(den > 0, num / jnp.maximum(den, _EPS), 0.0)


def spectral_rolloff(
    magnitude: jnp.ndarray, sample_rate: int, threshold: float = 0.85
) -> jnp.ndarray:
    """Frequency below which `threshold` of spectral energy lies.

    Matches spectral_rolloff.go:19-56: cumulative mag^2 vs
    threshold*total, returning the frequency of the first bin reaching
    the target.
    """
    freqs = jnp.asarray(_freq_bins(magnitude.shape[-1], sample_rate))
    power = magnitude * magnitude
    total = jnp.sum(power, axis=-1, keepdims=True)
    cum = jnp.cumsum(power, axis=-1)
    reached = cum >= threshold * total
    # argmax finds the first True along the last axis
    idx = jnp.argmax(reached, axis=-1)
    roll = freqs[idx]
    return jnp.where(total[..., 0] > 0, roll, 0.0)


def spectral_bandwidth(
    magnitude: jnp.ndarray, sample_rate: int, centroid: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Magnitude-weighted std around the centroid (spectral_bandwidth.go:22-47)."""
    freqs = jnp.asarray(_freq_bins(magnitude.shape[-1], sample_rate))
    if centroid is None:
        centroid = spectral_centroid(magnitude, sample_rate)
    diff = freqs - centroid[..., None]
    num = jnp.sum(diff * diff * magnitude, axis=-1)
    den = jnp.sum(magnitude, axis=-1)
    return jnp.where(den > 0, jnp.sqrt(num / jnp.maximum(den, _EPS)), 0.0)


def spectral_flatness(
    magnitude: jnp.ndarray, min_threshold: float = _EPS
) -> jnp.ndarray:
    """Wiener entropy: geometric/arithmetic mean ratio
    (spectral_flatness.go:31-75). The geometric mean is taken over bins
    above `min_threshold` only, matching the reference."""
    valid = magnitude > min_threshold
    count = jnp.sum(valid, axis=-1)
    log_sum = jnp.sum(jnp.where(valid, jnp.log(jnp.maximum(magnitude, min_threshold)), 0.0), axis=-1)
    geo = jnp.exp(log_sum / jnp.maximum(count, 1))
    arith = jnp.mean(magnitude, axis=-1)
    flat = jnp.where(
        (count > 0) & (arith > min_threshold), geo / jnp.maximum(arith, _EPS), 0.0
    )
    return flat


def spectral_flatness_db(magnitude: jnp.ndarray) -> jnp.ndarray:
    """dB variant (spectral_flatness.go:78-92)."""
    f = spectral_flatness(magnitude)
    return 10.0 * jnp.log10(jnp.maximum(f, _EPS))


def band_limited_flatness(
    magnitude: jnp.ndarray,
    sample_rate: int,
    low_hz: float,
    high_hz: float,
) -> jnp.ndarray:
    """Flatness over a static frequency band (spectral_flatness.go:95-135)."""
    n = magnitude.shape[-1]
    freqs = _freq_bins(n, sample_rate)
    lo = int(np.searchsorted(freqs, low_hz, side="left"))
    hi = int(np.searchsorted(freqs, high_hz, side="right"))
    hi = max(hi, lo + 1)
    return spectral_flatness(magnitude[..., lo:hi])


def speech_band_flatness(magnitude: jnp.ndarray, sample_rate: int) -> jnp.ndarray:
    """300-3400 Hz speech band (spectral_flatness.go:138-150)."""
    return band_limited_flatness(magnitude, sample_rate, 300.0, 3400.0)


def spectral_crest(magnitude: jnp.ndarray) -> jnp.ndarray:
    """Peak / RMS (spectral_crest.go:18-39)."""
    peak = jnp.max(magnitude, axis=-1)
    rms = jnp.sqrt(jnp.mean(magnitude * magnitude, axis=-1))
    return jnp.where(rms > 0, peak / jnp.maximum(rms, _EPS), 0.0)


def spectral_slope(magnitude: jnp.ndarray, sample_rate: int) -> jnp.ndarray:
    """Linear-regression slope of log10(mag) vs log10(freq)
    (spectral_slope.go:24-82), masked to bins with mag > 1e-10 and f > 0."""
    n_bins = magnitude.shape[-1]
    freqs = jnp.asarray(_freq_bins(n_bins, sample_rate))
    valid = (magnitude > _EPS) & (freqs > 0)
    x = jnp.where(valid, jnp.log10(jnp.maximum(freqs, _EPS)), 0.0)
    y = jnp.where(valid, jnp.log10(jnp.maximum(magnitude, _EPS)), 0.0)
    n = jnp.sum(valid, axis=-1).astype(jnp.float32)
    sum_x = jnp.sum(x, axis=-1)
    sum_y = jnp.sum(y, axis=-1)
    sum_xy = jnp.sum(x * y, axis=-1)
    sum_xx = jnp.sum(x * x, axis=-1)
    den = n * sum_xx - sum_x * sum_x
    slope = jnp.where(
        (n >= 2) & (jnp.abs(den) > _EPS),
        (n * sum_xy - sum_x * sum_y) / jnp.where(jnp.abs(den) > _EPS, den, 1.0),
        0.0,
    )
    return slope


# ---------------------------------------------------------------------
# Spectral contrast
# ---------------------------------------------------------------------

@functools.lru_cache(maxsize=32)
def contrast_band_edges(
    num_bands: int, num_bins: int, sample_rate: int
) -> Tuple[int, ...]:
    """Log-spaced band edges in bin units (spectral_contrast.go:139-188):
    log10-spaced from 200 Hz to Nyquist, bin = int(f*(numBins-1)/nyquist),
    forced strictly increasing."""
    nyquist = sample_rate / 2.0
    min_freq = 200.0
    max_freq = nyquist if nyquist > min_freq else min_freq * 2
    log_min, log_max = np.log10(min_freq), np.log10(max_freq)
    edges = []
    for i in range(num_bands + 1):
        f = 10.0 ** (log_min + i * (log_max - log_min) / num_bands)
        b = int(f * (num_bins - 1) / nyquist)
        edges.append(min(max(b, 0), num_bins - 1))
    for i in range(1, num_bands + 1):
        if edges[i] <= edges[i - 1]:
            edges[i] = edges[i - 1] + 1
    return tuple(edges)


def spectral_contrast(
    magnitude: jnp.ndarray, sample_rate: int, num_bands: int = 6
) -> jnp.ndarray:
    """Per-band peak-vs-valley contrast in dB, [..., F] -> [..., num_bands].

    Per band: sort power, mean of bottom 20% = valley, mean of top 20% =
    peak, contrast = 10*log10(peak/valley) (spectral_contrast.go:71-137).
    Band edges are static per (sample_rate, F), so each band is a static
    slice sorted on device.
    """
    import jax

    if magnitude.ndim == 1:
        return spectral_contrast(magnitude[None], sample_rate, num_bands)[0]

    edges = contrast_band_edges(num_bands, magnitude.shape[-1], sample_rate)
    # Sort strategy (v5e device traces, B=128 x 30 s): three independent
    # effects, all needed at once —
    #   1. the sort must run along SUBLANES: transpose the power
    #      spectrum ONCE so every band slice is already sublane-major
    #      (sorting the natural [.., T, F] layout makes XLA bracket
    #      every band sort with transpose copies, ~1-1.7 ms each);
    #   2. the comparator must be approx_max_k's raw compare — jnp.sort
    #      re-derives a total-order integer key inside the comparator on
    #      every compare-exchange (58.9 vs 31.3 ms on the widest band);
    #   3. widths must stay <= 224 sublanes (28 vregs): the lowering
    #      falls off its in-register path above that (~1-2 ms through
    #      224, 16 ms at 256, 32 ms at 278). Wider bands sort in
    #      chunks and merge only the top/bottom-k candidates — the
    #      global top-k multiset is contained in the union of per-chunk
    #      top-k, and the merge re-sort emits it in full-sort order.
    p_t = jnp.swapaxes(magnitude * magnitude, -1, -2)  # [.., F, T]
    axis = p_t.ndim - 2

    def _desc(x, kk):
        return jax.lax.approx_max_k(
            x, kk, reduction_dimension=axis, recall_target=1.0
        )[0]

    def _chunks(width):
        n = -(-width // _SORT_CLIFF)
        step = -(-width // n)
        return [(c0, min(step, width - c0)) for c0 in range(0, width, step)]

    def _topk_rec(x, k):
        """Top-k along `axis` of an arbitrarily wide sublane sort input,
        never sorting more than _SORT_CLIFF sublanes at once: per-chunk
        top-k candidates, then recurse on the (smaller) concatenation.
        The global top-k multiset is contained in the union of per-chunk
        top-k, so the result is exact. When k itself reaches the cliff
        chunking cannot shrink the candidate set (kk == cw) — fall back
        to one wide sort (ADVICE r3 #2)."""
        w = x.shape[axis]
        chunks = _chunks(w)
        if w <= _SORT_CLIFF or sum(min(k, cw) for _, cw in chunks) >= w:
            # base case, or chunking cannot shrink the candidate set
            # (k ~ chunk width): one wide sort is the only exact option
            return _desc(x, w)[..., :k, :]
        cands = [
            _desc(x[..., c0 : c0 + cw, :], cw)[..., : min(k, cw), :]
            for c0, cw in chunks
        ]
        return _topk_rec(jnp.concatenate(cands, axis=axis), k)

    def _botk_rec(x, k):
        """Bottom-k analogue of _topk_rec (order within the k is
        irrelevant — only the mean is consumed)."""
        w = x.shape[axis]
        chunks = _chunks(w)
        if w <= _SORT_CLIFF or sum(min(k, cw) for _, cw in chunks) >= w:
            s = _desc(x, w)
            return s[..., w - k :, :]
        cands = []
        for c0, cw in chunks:
            kk = min(k, cw)
            s = _desc(x[..., c0 : c0 + cw, :], cw)
            cands.append(s[..., cw - kk :, :])
        return _botk_rec(jnp.concatenate(cands, axis=axis), k)

    outs = []
    for b in range(num_bands):
        lo, hi = edges[b], min(edges[b + 1], magnitude.shape[-1])
        if lo >= hi:
            outs.append(jnp.zeros(magnitude.shape[:-1], magnitude.dtype))
            continue
        band = p_t[..., lo:hi, :]
        width = hi - lo
        k = max(int(0.2 * width), 1)
        if width > _SORT_CLIFF:
            chunks = _chunks(width)
            if len(chunks) == 2 and all(k <= cw for _, cw in chunks):
                # split-max merge (v5e trace, B=128 x 30 s: the merge
                # RE-SORTS of the widest band's candidates plus their
                # pad/layout fusions were ~7 ms/step): only the MEANS of
                # the top/bottom k are consumed, and for two sorted
                # chunks sum(top-k of union) = max_m prefA[m]+prefB[k-m]
                # (every m is a sum of SOME k elements <= the true top-k
                # sum, and the true selection takes some m from A) —
                # prefix sums + one shifted add + a max over k+1
                # sublanes, no second sort. Bottom-k analogously with a
                # min over ascending prefixes.
                prefs_t, prefs_b = [], []
                for c0, cw in chunks:
                    s = _desc(band[..., c0 : c0 + cw, :], cw)
                    top = s[..., :k, :]           # desc
                    bot_asc = jnp.flip(s[..., cw - k :, :], axis=axis)
                    z = jnp.zeros_like(s[..., :1, :])
                    prefs_t.append(jnp.concatenate(
                        [z, jnp.cumsum(top, axis=axis)], axis=axis))
                    prefs_b.append(jnp.concatenate(
                        [z, jnp.cumsum(bot_asc, axis=axis)], axis=axis))
                cand_t = prefs_t[0] + jnp.flip(prefs_t[1], axis=axis)
                cand_b = prefs_b[0] + jnp.flip(prefs_b[1], axis=axis)
                peak = jnp.max(cand_t, axis=axis) / float(k)
                valley = jnp.min(cand_b, axis=axis) / float(k)
            else:
                # 3+ chunks (F >= 1025): one full sort per first-level
                # chunk serves BOTH ends; the candidate merges then
                # recurse so no sort (merge included) ever exceeds the
                # cliff (ADVICE r3 #2)
                tops, bots = [], []
                for c0, cw in chunks:
                    kk = min(k, cw)
                    s = _desc(band[..., c0 : c0 + cw, :], cw)
                    tops.append(s[..., :kk, :])
                    bots.append(s[..., cw - kk :, :])
                top = _topk_rec(jnp.concatenate(tops, axis=axis), k)
                bot = _botk_rec(jnp.concatenate(bots, axis=axis), k)
                peak = jnp.mean(top, axis=axis)
                valley = jnp.mean(bot, axis=axis)
        elif width >= 64:
            # ONE full descending sort serves both ends (approx_max_k +
            # approx_min_k at recall 1.0 EACH lower to a full sort).
            sorted_desc = _desc(band, width)
            peak = jnp.mean(sorted_desc[..., :k, :], axis=axis)
            valley = jnp.mean(sorted_desc[..., width - k :, :], axis=axis)
        else:
            # stable=False: the default stable lowering pairs the values
            # with an s32 iota tie-breaker that costs more than the sort
            # itself at these widths. Only the ORDER of equal elements
            # differs; the sorted values, and so the top/bottom-k means,
            # are identical.
            sorted_band = jnp.sort(band, axis=axis, stable=False)
            valley = jnp.mean(sorted_band[..., :k, :], axis=axis)
            peak = jnp.mean(sorted_band[..., width - k :, :], axis=axis)
        valley = jnp.maximum(valley, _EPS)
        c = jnp.where(peak > 0, 10.0 * jnp.log10(peak / valley), 0.0)
        outs.append(c)
    return jnp.stack(outs, axis=-1)


# ---------------------------------------------------------------------
# Zero-crossing rate (time-domain, over sample frames)
# ---------------------------------------------------------------------

def zero_crossings(frames: jnp.ndarray) -> jnp.ndarray:
    """Count of sign changes per frame, [..., W] -> [...]
    (zero_crossing_rate.go:42-48: sign change counts (x>=0) boundary)."""
    nonneg = frames >= 0
    changes = nonneg[..., 1:] != nonneg[..., :-1]
    return jnp.sum(changes, axis=-1).astype(jnp.float32)


def zcr(frames: jnp.ndarray, sample_rate: int) -> jnp.ndarray:
    """Crossings per second (zero_crossing_rate.go:37-53)."""
    w = frames.shape[-1]
    duration = w / float(sample_rate)
    return zero_crossings(frames) / duration


def zcr_from_signal(
    signal: jnp.ndarray, window_size: int, hop_size: int, sample_rate: int
) -> jnp.ndarray:
    """zcr over sliding frames WITHOUT materializing the [..., T, W]
    frames tensor. Frame j covers samples [j*hop, j*hop + W), counting
    changes at boundaries i -> i+1 for i in [j*hop, j*hop + W - 1).
    Identical to zcr(frame_signal(x, W, hop)[..., :T, :], sr) —
    bit-exact, the counts are small integers.

    When hop | window the counts are hop-block partial sums minus the
    one boundary indicator (a full-length jnp.cumsum on a 1.3 M-sample
    clip lowers to a multi-ms while loop on TPU — music trace,
    docs/PERF.md); the prefix-sum fallback covers other geometries."""
    from sonido_sonar_tpu.ops.framing import num_frames

    x = signal
    t = num_frames(x.shape[-1], window_size, hop_size)
    nonneg = x >= 0
    changes = (nonneg[..., 1:] != nonneg[..., :-1]).astype(jnp.float32)
    starts = jnp.arange(t) * hop_size
    if window_size % hop_size == 0:
        from sonido_sonar_tpu.ops.temporal import framed_sum_hopblocks

        ch = jnp.pad(changes, [(0, 0)] * (changes.ndim - 1) + [(0, 1)])
        counts = framed_sum_hopblocks(
            ch, window_size, hop_size, t
        ) - ch[..., starts + window_size - 1]
    else:
        cs = jnp.concatenate(
            [jnp.zeros_like(changes[..., :1]), jnp.cumsum(changes, axis=-1)],
            axis=-1,
        )
        counts = cs[..., starts + window_size - 1] - cs[..., starts]
    return counts / (window_size / float(sample_rate))


def zcr_normalized(frames: jnp.ndarray) -> jnp.ndarray:
    """Crossings / (W-1), range [0,1] (zero_crossing_rate.go:57-76)."""
    w = frames.shape[-1]
    return zero_crossings(frames) / float(max(w - 1, 1))


def zcr_with_threshold(
    frames: jnp.ndarray, sample_rate: int, threshold: float
) -> jnp.ndarray:
    """Crossings/sec counting only crossings where both samples exceed
    the amplitude threshold (zero_crossing_rate.go:126-143)."""
    strong = (jnp.abs(frames[..., 1:]) > threshold) & (
        jnp.abs(frames[..., :-1]) > threshold
    )
    nonneg = frames >= 0
    changes = (nonneg[..., 1:] != nonneg[..., :-1]) & strong
    w = frames.shape[-1]
    return jnp.sum(changes, axis=-1).astype(jnp.float32) / (w / float(sample_rate))


# VAD defaults (zero_crossing_rate.go GetOptimalThresholds :247-252)
VAD_ENERGY_THRESHOLD = 0.001
VAD_ZCR_LOW = 0.02
VAD_ZCR_HIGH = 0.6


def detect_voice_activity(
    frames: jnp.ndarray,
    energy_threshold: float = VAD_ENERGY_THRESHOLD,
    zcr_low: float = VAD_ZCR_LOW,
    zcr_high: float = VAD_ZCR_HIGH,
) -> jnp.ndarray:
    """Per-frame VAD (zero_crossing_rate.go:146-168): mean-square energy
    above threshold and normalized ZCR within the speech band."""
    energy = jnp.mean(frames * frames, axis=-1)
    zn = zcr_normalized(frames)
    return (energy >= energy_threshold) & (zn >= zcr_low) & (zn <= zcr_high)


def detect_speech_segments(
    signal: jnp.ndarray,
    frame_size: int,
    hop_size: int,
    energy_threshold: float = VAD_ENERGY_THRESHOLD,
    zcr_low: float = VAD_ZCR_LOW,
    zcr_high: float = VAD_ZCR_HIGH,
    min_segment_samples: int = 0,
):
    """Speech segments as (starts, ends, count) sample indices
    (zero_crossing_rate.go:170-224). Fixed-size output arrays (max 64
    segments) with run-length extraction on host."""
    from sonido_sonar_tpu.ops.framing import frame_signal

    frames = frame_signal(signal, frame_size, hop_size)
    voice = np.asarray(detect_voice_activity(
        frames, energy_threshold, zcr_low, zcr_high
    ))
    n = int(signal.shape[-1])
    starts, ends = [], []
    cur = -1
    for i, v in enumerate(voice):
        if v and cur == -1:
            cur = i * hop_size
        elif not v and cur != -1:
            end = i * hop_size
            if end - cur >= min_segment_samples:
                starts.append(cur)
                ends.append(end)
            cur = -1
    if cur != -1 and n - cur >= min_segment_samples:
        starts.append(cur)
        ends.append(n)
    return np.asarray(starts), np.asarray(ends)


def classify_frame_type(frames: jnp.ndarray) -> jnp.ndarray:
    """Frame class codes (zero_crossing_rate.go:227-244):
    0=silence (energy < 0.001), 1=voiced (zcr<0.1), 2=mixed (<0.4),
    3=unvoiced (<0.7), 4=noise."""
    energy = jnp.mean(frames * frames, axis=-1)
    zn = zcr_normalized(frames)
    cls = jnp.where(zn < 0.1, 1, jnp.where(zn < 0.4, 2, jnp.where(zn < 0.7, 3, 4)))
    return jnp.where(energy < 0.001, 0, cls)


def spectral_contrast_custom_bands(
    magnitude: jnp.ndarray, sample_rate: int, band_freqs_hz: tuple
) -> jnp.ndarray:
    """ComputeWithCustomBands (spectral_contrast.go:104-137): contrast
    over caller-provided band edge frequencies (static tuple)."""
    n_bins = magnitude.shape[-1]
    nyquist = sample_rate / 2.0
    edges = [
        min(max(int(f * (n_bins - 1) / nyquist), 0), n_bins - 1)
        for f in band_freqs_hz
    ]
    for i in range(1, len(edges)):
        if edges[i] <= edges[i - 1]:
            edges[i] = edges[i - 1] + 1
    power = magnitude * magnitude
    outs = []
    for b in range(len(edges) - 1):
        lo, hi = edges[b], min(edges[b + 1], n_bins)
        if lo >= hi:
            outs.append(jnp.zeros(magnitude.shape[:-1], magnitude.dtype))
            continue
        band = power[..., lo:hi]
        width = hi - lo
        k = max(int(0.2 * width), 1)
        sorted_band = jnp.sort(band, axis=-1, stable=False)  # see spectral_contrast
        valley = jnp.maximum(jnp.mean(sorted_band[..., :k], axis=-1), _EPS)
        peak = jnp.mean(sorted_band[..., width - k:], axis=-1)
        outs.append(jnp.where(peak > 0, 10.0 * jnp.log10(peak / valley), 0.0))
    return jnp.stack(outs, axis=-1)


def spectral_descriptor_bundle(
    magnitude: jnp.ndarray,
    sample_rate: int,
    rolloff_threshold: float = 0.85,
    skip_rolloff: bool = False,
) -> dict:
    """All per-frame descriptors in shared passes over the magnitudes.

    Numerically identical to the standalone functions (same expressions,
    same masks); exists so the hot pipeline reads the [.., T, F]
    magnitude tensor ~4 times (joint reductions / bandwidth / rolloff
    cumsum / flux) instead of ~10 — the descriptors are HBM-bound, not
    compute-bound. Returns centroid/rolloff/bandwidth/flatness/crest/
    slope/flux.
    """
    freqs = jnp.asarray(_freq_bins(magnitude.shape[-1], sample_rate))
    m = magnitude
    power = m * m

    # ---- pass 1: every reduction that only needs (m, const) ----------
    m_sum = jnp.sum(m, axis=-1)
    fm_sum = jnp.sum(m * freqs, axis=-1)
    m_max = jnp.max(m, axis=-1)
    p_sum = jnp.sum(power, axis=-1)
    # ONE log over the magnitudes feeds both flatness (ln) and the
    # slope regression (log10 = ln / ln 10); log10(freqs) is a constant
    # per-bin vector, not a per-frame transcendental
    log_m = jnp.log(jnp.maximum(m, _EPS))
    # flatness (threshold mask, log-mean over valid bins)
    valid_f = m > _EPS
    count_f = jnp.sum(valid_f, axis=-1)
    log_sum = jnp.sum(jnp.where(valid_f, log_m, 0.0), axis=-1)
    # slope (log-log regression, masked to mag > eps and f > 0)
    _INV_LN10 = 0.43429448190325176
    logf = jnp.where(
        freqs > 0, jnp.log10(jnp.maximum(freqs, _EPS)), 0.0
    )  # [F] constant
    valid_s = (m > _EPS) & (freqs > 0)
    y = jnp.where(valid_s, log_m * _INV_LN10, 0.0)
    n_s = jnp.sum(valid_s, axis=-1).astype(jnp.float32)
    sum_x = jnp.sum(jnp.where(valid_s, logf, 0.0), axis=-1)
    sum_y = jnp.sum(y, axis=-1)
    sum_xy = jnp.sum(y * logf, axis=-1)
    sum_xx = jnp.sum(jnp.where(valid_s, logf * logf, 0.0), axis=-1)

    centroid = jnp.where(m_sum > 0, fm_sum / jnp.maximum(m_sum, _EPS), 0.0)
    n_bins = m.shape[-1]
    arith = m_sum / n_bins
    geo = jnp.exp(log_sum / jnp.maximum(count_f, 1))
    flatness = jnp.where(
        (count_f > 0) & (arith > _EPS), geo / jnp.maximum(arith, _EPS), 0.0
    )
    rms = jnp.sqrt(p_sum / n_bins)
    crest = jnp.where(rms > 0, m_max / jnp.maximum(rms, _EPS), 0.0)
    den_s = n_s * sum_xx - sum_x * sum_x
    slope = jnp.where(
        (n_s >= 2) & (jnp.abs(den_s) > _EPS),
        (n_s * sum_xy - sum_x * sum_y)
        / jnp.where(jnp.abs(den_s) > _EPS, den_s, 1.0),
        0.0,
    )

    # ---- pass 2: bandwidth (needs the centroid) ----------------------
    diff = freqs - centroid[..., None]
    bw_num = jnp.sum(diff * diff * m, axis=-1)
    bandwidth = jnp.where(
        m_sum > 0, jnp.sqrt(bw_num / jnp.maximum(m_sum, _EPS)), 0.0
    )

    # ---- pass 3: rolloff (cumulative power threshold; skipped when the
    # caller computes it in the Pallas STFT aux epilogue) --------------
    n_bins_i = m.shape[-1]
    if skip_rolloff:
        rolloff = None
    elif jax.default_backend() == "tpu" and n_bins_i <= 1024:
        # lane cumsum lowers to ~log2(F) shifted-add passes over the
        # whole tensor; a triangular-ones matmul does it in one MXU op.
        # hi/lo bf16 split of power is lossless and tri is exact in
        # bf16, so accuracy matches the f32 cumsum (accumulation order
        # aside).
        tri = jnp.asarray(_rolloff_tri(n_bins_i))
        p_hi = power.astype(jnp.bfloat16)
        p_lo = (power - p_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        cum = jnp.matmul(
            p_hi, tri, preferred_element_type=jnp.float32
        ) + jnp.matmul(p_lo, tri, preferred_element_type=jnp.float32)
    else:
        cum = jnp.cumsum(power, axis=-1)
    if not skip_rolloff:
        reached = cum >= rolloff_threshold * p_sum[..., None]
        idx = jnp.argmax(reached, axis=-1)
        rolloff = jnp.where(p_sum > 0, freqs[idx], 0.0)

    # ---- pass 4: flux (frame-to-frame, from ops.stft.spectral_flux) ---
    from sonido_sonar_tpu.ops.stft import spectral_flux

    flux = spectral_flux(m)

    out = {
        "spectral_centroid": centroid,
        "spectral_bandwidth": bandwidth,
        "spectral_flatness": flatness,
        "spectral_crest": crest,
        "spectral_slope": slope,
        "spectral_flux": flux,
    }
    if not skip_rolloff:
        out["spectral_rolloff"] = rolloff
    return out


def descriptors_from_feat(feat: jnp.ndarray) -> dict:
    """spectral_descriptor_bundle's outputs (minus flux/rolloff) from the
    Pallas STFT feature-epilogue lanes ([..., T, 64] laid out per
    ops.pallas_stft.FEAT_LANES). The kernel already FINISHED the
    descriptor math in-kernel (same expressions and masks as the bundle;
    the moment sums accumulate in tiered-precision MXU matmuls, and
    bandwidth uses the moment expansion f2m - fm^2/m_sum with HIGHEST
    moments — see pallas_stft._feature_weight_mats); this just slices
    the lanes out."""
    from sonido_sonar_tpu.ops.pallas_stft import FEAT_LANES

    return {
        k: feat[..., idx]
        for k, idx in FEAT_LANES.items()
        if isinstance(idx, int)
    }
