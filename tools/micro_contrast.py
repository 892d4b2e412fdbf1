"""On-chip A/B of spectral-contrast formulations (VERDICT r4 item #3).

The round-4 device trace attributes ~45 ms of the 200 ms fingerprint
step to the contrast pipeline: [B,T,F]->[B,F,T] transpose (5.1 ms),
seven per-band sublane sorts (~18.6 ms, mostly fixed per-call cost for
the small bands), layout copies bracketing every sort (~6.5 ms),
candidate-extraction fusions (~10 ms), merge (~7 ms). Only the MEANS of
the top/bottom 20% per band are consumed. Variants measured here:

  A  current ops/spectral.spectral_contrast (baseline)
  B  rank-select small bands: bands with w <= RANK_W are selected with a
     pairwise-rank reduction in the NATURAL [B,T,w] layout (no sort, no
     transpose, one fused pass); only the wide bands transpose + sort
  C  B + the wide bands transposed as exact per-band slices (two small
     transposes instead of one [B,T,F] transpose) with 8-aligned chunk
     boundaries for the widest band

Each variant is asserted equal to A (same selection => identical means)
before timing. Usage: python -u tools/micro_contrast.py [B] [secs] [reps]
"""

from __future__ import annotations

import sys
import time

import numpy as np


def main(batch: int = 128, seconds: int = 30, reps: int = 5) -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from sonido_sonar_tpu.ops.framing import num_frames
    from sonido_sonar_tpu.ops.spectral import (
        _SORT_CLIFF,
        contrast_band_edges,
        spectral_contrast,
    )

    sr, w, hop = 44100, 1024, 256
    f = w // 2 + 1
    t = num_frames(sr * seconds, w, hop)
    num_bands = 6
    edges = contrast_band_edges(num_bands, f, sr)
    widths = [edges[i + 1] - edges[i] for i in range(num_bands)]
    print(f"edges={edges} widths={widths} T={t} B={batch}")

    rng = np.random.default_rng(0)
    mags = [
        jnp.asarray(np.abs(rng.standard_normal((batch, t, f))).astype(np.float32))
        for _ in range(2)
    ]
    jax.block_until_ready(mags)

    # ---------------- variant helpers -------------------------------
    def _rank_select_band(p_btw, k):
        """Exact mean of top-k / bottom-k along the last axis via a
        permutation rank (#{j: x_j > x_i} + #{j<i: x_j == x_i}) — one
        fused compare-reduce pass, natural layout, no sort."""
        ww = p_btw.shape[-1]
        xi = p_btw[..., :, None]
        xj = p_btw[..., None, :]
        jlt = jnp.asarray(
            np.tril(np.ones((ww, ww), np.bool_), -1)
        )  # [i, j] True where j < i
        rank = jnp.sum(
            ((xj > xi) | ((xj == xi) & jlt)).astype(jnp.float32), axis=-1
        )
        top = jnp.sum(jnp.where(rank < k, p_btw, 0.0), axis=-1) / k
        bot = jnp.sum(jnp.where(rank >= ww - k, p_btw, 0.0), axis=-1) / k
        return top, bot

    def _contrast_from_pv(peak, valley):
        valley = jnp.maximum(valley, 1e-10)
        return jnp.where(peak > 0, 10.0 * jnp.log10(peak / valley), 0.0)

    def _desc(x, kk, axis):
        return jax.lax.approx_max_k(
            x, kk, reduction_dimension=axis, recall_target=1.0
        )[0]

    def _split_max_two_chunks(band_fT, c0w, k, axis):
        """Two sorted chunks -> top/bottom-k MEANS via the split-max
        prefix merge (ops/spectral.py, commit 9d80c5a)."""
        prefs_t, prefs_b = [], []
        for c0, cw in c0w:
            s = _desc(
                jax.lax.slice_in_dim(band_fT, c0, c0 + cw, axis=axis), cw, axis
            )
            top = jax.lax.slice_in_dim(s, 0, k, axis=axis)
            bot_asc = jnp.flip(
                jax.lax.slice_in_dim(s, cw - k, cw, axis=axis), axis=axis
            )
            z = jnp.zeros_like(jax.lax.slice_in_dim(s, 0, 1, axis=axis))
            prefs_t.append(
                jnp.concatenate([z, jnp.cumsum(top, axis=axis)], axis=axis)
            )
            prefs_b.append(
                jnp.concatenate([z, jnp.cumsum(bot_asc, axis=axis)], axis=axis)
            )
        cand_t = prefs_t[0] + jnp.flip(prefs_t[1], axis=axis)
        cand_b = prefs_b[0] + jnp.flip(prefs_b[1], axis=axis)
        peak = jnp.max(cand_t, axis=axis) / float(k)
        valley = jnp.min(cand_b, axis=axis) / float(k)
        return peak, valley

    RANK_W = 64  # bands at or below this width use rank-select

    def variant_b(mag, rank_w=RANK_W):
        """Small bands rank-selected in natural layout; wide bands via
        the existing transpose+sort path (one full transpose)."""
        p = mag * mag
        outs = [None] * num_bands
        wide = [
            b for b in range(num_bands)
            if edges[b + 1] - edges[b] > rank_w
        ]
        for b in range(num_bands):
            lo, hi = edges[b], min(edges[b + 1], f)
            width = hi - lo
            k = max(int(0.2 * width), 1)
            if width <= rank_w:
                peak, valley = _rank_select_band(p[..., lo:hi], k)
                outs[b] = _contrast_from_pv(peak, valley)
        if wide:
            p_t = jnp.swapaxes(p, -1, -2)
            axis = p_t.ndim - 2
            for b in wide:
                lo, hi = edges[b], min(edges[b + 1], f)
                width = hi - lo
                k = max(int(0.2 * width), 1)
                band = p_t[..., lo:hi, :]
                if width > _SORT_CLIFF:
                    half = (width // 2 + 7) // 8 * 8  # 8-aligned split
                    peak, valley = _split_max_two_chunks(
                        band, [(0, half), (half, width - half)], k, axis
                    )
                else:
                    s = _desc(band, width, axis)
                    peak = jnp.mean(
                        jax.lax.slice_in_dim(s, 0, k, axis=axis), axis=axis
                    )
                    valley = jnp.mean(
                        jax.lax.slice_in_dim(s, width - k, width, axis=axis),
                        axis=axis,
                    )
                outs[b] = _contrast_from_pv(peak, valley)
        return jnp.stack(outs, axis=-1)

    def variant_c(mag, rank_w=RANK_W):
        """Like B but each wide band gets its own exact-size transpose
        (slice first, transpose second) so the big [B,T,F] transpose and
        the unaligned sublane band slices never exist."""
        p = mag * mag
        outs = [None] * num_bands
        for b in range(num_bands):
            lo, hi = edges[b], min(edges[b + 1], f)
            width = hi - lo
            k = max(int(0.2 * width), 1)
            if width <= rank_w:
                peak, valley = _rank_select_band(p[..., lo:hi], k)
            else:
                band = jnp.swapaxes(p[..., lo:hi], -1, -2)
                axis = band.ndim - 2
                if width > _SORT_CLIFF:
                    half = (width // 2 + 7) // 8 * 8
                    peak, valley = _split_max_two_chunks(
                        band, [(0, half), (half, width - half)], k, axis
                    )
                else:
                    s = _desc(band, width, axis)
                    peak = jnp.mean(
                        jax.lax.slice_in_dim(s, 0, k, axis=axis), axis=axis
                    )
                    valley = jnp.mean(
                        jax.lax.slice_in_dim(s, width - k, width, axis=axis),
                        axis=axis,
                    )
            outs[b] = _contrast_from_pv(peak, valley)
        return jnp.stack(outs, axis=-1)

    def variant_b32(mag):
        return variant_b(mag, rank_w=32)

    variants = {
        "A_current": lambda m: spectral_contrast(m, sr, num_bands),
        "B_rank64": variant_b,
        "B_rank32": variant_b32,
        "C_perband_T": variant_c,
    }

    ref = None
    for name, fn in variants.items():
        jfn = jax.jit(fn)
        out = jfn(mags[0])
        out.block_until_ready()
        if ref is None:
            ref = np.asarray(out)
        else:
            got = np.asarray(out)
            md = float(np.abs(got - ref).max())
            print(f"  {name}: max|diff vs A| = {md:.2e}")
            assert md < 1e-4, f"{name} diverged from baseline"
        times = []
        for i in range(reps):
            x = mags[i % len(mags)]
            t0 = time.perf_counter()
            float(jfn(x).sum())
            times.append(time.perf_counter() - t0)
        med = sorted(times)[len(times) // 2]
        best = min(times)
        print(f"  {name:12s} median {med*1000:7.2f} ms  best {best*1000:7.2f} ms")


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 128,
        int(sys.argv[2]) if len(sys.argv) > 2 else 30,
        int(sys.argv[3]) if len(sys.argv) > 3 else 5,
    )
