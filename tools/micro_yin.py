"""Micro-benchmarks for YIN r(tau) formulations + contrast selection +
chunked autocorrelation, on the real chip. Exploration tool."""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def bench(name, fn, *args, iters=5):
    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.sum(leaf))
        ts.append(time.perf_counter() - t0)
    print(f"{name:46s} {sorted(ts)[len(ts)//2]*1000:8.2f} ms")
    return out


def main():
    from sonido_sonar_tpu.ops.pitch import _yin_dft_mats, _yin_difference

    rng = np.random.default_rng(0)
    B, T, W = 128, 2582, 1024
    H = W // 2
    frames = jnp.asarray(rng.standard_normal((B * T, W)).astype(np.float32))
    jax.block_until_ready(frames)
    print(f"frames [{B*T}, {W}]")

    bench("current _yin_difference (DFT HIGH)", jax.jit(_yin_difference), frames)

    # variant: DEFAULT precision DFT
    def yin_dft_prec(x, prec):
        m_x, m_first, m_inv, n_fft = _yin_dft_mats(W)
        f_bins = n_fft // 2 + 1
        first = x[..., :H]
        fx = jnp.matmul(x, jnp.asarray(m_x), precision=prec,
                        preferred_element_type=jnp.float32)
        ff = jnp.matmul(first, jnp.asarray(m_first), precision=prec,
                        preferred_element_type=jnp.float32)
        rex, imx = fx[..., :f_bins], fx[..., f_bins:]
        ref, imf = ff[..., :f_bins], ff[..., f_bins:]
        cross = jnp.concatenate([ref * rex + imf * imx, ref * imx - imf * rex], -1)
        return jnp.matmul(cross, jnp.asarray(m_inv), precision=prec,
                          preferred_element_type=jnp.float32)

    bench("DFT matmuls DEFAULT", jax.jit(
        lambda x: yin_dft_prec(x, jax.lax.Precision.DEFAULT)), frames)

    # variant: depthwise conv (per-frame filter), valid positions
    def yin_conv(x):
        n = x.shape[0]
        first = x[..., :H]
        lhs = x[None, :, :]                    # [1, N, W]
        rhs = first[:, None, ::-1]             # [N, 1, H] reversed -> corr
        out = jax.lax.conv_general_dilated(
            lhs, rhs, window_strides=(1,), padding=((0, 0),),
            dimension_numbers=("NCW", "OIW", "NCW"),
            feature_group_count=n,
        )
        return out[0, :, :H]

    # correctness cross-check on a small slab
    small = frames[:512]
    m = jax.jit(_yin_difference)(small)
    e1 = jnp.sum(small[..., :H] ** 2, axis=-1, keepdims=True)
    sq = small * small
    cs = jnp.cumsum(sq, axis=-1)
    cs0 = jnp.concatenate([jnp.zeros_like(cs[..., :1]), cs], axis=-1)
    s = cs0[..., H : 2 * H] - cs0[..., :H]
    d_conv = e1 + s - 2.0 * jax.jit(yin_conv)(small)
    print("conv vs current max rel diff:",
          float(jnp.max(jnp.abs(d_conv - m) / (jnp.abs(m) + 1e-3))))

    # ---- contrast selection variants ----
    mag = jnp.asarray(rng.standard_normal((B, T * 2, 513)).astype(np.float32) ** 2)
    jax.block_until_ready(mag)
    from sonido_sonar_tpu.ops.spectral import spectral_contrast

    bench("spectral_contrast current", jax.jit(
        lambda m_: spectral_contrast(m_, 44100, 6)), mag)

    def contrast_sort(m_):
        from sonido_sonar_tpu.ops.spectral import contrast_band_edges
        edges = contrast_band_edges(6, m_.shape[-1], 44100)
        power = m_ * m_
        outs = []
        for b in range(6):
            lo, hi = edges[b], min(edges[b + 1], m_.shape[-1])
            band = power[..., lo:hi]
            width = hi - lo
            k = max(int(0.2 * width), 1)
            srt = jnp.sort(band, axis=-1)
            valley = jnp.maximum(jnp.mean(srt[..., :k], axis=-1), 1e-10)
            peak = jnp.mean(srt[..., width - k:], axis=-1)
            outs.append(jnp.where(peak > 0, 10.0 * jnp.log10(peak / valley), 0.0))
        return jnp.stack(outs, axis=-1)

    bench("contrast full-sort", jax.jit(contrast_sort), mag)

    # ---- chunked autocorrelation vs full-signal FFT ----
    sr = 44100
    x = jnp.asarray(rng.standard_normal((32, sr * 30)).astype(np.float32))
    jax.block_until_ready(x)

    def ac_full(v):
        n = v.shape[-1]
        size = 1
        while size < 2 * n:
            size <<= 1
        f = jnp.fft.rfft(v, n=size, axis=-1)
        return jnp.fft.irfft(f * jnp.conj(f), n=size, axis=-1)[..., :1024]

    bench("hnr autocorr full FFT", jax.jit(ac_full), x)

    def ac_chunked(v, L=1024, C=7168):
        n = v.shape[-1]
        pad = (-n) % C
        vp = jnp.pad(v, [(0, 0)] * (v.ndim - 1) + [(0, pad + L)])
        nc = (n + pad) // C
        chunks = vp[..., : nc * C].reshape(v.shape[:-1] + (nc, C))
        ext = jax.vmap(
            lambda row: jax.vmap(
                lambda s: jax.lax.dynamic_slice_in_dim(row, s, C + L)
            )(jnp.arange(nc) * C)
        )(vp)
        size = C + L  # 8192, power of two
        fc = jnp.fft.rfft(chunks, n=size, axis=-1)
        fe = jnp.fft.rfft(ext, n=size, axis=-1)
        cc = jnp.fft.irfft(jnp.conj(fc) * fe, n=size, axis=-1)
        return jnp.sum(cc[..., :L], axis=-2)

    r2 = bench("hnr autocorr chunked 8192", jax.jit(ac_chunked), x)
    r1 = jax.jit(ac_full)(x)
    print("chunked vs full max rel diff:",
          float(jnp.max(jnp.abs(r2 - r1[..., :1024]) / (jnp.abs(r1[..., :1024]) + 1.0))))


if __name__ == "__main__":
    main()
