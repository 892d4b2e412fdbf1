"""Signal framing: [..., N] -> [..., T, W] frame tensors.

Reference parity: the frame loop in fingerprint/analyzers/spectral.go
(:443-517, `start = frame*hop; copy(signal[start:start+W])`) and
algorithms/common/buffers.go SlidingWindow. Frame count formula:
num_frames = (N - W) // H + 1 (no padding / centering), spectral.go:418.

On TPU this is a single strided gather producing the whole [B, T, W]
tensor in HBM — the reference's goroutine pool becomes a vectorized axis.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def num_frames(n_samples: int, window_size: int, hop_size: int) -> int:
    if n_samples < window_size:
        return 0
    return (n_samples - window_size) // hop_size + 1


def frame_signal(
    signal: jnp.ndarray, window_size: int, hop_size: int
) -> jnp.ndarray:
    """Frame the last axis: [..., N] -> [..., T, W].

    Identical sample coverage to the reference's per-frame copy loop.
    When hop divides window (the common 4x-overlap case) the frames are
    built from window/hop shifted contiguous reshapes interleaved on a
    new axis — ~7x cheaper on TPU than the equivalent strided gather,
    which remains the general-case fallback.
    """
    n = signal.shape[-1]
    t = num_frames(n, window_size, hop_size)
    if t <= 0:
        raise ValueError(
            f"signal length {n} shorter than window {window_size}"
        )
    if window_size % hop_size == 0:
        k = window_size // hop_size
        outs = []
        for s in range(k):
            seg = signal[..., s * hop_size :]
            tt = seg.shape[-1] // window_size
            outs.append(
                seg[..., : tt * window_size].reshape(
                    signal.shape[:-1] + (tt, window_size)
                )
            )
        tmin = min(o.shape[-2] for o in outs)
        stacked = jnp.stack([o[..., :tmin, :] for o in outs], axis=-2)
        frames = stacked.reshape(signal.shape[:-1] + (tmin * k, window_size))
        if frames.shape[-2] < t:
            # reshape path can fall one frame short near the tail; the
            # gather fallback guarantees the exact reference frame count
            pass
        else:
            return frames[..., :t, :]
    # general case: strided gather with a constant [T, W] index matrix
    idx = (
        np.arange(t, dtype=np.int32)[:, None] * hop_size
        + np.arange(window_size, dtype=np.int32)[None, :]
    )
    return signal[..., idx]


def frame_times(
    t: int, hop_size: int, window_size: int, sample_rate: int
) -> np.ndarray:
    """Frame center start-times in seconds (host-side metadata)."""
    return (np.arange(t) * hop_size) / float(sample_rate)


# ---------------------------------------------------------------------
# Shared flattened-signal prep for the Pallas frame kernels
# ---------------------------------------------------------------------

# Pad quantum for the flattened per-row signal the Pallas STFT/YIN
# kernels DMA from. Large enough that pad_to depends on the signal
# length ONLY (not on each kernel's tile geometry): every supported
# geometry's per-tile slack (tile*hop + window <= 256*512 + 2048) fits
# inside one quantum. Two kernels over the same signal then build
# BYTE-IDENTICAL padded flat arrays, so XLA CSEs the pad + 1-D-relayout
# chain (two ~4.2 ms/step chains at B=128 x 30 s became one, device
# trace).
PAD_QUANTUM = 262144


def flatten_padded_rows(signal, lead: int):
    """[B, N] f32 -> (flat [B * row_stride], pad_to, row_stride) with
    `lead` zeros before and pad_to - N zeros after each row; row_stride
    = pad_to + lead is a multiple of 1024 (kernel DMA slices stay
    1024-aligned). Callers must assert their per-tile reach fits:
    (n_tiles - 1) * tile * hop + slice_len <= pad_to."""
    import jax.numpy as jnp

    b, n = signal.shape
    pad_to = (n // PAD_QUANTUM + 2) * PAD_QUANTUM
    sig = jnp.pad(signal, ((0, 0), (lead, pad_to - n)))
    row_stride = pad_to + lead
    return sig.reshape(b * row_stride), pad_to, row_stride
