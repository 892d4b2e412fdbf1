"""Fused min-interval onset thinning (Pallas TPU kernel).

The onset peak-pick (onset_detection.go:26-120) keeps a candidate only
when at least `min_frames` frames passed since the last KEPT onset — a
data-dependent recurrence that XLA can only lower as a lax.scan over
every frame. Even unrolled 32x, the three thinning scans in the music
step (pipeline flux onsets + the tempo facade's flux and energy onsets)
cost ~9.7 ms/step at B=32 x 30 s (per-HLO trace, docs/PERF.md): the
per-scan-step sequential overhead dominates work that is a handful of
vector ops.

Here the whole recurrence runs inside one kernel: batch rows sit in
vector lanes, frames advance in an in-kernel fori_loop (a Mosaic
hardware loop — cycles per step, not microseconds), and the carry is a
single [1, 128] "last kept frame" vreg persisted across grid chunks.
Output is bit-identical to the scan (integer/boolean recurrence — there
is no accumulation order to differ).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CHUNK = 512
_LANES = 128


def _thin_kernel(min_frames, c_ref, out_ref, last_ref):
    ci = pl.program_id(1)

    @pl.when(ci == 0)
    def _init():
        last_ref[...] = jnp.full(
            last_ref.shape, -min_frames - 1, jnp.int32
        )

    def step(r, last):
        i = ci * _CHUNK + r
        col = c_ref[0, pl.ds(r, 1), :]
        ok = (col > 0) & ((i - last) >= min_frames)
        out_ref[0, pl.ds(r, 1), :] = ok.astype(jnp.float32)
        return jnp.where(ok, i, last)

    last_ref[...] = jax.lax.fori_loop(0, _CHUNK, step, last_ref[...])


def thin_onsets_available() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover - backend probe
        return False


@partial(jax.jit, static_argnames=("min_frames", "interpret"))
def thin_onsets_pallas(
    cand: jnp.ndarray, min_frames: int, interpret: bool = False
) -> jnp.ndarray:
    """Min-interval thinning of candidate masks.

    cand: [R, T] (bool or 0/1 float) candidate peaks per row.
    Returns the kept mask [R, T] (bool): candidate i survives iff
    i - last_kept >= min_frames, scanning left to right.
    """
    r, t = cand.shape
    rp = ((r + _LANES - 1) // _LANES) * _LANES
    tp = ((t + _CHUNK - 1) // _CHUNK) * _CHUNK
    x = cand.astype(jnp.float32)
    x = jnp.pad(x, ((0, rp - r), (0, tp - t)))
    # rows -> lanes, frames -> sublane-major sequential axis
    x = x.T.reshape(tp, rp // _LANES, _LANES).transpose(1, 0, 2)
    out = pl.pallas_call(
        partial(_thin_kernel, min_frames),
        grid=(rp // _LANES, tp // _CHUNK),
        in_specs=[
            pl.BlockSpec((1, _CHUNK, _LANES), lambda bi, ci: (bi, ci, 0))
        ],
        out_specs=pl.BlockSpec(
            (1, _CHUNK, _LANES), lambda bi, ci: (bi, ci, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((rp // _LANES, tp, _LANES), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, _LANES), jnp.int32)],
        interpret=interpret,
    )(x)
    kept = out.transpose(1, 0, 2).reshape(tp, rp)[:t, :r].T
    return kept > 0
