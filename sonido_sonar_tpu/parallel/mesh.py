"""Mesh + sharding helpers.

One logical axis ("data") is enough for this workload: fingerprinting is
data-parallel over streams/chunks, and comparison reduces fixed-size
statistics vectors. The helpers still accept 2-D meshes (data x model)
so corpus sharding can ride a second axis when catalogs outgrow one
chip's HBM.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    axis_names: Sequence[str] = ("data",),
    shape: Optional[Sequence[int]] = None,
    devices=None,
) -> Mesh:
    """Create a mesh over all (or the given) devices.

    Default: 1-D mesh over every addressable device. shape=(d, m) with
    axis_names=("data", "model") builds a 2-D mesh.
    """
    devs = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devs),) if len(axis_names) == 1 else None
    if shape is None:
        raise ValueError("shape required for multi-axis meshes")
    arr = np.array(devs).reshape(shape)
    return Mesh(arr, axis_names=tuple(axis_names))


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(x, mesh: Mesh, axis: str = "data"):
    """Place a [B, ...] array with B sharded over the mesh. B must be a
    multiple of the mesh axis size (pad upstream with a validity mask)."""
    return jax.device_put(x, data_sharding(mesh, axis))


def pad_to_multiple(x: np.ndarray, multiple: int, axis: int = 0):
    """Pad axis 0 to a device-count multiple; returns (padded, n_valid)."""
    n = x.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return x, n
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, rem)
    return np.pad(x, pad), n


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host initialization (SURVEY.md section 2.17: jax.distributed
    init for multi-host slices). No-op when already initialized or when
    running single-process without a coordinator; a real failure (e.g.
    the XLA backend was initialized before this call — any jax
    computation or jax.devices() does that) RAISES instead of silently
    degrading to a single-process run. Exercised by
    tests/test_multihost.py with two real processes over gloo CPU
    collectives."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError:
        if jax.distributed.is_initialized():
            return  # idempotent re-init
        raise
    except ValueError:
        if coordinator_address is None and num_processes is None:
            return  # single-process convenience call without coordinator
        raise


def shard_over_batch(fn, mesh: Mesh, axis: str = "data"):
    """Wrap a batch-parallel function (no cross-batch dependencies) so
    each device runs it on its local batch shard via jax.shard_map.

    This is REQUIRED (not an optimization) for functions whose TPU path
    contains a Pallas kernel: pallas_call carries no SPMD partitioning
    rule, so under a plain jit over sharded inputs XLA cannot split it
    across chips. shard_map gives every device the per-shard program;
    fingerprinting/alignment are embarrassingly parallel over the batch
    so no collectives are needed.

    `fn` takes positional arrays whose leading axis is the batch and
    returns an array / tuple / dict of arrays with leading batch axes.

    The shard_map is built ONCE per arity and wrapped in jax.jit: an
    un-jitted shard_map executes eagerly — every primitive inside is
    dispatched to the mesh one at a time and the body is re-traced on
    every call. The weak-scaling probe (tools/weak_scaling.py) measured
    that as a 47x work inflation at n=2 on the virtual CPU mesh; with
    the jit cache the same program is within noise of perfectly sharded.
    """
    spec = P(axis)
    _jitted = {}

    def wrapped(*args):
        n_in = len(args)
        if n_in not in _jitted:
            _jitted[n_in] = jax.jit(
                jax.shard_map(
                    lambda *xs: fn(*xs), mesh=mesh,
                    in_specs=(spec,) * n_in,
                    out_specs=spec,
                    check_vma=False,
                )
            )
        return _jitted[n_in](*args)

    return wrapped
