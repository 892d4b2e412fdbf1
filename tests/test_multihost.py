"""Multi-host jax.distributed smoke (VERDICT round-2 item #10).

The only parallelism path never executed anywhere was
parallel/mesh.py:initialize_distributed — real multi-chip hardware is
unavailable here, so this is the closest proof the environment allows:
TWO separate processes, each with 4 virtual CPU devices, form one
8-device global mesh through jax.distributed + gloo CPU collectives,
build it via the framework's own make_mesh/initialize_distributed, and
run a sharded STFT stage plus a cross-process global reduction.
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import sys
pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")

from sonido_sonar_tpu.parallel.mesh import (
    initialize_distributed, make_mesh, shard_over_batch,
)
initialize_distributed(f"127.0.0.1:{port}", num_processes=nproc,
                       process_id=pid)
assert jax.process_count() == nproc, jax.process_count()
assert jax.device_count() == 4 * nproc, jax.device_count()
assert jax.local_device_count() == 4

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from sonido_sonar_tpu.ops.stft import stft

mesh = make_mesh()  # global mesh over all 8 devices, both processes
assert mesh.devices.size == 4 * nproc

# each process contributes its local half of a global batch of 8 tones
sr, n = 8000, 2048
local = np.stack([
    np.sin(2 * np.pi * (200.0 + 50.0 * (4 * pid + i))
           * np.arange(n) / sr).astype(np.float32)
    for i in range(4)
])
sh = NamedSharding(mesh, P("data"))
batch = jax.make_array_from_process_local_data(sh, local)

# sharded framework stage: per-device STFT magnitudes via shard_map
mags = shard_over_batch(
    lambda x: stft(x, sample_rate=sr, window_size=256, hop_size=128).magnitude,
    mesh,
)(batch)

# cross-process global reduction: total spectral energy over the batch
total = jax.jit(
    lambda m: jnp.sum(m ** 2),
    out_shardings=NamedSharding(mesh, P()),
)(mags)
got = float(total)

# reference: every process can compute the full batch locally
full = np.stack([
    np.sin(2 * np.pi * (200.0 + 50.0 * j) * np.arange(n) / sr)
    .astype(np.float32)
    for j in range(4 * nproc)
])
want = float(np.sum(np.asarray(
    stft(jnp.asarray(full), sample_rate=sr, window_size=256,
         hop_size=128).magnitude
) ** 2))
assert abs(got - want) / want < 1e-5, (got, want)
print(f"MULTIHOST_OK {pid} {got:.3f}", flush=True)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_import_does_not_initialize_backend():
    """jax.distributed.initialize() must run before ANY backend init, so
    importing the package cannot be allowed to touch devices (a single
    module-level jnp constant used to break every multi-host deployment
    at startup)."""
    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "import sonido_sonar_tpu\n"
        "import sonido_sonar_tpu.parallel.mesh\n"
        "from jax._src import xla_bridge\n"
        "assert not xla_bridge._backends, 'import initialized XLA backend'\n"
        "print('IMPORT_CLEAN')\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        cwd="/root/repo", timeout=120,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "IMPORT_CLEAN" in out.stdout


def test_two_process_distributed_mesh(tmp_path):
    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("JAX_PLATFORMS", None)
    # the worker runs by script path, so sys.path[0] is tmp_path, not
    # the repo — make the package importable without an editable install
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            env=env, text=True, cwd="/root/repo",
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        assert f"MULTIHOST_OK {pid}" in out, out
    # both processes computed the same global reduction
    v0 = [l for l in outs[0].splitlines() if l.startswith("MULTIHOST_OK")][0]
    v1 = [l for l in outs[1].splitlines() if l.startswith("MULTIHOST_OK")][0]
    assert v0.split()[2] == v1.split()[2]
