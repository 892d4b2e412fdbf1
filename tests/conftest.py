"""Test config: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware isn't available in CI; sharding correctness is
validated on XLA's host platform with 8 virtual devices (SURVEY.md
section 4, point 4). Must run before jax initializes.
"""

import os

# Override any ambient platform selection (e.g. JAX_PLATFORMS=axon): tests
# must be reproducible on the 8-device virtual CPU mesh. This environment's
# sitecustomize imports jax at interpreter boot, so env vars alone are too
# late — use jax.config.update as well.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import gc  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


# Every compiled XLA:CPU executable holds several mmap'd code pages and
# they accumulate for the life of the process. The full suite compiles
# tens of thousands of tiny programs (randomized-shape parity sweeps),
# which exhausts vm.max_map_count (65530 here) and crashes the process
# with SIGSEGV inside pjit. Dropping the executable caches between
# modules bounds the live-mapping count; recompilation cost is small
# compared to the crash.
@pytest.fixture(scope="module", autouse=True)
def _clear_jax_caches_per_module():
    yield
    jax.clear_caches()
    gc.collect()
