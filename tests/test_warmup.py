"""Cold-start warmup: a second process with a warm persistent cache
jits the fingerprint program WITHOUT recompiling (VERDICT r4 item #7).

Two subprocesses against one cache directory:
  1. warm:  sonido_sonar_tpu.warmup.warmup() on a tiny geometry
  2. check: registers the '/jax/compilation_cache/cache_hits' listener,
            runs the same public path, asserts hits > 0 and that its
            jit wall-clock beat the cold process's.

Subprocesses (not in-proc) because the point IS cross-process reuse —
in-proc jit caches would make the assertion vacuous.
"""

import json
import os
import subprocess
import sys

_COMMON = r"""
import sys, time, json
import jax
jax.config.update("jax_platforms", "cpu")

# NOTE: `import sonido_sonar_tpu.warmup as W` would bind the FUNCTION
# the package __init__ re-exports under the same name; the from-form
# resolves the submodule through sys.modules.
from sonido_sonar_tpu.warmup import cache_hit_counter, warmup
from sonido_sonar_tpu.config.config import ContentType, FeatureConfig

cache_dir = sys.argv[1]
fc = FeatureConfig(sample_rate=8000, window_size=256, hop_size=128)
kw = dict(
    batch_sizes=(2,), clip_seconds=(1.0,),
    content_types=[ContentType.UNKNOWN],
    components=("fingerprint",),
    cache_dir=cache_dir, min_compile_time_secs=0.0,
)
"""

_WARM = _COMMON + r"""
rep = warmup(fc, **kw)
print(json.dumps({"stages": len(rep), "secs": sum(rep.values())}))
"""

_CHECK = _COMMON + r"""
hits = cache_hit_counter()
t0 = time.perf_counter()
rep = warmup(fc, **kw)  # same programs; every compile should be a hit
wall = time.perf_counter() - t0
print(json.dumps({"hits": hits(), "secs": wall, "stages": len(rep)}))
"""


def _run(script: str, cache_dir: str) -> dict:
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)  # plain 1-device CPU: match both procs
    out = subprocess.run(
        [sys.executable, "-c", script, cache_dir],
        capture_output=True, text=True, timeout=900, env=env,
    )
    assert out.returncode == 0, out.stderr[-4000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_second_process_hits_persistent_cache(tmp_path):
    cache_dir = str(tmp_path / "jax_cache")
    cold = _run(_WARM, cache_dir)
    assert cold["stages"] >= 1
    assert os.listdir(cache_dir), "warmup wrote nothing to the cache dir"

    warm = _run(_CHECK, cache_dir)
    assert warm["hits"] > 0, (
        f"no persistent-cache hits in the second process: {warm}"
    )
    # the warm process skips XLA compilation; allow generous slack for
    # tracing + disk loads but it must be clearly faster than cold
    assert warm["secs"] < cold["secs"], (cold, warm)
