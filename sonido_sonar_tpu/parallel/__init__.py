"""Scale-out: device meshes, sharded batch pipelines, corpus search.

This is the TPU-native replacement for the reference's goroutine worker
pools (SURVEY.md section 2.17): the batch axis (streams x chunks) is
sharded over a `jax.sharding.Mesh`; the frame axis is vectorized inside
each chip. Fingerprint generation is embarrassingly parallel (no
steady-state collectives); corpus-wide matching uses all-gather/top-k
over the mesh.
"""

from sonido_sonar_tpu.parallel.mesh import (  # noqa: F401
    data_sharding,
    make_mesh,
    replicated,
    shard_batch,
    shard_over_batch,
)
from sonido_sonar_tpu.parallel.pipeline import (  # noqa: F401
    BatchedFingerprintPipeline,
    batched_fingerprint_features,
    batched_pair_alignment,
    batched_pair_dtw,
    batched_refine_offsets,
)
from sonido_sonar_tpu.parallel.matcher import (  # noqa: F401
    fingerprint_matrix,
    pack_statistics,
    sharded_top_k_matches,
)
