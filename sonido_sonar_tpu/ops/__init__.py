"""L1 DSP primitives as batched, jit-friendly JAX ops.

Each module here corresponds to a reference `algorithms/*` package (see
SURVEY.md section 2). Design rules:
  - pure functions over [..., T] / [..., T, F] float32 arrays;
  - static shapes only: variable-length results are (values, mask/count);
  - precomputed constant matrices (windows, mel banks, DCT, chroma fold)
    are generated host-side in float64, cast to float32, and closed over
    as trace-time constants — they fold into XLA fusions;
  - heavy math is matmul-shaped wherever possible (MXU), elementwise
    reductions otherwise (VPU, fused by XLA).
"""
