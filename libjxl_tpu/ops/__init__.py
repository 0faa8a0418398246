"""Device compute path (JAX/XLA/Pallas).

The host parses entropy-coded sections into dense per-group tensors;
everything after tokens runs here, batched over the group axis:
dequant + CfL + IDCT (MXU matmuls), color transforms, loop filters.
Multi-chip scaling shards the group/batch axes over a jax Mesh
(SURVEY.md §2.11 mapping of libjxl's thread-pool parallelism).
"""
