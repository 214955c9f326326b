"""GSPMD parallelism: device meshes + partition specs.

TPU-native replacement for the reference's NCCL tensor-parallel machinery
(pegainfer-qwen3-4b/src/executor.rs:519-1011, src/weights.rs:121-291 row/col
shard loaders; pegainfer-deepseek-v4/src/runtime/collectives.rs): instead of
explicit per-rank replicas + hand-written collectives, weights and KV carry
``NamedSharding``s over a ``jax.sharding.Mesh`` and XLA inserts/overlaps the
psum / all-gather / reduce-scatter collectives over ICI inside the single
jitted step.
"""

from pegainfer_tpu.parallel.sharding import (  # noqa: F401
    MeshConfig,
    make_mesh,
    qwen3_kv_spec,
    qwen3_param_specs,
    shard_qwen3,
)
