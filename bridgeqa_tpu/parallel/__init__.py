"""Parallelism: device mesh + sharding helpers.

Replaces the reference's DDP/NCCL layer (``scripts/train.py:181-187``,
DistributedSampler, per-scalar ``all_reduce`` metric averaging at
``solver.py:551-554``) with ``jax.sharding``: batch sharded over the mesh
``data`` axis, params replicated, metric reduction fused into the jitted
step (a single compiled collective instead of the reference's per-iter
collective storm).
"""

from bridgeqa_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    initialize_distributed,
    replicate_array,
    replicated_sharding,
    shard_batch,
)
from bridgeqa_tpu.parallel.tp import shard_params_tp, tp_param_specs

__all__ = ["make_mesh", "batch_sharding", "initialize_distributed", "replicate_array",
           "replicated_sharding", "shard_batch", "shard_params_tp", "tp_param_specs"]
