"""Device mesh + sharding construction.

Data parallelism is the reference's only training parallelism (SURVEY.md
§2.9) and the natural fit at ViT-B/BERT-base scale: batch over the ``data``
mesh axis, parameters replicated, gradient reduction handled by XLA
(psum over ICI). The mesh carries an optional ``model`` axis for future
tensor-parallel sharding of the BLIP matmuls.
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, data_axis: int | None = None, model_axis: int = 1) -> Mesh:
    """Create a (data, model) mesh. Defaults to all devices on ``data``."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data_axis is None:
        data_axis = n // model_axis
    dev_array = np.asarray(devices).reshape(data_axis, model_axis)
    return Mesh(dev_array, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis sharded over ``data``."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def initialize_distributed(coordinator_address=None, num_processes=None, process_id=None):
    """Multi-host entry: ``jax.distributed.initialize`` (replaces the
    reference's torchrun + NCCL ``init_process_group`` at
    ``scripts/train.py:181-187``). With no arguments, coordinator/process
    info comes from the environment (JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID, or the cloud TPU metadata)."""
    from jax._src import distributed as _dist

    if getattr(_dist.global_state, "client", None) is not None:
        return  # already initialized (idempotent: callers may pre-initialize
        # before any module-level jnp constants touch the backend)
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def shard_batch(batch, mesh: Mesh):
    """Device-put every array in the batch dict with its batch axis sharded.

    Multi-process aware: when this process holds only a shard of the global
    batch (``jax.process_count() > 1``), local arrays are assembled into
    global ``jax.Array``s via ``make_array_from_process_local_data`` — the
    equivalent of DDP's per-rank DistributedSampler batches."""
    sharding = batch_sharding(mesh)
    repl = replicated_sharding(mesh)
    multiproc = jax.process_count() > 1

    def put(x):
        # scalars (and anything without a batch axis) are replicated
        if x.ndim == 0:
            if multiproc:
                return jax.make_array_from_process_local_data(repl, np.asarray(x))
            return jax.device_put(x, repl)
        if multiproc:
            return jax.make_array_from_process_local_data(sharding, np.asarray(x))
        return jax.device_put(x, sharding)

    return jax.tree.map(put, batch)


def replicate_array(x, mesh: Mesh):
    """Device-put a host array fully replicated (multi-process aware: every
    process must hold the identical full array)."""
    repl = replicated_sharding(mesh)
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(repl, np.asarray(x))
    return jax.device_put(x, repl)
