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


def shard_batch(batch, mesh: Mesh):
    """Device-put every array in the batch dict with its batch axis sharded."""
    sharding = batch_sharding(mesh)
    repl = replicated_sharding(mesh)

    def put(x):
        # answer-list tables are replicated (no batch axis semantics)
        if x.ndim == 0:
            return jax.device_put(x, repl)
        return jax.device_put(x, sharding)

    return jax.tree.map(put, batch)
