"""Tensor parallelism: Megatron-style param sharding over the mesh ``model`` axis.

The reference trains data-parallel only (SURVEY §2.9) — at ViT-B/BERT-base
scale that is the right default — but this framework's mesh carries a
``model`` axis so the same jitted step scales past one chip's HBM when
needed. The pattern is sharding ANNOTATIONS only: column-parallel kernels
(QKV / MLP-in) split the output features, row-parallel kernels (attention
out / MLP-out) split the input features, and XLA GSPMD inserts the
all-reduces over ICI. The math is unchanged, so dp-only and dp+tp runs
produce identical losses (tested on the virtual CPU mesh).
"""

import re

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# column-parallel (out-features sharded): y = x @ W, W (in, out) -> P(None, "model")
_COLUMN = [
    r".*/(query|key|value)/kernel$",
    r".*/intermediate_dense/kernel$",
    r".*/attn/qkv/kernel$",           # ViT fused qkv
    r".*/mlp/fc1/kernel$",            # ViT MLP
]
# row-parallel (in-features sharded): W (in, out) -> P("model", None)
_ROW = [
    r".*/attention/output/dense/kernel$",
    r".*/crossattention/output/dense/kernel$",
    r".*/output_dense/kernel$",
    r".*/attn/proj/kernel$",
    r".*/mlp/fc2/kernel$",
]
_COLUMN_BIAS = [c.replace("/kernel$", "/bias$") for c in _COLUMN]


def _path_str(path):
    return "/" + "/".join(str(getattr(k, "key", k)) for k in path)


def tp_param_specs(params):
    """PartitionSpec pytree for ``params``: transformer matmuls sharded over
    ``model``, everything else replicated."""

    def spec(path, arr):
        p = _path_str(path)
        nd = np.ndim(arr)
        if nd == 2:
            if any(re.match(rx, p) for rx in _COLUMN):
                return P(None, "model")
            if any(re.match(rx, p) for rx in _ROW):
                return P("model", None)
        if nd == 1 and any(re.match(rx, p) for rx in _COLUMN_BIAS):
            return P("model")
        return P()

    return jax.tree_util.tree_map_with_path(spec, params)


def shard_params_tp(params, mesh: Mesh):
    """Device-put ``params`` with tensor-parallel shardings over ``mesh``.

    Optimizer moments created from these arrays (``tx.init`` /
    ``zeros_like``) inherit the same shardings automatically."""
    specs = tp_param_specs(params)
    return jax.tree.map(
        lambda a, s: jax.device_put(a, NamedSharding(mesh, s)), params, specs)
