"""Three-nearest-neighbor feature interpolation.

TPU-native equivalents of ``three_nn_kernel`` / ``three_interpolate_kernel``
(``lib/pointnet2/_ext_src/src/interpolate_gpu.cu:9-154``) and the autograd
wrappers (``lib/pointnet2/pointnet2_utils.py:120-206``).

Reference semantics preserved:

- for each unknown point, the 3 smallest squared distances to the known
  points, ties resolved to the lowest index (the CUDA scan uses strict
  ``<``, which keeps earlier indices);
- the python wrapper returns ``sqrt(dist2)``
  (``pointnet2_utils.py:142: return torch.sqrt(dist2), idx``);
- interpolation is a plain 3-point weighted sum; backward (scatter-add over
  ``idx``) is XLA autodiff.
"""

import jax
import jax.numpy as jnp
from jax import lax

from bridgeqa_tpu.ops.grouping import pairwise_sqdist


def three_nn(unknown: jax.Array, known: jax.Array) -> tuple[jax.Array, jax.Array]:
    """3 nearest neighbors of each unknown point among the known points.

    Args:
      unknown: (B, N, 3).
      known: (B, M, 3), M >= 3 assumed (true for all backbone FP layers).

    Returns:
      dist: (B, N, 3) *euclidean* distances (sqrt of squared, like the
        reference python wrapper), ascending.
      idx: (B, N, 3) int32 indices into M.
    """
    d2 = pairwise_sqdist(unknown, known)  # (B, N, M)
    neg_d2, idx = lax.top_k(-d2, 3)  # top_k tie-breaks to the lowest index
    dist = jnp.sqrt(jnp.maximum(-neg_d2, 0.0))
    return dist, idx.astype(jnp.int32)


def three_interpolate(points: jax.Array, idx: jax.Array, weight: jax.Array) -> jax.Array:
    """Weighted 3-point feature interpolation (channel-last).

    ``out[b, n, c] = sum_k points[b, idx[b, n, k], c] * weight[b, n, k]``

    Args:
      points: (B, M, C) known features.
      idx: (B, N, 3) neighbor indices.
      weight: (B, N, 3) interpolation weights.

    Returns:
      (B, N, C).
    """
    b, n, k = idx.shape
    gathered = jnp.take_along_axis(
        points, idx.reshape(b, n * k, 1).astype(jnp.int32), axis=1
    ).reshape(b, n, k, points.shape[-1])
    return jnp.sum(gathered * weight[..., None].astype(gathered.dtype), axis=2)
