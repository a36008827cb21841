"""Farthest point sampling + point gathering.

TPU-native equivalents of the reference CUDA kernels
``furthest_point_sampling_kernel`` / ``gather_points_kernel``
(reference: ``lib/pointnet2/_ext_src/src/sampling_gpu.cu:8-229``,
wrappers ``lib/pointnet2/pointnet2_utils.py:51-117``).

Reference semantics preserved exactly:

- the first sampled index is always 0;
- points with squared norm ``<= 1e-3`` are treated as padding and can never
  be selected nor influence the running min-distance buffer
  (``sampling_gpu.cu:104: if (mag <= 1e-3) continue;``);
- the min-distance buffer starts at ``1e10`` (``sampling.cpp:66-87``);
- ties in the argmax resolve to the lowest index (CUDA uses a strict ``>``
  scan, which keeps the first maximum).

The iteration over ``npoint`` selections is inherently sequential; each step
is a full-width masked distance update + argmax, which vectorizes perfectly
on the VPU. This runs as a ``lax.fori_loop`` vmapped over the batch.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

PADDING_NORM_SQ = 1e-3
INIT_DIST = 1e10


@partial(jax.jit, static_argnums=1)
def furthest_point_sample(xyz: jax.Array, npoint: int) -> jax.Array:
    """Iterative farthest point sampling.

    Args:
      xyz: (B, N, 3) float32 point coordinates.
      npoint: number of points to sample (static).

    Returns:
      (B, npoint) int32 indices into N.
    """
    return jax.vmap(lambda p: _fps_single(p, npoint))(xyz)


def _fps_single(xyz: jax.Array, npoint: int) -> jax.Array:
    n = xyz.shape[0]
    xyz = xyz.astype(jnp.float32)
    mag = jnp.sum(xyz * xyz, axis=-1)
    valid = mag > PADDING_NORM_SQ

    def body(j, state):
        temp, idxs, old = state
        ref = xyz[old]
        d = jnp.sum((xyz - ref[None, :]) ** 2, axis=-1)
        new_temp = jnp.where(valid, jnp.minimum(temp, d), temp)
        # CUDA starts `best = -1` and only considers valid points, so an
        # all-padding cloud selects index 0 (argmax of a constant field).
        cand = jnp.where(valid, new_temp, -1.0)
        besti = jnp.argmax(cand).astype(jnp.int32)
        idxs = idxs.at[j].set(besti)
        return new_temp, idxs, besti

    temp0 = jnp.full((n,), INIT_DIST, dtype=jnp.float32)
    idxs0 = jnp.zeros((npoint,), dtype=jnp.int32)
    _, idxs, _ = lax.fori_loop(1, npoint, body, (temp0, idxs0, jnp.int32(0)))
    return idxs


def gather_points(points: jax.Array, idx: jax.Array) -> jax.Array:
    """Gather points/features by index (channel-last).

    Equivalent of ``gather_points_kernel`` (``sampling_gpu.cu:8-30``) but for
    the (B, N, C) layout: ``out[b, m, c] = points[b, idx[b, m], c]``.
    The backward pass (scatter-add, ``gather_points_grad_kernel``) is XLA
    autodiff of the gather.

    Args:
      points: (B, N, C).
      idx: (B, M) integer indices into N.

    Returns:
      (B, M, C).
    """
    return jnp.take_along_axis(points, idx[..., None].astype(jnp.int32), axis=1)
