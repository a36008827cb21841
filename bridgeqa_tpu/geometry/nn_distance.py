"""Chamfer nearest-neighbor distance + huber loss.

jnp port of ``utils/nn_distance.py:6-52`` (used by the vote and center
losses). Unlike the reference's (B, N, M, C) tile-and-subtract, the squared
path avoids materialising the C axis (see ``pairwise_sqdist``).
"""

import jax.numpy as jnp

from bridgeqa_tpu.ops.grouping import pairwise_sqdist


def huber_loss(error, delta: float = 1.0):
    """0.5 x^2 for |x| <= delta, else 0.5 delta^2 + delta(|x| - delta)."""
    abs_error = jnp.abs(error)
    quadratic = jnp.minimum(abs_error, delta)
    linear = abs_error - quadratic
    return 0.5 * quadratic**2 + delta * linear


def nn_distance(pc1, pc2, l1smooth: bool = False, delta: float = 1.0, l1: bool = False):
    """Bidirectional nearest-neighbor distance between point sets.

    Args:
      pc1: (B, N, C); pc2: (B, M, C).

    Returns:
      dist1 (B, N), idx1 (B, N), dist2 (B, M), idx2 (B, M) — min distance and
      argmin index of each point in the other set, under squared-L2 (default),
      huber (``l1smooth``) or L1 (``l1``) pointwise metrics.
    """
    if l1smooth or l1:
        diff = pc1[:, :, None, :] - pc2[:, None, :, :]
        if l1smooth:
            pc_dist = jnp.sum(huber_loss(diff, delta), axis=-1)
        else:
            pc_dist = jnp.sum(jnp.abs(diff), axis=-1)
    else:
        pc_dist = pairwise_sqdist(pc1, pc2)
    dist1 = jnp.min(pc_dist, axis=2)
    idx1 = jnp.argmin(pc_dist, axis=2)
    dist2 = jnp.min(pc_dist, axis=1)
    idx2 = jnp.argmin(pc_dist, axis=1)
    return dist1, idx1, dist2, idx2
