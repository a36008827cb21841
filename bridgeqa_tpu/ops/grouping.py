"""Ball query + grouping ops.

TPU-native equivalents of ``query_ball_point_kernel``
(``lib/pointnet2/_ext_src/src/ball_query_gpu.cu:9-54``) and
``group_points_kernel`` (``group_points_gpu.cu``), plus the ``QueryAndGroup``
/ ``GroupAll`` wrappers (``lib/pointnet2/pointnet2_utils.py:294-425``).

Reference ball-query semantics preserved exactly:

- a neighbor qualifies iff ``d2 < radius**2`` (strict);
- the query returns the **first** ``nsample`` qualifying indices in ascending
  point order (the CUDA kernel scans ``k = 0..n-1``);
- if fewer than ``nsample`` qualify, the remaining slots are filled with the
  *first* qualifying index (the ``cnt == 0`` pre-fill branch in
  ``ball_query_gpu.cu:35-39``);
- if none qualify, all slots are 0 (the output buffer is zero-initialised in
  ``ball_query.cpp``).

Implementation: instead of a per-center sequential scan, distances are
computed for blocks of centers at once (VPU-wide), qualifying indices are
extracted with a ``top_k`` over order keys, and the whole thing runs under a
``lax.scan`` over center blocks so the (block, N) distance tile stays small
enough to live in VMEM-sized working sets instead of an O(M·N) HBM buffer.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


def _block_size(m: int, target: int = 256) -> int:
    """Largest divisor of m that is <= target (m is a power of two in practice)."""
    b = min(m, target)
    while m % b != 0:
        b -= 1
    return b


def pairwise_sqdist(a: jax.Array, b: jax.Array) -> jax.Array:
    """Exact pairwise squared distances, matching the CUDA accumulation order.

    Computes ``sum_k (a[..., i, k] - b[..., j, k])**2`` by unrolling the
    (tiny) coordinate axis, so no (..., i, j, k) intermediate is materialised
    and the arithmetic matches the reference's per-coordinate
    subtract-square-add exactly (no ||a||^2 + ||b||^2 - 2ab cancellation).

    Args:
      a: (..., M, K)
      b: (..., N, K) with K small (3 for xyz).

    Returns:
      (..., M, N) float32.
    """
    k = a.shape[-1]
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    d2 = jnp.zeros(a.shape[:-1] + (b.shape[-2],), dtype=jnp.float32)
    for i in range(k):
        diff = a[..., i][..., :, None] - b[..., i][..., None, :]
        d2 = d2 + diff * diff
    return d2


@partial(jax.jit, static_argnums=(0, 1))
def ball_query(radius: float, nsample: int, xyz: jax.Array, new_xyz: jax.Array) -> jax.Array:
    """Radius neighborhood query.

    Args:
      radius: ball radius (static).
      nsample: max neighbors per ball (static).
      xyz: (B, N, 3) all points.
      new_xyz: (B, M, 3) query centers.

    Returns:
      (B, M, nsample) int32 indices into N.
    """
    b, m = new_xyz.shape[:2]
    n = xyz.shape[1]
    r2 = jnp.float32(radius * radius)
    blk = _block_size(m)
    nblk = m // blk

    iota = lax.broadcasted_iota(jnp.int32, (1, 1, n), 2)

    def step(_, centers):  # centers: (B, blk, 3)
        d2 = pairwise_sqdist(centers, xyz)  # (B, blk, N)
        mask = d2 < r2
        keys = jnp.where(mask, iota, jnp.int32(n))
        # k smallest keys == first nsample qualifying indices in scan order.
        neg_vals, _ = lax.top_k(-keys, nsample)
        idx_sorted = -neg_vals  # ascending qualifying indices, `n` where empty
        slot_valid = idx_sorted < n
        first = idx_sorted[..., :1]
        out = jnp.where(slot_valid, idx_sorted, first)
        out = jnp.where(slot_valid[..., :1], out, 0)  # no neighbors at all -> 0
        return None, out.astype(jnp.int32)

    centers = jnp.moveaxis(new_xyz.reshape(b, nblk, blk, 3), 1, 0)
    _, idx = lax.scan(step, None, centers)  # (nblk, B, blk, nsample)
    return jnp.moveaxis(idx, 0, 1).reshape(b, m, nsample)


def group_points(points: jax.Array, idx: jax.Array) -> jax.Array:
    """Grouped gather: ``out[b, m, s, c] = points[b, idx[b, m, s], c]``.

    Equivalent of ``group_points_kernel`` (``group_points_gpu.cu``) in
    channel-last layout; backward (atomicAdd scatter) is XLA autodiff.

    Args:
      points: (B, N, C).
      idx: (B, M, S) integer indices into N.

    Returns:
      (B, M, S, C).
    """
    b, m, s = idx.shape
    flat = jnp.take_along_axis(points, idx.reshape(b, m * s, 1).astype(jnp.int32), axis=1)
    return flat.reshape(b, m, s, points.shape[-1])


def query_and_group(
    radius: float,
    nsample: int,
    xyz: jax.Array,
    new_xyz: jax.Array,
    features: jax.Array | None = None,
    *,
    use_xyz: bool = True,
    normalize_xyz: bool = False,
    ret_grouped_xyz: bool = False,
    sample_uniformly: bool = False,
    rng: jax.Array | None = None,
):
    """Ball query + group + recenter (reference ``QueryAndGroup``,
    ``lib/pointnet2/pointnet2_utils.py:294-376``), channel-last.

    Args:
      xyz: (B, N, 3); new_xyz: (B, M, 3); features: (B, N, C) or None.

    Returns:
      (B, M, nsample, 3 + C) grouped features (xyz offsets first when
      ``use_xyz``), optionally also the recentered grouped xyz.
    """
    idx = ball_query(radius, nsample, xyz, new_xyz)

    if sample_uniformly:
        if rng is None:
            raise ValueError("sample_uniformly requires an rng key")
        idx = _resample_uniform(idx, rng, nsample)

    grouped_xyz = group_points(xyz, idx) - new_xyz[:, :, None, :]
    if normalize_xyz:
        grouped_xyz = grouped_xyz / radius

    if features is not None:
        grouped_features = group_points(features, idx)
        if use_xyz:
            new_features = jnp.concatenate([grouped_xyz.astype(grouped_features.dtype), grouped_features], axis=-1)
        else:
            new_features = grouped_features
    else:
        assert use_xyz, "cannot group with neither features nor xyz"
        new_features = grouped_xyz

    if ret_grouped_xyz:
        return new_features, grouped_xyz
    return new_features


def _resample_uniform(idx: jax.Array, rng: jax.Array, nsample: int) -> jax.Array:
    """Uniform re-sampling over the *unique* indices of each ball.

    Mirrors the python loop in ``pointnet2_utils.py:337-346``: keeps the set
    of unique neighbor indices and fills the remaining slots by sampling
    uniformly (with replacement) among them. Order differs from the
    reference (which relies on ``torch.unique`` sort order) but the sampled
    *distribution* matches.
    """
    b, m, s = idx.shape

    def per_ball(ball_idx, key):
        # unique via sort + first-occurrence mask
        sorted_idx = jnp.sort(ball_idx)
        is_first = jnp.concatenate([jnp.array([True]), sorted_idx[1:] != sorted_idx[:-1]])
        num_unique = jnp.sum(is_first)
        # compact unique values to the front
        order = jnp.argsort(~is_first, stable=True)
        uniq = sorted_idx[order]  # first num_unique entries are unique values
        draw = jax.random.randint(key, (s,), 0, jnp.maximum(num_unique, 1))
        slot = lax.broadcasted_iota(jnp.int32, (s, 1), 0).squeeze(-1)
        return jnp.where(slot < num_unique, uniq, uniq[draw])

    keys = jax.random.split(rng, b * m).reshape(b, m, 2)
    return jax.vmap(jax.vmap(per_ball))(idx, keys)


def group_all(xyz: jax.Array, features: jax.Array | None = None, *, use_xyz: bool = True, ret_grouped_xyz: bool = False):
    """Single group containing every point (reference ``GroupAll``,
    ``pointnet2_utils.py:379-425``), channel-last: returns (B, 1, N, 3 + C)."""
    grouped_xyz = xyz[:, None, :, :]
    if features is not None:
        grouped_features = features[:, None, :, :]
        if use_xyz:
            new_features = jnp.concatenate([grouped_xyz.astype(grouped_features.dtype), grouped_features], axis=-1)
        else:
            new_features = grouped_features
    else:
        new_features = grouped_xyz
    if ret_grouped_xyz:
        return new_features, grouped_xyz
    return new_features
