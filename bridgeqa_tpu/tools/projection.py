"""2D->3D feature back-projection (multiview ENet features onto points).

Equivalent of ``lib/projection.py`` (``ProjectionHelper``, 326 LoC) +
``scripts/project_multiview_features.py`` (aggregation driver): project each
scene point into every selected frame, keep depth-consistent hits
(depth range 0.1-4.0 m, accuracy 0.05 m, feature grid 41x32 — the driver
defaults at ``project_multiview_features.py``), gather the frame's ENet
features at the hit pixel, and max-pool across views into the per-point
128-d ``use_multiview`` channels consumed at ``lib/dataset.py:408-413``.

TPU-first: the reference walked voxels/pixels in per-frame loops building
linear index lists; here the whole scene x view batch is one vectorized
jnp program (N points x V views), jittable and batchable.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

DEPTH_MIN = 0.1
DEPTH_MAX = 4.0
ACCURACY = 0.05
FEATURE_DIMS = (41, 32)  # (W, H) of the ENet feature map


def adjust_intrinsic(intrinsic, image_dims_old, image_dims_new):
    """Rescale a pinhole intrinsic matrix to a new image resolution
    (``projection.py``'s resize handling). intrinsic: (4, 4) numpy."""
    intrinsic = np.array(intrinsic, dtype=np.float64)
    sx = image_dims_new[0] / image_dims_old[0]
    sy = image_dims_new[1] / image_dims_old[1]
    intrinsic[0, 0] *= sx
    intrinsic[1, 1] *= sy
    intrinsic[0, 2] *= (image_dims_new[0] - 1) / (image_dims_old[0] - 1)
    intrinsic[1, 2] *= (image_dims_new[1] - 1) / (image_dims_old[1] - 1)
    return intrinsic


class ProjectionHelper:
    """Depth-consistent point->pixel projection at the feature resolution."""

    def __init__(self, intrinsic, depth_min=DEPTH_MIN, depth_max=DEPTH_MAX,
                 image_dims=FEATURE_DIMS, accuracy=ACCURACY):
        """intrinsic: (4, 4) at ``image_dims`` resolution. image_dims (W, H)."""
        self.intrinsic = np.asarray(intrinsic, np.float32)
        self.depth_min = depth_min
        self.depth_max = depth_max
        self.image_dims = image_dims
        self.accuracy = accuracy

    def project(self, points, camera_to_world, depth):
        """points (N, 3) world; camera_to_world (4, 4); depth (H, W) at the
        feature resolution. Returns (uv (N, 2) int32 [u, v], valid (N,) bool).
        """
        return _project(points, camera_to_world, depth,
                        jnp.asarray(self.intrinsic), self.depth_min, self.depth_max,
                        self.accuracy, self.image_dims)

    def project_features(self, points, camera_to_world, depth, features):
        """Gather per-point features from one view; invalid points get 0.

        features (H, W, C) -> (N, C), valid (N,).
        """
        uv, valid = self.project(points, camera_to_world, depth)
        gathered = features[uv[:, 1], uv[:, 0]]  # (N, C)
        return jnp.where(valid[:, None], gathered, 0.0), valid


@partial(jax.jit, static_argnames=("depth_min", "depth_max", "accuracy", "image_dims"))
def _project(points, camera_to_world, depth, intrinsic, depth_min, depth_max, accuracy,
             image_dims):
    w, h = image_dims
    world_to_camera = jnp.linalg.inv(camera_to_world)
    ones = jnp.ones((points.shape[0], 1), points.dtype)
    pcam = (jnp.concatenate([points, ones], axis=1) @ world_to_camera.T)[:, :3]
    z = pcam[:, 2]
    fx, fy = intrinsic[0, 0], intrinsic[1, 1]
    cx, cy = intrinsic[0, 2], intrinsic[1, 2]
    safe_z = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    u = jnp.round(fx * pcam[:, 0] / safe_z + cx).astype(jnp.int32)
    v = jnp.round(fy * pcam[:, 1] / safe_z + cy).astype(jnp.int32)
    in_bounds = (u >= 0) & (u < w) & (v >= 0) & (v < h)
    in_range = (z >= depth_min) & (z <= depth_max)
    uc = jnp.clip(u, 0, w - 1)
    vc = jnp.clip(v, 0, h - 1)
    d = depth[vc, uc]
    consistent = jnp.abs(d - z) <= accuracy
    valid = in_bounds & in_range & consistent
    return jnp.stack([uc, vc], axis=1), valid


def aggregate_multiview(per_view_feats, per_view_valid, mode: str = "maxpool"):
    """Combine per-view point features (V, N, C) + valid (V, N) into (N, C).

    ``maxpool`` matches the reference's ``enet_feats_maxpool`` artifacts;
    ``mean`` averages over valid views.
    """
    per_view_feats = jnp.asarray(per_view_feats)
    valid = jnp.asarray(per_view_valid)[..., None]
    if mode == "maxpool":
        masked = jnp.where(valid, per_view_feats, -jnp.inf)
        out = jnp.max(masked, axis=0)
        return jnp.where(jnp.isfinite(out), out, 0.0)
    if mode == "mean":
        s = jnp.sum(jnp.where(valid, per_view_feats, 0.0), axis=0)
        n = jnp.sum(valid, axis=0)
        return s / jnp.maximum(n, 1)
    raise ValueError(mode)


def project_scene_multiview(helper: ProjectionHelper, points, poses, depths, features,
                            mode: str = "maxpool"):
    """Full per-scene pipeline: points (N, 3), poses (V, 4, 4),
    depths (V, H, W), features (V, H, W, C) -> (N, C)."""
    feats, valids = jax.vmap(lambda p, d, f: helper.project_features(points, p, d, f))(
        jnp.asarray(poses), jnp.asarray(depths), jnp.asarray(features)
    )
    return aggregate_multiview(feats, valids, mode)
