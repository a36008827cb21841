"""Batched 3D box parameter decoding and IoU — fully on-device.

Replaces the reference's numpy box math (``utils/box_util.py:146-325``,
``ScannetDatasetConfig.param2obb_batch``, and the per-batch python loop in
``models/proposal_module.py:87-108``) with vectorized jnp, so box decoding
runs inside the jitted forward pass instead of syncing to host every step.
"""

import jax
import jax.numpy as jnp


def heading_class_residual_to_angle(heading_class, heading_residual, num_heading_bin: int):
    """``class2angle`` semantics: bin center + residual, wrapped to (-pi, pi].

    With ScanNet's single heading bin this reduces to the residual itself.
    """
    angle_per_class = 2.0 * jnp.pi / float(num_heading_bin)
    angle = heading_class.astype(jnp.float32) * angle_per_class + heading_residual
    return jnp.where(angle > jnp.pi, angle - 2.0 * jnp.pi, angle)


def params_to_obb(center, heading_class, heading_residual, size_class, size_residual,
                  mean_size_arr, num_heading_bin: int = 1):
    """Batched ``param2obb``: returns (..., 7) [cx, cy, cz, l, w, h, -angle]."""
    angle = heading_class_residual_to_angle(heading_class, heading_residual, num_heading_bin)
    box_size = mean_size_arr[size_class] + size_residual
    return jnp.concatenate([center, box_size, -angle[..., None]], axis=-1)


# Corner sign pattern from utils/box_util.py:299-321 (x: l, y: w, z: h).
_CORNER_SIGNS = jnp.array(
    [
        [1, 1, 1], [1, -1, 1], [-1, -1, 1], [-1, 1, 1],
        [1, 1, -1], [1, -1, -1], [-1, -1, -1], [-1, 1, -1],
    ],
    dtype=jnp.float32,
)


def get_3d_box_batch(box_size, heading_angle, center):
    """Box params -> 8 corners; replicates ``get_3d_box_batch``
    (``utils/box_util.py:299-325``) including its roty rotation convention.

    Args:
      box_size: (..., 3) [l, w, h]; heading_angle: (...,); center: (..., 3).

    Returns:
      (..., 8, 3) corners.
    """
    c = jnp.cos(heading_angle)[..., None]
    s = jnp.sin(heading_angle)[..., None]
    half = box_size[..., None, :] / 2.0  # (..., 1, 3)
    corners = _CORNER_SIGNS * half  # (..., 8, 3) local [x, y, z]
    x, y, z = corners[..., 0], corners[..., 1], corners[..., 2]
    # reference: corners_3d @ roty(angle)^T with roty = [[c,0,s],[0,1,0],[-s,0,c]];
    # expanded per-coordinate (full fp32, no low-precision matmul path)
    rx = c * x + s * z
    rz = -s * x + c * z
    corners = jnp.stack([rx, y, rz], axis=-1)
    return corners + center[..., None, :]


def box3d_min_max(corners):
    """(..., 8, 3) corners -> ((..., 3) min, (..., 3) max)."""
    return corners.min(axis=-2), corners.max(axis=-2)


def box3d_iou_batch(corners1, corners2):
    """Axis-aligned 3D IoU from corners, matching ``box3d_iou_batch``
    (``utils/box_util.py:146-190``) including its 1e-8 denominator epsilon."""
    mn1, mx1 = box3d_min_max(corners1)
    mn2, mx2 = box3d_min_max(corners2)
    lo = jnp.maximum(mn1, mn2)
    hi = jnp.minimum(mx1, mx2)
    inter = jnp.prod(jnp.maximum(hi - lo, 0.0), axis=-1)
    vol1 = jnp.prod(mx1 - mn1, axis=-1)
    vol2 = jnp.prod(mx2 - mn2, axis=-1)
    return inter / (vol1 + vol2 - inter + 1e-8)


def aabb_iou(min1, max1, min2, max2):
    """Axis-aligned IoU directly from min/max extents."""
    lo = jnp.maximum(min1, min2)
    hi = jnp.minimum(max1, max2)
    inter = jnp.prod(jnp.maximum(hi - lo, 0.0), axis=-1)
    vol1 = jnp.prod(max1 - min1, axis=-1)
    vol2 = jnp.prod(max2 - min2, axis=-1)
    return inter / (vol1 + vol2 - inter + 1e-8)


def decode_pred_box(center, heading_scores, heading_residuals, size_scores, size_residuals,
                    mean_size_arr, num_heading_bin: int = 1):
    """On-device replacement for ``ProposalModule.decode_pred_box``
    (``models/proposal_module.py:87-108``): argmax heading/size class, gather
    residuals, params -> obb -> corners. No host sync.

    Args:
      center: (B, K, 3); heading_scores: (B, K, NH);
      heading_residuals: (B, K, NH); size_scores: (B, K, NS);
      size_residuals: (B, K, NS, 3); mean_size_arr: (NS, 3).

    Returns:
      (B, K, 8, 3) corners.
    """
    hcls = jnp.argmax(heading_scores, axis=-1)
    hres = jnp.take_along_axis(heading_residuals, hcls[..., None], axis=-1)[..., 0]
    scls = jnp.argmax(size_scores, axis=-1)
    sres = jnp.take_along_axis(size_residuals, scls[..., None, None].repeat(3, -1), axis=-2)[..., 0, :]
    obb = params_to_obb(center, hcls, hres, scls, sres, mean_size_arr, num_heading_bin)
    return get_3d_box_batch(obb[..., 3:6], obb[..., 6], obb[..., 0:3])
