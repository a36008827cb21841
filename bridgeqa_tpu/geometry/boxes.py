"""Batched 3D box parameter decoding and IoU — fully on-device.

Replaces the reference's numpy box math (``utils/box_util.py:146-325``,
``ScannetDatasetConfig.param2obb_batch``, and the per-batch python loop in
``models/proposal_module.py:87-108``) with vectorized jnp, so box decoding
runs inside the jitted forward pass instead of syncing to host every step.
"""

import jax
import jax.numpy as jnp
from jax import lax


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


def _clip_polygon_area(rect1, rect2):
    """Area of the intersection of two counter-clockwise quads (2D).

    Batched fixed-shape Sutherland–Hodgman (reference ``polygon_clip``,
    ``utils/box_util.py:6-52``): the subject polygon is clipped by the four
    edges of the (convex) clip quad. A convex-convex quad intersection has
    at most 8 vertices, so the vertex list lives in a padded (9, 2) buffer
    (slot 8 is the dump slot); emptying at any stage yields area 0, matching
    the reference's ``None`` return.

    rect1/rect2: (4, 2) CCW vertices. Returns scalar area.
    """
    buf = 8

    verts = jnp.zeros((buf, 2), jnp.float32).at[:4].set(rect1)
    n = jnp.int32(4)
    slot = jnp.arange(buf)

    def clip_edge(carry, edge):
        verts, n = carry
        cp1, cp2 = edge[0], edge[1]
        valid = slot < n
        # previous valid vertex (wraps to slot n-1)
        prev = jnp.roll(verts, 1, axis=0)
        last = verts[jnp.maximum(n - 1, 0)]
        prev = prev.at[0].set(last)

        def side(p):  # strict ">" inside test, as the reference
            return ((cp2[0] - cp1[0]) * (p[..., 1] - cp1[1])
                    - (cp2[1] - cp1[1]) * (p[..., 0] - cp1[0])) > 0

        ins = side(verts)
        ins_prev = side(prev)

        # line-line intersection (reference computeIntersection)
        dc = cp1 - cp2
        dp = prev - verts  # s - e
        denom = dc[0] * dp[..., 1] - dc[1] * dp[..., 0]
        safe = jnp.where(jnp.abs(denom) < 1e-12, 1.0, denom)
        n1 = cp1[0] * cp2[1] - cp1[1] * cp2[0]
        n2 = prev[..., 0] * verts[..., 1] - prev[..., 1] * verts[..., 0]
        inter = (n1 * dp - n2[:, None] * dc[None, :]) / safe[:, None]

        # per input vertex, candidates in reference append order:
        # [intersection (on crossing), the vertex itself (when inside)]
        flags = jnp.stack([valid & (ins != ins_prev), valid & ins],
                          axis=1).reshape(-1)  # (2*buf,)
        cands = jnp.stack([inter, verts], axis=1).reshape(-1, 2)
        pos = jnp.cumsum(flags) - 1
        idx = jnp.where(flags, pos, buf)
        new_verts = jnp.zeros((buf + 1, 2), jnp.float32).at[idx].set(cands)[:buf]
        return (new_verts, jnp.sum(flags).astype(jnp.int32)), None

    edges = jnp.stack([jnp.roll(rect2, 1, axis=0), rect2], axis=1)  # (4, 2, 2)
    (verts, n), _ = lax.scan(clip_edge, (verts, n), edges)

    # shoelace with padding slots pinned to v0 (degenerate edges add 0)
    v0 = verts[0]
    verts = jnp.where((slot < jnp.maximum(n, 1))[:, None], verts, v0[None, :])
    x, y = verts[:, 0], verts[:, 1]
    xn, yn = jnp.roll(x, -1), jnp.roll(y, -1)
    area = 0.5 * jnp.abs(jnp.sum(x * yn - xn * y))
    return jnp.where(n >= 3, area, 0.0)


def box3d_iou_oriented(corners1, corners2):
    """General rotated-box 3D IoU via convex polygon clipping.

    The reference's full (pre-simplification) ``box3d_iou`` semantics
    (``utils/box_util.py:6-126``: Sutherland–Hodgman top-face clipping x
    vertical overlap, volumes from edge lengths). The reference ships that
    body commented out in favour of the axis-aligned min/max form — valid
    for ScanNet's heading==0 — but any ``num_heading_bin > 1`` config needs
    this one (see ``box3d_iou_auto``).

    Axis convention: the reference's commented body targeted the original
    SUN-RGBD y-up corner layout, but its ScanNet-modified
    ``get_3d_box_batch`` (``box_util.py:317-320``, the uncommented lines)
    puts l,w on x,y and h on z — corners 0-3 are the TOP face and z is
    vertical. This implementation applies the same algorithm in that (the
    repo's golden-pinned) convention: footprint clipping in (x, y),
    vertical overlap from z.

    corners1/corners2: (..., 8, 3) in the ``get_3d_box_batch`` convention.
    Broadcasts over leading dims. Returns (...,) IoU.
    """
    corners1, corners2 = jnp.broadcast_arrays(
        corners1.astype(jnp.float32), corners2.astype(jnp.float32))
    batch_shape = corners1.shape[:-2]
    c1 = corners1.reshape(-1, 8, 3)
    c2 = corners2.reshape(-1, 8, 3)

    def one(a, b):
        # top face reversed (3,2,1,0) = counter-clockwise in (x, y)
        rect1 = a[jnp.array([3, 2, 1, 0])][:, jnp.array([0, 1])]
        rect2 = b[jnp.array([3, 2, 1, 0])][:, jnp.array([0, 1])]
        inter_area = _clip_polygon_area(rect1, rect2)
        ymax = jnp.minimum(a[0, 2], b[0, 2])
        ymin = jnp.maximum(a[4, 2], b[4, 2])
        inter_vol = inter_area * jnp.maximum(0.0, ymax - ymin)

        def vol(c):  # box3d_vol: edge-length product
            ea = jnp.sqrt(jnp.sum((c[0] - c[1]) ** 2))
            eb = jnp.sqrt(jnp.sum((c[1] - c[2]) ** 2))
            ec = jnp.sqrt(jnp.sum((c[0] - c[4]) ** 2))
            return ea * eb * ec

        return inter_vol / (vol(a) + vol(b) - inter_vol + 1e-8)

    iou = jax.vmap(one)(c1, c2)
    return iou.reshape(batch_shape)


def box3d_iou_auto(corners1, corners2, *, num_heading_bin: int = 1):
    """IoU dispatch: the axis-aligned fast path is exact for heading==0
    (ScanNet, ``num_heading_bin == 1`` — every decoded heading is the
    residual around bin 0, treated as 0 by the reference's active
    ``box3d_iou``); rotated configs get the general convex-clip IoU."""
    if num_heading_bin == 1:
        return box3d_iou_batch(corners1, corners2)
    return box3d_iou_oriented(corners1, corners2)


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
