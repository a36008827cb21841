"""TPU-native point-cloud ops.

These replace the CUDA extension of the reference
(``lib/pointnet2/_ext_src/src/*.cu`` + the autograd wrappers in
``lib/pointnet2/pointnet2_utils.py``) with pure JAX/XLA programs (with Pallas
variants for the hot kernels). All ops use channel-last layouts
(``points: (B, N, C)``) — the idiomatic TPU layout where the feature axis maps
to vector lanes / MXU columns — instead of the reference's channel-first
``(B, C, N)``.

Gradients come for free from XLA autodiff (gather ⇄ scatter-add), matching the
hand-written CUDA backward passes (``atomicAdd`` scatter) semantically.
"""

from bridgeqa_tpu.ops.sampling import furthest_point_sample, gather_points
from bridgeqa_tpu.ops.grouping import ball_query, group_points, query_and_group, group_all
from bridgeqa_tpu.ops.interpolate import three_nn, three_interpolate

__all__ = [
    "furthest_point_sample",
    "gather_points",
    "ball_query",
    "group_points",
    "query_and_group",
    "group_all",
    "three_nn",
    "three_interpolate",
]
