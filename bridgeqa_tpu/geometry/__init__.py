"""On-device box geometry, IoU, NMS, and Chamfer distance.

These replace the reference's CPU-numpy box code (``utils/box_util.py``,
``utils/nms.py``, ``utils/nn_distance.py``) with jittable jnp so the training
step never leaves the device (the reference's per-iter ``.cpu().numpy()`` box
loops were its main GPU-sync bottleneck, SURVEY.md §3.5).
"""

from bridgeqa_tpu.geometry.boxes import (
    get_3d_box_batch,
    box3d_iou_auto,
    box3d_iou_batch,
    box3d_iou_oriented,
    box3d_min_max,
    params_to_obb,
    decode_pred_box,
)
from bridgeqa_tpu.geometry.nms import nms_3d, nms_3d_samecls, nms_2d
from bridgeqa_tpu.geometry.nn_distance import nn_distance, huber_loss

__all__ = [
    "get_3d_box_batch",
    "box3d_iou_auto",
    "box3d_iou_batch",
    "box3d_iou_oriented",
    "box3d_min_max",
    "params_to_obb",
    "decode_pred_box",
    "nms_3d",
    "nms_3d_samecls",
    "nms_2d",
    "nn_distance",
    "huber_loss",
]
