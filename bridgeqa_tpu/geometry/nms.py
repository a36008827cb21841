"""Jittable greedy NMS (2D / 3D / 3D-same-class).

Replaces the host-side python loops of ``utils/nms.py:40-151`` with a masked
``lax.while_loop`` formulation: each iteration picks the highest-scoring
surviving box, marks it picked, and suppresses overlaps above threshold.
Output is a boolean pick mask over a static number of boxes (jit-friendly)
instead of a variable-length index list.

Greedy-order equivalence with the reference: the reference sorts ascending
and pops from the back, suppressing strictly-greater overlaps; `argmax` here
visits boxes in the same descending-score order (numpy argsort ties resolve
differently than argmax only for exactly-equal scores, which the reference's
float scores make measure-zero).
"""

import jax
import jax.numpy as jnp
from jax import lax


def _greedy_nms(overlap_fn, scores, valid, threshold):
    """Generic greedy NMS over a fixed box count.

    Args:
      overlap_fn: i -> (K,) overlaps of box i vs all boxes.
      scores: (K,) float scores.
      valid: (K,) bool mask of boxes to consider at all.
      threshold: suppress j if overlap(i, j) > threshold.

    Returns:
      (K,) bool pick mask.
    """
    k = scores.shape[0]
    neg_inf = jnp.float32(-jnp.inf)

    def cond(state):
        alive, _ = state
        return jnp.any(alive)

    def body(state):
        alive, picked = state
        masked = jnp.where(alive, scores, neg_inf)
        i = jnp.argmax(masked)
        picked = picked.at[i].set(True)
        o = overlap_fn(i)
        suppress = o > threshold
        alive = alive & ~suppress
        alive = alive.at[i].set(False)
        return alive, picked

    from bridgeqa_tpu.ops.vma import vary_like

    alive0 = valid
    # lifted to scores' varying axes for shard_map bodies (no-op otherwise)
    picked0 = vary_like(jnp.zeros((k,), dtype=bool), scores)
    _, picked = lax.while_loop(cond, body, (alive0, picked0))
    return picked


def nms_3d(boxes_min, boxes_max, scores, threshold, valid=None):
    """3D NMS, semantics of ``nms_3d_faster`` (``utils/nms.py:75-110``).

    Args:
      boxes_min / boxes_max: (K, 3) axis-aligned extents.
      scores: (K,).
      threshold: IoU threshold.
      valid: optional (K,) bool; invalid boxes are never picked.

    Returns:
      (K,) bool pick mask.
    """
    if valid is None:
        valid = jnp.ones(scores.shape, dtype=bool)

    vol = jnp.prod(boxes_max - boxes_min, axis=-1)

    def overlap(i):
        lo = jnp.maximum(boxes_min[i], boxes_min)
        hi = jnp.minimum(boxes_max[i], boxes_max)
        inter = jnp.prod(jnp.maximum(hi - lo, 0.0), axis=-1)
        return inter / (vol[i] + vol - inter)

    return _greedy_nms(overlap, scores, valid, threshold)


def nms_3d_samecls(boxes_min, boxes_max, scores, cls, threshold, valid=None):
    """3D NMS suppressing only same-class overlaps
    (``nms_3d_faster_samecls``, ``utils/nms.py:112-151``)."""
    if valid is None:
        valid = jnp.ones(scores.shape, dtype=bool)

    vol = jnp.prod(boxes_max - boxes_min, axis=-1)

    def overlap(i):
        lo = jnp.maximum(boxes_min[i], boxes_min)
        hi = jnp.minimum(boxes_max[i], boxes_max)
        inter = jnp.prod(jnp.maximum(hi - lo, 0.0), axis=-1)
        iou = inter / (vol[i] + vol - inter)
        return iou * (cls == cls[i])

    return _greedy_nms(overlap, scores, valid, threshold)


def nms_2d(boxes_min, boxes_max, scores, threshold, valid=None):
    """2D NMS (``nms_2d_faster``, ``utils/nms.py:39-73``) on (K, 2) extents."""
    if valid is None:
        valid = jnp.ones(scores.shape, dtype=bool)

    area = jnp.prod(boxes_max - boxes_min, axis=-1)

    def overlap(i):
        lo = jnp.maximum(boxes_min[i], boxes_min)
        hi = jnp.minimum(boxes_max[i], boxes_max)
        inter = jnp.prod(jnp.maximum(hi - lo, 0.0), axis=-1)
        return inter / (area[i] + area - inter)

    return _greedy_nms(overlap, scores, valid, threshold)
