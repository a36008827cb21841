"""Loss functions: VoteNet detection, grounding, language, answer."""

from bridgeqa_tpu.losses.detection import (
    compute_vote_loss,
    compute_objectness_loss,
    compute_box_and_sem_cls_loss,
    compute_reference_loss,
    softmax_ranking_loss,
    get_loss,
    FAR_THRESHOLD,
    NEAR_THRESHOLD,
    OBJECTNESS_CLS_WEIGHTS,
)

__all__ = [
    "compute_vote_loss",
    "compute_objectness_loss",
    "compute_box_and_sem_cls_loss",
    "compute_reference_loss",
    "softmax_ranking_loss",
    "get_loss",
    "FAR_THRESHOLD",
    "NEAR_THRESHOLD",
    "OBJECTNESS_CLS_WEIGHTS",
]
