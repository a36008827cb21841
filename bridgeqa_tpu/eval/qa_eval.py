"""QA + grounding evaluation metrics — fully on-device.

jnp port of ``lib/eval_helper.py:53-320`` (``get_eval``): grounding accuracy
and IoU of the referenced box, language-classifier accuracy, answer
accuracy@{1,10} for every head (main/scene/2d/2d3d), the 3D-vs-2D
disagreement rates, objectness and semantic accuracies. The reference ran
the box IoU loop in host numpy per iteration; everything here vectorizes
and jits.
"""

import jax
import jax.numpy as jnp

from bridgeqa_tpu.geometry.boxes import box3d_iou_auto, get_3d_box_batch, params_to_obb


def _answer_acc(scores, answer_cats, topk: int = 10):
    """acc@1 / acc@10 given (B, A) scores and (B, A) multi-hot labels."""
    at1 = jnp.take_along_axis(answer_cats, jnp.argmax(scores, 1)[:, None], axis=1)[:, 0]
    k = min(topk, scores.shape[1])
    _, top_ids = jax.lax.top_k(scores, k)
    at10 = jnp.max(jnp.take_along_axis(answer_cats, top_ids, axis=1), axis=1)
    return jnp.mean(at1), jnp.mean(at10), at1, top_ids


def get_eval(end_points, config, *, use_lang_classifier: bool = False,
             use_oracle: bool = False, use_cat_rand: bool = False,
             use_best: bool = False, rng=None):
    """Compute eval metrics into end_points (jittable).

    Requires the loss pass to have run first (objectness_label /
    object_assignment / cluster_labels present, as in the reference flow
    ``solver.py:396-400``).

    Ablation modes (``lib/eval_helper.py:53,97-125``, affecting the
    localization metrics only, like the reference):

    - ``use_best``: ground with the GT cluster label (upper bound);
    - ``use_cat_rand``: ground a uniformly random proposal whose assigned
      semantic class matches the question's object category (``rng`` — a
      ``jax.random`` key — required); no candidate -> proposal 0, matching
      the reference's all-zero-row argmax fallback;
    - ``use_oracle``: score the GT box parameters gathered through
      ``object_assignment`` instead of the predicted box heads.
    """
    mean_size_arr = jnp.asarray(config.mean_size_arr, jnp.float32)
    nh = config.num_heading_bin

    objectness_pred = jnp.argmax(end_points["objectness_scores"], 2)
    objectness_label = end_points["objectness_label"].astype(jnp.int32)

    pred_masks = (objectness_pred == 1).astype(jnp.float32)
    label_masks = (objectness_label == 1).astype(jnp.float32)

    # grounding accuracy (eval_helper.py:82-95) — always from the raw
    # cluster_ref, before any ablation mode (the reference computes ref_acc
    # before the mode branches)
    cluster_pred_idx = jnp.argmax(end_points["cluster_ref"] * pred_masks, 1)
    cluster_preds = jax.nn.one_hot(cluster_pred_idx, pred_masks.shape[1])
    cluster_labels = end_points["cluster_labels"].astype(jnp.float32) * label_masks
    corrects = jnp.sum((cluster_preds == 1) & (cluster_labels == 1), axis=1).astype(jnp.float32)
    end_points["ref_acc"] = corrects
    end_points["ref_acc_mean"] = jnp.mean(corrects)

    if use_best:
        # eval_helper.py:97-100: ground with the GT label
        pred_ref = jnp.argmax(end_points["cluster_labels"], 1)
        end_points["cluster_ref"] = end_points["cluster_labels"].astype(jnp.float32)
    elif use_cat_rand:
        # eval_helper.py:101-120: random proposal of the right category
        if rng is None:
            raise ValueError("use_cat_rand needs a jax.random key (rng=)")
        num_bbox = end_points["num_bbox"].astype(jnp.int32)  # (B,)
        max_obj = end_points["sem_cls_label"].shape[1]
        # the reference decrements padded rows (sem_cls_label[num_bbox:] -= 1)
        # so padding can't alias the queried category
        sem_cls = end_points["sem_cls_label"].astype(jnp.int32) - (
            jnp.arange(max_obj)[None, :] >= num_bbox[:, None]).astype(jnp.int32)
        assigned = jnp.take_along_axis(sem_cls, end_points["object_assignment"].astype(jnp.int32), axis=1)
        candidate = assigned == end_points["object_cat"].astype(jnp.int32)[:, None]  # (B, K)
        has_cand = jnp.any(candidate, axis=1)
        logits = jnp.where(candidate, 0.0, -1e9)
        choice = jax.random.categorical(rng, logits, axis=1)
        pred_ref = jnp.where(has_cand, choice, 0)
        end_points["cluster_ref"] = jax.nn.one_hot(pred_ref, candidate.shape[1]) * has_cand[:, None]
    else:
        pred_ref = jnp.argmax(end_points["cluster_ref"] * pred_masks, 1)  # (B,)
    gt_ref = jnp.argmax(end_points["ref_box_label"], 1)

    # referenced-box IoU (vectorized replacement of eval_helper.py:171-197)
    def take(x, idx):
        return jnp.take_along_axis(x, idx.reshape(-1, *([1] * (x.ndim - 1))).astype(jnp.int32), axis=1)[:, 0]

    if use_oracle:
        # eval_helper.py:126-138: GT box params through object_assignment
        assign = end_points["object_assignment"].astype(jnp.int32)

        def gather_gt(x):
            idx = assign.reshape(assign.shape + (1,) * (x.ndim - 2)).astype(jnp.int32)
            return jnp.take_along_axis(x, jnp.broadcast_to(idx, assign.shape + x.shape[2:]), axis=1)

        pred_center = take(gather_gt(end_points["center_label"]), pred_ref)
        pred_hcls = take(gather_gt(end_points["heading_class_label"]), pred_ref)
        pred_hres = take(gather_gt(end_points["heading_residual_label"]), pred_ref)
        pred_scls = take(gather_gt(end_points["size_class_label"]), pred_ref)
        pred_sres = take(gather_gt(end_points["size_residual_label"]), pred_ref)
    else:
        pred_center = take(end_points["center"], pred_ref)
        pred_hcls = take(jnp.argmax(end_points["heading_scores"], -1), pred_ref)
        pred_hres = take(
            jnp.take_along_axis(end_points["heading_residuals"],
                                jnp.argmax(end_points["heading_scores"], -1)[..., None], axis=2)[..., 0],
            pred_ref,
        )
        pred_scls = take(jnp.argmax(end_points["size_scores"], -1), pred_ref)
        pred_sres = take(
            jnp.take_along_axis(end_points["size_residuals"],
                                jnp.argmax(end_points["size_scores"], -1)[..., None, None].repeat(3, -1),
                                axis=2)[:, :, 0, :],
            pred_ref,
        )

    gt_center = take(end_points["center_label"], gt_ref)
    gt_hcls = take(end_points["heading_class_label"], gt_ref)
    gt_hres = take(end_points["heading_residual_label"], gt_ref)
    gt_scls = take(end_points["size_class_label"], gt_ref)
    gt_sres = take(end_points["size_residual_label"], gt_ref)

    pred_obb = params_to_obb(pred_center, pred_hcls, pred_hres, pred_scls, pred_sres, mean_size_arr, nh)
    gt_obb = params_to_obb(gt_center, gt_hcls, gt_hres, gt_scls, gt_sres, mean_size_arr, nh)
    pred_bbox = get_3d_box_batch(pred_obb[..., 3:6], pred_obb[..., 6], pred_obb[..., 0:3])
    gt_bbox = get_3d_box_batch(gt_obb[..., 3:6], gt_obb[..., 6], gt_obb[..., 0:3])
    ious = box3d_iou_auto(pred_bbox, gt_bbox, num_heading_bin=nh)  # (B,)

    end_points["ref_iou"] = ious
    end_points["ref_iou_rate_0.25"] = jnp.mean((ious >= 0.25).astype(jnp.float32))
    end_points["ref_iou_rate_0.5"] = jnp.mean((ious >= 0.5).astype(jnp.float32))
    end_points["pred_bboxes"] = pred_bbox
    end_points["gt_bboxes"] = gt_bbox

    # language accuracy
    if use_lang_classifier and "lang_scores" in end_points:
        end_points["lang_acc"] = jnp.mean(
            (jnp.argmax(end_points["lang_scores"], 1) == end_points["object_cat"]).astype(jnp.float32)
        )
    else:
        end_points["lang_acc"] = jnp.float32(0.0)

    # answer accuracies for each scoring head
    answer_cats = end_points.get("answer_cats")
    at1_by_head = {}
    for head, suffix in (("answer_scores", ""), ("answer_scores_scene", "_scene"),
                         ("answer_scores_2d", "_2d"), ("answer_scores_2d3d", "_2d3d")):
        if head in end_points and answer_cats is not None:
            scores = end_points[head]
            cats = answer_cats
            if cats.shape[1] < scores.shape[1]:
                cats = jnp.pad(cats, ((0, 0), (0, scores.shape[1] - cats.shape[1])))
            a1, a10, at1_vec, top_ids = _answer_acc(scores, cats)
            end_points[f"answer_acc_at1{suffix}"] = a1
            end_points[f"answer_acc_at10{suffix}"] = a10
            at1_by_head[suffix] = at1_vec
            if suffix == "":
                # per-sample dump consumed by scripts/eval.py's
                # pred.<split>.pkl records (reference eval.py:362-383)
                end_points["pred_answers_at10"] = top_ids
        else:
            end_points[f"answer_acc_at1{suffix}"] = jnp.float32(0.0)
            end_points[f"answer_acc_at10{suffix}"] = jnp.float32(0.0)

    # 3D-over-2D disagreement rates (eval_helper.py:268-280)
    if "_2d" in at1_by_head and "_scene" in at1_by_head:
        correct_3d = at1_by_head["_scene"].astype(bool)
        correct_2d = at1_by_head["_2d"].astype(bool)
        end_points["answer_acc_at1_3d_over_2d"] = jnp.mean((correct_3d & ~correct_2d).astype(jnp.float32))
        end_points["answer_acc_at1_2d_over_3d"] = jnp.mean((~correct_3d & correct_2d).astype(jnp.float32))

    # objectness + semantic accuracy (eval_helper.py:311-320)
    obj_acc = jnp.sum(
        (objectness_pred == objectness_label).astype(jnp.float32) * end_points["objectness_mask"]
    ) / (jnp.sum(end_points["objectness_mask"]) + 1e-6)
    end_points["obj_acc"] = obj_acc

    sem_cls_label = jnp.take_along_axis(end_points["sem_cls_label"], end_points["object_assignment"], axis=1)
    sem_match = (sem_cls_label == jnp.argmax(end_points["sem_cls_scores"], -1)).astype(jnp.float32)
    end_points["sem_acc"] = jnp.sum(sem_match * pred_masks) / (jnp.sum(pred_masks) + 1e-6)
    end_points["pred_mask"] = pred_masks
    end_points["label_mask"] = label_masks

    return end_points
