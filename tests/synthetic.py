"""Synthetic ScanNet-like scenes for fixture-based tests (no dataset needed)."""

import numpy as np

MAX_NUM_OBJ = 8


def make_scene(rng, num_points=2048, num_boxes=4, num_class=18):
    """Random axis-aligned boxes with points inside + background clutter.

    Returns a dict shaped like the reference's ``data_dict`` detection labels
    (``lib/dataset.py:546-612``), numpy, single scene (no batch dim).
    """
    centers = rng.uniform(-2.5, 2.5, (num_boxes, 3)).astype(np.float32)
    centers[:, 2] = rng.uniform(0.3, 1.5, num_boxes)
    sizes = rng.uniform(0.3, 1.0, (num_boxes, 3)).astype(np.float32)

    pts_per_box = num_points // (num_boxes + 1)
    point_list, votes, vote_mask = [], [], []
    for i in range(num_boxes):
        p = centers[i] + (rng.rand(pts_per_box, 3).astype(np.float32) - 0.5) * sizes[i]
        point_list.append(p)
        votes.append(np.tile(centers[i] - p, (1, 3)))
        vote_mask.append(np.ones(pts_per_box, dtype=np.float32))
    n_bg = num_points - pts_per_box * num_boxes
    bg = rng.uniform(-3, 3, (n_bg, 3)).astype(np.float32)
    bg[:, 2] = rng.uniform(0, 2.5, n_bg)
    point_list.append(bg)
    votes.append(np.zeros((n_bg, 9), dtype=np.float32))
    vote_mask.append(np.zeros(n_bg, dtype=np.float32))

    points = np.concatenate(point_list).astype(np.float32)
    vote_label = np.concatenate(votes).astype(np.float32)
    vote_label_mask = np.concatenate(vote_mask)

    center_label = np.zeros((MAX_NUM_OBJ, 3), dtype=np.float32)
    center_label[:num_boxes] = centers
    box_label_mask = np.zeros(MAX_NUM_OBJ, dtype=np.float32)
    box_label_mask[:num_boxes] = 1
    sem_cls_label = np.zeros(MAX_NUM_OBJ, dtype=np.int32)
    sem_cls_label[:num_boxes] = rng.randint(0, num_class, num_boxes)
    size_class_label = sem_cls_label.copy()
    size_residual_label = np.zeros((MAX_NUM_OBJ, 3), dtype=np.float32)
    size_residual_label[:num_boxes] = sizes  # residual vs mean handled loosely
    heading_class_label = np.zeros(MAX_NUM_OBJ, dtype=np.int32)
    heading_residual_label = np.zeros(MAX_NUM_OBJ, dtype=np.float32)

    ref_idx = 0
    return {
        "point_clouds": points,
        "vote_label": vote_label,
        "vote_label_mask": vote_label_mask,
        "center_label": center_label,
        "box_label_mask": box_label_mask,
        "sem_cls_label": sem_cls_label,
        "size_class_label": size_class_label,
        "size_residual_label": size_residual_label,
        "heading_class_label": heading_class_label,
        "heading_residual_label": heading_residual_label,
        "ref_center_label": centers[ref_idx],
        "ref_heading_class_label": np.int32(0),
        "ref_heading_residual_label": np.float32(0),
        "ref_size_class_label": sem_cls_label[ref_idx],
        "ref_size_residual_label": size_residual_label[ref_idx],
        "ref_obj_mask": np.int32(1),
        "object_cat": sem_cls_label[ref_idx],
    }


def make_batch(rng, batch_size=2, **kw):
    scenes = [make_scene(rng, **kw) for _ in range(batch_size)]
    return {k: np.stack([s[k] for s in scenes]) for k in scenes[0]}
