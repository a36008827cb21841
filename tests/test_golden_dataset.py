"""Golden parity: seeded ``ScannetQADataset.__getitem__`` vs the reference.

Round-1 verdict item 3(d): the per-sample assembly — color norm, height
channel, random sampling, box-consistent augmentation (flips, ±5° xyz
rotations, ±0.5 m translation), votes computed AFTER augmentation
(first-point-decides semantics), soft answer scores, GloVe text features —
must match the reference's ``lib/dataset.py:155-612`` draw for draw.

Both sides consume an identical numpy RandomState stream (the reference
draws from the global ``np.random``, ours from an injected RandomState; the
call sequence is sampling-choice, 2 flip uniforms, 3 rotation uniforms,
3 translation choices — verified equal here).
"""

import os

import numpy as np
import pytest

from tests.ref_shim import REFERENCE, import_ref_dataset

pytestmark = [
    pytest.mark.skipif(not os.path.isdir(REFERENCE), reason="no reference snapshot"),
    # reference-torch golden tier: executes the reference snapshot's own
    # torch code on CPU (minutes per test) — excluded from the default
    # fast suite; run with `pytest -m golden`
    pytest.mark.golden,
]

torch = pytest.importorskip("torch")

SCENE = "scene0000_00"
QID = "train-scene0000_00-7"


def _make_scene(rng, n=4000, n_obj=5):
    from bridgeqa_tpu.data.scannet_config import ScannetDatasetConfig

    dc = ScannetDatasetConfig()
    nyu_ids = sorted(dc.nyu40ids)
    verts = np.zeros((n, 9), np.float32)
    verts[:, :3] = (rng.rand(n, 3) * 6 - 3).astype(np.float32)
    verts[:, 3:6] = rng.randint(0, 255, (n, 3)).astype(np.float32)
    instance_labels = rng.randint(0, n_obj + 1, n).astype(np.int64)  # 0 = background
    semantic_labels = np.zeros(n, np.int64)
    bboxes = []
    for inst in range(1, n_obj + 1):
        mask = instance_labels == inst
        nyu = nyu_ids[inst % len(nyu_ids)]
        semantic_labels[mask] = nyu
        pts = verts[mask, :3]
        mn, mx = pts.min(0), pts.max(0)
        bboxes.append(np.concatenate([(mn + mx) / 2, mx - mn, [nyu], [inst]]))
    return dict(
        mesh_vertices=verts,
        instance_labels=instance_labels,
        semantic_labels=semantic_labels,
        instance_bboxes=np.asarray(bboxes, np.float64),
        axis_align_matrix=np.eye(4, dtype=np.float64),
    )


class _FakePool:
    def get(self, scene_id, image_name):
        return (torch.zeros(3, 4, 4),
                np.zeros((4, 4), np.float32),
                np.eye(4, dtype=np.float32),
                np.zeros((4, 4, 3), np.uint8))


class TestDatasetGetitemGolden:
    @pytest.mark.parametrize("seed", [1234, 99])
    def test_seeded_getitem_matches_reference(self, seed):
        ref_dataset = import_ref_dataset()

        from bridgeqa_tpu.data.pipeline import ScanQADataset
        from bridgeqa_tpu.data.scannet_config import ScannetDatasetConfig

        dc = ScannetDatasetConfig()
        rng = np.random.RandomState(5)
        scene = _make_scene(rng)
        question = "what color is the chair ?"
        tokens = question.split()
        answer_cands = ["brown", "red", "blue"]
        answer_counter = {"brown": 3, "red": 1, "blue": 7}
        record = {
            "scene_id": SCENE, "question_id": QID, "question": question,
            "answers": ["brown", "red"], "object_ids": [3], "object_names": ["chair"],
        }
        glove = {w: rng.rand(300).astype(np.float64) for w in tokens}
        glove["unk"] = rng.rand(300).astype(np.float64)

        # ---- reference side: bypass __init__ (it loads GBs of real data),
        # hand-set exactly the state __getitem__ reads
        ds = ref_dataset.ScannetQADataset.__new__(ref_dataset.ScannetQADataset)
        ds.scanqa = [dict(record, token=tokens)]
        ds.split = "train"
        ds.use_unanswerable = False
        ds.debug = False
        ds.augment = True
        ds.num_points = 1024
        ds.use_color = True
        ds.use_height = True
        ds.use_normal = False
        ds.use_multiview = False
        ds.answer_counter = dict(answer_counter)
        ds.answer_vocab = ref_dataset.Answer(answer_cands)
        ds.num_answers = len(answer_cands)
        ds.answer_cls_loss = "bce"
        ds.i2tfile = "fake"
        ds.random_scene_view = False
        ds.scene_view_topk = 1
        ds.scene_view_map = {QID: ["v0"]}
        ds.scene_view_pool = _FakePool()
        ds.use_bert_embeds = False
        ds.scene_data = {SCENE: {k: v.copy() for k, v in scene.items()}}
        ds.raw2label = dict(dc.type2class)
        ds.scene_id_to_number = {SCENE: 0}
        # reference glove assembly (_tranform_text_glove) without the pickle
        emb = np.zeros((36, 300))
        for i, tok in enumerate(tokens[:36]):
            emb[i] = glove.get(tok, glove["unk"])
        ds.lang = {SCENE: {QID: emb}}

        np.random.seed(seed)
        ref_out = ds[0]

        # ---- our side, same seed -> same RandomState stream
        ours = ScanQADataset(
            [dict(record)], {SCENE: {k: v.copy() for k, v in scene.items()}},
            answer_cands=answer_cands, answer_counter=dict(answer_counter),
            split="train", num_points=1024, use_color=True, use_height=True,
            augment=True, glove=glove, seed=seed,
        )
        our_out = ours[0]

        exact_int = ("heading_class_label", "size_class_label", "num_bbox", "sem_cls_label",
                     "ref_box_label", "ref_heading_class_label", "ref_size_class_label",
                     "object_cat", "ref_obj_mask", "answer_cat")
        close = ("point_clouds", "center_label", "target_bboxes", "heading_residual_label",
                 "size_residual_label", "box_label_mask", "vote_label", "vote_label_mask",
                 "ref_center_label", "ref_size_residual_label", "answer_cats",
                 "answer_cat_scores", "lang_feat")
        for key in exact_int:
            np.testing.assert_array_equal(
                np.asarray(our_out[key]), np.asarray(ref_out[key]), err_msg=key)
        for key in close:
            np.testing.assert_allclose(
                np.asarray(our_out[key], np.float64), np.asarray(ref_out[key], np.float64),
                rtol=1e-5, atol=1e-6, err_msg=key)
        assert our_out["answers"] == ref_out["answers"]
        assert int(our_out["lang_len"]) == int(ref_out["lang_len"])
