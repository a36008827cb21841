"""FULL-MODEL golden: the reference's own ``ScanQA.forward``
(``models/qa_module.py:419-760``) run end-to-end on CPU vs ``BridgeQA.apply``
with converter-shared weights.

The reference's CUDA extension is replaced by exact-semantics numpy oracles
(``tests/ref_shim.install_pointnet2_ext_oracles``), which makes the complete
orchestration runnable: backbone -> voting -> proposal -> object adapter ->
twin encoder -> rank/LM decoders -> lang head -> SGA grounding. Every
index-producing op (FPS / ball query / three_nn) depends on xyz only, so the
sampled index structures must agree EXACTLY; feature heads agree to f32
cross-framework tolerance.

Round-3 verdict item 2 (the last orchestration not covered by goldens).
"""

import os
import types

import numpy as np
import pytest

from tests.ref_shim import REFERENCE, install_pointnet2_ext_oracles

pytestmark = [
    pytest.mark.skipif(not os.path.isdir(REFERENCE), reason="no reference snapshot"),
    # reference-torch golden tier: executes the reference snapshot's own
    # torch code on CPU (minutes per test) — excluded from the default
    # fast suite; run with `pytest -m golden`
    pytest.mark.golden,
]

torch = pytest.importorskip("torch")

B = 2
N_POINTS = 2304  # >= the backbone's hardcoded SA1 npoint (2048)
NUM_PROPOSAL = 32
HIDDEN = 128
NUM_ANSWERS = 8


@pytest.fixture(scope="module")
def pair():
    import jax

    from tests.ref_shim import import_ref_dataset
    from tests.test_golden_orchestration import _FakeTokenizer, _pad_ids

    install_pointnet2_ext_oracles()
    import_ref_dataset()  # lib.dataset import needs the scene-list shim

    import models.blip_vqa_3d as ref_vqa3d
    import models.qa_module as ref_qa

    from bridgeqa_tpu.data.scannet_config import ScannetDatasetConfig
    from bridgeqa_tpu.models.blip_vqa3d import BlipVQA3DConfig
    from bridgeqa_tpu.models.bridgeqa import BridgeQA, BridgeQAConfig
    from bridgeqa_tpu.models.med import MedConfig
    from bridgeqa_tpu.utils.blip_checkpoint import merge_pretrained
    from bridgeqa_tpu.utils.bridgeqa_checkpoint import convert_scanqa

    dc = ScannetDatasetConfig()
    rng = np.random.RandomState(42)

    questions = ["q0", "q1"]
    answers = [f"a{i}" for i in range(NUM_ANSWERS)]
    table = {}
    for i, q in enumerate(questions):
        table[q] = [101] + list(rng.randint(1000, 29000, 6 + i)) + [102]
    for i, a in enumerate(answers):
        table[a] = [101] + list(rng.randint(1000, 29000, 1 + (i % 3))) + [102]

    ref_vqa3d.init_tokenizer = lambda: _FakeTokenizer(table)

    def fake_get_blip(**kw):
        model = ref_vqa3d.BLIP_VQA3D(
            image_size=48, vit="base", scene_size=kw["scene_size"],
            num_answers=kw["num_answers"], use_text_decoder=kw["use_text_decoder"],
            scene_feature_position=kw["scene_feature_position"],
            encoder_layers=2, decoder_layers=2,
        )
        return model, 3

    ref_qa.get_blip_model_simple = fake_get_blip

    torch.manual_seed(7)
    ref_model = ref_qa.ScanQA(
        num_answers=NUM_ANSWERS, num_object_class=dc.num_class,
        input_feature_dim=0, num_heading_bin=dc.num_heading_bin,
        num_size_cluster=dc.num_size_cluster, mean_size_arr=dc.mean_size_arr,
        num_proposal=NUM_PROPOSAL, hidden_size=HIDDEN,
        use_object_mask=True, use_lang_cls=True, use_reference=True,
        use_answer=True, use_blip=True, use_text_decoder=True,
        all_answers=answers, stage="VQA",
        scene_feature_position="paralleltwin", image_size=48,
    ).eval()
    # randomize BN running stats so the golden exercises them
    with torch.no_grad():
        for mod in ref_model.modules():
            if isinstance(mod, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
                mod.running_mean.normal_(0, 0.3)
                mod.running_var.uniform_(0.5, 2.0)

    blip_cfg = BlipVQA3DConfig(
        med=MedConfig(), image_size=48, vit="base", scene_size=HIDDEN,
        num_answers=NUM_ANSWERS, use_text_decoder=True,
        encoder_layers=2, decoder_layers=2, vit_drop_path_rate=0.0,
    )
    cfg = BridgeQAConfig(
        num_answers=NUM_ANSWERS, num_object_class=dc.num_class,
        num_heading_bin=dc.num_heading_bin, num_size_cluster=dc.num_size_cluster,
        num_proposal=NUM_PROPOSAL, hidden_size=HIDDEN, use_blip=True,
        use_text_decoder=True, blip=blip_cfg,
    )
    model = BridgeQA(cfg, mean_size_arr=dc.mean_size_arr)

    # ---- shared inputs
    points = ((rng.rand(B, N_POINTS, 3) - 0.5) * np.array([6.0, 6.0, 2.5])).astype(np.float32)
    image = rng.rand(B, 48, 48, 3).astype(np.float32)
    poses = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1, 1))
    depths = np.zeros((B, 1, 48, 48), np.float32)
    q_ids, q_mask = _pad_ids(table, questions, first_token=_FakeTokenizer.enc_token_id)
    a_ids, a_mask = _pad_ids(table, ["a0", "a1"], first_token=_FakeTokenizer.bos_token_id)
    alist_ids, alist_mask = _pad_ids(table, answers, first_token=_FakeTokenizer.bos_token_id)

    batch = dict(
        point_clouds=points, images=image,
        question_ids=q_ids, question_mask=q_mask,
        answer_ids=a_ids, answer_mask=a_mask,
        answer_list_ids=alist_ids, answer_list_mask=alist_mask,
    )

    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, train=False, inference="rank", k_test=NUM_ANSWERS,
    )
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    converted = convert_scanqa(sd, image_size=48)
    merged_p, _, skipped_p = merge_pretrained(variables["params"], converted["params"])
    merged_s, _, skipped_s = merge_pretrained(variables["batch_stats"], converted["batch_stats"])
    real_skips = [s for s in skipped_p + skipped_s if "no such param" not in s]
    assert not real_skips, real_skips
    variables = {"params": merged_p, "batch_stats": merged_s}

    def ref_forward(phase):
        data_dict = {
            "point_clouds": torch.from_numpy(points.copy()),
            "scene_id_str": ["scene0000_00", "scene0001_00"],
            "question_id_str": questions,
            "images": torch.from_numpy(image.transpose(0, 3, 1, 2)[:, None].copy()),
            "poses": torch.from_numpy(poses.copy()),
            "depths": torch.from_numpy(depths.copy()),
            "question": questions,
            "answers": ["a0", "a1"],
            "answer_cat_scores": torch.zeros(B, NUM_ANSWERS),
            "phase": phase,
        }
        with torch.no_grad():
            return ref_model(data_dict)

    return types.SimpleNamespace(
        ref_model=ref_model, model=model, variables=variables, batch=batch,
        ref_forward=ref_forward, dc=dc,
    )


@pytest.fixture(scope="module")
def rank_outputs(pair):
    ref_out = pair.ref_forward("val")
    our_out = pair.model.apply(pair.variables, pair.batch, train=False,
                               inference="rank", k_test=NUM_ANSWERS)
    return ref_out, our_out


class TestScanQAFullGolden:
    def test_detector_indices_exact(self, rank_outputs):
        """FPS / ball-query / aggregation index structures depend on xyz only
        and must agree bitwise between the CUDA-semantics oracles and our
        XLA ops."""
        ref_out, our_out = rank_outputs
        for key in ("sa1_inds", "sa2_inds", "seed_inds", "aggregated_vote_inds"):
            np.testing.assert_array_equal(
                np.asarray(our_out[key]), ref_out[key].numpy(), err_msg=key)

    def test_detector_heads(self, rank_outputs):
        ref_out, our_out = rank_outputs
        # channel-last on our side vs reference layouts
        checks = [
            ("seed_xyz", None, 1e-6, 1e-6),
            ("vote_xyz", None, 1e-4, 1e-5),
            ("aggregated_vote_xyz", None, 1e-4, 1e-5),
            ("objectness_scores", None, 1e-3, 1e-4),
            ("center", None, 1e-3, 1e-4),
            ("heading_scores", None, 1e-3, 1e-4),
            ("heading_residuals", None, 1e-3, 1e-4),
            ("size_scores", None, 1e-3, 1e-4),
            ("size_residuals", None, 1e-3, 1e-4),
            ("sem_cls_scores", None, 1e-3, 1e-4),
            ("bbox_corner", None, 1e-3, 1e-3),
        ]
        for key, perm, rtol, atol in checks:
            ours = np.asarray(our_out[key])
            ref = ref_out[key].numpy() if hasattr(ref_out[key], "numpy") else np.asarray(ref_out[key])
            if perm is not None:
                ours = ours.transpose(perm)
            np.testing.assert_allclose(ours, ref, rtol=rtol, atol=atol, err_msg=key)
        # channel-first reference tensors
        np.testing.assert_allclose(
            np.asarray(our_out["seed_features"]),
            ref_out["seed_features"].numpy().transpose(0, 2, 1), rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(our_out["aggregated_vote_features"]),
            ref_out["aggregated_vote_features"].numpy(), rtol=1e-3, atol=1e-4)
        np.testing.assert_array_equal(
            np.asarray(our_out["bbox_mask"]), ref_out["bbox_mask"].numpy())

    def test_rank_scores(self, rank_outputs):
        ref_out, our_out = rank_outputs
        for key in ("answer_scores", "answer_scores_scene", "answer_scores_2d"):
            np.testing.assert_allclose(
                np.asarray(our_out[key]), ref_out[key].numpy(),
                rtol=5e-3, atol=1e-4, err_msg=key)
        # the decision the eval pipeline takes
        np.testing.assert_array_equal(
            np.asarray(our_out["answer_scores"]).argmax(-1),
            ref_out["answer_scores"].numpy().argmax(-1))

    def test_lang_and_grounding_heads(self, rank_outputs):
        ref_out, our_out = rank_outputs
        np.testing.assert_allclose(
            np.asarray(our_out["lang_scores"]), ref_out["lang_scores"].numpy(),
            rtol=5e-3, atol=2e-3)
        np.testing.assert_allclose(
            np.asarray(our_out["cluster_ref"]), ref_out["cluster_ref"].numpy(),
            rtol=5e-3, atol=2e-3)

    def test_train_lm_loss(self, pair):
        """phase=='train' LM loss (2D + 3D decoders summed inside
        BLIP_VQA3D) vs our inference='loss' eval-mode branch."""
        ref_out = pair.ref_forward("train")
        our_out = pair.model.apply(pair.variables, pair.batch, train=False,
                                   inference="loss")
        np.testing.assert_allclose(
            float(our_out["decoder_loss"]), float(ref_out["decoder_loss"]),
            rtol=5e-4)
