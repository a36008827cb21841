"""Top-level BridgeQA model tests (tiny config): DET / BLIP / MCAN paths."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bridgeqa_tpu.data.scannet_config import ScannetDatasetConfig
from bridgeqa_tpu.losses import get_loss
from bridgeqa_tpu.models.blip_vqa3d import BlipVQA3DConfig
from bridgeqa_tpu.models.bridgeqa import BridgeQA, BridgeQAConfig
from bridgeqa_tpu.models.med import MedConfig
from tests.synthetic import make_batch

CFG_DATA = ScannetDatasetConfig()

TINY_MED = MedConfig(vocab_size=120, hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
                     intermediate_size=128, max_position_embeddings=64, encoder_width=64)
TINY_BLIP = BlipVQA3DConfig(med=TINY_MED, image_size=32, num_answers=30, scene_size=32,
                            bos_token_id=110, vit="custom", vit_custom_embed_dim=64,
                            vit_custom_depth=2, vit_custom_heads=4, vit_drop_path_rate=0.0)


def tiny_cfg(**kw):
    base = dict(num_answers=30, num_proposal=32, hidden_size=32, blip=TINY_BLIP,
                mcan_num_layers=1, mcan_flat_out_size=64, mcan_flat_mlp_size=32)
    base.update(kw)
    return BridgeQAConfig(**base)


def qa_batch(rng, b=2, num_points=2048):
    batch = {k: jnp.asarray(v) for k, v in make_batch(rng, batch_size=b, num_points=num_points).items()}
    lq, la = 12, 5
    batch.update(
        images=jnp.asarray(rng.rand(b, 32, 32, 3), jnp.float32),
        question_ids=jnp.asarray(rng.randint(1, 100, (b, lq))),
        question_mask=jnp.ones((b, lq), jnp.int32),
        answer_ids=jnp.asarray(rng.randint(1, 100, (b, la))),
        answer_mask=jnp.ones((b, la), jnp.int32),
        answer_cat=jnp.asarray(rng.randint(0, 30, (b,))),
        answer_cat_scores=jnp.asarray(rng.rand(b, 30), jnp.float32),
        lang_feat=jnp.asarray(rng.rand(b, lq, 300), jnp.float32),
        lang_len=jnp.asarray([10, 12]),
    )
    a_all = 30
    answer_list_ids = rng.randint(1, 100, (a_all, la))
    answer_list_ids[:, 0] = 110
    batch["answer_list_ids"] = jnp.asarray(answer_list_ids)
    batch["answer_list_mask"] = jnp.ones((a_all, la), jnp.int32)
    return batch


@pytest.fixture(scope="module")
def batch():
    return qa_batch(np.random.RandomState(7))


class TestDETStage:
    def test_detector_only(self, batch):
        model = BridgeQA(tiny_cfg(stage="DET"), mean_size_arr=CFG_DATA.mean_size_arr)
        variables = model.init(jax.random.PRNGKey(0), batch, train=False)
        assert "blip_model" not in variables["params"]
        out = model.apply(variables, batch, train=False)
        assert "objectness_scores" in out and "answer_scores" not in out


class TestBlipPath:
    @pytest.fixture(scope="class")
    def model_vars(self, batch):
        model = BridgeQA(tiny_cfg(use_blip=True), mean_size_arr=CFG_DATA.mean_size_arr)
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, batch, train=False
        )
        return model, variables

    def test_train_forward_and_loss(self, batch, model_vars):
        model, variables = model_vars
        out, _ = model.apply(variables, batch, train=True, mutable=["batch_stats"],
                             rngs={"dropout": jax.random.PRNGKey(2)})
        assert "decoder_loss" in out and jnp.isfinite(out["decoder_loss"])
        assert out["cluster_ref"].shape == (2, 32)
        assert out["lang_scores"].shape == (2, 18)

        ep = dict(batch)
        ep.update(out)
        loss, ep = get_loss(ep, CFG_DATA, detection=True, use_reference=True,
                            use_lang_classifier=True, use_answer=True)
        assert jnp.isfinite(loss)

    def test_rank_inference(self, batch, model_vars):
        model, variables = model_vars
        out = model.apply(variables, batch, train=False, inference="rank", k_test=8)
        assert out["answer_scores"].shape == (2, 30)
        assert out["answer_scores_2d"].shape == (2, 30)
        assert jnp.isfinite(out["answer_scores"]).all()
        assert out["cluster_ref"].shape == (2, 32)
        assert "2d_self_attention" not in out  # opt-in only

    def test_rank_output_attentions(self, batch, model_vars):
        """--output_attention dump: last twin-encoder layer's attention probs
        under the reference's keys (predict.py:359-365). Self attention is
        (B, nh, Lq, Lq); cross is (B, nh, Lq, L_img/scene + Lq); every row is
        a softmax distribution."""
        model, variables = model_vars
        out = model.apply(variables, batch, train=False, inference="rank", k_test=8,
                          output_attentions=True)
        b, nh = 2, TINY_MED.num_attention_heads
        lq = batch["question_ids"].shape[1]
        n_img = (TINY_BLIP.image_size // 16) ** 2 + 1
        n_scene = 32  # num_proposal
        assert out["2d_self_attention"].shape == (b, nh, lq, lq)
        assert out["3d_self_attention"].shape == (b, nh, lq, lq)
        assert out["2d_cross_attention"].shape == (b, nh, lq, n_img + lq)
        assert out["3d_cross_attention"].shape == (b, nh, lq, n_scene + lq)
        for k in ("2d_self_attention", "3d_self_attention",
                  "2d_cross_attention", "3d_cross_attention"):
            probs = np.asarray(out[k], np.float32)
            np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=2e-5)
        # rank scores unchanged by the dump
        base = model.apply(variables, batch, train=False, inference="rank", k_test=8)
        np.testing.assert_allclose(np.asarray(out["answer_scores"]),
                                   np.asarray(base["answer_scores"]), rtol=1e-6)


class TestMcanPath:
    def test_forward(self, batch):
        model = BridgeQA(tiny_cfg(use_blip=False), mean_size_arr=CFG_DATA.mean_size_arr)
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, batch, train=False
        )
        out = model.apply(variables, batch, train=False)
        assert out["answer_scores"].shape == (2, 30)
        assert out["lang_scores"].shape == (2, 18)
        assert out["cluster_ref"].shape == (2, 32)
        for k in ("answer_scores", "lang_scores", "cluster_ref", "fuse_feat"):
            assert jnp.isfinite(out[k]).all(), k


class TestClassifierMode:
    """use_text_decoder=False: answer_cls heads instead of LM decoders
    (``blip_vqa_3d.py:354-393``)."""

    def test_train_and_eval_scores(self, batch):
        cfg = tiny_cfg(use_text_decoder=False)
        model = BridgeQA(cfg, mean_size_arr=CFG_DATA.mean_size_arr)
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            batch, train=True,
        )
        out, _ = model.apply(variables, batch, train=True, mutable=["batch_stats"],
                             rngs={"dropout": jax.random.PRNGKey(2)})
        assert out["answer_scores"].shape == (2, 30)
        assert "answer_scores_scene" in out and "answer_scores_2d" in out
        assert "decoder_loss" not in out

        end_points = dict(batch)
        end_points.update(out)
        loss, ep = get_loss(end_points, CFG_DATA, detection=True, use_reference=True,
                            use_lang_classifier=True, use_answer=True)
        assert np.isfinite(float(loss))
        assert float(ep["answer_loss"]) > 0

        out_eval = model.apply(variables, batch, train=False)
        scores = np.asarray(out_eval["answer_scores"])
        expect = (np.asarray(out_eval["answer_scores_2d"])
                  + np.asarray(out_eval["answer_scores_scene"])) / 2.0
        np.testing.assert_allclose(scores, expect, rtol=1e-5)


class TestBertLangPath:
    """MCAN path with the in-graph BERT language encoder (the reference's
    LangModule bert_model_name option, lang_module.py:27-46), including the
    finetune-last-layer gradient gating."""

    def test_forward_and_freeze_semantics(self):
        from bridgeqa_tpu.data.scannet_config import ScannetDatasetConfig
        from bridgeqa_tpu.models.blip_vqa3d import BlipVQA3DConfig
        from bridgeqa_tpu.models.bridgeqa import BridgeQA, BridgeQAConfig
        from bridgeqa_tpu.models.med import MedConfig

        dc = ScannetDatasetConfig()
        med = MedConfig(vocab_size=80, hidden_size=32, num_hidden_layers=2,
                        num_attention_heads=4, intermediate_size=64,
                        max_position_embeddings=40, encoder_width=32)
        cfg = BridgeQAConfig(num_answers=10, num_proposal=16, hidden_size=32, use_blip=False,
                             lang_bert=True, lang_bert_finetune_last=True,
                             blip=BlipVQA3DConfig(med=med),
                             mcan_num_layers=1, mcan_flat_out_size=32, mcan_flat_mlp_size=16,
                             backbone_sa_npoints=(64, 32, 16, 8), backbone_sa_nsamples=(8, 8, 8, 8))
        model = BridgeQA(cfg, mean_size_arr=dc.mean_size_arr)
        rng = np.random.RandomState(0)
        batch = dict(
            point_clouds=jnp.asarray(rng.rand(2, 256, 3), jnp.float32),
            question_ids=jnp.asarray(rng.randint(1, 70, (2, 9))),
            question_mask=jnp.ones((2, 9), jnp.int32),
        )
        variables = model.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
                               batch, train=False)
        out = model.apply(variables, batch, train=False)
        assert out["answer_scores"].shape == (2, 10)
        assert np.isfinite(np.asarray(out["answer_scores"], np.float32)).all()

        def loss(p):
            o, _ = model.apply({"params": p, "batch_stats": variables["batch_stats"]},
                               batch, train=True, mutable=["batch_stats"],
                               rngs={"dropout": jax.random.PRNGKey(2)})
            return jnp.sum(o["answer_scores"].astype(jnp.float32) ** 2)

        grads = jax.grad(loss)(variables["params"])
        enc = grads["lang_bert_enc"]["bert"]["encoder"]
        g0 = float(jnp.abs(jnp.asarray(enc["layer_0"]["attention"]["self"]["query"]["kernel"])).sum())
        g1 = float(jnp.abs(jnp.asarray(enc["layer_1"]["attention"]["self"]["query"]["kernel"])).sum())
        assert g0 == 0.0, "frozen lower layer received gradients"
        assert g1 > 0.0, "finetuned last layer received no gradients"
