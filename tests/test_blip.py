"""BLIP branch tests: twin encoder exchange, LM loss semantics, rank inference."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bridgeqa_tpu.models.blip_vqa3d import BLIPVQA3D, BlipVQA3DConfig
from bridgeqa_tpu.models.med import MedConfig, label_smoothed_lm_loss

TINY_MED = MedConfig(
    vocab_size=120,
    hidden_size=64,
    num_hidden_layers=2,
    num_attention_heads=4,
    intermediate_size=128,
    max_position_embeddings=64,
    encoder_width=64,
)

TINY_CFG = BlipVQA3DConfig(
    med=TINY_MED,
    image_size=32,
    num_answers=30,
    scene_size=16,
    bos_token_id=110,
    vit="custom",
    vit_custom_embed_dim=64,
    vit_custom_depth=2,
    vit_custom_heads=4,
    vit_drop_path_rate=0.0,
)


def tiny_model():
    return BLIPVQA3D(TINY_CFG)


@pytest.fixture(scope="module")
def setup():
    model = tiny_model()
    rng = np.random.RandomState(0)
    b, lq, la, n_obj = 2, 10, 6, 8
    batch = dict(
        image=jnp.asarray(rng.rand(b, 32, 32, 3), jnp.float32),
        question_ids=jnp.asarray(rng.randint(1, 100, (b, lq))),
        question_mask=jnp.asarray((np.arange(lq)[None, :] < np.array([[7], [10]])).astype(np.int32)),
        answer_ids=jnp.asarray(rng.randint(1, 100, (b, la))),
        answer_mask=jnp.ones((b, la), jnp.int32),
        scene_object_embeds=jnp.asarray(rng.rand(b, n_obj, 16), jnp.float32),
        scene_object_mask=jnp.ones((b, n_obj), jnp.int32),
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch["image"], batch["question_ids"], batch["question_mask"],
        batch["answer_ids"], batch["answer_mask"],
        batch["scene_object_embeds"], batch["scene_object_mask"], train=False,
    )
    return model, variables, batch


class TestLabelSmoothedLoss:
    def test_matches_torch_formula(self, rng):
        b, l, v = 2, 5, 11
        logits = jnp.asarray(rng.randn(b, l, v), jnp.float32)
        labels = np.asarray(rng.randint(0, v, (b, l)))
        labels[0, -1] = -100
        got = np.asarray(label_smoothed_lm_loss(logits, jnp.asarray(labels)))

        # oracle: shift, per-token (1-eps)*nll + eps*mean(-logp), zero at -100, sum
        lp = np.asarray(jax.nn.log_softmax(logits, axis=-1))[:, :-1]
        lab = labels[:, 1:]
        eps = 0.1
        want = np.zeros(b)
        for i in range(b):
            for j in range(l - 1):
                if lab[i, j] == -100:
                    continue
                nll = -lp[i, j, lab[i, j]]
                smooth = -lp[i, j].mean()
                want[i] += (1 - eps) * nll + eps * smooth
        np.testing.assert_allclose(got, want, rtol=1e-5)


class TestBlipVQA3D:
    def test_train_forward(self, setup):
        model, variables, batch = setup
        loss, fused, qmask = model.apply(
            variables,
            batch["image"], batch["question_ids"], batch["question_mask"],
            batch["answer_ids"], batch["answer_mask"],
            batch["scene_object_embeds"], batch["scene_object_mask"],
            train=True, rngs={"dropout": jax.random.PRNGKey(2)},
        )
        assert jnp.isfinite(loss)
        assert fused.shape == (2, 10, 64)

    def test_scene_stream_affects_2d_output(self, setup):
        """The per-layer exchange must propagate scene info into the 2D stream."""
        model, variables, batch = setup

        def encode(scene):
            def fn(m):
                img = m.encode_image(batch["image"])
                return m.encode_question(img, batch["question_ids"], batch["question_mask"],
                                         scene, batch["scene_object_mask"])
            return model.apply(variables, method=fn)

        h2d_a, h3d_a, _ = encode(batch["scene_object_embeds"])
        h2d_b, h3d_b, _ = encode(batch["scene_object_embeds"] + 1.0)
        assert not np.allclose(np.asarray(h2d_a), np.asarray(h2d_b)), \
            "2D stream ignored the scene stream — twin exchange broken"
        assert not np.allclose(np.asarray(h3d_a), np.asarray(h3d_b))

    def test_rank(self, setup):
        model, variables, batch = setup
        rng = np.random.RandomState(3)
        a, la = 30, 5
        answer_ids = np.asarray(rng.randint(1, 100, (a, la)))
        answer_ids[:, 0] = TINY_CFG.bos_token_id
        answer_mask = np.ones((a, la), np.int32)

        def fn(m):
            return m.rank(batch["image"], batch["question_ids"], batch["question_mask"],
                          jnp.asarray(answer_ids), jnp.asarray(answer_mask),
                          batch["scene_object_embeds"], batch["scene_object_mask"], k_test=8)

        fused, scores, qmask = model.apply(variables, method=fn)
        assert scores["answer_scores"].shape == (2, 30)
        assert scores["answer_scores_2d"].shape == (2, 30)
        # exactly k answers scored per sample for each decoder
        scored = np.asarray(scores["answer_scores_2d"]) > -1e4 + 1
        assert (scored.sum(-1) == 8).all()
        assert jnp.isfinite(scores["answer_scores"]).all()

    def test_shared_decoder_variant(self):
        cfg = dataclasses.replace(TINY_CFG, share_decoder=True)
        model = BLIPVQA3D(cfg)
        rng = np.random.RandomState(0)
        b, lq, la, n_obj = 1, 6, 4, 4
        args = (
            jnp.asarray(rng.rand(b, 32, 32, 3), jnp.float32),
            jnp.asarray(rng.randint(1, 100, (b, lq))),
            jnp.ones((b, lq), jnp.int32),
            jnp.asarray(rng.randint(1, 100, (b, la))),
            jnp.ones((b, la), jnp.int32),
            jnp.asarray(rng.rand(b, n_obj, 16), jnp.float32),
            jnp.ones((b, n_obj), jnp.int32),
        )
        variables = model.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
                               *args, train=False)
        assert "text_decoder_scene" not in variables["params"]
        loss, _, _ = model.apply(variables, *args, train=False)
        assert jnp.isfinite(loss)

    def test_parallelshare_variant(self):
        """parallelshare (blip_vqa_3d.py:331-341): ONE decoder for both
        streams, but the 3D calls select per-layer alternate FFN LayerNorms
        (BertOutputParallel). Perturbing ONLY the alternate bank must change
        the loss (it feeds the 3D stream) while layernorm_idx=0 outputs (the
        2D rank scores) stay bitwise-identical."""
        cfg = dataclasses.replace(TINY_CFG, scene_feature_position="parallelshare")
        model = BLIPVQA3D(cfg)
        rng = np.random.RandomState(0)
        b, lq, la, n_obj = 1, 6, 4, 4
        args = (
            jnp.asarray(rng.rand(b, 32, 32, 3), jnp.float32),
            jnp.asarray(rng.randint(1, 100, (b, lq))),
            jnp.ones((b, lq), jnp.int32),
            jnp.asarray(rng.randint(1, 100, (b, la))),
            jnp.ones((b, la), jnp.int32),
            jnp.asarray(rng.rand(b, n_obj, 16), jnp.float32),
            jnp.ones((b, n_obj), jnp.int32),
        )
        variables = model.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
                               *args, train=False)
        params = variables["params"]
        assert "text_decoder_scene" not in params
        layer0 = params["text_decoder"]["bert"]["encoder"]["layer_0"]
        assert "output_LayerNorms_0" in layer0

        loss0, _, _ = model.apply(variables, *args, train=False)

        # answer-list rank inputs: 8 answers over the tiny vocab
        alist_ids = jnp.asarray(rng.randint(1, 100, (8, la))).at[:, 0].set(cfg.bos_token_id)
        alist_mask = jnp.ones((8, la), jnp.int32)
        rank_args = (args[0], args[1], args[2], alist_ids, alist_mask, args[5], args[6])
        _, scores0, _ = model.apply(variables, *rank_args, k_test=4, method="rank")

        # perturb ONLY the alternate LayerNorm bank in every decoder layer
        perturbed = jax.tree_util.tree_map(lambda x: x, params)  # copy refs
        import flax

        flat = flax.traverse_util.flatten_dict(perturbed)
        n_hit = 0
        for k in list(flat):
            if "output_LayerNorms_0" in k and k[-1] == "scale" and k[0] == "text_decoder":
                flat[k] = flat[k] * 2.0 + 0.1
                n_hit += 1
        assert n_hit == TINY_MED.num_hidden_layers
        perturbed = flax.traverse_util.unflatten_dict(flat)

        loss1, _, _ = model.apply({"params": perturbed}, *args, train=False)
        assert not np.isclose(float(loss0), float(loss1)), "alternate LN bank is dead"

        _, scores1, _ = model.apply({"params": perturbed}, *rank_args, k_test=4, method="rank")
        np.testing.assert_array_equal(np.asarray(scores0["answer_scores_2d"]),
                                      np.asarray(scores1["answer_scores_2d"]))
        assert not np.allclose(np.asarray(scores0["answer_scores_scene"]),
                               np.asarray(scores1["answer_scores_scene"]))


class TestVpuAttentionPath:
    """The large-batch/short-seq attention branch (VPU broadcast-mul-reduce)
    must match the einsum path bit-for-bit-ish. b*nh >= 4096 triggers it."""

    def test_matches_einsum_path(self):
        import jax
        import jax.numpy as jnp

        from bridgeqa_tpu.models.med import BertSelfAttention, MedConfig, causal_attention_bias

        cfg = MedConfig(vocab_size=50, hidden_size=32, num_hidden_layers=1,
                        num_attention_heads=4, intermediate_size=64,
                        max_position_embeddings=32, encoder_width=32)
        att = BertSelfAttention(cfg)
        rng = np.random.RandomState(0)
        big = jnp.asarray(rng.rand(2048, 6, 32), jnp.float32)  # 2048*4 >= 4096 -> VPU
        bias = causal_attention_bias(jnp.ones((2048, 6), jnp.int32))
        v = att.init(jax.random.PRNGKey(0), big, bias, deterministic=True)

        ctx_vpu, probs_vpu = att.apply(v, big, bias, deterministic=True)
        # the small-batch path on the identical inputs, row-block by row-block
        outs, probs = [], []
        for i in range(0, 2048, 512):  # 512*4 < 4096 -> einsum path
            c, p = att.apply(v, big[i:i + 512], bias[i:i + 512], deterministic=True)
            outs.append(np.asarray(c))
            probs.append(np.asarray(p))
        np.testing.assert_allclose(np.asarray(ctx_vpu), np.concatenate(outs),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(probs_vpu), np.concatenate(probs),
                                   rtol=1e-5, atol=1e-6)
