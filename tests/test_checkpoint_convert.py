"""Checkpoint-converter tests: golden parity against HuggingFace BERT
(constructed offline from a config — no downloads) plus mechanical checks
of the ViT/pos-embed conversion and the full-tree merge."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bridgeqa_tpu.models.med import BertLMHeadModel, BertModel, MedConfig
from bridgeqa_tpu.utils.blip_checkpoint import (
    convert_bert_encoder,
    convert_blip_vqa,
    convert_lm_head,
    interpolate_pos_embed,
    merge_pretrained,
    _bert_embeddings,
)

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

TINY = dict(vocab_size=120, hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=128, max_position_embeddings=64)


def hf_config(**kw):
    return transformers.BertConfig(
        **TINY, hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        hidden_act="gelu", **kw,
    )


def med_config(**kw):
    return MedConfig(**TINY, hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
                     add_cross_attention=False, **kw)


@pytest.fixture(scope="module")
def token_batch():
    rng = np.random.RandomState(0)
    ids = rng.randint(5, 100, (2, 12)).astype(np.int32)
    mask = (np.arange(12)[None, :] < np.array([[9], [12]])).astype(np.int32)
    return ids, mask


class TestBertParityWithHF:
    def test_encoder_hidden_states_match(self, token_batch):
        ids, mask = token_batch
        with torch.no_grad():
            hf = transformers.BertModel(hf_config(), add_pooling_layer=False).eval()
            ref = hf(torch.tensor(ids.astype(np.int64)),
                     attention_mask=torch.tensor(mask.astype(np.int64))).last_hidden_state.numpy()

        sd = {f"text_encoder.{k}": v.numpy() for k, v in hf.state_dict().items()}
        cfg = med_config()
        converted = {
            "embeddings": _bert_embeddings(sd, "text_encoder.embeddings", cfg.vocab_size),
            "encoder": convert_bert_encoder(sd, "text_encoder.encoder", twin=False),
        }

        model = BertModel(cfg)
        init = model.init(jax.random.PRNGKey(0), jnp.asarray(ids), jnp.asarray(mask),
                          deterministic=True)
        merged, loaded, skipped = merge_pretrained(init["params"], converted)
        assert not skipped, skipped

        out = model.apply({"params": merged}, jnp.asarray(ids), jnp.asarray(mask),
                          deterministic=True)
        got = np.asarray(out)
        # padding positions are unconstrained — compare valid positions only
        np.testing.assert_allclose(got[mask == 1], ref[mask == 1], atol=2e-4)

    def test_causal_lm_logits_match(self, token_batch):
        ids, mask = token_batch
        with torch.no_grad():
            hf = transformers.BertLMHeadModel(hf_config(is_decoder=True)).eval()
            ref = hf(torch.tensor(ids.astype(np.int64)),
                     attention_mask=torch.tensor(mask.astype(np.int64))).logits.numpy()

        sd = {f"text_decoder.{k}": v.numpy() for k, v in hf.state_dict().items()}
        cfg = med_config()
        converted = convert_lm_head(sd, "text_decoder", cfg.vocab_size)

        model = BertLMHeadModel(cfg)
        init = model.init(jax.random.PRNGKey(0), jnp.asarray(ids), jnp.asarray(mask),
                          deterministic=True)
        merged, _, skipped = merge_pretrained(init["params"], converted)
        assert not skipped, skipped

        logits, _ = model.apply({"params": merged}, jnp.asarray(ids), jnp.asarray(mask),
                                deterministic=True)
        got = np.asarray(logits)
        np.testing.assert_allclose(got[mask == 1], ref[mask == 1], atol=3e-4)


class TestPosEmbedInterpolation:
    def test_identity_when_same_size(self):
        pe = np.random.RandomState(0).rand(1, 17, 8).astype(np.float32)
        out = interpolate_pos_embed(pe, 16)
        np.testing.assert_array_equal(out, pe)

    def test_resize_shape_and_cls_preserved(self):
        pe = np.random.RandomState(0).rand(1, 1 + 16, 8).astype(np.float32)  # 4x4 grid
        out = interpolate_pos_embed(pe, 64)  # -> 8x8
        assert out.shape == (1, 65, 8)
        np.testing.assert_array_equal(out[:, 0], pe[:, 0])

    def test_constant_field_preserved(self):
        # a constant grid must stay constant under bicubic resize
        pe = np.full((1, 1 + 16, 4), 3.25, np.float32)
        out = interpolate_pos_embed(pe, 36)
        np.testing.assert_allclose(out, 3.25, rtol=1e-5)


class TestFullBlipConversion:
    def test_tiny_blip_tree_merges(self):
        """Build a torch-style state dict for the tiny BLIPVQA3D and check the
        converted tree merges with twin/scene copies in place."""
        from tests.test_blip import TINY_CFG, tiny_model

        h, inter, v, p = 64, 128, 120, 16

        def lin(rng, i, o):
            return {"weight": rng.rand(o, i).astype(np.float32),
                    "bias": rng.rand(o).astype(np.float32)}

        def ln(rng, d):
            return {"weight": rng.rand(d).astype(np.float32),
                    "bias": rng.rand(d).astype(np.float32)}

        rng = np.random.RandomState(0)
        sd = {}

        def put(prefix, tree):
            for k, val in tree.items():
                if isinstance(val, dict):
                    put(f"{prefix}.{k}", val)
                else:
                    sd[f"{prefix}.{k}"] = val

        # vit (2 blocks, 32x32 img -> 4 patches)
        put("visual_encoder", {
            "cls_token": rng.rand(1, 1, h).astype(np.float32),
            "pos_embed": rng.rand(1, 5, h).astype(np.float32),
            "patch_embed.proj": {"weight": rng.rand(h, 3, p, p).astype(np.float32),
                                 "bias": rng.rand(h).astype(np.float32)},
            "norm": ln(rng, h),
        })
        for i in range(2):
            put(f"visual_encoder.blocks.{i}", {
                "norm1": ln(rng, h), "norm2": ln(rng, h),
                "attn": {"qkv": lin(rng, h, 3 * h), "proj": lin(rng, h, h)},
                "mlp": {"fc1": lin(rng, h, 4 * h), "fc2": lin(rng, 4 * h, h)},
            })

        def bert_layer(cross=True):
            layer = {
                "attention": {"self": {"query": lin(rng, h, h), "key": lin(rng, h, h),
                                       "value": lin(rng, h, h)},
                              "output": {"dense": lin(rng, h, h), "LayerNorm": ln(rng, h)}},
                "intermediate": {"dense": lin(rng, h, inter)},
                "output": {"dense": lin(rng, inter, h), "LayerNorm": ln(rng, h)},
            }
            if cross:
                layer["crossattention"] = {
                    "self": {"query": lin(rng, h, h), "key": lin(rng, h, h),
                             "value": lin(rng, h, h)},
                    "output": {"dense": lin(rng, h, h), "LayerNorm": ln(rng, h)}}
            return layer

        def embeddings():
            return {
                "word_embeddings": {"weight": rng.rand(v, h).astype(np.float32)},
                "position_embeddings": {"weight": rng.rand(64, h).astype(np.float32)},
                "token_type_embeddings": {"weight": rng.rand(2, h).astype(np.float32)},
                "LayerNorm": ln(rng, h),
            }

        put("text_encoder.embeddings", embeddings())
        for i in range(2):
            put(f"text_encoder.encoder.layer.{i}", bert_layer())
        put("text_decoder.bert.embeddings", embeddings())
        for i in range(2):
            put(f"text_decoder.bert.encoder.layer.{i}", bert_layer())
        put("text_decoder.cls.predictions", {
            "transform": {"dense": lin(rng, h, h), "LayerNorm": ln(rng, h)},
            "bias": rng.rand(v).astype(np.float32),
        })

        converted = convert_blip_vqa(sd, image_size=32, vocab_size=120)

        # twin copies present and equal to the main layers
        np.testing.assert_array_equal(
            converted["text_encoder"]["encoder"]["layer_twin_0"]["attention"]["self"]["query"]["kernel"],
            converted["text_encoder"]["encoder"]["layer_0"]["attention"]["self"]["query"]["kernel"])
        # scene decoder mirrors the 2D decoder
        np.testing.assert_array_equal(
            converted["text_decoder_scene"]["cls"]["bias"], converted["text_decoder"]["cls"]["bias"])

        model = tiny_model()
        rng2 = np.random.RandomState(1)
        b, lq, la, n_obj = 1, 6, 4, 4
        args = (jnp.asarray(rng2.rand(b, 32, 32, 3), jnp.float32),
                jnp.ones((b, lq), jnp.int32), jnp.ones((b, lq), jnp.int32),
                jnp.ones((b, la), jnp.int32), jnp.ones((b, la), jnp.int32),
                jnp.asarray(rng2.rand(b, n_obj, 16), jnp.float32), jnp.ones((b, n_obj), jnp.int32))
        variables = model.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
                               *args, train=False)
        merged, loaded, skipped = merge_pretrained(variables["params"], converted)
        assert not skipped, skipped
        assert len(loaded) > 100

        loss, fused, _ = model.apply({"params": merged}, *args, train=False)
        assert np.isfinite(float(loss))
        assert np.isfinite(np.asarray(fused)).all()
