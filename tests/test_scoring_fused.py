"""Fused answer-scoring path (Pallas megakernel + streaming vocab loss) vs
the XLA module path.

The fused path (``ops/scoring_layer.py`` + ``ops/vocab_loss.py``) replaces
the rank-answer full-scoring decoder call (reference
``models/blip_vqa_3d.py:543-560``). These tests pin, in Pallas interpret
mode on CPU:

- bitwise-level (f32 ~1e-6) agreement of the per-sequence loss with the
  module path, including right-padded answers (the fused kernel drops the
  answer padding mask — valid for right padding, asserted here) and padded
  question masks;
- the streaming vocab-loss reductions against the logsumexp-form reference;
- that ``BLIPVQA3D.rank`` produces identical top answers with the fused
  path forced vs off.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bridgeqa_tpu.models.med import (
    BertLMHeadModel,
    MedConfig,
    _label_smoothed_from_shifted,
)
from bridgeqa_tpu.ops.scoring_layer import _pick_group, fused_scoring_capable
from bridgeqa_tpu.ops.vocab_loss import label_smoothed_loss_streaming

CFG = MedConfig(vocab_size=97, hidden_size=128, num_hidden_layers=2,
                num_attention_heads=2, intermediate_size=256,
                encoder_width=128, fused_scoring="off")


def _setup(rng, q=2, g=8, la=4, lq=5, h=128, full_mask=False):
    ids = rng.randint(1, 90, (q * g, la))
    if full_mask:
        mask = np.ones((q * g, la), np.int32)
    else:
        lens = rng.randint(2, la + 1, q * g)
        mask = (np.arange(la)[None, :] < lens[:, None]).astype(np.int32)
    ids = np.where(mask > 0, ids, 0)
    labels = np.where(ids == 0, -100, ids)
    qs = rng.randn(q, lq, h).astype(np.float32)
    qlens = rng.randint(2, lq + 1, q)
    qmask = (np.arange(lq)[None, :] < qlens[:, None]).astype(np.int32)
    return (jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(labels),
            jnp.asarray(qs), jnp.asarray(qmask))


class TestFusedScoringLoss:
    def _models(self):
        off = BertLMHeadModel(CFG)
        on = BertLMHeadModel(dataclasses.replace(CFG, fused_scoring="force"))
        return off, on

    def _variables(self, model, ids, mask, qs, qmask, labels):
        return model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            ids, mask, qs, qmask, labels=labels, deterministic=True)

    @pytest.mark.parametrize("full_mask", [True, False])
    def test_matches_module_path(self, rng, full_mask):
        ids, mask, labels, qs, qmask = _setup(rng, full_mask=full_mask)
        off, on = self._models()
        variables = self._variables(off, ids, mask, qs, qmask, labels)
        _, loss_off = off.apply(variables, ids, mask, qs, qmask,
                                labels=labels, deterministic=True)
        _, loss_on = on.apply(variables, ids, mask, qs, qmask,
                              labels=labels, deterministic=True)
        np.testing.assert_allclose(np.asarray(loss_on), np.asarray(loss_off),
                                   rtol=2e-5, atol=2e-5)

    def test_matches_chunked_path(self, rng):
        ids, mask, labels, qs, qmask = _setup(rng)
        off, on = self._models()
        variables = self._variables(off, ids, mask, qs, qmask, labels)
        _, loss_off = off.apply(variables, ids, mask, qs, qmask, labels=labels,
                                deterministic=True, loss_chunk_size=4)
        _, loss_on = on.apply(variables, ids, mask, qs, qmask, labels=labels,
                              deterministic=True, loss_chunk_size=4)
        np.testing.assert_allclose(np.asarray(loss_on), np.asarray(loss_off),
                                   rtol=2e-5, atol=2e-5)

    def test_fallbacks(self, rng):
        """Non-grouped shapes, train mode, and missing labels all take the
        module path (fused returns None) without error."""
        ids, mask, labels, qs, qmask = _setup(rng, q=2, g=1)
        off, on = self._models()
        variables = self._variables(off, ids, mask, qs, qmask, labels)
        _, loss_off = off.apply(variables, ids, mask, qs, qmask,
                                labels=labels, deterministic=True)
        _, loss_on = on.apply(variables, ids, mask, qs, qmask,
                              labels=labels, deterministic=True)
        np.testing.assert_allclose(np.asarray(loss_on), np.asarray(loss_off),
                                   rtol=1e-6)

    def test_capability_gate(self):
        assert fused_scoring_capable(CFG, 16, 2, 4, 128, jnp.float32)
        assert not fused_scoring_capable(CFG, 16, 16, 4, 128, jnp.float32)  # g=1
        assert not fused_scoring_capable(CFG, 15, 2, 4, 128, jnp.float32)  # ragged
        assert not fused_scoring_capable(CFG, 16, 2, 4, 96, jnp.float32)  # H%128
        # production shape: g=256, La=12, bf16 -> G=16 (192-row blocks,
        # the measured optimum — see ROW_CAP note in scoring_layer.py)
        assert _pick_group(256, 12, jnp.bfloat16) == 16


class TestStreamingVocabLoss:
    def test_matches_reference_form(self, rng):
        b, lm1, h, v = 6, 5, 64, 203
        hs = jnp.asarray(rng.randn(b, lm1, h), jnp.float32)
        table = jnp.asarray(rng.randn(v, h) * 0.3, jnp.float32)
        bias = jnp.asarray(rng.randn(v) * 0.1, jnp.float32)
        labels = rng.randint(0, v, (b, lm1))
        labels[0, 2:] = -100
        labels[3, :1] = -100
        labels = jnp.asarray(labels)

        logits = jnp.einsum("blh,vh->blv", hs, table) + bias
        ref = _label_smoothed_from_shifted(logits, labels)
        got = label_smoothed_loss_streaming(hs, labels, table, bias,
                                            interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_padded_vocab_and_rows(self, rng):
        """Row/vocab padding inside the kernel must not leak into the
        reductions (vocab 203 pads to 1024, rows pad to 2048)."""
        b, lm1, h, v = 2, 3, 64, 203
        hs = jnp.asarray(rng.randn(b, lm1, h) * 3.0, jnp.float32)
        table = jnp.asarray(rng.randn(v, h), jnp.float32)
        bias = jnp.zeros((v,), jnp.float32)
        labels = jnp.asarray(rng.randint(0, v, (b, lm1)))
        logits = jnp.einsum("blh,vh->blv", hs, table) + bias
        ref = _label_smoothed_from_shifted(logits, labels)
        got = label_smoothed_loss_streaming(hs, labels, table, bias,
                                            interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


class TestFusedRankEquivalence:
    def test_rank_same_answers(self, rng):
        """BLIPVQA3D.rank end-to-end: fused vs module path pick identical
        top answers and near-identical ensemble scores."""
        from bridgeqa_tpu.models.blip_vqa3d import BLIPVQA3D, BlipVQA3DConfig

        med = dataclasses.replace(CFG, fused_scoring="off")
        base = BlipVQA3DConfig(
            med=med, image_size=32, vit="custom", vit_custom_embed_dim=128,
            vit_custom_depth=1, vit_custom_heads=2, scene_size=16,
            num_answers=40, rank_loss_chunk_size=None)
        m_off = BLIPVQA3D(base)
        m_on = BLIPVQA3D(dataclasses.replace(
            base, med=dataclasses.replace(med, fused_scoring="force")))

        b, lq, la, k, num_obj = 2, 5, 4, 8, 3
        image = jnp.asarray(rng.rand(b, 32, 32, 3), jnp.float32)
        q_ids = jnp.asarray(rng.randint(1, 90, (b, lq)))
        q_mask = jnp.ones((b, lq), jnp.int32)
        ans_ids = np.concatenate(
            [np.full((40, 1), 95), rng.randint(1, 90, (40, la - 1))], axis=1)
        ans_mask = np.ones((40, la), np.int32)
        scene = jnp.asarray(rng.randn(b, num_obj, 16), jnp.float32)
        scene_mask = jnp.ones((b, num_obj), jnp.int32)

        variables = m_off.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            image, q_ids, q_mask, jnp.asarray(ans_ids)[:b], jnp.asarray(ans_mask)[:b],
            scene, scene_mask, train=True)

        def rank(m):
            return m.apply(variables, image, q_ids, q_mask,
                           jnp.asarray(ans_ids), jnp.asarray(ans_mask),
                           scene, scene_mask, k_test=k, method=m.rank)

        _, s_off, _ = rank(m_off)
        _, s_on, _ = rank(m_on)
        np.testing.assert_array_equal(
            np.argmax(np.asarray(s_off["answer_scores"]), axis=1),
            np.argmax(np.asarray(s_on["answer_scores"]), axis=1))
        np.testing.assert_allclose(np.asarray(s_on["answer_scores_2d"]),
                                   np.asarray(s_off["answer_scores_2d"]),
                                   rtol=1e-4, atol=1e-4)
