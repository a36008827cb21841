"""Beam-search generation tests: exact small-case checks of the search
itself + end-to-end generate through the tiny BLIP model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bridgeqa_tpu.models.generation import beam_search, generate_answers, interleave_streams

BOS, EOS, PAD = 5, 4, 0
V = 6


@pytest.fixture(scope="module")
def tiny_blip_model_and_inputs():
    from tests.test_blip import tiny_model

    model = tiny_model()
    rng = np.random.RandomState(0)
    b, lq, la, n_obj = 2, 10, 6, 8
    inputs = dict(
        image=jnp.asarray(rng.rand(b, 32, 32, 3), jnp.float32),
        question_ids=jnp.asarray(rng.randint(1, 100, (b, lq))),
        question_mask=jnp.ones((b, lq), jnp.int32),
        answer_ids=jnp.asarray(rng.randint(1, 100, (b, la))),
        answer_mask=jnp.ones((b, la), jnp.int32),
        scene_object_embeds=jnp.asarray(rng.rand(b, n_obj, 16), jnp.float32),
        scene_object_mask=jnp.ones((b, n_obj), jnp.int32),
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        inputs["image"], inputs["question_ids"], inputs["question_mask"],
        inputs["answer_ids"], inputs["answer_mask"],
        inputs["scene_object_embeds"], inputs["scene_object_mask"], train=False,
    )
    return model, variables, inputs


class TestBeamSearchExact:
    def test_greedy_path_when_logits_static(self):
        # next-token logits independent of prefix: best beam = repeated argmax
        logits_row = np.array([0.0, 3.0, 2.0, 1.0, -5.0, -5.0], np.float32)

        def decode_fn(flat_ids, flat_mask):
            b, l = flat_ids.shape
            return jnp.broadcast_to(jnp.asarray(logits_row), (b, l, V))

        ids, scores = beam_search(decode_fn, batch_size=2, num_beams=3,
                                  bos_token_id=BOS, eos_token_id=EOS, pad_token_id=PAD,
                                  max_length=4, min_length=1)
        ids = np.asarray(ids)
        assert ids.shape == (2, 3, 4)
        np.testing.assert_array_equal(ids[:, 0], [[BOS, 1, 1, 1]] * 2)
        # scores sorted best-first
        s = np.asarray(scores)
        assert (np.diff(s, axis=1) <= 1e-5).all()
        # best score == 3 * log_softmax[1]
        expect = 3 * (logits_row[1] - np.log(np.exp(logits_row).sum()))
        np.testing.assert_allclose(s[:, 0], expect, rtol=1e-5)

    def test_eos_freezes_beam(self):
        # eos is the argmax -> beam finishes at t=1 and pads afterwards
        logits_row = np.array([0.0, 1.0, 0.5, 0.0, 5.0, -5.0], np.float32)

        def decode_fn(flat_ids, flat_mask):
            b, l = flat_ids.shape
            return jnp.broadcast_to(jnp.asarray(logits_row), (b, l, V))

        ids, scores = beam_search(decode_fn, batch_size=1, num_beams=2,
                                  bos_token_id=BOS, eos_token_id=EOS, pad_token_id=PAD,
                                  max_length=5, min_length=1)
        ids = np.asarray(ids)
        np.testing.assert_array_equal(ids[0, 0], [BOS, EOS, PAD, PAD, PAD])
        # frozen score = one-step eos logp
        expect = logits_row[4] - np.log(np.exp(logits_row).sum())
        np.testing.assert_allclose(np.asarray(scores)[0, 0], expect, rtol=1e-5)

    def test_min_length_blocks_eos(self):
        logits_row = np.array([0.0, 1.0, 0.5, 0.0, 5.0, -5.0], np.float32)

        def decode_fn(flat_ids, flat_mask):
            b, l = flat_ids.shape
            return jnp.broadcast_to(jnp.asarray(logits_row), (b, l, V))

        ids, _ = beam_search(decode_fn, batch_size=1, num_beams=2,
                             bos_token_id=BOS, eos_token_id=EOS, pad_token_id=PAD,
                             max_length=4, min_length=2)
        ids = np.asarray(ids)
        assert ids[0, 0, 1] != EOS  # first generated token can't be eos
        assert ids[0, 0, 2] == EOS  # allowed from t=2

    def test_prefix_dependent_beats_greedy(self):
        # token 2 then token 1 scores higher than greedy 1-then-x:
        # p(1|bos) slightly higher, but p(anything|1) is flat/low while
        # p(1|2) is huge -> beam search must keep the "2" beam.
        def decode_fn(flat_ids, flat_mask):
            b, l = flat_ids.shape
            base = jnp.full((b, l, V), 0.0)
            last_is_2 = flat_ids == 2
            # if previous token was 2, token 1 has logit 10
            bonus = jnp.where(last_is_2[:, :, None] & (jnp.arange(V) == 1)[None, None, :], 10.0, 0.0)
            start = jnp.where((flat_ids == BOS)[:, :, None] & (jnp.arange(V) == 1)[None, None, :], 0.5, 0.0)
            return base + bonus + start

        ids, _ = beam_search(decode_fn, batch_size=1, num_beams=3,
                             bos_token_id=BOS, eos_token_id=EOS, pad_token_id=PAD,
                             max_length=3, min_length=1)
        np.testing.assert_array_equal(np.asarray(ids)[0, 0], [BOS, 2, 1])


class TestInterleave:
    def test_ordering(self):
        h2d = jnp.arange(4, dtype=jnp.float32).reshape(2, 1, 2)  # B=2
        h3d = h2d + 100
        out = np.asarray(interleave_streams(h2d, h3d, num_beams=2)).reshape(2, 4, 2)
        # per sample: [2d, 2d, 3d, 3d]
        np.testing.assert_array_equal(out[0, 0], out[0, 1])
        np.testing.assert_array_equal(out[0, 2], out[0, 3])
        assert (out[0, 2] - out[0, 0] == 100).all()


class TestBlipGenerate:
    def test_generate_shapes(self, tiny_blip_model_and_inputs):
        model, variables, inputs = tiny_blip_model_and_inputs

        ids, fused, qmask = model.apply(
            variables, inputs["image"], inputs["question_ids"], inputs["question_mask"],
            inputs["scene_object_embeds"], inputs["scene_object_mask"],
            num_beams=2, max_length=6, method=model.generate,
        )
        b = inputs["image"].shape[0]
        ids = np.asarray(ids)
        assert ids.shape == (b, 6)
        assert (ids[:, 0] == model.cfg.bos_token_id).all()
        assert np.isfinite(np.asarray(fused)).all()


class TestKVCacheParity:
    """The cached decode path must reproduce the re-run path exactly when all
    beam rows of a sample share one encoder stream (the only case where the
    two reordering semantics coincide — see beam_search_cached docstring)."""

    def _decoder(self):
        from bridgeqa_tpu.models.med import BertLMHeadModel, MedConfig

        cfg = MedConfig(vocab_size=40, hidden_size=32, num_hidden_layers=2,
                        num_attention_heads=4, intermediate_size=64,
                        max_position_embeddings=32, encoder_width=32)
        m = BertLMHeadModel(cfg)
        rng = np.random.RandomState(1)
        B, K, LQ = 2, 4, 5
        q_states = jnp.asarray(np.repeat(rng.rand(B, LQ, 32).astype(np.float32), K, axis=0))
        q_mask = np.ones((B, LQ), np.int64)
        q_mask[1, 3:] = 0  # ragged question
        q_mask = jnp.asarray(np.repeat(q_mask, K, axis=0))
        ids = jnp.asarray(rng.randint(1, 40, (B * K, 3)))
        v = m.init(jax.random.PRNGKey(0), ids, jnp.ones_like(ids), q_states, q_mask,
                   deterministic=True)
        return m, v, q_states, q_mask, B, K

    def test_cached_equals_uncached_single_stream(self):
        from bridgeqa_tpu.models.generation import beam_search, beam_search_cached

        m, v, q_states, q_mask, B, K = self._decoder()
        ML = 8

        def decode_fn(flat_ids, flat_mask):
            logits, _ = m.apply(v, flat_ids, flat_mask, q_states, q_mask, deterministic=True)
            return logits

        ids_u, sc_u = beam_search(decode_fn, B, K, bos_token_id=30, eos_token_id=4,
                                  pad_token_id=0, max_length=ML, min_length=2)

        cache = m.apply(v, q_states, q_mask, ML, method="init_cache")

        def decode_step_fn(tok, c):
            return m.apply(v, tok, c, method="decode_step")

        ids_c, sc_c = beam_search_cached(decode_step_fn, cache, B, K, bos_token_id=30,
                                         eos_token_id=4, pad_token_id=0, max_length=ML,
                                         min_length=2)
        np.testing.assert_array_equal(np.asarray(ids_u), np.asarray(ids_c))
        np.testing.assert_allclose(np.asarray(sc_u), np.asarray(sc_c), rtol=2e-5, atol=2e-5)

    def test_generate_kv_cache_shapes(self, tiny_blip_model_and_inputs):
        model, variables, inputs = tiny_blip_model_and_inputs
        best_ids, fused, qmask = model.apply(
            variables, inputs["image"], inputs["question_ids"], inputs["question_mask"],
            inputs["scene_object_embeds"], inputs["scene_object_mask"],
            num_beams=2, max_length=6, method="generate",
        )
        assert best_ids.shape == (2, 6)
        assert np.isfinite(np.asarray(fused, np.float32)).all()
