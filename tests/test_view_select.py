"""View-selection subsystem tests: BLIP-ITM heads, declaration composer,
ranking pipeline, i2tfile round-trip into the data pipeline."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bridgeqa_tpu.models.blip_itm import BLIPITM, BlipITMConfig
from bridgeqa_tpu.models.med import MedConfig
from bridgeqa_tpu.tools.compose_decl import RuleBasedComposer, compose_declarations
from bridgeqa_tpu.tools.view_select import save_i2tfile, select_best_views

TINY_MED = MedConfig(vocab_size=120, hidden_size=64, num_hidden_layers=2,
                     num_attention_heads=4, intermediate_size=128,
                     max_position_embeddings=64, encoder_width=64)
TINY_ITM = BlipITMConfig(med=TINY_MED, image_size=32, vit="custom", embed_dim=32,
                         vit_custom_embed_dim=64, vit_custom_depth=2, vit_custom_heads=4)


@pytest.fixture(scope="module")
def itm():
    model = BLIPITM(TINY_ITM)
    ids = np.ones((2, 8), np.int32)
    img = np.zeros((2, 32, 32, 3), np.float32)
    variables = model.init(jax.random.PRNGKey(0), img, ids, ids, method=model.init_all)
    return model, variables


class TestBlipITM:
    def test_itc_features_normalized(self, itm, rng):
        model, variables = itm
        images = jnp.asarray(rng.rand(3, 32, 32, 3), jnp.float32)
        feats = model.apply(variables, images, method=model.encode_images)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(feats), axis=-1), 1.0, rtol=1e-5)

    def test_itc_scores_shape_and_range(self, itm, rng):
        model, variables = itm
        images = jnp.asarray(rng.rand(4, 32, 32, 3), jnp.float32)
        ids = jnp.asarray(rng.randint(1, 100, (3, 8)))
        mask = jnp.ones((3, 8), jnp.int32)
        sims = np.asarray(model.apply(variables, images, ids, mask))
        assert sims.shape == (3, 4)
        assert (np.abs(sims) <= 1.0 + 1e-5).all()

    def test_itm_head_shape(self, itm, rng):
        model, variables = itm
        images = jnp.asarray(rng.rand(2, 32, 32, 3), jnp.float32)
        ids = jnp.asarray(rng.randint(1, 100, (2, 8)))
        mask = jnp.ones((2, 8), jnp.int32)
        logits = np.asarray(model.apply(variables, images, ids, mask, match_head="itm"))
        assert logits.shape == (2, 2)
        assert np.isfinite(logits).all()


class TestComposer:
    def test_templates(self):
        c = RuleBasedComposer()
        assert c("What color is the chair?", "brown") == "the brown chair"
        assert c("How many doors are there?", "two") == "two doors"
        assert c("Where is the table?", "next to the wall") == "the table next to the wall"

    def test_fallback_keeps_content_words(self):
        c = RuleBasedComposer()
        out = c("Does the weird contraption spin?", "yes")
        assert "contraption" in out

    def test_compose_resumable(self, tmp_path):
        records = [{"question_id": f"q{i}", "question": "What color is the chair?",
                    "answers": ["brown"]} for i in range(3)]
        out = str(tmp_path / "decl.json")
        d1 = compose_declarations(records, out)
        assert len(d1) == 3
        # resume: add a record, existing entries are not recomputed
        records.append({"question_id": "q3", "question": "Where is the desk?",
                        "answers": ["by the window"]})
        d2 = compose_declarations(records, out)
        assert len(d2) == 4 and d2["q0"] == d1["q0"]


class TestViewSelection:
    def test_ranking_pipeline_and_roundtrip(self, itm, tmp_path):
        from scripts.common import synthetic_records, synthetic_tokenizer

        model, variables = itm
        records = synthetic_records(6, num_scenes=2)
        tokenizer = synthetic_tokenizer()

        def load_frames(scene_id):
            r = np.random.RandomState(abs(hash(scene_id)) % (2 ** 31))
            return [f"{i}.jpg" for i in range(5)], r.rand(5, 32, 32, 3).astype(np.float32)

        i2t = select_best_views(model, variables, records, tokenizer, load_frames,
                                image_batch=4, text_batch=4, text_len=12)
        assert len(i2t["view"]) == 6
        for qid, views in i2t["view"].items():
            assert len(views) == 5
            scores = i2t["itm_scores"][qid]
            assert (np.diff(scores) <= 1e-6).all()  # best-first

        # round-trip through the data-pipeline loader
        from bridgeqa_tpu.data.views import load_scene_view_map

        path = str(tmp_path / "i2t.json")
        save_i2tfile(i2t, path)
        loaded = load_scene_view_map(path)
        assert loaded[next(iter(i2t["view"]))] == i2t["view"][next(iter(i2t["view"]))]
