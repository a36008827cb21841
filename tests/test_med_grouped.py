"""Grouped cross-attention equivalence: scoring k answers against one
question with shared K/V must match the explicit per-answer repeat."""

import jax
import jax.numpy as jnp
import numpy as np

from bridgeqa_tpu.models.med import BertLMHeadModel, MedConfig

CFG = MedConfig(vocab_size=120, hidden_size=64, num_hidden_layers=2,
                num_attention_heads=4, intermediate_size=128,
                max_position_embeddings=64, encoder_width=64,
                hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)


def test_grouped_cross_attention_matches_repeat():
    rng = np.random.RandomState(0)
    b, k, la, lq = 2, 3, 6, 10
    dec = BertLMHeadModel(CFG)

    ids = jnp.asarray(rng.randint(1, 100, (b * k, la)))
    mask = jnp.ones((b * k, la), jnp.int32)
    qs = jnp.asarray(rng.rand(b, lq, 64), jnp.float32)
    qm = jnp.asarray((np.arange(lq)[None] < np.array([[7], [10]])).astype(np.int32))
    labels = jnp.where(ids == 0, -100, ids)

    variables = dec.init(jax.random.PRNGKey(0), ids, mask, qs, qm, deterministic=True)

    logits_grouped, loss_grouped = dec.apply(variables, ids, mask, qs, qm,
                                             labels=labels, deterministic=True)
    qs_rep = jnp.repeat(qs, k, axis=0)
    qm_rep = jnp.repeat(qm, k, axis=0)
    logits_rep, loss_rep = dec.apply(variables, ids, mask, qs_rep, qm_rep,
                                     labels=labels, deterministic=True)

    np.testing.assert_allclose(np.asarray(logits_grouped), np.asarray(logits_rep),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(loss_grouped), np.asarray(loss_rep),
                               rtol=2e-5, atol=2e-5)
