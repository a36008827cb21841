"""Jittable beam-search generation for the answer decoders.

Equivalent of the reference's open-ended answer path
(``models/blip_vqa_3d.py:394-416``): HF ``generate`` with
``num_beams * 2`` beams per question, where half the beams cross-attend to
the 2D question states and half to the 3D ones (``concat_repeat``), all
competing in one beam pool; eos = [SEP], max_length 20.

TPU-first design: a static-shape ``lax.fori_loop`` beam search. Each step
re-runs the (<=20-token) prefix through the decoder instead of maintaining a
KV cache — at BridgeQA answer lengths the cross-attention to the 80-token
question dominates, and a static prefix keeps the whole search in ONE
compiled program (the HF loop re-dispatched per token from host).
Finished beams are frozen: they emit ``pad`` with probability 1 so their
score stops changing, mirroring HF's finished-hypothesis handling for the
short-answer regime (no length penalty, like the reference call).
"""

from functools import partial

import jax
import jax.numpy as jnp

NEG_INF = -1.0e9


def interleave_streams(h2d, h3d, num_beams: int):
    """``concat_repeat`` (``blip_vqa_3d.py:424-435``): per sample, the beam
    pool's encoder states are [h2d x num_beams, h3d x num_beams].

    h2d/h3d: (B, Lq, H) -> (B * 2 * num_beams, Lq, H).
    """
    b = h2d.shape[0]
    stacked = jnp.stack([h2d, h3d], axis=1)  # (B, 2, Lq, H)
    rep = jnp.repeat(stacked, num_beams, axis=1)  # (B, 2*nb, Lq, H)
    return rep.reshape(b * 2 * num_beams, *h2d.shape[1:])


def beam_search(decode_fn, batch_size: int, num_beams: int, *, bos_token_id: int,
                eos_token_id: int, pad_token_id: int, max_length: int = 20,
                min_length: int = 1, vocab_size: int | None = None):
    """Static-shape beam search.

    decode_fn(flat_ids (B*K, L), flat_mask (B*K, L)) -> logits (B*K, L, V);
    the function closes over per-beam-row encoder states (so different beams
    of one sample may attend to different streams).

    Returns (sequences (B, K, max_length), scores (B, K)) sorted best-first.
    """
    k = num_beams

    ids0 = jnp.full((batch_size, k, max_length), pad_token_id, dtype=jnp.int32)
    ids0 = ids0.at[:, :, 0].set(bos_token_id)
    # only beam 0 alive at start (all beams identical otherwise)
    scores0 = jnp.tile(jnp.asarray([0.0] + [NEG_INF] * (k - 1), jnp.float32), (batch_size, 1))
    finished0 = jnp.zeros((batch_size, k), dtype=bool)

    def step(t, state):
        ids, scores, finished = state
        flat_ids = ids.reshape(batch_size * k, max_length)
        flat_mask = (jnp.arange(max_length)[None, :] <= t).astype(jnp.int32)
        flat_mask = jnp.broadcast_to(flat_mask, flat_ids.shape)
        logits = decode_fn(flat_ids, flat_mask)  # (B*K, L, V)
        v = logits.shape[-1]
        next_logp = jax.nn.log_softmax(
            logits[:, t, :].astype(jnp.float32), axis=-1).reshape(batch_size, k, v)

        # min_length: forbid eos early (HF MinLengthLogitsProcessor; cur_len
        # counts the bos, so at step t the sequence has t+1 tokens)
        next_logp = jnp.where((t + 1 < min_length) & (jnp.arange(v)[None, None, :] == eos_token_id),
                              NEG_INF, next_logp)
        # finished beams: emit pad with logp 0, everything else impossible
        frozen = jnp.where(jnp.arange(v)[None, None, :] == pad_token_id, 0.0, NEG_INF)
        next_logp = jnp.where(finished[..., None], frozen, next_logp)

        cand = scores[..., None] + next_logp  # (B, K, V)
        cand_flat = cand.reshape(batch_size, k * v)
        top_scores, top_idx = jax.lax.top_k(cand_flat, k)  # (B, K)
        beam_idx = top_idx // v
        token_idx = top_idx % v

        new_ids = jnp.take_along_axis(ids, beam_idx[..., None], axis=1)
        new_ids = new_ids.at[:, :, t + 1].set(token_idx)
        new_finished = jnp.take_along_axis(finished, beam_idx, axis=1) | (token_idx == eos_token_id)
        return new_ids, top_scores, new_finished

    ids, scores, finished = jax.lax.fori_loop(0, max_length - 1, step, (ids0, scores0, finished0))

    order = jnp.argsort(-scores, axis=1)
    ids = jnp.take_along_axis(ids, order[..., None], axis=1)
    scores = jnp.take_along_axis(scores, order, axis=1)
    return ids, scores


def beam_search_cached(decode_step_fn, cache, batch_size: int, num_beams: int, *,
                       bos_token_id: int, eos_token_id: int, pad_token_id: int,
                       max_length: int = 20, min_length: int = 1):
    """KV-cached beam search (reference ``med.py:1447-1470`` past_key_value +
    ``_reorder_cache``): O(L) decoder work instead of the O(L^2) re-run path.

    decode_step_fn(token_ids (B*K, 1), cache) -> (logits (B*K, V), new cache);
    ``cache`` rows follow HF semantics — a hypothesis carries its WHOLE state
    (self-attention prefix K/V *and* cross K/V) through beam reordering, so a
    beam born on a 3D-stream row stays 3D wherever it lands. (The uncached
    ``beam_search`` re-interprets moved prefixes under the destination row's
    stream; identical whenever all rows of a sample share one stream.)

    Returns (sequences (B, K, max_length), scores (B, K)) sorted best-first.
    """
    k = num_beams

    ids0 = jnp.full((batch_size, k, max_length), pad_token_id, dtype=jnp.int32)
    ids0 = ids0.at[:, :, 0].set(bos_token_id)
    scores0 = jnp.tile(jnp.asarray([0.0] + [NEG_INF] * (k - 1), jnp.float32), (batch_size, 1))
    finished0 = jnp.zeros((batch_size, k), dtype=bool)

    def gather_cache(cache, beam_idx):
        def gather(x):
            if x.ndim == 0 or x.shape[0] != batch_size * k:
                return x  # pos scalar
            xb = x.reshape(batch_size, k, *x.shape[1:])
            idx = beam_idx.reshape(batch_size, k, *([1] * (x.ndim - 1)))
            xg = jnp.take_along_axis(xb, idx, axis=1)
            return xg.reshape(x.shape)

        return jax.tree.map(gather, cache)

    def step(t, state):
        ids, scores, finished, cache = state
        tok = ids[:, :, t].reshape(batch_size * k, 1)
        logits, cache = decode_step_fn(tok, cache)  # (B*K, V)
        v = logits.shape[-1]
        next_logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1).reshape(batch_size, k, v)

        next_logp = jnp.where((t + 1 < min_length) & (jnp.arange(v)[None, None, :] == eos_token_id),
                              NEG_INF, next_logp)
        frozen = jnp.where(jnp.arange(v)[None, None, :] == pad_token_id, 0.0, NEG_INF)
        next_logp = jnp.where(finished[..., None], frozen, next_logp)

        cand_flat = (scores[..., None] + next_logp).reshape(batch_size, k * v)
        top_scores, top_idx = jax.lax.top_k(cand_flat, k)
        beam_idx = top_idx // v
        token_idx = top_idx % v

        new_ids = jnp.take_along_axis(ids, beam_idx[..., None], axis=1)
        new_ids = new_ids.at[:, :, t + 1].set(token_idx)
        new_finished = jnp.take_along_axis(finished, beam_idx, axis=1) | (token_idx == eos_token_id)
        return new_ids, top_scores, new_finished, gather_cache(cache, beam_idx)

    from bridgeqa_tpu.ops.vma import vary_tree_like

    # carry constants lifted to the cache's varying axes so the loop
    # type-checks under shard_map's vma checker (no-op otherwise)
    ref = jax.tree_util.tree_leaves(cache)[0]
    ids0, scores0, finished0 = vary_tree_like((ids0, scores0, finished0), ref)
    ids, scores, finished, _ = jax.lax.fori_loop(
        0, max_length - 1, step, (ids0, scores0, finished0, cache))

    order = jnp.argsort(-scores, axis=1)
    ids = jnp.take_along_axis(ids, order[..., None], axis=1)
    scores = jnp.take_along_axis(scores, order, axis=1)
    return ids, scores


def generate_answers(decoder_apply, question_states, question_mask, batch_size: int,
                     num_beams: int, *, bos_token_id: int, eos_token_id: int,
                     pad_token_id: int, max_length: int = 20, min_length: int = 1):
    """Run the interleaved-stream beam search and return the best sequence
    per question. question_states: (B * K, Lq, H) per-beam encoder rows
    (K = 2*num_beams when interleaving 2D/3D); question_mask: (B, Lq).

    decoder_apply(ids, mask, enc_states, enc_mask) -> logits.
    Returns (best_ids (B, max_length), best_scores (B,)).
    """
    k = question_states.shape[0] // batch_size
    q_mask = jnp.repeat(question_mask, k, axis=0)

    def decode_fn(flat_ids, flat_mask):
        return decoder_apply(flat_ids, flat_mask, question_states, q_mask)

    ids, scores = beam_search(
        decode_fn, batch_size, k, bos_token_id=bos_token_id, eos_token_id=eos_token_id,
        pad_token_id=pad_token_id, max_length=max_length, min_length=min_length,
    )
    return ids[:, 0], scores[:, 0]
