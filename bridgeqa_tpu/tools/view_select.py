"""Question-conditional view selection (the i2tfile producer).

Equivalent of ``eval_scene_best_views.py`` (ITC mode, 248-298): for every
scene, encode all of its frames with the BLIP-ITM image tower, encode each
question's declarative rewrite with the text tower, rank frames by cosine
similarity, and persist ``{"view": qid -> [frame names best-first],
"itm_scores": qid -> scores}`` — the mapping consumed at train/test time
(``lib/dataset.py:333-349`` via ``data.views.load_scene_view_map``).

TPU-first: frames are encoded once per scene in fixed-size padded batches
under jit and reused across that scene's questions (the reference
re-batched on host per question group and ran DataParallel over GPUs;
here one jitted program per batch shape serves every scene).
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np


def _pad_batch(arr, batch: int):
    """Pad leading dim up to a multiple of ``batch`` (static shapes for jit)."""
    n = arr.shape[0]
    pad = (-n) % batch
    if pad:
        arr = np.concatenate([arr, np.repeat(arr[-1:], pad, axis=0)], axis=0)
    return arr, n


def make_encoders(model, variables):
    """Jitted fixed-shape image/text encoder closures."""

    @jax.jit
    def enc_images(images):
        return model.apply(variables, images, method=model.encode_images)

    @jax.jit
    def enc_texts(ids, mask):
        return model.apply(variables, ids, mask, method=model.encode_texts)

    return enc_images, enc_texts


def encode_in_batches(encode_fn, arrays, batch: int):
    """Apply a jitted encoder over padded fixed-size batches; returns (N, D)."""
    padded, n = _pad_batch(arrays[0], batch)
    rest = [_pad_batch(a, batch)[0] for a in arrays[1:]]
    outs = []
    for i in range(0, padded.shape[0], batch):
        chunk = [padded[i:i + batch]] + [r[i:i + batch] for r in rest]
        outs.append(np.asarray(encode_fn(*[jnp.asarray(c) for c in chunk])))
    return np.concatenate(outs)[:n]


def select_best_views(model, variables, records, tokenizer, load_scene_frames,
                      *, decl_map=None, image_batch: int = 64, text_batch: int = 64,
                      text_len: int = 40):
    """records: ScanQA question records. load_scene_frames(scene_id) ->
    (frame_names list, images (N, H, W, 3) float32). decl_map: optional
    question_id -> declarative sentence (the LLM rewrite); falls back to the
    raw question like the reference's no-decl path.

    Returns the i2t dict {"view": ..., "itm_scores": ...}.
    """
    enc_images, enc_texts = make_encoders(model, variables)

    by_scene = {}
    for rec in records:
        by_scene.setdefault(rec["scene_id"], []).append(rec)

    view_map, score_map = {}, {}
    for scene_id, recs in by_scene.items():
        names, images = load_scene_frames(scene_id)
        img_feat = encode_in_batches(enc_images, [images.astype(np.float32)], image_batch)

        texts = []
        for rec in recs:
            qid = str(rec["question_id"])
            texts.append((decl_map or {}).get(qid, rec["question"]))
        ids, mask = tokenizer.encode_batch(texts, text_len)
        txt_feat = encode_in_batches(lambda i, m: enc_texts(i, m), [ids, mask], text_batch)

        sims = txt_feat @ img_feat.T  # (num_questions, num_frames)
        order = np.argsort(-sims, axis=1)
        for r, rec in enumerate(recs):
            qid = str(rec["question_id"])
            view_map[qid] = [names[j] for j in order[r]]
            score_map[qid] = sims[r, order[r]].tolist()
    return {"view": view_map, "itm_scores": score_map}


def save_i2tfile(i2t, path):
    """Persist as .json (our loader's native format) or pickle."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    if str(path).endswith(".json"):
        with open(path, "w") as f:
            json.dump(i2t, f)
    else:
        import pickle

        with open(path, "wb") as f:
            pickle.dump(i2t, f)
