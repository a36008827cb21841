"""Orbax checkpointing: best / last / resumable train state.

Replaces the reference's three torch artifacts (``lib/solver.py:659-695``):
``model.pth`` (best params), ``model_last.pth`` (per-epoch params), and
``checkpoint.tar`` ({epoch, model, optimizer} for ``--use_checkpoint``
resume, ``scripts/train.py:443-449``) — plus the run metadata files
(``info.json``, ``answer_vocab.json``).
"""

import json
import os

import jax
import numpy as np
import orbax.checkpoint as ocp


def _path(run_dir, name):
    return os.path.join(os.path.abspath(run_dir), name)


def save_params(run_dir, name, params, batch_stats=None):
    """Save params(+batch_stats) — the ``model.pth``/``model_last.pth`` unit."""
    ckptr = ocp.PyTreeCheckpointer()
    payload = {"params": params}
    if batch_stats is not None:
        payload["batch_stats"] = batch_stats
    ckptr.save(_path(run_dir, name), payload, force=True)


def load_params(run_dir, name):
    ckptr = ocp.PyTreeCheckpointer()
    return ckptr.restore(_path(run_dir, name))


def save_train_state(run_dir, state, epoch: int, name="checkpoint"):
    """Full resumable state — the ``checkpoint.tar`` unit."""
    ckptr = ocp.PyTreeCheckpointer()
    payload = {
        "epoch": np.int32(epoch),
        "state": jax.device_get(state),
    }
    ckptr.save(_path(run_dir, name), payload, force=True)


def load_train_state(run_dir, template_state, name="checkpoint"):
    """Restore (state, epoch); template_state supplies the pytree structure."""
    ckptr = ocp.PyTreeCheckpointer()
    template = {"epoch": np.int32(0), "state": jax.device_get(template_state)}
    restored = ckptr.restore(_path(run_dir, name), item=template)
    return restored["state"], int(restored["epoch"])


def save_run_info(run_dir, info: dict, name="info.json"):
    """``info.json`` replayed by predict/eval (``utils/misc.py:38``)."""
    os.makedirs(run_dir, exist_ok=True)
    with open(os.path.join(run_dir, name), "w") as f:
        json.dump(info, f, indent=2, default=str)


def load_run_info(run_dir, name="info.json"):
    with open(os.path.join(run_dir, name)) as f:
        return json.load(f)


def save_answer_vocab(run_dir, answer_cands, answer_counter=None):
    with open(os.path.join(run_dir, "answer_vocab.json"), "w") as f:
        json.dump({"answer_cands": list(answer_cands),
                   "answer_counter": answer_counter or {}}, f)


def load_answer_vocab(run_dir):
    with open(os.path.join(run_dir, "answer_vocab.json")) as f:
        d = json.load(f)
    return d["answer_cands"], d.get("answer_counter", {})
