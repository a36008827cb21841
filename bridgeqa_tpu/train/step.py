"""Jitted train/eval steps with in-graph loss + metric computation.

Replaces the reference ``Solver._forward/_compute_loss/_backward/_eval``
sequence (``lib/solver.py:377-411``) — which round-tripped to host for box
decoding, IoU and metric all-reduces every iteration — with one fused,
sharded XLA program per step.
"""

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from bridgeqa_tpu.losses import get_loss
from bridgeqa_tpu.train.optim import OptimConfig, build_optimizer


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any

    @classmethod
    def create(cls, variables, tx):
        params = variables["params"]
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(params),
        )


@dataclasses.dataclass(frozen=True)
class StepConfig:
    detection: bool = True
    use_reference: bool = True
    use_lang_classifier: bool = True
    use_answer: bool = True
    loss_weights: Any = None


def train_body(model, dataset_config, tx, step_cfg: StepConfig,
               state: TrainState, batch, dropout_rng, bn_momentum):
    """Unjitted train step body: forward + loss + grads + optimizer update.
    Shared by the jitted production step (:func:`make_train_step`) and the
    in-graph throughput harness in ``bench.py`` (which scans it to amortize
    the dispatch floor)."""

    def loss_fn(params):
        out, mutated = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            batch,
            train=True,
            bn_momentum=bn_momentum,
            mutable=["batch_stats"],
            rngs={"dropout": dropout_rng},
        )
        end_points = dict(batch)
        end_points.update(out)
        loss, end_points = get_loss(
            end_points,
            dataset_config,
            detection=step_cfg.detection,
            use_reference=step_cfg.use_reference,
            use_lang_classifier=step_cfg.use_lang_classifier,
            use_answer=step_cfg.use_answer,
            loss_weights=step_cfg.loss_weights,
        )
        metrics = {
            k: end_points[k]
            for k in ("loss", "vote_loss", "objectness_loss", "box_loss", "sem_cls_loss",
                      "ref_loss", "lang_loss", "answer_loss", "pos_ratio", "neg_ratio")
        }
        return loss, (mutated["batch_stats"], metrics)

    (loss, (new_stats, metrics)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
    updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    new_state = state.replace(
        step=state.step + 1, params=new_params, batch_stats=new_stats, opt_state=new_opt_state
    )
    return new_state, metrics


def make_train_step(model, dataset_config, tx, step_cfg: StepConfig):
    """Build the jitted train step. Donates state for in-place updates."""
    return jax.jit(partial(train_body, model, dataset_config, tx, step_cfg),
                   donate_argnums=0)


def eval_body(model, dataset_config, step_cfg: StepConfig, k_test: int, state: TrainState, batch):
    """Unjitted eval forward (rank inference for the BLIP path) + losses.
    Shared by the jitted single-program step (:func:`make_eval_step`, GSPMD
    shards it when inputs carry shardings) and the explicit per-device
    ``shard_map`` deployment (:mod:`bridgeqa_tpu.parallel.eval`, required for
    the fused Pallas inference kernels which GSPMD treats as opaque)."""
    out = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        batch,
        train=False,
        inference="rank",
        k_test=k_test,
    )
    end_points = dict(batch)
    end_points.update(out)
    loss, end_points = get_loss(
        end_points,
        dataset_config,
        detection=step_cfg.detection,
        use_reference=step_cfg.use_reference,
        use_lang_classifier=step_cfg.use_lang_classifier,
        use_answer=False,  # rank scores are log-likelihoods, not CE logits
        loss_weights=step_cfg.loss_weights,
    )
    return end_points


def make_eval_step(model, dataset_config, step_cfg: StepConfig, k_test: int = 256):
    """Eval forward (rank inference for the BLIP path) + losses/metrics."""
    return jax.jit(partial(eval_body, model, dataset_config, step_cfg, k_test))
