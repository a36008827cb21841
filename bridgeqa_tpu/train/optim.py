"""Optimizer construction: 3-group AdamW routing + LR schedules.

Mirrors ``scripts/train.py:385-417`` (parameter-name-based routing into
blip / blip3d / other groups with separate lr and weight decay) and the
``step`` / ``step_except_2d`` / ``linear`` / ``cosine`` schedulers
(``lib/solver.py:242-266`` + ``utils/multilr.py``) as optax transforms.
Gradient clip-by-value 1.0 matches ``solver.py:408-409``.
"""

import dataclasses
from collections.abc import Sequence

import jax
import jax.numpy as jnp
import optax

# routing substrings from train.py:389-407
_BLIP3D_PATTERNS = ("layer_twin", "text_encoder_scene", "text_decoder_scene")
_OTHER_PATTERNS = ("lowrank", "fusion", "gated", "lang_net", "answer_cls",
                   "linear_scene_object", "scene_weight", "classifier")


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    lr: float = 5e-4
    lr_blip: float = 1e-4
    lr_blip3d: float = 1e-4
    wd: float = 1e-5
    wd_blip: float = 0.0
    adam_beta1: float = 0.9
    adam_beta2: float = 0.999
    adam_epsilon: float = 1e-8
    max_grad_value: float = 1.0
    lr_decay_step: Sequence[int] = (100, 200)  # epochs
    lr_decay_step_2d: Sequence[int] = (100, 200)
    lr_decay_rate: float = 0.2
    # "step" | "step_except_2d" | "linear" | "cosine" | none
    # (lib/solver.py:242-266; linear/cosine step per EPOCH like torch's
    # per-epoch scheduler.step() and need total_epochs)
    scheduler_type: str = "step"
    steps_per_epoch: int = 1
    total_epochs: int = 0  # required by linear/cosine


def label_params(params):
    """Assign each parameter a group label by its flattened path name."""

    def label_one(path):
        name = "/".join(str(k.key) if hasattr(k, "key") else str(k) for k in path)
        if "blip_model" in name:
            if any(p in name for p in _BLIP3D_PATTERNS):
                return "blip3d"
            if any(p in name for p in _OTHER_PATTERNS):
                return "other"
            return "blip"
        return "other"

    return jax.tree_util.tree_map_with_path(lambda path, _: label_one(path), params)


def multistep_schedule(base_lr: float, decay_epochs: Sequence[int], decay_rate: float,
                       steps_per_epoch: int) -> optax.Schedule:
    """torch MultiStepLR: multiply lr by decay_rate at each milestone epoch."""
    boundaries = {int(e) * steps_per_epoch: decay_rate for e in decay_epochs}
    return optax.piecewise_constant_schedule(base_lr, boundaries)


def linear_schedule(base_lr: float, total_epochs: int, steps_per_epoch: int,
                    end_factor: float = 0.001) -> optax.Schedule:
    """torch ``LinearLR(optimizer, 1, 0.001, total_iters=epochs)``
    (``lib/solver.py:262-263``): the lr factor ramps linearly 1 -> 0.001 over
    ``total_epochs``, stepped per epoch, then holds."""
    assert total_epochs > 0, "linear scheduler needs OptimConfig.total_epochs"

    def schedule(count):
        e = jnp.minimum(count // steps_per_epoch, total_epochs).astype(jnp.float32)
        return base_lr * (1.0 + (end_factor - 1.0) * e / total_epochs)

    return schedule


def cosine_schedule(base_lr: float, total_epochs: int, steps_per_epoch: int) -> optax.Schedule:
    """torch ``CosineAnnealingLR(optimizer, epochs)`` with eta_min=0
    (``lib/solver.py:264-266``): lr(e) = base * (1 + cos(pi*e/T)) / 2,
    stepped per epoch."""
    assert total_epochs > 0, "cosine scheduler needs OptimConfig.total_epochs"

    def schedule(count):
        e = (count // steps_per_epoch).astype(jnp.float32) if hasattr(count, "astype") \
            else jnp.asarray(count // steps_per_epoch, jnp.float32)
        return base_lr * 0.5 * (1.0 + jnp.cos(jnp.pi * e / total_epochs))

    return schedule


def build_optimizer(params, cfg: OptimConfig):
    """Returns (optax.GradientTransformation, labels pytree)."""
    labels = label_params(params)

    def schedule_for(base_lr, decay_epochs):
        if cfg.scheduler_type in ("step", "step_except_2d"):
            return multistep_schedule(base_lr, decay_epochs, cfg.lr_decay_rate, cfg.steps_per_epoch)
        if cfg.scheduler_type == "linear":
            return linear_schedule(base_lr, cfg.total_epochs, cfg.steps_per_epoch)
        if cfg.scheduler_type == "cosine":
            return cosine_schedule(base_lr, cfg.total_epochs, cfg.steps_per_epoch)
        return base_lr

    # step_except_2d: the 2D blip group decays on lr_decay_step_2d, the rest
    # on lr_decay_step (solver.py:252-259); plain "step" uses lr_decay_step
    # for everyone.
    blip_steps = cfg.lr_decay_step_2d if cfg.scheduler_type == "step_except_2d" else cfg.lr_decay_step

    def adamw(lr_schedule, wd):
        return optax.chain(
            optax.clip(cfg.max_grad_value),  # clip_grad_value_ (solver.py:409)
            optax.adamw(lr_schedule, b1=cfg.adam_beta1, b2=cfg.adam_beta2,
                        eps=cfg.adam_epsilon, weight_decay=wd),
        )

    tx = optax.multi_transform(
        {
            "blip": adamw(schedule_for(cfg.lr_blip, blip_steps), cfg.wd_blip),
            "blip3d": adamw(schedule_for(cfg.lr_blip3d, cfg.lr_decay_step), cfg.wd_blip),
            "other": adamw(schedule_for(cfg.lr, cfg.lr_decay_step), cfg.wd),
        },
        labels,
    )
    return tx, labels
