"""Optimizer construction: 3-group AdamW routing + multi-step LR schedules.

Mirrors ``scripts/train.py:385-417`` (parameter-name-based routing into
blip / blip3d / other groups with separate lr and weight decay) and the
``step`` / ``step_except_2d`` schedulers (``lib/solver.py:242-259`` +
``utils/multilr.py``) as optax transforms. Gradient clip-by-value 1.0
matches ``solver.py:408-409``.
"""

import dataclasses
from collections.abc import Sequence

import jax
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
    scheduler_type: str = "step"  # "step" | "step_except_2d" | none
    steps_per_epoch: int = 1


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


def build_optimizer(params, cfg: OptimConfig):
    """Returns (optax.GradientTransformation, labels pytree)."""
    labels = label_params(params)

    def schedule_for(base_lr, decay_epochs):
        if cfg.scheduler_type in ("step", "step_except_2d"):
            return multistep_schedule(base_lr, decay_epochs, cfg.lr_decay_rate, cfg.steps_per_epoch)
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
