"""Optimizer construction: AdamW + cosine warm restarts + global-norm clip.

Mirrors reference train.py:72-80,287-298,468-472: AdamW(lr 8e-4,
betas (0.9, 0.999), wd 0.01, applied to all params as torch AdamW does),
CosineAnnealingWarmRestarts(T0=10, Tmult=10, eta_min 8e-6) stepped on
fractional epochs, clip_grad_norm_(2.5) before the step.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import optax

from .schedule import cosine_annealing_warm_restarts


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    adamw_lr: float = 8e-4
    adamw_betas: Tuple[float, float] = (0.9, 0.999)
    adamw_weight_decay: float = 0.01
    cosine_annealing_warm_restarts_t0: int = 10
    cosine_annealing_warm_restarts_tmulti: int = 10
    cosine_annealing_warm_restarts_eta_min: float = 8e-6
    clip_grad_norm_max_norm: Optional[float] = 2.5


def build_optimizer(
    config: OptimizerConfig,
    steps_per_epoch: int,
) -> Tuple[optax.GradientTransformation, optax.Schedule]:
    schedule = cosine_annealing_warm_restarts(
        base_lr=config.adamw_lr,
        t0=config.cosine_annealing_warm_restarts_t0,
        t_mult=config.cosine_annealing_warm_restarts_tmulti,
        eta_min=config.cosine_annealing_warm_restarts_eta_min,
        steps_per_epoch=steps_per_epoch,
    )
    transforms = []
    if config.clip_grad_norm_max_norm is not None:
        transforms.append(optax.clip_by_global_norm(config.clip_grad_norm_max_norm))
    transforms.append(
        optax.adamw(
            learning_rate=schedule,
            b1=config.adamw_betas[0],
            b2=config.adamw_betas[1],
            weight_decay=config.adamw_weight_decay,
        )
    )
    return optax.chain(*transforms), schedule
