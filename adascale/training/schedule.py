"""Learning-rate schedules.

``cosine_annealing_warm_restarts`` reproduces
``torch.optim.lr_scheduler.CosineAnnealingWarmRestarts`` exactly, including
T_mult-driven cycle growth. The reference steps the torch scheduler on
*fractional epochs* ``epoch_idx + (batch_idx - 1) / num_batches``
(train.py:475-477); here the schedule is a pure function of the optax step
count, converted via ``t = step / steps_per_epoch``.
"""
from __future__ import annotations

import jax.numpy as jnp


def cosine_annealing_warm_restarts(
    base_lr: float,
    t0: float,
    t_mult: int,
    eta_min: float,
    steps_per_epoch: int,
):
    """Returns an optax-compatible ``schedule(step) -> lr``.

    Mirrors torch's closed form: for fractional epoch t, find the current
    cycle (length T_i = T_0 * T_mult^n) and position T_cur within it, then
    ``lr = eta_min + (base_lr - eta_min) * (1 + cos(pi * T_cur / T_i)) / 2``.
    """

    def schedule(step):
        t = jnp.asarray(step, jnp.float32) / steps_per_epoch
        if t_mult == 1:
            t_cur = jnp.mod(t, t0)
            t_i = jnp.asarray(t0, jnp.float32)
        else:
            tm = float(t_mult)
            # n = floor(log_tm(t / t0 * (tm - 1) + 1))
            n = jnp.floor(jnp.log(t / t0 * (tm - 1.0) + 1.0) / jnp.log(tm))
            geo_sum = (tm**n - 1.0) / (tm - 1.0)
            t_cur = t - t0 * geo_sum
            t_i = t0 * tm**n
        return eta_min + (base_lr - eta_min) * (1.0 + jnp.cos(jnp.pi * t_cur / t_i)) / 2.0

    return schedule
