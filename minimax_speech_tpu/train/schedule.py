"""LR schedules.

Active reference path: AdamW + linear warmup -> constant
(reference: speech/config.yaml:221-233, utils/train_utils.py:39-135 —
ResumableSequentialLR(LinearLR warmup, ConstantLR)); the step-indexed
resume is free here because optax schedules are pure functions of step.
The rest of the reference zoo (utils/scheduler.py:27-738) maps onto
optax equivalents below.
"""
from __future__ import annotations

import jax.numpy as jnp
import optax


def warmup_constant(lr: float, warmup_steps: int) -> optax.Schedule:
    """LinearLR(start~0 -> lr over warmup) then constant — the active
    'constantlr' + warmup path."""
    return optax.join_schedules(
        [optax.linear_schedule(lr * 1e-3, lr, warmup_steps),
         optax.constant_schedule(lr)], [warmup_steps])


def warmup_lr(lr: float, warmup_steps: int) -> optax.Schedule:
    """WarmupLR (Noam-style): lr * warmup^0.5 * min(step^-0.5,
    step*warmup^-1.5) (reference: utils/scheduler.py WarmupLR)."""
    def fn(step):
        s = jnp.maximum(jnp.asarray(step, jnp.float32), 1.0)
        return lr * warmup_steps ** 0.5 * jnp.minimum(
            s ** -0.5, s * warmup_steps ** -1.5)
    return fn


def cosine_annealing(lr: float, warmup_steps: int, total_steps: int,
                     min_lr: float = 0.0) -> optax.Schedule:
    return optax.warmup_cosine_decay_schedule(
        0.0, lr, warmup_steps, total_steps, end_value=min_lr)


def constant(lr: float) -> optax.Schedule:
    return optax.constant_schedule(lr)


def make_optimizer(lr: float = 5e-5, warmup_steps: int = 500,
                   scheduler: str = "constantlr", weight_decay: float = 0.0,
                   grad_clip: float = 1.0, total_steps: int = 1_000_000,
                   accum_steps: int = 1) -> optax.GradientTransformation:
    """AdamW + clip (+ optional grad accumulation via MultiSteps),
    mirroring train_conf (reference: config.yaml:222-233,
    train_utils.py:212-247, 363-449)."""
    if scheduler == "constantlr":
        sched = warmup_constant(lr, warmup_steps)
    elif scheduler == "warmuplr":
        sched = warmup_lr(lr, warmup_steps)
    elif scheduler == "cosine":
        sched = cosine_annealing(lr, warmup_steps, total_steps)
    else:
        raise ValueError(scheduler)
    tx = optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adamw(sched, weight_decay=weight_decay),
    )
    if accum_steps > 1:
        tx = optax.MultiSteps(tx, accum_steps)
    return tx
