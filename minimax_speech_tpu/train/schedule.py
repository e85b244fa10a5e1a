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


# --- NeMo-derived zoo (reference: utils/scheduler.py:377-738). Each is
# a pure optax.Schedule of the step; warmup is linear 0 -> lr unless the
# policy defines its own shape. ----------------------------------------

def _with_warmup(lr: float, warmup_steps: int,
                 after: optax.Schedule) -> optax.Schedule:
    """WarmupPolicy: linear ramp then the annealing shape, which sees
    steps counted from the end of warmup (scheduler.py:74-134)."""
    if warmup_steps <= 0:
        return after
    return optax.join_schedules(
        [optax.linear_schedule(0.0, lr, warmup_steps), after],
        [warmup_steps])


def square_annealing(lr: float, warmup_steps: int, max_steps: int,
                     min_lr: float = 0.0) -> optax.Schedule:
    """SquareAnnealing (scheduler.py:384-389,444-469)."""
    def fn(step):
        frac = jnp.clip((max_steps - step) / max_steps, 0.0, 1.0)
        return jnp.maximum(lr * frac ** 2, min_lr)
    return _with_warmup(lr, warmup_steps, fn)


def squareroot_annealing(lr: float, warmup_steps: int, max_steps: int,
                         min_lr: float = 0.0) -> optax.Schedule:
    """SquareRootAnnealing (scheduler.py:377-382,471-495)."""
    def fn(step):
        frac = jnp.clip((max_steps - step) / max_steps, 0.0, 1.0)
        return jnp.maximum(lr * jnp.sqrt(frac), min_lr)
    return _with_warmup(lr, warmup_steps, fn)


def squareroot_constant(lr_scale: float, constant_steps: int,
                        min_lr: float = 0.0) -> optax.Schedule:
    """SquareRootConstantPolicy: lr_scale/sqrt(constant_steps) held,
    then 1/sqrt(step) (scheduler.py:137-196)."""
    def fn(step):
        s = jnp.maximum(jnp.asarray(step, jnp.float32), 1.0)
        held = lr_scale / (constant_steps ** 0.5)
        decay = lr_scale / jnp.sqrt(s)
        return jnp.maximum(jnp.where(step <= constant_steps, held, decay),
                           min_lr)
    return fn


def noam_annealing(lr: float, warmup_steps: int, d_model: int = 512,
                   min_lr: float = 0.0) -> optax.Schedule:
    """NoamAnnealing: d_model^-0.5 * min(s^-0.5, s*warmup^-1.5)
    (scheduler.py:558-621)."""
    norm = d_model ** (-0.5)

    def fn(step):
        s = jnp.maximum(jnp.asarray(step, jnp.float32), 1.0)
        mult = norm * jnp.minimum(s ** -0.5, s * warmup_steps ** -1.5)
        out = lr * mult
        return jnp.where(s > warmup_steps, jnp.maximum(out, min_lr), out)
    return fn


def noam_hold_annealing(lr: float, warmup_steps: int, hold_steps: int,
                        decay_rate: float = 0.5,
                        min_lr: float = 0.0) -> optax.Schedule:
    """NoamHoldAnnealing (SqueezeFormer): warmup, hold at peak, then
    step^-decay_rate polynomial decay (scheduler.py:433-441,623-717).
    hold_steps counts post-warmup steps held."""
    hold_total = warmup_steps + hold_steps

    def fn(step):
        s = jnp.asarray(step, jnp.float32)
        warm = lr * s / max(warmup_steps, 1)
        t_warm = max(1.0, warmup_steps ** decay_rate)
        t_hold = jnp.maximum(1.0, (s - hold_steps) ** decay_rate)
        decay = jnp.maximum(lr * t_warm / t_hold, min_lr)
        return jnp.where(s <= warmup_steps, warm,
                         jnp.where(s <= hold_total, lr, decay))
    return fn


def polynomial_decay(lr: float, warmup_steps: int, decay_steps: int,
                     power: float = 1.0, min_lr: float = 0.0,
                     cycle: bool = False) -> optax.Schedule:
    """PolynomialDecayAnnealing (scheduler.py:421-431). The non-cycle
    path matches optax; cycle stretches decay_steps per period."""
    def fn(step):
        s = jnp.asarray(step, jnp.float32)
        if cycle:
            mult = jnp.maximum(jnp.ceil(s / decay_steps), 1.0)
            ds = decay_steps * mult
        else:
            ds = jnp.asarray(decay_steps, jnp.float32)
            s = jnp.minimum(s, ds)
        p = s / ds
        return (lr - min_lr) * (1.0 - p) ** power + min_lr
    return _with_warmup(lr, warmup_steps, fn)


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
    elif scheduler == "square":
        sched = square_annealing(lr, warmup_steps, total_steps)
    elif scheduler == "squareroot":
        sched = squareroot_annealing(lr, warmup_steps, total_steps)
    elif scheduler == "noam":
        sched = noam_annealing(lr, warmup_steps)
    elif scheduler == "noamhold":
        sched = noam_hold_annealing(lr, warmup_steps,
                                    hold_steps=total_steps // 10)
    elif scheduler == "polynomial":
        sched = polynomial_decay(lr, warmup_steps, total_steps)
    else:
        raise ValueError(scheduler)
    tx = optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adamw(sched, weight_decay=weight_decay),
    )
    if accum_steps > 1:
        tx = optax.MultiSteps(tx, accum_steps)
    return tx
