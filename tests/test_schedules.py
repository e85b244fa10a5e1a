"""NeMo scheduler-zoo parity (reference: cosyvoice/utils/scheduler.py
:377-738 — the annealing formulas replicated here as plain python)."""
import math

import numpy as np
import pytest

from minimax_speech_tpu.train import schedule


def _ref_square(lr, step, max_steps, min_lr):
    return max(lr * ((max_steps - step) / max_steps) ** 2, min_lr)


def _ref_sqrt(lr, step, max_steps, min_lr):
    return max(lr * ((max_steps - step) / max_steps) ** 0.5, min_lr)


def _ref_noam_hold(lr, step, warmup, hold, decay_rate, min_lr):
    t_warm = max(1, warmup ** decay_rate)
    t_hold = max(1, (step - hold) ** decay_rate)
    return max((lr * t_warm) / t_hold, min_lr)


def _ref_poly(lr, step, decay_steps, power, min_lr, cycle):
    if cycle:
        mult = 1.0 if step == 0 else math.ceil(step / decay_steps)
        decay_steps = decay_steps * mult
    else:
        step = min(step, decay_steps)
    p = step / decay_steps
    return (lr - min_lr) * (1.0 - p) ** power + min_lr


def test_square_and_sqrt_annealing():
    lr, warm, total = 1e-3, 10, 100
    sq = schedule.square_annealing(lr, warm, total - warm, min_lr=1e-5)
    sr = schedule.squareroot_annealing(lr, warm, total - warm, min_lr=1e-5)
    for s in (11, 30, 60, 99):
        want = _ref_square(lr, s - warm, total - warm, 1e-5)
        np.testing.assert_allclose(float(sq(s)), want, rtol=1e-5)
        want = _ref_sqrt(lr, s - warm, total - warm, 1e-5)
        np.testing.assert_allclose(float(sr(s)), want, rtol=1e-5)
    # warmup ramp
    assert float(sq(5)) == pytest.approx(lr * 0.5, rel=1e-5)


def test_noam_annealing_matches_formula():
    lr, warm, d = 2e-3, 20, 512
    fn = schedule.noam_annealing(lr, warm, d_model=d)
    for s in (1, 10, 20, 50, 200):
        mult = d ** -0.5 * min(s ** -0.5, s * warm ** -1.5)
        np.testing.assert_allclose(float(fn(s)), lr * mult, rtol=1e-5)


def test_noam_hold_annealing():
    lr, warm, hold, dr = 1e-3, 10, 40, 0.5
    fn = schedule.noam_hold_annealing(lr, warm, hold, decay_rate=dr,
                                      min_lr=1e-6)
    # warmup ramp
    np.testing.assert_allclose(float(fn(5)), lr * 0.5, rtol=1e-5)
    # hold at peak through warmup+hold
    np.testing.assert_allclose(float(fn(30)), lr, rtol=1e-5)
    # decay region matches the reference formula
    for s in (60, 120, 500):
        want = _ref_noam_hold(lr, s, warm, hold, dr, 1e-6)
        np.testing.assert_allclose(float(fn(s)), want, rtol=1e-5)


def test_polynomial_decay():
    lr, warm, ds = 1e-3, 5, 50
    fn = schedule.polynomial_decay(lr, warm, ds, power=2.0, min_lr=1e-5)
    for s in (6, 20, 54, 200):
        want = _ref_poly(lr, s - warm, ds, 2.0, 1e-5, False)
        np.testing.assert_allclose(float(fn(s)), want, rtol=1e-5)
    fc = schedule.polynomial_decay(lr, 0, ds, power=1.0, min_lr=0.0,
                                   cycle=True)
    for s in (10, 60, 120):
        want = _ref_poly(lr, s, ds, 1.0, 0.0, True)
        np.testing.assert_allclose(float(fc(s)), want, rtol=1e-5)


def test_squareroot_constant():
    fn = schedule.squareroot_constant(1.0, 100, min_lr=0.0)
    np.testing.assert_allclose(float(fn(50)), 0.1, rtol=1e-5)
    np.testing.assert_allclose(float(fn(400)), 0.05, rtol=1e-5)


def test_make_optimizer_accepts_zoo_names():
    for name in ("square", "squareroot", "noam", "noamhold", "polynomial",
                 "cosine", "warmuplr", "constantlr"):
        tx = schedule.make_optimizer(lr=1e-4, warmup_steps=2,
                                     scheduler=name, total_steps=100)
        assert tx is not None
