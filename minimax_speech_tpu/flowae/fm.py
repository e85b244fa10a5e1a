"""flowae's flow-matching formulation + Euler sampler.

Reference: flowae/models/diffusion/fm.py:6-140 + samplers.py:7-39:
  x_t = (1 - t) x + (sigma_min + t (1 - sigma_min)) eps
  target ("negative velocity") = x - (1 - sigma_min) eps
  sampler: t from 1 -> 0, x += neg_v * dt, CFG as
  uncond + g (cond - uncond). Immiscible k-NN noise optional (k=4).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class FMConfig:
    sigma_min: float = 1e-5
    timescale: float = 1.0
    use_immiscible: bool = True
    k_candidates: int = 4


def alpha(t, cfg: FMConfig):
    return 1.0 - t


def sigma(t, cfg: FMConfig):
    return cfg.sigma_min + t * (1.0 - cfg.sigma_min)


def immiscible_noise(key, x, k: int):
    b = x.shape[0]
    cand = jax.random.normal(key, (b, k) + x.shape[1:], x.dtype)
    diff = (cand - x[:, None]).reshape(b, k, -1)
    best = jnp.argmin(jnp.sum(diff * diff, axis=-1), axis=1)
    idx = best.reshape((b,) + (1,) * (cand.ndim - 1))
    return jnp.take_along_axis(cand, idx, axis=1)[:, 0]


def add_noise(key, x, t, cfg: FMConfig):
    """t: (B,). Returns (x_t, noise)."""
    if cfg.use_immiscible:
        noise = immiscible_noise(key, x, cfg.k_candidates)
    else:
        noise = jax.random.normal(key, x.shape, x.dtype)
    s = (x.shape[0],) + (1,) * (x.ndim - 1)
    x_t = alpha(t, cfg).reshape(s) * x + sigma(t, cfg).reshape(s) * noise
    return x_t, noise


def fm_loss(net: Callable, key, x, cfg: FMConfig,
            t: Optional[jnp.ndarray] = None, net_kwargs: dict | None = None,
            t_min: float = 0.0):
    """MSE(net(x_t, t), x - (1-sigma_min) eps). net_kwargs are extra
    conditioning inputs (z_dec etc.)."""
    net_kwargs = net_kwargs or {}
    k_t, k_n = jax.random.split(key)
    if t is None:
        t = t_min + (1.0 - t_min) * jax.random.uniform(k_t, (x.shape[0],))
    x_t, noise = add_noise(k_n, x, t, cfg)
    pred = net(x_t, t * cfg.timescale, **net_kwargs)
    target = x - (1.0 - cfg.sigma_min) * noise
    return jnp.mean((pred.astype(jnp.float32)
                     - target.astype(jnp.float32)) ** 2)


def get_prediction(net, x_t, t, cfg: FMConfig, net_kwargs=None,
                   uncond_net_kwargs=None, guidance: float = 1.0):
    pred = net(x_t, t * cfg.timescale, **(net_kwargs or {}))
    if guidance != 1.0:
        uncond = net(x_t, t * cfg.timescale, **(uncond_net_kwargs or {}))
        pred = uncond + guidance * (pred - uncond)
    return pred


def euler_sample(net, shape, n_steps: int, cfg: FMConfig, key=None,
                 noise=None, net_kwargs=None, uncond_net_kwargs=None,
                 guidance: float = 1.0):
    """t: 1 -> 0 Euler integration of the negative velocity
    (reference: samplers.py FMEulerSampler)."""
    if noise is None:
        noise = jax.random.normal(key, shape)
    t_steps = jnp.linspace(1.0, 0.0, n_steps + 1)

    def step(x, i):
        t = jnp.full((x.shape[0],), t_steps[i])
        neg_v = get_prediction(net, x, t, cfg, net_kwargs,
                               uncond_net_kwargs, guidance)
        return x + neg_v * (t_steps[i] - t_steps[i + 1]), None

    x, _ = jax.lax.scan(step, noise, jnp.arange(n_steps))
    return x
