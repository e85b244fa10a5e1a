"""Conditional flow matching: OT-CFM losses + Euler ODE sampling with CFG.

Re-expresses ConditionalCFM / CausalConditionalCFM (reference:
speech/cosyvoice/flow/flow_matching.py:21-348) as pure functions over a
velocity-estimator apply function:

  * cosine t-schedule: t <- 1 - cos(t * pi/2)
  * immiscible noise assignment: draw k noise candidates per sample,
    pick the L2-nearest (k=8)             (flow_matching.py:183-203)
  * training CFG dropout (rate 0.2): zero mu/spk/cond per sample
  * contrastive FM: loss = mse(pred, u+) - lambda * mse(pred, u-) with
    u- from a derangement of the batch    (flow_matching.py:222-314)
  * inference: N-step Euler with CFG via the batch-of-2 trick
    (guidance 0.7)                        (flow_matching.py:74-126)
  * CausalConditionalCFM uses a FIXED noise table so synthesis is
    deterministic given tokens (flow_matching.py:317-348). The reference
    materializes torch.randn([1, 80, 15000]) under seed 0; we accept any
    (T_max, 80) noise table — load the reference tensor for
    bit-comparability or generate one with make_fixed_noise().

The Euler loop is a lax.scan with the (t, dt) schedule precomputed, so
the whole sampler jits into a single XLA program.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class CFMConfig:
    sigma_min: float = 1e-6
    t_scheduler: str = "cosine"
    training_cfg_rate: float = 0.2
    inference_cfg_rate: float = 0.7
    use_immiscible: bool = True
    immiscible_k: int = 8
    use_contrastive_fm: bool = True
    contrastive_lambda: float = 0.05


def cosine_schedule(t: jnp.ndarray) -> jnp.ndarray:
    return 1.0 - jnp.cos(t * 0.5 * jnp.pi)


def make_fixed_noise(max_frames: int = 15000, n_feats: int = 80,
                     seed: int = 0) -> np.ndarray:
    """(max_frames, n_feats) deterministic inference noise table."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((max_frames, n_feats)).astype(np.float32)


def immiscible_noise(key: jax.Array, x1: jnp.ndarray, k: int) -> jnp.ndarray:
    """Per-sample k-NN noise assignment: (B, T, D) target -> (B, T, D) noise.

    Draw k candidates per sample, keep the one with the smallest L2
    distance to the target (reference computes distances in fp16 for
    memory; we use fp32 — TPU handles it natively and it is strictly
    more accurate)."""
    b, t, d = x1.shape
    cand = jax.random.normal(key, (b, k, t, d), x1.dtype)
    diff = cand - x1[:, None]
    dist = jnp.sum(diff.reshape(b, k, -1) ** 2, axis=-1)
    best = jnp.argmin(dist, axis=1)
    return jnp.take_along_axis(
        cand, best[:, None, None, None], axis=1)[:, 0]


def derangement(key: jax.Array, b: int) -> jnp.ndarray:
    """Random permutation of range(b) with self-pairs redirected to the
    next index (mod b), matching the reference's fix-up loop
    (flow_matching.py:286-293)."""
    perm = jax.random.permutation(key, b)
    idx = jnp.arange(b)
    return jnp.where(perm == idx, (idx + 1) % b, perm)


def compute_loss(estimator_apply: Callable, params, key: jax.Array,
                 x1: jnp.ndarray, mask: jnp.ndarray, mu: jnp.ndarray,
                 spks: jnp.ndarray, cond: jnp.ndarray, cfg: CFMConfig,
                 streaming: bool = False):
    """OT-CFM loss (optionally contrastive). Shapes: x1/mu/cond (B, T, D),
    mask (B, T) float, spks (B, D)."""
    b, t, d = x1.shape
    k_t, k_noise, k_cfg, k_perm = jax.random.split(key, 4)

    t_rand = jax.random.uniform(k_t, (b, 1, 1), x1.dtype)
    if cfg.t_scheduler == "cosine":
        t_rand = cosine_schedule(t_rand)

    if cfg.use_immiscible:
        z = immiscible_noise(k_noise, x1, cfg.immiscible_k)
    else:
        z = jax.random.normal(k_noise, x1.shape, x1.dtype)

    y = (1.0 - (1.0 - cfg.sigma_min) * t_rand) * z + t_rand * x1
    u_pos = x1 - (1.0 - cfg.sigma_min) * z

    if cfg.training_cfg_rate > 0:
        keep = (jax.random.uniform(k_cfg, (b,)) > cfg.training_cfg_rate
                ).astype(x1.dtype)
        mu = mu * keep[:, None, None]
        spks = spks * keep[:, None]
        cond = cond * keep[:, None, None]

    pred = estimator_apply(params, y, mask, mu, t_rand[:, 0, 0], spks, cond,
                           streaming)
    m = mask[..., None]
    denom = jnp.sum(mask) * d
    pos_loss = jnp.sum(((pred - u_pos) * m) ** 2) / denom

    if cfg.use_contrastive_fm:
        perm = derangement(k_perm, b)
        u_neg = u_pos[perm]
        neg_loss = jnp.sum(((pred - u_neg) * m) ** 2) / denom
        loss = pos_loss - cfg.contrastive_lambda * neg_loss
    else:
        loss = pos_loss
    return loss, y


def solve_euler(estimator_apply: Callable, params, x: jnp.ndarray,
                mu: jnp.ndarray, mask: jnp.ndarray, spks: jnp.ndarray,
                cond: jnp.ndarray, n_timesteps: int, cfg: CFMConfig,
                streaming: bool = False) -> jnp.ndarray:
    """Euler ODE solve with classifier-free guidance (batch-of-2 trick).

    x: (B, T, D) initial noise. The conditional and unconditional branches
    are batched together in one estimator call per step
    (reference: flow_matching.py:74-126)."""
    b = x.shape[0]
    t_span = jnp.linspace(0.0, 1.0, n_timesteps + 1)
    if cfg.t_scheduler == "cosine":
        t_span = cosine_schedule(t_span)
    ts = t_span[:-1]
    dts = t_span[1:] - t_span[:-1]

    rate = cfg.inference_cfg_rate
    if rate == 0.0:
        # static branch: no guidance -> no batch-of-2, half the
        # estimator FLOPs per step
        def step(x, t_dt):
            t, dt = t_dt
            t1 = jnp.full((b,), t, x.dtype)
            d = estimator_apply(params, x, mask, mu, t1, spks, cond,
                                streaming)
            return (x + dt.astype(x.dtype) * d.astype(x.dtype)), None

        x, _ = jax.lax.scan(step, x, (ts, dts))
        return x

    mu2 = jnp.concatenate([mu, jnp.zeros_like(mu)], axis=0)
    spks2 = jnp.concatenate([spks, jnp.zeros_like(spks)], axis=0)
    cond2 = jnp.concatenate([cond, jnp.zeros_like(cond)], axis=0)
    mask2 = jnp.concatenate([mask, mask], axis=0)

    def step(x, t_dt):
        t, dt = t_dt
        x2 = jnp.concatenate([x, x], axis=0)
        t2 = jnp.full((2 * b,), t, x.dtype)
        d2 = estimator_apply(params, x2, mask2, mu2, t2, spks2, cond2,
                             streaming)
        d_cond, d_uncond = d2[:b], d2[b:]
        dphi = (1.0 + rate) * d_cond - rate * d_uncond
        # keep the carry dtype stable under mixed precision
        return (x + dt.astype(x.dtype) * dphi.astype(x.dtype)), None

    x, _ = jax.lax.scan(step, x, (ts, dts))
    return x


def _euler_grid(n_timesteps: int, cfg: CFMConfig):
    t_span = jnp.linspace(0.0, 1.0, n_timesteps + 1)
    if cfg.t_scheduler == "cosine":
        t_span = cosine_schedule(t_span)
    return t_span[:-1], t_span[1:] - t_span[:-1]


def solve_euler_collect(estimator_apply, params, x: jnp.ndarray,
                        mu: jnp.ndarray, mask: jnp.ndarray,
                        spks: jnp.ndarray, cond: jnp.ndarray,
                        n_timesteps: int, cfg: CFMConfig, collect_len,
                        window: int = 100):
    """Chunked-streaming PREFILL: full Euler solve over the (padded)
    prompt that also collects the estimator's streaming cache at each
    of the n_timesteps steps. estimator_apply must forward
    collect_len/window kwargs to the UNet and return (velocity, cache).
    Returns (x_final, caches) with len(caches) == n_timesteps; each
    cache batches the CFG cond/uncond branches (leading dim 2B)."""
    b = x.shape[0]
    ts, dts = _euler_grid(n_timesteps, cfg)
    mu2 = jnp.concatenate([mu, jnp.zeros_like(mu)], axis=0)
    spks2 = jnp.concatenate([spks, jnp.zeros_like(spks)], axis=0)
    cond2 = jnp.concatenate([cond, jnp.zeros_like(cond)], axis=0)
    mask2 = jnp.concatenate([mask, mask], axis=0)
    rate = cfg.inference_cfg_rate

    def step(x, t_dt):
        t, dt = t_dt
        x2 = jnp.concatenate([x, x], axis=0)
        t2 = jnp.full((2 * b,), t, x.dtype)
        d2, cache = estimator_apply(params, x2, mask2, mu2, t2, spks2,
                                    cond2, False, collect_len=collect_len,
                                    window=window)
        dphi = (1.0 + rate) * d2[:b] - rate * d2[b:]
        return x + dt.astype(x.dtype) * dphi.astype(x.dtype), cache

    # scan (not a python loop): ONE estimator trace for all steps — the
    # UNet's 56-block body is large and a 10x unroll multiplies XLA
    # compile time ~10x. Caches come back stacked on a leading step axis.
    x, caches = jax.lax.scan(step, x, (ts, dts))
    return x, caches


def solve_euler_chunk(estimator_apply, params, x: jnp.ndarray,
                      mu: jnp.ndarray, spks: jnp.ndarray,
                      cond: jnp.ndarray, n_timesteps: int, cfg: CFMConfig,
                      caches, offset, q_valid, window: int = 100):
    """One streaming hop of the Euler solve: x/mu/cond are the CHUNK
    frames (B, cq, D) starting at absolute frame `offset`; caches is the
    STACKED (leading step axis) cache pytree from solve_euler_collect /
    previous hops. O(chunk) work per hop. Returns (x_final, new_caches)."""
    b, cq, _ = x.shape
    ts, dts = _euler_grid(n_timesteps, cfg)
    mask = (jnp.arange(cq) < q_valid)[None, :].astype(x.dtype)
    mask2 = jnp.concatenate([mask, mask], axis=0)
    mu2 = jnp.concatenate([mu, jnp.zeros_like(mu)], axis=0)
    spks2 = jnp.concatenate([spks, jnp.zeros_like(spks)], axis=0)
    cond2 = jnp.concatenate([cond, jnp.zeros_like(cond)], axis=0)
    rate = cfg.inference_cfg_rate

    def step(x, scan_in):
        t, dt, cache = scan_in
        x2 = jnp.concatenate([x, x], axis=0)
        t2 = jnp.full((2 * b,), t, x.dtype)
        d2, new_cache = estimator_apply(params, x2, mask2, mu2, t2, spks2,
                                        cond2, False, cache=cache,
                                        cache_offset=offset, q_valid=q_valid,
                                        window=window)
        dphi = (1.0 + rate) * d2[:b] - rate * d2[b:]
        return x + dt.astype(x.dtype) * dphi.astype(x.dtype), new_cache

    x, new_caches = jax.lax.scan(step, x, (ts, dts, caches))
    return x, new_caches
