"""Token sampling for AR decoding — jit-compatible RAS / nucleus sampling.

Reference semantics (speech/cosyvoice/utils/common.py:111-140):
  * nucleus_sampling: stable-sorted softmax; keep tokens while the
    *exclusive* cumulative probability is < top_p and fewer than top_k
    tokens are kept; renormalize and sample.
  * ras_sampling (VALL-E 2 repetition-aware sampling): if the nucleus
    sample appears >= win_size*tau_r times in the last win_size decoded
    tokens, fall back to sampling from the full distribution.

The reference implements these with per-token Python loops on the host;
here they are pure jnp functions usable inside lax.while_loop decode
loops. The recent-token window is carried as a fixed-size ring buffer
(pad with -1) instead of a growing Python list.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def nucleus_sample(key: jax.Array, logp: jnp.ndarray, top_p: float = 0.8,
                   top_k: int = 25) -> jnp.ndarray:
    """Sample one token id from log-probs (V,) with top-p/top-k truncation.

    Uses lax.top_k (ties broken by lower index, matching the reference's
    stable descending sort) instead of a full-vocab argsort — the sort
    was the most expensive op in each decode step."""
    probs = jax.nn.softmax(logp.astype(jnp.float32))
    k = min(top_k, probs.shape[-1])
    top_vals, top_idx = jax.lax.top_k(probs, k)
    cum_excl = jnp.cumsum(top_vals) - top_vals
    keep = cum_excl < top_p
    kept = jnp.where(keep, top_vals, 0.0)
    # renormalized categorical over the kept prefix
    i = jax.random.categorical(key, jnp.log(jnp.maximum(kept, 1e-30)))
    return top_idx[i]


def random_sample(key: jax.Array, logp: jnp.ndarray) -> jnp.ndarray:
    """Sample from the full softmax distribution."""
    return jax.random.categorical(key, logp.astype(jnp.float32))


@partial(jax.jit, static_argnames=("top_p", "top_k", "win_size", "tau_r"))
def ras_sample(key: jax.Array, logp: jnp.ndarray, recent_tokens: jnp.ndarray,
               top_p: float = 0.8, top_k: int = 25, win_size: int = 10,
               tau_r: float = 0.1) -> jnp.ndarray:
    """Repetition-aware sampling.

    recent_tokens: (win_size,) int32 ring buffer of the last decoded ids,
    -1 on empty slots.

    The full-distribution fallback draw (a V-sized gumbel, the most
    RNG-expensive op in a decode step) runs under lax.cond, so the
    common no-repetition step skips it entirely. Outputs are
    bit-identical to the unconditional form: the key split is
    unconditional, so the fallback — when taken — uses the same draw.
    (Under vmap, cond lowers to select and both branches run, matching
    the old cost; batched decode loops should use ras_sample_batch.)
    """
    k1, k2 = jax.random.split(key)
    top_ids = nucleus_sample(k1, logp, top_p=top_p, top_k=top_k)
    rep_num = jnp.sum(recent_tokens == top_ids)
    need = rep_num >= win_size * tau_r
    fallback = jax.lax.cond(need, lambda: random_sample(k2, logp),
                            lambda: top_ids)
    return jnp.where(need, fallback, top_ids)


@partial(jax.jit, static_argnames=("top_p", "top_k", "win_size", "tau_r"))
def ras_sample_batch(keys: jax.Array, logp: jnp.ndarray,
                     recent_tokens: jnp.ndarray, top_p: float = 0.8,
                     top_k: int = 25, win_size: int = 10,
                     tau_r: float = 0.1) -> jnp.ndarray:
    """Batched ras_sample with the expensive fallback cond'd at the
    BATCH level (a vmapped lax.cond lowers to select and loses the
    skip, so the any-row test must sit outside the vmap).

    keys: (B,) per-row PRNG keys; logp: (B, V); recent_tokens: (B, W).
    Bit-identical to `jax.vmap(ras_sample)(keys, logp, recent_tokens)`.
    """
    split = jax.vmap(jax.random.split)(keys)          # (B, 2, key)
    k1, k2 = split[:, 0], split[:, 1]
    top_ids = jax.vmap(
        lambda kk, lp: nucleus_sample(kk, lp, top_p=top_p, top_k=top_k)
    )(k1, logp)
    rep_num = jnp.sum(recent_tokens == top_ids[:, None], axis=1)
    need = rep_num >= win_size * tau_r
    fallback = jax.lax.cond(
        jnp.any(need),
        lambda: jax.vmap(random_sample)(k2, logp),
        lambda: top_ids)
    return jnp.where(need, fallback, top_ids)


def nucleus_gumbel_max(g_top: jnp.ndarray, logp: jnp.ndarray,
                       top_p: float = 0.8, top_k: int = 25) -> jnp.ndarray:
    """Batched nucleus sampling from PREGENERATED gumbel noise.

    g_top: (B, top_k) gumbel draws; logp: (B, V). Gumbel-max over the
    log of the kept top-p/top-k prefix is exactly a categorical draw
    over the renormalized kept probabilities (same distribution as
    nucleus_sample; the noise just arrives as an argument instead of a
    key). Lets a decode loop hoist ALL its RNG into one fused op before
    the loop — the per-step threefry splits were a measurable slice of
    the decode step's op overhead."""
    probs = jax.nn.softmax(logp.astype(jnp.float32), axis=-1)
    k = min(top_k, probs.shape[-1])
    top_vals, top_idx = jax.lax.top_k(probs, k)
    cum_excl = jnp.cumsum(top_vals, axis=-1) - top_vals
    kept = jnp.where(cum_excl < top_p, top_vals, 0.0)
    scores = jnp.log(jnp.maximum(kept, 1e-30)) + g_top[:, :k]
    i = jnp.argmax(scores, axis=-1)
    return jnp.take_along_axis(top_idx, i[:, None], axis=-1)[:, 0]


@partial(jax.jit, static_argnames=("top_p", "top_k", "win_size", "tau_r"))
def ras_sample_batch_pregen(step_key: jax.Array, g_top: jnp.ndarray,
                            logp: jnp.ndarray, recent_tokens: jnp.ndarray,
                            top_p: float = 0.8, top_k: int = 25,
                            win_size: int = 10,
                            tau_r: float = 0.1) -> jnp.ndarray:
    """RAS sampling with the nucleus draw from pregenerated noise.

    step_key: a per-step key (e.g. fold_in(key, step)) used ONLY for the
    rare repetition-fallback full-distribution draw, which stays under a
    batch-level lax.cond so non-repetition steps skip it entirely.
    Same distribution as ras_sample_batch; not bit-identical (different
    noise plumbing)."""
    top_ids = nucleus_gumbel_max(g_top, logp, top_p, top_k).astype(jnp.int32)
    rep_num = jnp.sum(recent_tokens == top_ids[:, None], axis=1)
    need = rep_num >= win_size * tau_r
    fallback = jax.lax.cond(
        jnp.any(need),
        lambda: jax.random.categorical(
            step_key, logp.astype(jnp.float32), axis=-1).astype(jnp.int32),
        lambda: top_ids)
    return jnp.where(need, fallback, top_ids)


def push_recent(recent_tokens: jnp.ndarray, token: jnp.ndarray) -> jnp.ndarray:
    """Shift the ring buffer left and append the newest token."""
    return jnp.concatenate([recent_tokens[1:], token[None].astype(recent_tokens.dtype)])
