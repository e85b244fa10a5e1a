"""Padding / chunk masks.

TPU-first re-expression of the reference mask helpers
(reference: speech/cosyvoice/utils/mask.py:161-260). All functions are
shape-static and jit-safe; masks are boolean with True = attend/keep.
"""
from __future__ import annotations

import jax.numpy as jnp


def make_non_pad_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """(B,) lengths -> (B, max_len) bool, True on valid positions.

    Mirrors make_non_pad_mask (reference: speech/cosyvoice/utils/mask.py:239).
    """
    pos = jnp.arange(max_len, dtype=lengths.dtype)[None, :]
    return pos < lengths[:, None]


def make_pad_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """True on padded positions."""
    return ~make_non_pad_mask(lengths, max_len)


def subsequent_chunk_mask(size: int, chunk_size: int,
                          num_left_chunks: int = -1) -> jnp.ndarray:
    """(size, size) bool chunk-causal mask.

    Position i may attend to positions < ((i // chunk_size) + 1) * chunk_size,
    optionally limited to `num_left_chunks` chunks of left context
    (reference: speech/cosyvoice/utils/mask.py:127-158).
    """
    pos = jnp.arange(size)
    block_end = (pos // chunk_size + 1) * chunk_size
    mask = pos[None, :] < block_end[:, None]
    if num_left_chunks >= 0:
        block_start = jnp.maximum(
            (pos // chunk_size - num_left_chunks) * chunk_size, 0)
        mask = mask & (pos[None, :] >= block_start[:, None])
    return mask


def add_optional_chunk_mask(pad_mask: jnp.ndarray, static_chunk_size: int,
                            num_left_chunks: int = -1) -> jnp.ndarray:
    """Combine (B, 1, T) or (B, T) pad mask with a static chunk mask.

    static_chunk_size == 0 means full attention (pad mask only).
    Returns (B, T, T) bool. Mirrors the static-chunk branch of
    add_optional_chunk_mask (reference: speech/cosyvoice/utils/mask.py:161-236).
    """
    if pad_mask.ndim == 2:
        pad_mask = pad_mask[:, None, :]
    t = pad_mask.shape[-1]
    if static_chunk_size > 0:
        chunk = subsequent_chunk_mask(t, static_chunk_size, num_left_chunks)
        return pad_mask & chunk[None, :, :]
    return jnp.broadcast_to(pad_mask, (pad_mask.shape[0], t, t))


def unit_chunk_mask(size: int, prompt_len, chunk: int,
                    window: int = -1) -> jnp.ndarray:
    """(size, size) bool chunk mask on a PROMPT-ANCHORED grid.

    Unit 0 = positions [0, prompt_len) (the prompt); unit k>=1 =
    positions [prompt_len + (k-1)*chunk, prompt_len + k*chunk). A query
    attends all keys up to the end of its own unit; `window >= 0`
    additionally limits left context to `window` frames before the
    query's unit start (the cacheable equivalent of the reference's
    num_decoding_left_chunks, transformer/encoder.py:184-274, with the
    grid shifted so streaming hops are whole units). prompt_len may be
    a traced scalar.
    """
    pos = jnp.arange(size)
    in_prompt = pos < prompt_len
    k = jnp.maximum(pos - prompt_len, 0) // chunk
    unit_end = jnp.where(in_prompt, prompt_len, prompt_len + (k + 1) * chunk)
    mask = pos[None, :] < unit_end[:, None]
    if window >= 0:
        unit_start = jnp.where(in_prompt, 0, prompt_len + k * chunk)
        mask = mask & (pos[None, :] >= (unit_start - window)[:, None])
    return mask


def mask_to_bias(mask: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """bool mask -> additive attention bias (0 where True, -1e10 where False).

    Mirrors mask_to_bias (reference: speech/cosyvoice/utils/common.py:161-170);
    the reference uses -1e10 rather than -inf for fp16 safety — we keep the
    same constant so attention outputs are comparable.
    """
    return jnp.where(mask, jnp.zeros((), dtype), jnp.full((), -1.0e10, dtype))


def causal_mask(size: int) -> jnp.ndarray:
    """(size, size) lower-triangular bool mask."""
    return jnp.tril(jnp.ones((size, size), dtype=bool))
