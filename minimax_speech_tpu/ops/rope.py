"""Rotary position embeddings (rotate-half convention).

Matches the S3Tokenizer RoPE (reference:
speech/tools/S3Tokenizer/s3tokenizer/model_v2.py:37-71) and the Qwen2
RoPE (HF convention — same rotate-half math, per-layer theta).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def rope_cos_sin(max_len: int, head_dim: int, theta: float = 10000.0,
                 positions: jnp.ndarray | None = None,
                 dtype=jnp.float32) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Return cos, sin of shape (T, head_dim).

    Frequencies theta^{-2i/d} are duplicated over both halves so that
    rotate-half application is `x * cos + rotate_half(x) * sin`.
    """
    half = head_dim // 2
    freqs = 1.0 / (theta ** (np.arange(0, half, dtype=np.float64) * 2 / head_dim))
    if positions is None:
        positions = jnp.arange(max_len, dtype=jnp.float32)
    angles = positions[:, None].astype(jnp.float32) * jnp.asarray(freqs, jnp.float32)[None, :]
    angles = jnp.concatenate([angles, angles], axis=-1)
    return jnp.cos(angles).astype(dtype), jnp.sin(angles).astype(dtype)


def rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply_rope(q: jnp.ndarray, k: jnp.ndarray, cos: jnp.ndarray,
               sin: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Apply rotary embedding to q, k of shape (B, T, H, D).

    cos/sin are (T, D) and broadcast over batch and heads.
    """
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    return q * c + rotate_half(q) * s, k * c + rotate_half(k) * s
