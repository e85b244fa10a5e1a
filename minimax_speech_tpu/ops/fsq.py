"""Finite Scalar Quantization (FSQ) encode/decode.

Codebook = 3^8 = 6561: 8 dims, 3 levels each
(reference: speech/tools/S3Tokenizer/s3tokenizer/model_v2.py:87-117).

The reference only implements encode (its decode raises
NotImplementedError); we additionally provide the digit decomposition so
downstream embedding tables can be factorized if desired.
"""
from __future__ import annotations

import jax.numpy as jnp

FSQ_DIM = 8
FSQ_LEVEL = 3
FSQ_SCALE = 0.9990000128746033  # exact tanh scale constant used by the reference
CODEBOOK_SIZE = FSQ_LEVEL ** FSQ_DIM  # 6561


def fsq_encode(h: jnp.ndarray) -> jnp.ndarray:
    """(..., 8) pre-projected features -> (...,) int32 codes in [0, 6561).

    tanh -> scale -> round-half-even -> +1 gives digits in {0,1,2}; the code
    is the little-endian base-3 integer. jnp.round matches torch round
    (both round-half-to-even).
    """
    h = jnp.tanh(h.astype(jnp.float32)) * FSQ_SCALE
    digits = (jnp.round(h) + 1.0).astype(jnp.int32)
    # exact integer powers — jnp.power on floats is inexact on TPU (pow via
    # exp/log gives 3^7 = 2186.9998 which truncates wrong)
    powers = jnp.asarray([FSQ_LEVEL ** i for i in range(FSQ_DIM)], jnp.int32)
    return jnp.sum(digits * powers, axis=-1, dtype=jnp.int32)


def fsq_digits(codes: jnp.ndarray) -> jnp.ndarray:
    """(...,) int codes -> (..., 8) digits in {0,1,2} (little-endian base 3)."""
    powers = FSQ_LEVEL ** jnp.arange(FSQ_DIM, dtype=codes.dtype)
    return (codes[..., None] // powers) % FSQ_LEVEL


def fsq_centers(codes: jnp.ndarray) -> jnp.ndarray:
    """(...,) int codes -> (..., 8) float quantization centers in {-1, 0, 1}."""
    return (fsq_digits(codes) - 1).astype(jnp.float32)
