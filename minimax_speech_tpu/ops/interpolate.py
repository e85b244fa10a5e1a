"""1-D interpolation primitives matching torch.nn.functional.interpolate.

Used by the upsampling conformer's Upsample1D (nearest, scale 2 —
reference: speech/cosyvoice/transformer/upsample_encoder.py:37-64) and
the legacy InterpolateRegulator (linear —
reference: speech/cosyvoice/flow/length_regulator.py:21-70).
Implemented as static-shape gathers / matmuls so XLA can fuse them.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def interpolate_nearest(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """(..., T) -> (..., T*scale) nearest-neighbor (torch 'nearest' with
    integer scale == repeat each sample `scale` times)."""
    return jnp.repeat(x, scale, axis=-1)


def interpolate_linear(x: jnp.ndarray, out_len: int) -> jnp.ndarray:
    """(..., T) -> (..., out_len), torch 'linear' with align_corners=False."""
    t = x.shape[-1]
    # torch: in_coord = (out_coord + 0.5) * (T / out_len) - 0.5, clamped
    out_coord = (np.arange(out_len, dtype=np.float64) + 0.5) * (t / out_len) - 0.5
    out_coord = np.clip(out_coord, 0.0, t - 1)
    lo = np.floor(out_coord).astype(np.int32)
    hi = np.minimum(lo + 1, t - 1)
    w_hi = (out_coord - lo).astype(np.float32)
    w_lo = 1.0 - w_hi
    return x[..., lo] * jnp.asarray(w_lo) + x[..., hi] * jnp.asarray(w_hi)
