"""Monotonic alignment search (MAS) as a batched lax.scan DP.

Replaces the reference's single compiled-language component — the Cython
maximum_path kernel (reference: speech/matcha/utils/monotonic_align/
core.pyx:1-47, prange nogil DP) — with a vectorized scan over mel frames
that runs batched on TPU (the Cython version parallelizes only over the
batch, on CPU threads).

Semantics (Glow-TTS/Matcha): value (B, Tx, Ty) holds log-likelihoods of
text position x explaining mel frame y; find the monotonic surjective
path maximizing the sum, i.e. v[x, y] = value[x, y] + max(v[x, y-1],
v[x-1, y-1]), then backtrack from (tx-1, ty-1).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

NEG = -1e9


def maximum_path(value: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """value: (B, Tx, Ty) float; mask: (B, Tx, Ty) bool/0-1 valid region
    (rectangular per sample). Returns one-hot path (B, Tx, Ty) float32."""
    b, tx, ty = value.shape
    mask = mask.astype(bool)
    value = jnp.where(mask, value, NEG)
    x_lens = jnp.sum(mask[:, :, 0].astype(jnp.int32), axis=1)
    y_lens = jnp.sum(mask[:, 0, :].astype(jnp.int32), axis=1)

    # forward DP over mel frames; carry the (B, Tx) score column
    init = jnp.full((b, tx), NEG).at[:, 0].set(value[:, 0, 0])

    def fwd(v_prev, y):
        shifted = jnp.concatenate(
            [jnp.full((b, 1), NEG), v_prev[:, :-1]], axis=1)
        take_diag = shifted >= v_prev          # prefer x-1 on ties? cython
        best = jnp.maximum(v_prev, shifted)
        v_new = value[:, :, y] + best
        # frame 0 already initialized; keep it fixed
        v_new = jnp.where(y == 0, v_prev, v_new)
        take_diag = jnp.where(y == 0, False, take_diag)
        return v_new, take_diag

    _, diag = jax.lax.scan(fwd, init, jnp.arange(ty))
    diag = jnp.moveaxis(diag, 0, -1)  # (B, Tx, Ty)

    # backtrack from (x_lens-1, y_lens-1): at each frame y, mark x; step to
    # x-1 when the diagonal was taken
    def bwd(x_idx, y):
        active = y < y_lens
        onehot = jax.nn.one_hot(x_idx, tx) * active[:, None]
        took = diag[jnp.arange(b), x_idx, y]
        x_next = jnp.where(active & took, x_idx - 1, x_idx)
        x_next = jnp.maximum(x_next, 0)
        return x_next, onehot

    x0 = jnp.maximum(x_lens - 1, 0)
    _, path_rev = jax.lax.scan(bwd, x0, jnp.arange(ty)[::-1])
    path = jnp.moveaxis(path_rev[::-1], 0, -1)  # (B, Tx, Ty)
    return path * mask.astype(path.dtype)


def maximum_path_numpy(value: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Reference DP (same recurrence as the Cython kernel) for tests."""
    b, tx, ty = value.shape
    path = np.zeros_like(value, dtype=np.float32)
    for i in range(b):
        txi = int(mask[i, :, 0].sum())
        tyi = int(mask[i, 0, :].sum())
        v = np.full((txi, tyi), -np.inf)
        v[0, 0] = value[i, 0, 0]
        for y in range(1, tyi):
            for x in range(min(y + 1, txi)):
                best = v[x, y - 1]
                if x > 0 and v[x - 1, y - 1] >= best:
                    best = v[x - 1, y - 1]
                v[x, y] = value[i, x, y] + best
        x = txi - 1
        for y in range(tyi - 1, -1, -1):
            path[i, x, y] = 1.0
            if y > 0 and x > 0 and v[x - 1, y - 1] >= v[x, y - 1]:
                x -= 1
    return path
