"""Learnable speaker encoder (Tortoise-style conditioning encoder).

mel (B, T, 80) -> 1x1 conv to 512 -> 6 attention blocks (GroupNorm +
qkv 1x1 conv + zero-init output proj, residual) -> first-position pool
-> Dense to 192 -> L2 normalize. Reference:
speech/cosyvoice/llm/llm.py:34-96 + transformer/arch_util.py:43-125.
"""
from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class SpeakerEncoderConfig:
    mel_dim: int = 80
    model_dim: int = 512
    output_dim: int = 192
    num_blocks: int = 6
    num_heads: int = 8
    mean_pooling: bool = False


def _group_count(channels: int) -> int:
    # normalization() rule (reference: transformer/arch_util.py:26-40)
    groups = 32
    if channels <= 16:
        groups = 8
    elif channels <= 64:
        groups = 16
    while channels % groups != 0:
        groups //= 2
    return groups


class TortoiseAttentionBlock(nn.Module):
    """GroupNorm -> fused qkv 1x1 conv -> per-head attention with
    q,k each scaled by d^-1/4 -> mask applied *after* softmax -> zero-init
    out proj -> residual. Reference: arch_util.py:43-125."""
    channels: int
    num_heads: int

    @nn.compact
    def __call__(self, x, mask=None):
        # x: (B, T, C)
        b, t, c = x.shape
        h = nn.GroupNorm(num_groups=_group_count(c), epsilon=1e-5,
                         name="norm")(x.astype(jnp.float32)).astype(x.dtype)
        qkv = nn.Dense(3 * c, name="qkv")(h)
        # head-major packing: (B, T, H, 3, D) — reference reshapes
        # (H*3*D) channel blocks per head
        d = c // self.num_heads
        qkv = qkv.reshape(b, t, self.num_heads, 3, d)
        q, k, v = qkv[..., 0, :], qkv[..., 1, :], qkv[..., 2, :]
        scale = d ** -0.25
        w = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k * scale)
        w = jax.nn.softmax(w.astype(jnp.float32), axis=-1).astype(x.dtype)
        if mask is not None:
            # reference multiplies the mask after softmax (arch_util.py:70-75)
            w = w * mask[:, None, None, :].astype(w.dtype)
        a = jnp.einsum("bhqk,bkhd->bqhd", w, v).reshape(b, t, c)
        a = nn.Dense(c, kernel_init=nn.initializers.zeros,
                     name="proj_out")(a)
        return x + a


class LearnableSpeakerEncoder(nn.Module):
    cfg: SpeakerEncoderConfig = SpeakerEncoderConfig()

    @nn.compact
    def __call__(self, mel: jnp.ndarray, mask: jnp.ndarray | None = None
                 ) -> jnp.ndarray:
        """mel: (B, T, mel_dim) -> (B, output_dim) unit-norm embedding."""
        cfg = self.cfg
        h = nn.Dense(cfg.model_dim, name="init")(mel)
        for i in range(cfg.num_blocks):
            h = TortoiseAttentionBlock(cfg.model_dim, cfg.num_heads,
                                       name=f"attn_{i}")(h, mask)
        if cfg.mean_pooling:
            if mask is not None:
                m = mask.astype(h.dtype)[..., None]
                pooled = (h * m).sum(1) / jnp.maximum(m.sum(1), 1.0)
            else:
                pooled = h.mean(axis=1)
        else:
            pooled = h[:, 0]  # Tortoise pools the first position
        out = nn.Dense(cfg.output_dim, name="output_proj")(pooled)
        return out / jnp.maximum(
            jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-12)
