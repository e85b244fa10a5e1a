"""Upsampling conformer encoder for the stage-2 flow model.

token embedding (25 Hz) -> pre-lookahead conv (3-token future context)
-> 6 conformer blocks -> nearest-2x upsample + conv -> 4 conformer
blocks (50 Hz). Reference: speech/cosyvoice/transformer/
upsample_encoder.py:37-330 with speech/config.yaml:77-92 hyperparams
(dim 512, 8 heads, linear input layer, espnet rel-pos, no macaron/cnn).

Streaming uses static chunk masks (chunk 25 tokens pre-upsample,
50 post); non-streaming uses full attention. The pre-lookahead layer
accepts an optional decoded-future `context` of exactly
pre_lookahead_len frames at inference chunk boundaries.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from minimax_speech_tpu.models import conformer as cf
from minimax_speech_tpu.ops import masks as mask_ops


@dataclass(frozen=True)
class UpsampleEncoderConfig:
    input_size: int = 512
    output_size: int = 512
    attention_heads: int = 8
    linear_units: int = 2048
    num_blocks: int = 6
    num_up_blocks: int = 4
    static_chunk_size: int = 25
    pre_lookahead_len: int = 3
    up_stride: int = 2
    key_bias: bool = True


class PreLookaheadLayer(nn.Module):
    """conv(k=L+1) peeking L frames ahead + causal conv(k=3), residual.
    Reference: upsample_encoder.py:66-102."""
    channels: int
    pre_lookahead_len: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 context: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        # x: (B, T, C); context: (B, L, C) future frames or None
        if context is not None:
            h = jnp.concatenate([x, context], axis=1)
            pad_right = 0
        else:
            h = x
            pad_right = self.pre_lookahead_len
        h = nn.Conv(self.channels, (self.pre_lookahead_len + 1,),
                    padding=[(0, pad_right)], name="conv1")(h)
        h = nn.leaky_relu(h, negative_slope=0.01)
        h = nn.Conv(self.channels, (3,), padding=[(2, 0)], name="conv2")(h)
        return h + x


class Upsample1D(nn.Module):
    """Nearest-repeat 2x then left-padded conv (k = 2*stride+1).
    Reference: upsample_encoder.py:37-64."""
    channels: int
    stride: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # (B, T, C) -> (B, T*stride, C)
        h = jnp.repeat(x, self.stride, axis=1)
        h = nn.Conv(self.channels, (self.stride * 2 + 1,),
                    padding=[(self.stride * 2, 0)], name="conv")(h)
        return h


class InputEmbed(nn.Module):
    """LinearNoSubsampling: Dense + LayerNorm, then x * sqrt(d)
    (reference: transformer/subsampling.py:69-112 +
    embedding.py espnet rel-pos xscale)."""
    output_size: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.output_size, name="linear")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        return x * np.sqrt(self.output_size)


class UpsampleConformerEncoder(nn.Module):
    cfg: UpsampleEncoderConfig = UpsampleEncoderConfig()

    @nn.compact
    def __call__(self, xs: jnp.ndarray, xs_lens: jnp.ndarray,
                 context: Optional[jnp.ndarray] = None,
                 streaming: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """xs: (B, T, input_size); returns (B, T*2, output_size), out_lens."""
        cfg = self.cfg
        t = xs.shape[1]
        pad = mask_ops.make_non_pad_mask(xs_lens, t)

        embed = InputEmbed(cfg.output_size, name="embed")
        xs = embed(xs)
        if context is not None:
            context = embed(context)

        chunk = cfg.static_chunk_size if streaming else 0
        attn_mask = mask_ops.add_optional_chunk_mask(pad, chunk)
        pos_emb = cf.espnet_rel_pos_emb(t, cfg.output_size, xs.dtype)

        xs = PreLookaheadLayer(cfg.output_size, cfg.pre_lookahead_len,
                               name="pre_lookahead_layer")(xs, context)
        for i in range(cfg.num_blocks):
            xs = cf.ConformerEncoderLayer(
                cfg.attention_heads, cfg.linear_units, key_bias=cfg.key_bias,
                name=f"encoders_{i}")(xs, attn_mask, pos_emb,
                                      pad.astype(xs.dtype))

        xs = Upsample1D(cfg.output_size, cfg.up_stride, name="up_layer")(xs)
        up_lens = xs_lens * cfg.up_stride
        t2 = xs.shape[1]
        pad2 = mask_ops.make_non_pad_mask(up_lens, t2)
        xs = InputEmbed(cfg.output_size, name="up_embed")(xs)
        attn_mask2 = mask_ops.add_optional_chunk_mask(
            pad2, chunk * cfg.up_stride if streaming else 0)
        pos_emb2 = cf.espnet_rel_pos_emb(t2, cfg.output_size, xs.dtype)
        for i in range(cfg.num_up_blocks):
            xs = cf.ConformerEncoderLayer(
                cfg.attention_heads, cfg.linear_units, key_bias=cfg.key_bias,
                name=f"up_encoders_{i}")(xs, attn_mask2, pos_emb2,
                                         pad2.astype(xs.dtype))
        xs = nn.LayerNorm(epsilon=1e-5, name="after_norm")(xs)
        return xs, up_lens
