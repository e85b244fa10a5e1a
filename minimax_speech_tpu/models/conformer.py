"""WeNet/ESPnet-style conformer primitives in flax.

Covers the parts of the reference transformer library the flow encoder
uses (reference: speech/cosyvoice/transformer/): ESPnet relative
positional encoding, rel-pos multi-headed attention with the
Transformer-XL u/v biases and rel-shift, position-wise FFN, optional
macaron FFN and convolution module, and the pre-norm encoder layer.

Layout is (B, T, C) throughout. Attention masks arrive as (B, T, T)
boolean chunk masks (True = attend); softmax runs in fp32 with
masked-fill -inf then re-zero, matching forward_attention
(reference: transformer/attention.py:82-123).
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def espnet_rel_pos_emb(t: int, d_model: int, dtype=jnp.float32) -> jnp.ndarray:
    """(1, 2T-1, d) relative positional encoding, positions T-1 .. -(T-1).

    Matches EspnetRelPositionalEncoding.position_encoding
    (reference: transformer/embedding.py:201-302).
    """
    pos = np.arange(t - 1, -t, -1, dtype=np.float64)  # T-1 ... -(T-1)
    div = np.exp(np.arange(0, d_model, 2, dtype=np.float64)
                 * -(np.log(10000.0) / d_model))
    ang = pos[:, None] * div[None, :]
    pe = np.zeros((2 * t - 1, d_model), np.float32)
    pe[:, 0::2] = np.sin(ang)
    pe[:, 1::2] = np.cos(ang)
    return jnp.asarray(pe, dtype)[None]


def _rel_shift(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, T, 2T-1) -> (B, H, T, T) Transformer-XL relative shift
    (reference: transformer/attention.py:225-247)."""
    b, h, t, n = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 0)))
    x = x.reshape(b, h, n + 1, t)[:, :, 1:, :].reshape(b, h, t, n)
    return x[..., : n // 2 + 1]


class RelPositionAttention(nn.Module):
    """Multi-head self-attention with relative positional encoding
    (reference: transformer/attention.py:200-330)."""
    n_head: int
    n_feat: int
    key_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, attn_mask: jnp.ndarray,
                 pos_emb: jnp.ndarray,
                 kv_cache: Optional[jnp.ndarray] = None):
        b, t, c = x.shape
        h, d = self.n_head, c // self.n_head
        q = nn.Dense(c, name="linear_q")(x).reshape(b, t, h, d)
        k = nn.Dense(c, use_bias=self.key_bias, name="linear_k")(x).reshape(b, t, h, d)
        v = nn.Dense(c, name="linear_v")(x).reshape(b, t, h, d)

        if kv_cache is not None:
            k = jnp.concatenate([kv_cache[0], k], axis=1)
            v = jnp.concatenate([kv_cache[1], v], axis=1)
        new_cache = jnp.stack([k, v])

        p = nn.Dense(c, use_bias=False, name="linear_pos")(pos_emb)
        p = p.reshape(1, -1, h, d)

        u = self.param("pos_bias_u", nn.initializers.xavier_uniform(), (h, d))
        vb = self.param("pos_bias_v", nn.initializers.xavier_uniform(), (h, d))

        ac = jnp.einsum("bqhd,bkhd->bhqk", q + u, k)
        bd = jnp.einsum("bqhd,bphd->bhqp", q + vb, p)
        if bd.shape != ac.shape:
            bd = _rel_shift(bd)
        scores = (ac + bd) / np.sqrt(d)

        neg_inf = jnp.finfo(jnp.float32).min
        m = attn_mask[:, None, :, :]
        scores = jnp.where(m, scores.astype(jnp.float32), neg_inf)
        attn = jax.nn.softmax(scores, axis=-1)
        attn = jnp.where(m, attn, 0.0).astype(x.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, t, c)
        return nn.Dense(c, name="linear_out")(out), new_cache


class PositionwiseFeedForward(nn.Module):
    """Dense -> act -> Dense (reference:
    transformer/positionwise_feed_forward.py:20-56)."""
    hidden: int
    activation: str = "swish"

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        h = nn.Dense(self.hidden, name="w_1")(x)
        h = nn.swish(h) if self.activation == "swish" else nn.relu(h)
        return nn.Dense(d, name="w_2")(h)


class ConvolutionModule(nn.Module):
    """Conformer convolution module (pointwise-GLU-depthwise-norm-swish-
    pointwise); optional causal left padding for streaming."""
    kernel_size: int = 15
    causal: bool = False
    norm: str = "batch_norm"  # normalized as layer_norm in eval-style here

    @nn.compact
    def __call__(self, x, pad_mask):
        c = x.shape[-1]
        x = x * pad_mask[..., None]
        h = nn.Dense(2 * c, name="pointwise_conv1")(x)
        h = nn.glu(h, axis=-1)
        if self.causal:
            pad = [(self.kernel_size - 1, 0)]
        else:
            pad = [((self.kernel_size - 1) // 2, (self.kernel_size - 1) // 2)]
        h = nn.Conv(c, (self.kernel_size,), padding=pad,
                    feature_group_count=c, name="depthwise_conv")(h)
        h = nn.LayerNorm(name="norm")(h)
        h = nn.swish(h)
        h = nn.Dense(c, name="pointwise_conv2")(h)
        return h * pad_mask[..., None]


class ConformerEncoderLayer(nn.Module):
    """Pre-norm conformer layer (reference:
    transformer/encoder_layer.py:109-235). With macaron/conv disabled this
    is a plain pre-norm transformer layer with rel-pos attention — the
    configuration the flow encoder uses (speech/config.yaml:77-92)."""
    n_head: int
    linear_units: int
    macaron: bool = False
    use_cnn: bool = False
    cnn_kernel: int = 15
    key_bias: bool = True

    @nn.compact
    def __call__(self, x, attn_mask, pos_emb, pad_mask):
        ff_scale = 0.5 if self.macaron else 1.0
        if self.macaron:
            h = nn.LayerNorm(epsilon=1e-12, name="norm_ff_macaron")(x)
            x = x + ff_scale * PositionwiseFeedForward(
                self.linear_units, name="feed_forward_macaron")(h)

        h = nn.LayerNorm(epsilon=1e-12, name="norm_mha")(x)
        att, _ = RelPositionAttention(self.n_head, x.shape[-1],
                                      self.key_bias, name="self_attn")(
            h, attn_mask, pos_emb)
        x = x + att

        if self.use_cnn:
            h = nn.LayerNorm(epsilon=1e-12, name="norm_conv")(x)
            x = x + ConvolutionModule(self.cnn_kernel,
                                      name="conv_module")(h, pad_mask)

        h = nn.LayerNorm(epsilon=1e-12, name="norm_ff")(x)
        x = x + ff_scale * PositionwiseFeedForward(
            self.linear_units, name="feed_forward")(h)

        if self.use_cnn:
            x = nn.LayerNorm(epsilon=1e-12, name="norm_final")(x)
        return x
