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

Two execution modes:
  * full-sequence (`__call__`) — training and one-shot inference;
  * chunked (`chunk`) — streaming inference with a PREALLOCATED
    max-length KV cache updated in place at a dynamic offset, the
    TPU-native equivalent of the reference's growing att_cache in
    BaseEncoder.forward_chunk (reference: transformer/encoder.py:184-274
    and attention.py:288-306). Static shapes: the cache is (2, B, M, H,
    D) at max length M; validity is carried as a key-length scalar.
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

    def setup(self):
        c = self.n_feat
        self.linear_q = nn.Dense(c)
        self.linear_k = nn.Dense(c, use_bias=self.key_bias)
        self.linear_v = nn.Dense(c)
        self.linear_pos = nn.Dense(c, use_bias=False)
        self.linear_out = nn.Dense(c)
        self.pos_bias_u = self.param(
            "pos_bias_u", nn.initializers.xavier_uniform(),
            (self.n_head, c // self.n_head))
        self.pos_bias_v = self.param(
            "pos_bias_v", nn.initializers.xavier_uniform(),
            (self.n_head, c // self.n_head))

    def _qkv(self, x):
        b, t, c = x.shape
        h, d = self.n_head, c // self.n_head
        q = self.linear_q(x).reshape(b, t, h, d)
        k = self.linear_k(x).reshape(b, t, h, d)
        v = self.linear_v(x).reshape(b, t, h, d)
        return q, k, v

    def __call__(self, x: jnp.ndarray, attn_mask: jnp.ndarray,
                 pos_emb: jnp.ndarray,
                 kv_cache: Optional[jnp.ndarray] = None):
        b, t, c = x.shape
        h, d = self.n_head, c // self.n_head
        q, k, v = self._qkv(x)

        if kv_cache is not None:
            k = jnp.concatenate([kv_cache[0], k], axis=1)
            v = jnp.concatenate([kv_cache[1], v], axis=1)
        new_cache = jnp.stack([k, v])

        p = self.linear_pos(pos_emb).reshape(1, -1, h, d)

        ac = jnp.einsum("bqhd,bkhd->bhqk", q + self.pos_bias_u, k)
        bd = jnp.einsum("bqhd,bphd->bhqp", q + self.pos_bias_v, p)
        if bd.shape != ac.shape:
            bd = _rel_shift(bd)
        scores = (ac + bd) / np.sqrt(d)

        neg_inf = jnp.finfo(jnp.float32).min
        m = attn_mask[:, None, :, :]
        scores = jnp.where(m, scores.astype(jnp.float32), neg_inf)
        attn = jax.nn.softmax(scores, axis=-1)
        attn = jnp.where(m, attn, 0.0).astype(x.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, t, c)
        return self.linear_out(out), new_cache

    def chunk(self, x: jnp.ndarray, kv_cache: jnp.ndarray,
              offset: jnp.ndarray, key_valid_len: jnp.ndarray,
              pos_table: jnp.ndarray, q_valid_len: jnp.ndarray):
        """One streaming chunk against a preallocated cache.

        x: (B, cq, C) new frames starting at absolute position `offset`;
        kv_cache: (2, B, M, H, D) preallocated; pos_table:
        (1, 2M-1, C) espnet rel-pos table for max length M;
        key_valid_len: keys < this absolute index are attendable
        (normally offset + valid frames in this chunk).
        Returns (out (B, cq, C), updated cache).

        The rel-pos bd term is computed against the full table then
        gathered at rel = (q_abs - k_abs), replacing the rel_shift trick
        (which assumes queries are the last cq of the keys — untrue for
        a preallocated cache).
        """
        b, cq, c = x.shape
        h, d = self.n_head, c // self.n_head
        m_len = kv_cache.shape[2]
        q, k, v = self._qkv(x)

        kv_cache = jax.lax.dynamic_update_slice(
            kv_cache, jnp.stack([k, v]).astype(kv_cache.dtype),
            (0, 0, offset, 0, 0))
        kc, vc = kv_cache[0].astype(x.dtype), kv_cache[1].astype(x.dtype)

        p = self.linear_pos(pos_table).reshape(-1, h, d)  # (2M-1, H, D)

        ac = jnp.einsum("bqhd,bkhd->bhqk", q + self.pos_bias_u, kc)
        bd_full = jnp.einsum("bqhd,rhd->bhqr", q + self.pos_bias_v, p)
        # table index r holds rel position (M-1-r); key j at abs j, query
        # a at abs offset+a -> rel = offset+a-j -> r = M-1-offset-a+j
        a_idx = jnp.arange(cq)[:, None]
        j_idx = jnp.arange(m_len)[None, :]
        ridx = jnp.clip((m_len - 1) - (offset + a_idx) + j_idx,
                        0, 2 * m_len - 2)
        bd = jnp.take_along_axis(
            bd_full, jnp.broadcast_to(ridx[None, None],
                                      (b, h, cq, m_len)), axis=-1)
        scores = (ac + bd) / np.sqrt(d)

        key_ok = j_idx < key_valid_len                     # (1, M)
        q_ok = (jnp.arange(cq) < q_valid_len)[:, None]     # (cq, 1)
        m = (key_ok & q_ok)[None, None]                    # (1, 1, cq, M)
        neg_inf = jnp.finfo(jnp.float32).min
        scores = jnp.where(m, scores.astype(jnp.float32), neg_inf)
        attn = jax.nn.softmax(scores, axis=-1)
        attn = jnp.where(m, attn, 0.0).astype(x.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, vc).reshape(b, cq, c)
        return self.linear_out(out), kv_cache


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
    d_model: int = 512

    def setup(self):
        if self.macaron:
            self.norm_ff_macaron = nn.LayerNorm(epsilon=1e-12)
            self.feed_forward_macaron = PositionwiseFeedForward(
                self.linear_units)
        self.norm_mha = nn.LayerNorm(epsilon=1e-12)
        self.self_attn = RelPositionAttention(self.n_head, self.d_model,
                                              self.key_bias)
        if self.use_cnn:
            self.norm_conv = nn.LayerNorm(epsilon=1e-12)
            self.conv_module = ConvolutionModule(self.cnn_kernel)
            self.norm_final = nn.LayerNorm(epsilon=1e-12)
        self.norm_ff = nn.LayerNorm(epsilon=1e-12)
        self.feed_forward = PositionwiseFeedForward(self.linear_units)

    def __call__(self, x, attn_mask, pos_emb, pad_mask):
        ff_scale = 0.5 if self.macaron else 1.0
        if self.macaron:
            h = self.norm_ff_macaron(x)
            x = x + ff_scale * self.feed_forward_macaron(h)

        h = self.norm_mha(x)
        att, _ = self.self_attn(h, attn_mask, pos_emb)
        x = x + att

        if self.use_cnn:
            h = self.norm_conv(x)
            x = x + self.conv_module(h, pad_mask)

        h = self.norm_ff(x)
        x = x + ff_scale * self.feed_forward(h)

        if self.use_cnn:
            x = self.norm_final(x)
        return x

    def chunk(self, x, kv_cache, offset, key_valid_len, pos_table,
              q_valid_len):
        """Streaming chunk step (attention-only layer config; the flow
        encoder uses no macaron/conv modules). Returns (x, new_cache)."""
        h = self.norm_mha(x)
        att, kv_cache = self.self_attn.chunk(
            h, kv_cache, offset, key_valid_len, pos_table, q_valid_len)
        x = x + att
        h = self.norm_ff(x)
        x = x + self.feed_forward(h)
        return x, kv_cache
