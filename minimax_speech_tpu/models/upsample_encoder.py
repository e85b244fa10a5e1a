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

Chunked streaming (`prefill` / `chunk_step`) replaces the per-hop
full-prefix rerun with O(chunk) incremental computation: every
conformer layer keeps a preallocated KV cache, the pre-lookahead conv
and the upsample conv keep short input-tail caches — the TPU-native
equivalent of BaseEncoder.forward_chunk's att_cache/cnn_cache
(reference: transformer/encoder.py:184-274) on a prompt-anchored chunk
grid (ops/masks.py:unit_chunk_mask). All cache shapes are static;
position offsets and valid lengths are traced scalars.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import flax.linen as nn
import jax
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


def _tail_cache(x: jnp.ndarray, n: int, valid_len) -> jnp.ndarray:
    """Last n frames of x's valid prefix (valid_len traced), zero-padded
    on the left when valid_len < n: dynamic_slice of [zeros_n | x] at
    valid_len."""
    b, t, c = x.shape
    padded = jnp.concatenate([jnp.zeros((b, n, c), x.dtype), x], axis=1)
    return jax.lax.dynamic_slice(padded, (0, valid_len, 0), (b, n, c))


class PreLookaheadLayer(nn.Module):
    """conv(k=L+1) peeking L frames ahead + causal conv(k=3), residual.
    Reference: upsample_encoder.py:66-102."""
    channels: int
    pre_lookahead_len: int = 3

    def setup(self):
        self.conv1 = nn.Conv(self.channels, (self.pre_lookahead_len + 1,),
                             padding="VALID")
        self.conv2 = nn.Conv(self.channels, (3,), padding="VALID")

    def __call__(self, x: jnp.ndarray,
                 context: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        # x: (B, T, C); context: (B, L, C) future frames or None
        b, t, c = x.shape
        if context is not None:
            h = jnp.concatenate([x, context], axis=1)
        else:
            h = jnp.pad(x, ((0, 0), (0, self.pre_lookahead_len), (0, 0)))
        h = self.conv1(h)
        h = nn.leaky_relu(h, negative_slope=0.01)
        h = self.conv2(jnp.pad(h, ((0, 0), (2, 0), (0, 0))))
        return h + x

    def chunk(self, x: jnp.ndarray, conv2_cache: jnp.ndarray,
              has_context: bool) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Streaming chunk. x: (B, cq + L, C) when has_context (chunk
        frames followed by L real future frames), else (B, cq, C) with
        zero-vector right padding implied (prefill / final chunk).
        conv2_cache: (B, 2, C) previous conv1 outputs. Returns
        (out (B, cq, C), conv1 outputs h (B, cq, C)) — the caller
        derives the next conv2_cache from h (static tail for mid
        chunks, dynamic tail at the prompt boundary for prefill)."""
        L = self.pre_lookahead_len
        if has_context:
            cq = x.shape[1] - L
            h = self.conv1(x)
            x_body = x[:, :cq]
        else:
            h = self.conv1(jnp.pad(x, ((0, 0), (0, L), (0, 0))))
            x_body = x
        h = nn.leaky_relu(h, negative_slope=0.01)
        out = self.conv2(jnp.concatenate([conv2_cache, h], axis=1))
        return out + x_body, h


class Upsample1D(nn.Module):
    """Nearest-repeat 2x then left-padded conv (k = 2*stride+1).
    Reference: upsample_encoder.py:37-63."""
    channels: int
    stride: int = 2

    def setup(self):
        self.conv = nn.Conv(self.channels, (self.stride * 2 + 1,),
                            padding="VALID")

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # (B, T, C) -> (B, T*stride, C)
        h = jnp.repeat(x, self.stride, axis=1)
        h = self.conv(jnp.pad(h, ((0, 0), (self.stride * 2, 0), (0, 0))))
        return h

    def chunk(self, x: jnp.ndarray, cache: jnp.ndarray
              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """x: (B, cq, C); cache: (B, 2*stride, C) previous repeated
        frames. Returns (out (B, cq*stride, C), repeated frames)."""
        h = jnp.repeat(x, self.stride, axis=1)
        out = self.conv(jnp.concatenate([cache, h], axis=1))
        return out, h


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


def make_encoder_cache(cfg: UpsampleEncoderConfig, batch: int,
                       max_tokens: int, dtype=jnp.float32) -> dict:
    """Streaming state pytree for UpsampleConformerEncoder: per-layer
    preallocated KV caches plus the two conv tail caches."""
    h, d = cfg.attention_heads, cfg.output_size // cfg.attention_heads
    s = cfg.up_stride
    return {
        "kv1": [jnp.zeros((2, batch, max_tokens, h, d), dtype)
                for _ in range(cfg.num_blocks)],
        "kv2": [jnp.zeros((2, batch, max_tokens * s, h, d), dtype)
                for _ in range(cfg.num_up_blocks)],
        "pre_c2": jnp.zeros((batch, 2, cfg.output_size), dtype),
        "up_c": jnp.zeros((batch, 2 * s, cfg.output_size), dtype),
    }


class UpsampleConformerEncoder(nn.Module):
    cfg: UpsampleEncoderConfig = UpsampleEncoderConfig()

    def setup(self):
        cfg = self.cfg
        self.embed = InputEmbed(cfg.output_size)
        self.pre_lookahead_layer = PreLookaheadLayer(cfg.output_size,
                                                     cfg.pre_lookahead_len)
        self.encoders = [
            cf.ConformerEncoderLayer(cfg.attention_heads, cfg.linear_units,
                                     key_bias=cfg.key_bias,
                                     d_model=cfg.output_size)
            for _ in range(cfg.num_blocks)]
        self.up_layer = Upsample1D(cfg.output_size, cfg.up_stride)
        self.up_embed = InputEmbed(cfg.output_size)
        self.up_encoders = [
            cf.ConformerEncoderLayer(cfg.attention_heads, cfg.linear_units,
                                     key_bias=cfg.key_bias,
                                     d_model=cfg.output_size)
            for _ in range(cfg.num_up_blocks)]
        self.after_norm = nn.LayerNorm(epsilon=1e-5)

    def __call__(self, xs: jnp.ndarray, xs_lens: jnp.ndarray,
                 context: Optional[jnp.ndarray] = None,
                 streaming: bool = False,
                 chunk_align=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """xs: (B, T, input_size); returns (B, T*2, output_size), out_lens.

        chunk_align: optional traced prompt length — when given (with
        streaming=True), chunk-mask boundaries follow the prompt-anchored
        unit grid instead of the absolute grid, matching the chunked
        streaming path exactly (used for its verification)."""
        cfg = self.cfg
        t = xs.shape[1]
        pad = mask_ops.make_non_pad_mask(xs_lens, t)

        # zero-mask AFTER the input embed: InputEmbed's LayerNorm un-zeroes
        # padding, and the pre-lookahead conv peeks pre_lookahead_len frames
        # forward — masking here makes bucket-padded inference bit-match an
        # exact-length run (the reference always runs exact lengths, so its
        # right zero-pad in PreLookaheadLayer sees literal zeros;
        # upsample_encoder.py:84-92)
        xs = self.embed(xs) * pad[..., None].astype(xs.dtype)
        if context is not None:
            context = self.embed(context)

        chunk = cfg.static_chunk_size if streaming else 0
        if streaming and chunk_align is not None:
            attn_mask = (pad[:, None, :]
                         & mask_ops.unit_chunk_mask(t, chunk_align, chunk))
        else:
            attn_mask = mask_ops.add_optional_chunk_mask(pad, chunk)
        pos_emb = cf.espnet_rel_pos_emb(t, cfg.output_size, xs.dtype)

        xs = self.pre_lookahead_layer(xs, context)
        for layer in self.encoders:
            xs = layer(xs, attn_mask, pos_emb, pad.astype(xs.dtype))

        xs = self.up_layer(xs)
        up_lens = xs_lens * cfg.up_stride
        t2 = xs.shape[1]
        pad2 = mask_ops.make_non_pad_mask(up_lens, t2)
        xs = self.up_embed(xs)
        if streaming and chunk_align is not None:
            attn_mask2 = (pad2[:, None, :] & mask_ops.unit_chunk_mask(
                t2, chunk_align * cfg.up_stride, chunk * cfg.up_stride))
        elif streaming:
            attn_mask2 = mask_ops.add_optional_chunk_mask(
                pad2, chunk * cfg.up_stride)
        else:
            attn_mask2 = mask_ops.add_optional_chunk_mask(pad2, 0)
        pos_emb2 = cf.espnet_rel_pos_emb(t2, cfg.output_size, xs.dtype)
        for layer in self.up_encoders:
            xs = layer(xs, attn_mask2, pos_emb2, pad2.astype(xs.dtype))
        xs = self.after_norm(xs)
        return xs, up_lens

    # -- chunked streaming ---------------------------------------------------
    def _run_chunk(self, xs, cache, offset, q_valid, has_context,
                   prefill: bool, embed_valid=None):
        """Shared body for prefill/chunk_step. xs is the EMBEDDED-token
        input (B, cq [+L], input_size); offset/q_valid traced scalars.
        embed_valid: positions >= this are zeroed after InputEmbed
        (prompt+lookahead for prefill, valid frames for the final chunk),
        mirroring the full path's post-embed masking."""
        cfg = self.cfg
        s = cfg.up_stride
        xs = self.embed(xs)
        if embed_valid is not None:
            keep = (jnp.arange(xs.shape[1]) < embed_valid)[None, :, None]
            xs = xs * keep.astype(xs.dtype)

        xs, h1 = self.pre_lookahead_layer.chunk(xs, cache["pre_c2"],
                                                has_context)
        cq = xs.shape[1]
        if prefill:
            pre_c2 = _tail_cache(h1, 2, q_valid)
        else:
            pre_c2 = h1[:, cq - 2: cq]

        m1 = cache["kv1"][0].shape[2]
        pos1 = cf.espnet_rel_pos_emb(m1, cfg.output_size, xs.dtype)
        key_len = offset + q_valid
        kv1 = []
        for layer, kvc in zip(self.encoders, cache["kv1"]):
            xs, kvc = layer.chunk(xs, kvc, offset, key_len, pos1, q_valid)
            kv1.append(kvc)

        xs, hrep = self.up_layer.chunk(xs, cache["up_c"])
        if prefill:
            up_c = _tail_cache(hrep, 2 * s, q_valid * s)
        else:
            up_c = hrep[:, cq * s - 2 * s: cq * s]

        xs = self.up_embed(xs)
        m2 = cache["kv2"][0].shape[2]
        pos2 = cf.espnet_rel_pos_emb(m2, cfg.output_size, xs.dtype)
        kv2 = []
        for layer, kvc in zip(self.up_encoders, cache["kv2"]):
            xs, kvc = layer.chunk(xs, kvc, offset * s, key_len * s, pos2,
                                  q_valid * s)
            kv2.append(kvc)
        xs = self.after_norm(xs)
        new_cache = {"kv1": kv1, "kv2": kv2, "pre_c2": pre_c2, "up_c": up_c}
        return xs, new_cache

    def prefill(self, xs_buf: jnp.ndarray, plen, cache: dict):
        """Process the prompt unit. xs_buf: (B, P, input_size) embedded
        tokens, where [0, plen) is the prompt and [plen, plen+L) holds
        the first L lookahead frames of the next chunk (rest zeros).
        Returns ((B, 2P, C) output — valid through 2*plen — and the
        streaming cache)."""
        return self._run_chunk(
            xs_buf, cache, jnp.int32(0), plen, has_context=False,
            prefill=True, embed_valid=plen + self.cfg.pre_lookahead_len)

    def chunk_step(self, xs_chunk: jnp.ndarray, cache: dict, offset,
                   q_valid, context: Optional[jnp.ndarray] = None):
        """One streaming hop. xs_chunk: (B, cq, input_size) embedded
        tokens (zero-masked beyond q_valid); context: (B, L, input_size)
        real future frames (None for the final chunk). offset = absolute
        token index of the chunk start. Returns ((B, cq*stride, C),
        cache)."""
        if context is not None:
            xs = jnp.concatenate([xs_chunk, context], axis=1)
            return self._run_chunk(xs, cache, offset, q_valid,
                                   has_context=True, prefill=False)
        return self._run_chunk(xs_chunk, cache, offset, q_valid,
                               has_context=False, prefill=False,
                               embed_valid=q_valid)
