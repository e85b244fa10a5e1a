"""Legacy stage-1 LM (CosyVoice v1 path).

Reference: speech/cosyvoice/llm/llm.py:99-340 (`TransformerLM`): a text
encoder (conformer over text embeddings) + a causal transformer LM over
[sos, speaker, text_enc, task, speech] with separate text/speech
embedding tables. Superseded by the Qwen2-backed SpeechLM
(models/llm.py) in the active config, kept for checkpoint compatibility
and the v1 model family. Shares the plan-based batch layout.
"""
from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp

from minimax_speech_tpu.models import conformer as cf
from minimax_speech_tpu.models import llm as llm_mod
from minimax_speech_tpu.ops import masks as mask_ops
from minimax_speech_tpu.utils import losses


@dataclass(frozen=True)
class LegacyLMConfig:
    text_vocab_size: int = 51866
    speech_token_size: int = 4096
    text_encoder_input_size: int = 512
    llm_input_size: int = 1024
    llm_output_size: int = 1024
    text_encoder_blocks: int = 3
    llm_blocks: int = 6
    attention_heads: int = 8
    linear_units: int = 2048
    spk_embed_dim: int = 192
    lsm_weight: float = 0.0


class TransformerStack(nn.Module):
    """Pre-norm transformer with rel-pos attention (wenet encoder style)."""
    n_blocks: int
    heads: int
    linear_units: int

    @nn.compact
    def __call__(self, x, attn_mask, pad):
        pos = cf.espnet_rel_pos_emb(x.shape[1], x.shape[-1], x.dtype)
        for i in range(self.n_blocks):
            x = cf.ConformerEncoderLayer(
                self.heads, self.linear_units, d_model=x.shape[-1],
                name=f"layer_{i}")(x, attn_mask, pos, pad)
        return nn.LayerNorm(epsilon=1e-5, name="after_norm")(x)


class LegacyTransformerLM(nn.Module):
    cfg: LegacyLMConfig = LegacyLMConfig()

    def setup(self):
        c = self.cfg
        self.text_embedding = nn.Embed(c.text_vocab_size,
                                       c.text_encoder_input_size)
        self.text_encoder = TransformerStack(
            c.text_encoder_blocks, c.attention_heads, c.linear_units)
        self.text_encoder_affine_layer = nn.Dense(c.llm_input_size)
        self.llm_embedding = nn.Embed(2, c.llm_input_size)
        self.speech_embedding = nn.Embed(c.speech_token_size + 3,
                                         c.llm_input_size)
        self.spk_embed_affine_layer = nn.Dense(c.llm_input_size)
        self.llm = TransformerStack(c.llm_blocks, c.attention_heads,
                                    c.linear_units)
        self.llm_decoder = nn.Dense(c.speech_token_size + 3)

    def encode_text(self, text_token, text_len):
        t = text_token.shape[1]
        pad = mask_ops.make_non_pad_mask(text_len, t)
        attn = mask_ops.add_optional_chunk_mask(pad, 0)
        h = self.text_embedding(text_token)
        h = self.text_encoder(h, attn, pad.astype(h.dtype))
        return self.text_encoder_affine_layer(h)

    def __call__(self, src_type, tok_id, target, seq_len, spk_emb,
                 text_token=None, text_len=None):
        """Plan-based forward like SpeechLM, except SRC_TEXT positions take
        the text-ENCODER outputs (gathered by position) when
        text_token/text_len are given (the v1 design encodes text first,
        llm.py:186-210)."""
        st = src_type[..., None]
        speech_e = self.speech_embedding(
            jnp.clip(tok_id, 0, self.cfg.speech_token_size + 2))
        special_e = self.llm_embedding(jnp.clip(tok_id, 0, 1))
        if text_token is not None:
            enc = self.encode_text(text_token, text_len)
            # SRC_TEXT positions appear in order; their k-th occurrence maps
            # to enc[:, k]
            is_text = (src_type == llm_mod.SRC_TEXT).astype(jnp.int32)
            order = jnp.cumsum(is_text, axis=1) - 1
            order = jnp.clip(order, 0, enc.shape[1] - 1)
            text_e = jnp.take_along_axis(enc, order[..., None], axis=1)
        else:
            text_e = self.text_embedding(tok_id)
            text_e = self.text_encoder_affine_layer(text_e)
        emb = jnp.where(st == llm_mod.SRC_TEXT, text_e, 0.0)
        emb = jnp.where(st == llm_mod.SRC_SPEECH, speech_e, emb)
        emb = jnp.where(st == llm_mod.SRC_SPECIAL, special_e, emb)
        emb = jnp.where(st == llm_mod.SRC_SPK, spk_emb[:, None, :], emb)

        t = emb.shape[1]
        pad = mask_ops.make_non_pad_mask(seq_len, t)
        attn = mask_ops.add_optional_chunk_mask(pad, 0) \
            & mask_ops.causal_mask(t)[None]
        h = self.llm(emb, attn, pad.astype(emb.dtype))
        logits = self.llm_decoder(h)
        loss = losses.label_smoothing_ce(logits, target, self.cfg.lsm_weight)
        acc = losses.accuracy(logits, target)
        return loss, acc
