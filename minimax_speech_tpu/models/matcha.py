"""Matcha-TTS standalone track: text encoder + MAS + duration + CFM.

The reference vendors a full Matcha-TTS (reference: speech/matcha/
models/matcha_tts.py:23-230, components/text_encoder.py:70-380):
  * TextEncoder: embedding -> conv prenet -> transformer blocks ->
    mu_x projection; DurationPredictor: conv+norm stack -> log durations
  * training: monotonic alignment search (the Cython kernel; here
    ops/monotonic_align.py) aligns text to mels; losses = duration MSE +
    prior NLL + CFM reconstruction
  * synthesis: predicted durations expand mu_x to frame rate, CFM decodes

The CFM decoder reuses models/decoder_unet.py + models/cfm.py (matcha's
BASECFM is the ancestor of the cosyvoice CFM we already implement).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from minimax_speech_tpu.models import cfm as cfm_lib
from minimax_speech_tpu.models.decoder_unet import (CausalConditionalDecoder,
                                                    DecoderUNetConfig)
from minimax_speech_tpu.ops import masks as mask_ops
from minimax_speech_tpu.ops import monotonic_align as ma
from minimax_speech_tpu.ops import rope as rope_ops


@dataclass(frozen=True)
class MatchaConfig:
    n_vocab: int = 178
    n_feats: int = 80
    hidden: int = 192
    n_heads: int = 2
    n_layers: int = 6
    filter_channels: Optional[int] = None  # FFN width; None -> 4*hidden
    enc_kernel: int = 3
    prenet_kernel: int = 5
    dp_kernel: int = 3
    dp_filters: int = 256
    rope_base: float = 10000.0
    unet: DecoderUNetConfig = field(default_factory=lambda: DecoderUNetConfig(
        in_channels=160, out_channels=80, channels=(256,),
        attention_head_dim=64, n_blocks=1, num_mid_blocks=2, num_heads=4))
    cfm: cfm_lib.CFMConfig = field(default_factory=lambda: cfm_lib.CFMConfig(
        use_immiscible=False, use_contrastive_fm=False,
        training_cfg_rate=0.0, inference_cfg_rate=0.0))
    n_timesteps: int = 10


class ChanLayerNorm(nn.Module):
    """glow-tts LayerNorm: normalize over channels with eps 1e-4
    (reference: text_encoder.py:15-33; channel-last here)."""
    eps: float = 1e-4

    @nn.compact
    def __call__(self, x):
        g = self.param("gamma", nn.initializers.ones, (x.shape[-1],))
        b = self.param("beta", nn.initializers.zeros, (x.shape[-1],))
        m = jnp.mean(x, -1, keepdims=True)
        v = jnp.mean((x - m) ** 2, -1, keepdims=True)
        return (x - m) * jax.lax.rsqrt(v + self.eps) * g + b


class ConvReluNorm(nn.Module):
    """Residual conv prenet with a zero-init projection
    (reference: text_encoder.py:36-68)."""
    hidden: int
    kernel: int = 5
    n_layers: int = 3

    @nn.compact
    def __call__(self, x, mask):
        h = x
        for i in range(self.n_layers):
            h = nn.Conv(self.hidden, (self.kernel,), padding="SAME",
                        name=f"conv_{i}")(h * mask)
            h = ChanLayerNorm(name=f"norm_{i}")(h)
            h = nn.relu(h)
        h = nn.Dense(x.shape[-1], kernel_init=nn.initializers.zeros,
                     name="proj")(h)
        return (x + h) * mask


class RotaryAttention(nn.Module):
    """Self-attention with PARTIAL rotary embeddings: RoPE on the first
    half of each head's dims, the rest passes through
    (reference: text_encoder.py:97-174 RotaryPositionalEmbeddings with
    d = k_channels * 0.5, 175-250 MultiHeadAttention)."""
    heads: int
    rope_base: float = 10000.0

    @nn.compact
    def __call__(self, x, bias):
        b, t, c = x.shape
        hd = c // self.heads
        q = nn.Dense(c, name="conv_q")(x).reshape(b, t, self.heads, hd)
        k = nn.Dense(c, name="conv_k")(x).reshape(b, t, self.heads, hd)
        v = nn.Dense(c, name="conv_v")(x).reshape(b, t, self.heads, hd)
        d_rope = int(hd * 0.5)
        cos, sin = rope_ops.rope_cos_sin(t, d_rope, self.rope_base,
                                         dtype=x.dtype)
        qr, kr = rope_ops.apply_rope(q[..., :d_rope], k[..., :d_rope],
                                     cos, sin)
        q = jnp.concatenate([qr, q[..., d_rope:]], -1)
        k = jnp.concatenate([kr, k[..., d_rope:]], -1)
        w = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(hd)
        w = jax.nn.softmax(w.astype(jnp.float32) + bias, -1).astype(x.dtype)
        a = jnp.einsum("bhqk,bkhd->bqhd", w, v).reshape(b, t, c)
        return nn.Dense(c, name="conv_o")(a)


class FFN(nn.Module):
    """conv -> relu -> conv with masking between
    (reference: text_encoder.py:253-275)."""
    filters: int
    kernel: int

    @nn.compact
    def __call__(self, x, mask):
        h = nn.Conv(self.filters, (self.kernel,), padding="SAME",
                    name="conv_1")(x * mask)
        h = nn.relu(h)
        h = nn.Conv(x.shape[-1], (self.kernel,), padding="SAME",
                    name="conv_2")(h * mask)
        return h * mask


class DurationPredictor(nn.Module):
    """conv -> relu -> LN x2 -> 1x1 (reference: text_encoder.py:71-94)."""
    filters: int
    kernel: int

    @nn.compact
    def __call__(self, x, mask):
        m = mask[..., None]
        h = nn.Conv(self.filters, (self.kernel,), padding="SAME",
                    name="conv_1")(x * m)
        h = ChanLayerNorm(name="norm_1")(nn.relu(h))
        h = nn.Conv(self.filters, (self.kernel,), padding="SAME",
                    name="conv_2")(h * m)
        h = ChanLayerNorm(name="norm_2")(nn.relu(h))
        return nn.Dense(1, name="proj")(h * m)[..., 0] * mask


class TextEncoder(nn.Module):
    """Weight-compatible port of the glow-tts/Matcha text encoder
    (reference: text_encoder.py:278-410): scaled embedding ->
    ConvReluNorm prenet -> n_layers of {rotary MHA, chan-LN, conv FFN,
    chan-LN} -> mu projection + duration predictor on detached
    features."""
    cfg: MatchaConfig

    @nn.compact
    def __call__(self, tokens, token_len):
        c = self.cfg
        t = tokens.shape[1]
        mask = mask_ops.make_non_pad_mask(token_len, t).astype(jnp.float32)
        m3 = mask[..., None]
        h = nn.Embed(c.n_vocab, c.hidden, name="emb")(tokens)
        h = h * np.sqrt(c.hidden)
        h = ConvReluNorm(c.hidden, c.prenet_kernel, name="prenet")(h, m3)
        # (B,1,T,T) additive bias; the reference uses -1e4 (masked_fill)
        bias = jnp.where((mask[:, None, :, None]
                          * mask[:, None, None, :]) > 0, 0.0, -1e4)
        filters = c.filter_channels or 4 * c.hidden
        for i in range(c.n_layers):
            h = h * m3
            y = RotaryAttention(c.n_heads, c.rope_base,
                                name=f"attn_{i}")(h, bias)
            h = ChanLayerNorm(name=f"norm1_{i}")(h + y)
            y = FFN(filters, c.enc_kernel, name=f"ffn_{i}")(h, m3)
            h = ChanLayerNorm(name=f"norm2_{i}")(h + y)
        h = h * m3
        mu_x = nn.Dense(c.n_feats, name="proj_m")(h) * m3
        logw = DurationPredictor(c.dp_filters, c.dp_kernel,
                                 name="dp")(jax.lax.stop_gradient(h), mask)
        return mu_x, logw, mask


class MatchaTTS(nn.Module):
    cfg: MatchaConfig = MatchaConfig()

    def setup(self):
        self.encoder = TextEncoder(self.cfg)
        self.decoder = CausalConditionalDecoder(self.cfg.unet)

    def estimate(self, x, mask, mu, t, spks, cond, streaming=False):
        return self.decoder(x, mask, mu, t, spks, cond, streaming=streaming)

    def __call__(self, tokens, token_len, mels, mel_len, key):
        """Training losses (reference: matcha_tts.py forward):
        returns (dur_loss, prior_loss, cfm_loss)."""
        c = self.cfg
        mu_x, logw, x_mask = self.encoder(tokens, token_len)
        tf = mels.shape[1]
        y_mask = mask_ops.make_non_pad_mask(mel_len, tf).astype(jnp.float32)

        # MAS on the Gaussian prior log-likelihood (matcha_tts.py:150-170)
        const = -0.5 * np.log(2 * np.pi) * c.n_feats
        # logp[b, x, y] = sum_d -0.5 (mel[y,d] - mu[x,d])^2 + const
        logp = (-0.5 * (jnp.sum(mels ** 2, -1)[:, None, :]
                        - 2 * jnp.einsum("bxd,byd->bxy", mu_x, mels)
                        + jnp.sum(mu_x ** 2, -1)[:, :, None]) + const)
        attn_mask = (x_mask[:, :, None] * y_mask[:, None, :]) > 0
        path = ma.maximum_path(logp, attn_mask)  # (B, Tx, Ty)
        path = jax.lax.stop_gradient(path)

        # duration loss on log(1 + counts) (matcha_tts.py:172-177)
        dur = jnp.sum(path, axis=-1)
        logw_gt = jnp.log(1e-8 + dur) * x_mask
        dur_loss = jnp.sum((logw - logw_gt) ** 2) / jnp.maximum(
            jnp.sum(x_mask), 1.0)

        # prior loss (matcha_tts.py:194-197)
        mu_y = jnp.einsum("bxy,bxd->byd", path, mu_x)
        prior = 0.5 * ((mels - mu_y) ** 2 + np.log(2 * np.pi)) \
            * y_mask[..., None]
        prior_loss = jnp.sum(prior) / jnp.maximum(
            jnp.sum(y_mask) * c.n_feats, 1.0)

        # CFM loss conditioned on mu_y
        spks = jnp.zeros((mels.shape[0], c.n_feats))
        cfm_loss, _ = cfm_lib.compute_loss(
            lambda p, *a: self.estimate(*a), None, key, mels, y_mask, mu_y,
            spks, jnp.zeros_like(mels), c.cfm)
        return dur_loss, prior_loss, cfm_loss

    def synthesise_mu(self, tokens, token_len, length_scale: float = 1.0,
                      max_frames: int = 1000):
        """Durations -> frame-aligned mu (host-free, fixed max_frames)."""
        c = self.cfg
        mu_x, logw, x_mask = self.encoder(tokens, token_len)
        w = jnp.exp(logw) * x_mask * length_scale
        dur = jnp.ceil(w).astype(jnp.int32)
        ends = jnp.cumsum(dur, axis=-1)
        starts = ends - dur
        frames = jnp.arange(max_frames)
        # expand: frame f takes text position x with start<=f<end
        inside = ((frames[None, None, :] >= starts[:, :, None])
                  & (frames[None, None, :] < ends[:, :, None]))
        path = inside.astype(mu_x.dtype)
        mu_y = jnp.einsum("bxf,bxd->bfd", path, mu_x)
        y_len = jnp.minimum(ends[jnp.arange(tokens.shape[0]),
                                 jnp.maximum(token_len - 1, 0)], max_frames)
        return mu_y, y_len


def matcha_synthesise(model: MatchaTTS, variables, tokens, token_len, key,
                      n_timesteps: Optional[int] = None,
                      length_scale: float = 1.0, max_frames: int = 1000,
                      temperature: float = 0.667):
    """Full synthesis: text -> mel (reference: matcha_tts.py synthesise)."""
    c = model.cfg
    mu_y, y_len = model.apply(variables, tokens, token_len, length_scale,
                              max_frames, method=MatchaTTS.synthesise_mu)
    tf = mu_y.shape[1]
    mask = mask_ops.make_non_pad_mask(y_len, tf).astype(mu_y.dtype)
    z = jax.random.normal(key, mu_y.shape) * temperature

    def est(_, x, m_, mu_, t_, s_, c_, streaming_):
        return model.apply(variables, x, m_, mu_, t_, s_, c_, streaming_,
                           method=MatchaTTS.estimate)

    spks = jnp.zeros((mu_y.shape[0], c.n_feats))
    mel = cfm_lib.solve_euler(est, None, z, mu_y, mask, spks,
                              jnp.zeros_like(mu_y),
                              n_timesteps or c.n_timesteps, c.cfm)
    return mel, y_len
