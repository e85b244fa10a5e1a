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


@dataclass(frozen=True)
class MatchaConfig:
    n_vocab: int = 178
    n_feats: int = 80
    hidden: int = 192
    n_heads: int = 2
    n_layers: int = 6
    ffn_mult: int = 4
    prenet_kernel: int = 5
    dp_kernel: int = 3
    dp_filters: int = 256
    unet: DecoderUNetConfig = field(default_factory=lambda: DecoderUNetConfig(
        in_channels=160, out_channels=80, channels=(256,),
        attention_head_dim=64, n_blocks=1, num_mid_blocks=2, num_heads=4))
    cfm: cfm_lib.CFMConfig = field(default_factory=lambda: cfm_lib.CFMConfig(
        use_immiscible=False, use_contrastive_fm=False,
        training_cfg_rate=0.0, inference_cfg_rate=0.0))
    n_timesteps: int = 10


class DurationPredictor(nn.Module):
    """conv -> LN -> relu x2 -> 1x1 (reference: text_encoder.py:328-380)."""
    filters: int
    kernel: int

    @nn.compact
    def __call__(self, x, mask):
        m = mask[..., None]
        h = x * m
        for i in range(2):
            h = nn.Conv(self.filters, (self.kernel,), padding="SAME",
                        name=f"conv_{i}")(h * 1.0)
            h = nn.relu(h)
            h = nn.LayerNorm(name=f"norm_{i}")(h)
            h = h * m
        return nn.Dense(1, name="proj")(h)[..., 0] * mask


class TextEncoder(nn.Module):
    cfg: MatchaConfig

    @nn.compact
    def __call__(self, tokens, token_len):
        c = self.cfg
        t = tokens.shape[1]
        mask = mask_ops.make_non_pad_mask(token_len, t).astype(jnp.float32)
        h = nn.Embed(c.n_vocab, c.hidden, name="emb")(tokens)
        h = h * np.sqrt(c.hidden)
        for i in range(3):  # conv prenet with residual
            r = nn.Conv(c.hidden, (c.prenet_kernel,), padding="SAME",
                        name=f"prenet_{i}")(h * mask[..., None])
            r = nn.LayerNorm(name=f"prenet_ln_{i}")(r)
            h = h + nn.relu(r)
        attn = mask_ops.add_optional_chunk_mask(mask > 0, 0)
        bias = mask_ops.mask_to_bias(attn[:, None], jnp.float32)
        for i in range(c.n_layers):
            q = nn.LayerNorm(name=f"ln1_{i}")(h)
            b_, tt, d = q.shape
            hd = d // c.n_heads
            qh = nn.Dense(d, name=f"q_{i}")(q).reshape(b_, tt, c.n_heads, hd)
            kh = nn.Dense(d, name=f"k_{i}")(q).reshape(b_, tt, c.n_heads, hd)
            vh = nn.Dense(d, name=f"v_{i}")(q).reshape(b_, tt, c.n_heads, hd)
            w = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) / np.sqrt(hd)
            w = jax.nn.softmax(w.astype(jnp.float32) + bias, -1).astype(h.dtype)
            a = jnp.einsum("bhqk,bkhd->bqhd", w, vh).reshape(b_, tt, d)
            h = h + nn.Dense(d, name=f"o_{i}")(a)
            f = nn.LayerNorm(name=f"ln2_{i}")(h)
            f = nn.Dense(c.ffn_mult * d, name=f"ff1_{i}")(f)
            h = h + nn.Dense(d, name=f"ff2_{i}")(nn.relu(f))
        h = h * mask[..., None]
        mu_x = nn.Dense(c.n_feats, name="proj_mu")(h) * mask[..., None]
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
