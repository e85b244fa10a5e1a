"""Legacy CosyVoice1-era mel-target flow: MaskedDiffWithXvec.

The NON-causal predecessor of models/flow.py's causal latent flow
(reference: speech/cosyvoice/flow/flow.py:25-198): token embedding ->
plain (full-attention) conformer encoder -> Dense proj to 80 ->
InterpolateRegulator (linear resample to the mel grid, 22050/256 Hz) ->
non-causal conditional UNet (with real down/upsampling when
len(channels) > 1, reference: flow/decoder.py:88-294) solved by the
same OT-CFM module. CosyVoice1-era checkpoints load through
utils/convert.legacy_flow_params.

TPU notes: the regulator's linear interpolation is the static-gather
form (ops/interpolate.py); Down/Upsample1D ride ops/safe_conv (the
backend miscompiles reverse-mode grads of strided/lhs-dilated convs —
see CLAUDE.md); inference pads the mel grid to a static bucket so one
compiled program serves all lengths.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from minimax_speech_tpu.models import cfm
from minimax_speech_tpu.models import conformer as cf
from minimax_speech_tpu.models.decoder_unet import (TimestepEmbedding,
                                                    UNetTransformerBlock,
                                                    sinusoidal_pos_emb)
from minimax_speech_tpu.ops import interpolate as interp
from minimax_speech_tpu.ops import masks as mask_ops
from minimax_speech_tpu.ops.safe_conv import (ConvTranspose1dSafe,
                                              strided_conv1d)


class DownConv1d(nn.Module):
    """torch Conv1d(dim, dim_out, 3, stride=2, padding=1) exactly (pad
    (1,1), out = ceil(T/2)), via the backend-safe strided form."""
    features: int

    @nn.compact
    def __call__(self, x):
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (3, x.shape[-1], self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return strided_conv1d(x, w, 2, (1, 1)) + b


@dataclass(frozen=True)
class LegacyUNetConfig:
    """Non-causal ConditionalDecoder geometry (reference:
    flow/flow.py:38-66 decoder_conf)."""
    # packed x+mu+spks+cond = 4 x 80 (the reference's decoder_conf says
    # 240 but its forward packs all four 80-dim parts, flow/decoder.py
    # :231-237 — 320 is what the conv actually needs)
    in_channels: int = 320
    out_channels: int = 80
    channels: Tuple[int, ...] = (256, 256)
    attention_head_dim: int = 64
    n_blocks: int = 4
    num_mid_blocks: int = 12
    num_heads: int = 8


@dataclass(frozen=True)
class LegacyEncoderConfig:
    """Plain (non-upsampling) conformer text encoder (reference
    CosyVoice1 yaml flow.encoder: linear input, rel-pos attention)."""
    input_size: int = 512
    output_size: int = 512
    attention_heads: int = 8
    linear_units: int = 2048
    num_blocks: int = 6
    key_bias: bool = True


@dataclass(frozen=True)
class LegacyFlowConfig:
    input_size: int = 512
    output_size: int = 80
    spk_embed_dim: int = 192
    vocab_size: int = 4096
    input_frame_rate: int = 50
    mel_rate: float = 22050.0 / 256.0
    n_timesteps: int = 10
    # conds: 50% of samples get a random prefix (< 30%) of the target
    # mel as prompt conditioning (reference: flow/flow.py:124-130)
    cond_prob: float = 0.5
    cond_max_frac: float = 0.3
    regulator_ratios: Tuple[int, ...] = (1,)   # conv stages in regulator
    encoder: LegacyEncoderConfig = field(default_factory=LegacyEncoderConfig)
    unet: LegacyUNetConfig = field(default_factory=LegacyUNetConfig)
    cfm: cfm.CFMConfig = field(default_factory=lambda: cfm.CFMConfig(
        use_contrastive_fm=False, use_immiscible=True, immiscible_k=8,
        training_cfg_rate=0.2, inference_cfg_rate=0.7))


class Block1D(nn.Module):
    """conv(k=3, same) -> GroupNorm(8) -> Mish, masked in/out
    (reference: matcha decoder.py:30-41; non-causal)."""
    dim_out: int
    groups: int = 8

    @nn.compact
    def __call__(self, x, mask):
        h = x * mask[..., None]
        h = nn.Conv(self.dim_out, (3,), padding=((1, 1),), name="conv")(h)
        h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5,
                         name="norm")(h)
        h = h * jnp.tanh(jax.nn.softplus(h))  # mish
        return h * mask[..., None]


class ResnetBlock1D(nn.Module):
    """block1 + timestep shift + block2 + 1x1 residual
    (reference: matcha decoder.py:44-59)."""
    dim_out: int

    @nn.compact
    def __call__(self, x, mask, t_emb):
        h = Block1D(self.dim_out, name="block1")(x, mask)
        shift = nn.Dense(self.dim_out, name="mlp")(
            t_emb * jnp.tanh(jax.nn.softplus(t_emb)))
        h = h + shift[:, None, :]
        h = Block1D(self.dim_out, name="block2")(h, mask)
        return h + nn.Dense(self.dim_out, name="res_conv")(
            x * mask[..., None])


class ConditionalDecoder(nn.Module):
    """Non-causal UNet velocity estimator with REAL down/upsampling
    (reference: flow/decoder.py:88-294). Full (pad-masked) attention in
    every transformer block; T halves per non-final down stage."""
    cfg: LegacyUNetConfig = LegacyUNetConfig()

    @nn.compact
    def __call__(self, x, mask, mu, t, spks=None, cond=None,
                 streaming: bool = False):
        # x/mu/cond: (B, T, 80); mask: (B, T) float; t: (B,)
        cfg = self.cfg
        del streaming  # the legacy decoder has no streaming mode
        t_emb = sinusoidal_pos_emb(t, cfg.in_channels)
        t_emb = TimestepEmbedding(cfg.channels[0] * 4,
                                  name="time_mlp")(t_emb)

        parts = [x, mu]
        if spks is not None:
            parts.append(jnp.broadcast_to(spks[:, None, :],
                                          (*x.shape[:2], spks.shape[-1])))
        if cond is not None:
            parts.append(cond)
        h = jnp.concatenate(parts, axis=-1)

        def attention(h, m, stage, i):
            bias = jnp.where(m[:, None, None, :] > 0, 0.0, -1e9
                             ).astype(jnp.float32)
            for j in range(cfg.n_blocks):
                h = UNetTransformerBlock(
                    cfg.num_heads, cfg.attention_head_dim,
                    name=f"{stage}_{i}_tf_{j}")(h, bias)
            return h

        hiddens, msks = [], [mask]
        n_down = len(cfg.channels)
        for i, ch in enumerate(cfg.channels):
            m = msks[-1]
            h = ResnetBlock1D(ch, name=f"down_{i}_resnet")(h, m, t_emb)
            h = attention(h, m, "down", i)
            hiddens.append(h)
            if i != n_down - 1:
                h = DownConv1d(ch, name=f"down_{i}_conv")(
                    h * m[..., None])
                msks.append(m[:, ::2])
            else:
                h = nn.Conv(ch, (3,), padding=((1, 1),),
                            name=f"down_{i}_conv")(h * m[..., None])
                msks.append(m)
        msks = msks[:-1]

        m = msks[-1]
        for i in range(cfg.num_mid_blocks):
            h = ResnetBlock1D(cfg.channels[-1],
                              name=f"mid_{i}_resnet")(h, m, t_emb)
            h = attention(h, m, "mid", i)

        up_channels = cfg.channels[::-1] + (cfg.channels[0],)
        for i in range(len(up_channels) - 1):
            m = msks.pop()
            skip = hiddens.pop()
            h = jnp.concatenate([h[:, : skip.shape[1]], skip], axis=-1)
            ch = up_channels[i + 1]
            h = ResnetBlock1D(ch, name=f"up_{i}_resnet")(h, m, t_emb)
            h = attention(h, m, "up", i)
            if i != len(up_channels) - 2:
                h = ConvTranspose1dSafe(ch, 4, 2,
                                        name=f"up_{i}_conv")(
                    h * m[..., None])
            else:
                h = nn.Conv(ch, (3,), padding=((1, 1),),
                            name=f"up_{i}_conv")(h * m[..., None])
        h = Block1D(up_channels[-1], name="final_block")(h, m)
        h = nn.Dense(self.cfg.out_channels, name="final_proj")(
            h * m[..., None])  # torch 1x1 conv == Dense
        return h * mask[..., None]


class InterpolateRegulator(nn.Module):
    """Linear resample to the mel grid + conv stack
    (reference: flow/length_regulator.py:21-51)."""
    channels: int
    n_stages: int = 1
    out_channels: Optional[int] = None

    @nn.compact
    def __call__(self, x, out_len: int, out_mask):
        # x: (B, T, C) -> (B, out_len, C'), masked by out_mask (B, out_len)
        h = interp.interpolate_linear(jnp.swapaxes(x, 1, 2), out_len)
        h = jnp.swapaxes(h, 1, 2)
        for i in range(self.n_stages):
            h = nn.Conv(self.channels, (3,), padding=((1, 1),),
                        name=f"conv_{i}")(h)
            h = nn.GroupNorm(num_groups=1, epsilon=1e-5,
                             name=f"norm_{i}")(h)
            h = h * jnp.tanh(jax.nn.softplus(h))  # mish
        h = nn.Dense(self.out_channels or self.channels,
                     name="out_proj")(h)  # torch 1x1 conv == Dense
        return h * out_mask[..., None]


class PlainConformerEncoder(nn.Module):
    """Full-attention (non-streaming, non-upsampling) conformer stack —
    the CosyVoice1 flow text encoder (linear input embed + rel-pos
    attention layers + final LayerNorm)."""
    cfg: LegacyEncoderConfig = LegacyEncoderConfig()

    @nn.compact
    def __call__(self, xs, xs_lens):
        cfg = self.cfg
        t = xs.shape[1]
        pad = mask_ops.make_non_pad_mask(xs_lens, t)
        xs = nn.Dense(cfg.output_size, name="embed_linear")(xs)
        xs = nn.LayerNorm(epsilon=1e-5, name="embed_norm")(xs)
        xs = xs * np.sqrt(cfg.output_size)
        xs = xs * pad[..., None].astype(xs.dtype)
        attn_mask = mask_ops.add_optional_chunk_mask(pad, 0)
        pos_emb = cf.espnet_rel_pos_emb(t, cfg.output_size, xs.dtype)
        for i in range(cfg.num_blocks):
            xs = cf.ConformerEncoderLayer(
                cfg.attention_heads, cfg.linear_units,
                key_bias=cfg.key_bias, d_model=cfg.output_size,
                name=f"layers_{i}")(xs, attn_mask, pos_emb,
                                    pad.astype(xs.dtype))
        return nn.LayerNorm(epsilon=1e-5, name="after_norm")(xs), pad


class MaskedDiffWithXvec(nn.Module):
    """Legacy mel-target flow (reference: flow/flow.py:25-198).

    __call__ = training loss; `inference` = prompt-conditioned mel
    generation. The x-vector is L2-normalized then projected to 80
    (spk_embed_affine_layer) exactly as the reference."""
    cfg: LegacyFlowConfig = LegacyFlowConfig()

    def setup(self):
        c = self.cfg
        self.input_embedding = nn.Embed(c.vocab_size, c.input_size)
        self.spk_embed_affine_layer = nn.Dense(c.output_size)
        self.encoder = PlainConformerEncoder(c.encoder)
        self.encoder_proj = nn.Dense(c.output_size)
        self.length_regulator = InterpolateRegulator(
            c.output_size, n_stages=len(c.regulator_ratios),
            out_channels=c.output_size)
        self.estimator = ConditionalDecoder(c.unet)

    def estimate(self, x, mask, mu, t, spks, cond, streaming=False):
        return self.estimator(x, mask, mu, t, spks, cond,
                              streaming=streaming)

    def _embed_tokens(self, token, token_len):
        t = token.shape[1]
        m = mask_ops.make_non_pad_mask(token_len, t)
        emb = self.input_embedding(jnp.maximum(token, 0))
        return emb * m[..., None].astype(emb.dtype)

    def _spk(self, embedding):
        emb = embedding / (jnp.linalg.norm(embedding, axis=-1,
                                           keepdims=True) + 1e-8)
        return self.spk_embed_affine_layer(emb)

    def __call__(self, token, token_len, feat, feat_len, embedding,
                 key: jax.Array):
        """Training loss. token: (B, Tt) int; feat: (B, Tf, 80) mel;
        embedding: (B, spk_embed_dim) raw x-vector."""
        c = self.cfg
        b, tf = feat.shape[0], feat.shape[1]
        spks = self._spk(embedding)

        h, _ = self.encoder(self._embed_tokens(token, token_len),
                            token_len)
        h = self.encoder_proj(h)
        fmask = mask_ops.make_non_pad_mask(feat_len, tf).astype(feat.dtype)
        h = self.length_regulator(h, tf, fmask)

        # prompt conditioning: 50% of samples keep a random prefix
        # (< 30% of their length) of the target mel (flow.py:124-130)
        k_keep, k_idx, k_cfm = jax.random.split(key, 3)
        keep = jax.random.uniform(k_keep, (b,)) < c.cond_prob
        frac = jax.random.uniform(k_idx, (b,)) * c.cond_max_frac
        idx = (frac * feat_len.astype(jnp.float32)).astype(jnp.int32)
        pos = jnp.arange(tf)[None, :]
        cond_mask = (pos < idx[:, None]) & keep[:, None]
        conds = jnp.where(cond_mask[..., None], feat, 0.0)

        loss, _ = cfm.compute_loss(
            lambda p, *a: self.estimate(*a), None, k_cfm,
            feat, fmask, h, spks, conds, c.cfm)
        return loss

    def prepare_inference(self, token, token_len, prompt_token,
                          prompt_token_len, prompt_feat, embedding):
        """Everything before the ODE solve: (mu, mask, spks, conds).
        Mel lengths are STATIC (from token.shape), so one compiled
        program serves a bucket (reference computes them dynamically,
        flow.py:168-171)."""
        c = self.cfg
        spks = self._spk(embedding)
        full = jnp.concatenate([prompt_token, token], axis=1)
        full_len = prompt_token_len + token_len
        h, _ = self.encoder(self._embed_tokens(full, full_len), full_len)
        h = self.encoder_proj(h)

        mel_len1 = prompt_feat.shape[1]
        mel_len2 = int(token.shape[1] / c.input_frame_rate * c.mel_rate)
        total = mel_len1 + mel_len2
        fmask = jnp.ones((h.shape[0], total), h.dtype)
        h = self.length_regulator(h, total, fmask)
        conds = jnp.concatenate(
            [prompt_feat,
             jnp.zeros((h.shape[0], mel_len2, c.output_size),
                       prompt_feat.dtype)], axis=1)
        return h, fmask, spks, conds


def legacy_flow_inference(model: MaskedDiffWithXvec, variables, token,
                          token_len, prompt_token, prompt_token_len,
                          prompt_feat, embedding, noise,
                          n_timesteps: Optional[int] = None):
    """Prompt-conditioned mel generation; returns (B, mel_len2, 80) —
    the generated region only (prompt mel cut, flow.py:196-197). The
    Euler scan lives OUTSIDE the flax scope (a lax.scan over a bound
    submodule leaks tracers; see models/flow.py:flow_inference)."""
    c = model.cfg
    mu, mask, spks, conds = model.apply(
        variables, token, token_len, prompt_token, prompt_token_len,
        prompt_feat, embedding,
        method=MaskedDiffWithXvec.prepare_inference)
    mel_len1 = prompt_feat.shape[1]

    def est_apply(_, x, m_, mu_, t_, s_, c_, streaming_):
        return model.apply(variables, x, m_, mu_, t_, s_, c_, streaming_,
                           method=MaskedDiffWithXvec.estimate)

    total = mu.shape[1]
    z = jnp.broadcast_to(noise[:, :total],
                         (mu.shape[0], total, c.output_size))
    mel = cfm.solve_euler(est_apply, None, z, mu, mask, spks, conds,
                          n_timesteps or c.n_timesteps, c.cfm)
    return mel[:, mel_len1:]


def init_legacy_flow_variables(model: MaskedDiffWithXvec, key,
                               batch: int = 1, tokens: int = 8):
    c = model.cfg
    tf = int(tokens / c.input_frame_rate * c.mel_rate) + 2
    tf += tf % 2  # even length so the UNet down/up path round-trips
    return model.init(
        key, jnp.zeros((batch, tokens), jnp.int32),
        jnp.full((batch,), tokens, jnp.int32),
        jnp.zeros((batch, tf, c.output_size)),
        jnp.full((batch,), tf, jnp.int32),
        jnp.zeros((batch, c.spk_embed_dim)), jax.random.PRNGKey(0))
