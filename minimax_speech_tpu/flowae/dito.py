"""DiTo — diffusion-tokenizer autoencoder (audio variant).

Reference: flowae/models/ldm/dito.py:15-331 + ldm_base.py:13-667:
  encoder (strided conv stack) -> DiagonalGaussian z -> diffusion
  renderer (DiT conditioned on z_dec) trained with the FM loss; decoding
  = FM Euler sampling conditioned on z_dec; optional renderer CFG with a
  learned drop-z embedding; EMA renderer for eval; z normalization.

Compact TPU-native re-design: pure flax modules + functional FM; the
trainer (flowae/trainer.py) owns EMA and the bf16 step.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from minimax_speech_tpu.flowae import fm as fm_lib
from minimax_speech_tpu.flowae.consistency_unet import (ConsistencyUNet,
                                                        ConsistencyUNetConfig)
from minimax_speech_tpu.flowae.dit import DiT1D, DiTConfig
from minimax_speech_tpu.ops import safe_conv


@dataclass(frozen=True)
class DiToConfig:
    in_channels: int = 1           # waveform
    z_dim: int = 32
    enc_channels: int = 64
    enc_strides: tuple = (4, 4, 4)  # total downsample 64x
    renderer_type: str = "dit"     # 'dit' | 'unet' (consistency decoder,
    # reference: consistency_audio_decoder_unet.py AudioDiffusionUNet)
    renderer: DiTConfig = field(default_factory=lambda: DiTConfig(
        hidden=192, depth=6, num_heads=6, patch=16, in_channels=1,
        out_channels=1, cond_dim=32))
    unet: ConsistencyUNetConfig = field(
        default_factory=lambda: ConsistencyUNetConfig(dims=1))
    fm: fm_lib.FMConfig = field(default_factory=fm_lib.FMConfig)
    render_n_steps: int = 18
    renderer_guidance: float = 1.0
    z_std_target: float = 1.0


class ConvEncoder(nn.Module):
    cfg: DiToConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        h = x
        ch = c.enc_channels
        for i, s in enumerate(c.enc_strides):
            h = safe_conv.SlicedConv(ch, (2 * s,), strides=(s,),
                                     padding="SAME",
                                     name=f"down_{i}")(h)
            h = nn.silu(nn.GroupNorm(num_groups=8, name=f"norm_{i}")(h))
            ch *= 2
        h = nn.Conv(2 * c.z_dim, (3,), padding="SAME", name="head")(h)
        return h  # (B, T/prod(strides), 2*z_dim) -> (mu, logvar)


class DiToAudio(nn.Module):
    cfg: DiToConfig = DiToConfig()

    def setup(self):
        import dataclasses

        self.encoder = ConvEncoder(self.cfg)
        if self.cfg.renderer_type == "unet":
            self.renderer = ConsistencyUNet(dataclasses.replace(
                self.cfg.unet, dims=1, in_channels=self.cfg.in_channels,
                out_channels=self.cfg.in_channels,
                z_dec_channels=self.cfg.z_dim))
        else:
            self.renderer = DiT1D(self.cfg.renderer)
        # learned unconditional embedding for renderer CFG
        # (reference: dito.py drop_z_emb)
        self.drop_z_emb = self.param("drop_z_emb",
                                     nn.initializers.normal(0.02),
                                     (1, 1, self.cfg.z_dim))

    def encode(self, x, key: Optional[jax.Array] = None):
        """x: (B, T, C) -> (z, mu, logvar), DiagonalGaussian reparam
        (reference: ldm_base.py DiagonalGaussian)."""
        h = self.encoder(x)
        mu, logvar = jnp.split(h, 2, axis=-1)
        logvar = jnp.clip(logvar, -30.0, 20.0)
        if key is None:
            return mu, mu, logvar
        z = mu + jnp.exp(0.5 * logvar) * jax.random.normal(key, mu.shape)
        return z, mu, logvar

    def render_net(self, x_t, t, z_dec):
        return self.renderer(x_t, t, z_dec=z_dec)

    def loss(self, x, key, zaug_p: float = 0.0):
        """FM reconstruction loss through the latent bottleneck
        (+ optional z-aug: replace z with the drop embedding with prob
        zaug_p to train the unconditional branch)."""
        k_enc, k_fm, k_drop = jax.random.split(key, 3)
        z, mu, logvar = self.encode(x, k_enc)
        if zaug_p > 0:
            drop = jax.random.bernoulli(k_drop, zaug_p, (x.shape[0], 1, 1))
            z = jnp.where(drop, jnp.broadcast_to(self.drop_z_emb, z.shape), z)
        kl = jnp.mean(0.5 * (mu ** 2 + jnp.exp(logvar) - logvar - 1.0))
        rec = fm_lib.fm_loss(self.render_net, k_fm, x, self.cfg.fm,
                             net_kwargs={"z_dec": z})
        return rec, kl, z


def dito_decode(model: DiToAudio, variables, z, out_len: int, key,
                n_steps: Optional[int] = None,
                guidance: Optional[float] = None):
    """Sample a waveform from latents by FM Euler integration."""
    cfg = model.cfg
    n_steps = n_steps or cfg.render_n_steps
    guidance = guidance if guidance is not None else cfg.renderer_guidance

    def net(x_t, t, z_dec):
        return model.apply(variables, x_t, t, z_dec,
                           method=DiToAudio.render_net)

    uncond = None
    if guidance != 1.0:
        drop = variables["params"]["drop_z_emb"]
        uncond = {"z_dec": jnp.broadcast_to(drop, z.shape)}
    shape = (z.shape[0], out_len, cfg.in_channels)
    return fm_lib.euler_sample(net, shape, n_steps, cfg.fm, key=key,
                               net_kwargs={"z_dec": z},
                               uncond_net_kwargs=uncond, guidance=guidance)
