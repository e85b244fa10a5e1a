"""GLPTo — GAN + perceptual autoencoder variant (flowae track).

Reference: flowae/models/ldm/glpto.py:14-137: same encoder/latent as
DiTo but the renderer is a feed-forward decoder trained with L1 +
perceptual + adversarial losses, with the adaptive GAN weight
lambda = ||grad_rec|| / (||grad_gan|| + eps) computed at the last
decoder layer. LPIPS needs pretrained VGG (unavailable offline), so the
perceptual term is a multi-resolution spectral loss for audio — the
audio-domain analogue the reference's audio configs use anyway.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from minimax_speech_tpu.flowae.dito import ConvEncoder, DiToConfig
from minimax_speech_tpu.models.discriminators import MSD
from minimax_speech_tpu.train.steps import TrainState
from minimax_speech_tpu.utils import audio_losses, losses
from minimax_speech_tpu.ops import safe_conv


@dataclass(frozen=True)
class GLPToConfig:
    in_channels: int = 1
    z_dim: int = 32
    enc_channels: int = 32
    enc_strides: Tuple[int, ...] = (4, 4, 4)
    disc_start: int = 0
    gan_weight: float = 1.0
    kl_weight: float = 1e-4
    perceptual_weight: float = 1.0


class ConvDecoder(nn.Module):
    cfg: GLPToConfig

    @nn.compact
    def __call__(self, z):
        c = self.cfg
        ch = c.enc_channels * (2 ** len(c.enc_strides))
        h = nn.Conv(ch, (3,), padding="SAME", name="head")(z)
        for i, s in enumerate(reversed(c.enc_strides)):
            h = nn.silu(nn.GroupNorm(num_groups=8, name=f"norm_{i}")(h))
            h = safe_conv.ConvTranspose1dSafe(ch // 2, 2 * s, s,
                                              name=f"up_{i}")(h)
            ch //= 2
        h = nn.Conv(c.in_channels, (7,), padding="SAME", name="out")(h)
        return jnp.tanh(h)


class GLPToAudio(nn.Module):
    cfg: GLPToConfig = GLPToConfig()

    def setup(self):
        dito_like = DiToConfig(z_dim=self.cfg.z_dim,
                               enc_channels=self.cfg.enc_channels,
                               enc_strides=self.cfg.enc_strides)
        self.encoder = ConvEncoder(dito_like)
        self.decoder = ConvDecoder(self.cfg)

    def encode(self, x, key=None):
        h = self.encoder(x)
        mu, logvar = jnp.split(h, 2, axis=-1)
        logvar = jnp.clip(logvar, -30.0, 20.0)
        if key is None:
            return mu, mu, logvar
        z = mu + jnp.exp(0.5 * logvar) * jax.random.normal(key, mu.shape)
        return z, mu, logvar

    def decode(self, z):
        return self.decoder(z)

    def __call__(self, x, key=None):
        z, mu, logvar = self.encode(x, key)
        return self.decode(z), mu, logvar


def make_glpto_steps(model: GLPToAudio, discriminator: MSD | nn.Module,
                     cfg: GLPToConfig, sample_rate: int = 24000):
    """(gen_step, disc_step) with the adaptive GAN weight
    (reference: glpto.py calculate_adaptive_weight)."""

    def recon_losses(fake, real):
        l1 = audio_losses.l1_loss(fake, real)
        spec = audio_losses.multi_scale_stft_loss(
            fake[..., 0], real[..., 0], (512, 128))
        return l1 + cfg.perceptual_weight * spec

    def gen_step(g_state: TrainState, d_params, batch, key):
        x = batch["audio"]

        def parts(params):
            rec, mu, logvar = model.apply({"params": params}, x, key)
            nll = recon_losses(rec, x)
            kl = jnp.mean(0.5 * (mu ** 2 + jnp.exp(logvar) - logvar - 1.0))
            scores, _ = discriminator.apply({"params": d_params},
                                            rec[..., 0])
            g_adv = losses.generator_adv_loss([scores] if not
                                              isinstance(scores, list)
                                              else scores)
            return nll, kl, g_adv

        # adaptive weight: ratio of grad norms of nll vs adv w.r.t. params
        g_nll = jax.grad(lambda p: parts(p)[0])(g_state.params)
        g_adv_grads = jax.grad(lambda p: parts(p)[2])(g_state.params)
        n_nll = optax.global_norm(g_nll)
        n_adv = optax.global_norm(g_adv_grads)
        adaptive = jnp.clip(n_nll / (n_adv + 1e-4), 0.0, 1e4)
        use_gan = (g_state.step >= cfg.disc_start).astype(jnp.float32)

        def loss_fn(params):
            nll, kl, g_adv = parts(params)
            total = nll + cfg.kl_weight * kl \
                + use_gan * cfg.gan_weight * adaptive * g_adv
            return total, {"nll": nll, "kl": kl, "g_adv": g_adv,
                           "adaptive_w": adaptive}

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            g_state.params)
        g_state = g_state.apply_gradients(grads)
        return g_state, {"gen/loss": loss, **{f"gen/{k}": v
                                              for k, v in aux.items()}}

    def disc_step(d_state: TrainState, g_params, batch, key):
        x = batch["audio"]

        def loss_fn(d_params):
            rec, _, _ = model.apply({"params": g_params}, x, key)
            real_s, _ = discriminator.apply({"params": d_params}, x[..., 0])
            fake_s, _ = discriminator.apply(
                {"params": d_params}, jax.lax.stop_gradient(rec[..., 0]))
            rs = real_s if isinstance(real_s, list) else [real_s]
            fs = fake_s if isinstance(fake_s, list) else [fake_s]
            return losses.discriminator_loss(rs, fs)

        loss, grads = jax.value_and_grad(loss_fn)(d_state.params)
        d_state = d_state.apply_gradients(grads)
        return d_state, {"disc/loss": loss}

    return gen_step, disc_step
