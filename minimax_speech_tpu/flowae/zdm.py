"""ZDM — latent ("z-space") diffusion prior over a flowae autoencoder.

Reference: flowae/models/ldm/ldm_base.py ZDM paths (zdm_net + zdm
diffusion loss + normalize_for_zdm, :259-331; generate_samples
:379-420; audio variant's stateless per-frame LayerNorm z
normalization, :547-556) and the zaug z-noising augmentation
(:586-607). Composition: a (frozen or jointly trained) DiTo/GLPTo
autoencoder provides z; the ZDM is a DiT over z trained with the same
FM objective; unconditional generation = FM-sample z from the prior,
then decode through the AE's renderer.

TPU-native choices: the audio variant's affine-free LayerNorm replaces
the image variant's running-scalar z statistics (stateless, jit-pure —
the running-stat buffers in the reference are host-side floats updated
every step, hostile to a compiled step); zaug noises z with the FM
forward process at a random t <= zaug_tmax with probability zaug_p.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from minimax_speech_tpu.flowae import fm as fm_lib
from minimax_speech_tpu.flowae.dit import DiT1D, DiTConfig
from minimax_speech_tpu.flowae.dito import DiToAudio, dito_decode
from minimax_speech_tpu.flowae.trainer import ema_update
from minimax_speech_tpu.train.steps import TrainState


@dataclass(frozen=True)
class ZDMConfig:
    z_dim: int = 32
    net: DiTConfig = field(default_factory=lambda: DiTConfig(
        hidden=128, depth=4, num_heads=4, patch=1, in_channels=32,
        out_channels=32, cond_dim=0))
    fm: fm_lib.FMConfig = field(default_factory=fm_lib.FMConfig)
    n_steps: int = 18
    guidance: float = 1.0
    ema_rate: float = 0.9999
    zaug_p: float = 0.1          # reference: ldm_base.py:487 zaug_p
    zaug_tmax: float = 1.0


def normalize_latents(z: jnp.ndarray) -> jnp.ndarray:
    """Per-frame affine-free LayerNorm over the z channel dim
    (reference: LDMBaseAudio.normalize_latents, ldm_base.py:547-556)."""
    mean = jnp.mean(z, axis=-1, keepdims=True)
    var = jnp.var(z, axis=-1, keepdims=True)
    return (z - mean) / jnp.sqrt(var + 1e-5)


class ZDMNet(nn.Module):
    """Unconditional DiT over latent frames: x (B, Tz, z_dim), t (B,)."""
    cfg: ZDMConfig = ZDMConfig()

    @nn.compact
    def __call__(self, x, t, z_dec=None):
        return DiT1D(self.cfg.net, name="dit")(x, t, z_dec=z_dec)


def zaug(key: jax.Array, z: jnp.ndarray, cfg: ZDMConfig) -> jnp.ndarray:
    """z augmentation: with prob zaug_p, replace z by its FM-noised
    version at a random t (reference: ldm_base.py:586-607)."""
    k_t, k_n, k_m = jax.random.split(key, 3)
    tz = jax.random.uniform(k_t, (z.shape[0],)) * cfg.zaug_tmax
    zt, _ = fm_lib.add_noise(k_n, z, tz, cfg.fm)
    mask = jax.random.bernoulli(k_m, cfg.zaug_p, (z.shape[0], 1, 1))
    return jnp.where(mask, zt, z)


def make_zdm_step(zdm: ZDMNet, ae: DiToAudio, ae_variables,
                  ema_decay: Optional[float] = None):
    """ZDM training step: encode the batch with the FROZEN autoencoder
    (stop-gradient — the reference's has_optimizer grad plan with only
    'zdm' enabled, ldm_base.py:354-362), normalize, FM loss on the
    prior net. Returns step(state, ema_params, batch{'audio'}, key)."""
    cfg = zdm.cfg
    decay = ema_decay if ema_decay is not None else cfg.ema_rate

    def step(state: TrainState, ema_params, batch, key):
        k_enc, k_fm = jax.random.split(key)
        _, mu, _ = ae.apply(ae_variables, batch["audio"], k_enc,
                            method=DiToAudio.encode)
        z = normalize_latents(jax.lax.stop_gradient(mu))

        def loss_fn(params):
            def net(x_t, t, **kw):
                return zdm.apply({"params": params}, x_t, t)
            return fm_lib.fm_loss(net, k_fm, z, cfg.fm)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        state = state.apply_gradients(grads)
        ema_params = ema_update(ema_params, state.params, decay)
        return state, ema_params, {"zdm/loss": loss,
                                   "zdm/grad_norm": optax.global_norm(grads)}

    return step


def zdm_generate(zdm: ZDMNet, zdm_variables, ae: DiToAudio, ae_variables,
                 batch_size: int, z_frames: int, out_len: int, key,
                 n_steps: Optional[int] = None,
                 render_steps: Optional[int] = None,
                 return_z: bool = False):
    """Unconditional generation (reference: generate_samples,
    ldm_base.py:379-420): FM-sample normalized z from the prior, decode
    through the AE renderer. Returns (B, out_len, C) audio."""
    cfg = zdm.cfg
    k_z, k_dec = jax.random.split(key)

    def net(x_t, t, **kw):
        return zdm.apply(zdm_variables, x_t, t)

    z = fm_lib.euler_sample(net, (batch_size, z_frames, cfg.z_dim),
                            n_steps or cfg.n_steps, cfg.fm, key=k_z)
    if return_z:
        return z
    return dito_decode(ae, ae_variables, z, out_len, k_dec,
                       n_steps=render_steps)


def eval_zdm(zdm: ZDMNet, variables, ae: DiToAudio, ae_variables,
             audio, key):
    """Held-out prior loss + a sampled batch's latent moments
    (reference: audio_ldm_trainer.py ZDM eval, :298-558)."""
    k_enc, k_fm, k_gen = jax.random.split(key, 3)
    _, mu, _ = ae.apply(ae_variables, audio, method=DiToAudio.encode)
    z = normalize_latents(mu)

    def net(x_t, t, **kw):
        return zdm.apply(variables, x_t, t)

    loss = fm_lib.fm_loss(net, k_fm, z, zdm.cfg.fm)
    sample = fm_lib.euler_sample(net, z.shape, zdm.cfg.n_steps, zdm.cfg.fm,
                                 key=k_gen)
    return {"zdm_eval/loss": loss,
            "zdm_eval/sample_mean": jnp.mean(sample),
            "zdm_eval/sample_std": jnp.std(sample)}
