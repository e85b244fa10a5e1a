"""DiTo image track: 2-D diffusion-tokenizer AE + latent prior.

Reference: flowae/models/ldm/dito.py:14-184 (DiTo, image) +
ldm_base.py (DiagonalGaussian, ZDM paths) + trainers/ldm_trainer.py
(LDMTrainer: AE/ZDM train + PSNR/FID eval + grid visualization) +
configs/experiments/*-f8c4.yaml (f8 conv encoder -> 4-channel latents,
consistency_decoder_unet renderer, FM timescale 1000, 50 render steps).

TPU-first: NHWC layouts, one jitted train step; the renderer is either
the dims=2 ConsistencyUNet (reference's consistency_decoder_unet) or a
DiT2D; FID (torch_fidelity, GPU-bound in the reference) is replaced by
PSNR + latent-moment diagnostics that run on-device.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from minimax_speech_tpu.flowae import fm as fm_lib
from minimax_speech_tpu.flowae.consistency_unet import (ConsistencyUNet,
                                                        ConsistencyUNetConfig)
from minimax_speech_tpu.flowae.dit import DiT2D, DiTConfig
from minimax_speech_tpu.flowae.trainer import ema_update
from minimax_speech_tpu.flowae.zdm import normalize_latents
from minimax_speech_tpu.train.steps import TrainState
from minimax_speech_tpu.ops import safe_conv


@dataclass(frozen=True)
class DiToImageConfig:
    in_channels: int = 3
    z_dim: int = 4                  # f8c4: 4-channel latents
    enc_channels: int = 64
    enc_strides: tuple = (2, 2, 2)  # f8: total downsample 8x
    renderer_type: str = "unet"     # 'unet' (reference) | 'dit'
    unet: ConsistencyUNetConfig = field(
        default_factory=lambda: ConsistencyUNetConfig(dims=2))
    renderer: DiTConfig = field(default_factory=lambda: DiTConfig(
        hidden=192, depth=6, num_heads=6, patch=8, in_channels=3,
        out_channels=3, cond_dim=4))
    fm: fm_lib.FMConfig = field(
        default_factory=lambda: fm_lib.FMConfig(timescale=1000.0))
    render_n_steps: int = 50
    renderer_guidance: float = 1.0


class ConvEncoder2D(nn.Module):
    """Strided conv stack -> (mu, logvar) latent grid (the f8 encoder
    role; reference config: vqgan_encoder f8c4)."""
    cfg: DiToImageConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        h = x
        ch = c.enc_channels
        for i, s in enumerate(c.enc_strides):
            h = safe_conv.SlicedConv(ch, (2 * s, 2 * s), strides=(s, s),
                                     padding="SAME",
                        name=f"down_{i}")(h)
            g = 8 if ch % 8 == 0 else 1
            h = nn.silu(nn.GroupNorm(num_groups=g, name=f"norm_{i}")(h))
            ch *= 2
        h = nn.Conv(2 * c.z_dim, (3, 3), padding="SAME", name="head")(h)
        return h


class DiToImage(nn.Module):
    cfg: DiToImageConfig = DiToImageConfig()

    def setup(self):
        self.encoder = ConvEncoder2D(self.cfg)
        if self.cfg.renderer_type == "unet":
            self.renderer = ConsistencyUNet(dataclasses.replace(
                self.cfg.unet, dims=2, in_channels=self.cfg.in_channels,
                out_channels=self.cfg.in_channels,
                z_dec_channels=self.cfg.z_dim))
        else:
            self.renderer = DiT2D(self.cfg.renderer)
        self.drop_z_emb = self.param(
            "drop_z_emb", nn.initializers.normal(0.02),
            (1, 1, 1, self.cfg.z_dim))

    def encode(self, x, key: Optional[jax.Array] = None):
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
        k_enc, k_fm, k_drop = jax.random.split(key, 3)
        z, mu, logvar = self.encode(x, k_enc)
        if zaug_p > 0:
            drop = jax.random.bernoulli(k_drop, zaug_p,
                                        (x.shape[0], 1, 1, 1))
            z = jnp.where(drop, jnp.broadcast_to(self.drop_z_emb, z.shape),
                          z)
        kl = jnp.mean(0.5 * (mu ** 2 + jnp.exp(logvar) - logvar - 1.0))
        rec = fm_lib.fm_loss(self.render_net, k_fm, x, self.cfg.fm,
                             net_kwargs={"z_dec": z})
        return rec, kl, z


def dito_image_decode(model: DiToImage, variables, z, out_hw, key,
                      n_steps: Optional[int] = None,
                      guidance: Optional[float] = None):
    """Latent grid -> image via FM Euler sampling
    (reference: ldm_base.py render + samplers.py)."""
    cfg = model.cfg
    n_steps = n_steps or cfg.render_n_steps
    guidance = guidance if guidance is not None else cfg.renderer_guidance

    def net(x_t, t, z_dec):
        return model.apply(variables, x_t, t, z_dec,
                           method=DiToImage.render_net)

    uncond = None
    if guidance != 1.0:
        drop = variables["params"]["drop_z_emb"]
        uncond = {"z_dec": jnp.broadcast_to(drop, z.shape)}
    shape = (z.shape[0],) + tuple(out_hw) + (cfg.in_channels,)
    return fm_lib.euler_sample(net, shape, n_steps, cfg.fm, key=key,
                               net_kwargs={"z_dec": z},
                               uncond_net_kwargs=uncond, guidance=guidance)


def make_dito_image_step(model: DiToImage, kl_weight: float = 1e-4,
                         zaug_p: float = 0.1, ema_decay: float = 0.9999,
                         bf16: bool = False):
    """Step over batch {'image': (B, H, W, C) in [-1, 1]}
    (reference: ldm_trainer.py train_step :38-61)."""

    def step(state: TrainState, ema_params, batch, key):
        img = batch["image"]
        if bf16:
            img = img.astype(jnp.bfloat16)

        def loss_fn(params):
            rec, kl, _ = model.apply({"params": params}, img, key, zaug_p,
                                     method=DiToImage.loss)
            return rec + kl_weight * kl, {"rec": rec, "kl": kl}

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        state = state.apply_gradients(grads)
        ema_params = ema_update(ema_params, state.params, ema_decay)
        return state, ema_params, {"loss": loss,
                                   "grad_norm": optax.global_norm(grads),
                                   **aux}

    return step


# ---------------------------------------------------------------------------
# image latent prior (ZDM over the 2-D latent grid)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class ImageZDMConfig:
    z_dim: int = 4
    net: DiTConfig = field(default_factory=lambda: DiTConfig(
        hidden=128, depth=4, num_heads=4, patch=2, in_channels=4,
        out_channels=4, cond_dim=0))
    fm: fm_lib.FMConfig = field(default_factory=fm_lib.FMConfig)
    n_steps: int = 18
    ema_rate: float = 0.9999
    # class-conditional prior (reference: ldm_trainer.py:197-209,
    # zdm_class_cond — class index n_classes is the CFG null token)
    n_classes: int = 0              # 0 = unconditional
    class_emb_dim: int = 64
    label_drop: float = 0.1
    guidance: float = 1.0


class ImageZDMNet(nn.Module):
    cfg: ImageZDMConfig = ImageZDMConfig()

    @nn.compact
    def __call__(self, x, t, class_labels=None):
        c = self.cfg
        z_dec = None
        if c.n_classes > 0:
            if class_labels is None:
                raise ValueError("class-conditional ZDM needs class_labels")
            z_dec = nn.Embed(c.n_classes + 1, c.class_emb_dim,
                             name="class_emb")(class_labels)
        return DiT2D(c.net, name="dit")(x, t, z_dec=z_dec)


def make_image_zdm_step(zdm: ImageZDMNet, ae: DiToImage, ae_variables,
                        ema_decay: Optional[float] = None):
    """Frozen-AE latent prior training (reference: ldm_base.py ZDM path
    + ldm_trainer.py with only the 'zdm' optimizer enabled). With
    cfg.n_classes > 0, batch['label'] conditions the prior and labels
    drop to the null class with p=cfg.label_drop so CFG has an
    unconditional branch (reference uncond token: ldm_trainer.py:202)."""
    cfg = zdm.cfg
    decay = ema_decay if ema_decay is not None else cfg.ema_rate

    def step(state: TrainState, ema_params, batch, key):
        k_enc, k_fm, k_drop = jax.random.split(key, 3)
        _, mu, _ = ae.apply(ae_variables, batch["image"], k_enc,
                            method=DiToImage.encode)
        z = normalize_latents(jax.lax.stop_gradient(mu))
        labels = None
        if cfg.n_classes > 0:
            labels = batch["label"].astype(jnp.int32)
            drop = jax.random.bernoulli(k_drop, cfg.label_drop,
                                        labels.shape)
            labels = jnp.where(drop, cfg.n_classes, labels)

        def loss_fn(params):
            def net(x_t, t, **kw):
                return zdm.apply({"params": params}, x_t, t,
                                 class_labels=labels)
            return fm_lib.fm_loss(net, k_fm, z, cfg.fm)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        state = state.apply_gradients(grads)
        ema_params = ema_update(ema_params, state.params, decay)
        return state, ema_params, {"zdm/loss": loss,
                                   "zdm/grad_norm": optax.global_norm(grads)}

    return step


def image_zdm_generate(zdm: ImageZDMNet, zdm_variables, ae: DiToImage,
                       ae_variables, batch_size: int, z_hw, out_hw, key,
                       n_steps: Optional[int] = None,
                       render_steps: Optional[int] = None,
                       class_labels=None,
                       guidance: Optional[float] = None):
    """Image generation: sample normalized z (optionally class-
    conditional with CFG against the null-class token), decode
    (reference: ldm_base.py generate_samples :379-420 +
    ldm_trainer.py:347-373 class CFG)."""
    cfg = zdm.cfg
    k_z, k_dec = jax.random.split(key)

    def net(x_t, t, **kw):
        return zdm.apply(zdm_variables, x_t, t, **kw)

    net_kwargs, uncond_kwargs = None, None
    g = 1.0
    if cfg.n_classes > 0:
        if class_labels is None:
            raise ValueError("class-conditional ZDM needs class_labels")
        class_labels = jnp.asarray(class_labels, jnp.int32)
        net_kwargs = {"class_labels": class_labels}
        g = cfg.guidance if guidance is None else guidance
        if g != 1.0:
            uncond_kwargs = {"class_labels": jnp.full_like(
                class_labels, cfg.n_classes)}
    z = fm_lib.euler_sample(
        net, (batch_size,) + tuple(z_hw) + (cfg.z_dim,), n_steps or
        cfg.n_steps, cfg.fm, key=k_z, net_kwargs=net_kwargs,
        uncond_net_kwargs=uncond_kwargs, guidance=g)
    return dito_image_decode(ae, ae_variables, z, out_hw, k_dec,
                             n_steps=render_steps)


def eval_image_reconstruction(model: DiToImage, variables, images, key,
                              n_steps: Optional[int] = None):
    """PSNR on [-1,1] images mapped to [0,1] (reference:
    ldm_trainer.py evaluate_ae :113-176; FID needs torch_fidelity and is
    out of scope on-device)."""
    _, mu, _ = model.apply(variables, images, method=DiToImage.encode)
    rec = dito_image_decode(model, variables, mu, images.shape[1:3], key,
                            n_steps)
    pred = jnp.clip(rec * 0.5 + 0.5, 0.0, 1.0)
    gt = jnp.clip(images * 0.5 + 0.5, 0.0, 1.0)
    mse = jnp.mean((pred - gt) ** 2, axis=(1, 2, 3))
    psnr = jnp.mean(-10.0 * jnp.log10(jnp.maximum(mse, 1e-12)))
    return {"eval/mse": jnp.mean(mse), "eval/psnr": psnr}


def save_image_grid(images: np.ndarray, path: str, cols: int = 4):
    """[-1,1] (N,H,W,C) -> PNG grid (reference: ldm_trainer.py
    visualize_* via torchvision.utils; PIL here)."""
    from PIL import Image

    arr = np.clip(np.asarray(images) * 0.5 + 0.5, 0, 1)
    n, h, w, c = arr.shape
    cols = min(cols, n)
    rows = (n + cols - 1) // cols
    grid = np.zeros((rows * h, cols * w, c), np.float32)
    for i in range(n):
        r, col = divmod(i, cols)
        grid[r * h:(r + 1) * h, col * w:(col + 1) * w] = arr[i]
    img = (grid * 255).astype(np.uint8)
    if c == 1:
        img = img[..., 0]
    Image.fromarray(img).save(path)
