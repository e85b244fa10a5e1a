"""VQGAN stack for the GLPTo image/audio track.

Reference: flowae/models/ldm/vqgan/{model,quantizer,discriminator,
lpips}.py (~1.3k LoC): a taming-transformers VQGAN — resnet
encoder/decoder with mid attention, VectorQuantizer with
straight-through estimator + commitment loss, PatchGAN discriminator,
VGG-LPIPS perceptual loss, and the adaptive generator/GAN weight
balancing.

TPU-native re-design: channel-last NHWC, GroupNorm+swish blocks, the
quantizer's nearest-codebook search as one batched matmul, the adaptive
GAN weight computed with two jax.grad calls w.r.t. the decoder's final
conv (reference: taming's calculate_adaptive_weight), and the
perceptual loss as a pluggable feature-extractor distance — a
random-init VGG-shaped stack by default (the reference's VGG16-LPIPS
weights are a torchvision download; load them through
`lpips_params_from_torch` when available — this environment has no
network, so tests run the structure with random features, which is
still a valid perceptual-style distance for training smoke tests).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from minimax_speech_tpu.train.steps import TrainState
from minimax_speech_tpu.ops import safe_conv


# ---------------------------------------------------------------- quantizer
class VectorQuantizer(nn.Module):
    """Nearest-codebook VQ with straight-through gradients
    (reference: vqgan/quantizer.py:7-117, legacy=False weighting).
    z: (..., e_dim) channel-last. Returns (z_q, loss, indices)."""
    n_e: int
    e_dim: int
    beta: float = 0.25

    @nn.compact
    def __call__(self, z):
        emb = self.param("embedding", nn.initializers.uniform(2.0 / self.n_e),
                         (self.n_e, self.e_dim))
        emb = emb - 1.0 / self.n_e  # uniform(-1/n, 1/n)
        flat = z.reshape(-1, self.e_dim)
        d = (jnp.sum(flat ** 2, axis=1, keepdims=True)
             + jnp.sum(emb ** 2, axis=1)[None]
             - 2.0 * flat @ emb.T)
        idx = jnp.argmin(d, axis=1)
        z_q = emb[idx].reshape(z.shape)
        commit = jnp.mean((jax.lax.stop_gradient(z_q) - z) ** 2)
        embed = jnp.mean((z_q - jax.lax.stop_gradient(z)) ** 2)
        loss = self.beta * commit + embed
        z_q = z + jax.lax.stop_gradient(z_q - z)  # straight-through
        return z_q, loss, idx.reshape(z.shape[:-1])

    def lookup(self, indices):
        emb = self.get_variable("params", "embedding") - 1.0 / self.n_e
        return emb[indices]


# ------------------------------------------------------------ encoder/decoder
def _gn(x, name):
    return nn.GroupNorm(num_groups=min(32, x.shape[-1]), name=name)(x)


class ResnetBlock(nn.Module):
    """GroupNorm-swish-conv x2 + 1x1 shortcut
    (reference: vqgan/model.py:100-160)."""
    out_ch: int

    @nn.compact
    def __call__(self, x):
        h = nn.swish(_gn(x, "norm1"))
        h = nn.Conv(self.out_ch, (3, 3), padding=1, name="conv1")(h)
        h = nn.swish(_gn(h, "norm2"))
        h = nn.Conv(self.out_ch, (3, 3), padding=1, name="conv2")(h)
        if x.shape[-1] != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), name="nin_shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head spatial self-attention
    (reference: vqgan/model.py:168-216)."""

    @nn.compact
    def __call__(self, x):
        b, hh, ww, c = x.shape
        h = _gn(x, "norm")
        q = nn.Conv(c, (1, 1), name="q")(h).reshape(b, hh * ww, c)
        k = nn.Conv(c, (1, 1), name="k")(h).reshape(b, hh * ww, c)
        v = nn.Conv(c, (1, 1), name="v")(h).reshape(b, hh * ww, c)
        w = jax.nn.softmax(q @ jnp.swapaxes(k, 1, 2) / np.sqrt(c), axis=-1)
        o = (w @ v).reshape(b, hh, ww, c)
        return x + nn.Conv(c, (1, 1), name="proj_out")(o)


@dataclass(frozen=True)
class VQGANConfig:
    in_channels: int = 3
    ch: int = 32
    ch_mult: Tuple[int, ...] = (1, 2, 4)
    num_res_blocks: int = 1
    z_channels: int = 16
    n_embed: int = 256
    embed_dim: int = 16
    beta: float = 0.25
    attn_mid: bool = True


class VQGANEncoder(nn.Module):
    cfg: VQGANConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        h = nn.Conv(c.ch, (3, 3), padding=1, name="conv_in")(x)
        for i, m in enumerate(c.ch_mult):
            for j in range(c.num_res_blocks):
                h = ResnetBlock(c.ch * m, name=f"down_{i}_block_{j}")(h)
            if i != len(c.ch_mult) - 1:
                h = safe_conv.SlicedConv(h.shape[-1], (3, 3), strides=(2, 2),
                                         padding=1,
                                         name=f"down_{i}_downsample")(h)
        h = ResnetBlock(h.shape[-1], name="mid_block_1")(h)
        if c.attn_mid:
            h = AttnBlock(name="mid_attn")(h)
        h = ResnetBlock(h.shape[-1], name="mid_block_2")(h)
        h = nn.swish(_gn(h, "norm_out"))
        return nn.Conv(c.z_channels, (3, 3), padding=1, name="conv_out")(h)


class VQGANDecoder(nn.Module):
    cfg: VQGANConfig

    @nn.compact
    def __call__(self, z):
        c = self.cfg
        h = nn.Conv(c.ch * c.ch_mult[-1], (3, 3), padding=1,
                    name="conv_in")(z)
        h = ResnetBlock(h.shape[-1], name="mid_block_1")(h)
        if c.attn_mid:
            h = AttnBlock(name="mid_attn")(h)
        h = ResnetBlock(h.shape[-1], name="mid_block_2")(h)
        for i, m in enumerate(reversed(c.ch_mult)):
            for j in range(c.num_res_blocks):
                h = ResnetBlock(c.ch * m, name=f"up_{i}_block_{j}")(h)
            if i != len(c.ch_mult) - 1:
                b, hh, ww, ch = h.shape
                h = jax.image.resize(h, (b, hh * 2, ww * 2, ch), "nearest")
                h = nn.Conv(ch, (3, 3), padding=1, name=f"up_{i}_upsample")(h)
        h = nn.swish(_gn(h, "norm_out"))
        return nn.Conv(c.in_channels, (3, 3), padding=1, name="conv_out")(h)


class VQGAN(nn.Module):
    cfg: VQGANConfig = VQGANConfig()

    def setup(self):
        c = self.cfg
        self.encoder = VQGANEncoder(c)
        self.decoder = VQGANDecoder(c)
        self.quant_conv = nn.Conv(c.embed_dim, (1, 1))
        self.post_quant_conv = nn.Conv(c.z_channels, (1, 1))
        self.quantize = VectorQuantizer(c.n_embed, c.embed_dim, c.beta)

    def encode(self, x):
        h = self.quant_conv(self.encoder(x))
        return self.quantize(h)

    def decode(self, z_q):
        return self.decoder(self.post_quant_conv(z_q))

    def __call__(self, x):
        z_q, q_loss, idx = self.encode(x)
        return self.decode(z_q), q_loss, idx


# -------------------------------------------------------------- discriminator
class NLayerDiscriminator(nn.Module):
    """PatchGAN (reference: vqgan/discriminator.py:19-67), NHWC."""
    ndf: int = 32
    n_layers: int = 3

    @nn.compact
    def __call__(self, x):
        h = safe_conv.SlicedConv(self.ndf, (4, 4), strides=(2, 2), padding=1,
                                 name="conv0")(x)
        h = nn.leaky_relu(h, 0.2)
        for n in range(1, self.n_layers + 1):
            mult = min(2 ** n, 8)
            stride = 2 if n < self.n_layers else 1
            h = safe_conv.SlicedConv(self.ndf * mult, (4, 4),
                                     strides=(stride, stride), padding=1,
                                     use_bias=False, name=f"conv{n}")(h)
            h = nn.leaky_relu(_gn(h, f"norm{n}"), 0.2)
        return nn.Conv(1, (4, 4), padding=1, name="conv_out")(h)


# ---------------------------------------------------------------- perceptual
class VGGFeatures(nn.Module):
    """VGG16-shaped feature pyramid (the LPIPS backbone structure,
    reference: vqgan/lpips.py vgg16 slices). Returns the 5 relu stages."""
    widths: Tuple[int, ...] = (64, 128, 256, 512, 512)
    convs_per_stage: Tuple[int, ...] = (2, 2, 3, 3, 3)

    @nn.compact
    def __call__(self, x):
        feats = []
        h = x
        for s, (w, n) in enumerate(zip(self.widths, self.convs_per_stage)):
            for j in range(n):
                h = nn.Conv(w, (3, 3), padding=1, name=f"conv{s}_{j}")(h)
                h = nn.relu(h)
            feats.append(h)
            if s != len(self.widths) - 1:
                h = nn.max_pool(h, (2, 2), strides=(2, 2))
        return feats


class LPIPS(nn.Module):
    """Perceptual distance: unit-normalized feature diffs through 1x1
    "lin" heads, spatially averaged (reference: vqgan/lpips.py:13-60)."""
    backbone: VGGFeatures = VGGFeatures()

    @nn.compact
    def __call__(self, x, y):
        fx = self.backbone(x)
        fy = self.backbone(y)
        total = 0.0
        for i, (a, b) in enumerate(zip(fx, fy)):
            a = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True),
                                1e-10)
            b = b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True),
                                1e-10)
            d = (a - b) ** 2
            w = self.param(f"lin{i}", nn.initializers.ones, (a.shape[-1],))
            total = total + jnp.mean(jnp.sum(d * jnp.abs(w), axis=-1))
        return total


# ------------------------------------------------------------------- training
def adaptive_gan_weight(params, rec_fn, gan_fn, last_kernel_path,
                        max_w: float = 1e4):
    """lambda = ||grad_last(rec)|| / ||grad_last(gan)||
    (reference: taming calculate_adaptive_weight used by glpto.py)."""
    def pick(g):
        out = g
        for k in last_kernel_path:
            out = out[k]
        return out

    g_rec = pick(jax.grad(rec_fn)(params))
    g_gan = pick(jax.grad(gan_fn)(params))
    w = jnp.linalg.norm(g_rec) / (jnp.linalg.norm(g_gan) + 1e-4)
    return jnp.clip(w, 0.0, max_w)


def make_vqgan_steps(model: VQGAN, disc: NLayerDiscriminator,
                     perceptual: Optional[LPIPS] = None,
                     perceptual_vars=None,
                     perceptual_weight: float = 1.0,
                     disc_weight: float = 0.5,
                     adaptive: bool = True):
    """Generator/discriminator steps (reference: vqgan training losses in
    glpto.py:14-137 + taming VQLPIPSWithDiscriminator)."""

    last_path = ("decoder", "conv_out", "kernel")

    def recon_terms(params, x):
        rec, q_loss, _ = model.apply({"params": params}, x)
        l1 = jnp.mean(jnp.abs(rec - x))
        p = 0.0
        if perceptual is not None:
            p = perceptual.apply(perceptual_vars, rec, x)
        return rec, l1 + perceptual_weight * p, q_loss

    def gen_step(g_state: TrainState, d_params, batch, key=None):
        x = batch["image"]

        def rec_only(params):
            _, rec_l, _ = recon_terms(params, x)
            return rec_l

        def gan_only(params):
            rec, _, _ = model.apply({"params": params}, x)
            logits = disc.apply({"params": d_params}, rec)
            return -jnp.mean(logits)

        if adaptive:
            w = jax.lax.stop_gradient(adaptive_gan_weight(
                g_state.params, rec_only, gan_only, last_path))
        else:
            w = 1.0

        def loss_fn(params):
            rec, rec_l, q_loss = recon_terms(params, x)
            logits = disc.apply({"params": d_params}, rec)
            g_loss = -jnp.mean(logits)
            total = rec_l + q_loss + disc_weight * w * g_loss
            return total, {"vq/rec": rec_l, "vq/quant": q_loss,
                           "vq/g_loss": g_loss, "vq/adaptive_w": w}

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            g_state.params)
        return g_state.apply_gradients(grads), {"vq/loss": loss, **aux}

    def disc_step(d_state: TrainState, g_params, batch, key=None):
        x = batch["image"]
        rec, _, _ = model.apply({"params": g_params}, x)
        rec = jax.lax.stop_gradient(rec)

        def loss_fn(d_params):
            real = disc.apply({"params": d_params}, x)
            fake = disc.apply({"params": d_params}, rec)
            # hinge loss (reference: vqgan hinge_d_loss)
            loss = 0.5 * (jnp.mean(nn.relu(1.0 - real))
                          + jnp.mean(nn.relu(1.0 + fake)))
            return loss, {"disc/real": jnp.mean(real),
                          "disc/fake": jnp.mean(fake)}

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            d_state.params)
        return d_state.apply_gradients(grads), {"disc/loss": loss, **aux}

    return gen_step, disc_step
