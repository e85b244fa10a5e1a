"""Consistency-decoder UNet renderers (1-D audio, 2-D image).

Reference: flowae/models/networks/consistency_audio_decoder_unet.py
(AudioDiffusionUNet, :147-324) and consistency_decoder_unet.py
(ConsistencyDecoderUNet, :157-269) — the OpenAI consistency-decoder
architecture: positional time embedding -> per-block FiLM-style (t1+1,
t2) modulation, 3 downsample stages of 3 resblocks + pool, a
bottleneck, and an upsample path where EVERY resblock consumes one skip
(16 skips total, including the stem).

TPU-first notes: channel-last layouts (NLC / NHWC) so convs lower to
MXU-friendly layouts; pooling/upsampling via nn.avg_pool /
jax.image.resize inside the jitted program; dims-generic blocks share
one implementation. The audio reference conditions by projecting z_dec
and concatenating AFTER the stem (:253-296 — its declared channel
counts don't account for the concat; here the first blocks' in-channels
follow the actual concatenated width), the image reference concatenates
raw z BEFORE the stem (:240-247); both layouts are kept.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class ConsistencyUNetConfig:
    dims: int = 1                # 1 = (B, T, C) audio, 2 = (B, H, W, C)
    in_channels: int = 1
    out_channels: int = 1
    z_dec_channels: Optional[int] = None
    c0: int = 128
    c1: int = 256
    c2: int = 512
    pe_dim: int = 320
    t_dim: int = 1280
    kernel: int = 3
    groups: int = 32             # GroupNorm groups (reference: 32)


def positional_time_embedding(t: jnp.ndarray, pe_dim: int,
                              max_positions: float = 10000.0,
                              endpoint: bool = True) -> jnp.ndarray:
    """(B,) -> (B, pe_dim) cos||sin embedding
    (reference: consistency_*_unet.py PositionalEmbedding)."""
    half = pe_dim // 2
    freqs = np.arange(half, dtype=np.float32)
    freqs = freqs / (half - (1 if endpoint else 0))
    freqs = (1.0 / max_positions) ** freqs
    ang = t[:, None].astype(jnp.float32) * jnp.asarray(freqs)[None, :]
    return jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], axis=-1)


def _gn(cfg: ConsistencyUNetConfig, channels: int, name: str):
    g = cfg.groups if channels % cfg.groups == 0 else 1
    return nn.GroupNorm(num_groups=g, name=name)


def _resize(x, new_spatial, dims: int):
    """linear (1-D, reference audio) / nearest (2-D, reference image)."""
    shape = (x.shape[0],) + tuple(new_spatial) + (x.shape[-1],)
    method = "linear" if dims == 1 else "nearest"
    return jax.image.resize(x, shape, method=method)


class ConvResblock(nn.Module):
    """GN -> silu -> conv -> GN -> FiLM(t) -> silu -> conv (+ 1x1 skip)
    (reference: AudioConvResblock :51-82 / ConvResblock :65-96)."""
    cfg: ConsistencyUNetConfig
    features: int

    @nn.compact
    def __call__(self, x, t_emb):
        c = self.cfg
        sp = (1,) * c.dims
        tm = nn.Dense(2 * self.features, name="f_t")(nn.silu(t_emb))
        t1, t2 = jnp.split(tm, 2, axis=-1)
        t1 = t1.reshape((x.shape[0],) + sp + (self.features,)) + 1.0
        t2 = t2.reshape((x.shape[0],) + sp + (self.features,))

        h = nn.silu(_gn(c, x.shape[-1], "gn_1")(x))
        h = nn.Conv(self.features, (c.kernel,) * c.dims, padding="SAME",
                    name="f_1")(h)
        h = _gn(c, self.features, "gn_2")(h)
        h = nn.Conv(self.features, (c.kernel,) * c.dims, padding="SAME",
                    name="f_2")(nn.silu(h * t1 + t2))
        skip = x if x.shape[-1] == self.features else nn.Conv(
            self.features, (1,) * c.dims, name="f_s")(x)
        return skip + h


class Resample(nn.Module):
    """Down (avg-pool) / up (interpolate) block with the same FiLM
    modulation (reference: AudioDownsample/AudioUpsample :84-144)."""
    cfg: ConsistencyUNetConfig
    up: bool

    @nn.compact
    def __call__(self, x, t_emb):
        c = self.cfg
        feats = x.shape[-1]
        sp = (1,) * c.dims
        tm = nn.Dense(2 * feats, name="f_t")(nn.silu(t_emb))
        t1, t2 = jnp.split(tm, 2, axis=-1)
        t1 = t1.reshape((x.shape[0],) + sp + (feats,)) + 1.0
        t2 = t2.reshape((x.shape[0],) + sp + (feats,))

        spatial = x.shape[1:-1]
        new_spatial = tuple(s * 2 if self.up else s // 2 for s in spatial)

        def scale(v):
            if self.up:
                return _resize(v, new_spatial, c.dims)
            return nn.avg_pool(v, (2,) * c.dims, strides=(2,) * c.dims)

        h = scale(nn.silu(_gn(c, feats, "gn_1")(x)))
        h = nn.Conv(feats, (c.kernel,) * c.dims, padding="SAME",
                    name="f_1")(h)
        h = _gn(c, feats, "gn_2")(h)
        h = nn.Conv(feats, (c.kernel,) * c.dims, padding="SAME",
                    name="f_2")(nn.silu(h * t1 + t2))
        return h + scale(x)


class ConsistencyUNet(nn.Module):
    """x: (B, T, C) or (B, H, W, C); t: (B,); z_dec: latent conditioning
    at a coarser spatial rate (resized + concatenated). Spatial dims must
    be divisible by 8 (three 2x pools)."""
    cfg: ConsistencyUNetConfig = ConsistencyUNetConfig()

    @nn.compact
    def __call__(self, x, t=None, z_dec=None):
        c = self.cfg
        if t is None:
            t = jnp.zeros((x.shape[0],))
        if c.dims == 2 and z_dec is not None:
            # image layout: concat raw z before the stem (:240-247)
            x = jnp.concatenate(
                [x, _resize(z_dec, x.shape[1:-1], c.dims)], axis=-1)
        h = nn.Conv(c.c0, (c.kernel,) * c.dims, padding="SAME",
                    name="embed")(x)
        if c.dims == 1 and z_dec is not None:
            # audio layout: project z, concat after the stem (:253-279)
            zp = nn.Conv(c.c0, (1,), name="z_proj")(z_dec)
            h = jnp.concatenate(
                [h, _resize(zp, h.shape[1:-1], c.dims)], axis=-1)

        te = positional_time_embedding(t, c.pe_dim)
        te = nn.Dense(c.t_dim, name="time_f1")(te)
        te = nn.Dense(c.t_dim, name="time_f2")(nn.silu(te))

        widths = (c.c0, c.c1, c.c2, c.c2)
        skips = [h]
        for s, w in enumerate(widths):
            for i in range(3):
                h = ConvResblock(c, w, name=f"down_{s}_{i}")(h, te)
                skips.append(h)
            if s < 3:
                h = Resample(c, up=False, name=f"down_{s}_pool")(h, te)
                skips.append(h)

        for i in range(2):
            h = ConvResblock(c, c.c2, name=f"mid_{i}")(h, te)

        for s in (3, 2, 1, 0):
            w = widths[s]
            for i in range(4):
                h = jnp.concatenate([h, skips.pop()], axis=-1)
                h = ConvResblock(c, w, name=f"up_{s}_{i}")(h, te)
            if s > 0:
                h = Resample(c, up=True, name=f"up_{s}_resample")(h, te)

        h = nn.silu(_gn(c, c.c0, "out_gn")(h))
        return nn.Conv(c.out_channels, (c.kernel,) * c.dims,
                       padding="SAME", name="out_conv")(h)
