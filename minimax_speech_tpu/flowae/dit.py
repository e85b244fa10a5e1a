"""DiT — diffusion transformer with adaLN-zero conditioning.

Re-implementation of the Meta DiT the reference vendors
(reference: flowae/models/networks/dit.py:147-375), generalized to 1-D
(audio latents / waveform frames) and 2-D (image patches) inputs.
Conditioning (timestep + optional context vector) modulates every block
through adaLN-zero (shift/scale/gate from a silu-MLP, gates zero-init).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from minimax_speech_tpu.models.decoder_unet import sinusoidal_pos_emb


@dataclass(frozen=True)
class DiTConfig:
    hidden: int = 384          # DiT-S
    depth: int = 12
    num_heads: int = 6
    patch: int = 4             # patch length along time
    in_channels: int = 1
    out_channels: int = 1
    cond_dim: int = 0          # extra conditioning channels (z_dec), 0 = none
    mlp_ratio: int = 4


class DiTBlock(nn.Module):
    hidden: int
    num_heads: int
    mlp_ratio: int = 4

    @nn.compact
    def __call__(self, x, c):
        # c: (B, 6*hidden) modulation from conditioning MLP
        mods = nn.Dense(6 * self.hidden, kernel_init=nn.initializers.zeros,
                        name="adaLN")(nn.silu(c))
        sh1, sc1, g1, sh2, sc2, g2 = jnp.split(mods, 6, axis=-1)

        h = nn.LayerNorm(use_bias=False, use_scale=False, name="norm1")(x)
        h = h * (1 + sc1[:, None]) + sh1[:, None]
        b, t, d = h.shape
        hd = d // self.num_heads
        q = nn.Dense(d, name="q")(h).reshape(b, t, self.num_heads, hd)
        k = nn.Dense(d, name="k")(h).reshape(b, t, self.num_heads, hd)
        v = nn.Dense(d, name="v")(h).reshape(b, t, self.num_heads, hd)
        w = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(hd)
        w = jax.nn.softmax(w.astype(jnp.float32), -1).astype(x.dtype)
        a = jnp.einsum("bhqk,bkhd->bqhd", w, v).reshape(b, t, d)
        x = x + g1[:, None] * nn.Dense(d, name="proj")(a)

        h = nn.LayerNorm(use_bias=False, use_scale=False, name="norm2")(x)
        h = h * (1 + sc2[:, None]) + sh2[:, None]
        h = nn.Dense(self.mlp_ratio * d, name="mlp_in")(h)
        h = jax.nn.gelu(h, approximate=True)
        x = x + g2[:, None] * nn.Dense(d, name="mlp_out")(h)
        return x


class DiT2D(nn.Module):
    """2-D DiT over (B, H, W, C) images (the reference's image track,
    flowae/models/networks/dit.py DiT-S/B/L/XL x patch)."""
    cfg: DiTConfig = DiTConfig()

    @nn.compact
    def __call__(self, x, t, z_dec: Optional[jnp.ndarray] = None):
        cfg = self.cfg
        b, hh, ww, _ = x.shape
        p = cfg.patch
        assert hh % p == 0 and ww % p == 0
        nh, nw = hh // p, ww // p
        h = x.reshape(b, nh, p, nw, p, x.shape[-1])
        h = jnp.transpose(h, (0, 1, 3, 2, 4, 5)).reshape(
            b, nh * nw, p * p * x.shape[-1])
        h = nn.Dense(cfg.hidden, name="patch_embed")(h)
        pos = self.param("pos_emb", nn.initializers.normal(0.02),
                         (1, nh * nw, cfg.hidden))
        h = h + pos

        c = sinusoidal_pos_emb(t, cfg.hidden, scale=1.0)
        c = nn.Dense(cfg.hidden, name="t_mlp1")(c)
        c = nn.Dense(cfg.hidden, name="t_mlp2")(nn.silu(c))
        if z_dec is not None and cfg.cond_dim > 0:
            zc = z_dec.reshape(b, -1, z_dec.shape[-1]).mean(axis=1) \
                if z_dec.ndim > 2 else z_dec
            c = c + nn.Dense(cfg.hidden, name="cond_proj")(zc)

        for i in range(cfg.depth):
            h = DiTBlock(cfg.hidden, cfg.num_heads, cfg.mlp_ratio,
                         name=f"block_{i}")(h, c)

        mods = nn.Dense(2 * cfg.hidden, kernel_init=nn.initializers.zeros,
                        name="final_adaLN")(nn.silu(c))
        sh, sc = jnp.split(mods, 2, axis=-1)
        h = nn.LayerNorm(use_bias=False, use_scale=False, name="final_norm")(h)
        h = h * (1 + sc[:, None]) + sh[:, None]
        h = nn.Dense(p * p * cfg.out_channels,
                     kernel_init=nn.initializers.zeros, name="final_proj")(h)
        h = h.reshape(b, nh, nw, p, p, cfg.out_channels)
        return jnp.transpose(h, (0, 1, 3, 2, 4, 5)).reshape(
            b, hh, ww, cfg.out_channels)


class DiT1D(nn.Module):
    """1-D DiT over (B, T, in_channels) signals."""
    cfg: DiTConfig = DiTConfig()

    @nn.compact
    def __call__(self, x, t, z_dec: Optional[jnp.ndarray] = None):
        """x: (B, T, C_in); t: (B,); z_dec: optional (B, T//patch, cond_dim)
        or (B, cond_dim) conditioning. Returns (B, T, C_out)."""
        cfg = self.cfg
        b, tlen, _ = x.shape
        p = cfg.patch
        assert tlen % p == 0
        n_tok = tlen // p
        h = x.reshape(b, n_tok, p * x.shape[-1])
        h = nn.Dense(cfg.hidden, name="patch_embed")(h)
        pos = self.param("pos_emb", nn.initializers.normal(0.02),
                         (1, n_tok, cfg.hidden))
        h = h + pos[:, :n_tok]

        c = sinusoidal_pos_emb(t, cfg.hidden, scale=1.0)
        c = nn.Dense(cfg.hidden, name="t_mlp1")(c)
        c = nn.Dense(cfg.hidden, name="t_mlp2")(nn.silu(c))
        if z_dec is not None and cfg.cond_dim > 0:
            if z_dec.ndim == 3:
                zc = jnp.mean(z_dec, axis=1)
            else:
                zc = z_dec
            c = c + nn.Dense(cfg.hidden, name="cond_proj")(zc)
            if z_dec.ndim == 3:
                # token-aligned conditioning: add projected z tokens
                zt = nn.Dense(cfg.hidden, name="cond_tokens")(z_dec)
                reps = n_tok // zt.shape[1]
                if reps > 1:
                    zt = jnp.repeat(zt, reps, axis=1)
                h = h + zt[:, :n_tok]

        for i in range(cfg.depth):
            h = DiTBlock(cfg.hidden, cfg.num_heads, cfg.mlp_ratio,
                         name=f"block_{i}")(h, c)

        mods = nn.Dense(2 * cfg.hidden, kernel_init=nn.initializers.zeros,
                        name="final_adaLN")(nn.silu(c))
        sh, sc = jnp.split(mods, 2, axis=-1)
        h = nn.LayerNorm(use_bias=False, use_scale=False, name="final_norm")(h)
        h = h * (1 + sc[:, None]) + sh[:, None]
        h = nn.Dense(p * cfg.out_channels, kernel_init=nn.initializers.zeros,
                     name="final_proj")(h)
        return h.reshape(b, tlen, cfg.out_channels)
