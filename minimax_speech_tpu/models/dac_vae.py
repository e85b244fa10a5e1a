"""DAC-VAE continuous audio codec (Snake conv encoder/decoder, weight norm).

Reference: dac-vae/model.py:107-506 + layers.py with configs/configx2.yml
geometry: encoder_dim 64, rates [2,3,4,4,5] (hop 480 @ 24 kHz -> 50 Hz
latents), latent_dim 80, decoder_dim 1536, decoder_rates [5,4,4,3,2],
snake activations, weight-normalized convs.

TPU-first: channel-last (B, T, C) with feature-last convs; weight norm
kept as an explicit (g, v) reparameterization so training matches the
reference optimization geometry; transposed convs are expressed as
input-dilated convolutions (exact torch ConvTranspose1d semantics).
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from minimax_speech_tpu.ops import safe_conv


@dataclass(frozen=True)
class DACVAEConfig:
    encoder_dim: int = 64
    encoder_rates: Tuple[int, ...] = (2, 3, 4, 4, 5)
    latent_dim: int = 80
    decoder_dim: int = 1536
    decoder_rates: Tuple[int, ...] = (5, 4, 4, 3, 2)
    d_in: int = 1
    d_out: int = 1
    sample_rate: int = 24000
    use_tanh_final: bool = True

    def __post_init__(self):
        halvings = 2 ** len(self.decoder_rates)
        if self.decoder_dim // halvings < 1:
            raise ValueError(
                f"decoder_dim={self.decoder_dim} too small: it halves per "
                f"decoder block and must stay >= 1 after "
                f"{len(self.decoder_rates)} blocks")

    @property
    def hop_length(self) -> int:
        return int(np.prod(self.encoder_rates))


def _uniform_symmetric(bound: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


class Snake1d(nn.Module):
    """x + (1/(a+1e-9)) sin^2(a x), per-channel a (reference: layers.py:18-33)."""
    channels: int

    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", nn.initializers.ones, (1, 1, self.channels))
        return x + (1.0 / (alpha + 1e-9)) * jnp.square(jnp.sin(alpha * x))


# Default per-conv init variance multiplier (fan_in * Var(w)).
#
# torch's Conv1d default (which the reference's weight_norm captures —
# its init_weights xavier pass writes m.weight.data, a buffer the
# weight-norm pre-hook overwrites from (g, v) on the next forward, so
# it is a no-op) is bound 1/sqrt(fan_in) => multiplier 1/3. Measured on
# this model: the encoder's ~8 non-residual convs shrink the signal
# 0.58x each, so mu at init is ~0.005 while the reparam noise is
# sigma=1 — a 200:1 noise floor the optimizer escapes only after many
# thousands of steps (posterior collapse: trained encoders stayed
# input-independent; decode output was a constant 1 kHz pattern).
#
# 0.5 keeps a [3 residual units + strided conv] encoder block at an
# overall variance multiplier of ~1.0 ((1 + m^2)^3 * m for branch
# multiplier m): measured mu std at init is then within ~2x of the
# input RMS and from-scratch training takes off immediately. Loaded
# checkpoints are unaffected (converters overwrite g and v).
INIT_VAR = 0.5


def _wn_uniform(fan_in: int, init_var: float):
    return _uniform_symmetric(float(np.sqrt(3.0 * init_var / fan_in)))


class WNConv(nn.Module):
    """Weight-normalized Conv1d: kernel = g * v / ||v||, norm per output
    channel over (k, in) — torch weight_norm dim=0 semantics."""
    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    init_var: float = INIT_VAR
    bias_init: Any = nn.initializers.zeros

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        shape = (self.kernel_size, in_ch, self.features)
        fan_in = self.kernel_size * in_ch
        v = self.param("v", _wn_uniform(fan_in, self.init_var), shape)
        # torch weight_norm semantics: g = ||v|| so the effective kernel
        # IS the base init (g=1 would force unit-norm kernels, ~1.7x the
        # intended scale per layer — enough to saturate the decoder's
        # output tanh at init and kill waveform-loss gradients).
        g = self.param("g", lambda key, s: jnp.sqrt(
            jnp.sum(jnp.square(v), axis=(0, 1)) + 1e-12), (self.features,))
        norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=(0, 1), keepdims=True)
                        + 1e-12)
        kernel = (g[None, None, :] / norm) * v
        b = self.param("bias", self.bias_init, (self.features,))
        # compute in the parameter dtype (bf16 params -> bf16 conv; raw
        # lax.conv requires matching operand dtypes, unlike nn.Conv).
        # strided convs go through the phase-packed safe formulation:
        # the tunneled TPU backend miscompiles the reverse pass of
        # strided/lhs-dilated conv chains (see ops/safe_conv.py)
        y = safe_conv.strided_conv1d(
            x.astype(kernel.dtype), kernel, self.stride,
            (self.padding, self.padding), self.dilation)
        return y + b


class WNConvTranspose(nn.Module):
    """Weight-normalized ConvTranspose1d (exact torch length semantics:
    out = (T-1)*s - 2*pad + k + output_padding)."""
    features: int
    kernel_size: int
    stride: int
    padding: int
    output_padding: int = 0
    init_var: float = 0.0  # 0 -> INIT_VAR * stride (see below)

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        # torch layout (in, out, k); we keep (k, out, in) for the dilated-conv
        # trick: conv(dilate(x, s), flip_k(W)) with swapped channel roles
        shape = (self.kernel_size, self.features, in_ch)
        fan_in = self.kernel_size * in_ch
        # a stride-s transposed conv has only ~k/s contributing taps per
        # output sample, so preserving variance needs s x the weight
        # variance of a dense conv with the same nominal fan_in
        init_var = self.init_var or INIT_VAR * self.stride
        v = self.param("v", _wn_uniform(fan_in, init_var), shape)
        # torch weight_norm on ConvTranspose1d normalizes over dim != 0,
        # i.e. per *input* channel (dim0 of (in, out, k)); here in-channel
        # is the last axis. g inits to ||v|| (torch semantics — see WNConv)
        g = self.param("g", lambda key, s: jnp.sqrt(
            jnp.sum(jnp.square(v), axis=(0, 1)) + 1e-12), (in_ch,))
        norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=(0, 1), keepdims=True)
                        + 1e-12)
        w = (g[None, None, :] / norm) * v
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        # subpixel safe formulation — the lhs-dilated conv's reverse
        # pass is miscompiled on the tunneled TPU backend (safe_conv.py)
        y = safe_conv.transpose_conv1d(
            x.astype(w.dtype), w, self.stride, self.padding,
            self.output_padding)
        return y + b


class ResidualUnit(nn.Module):
    """Snake -> dilated WNConv(k7) -> Snake -> WNConv(k1), residual
    (reference: dac-vae/model.py:107-143)."""
    dim: int
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        pad = ((7 - 1) * self.dilation) // 2
        y = Snake1d(self.dim, name="snake1")(x)
        y = WNConv(self.dim, 7, padding=pad, dilation=self.dilation,
                   name="conv1")(y)
        y = Snake1d(self.dim, name="snake2")(y)
        y = WNConv(self.dim, 1, name="conv2")(y)
        crop = (x.shape[1] - y.shape[1]) // 2
        if crop > 0:
            x = x[:, crop:-crop]
        return x + y


class EncoderBlock(nn.Module):
    dim: int
    stride: int

    @nn.compact
    def __call__(self, x):
        h = ResidualUnit(self.dim // 2, 1, name="res1")(x)
        h = ResidualUnit(self.dim // 2, 3, name="res2")(h)
        h = ResidualUnit(self.dim // 2, 9, name="res3")(h)
        h = Snake1d(self.dim // 2, name="snake")(h)
        return WNConv(self.dim, 2 * self.stride, stride=self.stride,
                      padding=math.ceil(self.stride / 2), name="down")(h)


class DecoderBlock(nn.Module):
    input_dim: int
    output_dim: int
    stride: int

    @nn.compact
    def __call__(self, x):
        h = Snake1d(self.input_dim, name="snake")(x)
        h = WNConvTranspose(self.output_dim, 2 * self.stride, self.stride,
                            padding=math.ceil(self.stride / 2),
                            output_padding=0 if self.stride % 2 == 0 else 1,
                            name="up")(h)
        h = ResidualUnit(self.output_dim, 1, name="res1")(h)
        h = ResidualUnit(self.output_dim, 3, name="res2")(h)
        h = ResidualUnit(self.output_dim, 9, name="res3")(h)
        return h


class DACEncoder(nn.Module):
    cfg: DACVAEConfig

    @nn.compact
    def __call__(self, audio):
        """(B, T, d_in) -> (B, T/hop, latent)"""
        c = self.cfg
        d = c.encoder_dim
        h = WNConv(d, 7, padding=3, name="conv_in")(audio)
        for i, s in enumerate(c.encoder_rates):
            d *= 2
            h = EncoderBlock(d, s, name=f"block_{i}")(h)
        h = Snake1d(d, name="snake_out")(h)
        return WNConv(c.latent_dim, 3, padding=1, name="conv_out")(h)


class DACDecoder(nn.Module):
    cfg: DACVAEConfig

    @nn.compact
    def __call__(self, z):
        """(B, T, latent) -> (B, T*hop, d_out)"""
        c = self.cfg
        h = WNConv(c.decoder_dim, 7, padding=3, name="conv_in")(z)
        dim = c.decoder_dim
        for i, s in enumerate(c.decoder_rates):
            out_dim = dim // 2
            h = DecoderBlock(dim, out_dim, s, name=f"block_{i}")(h)
            dim = out_dim
        h = Snake1d(dim, name="snake_out")(h)
        h = WNConv(c.d_out, 7, padding=3, name="conv_out")(h)
        if c.use_tanh_final:
            h = jnp.tanh(h)
        else:
            h = jnp.clip(h, -1.0, 1.0)
        return h


class DACVAE(nn.Module):
    """encode (-> reparameterized z, mu, logs) / decode
    (reference: dac-vae/model.py:382-506)."""
    cfg: DACVAEConfig = DACVAEConfig()

    def setup(self):
        self.encoder = DACEncoder(self.cfg)
        self.decoder = DACDecoder(self.cfg)

        def mu_logs_bias(key, shape, dtype=jnp.float32):
            # start near-deterministic: logs = -4 (sigma ~ 0.018) so the
            # reparam noise cannot swamp the encoder signal at init (the
            # measured posterior-collapse mode — see INIT_VAR above);
            # the beta-annealed KL pulls sigma up later as training
            # regularizes
            l = self.cfg.latent_dim
            return jnp.concatenate([jnp.zeros((l,), dtype),
                                    jnp.full((l,), -4.0, dtype)])

        self.en_conv_post = WNConv(2 * self.cfg.latent_dim, 1,
                                   bias_init=mu_logs_bias)
        self.de_conv_pre = WNConv(self.cfg.latent_dim, 1)

    def encode(self, audio, key=None):
        """audio: (B, T, 1), T a multiple of hop_length. Returns z, mu, logs
        each (B, T/hop, latent); z == mu when key is None."""
        x = self.encoder(audio)
        x = nn.leaky_relu(x, negative_slope=0.01)
        x = self.en_conv_post(x)
        mu, logs = jnp.split(x, 2, axis=-1)
        logs = jnp.clip(logs, -14.0, 14.0)
        if key is None:
            return mu, mu, logs
        z = mu + jax.random.normal(key, mu.shape, mu.dtype) * jnp.exp(logs)
        return z, mu, logs

    def decode(self, z):
        return self.decoder(self.de_conv_pre(z))

    def __call__(self, audio, key=None):
        z, mu, logs = self.encode(audio, key)
        return {"audio": self.decode(z), "z": z, "mu": mu, "logs": logs}


def pad_to_hop(audio: np.ndarray, hop: int) -> np.ndarray:
    """Right-pad (..., T) to a hop multiple (reference: model.py:509-520)."""
    t = audio.shape[-1]
    pad = (-t) % hop
    if pad:
        widths = [(0, 0)] * (audio.ndim - 1) + [(0, pad)]
        audio = np.pad(audio, widths)
    return audio


# ---------------------------------------------------------------------------
# torch checkpoint import
# ---------------------------------------------------------------------------

def params_from_torch_state(state: dict, cfg: DACVAEConfig) -> dict:
    """Map a reference DACVAE state_dict with weight-norm params
    (*.weight_g / *.weight_v, or parametrizations.weight.original0/1) to
    our (g, v) pytree. Accepts numpy arrays."""
    def norm_key(k):
        return (k.replace("parametrizations.weight.original0", "weight_g")
                 .replace("parametrizations.weight.original1", "weight_v"))

    state = {norm_key(k): v for k, v in state.items()}

    def conv(prefix, transpose=False):
        g = state[prefix + ".weight_g"]  # (out,1,1) or (in,1,1) for transpose
        v = state[prefix + ".weight_v"]  # (out,in,k) or (in,out,k)
        bias = state[prefix + ".bias"]
        if transpose:
            vv = np.transpose(v, (2, 1, 0))  # (k, out, in)
        else:
            vv = np.transpose(v, (2, 1, 0))  # (k, in, out)
        return {"g": g.reshape(-1), "v": vv, "bias": bias}

    def snake(prefix):
        a = state[prefix + ".alpha"]  # (1, C, 1)
        return {"alpha": np.transpose(a, (0, 2, 1))}

    def res_unit(tp, jp, out):
        # torch Sequential: block.0 snake, block.1 conv7, block.2 snake, block.3 conv1
        out[jp] = {
            "snake1": snake(f"{tp}.block.0"),
            "conv1": conv(f"{tp}.block.1"),
            "snake2": snake(f"{tp}.block.2"),
            "conv2": conv(f"{tp}.block.3"),
        }

    p: dict = {"encoder": {}, "decoder": {}}
    enc = p["encoder"]
    enc["conv_in"] = conv("encoder.block.0")
    for i in range(len(cfg.encoder_rates)):
        tp = f"encoder.block.{i + 1}"
        blk: dict = {}
        for j in range(3):
            res_unit(f"{tp}.block.{j}", f"res{j + 1}", blk)
        blk["snake"] = snake(f"{tp}.block.3")
        blk["down"] = conv(f"{tp}.block.4")
        enc[f"block_{i}"] = blk
    n = len(cfg.encoder_rates) + 1
    enc["snake_out"] = snake(f"encoder.block.{n}")
    enc["conv_out"] = conv(f"encoder.block.{n + 1}")

    dec = p["decoder"]
    dec["conv_in"] = conv("decoder.model.0")
    for i in range(len(cfg.decoder_rates)):
        tp = f"decoder.model.{i + 1}"
        blk = {"snake": snake(f"{tp}.block.0"),
               "up": conv(f"{tp}.block.1", transpose=True)}
        for j in range(3):
            res_unit(f"{tp}.block.{j + 2}", f"res{j + 1}", blk)
        dec[f"block_{i}"] = blk
    n = len(cfg.decoder_rates) + 1
    dec["snake_out"] = snake(f"decoder.model.{n}")
    dec["conv_out"] = conv(f"decoder.model.{n + 1}")

    p["en_conv_post"] = conv("en_conv_post")
    p["de_conv_pre"] = conv("de_conv_pre")
    return {"params": p}
