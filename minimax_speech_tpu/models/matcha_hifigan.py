"""Matcha-TTS vocoder: vanilla HiFi-GAN V1 generator + spectral denoiser.

Reference: speech/matcha/hifigan/models.py:14-205 (Generator with
weight-normed convs, ConvTranspose upsampling, ResBlock1 leaky-relu
residual stacks, tanh output) and hifigan/denoiser.py:7-64 (WaveGlow
style bias-spectrum subtraction). The CosyVoice HiFT vocoder
(models/hifigan.py) is NSF+iSTFT and structurally different — Matcha's
standalone pipeline needs this plain HiFi-GAN.

Channel-last (B, T, C); weight-norm convs reuse the DAC-VAE primitives
(exact torch semantics, models/dac_vae.py), so released matcha
`generator_v1` checkpoints convert via matcha_hifigan_params.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from minimax_speech_tpu.models.dac_vae import WNConv, WNConvTranspose
from minimax_speech_tpu.ops import mel as mel_ops

LRELU_SLOPE = 0.1


@dataclass(frozen=True)
class MatchaHiFiGANConfig:
    in_channels: int = 80
    upsample_initial_channel: int = 512
    upsample_rates: Tuple[int, ...] = (8, 8, 2, 2)
    upsample_kernel_sizes: Tuple[int, ...] = (16, 16, 4, 4)
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    resblock_dilation_sizes: Tuple[Tuple[int, ...], ...] = (
        (1, 3, 5), (1, 3, 5), (1, 3, 5))

    @property
    def hop_length(self) -> int:
        return int(np.prod(self.upsample_rates))


class MatchaResBlock1(nn.Module):
    """ResBlock1 (reference: matcha/hifigan/models.py:14-103)."""
    channels: int
    kernel_size: int
    dilations: Tuple[int, ...]

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        for j, d in enumerate(self.dilations):
            h = nn.leaky_relu(x, LRELU_SLOPE)
            h = WNConv(self.channels, k, padding=(k * d - d) // 2,
                       dilation=d, name=f"conv1_{j}")(h)
            h = nn.leaky_relu(h, LRELU_SLOPE)
            h = WNConv(self.channels, k, padding=(k - 1) // 2,
                       name=f"conv2_{j}")(h)
            x = x + h
        return x


class MatchaHiFiGAN(nn.Module):
    cfg: MatchaHiFiGANConfig = MatchaHiFiGANConfig()

    @nn.compact
    def __call__(self, mel: jnp.ndarray) -> jnp.ndarray:
        """mel: (B, T, 80) -> (B, T * hop) waveform in [-1, 1]."""
        c = self.cfg
        n_k = len(c.resblock_kernel_sizes)
        x = WNConv(c.upsample_initial_channel, 7, padding=3,
                   name="conv_pre")(mel)
        for i, (u, k) in enumerate(zip(c.upsample_rates,
                                       c.upsample_kernel_sizes)):
            ch = c.upsample_initial_channel // (2 ** (i + 1))
            x = nn.leaky_relu(x, LRELU_SLOPE)
            x = WNConvTranspose(ch, k, u, padding=(k - u) // 2,
                                name=f"ups_{i}")(x)
            acc = None
            for j, (rk, rd) in enumerate(zip(c.resblock_kernel_sizes,
                                             c.resblock_dilation_sizes)):
                h = MatchaResBlock1(ch, rk, rd,
                                    name=f"resblocks_{i * n_k + j}")(x)
                acc = h if acc is None else acc + h
            x = acc / n_k
        x = nn.leaky_relu(x)
        x = WNConv(1, 7, padding=3, name="conv_post")(x)
        return jnp.tanh(x)[..., 0]


def matcha_hifigan_params(state: dict,
                          cfg: MatchaHiFiGANConfig = MatchaHiFiGANConfig(),
                          ) -> dict:
    """Matcha/HiFi-GAN `generator_v1` torch state dict -> params pytree
    (reuses the HiFT weight-norm converter helpers, utils/convert.py)."""
    from minimax_speech_tpu.utils.convert import _wn_conv, strip_prefix
    state = strip_prefix(state, ("generator.", "module."))
    p = {"conv_pre": _wn_conv(state, "conv_pre."),
         "conv_post": _wn_conv(state, "conv_post.")}
    n_k = len(cfg.resblock_kernel_sizes)
    for i in range(len(cfg.upsample_rates)):
        p[f"ups_{i}"] = _wn_conv(state, f"ups.{i}.", transpose=True)
        for j in range(n_k):
            m = i * n_k + j
            rb = {}
            for jj in range(len(cfg.resblock_dilation_sizes[j])):
                rb[f"conv1_{jj}"] = _wn_conv(state,
                                             f"resblocks.{m}.convs1.{jj}.")
                rb[f"conv2_{jj}"] = _wn_conv(state,
                                             f"resblocks.{m}.convs2.{jj}.")
            p[f"resblocks_{m}"] = rb
    return {"params": p}


class Denoiser:
    """WaveGlow-style spectral denoiser (reference:
    matcha/hifigan/denoiser.py:7-64): subtract `strength` times the
    vocoder's zero-mel bias spectrum, keep the noisy phase."""

    def __init__(self, vocoder_apply, filter_length: int = 1024,
                 n_overlap: int = 4, mode: str = "zeros",
                 mel_frames: int = 88, n_mels: int = 80):
        self.n_fft = filter_length
        self.hop = filter_length // n_overlap
        if mode == "zeros":
            mel = jnp.zeros((1, mel_frames, n_mels))
        elif mode == "normal":
            mel = jnp.asarray(np.random.default_rng(0).standard_normal(
                (1, mel_frames, n_mels)), jnp.float32)
        else:
            raise ValueError(mode)

        # jit everything touching complex dtypes: the TPU backend only
        # supports complex FFT/arith through XLA-compiled programs
        def bias(m):
            mag, _ = self._stft(vocoder_apply(m)[0])
            return mag[:1]  # first frame's magnitude column

        self.bias_spec = jax.jit(bias)(mel)
        self._denoise = jax.jit(self._denoise_impl)

    def _stft(self, audio: jnp.ndarray):
        p = self.n_fft // 2
        x = jnp.pad(audio, (p, p), mode="reflect")
        frames = mel_ops.frame_signal(x, self.n_fft, self.hop)
        win = mel_ops.hann_window(self.n_fft, x.dtype)
        spec = jnp.fft.rfft(frames * win, n=self.n_fft, axis=-1)
        mag = jnp.sqrt(jnp.real(spec) ** 2 + jnp.imag(spec) ** 2 + 1e-12)
        phase = jnp.arctan2(jnp.imag(spec), jnp.real(spec))
        return mag, phase

    def _denoise_impl(self, audio: jnp.ndarray,
                      strength: jnp.ndarray) -> jnp.ndarray:
        mag, phase = self._stft(audio)
        mag = jnp.clip(mag - self.bias_spec * strength, 0.0, None)
        real = (mag * jnp.cos(phase)).T
        imag = (mag * jnp.sin(phase)).T
        return mel_ops.istft(real, imag, self.n_fft, self.hop)

    def __call__(self, audio: jnp.ndarray,
                 strength: float = 0.0005) -> jnp.ndarray:
        """audio: (T,) -> (T',) denoised."""
        return self._denoise(audio, jnp.float32(strength))
