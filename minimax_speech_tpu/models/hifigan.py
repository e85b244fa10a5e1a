"""HiFT vocoder: Neural Source Filter + iSTFTNet (mel -> 24 kHz waveform).

Reference: speech/cosyvoice/hifigan/generator.py:392-582 with
speech/config.yaml:121-145 geometry (base 512, up rates [8,5,3],
istft n_fft 16 hop 4 => total hop 480; 8 harmonics; Snake resblocks)
and f0_predictor.py:22-59.

TPU-first: channel-last convs, the whole decode is one jit region, the
iSTFT head reuses ops.mel.istft (overlap-add via scatter). The sine
source uses an explicit RNG key; pass key=None for the deterministic
voiced-only sine (useful for tests and reproducible synthesis).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from minimax_speech_tpu.models.dac_vae import Snake1d, WNConv, WNConvTranspose
from minimax_speech_tpu.ops import mel as mel_ops
from minimax_speech_tpu.ops import safe_conv


@dataclass(frozen=True)
class HiFTConfig:
    in_channels: int = 80
    base_channels: int = 512
    nb_harmonics: int = 8
    sampling_rate: int = 24000
    nsf_alpha: float = 0.1
    nsf_sigma: float = 0.003
    nsf_voiced_threshold: float = 10.0
    upsample_rates: Tuple[int, ...] = (8, 5, 3)
    upsample_kernel_sizes: Tuple[int, ...] = (16, 11, 7)
    istft_n_fft: int = 16
    istft_hop: int = 4
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    resblock_dilations: Tuple[Tuple[int, ...], ...] = ((1, 3, 5),) * 3
    source_resblock_kernel_sizes: Tuple[int, ...] = (7, 7, 11)
    source_resblock_dilations: Tuple[Tuple[int, ...], ...] = ((1, 3, 5),) * 3
    lrelu_slope: float = 0.1
    audio_limit: float = 0.99
    f0_cond_channels: int = 512

    @property
    def total_upsample(self) -> int:
        return int(np.prod(self.upsample_rates)) * self.istft_hop


class ResBlock(nn.Module):
    """HiFiGAN/BigVGAN resblock with Snake activations
    (reference: generator.py:46-101)."""
    channels: int
    kernel_size: int = 3
    dilations: Tuple[int, ...] = (1, 3, 5)

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        for i, d in enumerate(self.dilations):
            h = Snake1d(self.channels, name=f"act1_{i}")(x)
            h = WNConv(self.channels, k, padding=(k * d - d) // 2, dilation=d,
                       name=f"conv1_{i}")(h)
            h = Snake1d(self.channels, name=f"act2_{i}")(h)
            h = WNConv(self.channels, k, padding=(k - 1) // 2,
                       name=f"conv2_{i}")(h)
            x = x + h
        return x


class ConvRNNF0Predictor(nn.Module):
    """mel -> f0 (Hz) per frame (reference: f0_predictor.py:22-59)."""
    cond_channels: int = 512

    @nn.compact
    def __call__(self, mel):
        h = mel
        for i in range(5):
            h = WNConv(self.cond_channels, 3, padding=1, name=f"conv_{i}")(h)
            h = nn.elu(h)
        f0 = nn.Dense(1, name="classifier")(h)[..., 0]
        return jnp.abs(f0)


def sine_source(f0_up: jnp.ndarray, cfg: HiFTConfig,
                key: Optional[jax.Array]) -> jnp.ndarray:
    """f0_up: (B, T_samples) upsampled f0 -> (B, T_samples, 1) source.

    SineGen + SourceModuleHnNSF merge (reference: generator.py:109-223);
    harmonic phases accumulate via cumsum; unvoiced regions get noise.
    The merge linear+tanh is applied by the caller (it has params).
    """
    b, t = f0_up.shape
    harmonics = jnp.arange(1, cfg.nb_harmonics + 2, dtype=f0_up.dtype)
    rad = f0_up[:, :, None] * harmonics[None, None, :] / cfg.sampling_rate
    theta = 2.0 * jnp.pi * (jnp.cumsum(rad, axis=1) % 1.0)
    if key is not None:
        k1, k2 = jax.random.split(key)
        phase = jax.random.uniform(k1, (b, 1, cfg.nb_harmonics + 1),
                                   minval=-jnp.pi, maxval=jnp.pi)
        phase = phase.at[:, :, 0].set(0.0)
        noise_u = jax.random.normal(k2, theta.shape, f0_up.dtype)
    else:
        phase = jnp.zeros((b, 1, cfg.nb_harmonics + 1), f0_up.dtype)
        noise_u = jnp.zeros_like(theta)
    sine = cfg.nsf_alpha * jnp.sin(theta + phase)
    uv = (f0_up > cfg.nsf_voiced_threshold).astype(f0_up.dtype)[:, :, None]
    noise_amp = uv * cfg.nsf_sigma + (1.0 - uv) * cfg.nsf_alpha / 3.0
    return sine * uv + noise_amp * noise_u


class HiFTGenerator(nn.Module):
    cfg: HiFTConfig = HiFTConfig()

    def setup(self):
        c = self.cfg
        self.f0_predictor = ConvRNNF0Predictor(c.f0_cond_channels)
        self.source_linear = nn.Dense(1)  # SourceModuleHnNSF.l_linear
        self.conv_pre = WNConv(c.base_channels, 7, padding=3)

        ups = []
        for i, (u, k) in enumerate(zip(c.upsample_rates,
                                       c.upsample_kernel_sizes)):
            ups.append(WNConvTranspose(c.base_channels // (2 ** (i + 1)), k,
                                       u, padding=(k - u) // 2))
        self.ups = ups

        # source downsample path: rates [1] + reversed(up)[:-1], cumprod
        # reversed (reference: generator.py:470-488)
        down_rates = np.cumprod([1] + list(c.upsample_rates[::-1][:-1]))[::-1]
        downs, src_res = [], []
        nfft2 = c.istft_n_fft + 2
        for i, (u, k, d) in enumerate(zip(
                down_rates, c.source_resblock_kernel_sizes,
                c.source_resblock_dilations)):
            ch = c.base_channels // (2 ** (i + 1))
            # plain (non-weight-norm) convs, like the reference's
            # source_downs (generator.py:475-487)
            if u == 1:
                downs.append(nn.Conv(ch, (1,)))
            else:
                downs.append(safe_conv.SlicedConv(
                    ch, (int(u) * 2,), strides=(int(u),),
                    padding=[(int(u) // 2, int(u) // 2)]))
            src_res.append(ResBlock(ch, k, tuple(d)))
        self.source_downs = downs
        self.source_resblocks = src_res

        res = []
        for i in range(len(c.upsample_rates)):
            ch = c.base_channels // (2 ** (i + 1))
            for k, d in zip(c.resblock_kernel_sizes, c.resblock_dilations):
                res.append(ResBlock(ch, k, tuple(d)))
        self.resblocks = res
        self.conv_post = WNConv(c.istft_n_fft + 2, 7, padding=3)

    def predict_f0(self, mel):
        """mel: (B, T, 80) -> f0 (B, T)."""
        return self.f0_predictor(mel)

    def build_source(self, f0, key: Optional[jax.Array]):
        """f0 (B, T) frame-rate -> source s (B, T*total_upsample, 1)."""
        c = self.cfg
        f0_up = jnp.repeat(f0, c.total_upsample, axis=-1)
        sines = sine_source(f0_up, c, key)
        merged = jnp.tanh(self.source_linear(sines))
        return merged

    def decode(self, mel, source):
        """mel (B, T, 80), source (B, T*up, 1) -> waveform (B, T*up)."""
        c = self.cfg
        s_real, s_imag = self._stft(source[..., 0])
        s_stft = jnp.concatenate([s_real, s_imag], axis=-1)

        x = self.conv_pre(mel)
        n_kernels = len(c.resblock_kernel_sizes)
        for i in range(len(c.upsample_rates)):
            x = nn.leaky_relu(x, negative_slope=c.lrelu_slope)
            x = self.ups[i](x)
            if i == len(c.upsample_rates) - 1:
                # reflection pad (1, 0) in time
                x = jnp.concatenate([x[:, 1:2], x], axis=1)
            si = self.source_downs[i](s_stft)
            si = self.source_resblocks[i](si)
            x = x + si
            acc = None
            for j in range(n_kernels):
                r = self.resblocks[i * n_kernels + j](x)
                acc = r if acc is None else acc + r
            x = acc / n_kernels
        x = nn.leaky_relu(x)
        x = self.conv_post(x)
        nf = c.istft_n_fft // 2 + 1
        magnitude = jnp.exp(jnp.clip(x[..., :nf], None, np.log(1e2)))
        phase = jnp.sin(x[..., nf:])
        real = magnitude * jnp.cos(phase)
        imag = magnitude * jnp.sin(phase)
        wav = mel_ops.istft(jnp.swapaxes(real, 1, 2),
                            jnp.swapaxes(imag, 1, 2),
                            c.istft_n_fft, c.istft_hop)
        return jnp.clip(wav, -c.audio_limit, c.audio_limit)

    def _stft(self, x):
        """(B, T) -> real, imag (B, frames, nfft//2+1)."""
        c = self.cfg
        p = c.istft_n_fft // 2
        xp = jnp.pad(x, ((0, 0), (p, p)), mode="reflect")
        frames = mel_ops.frame_signal(xp, c.istft_n_fft, c.istft_hop)
        win = mel_ops.hann_window(c.istft_n_fft, x.dtype)
        spec = jnp.fft.rfft(frames * win, axis=-1)
        return jnp.real(spec), jnp.imag(spec)

    def __call__(self, mel, key: Optional[jax.Array] = None,
                 cache_source: Optional[jnp.ndarray] = None):
        """Full synthesis: mel (B, T, 80) -> (waveform (B, T*480), source).

        cache_source: (B, S, 1) source prefix from the previous streaming
        chunk, spliced in to avoid boundary glitches
        (reference: generator.py:570-582)."""
        f0 = self.predict_f0(mel)
        s = self.build_source(f0, key)
        if cache_source is not None and cache_source.shape[1] > 0:
            n = cache_source.shape[1]
            s = jnp.concatenate([cache_source, s[:, n:]], axis=1)
        wav = self.decode(mel, s)
        return wav, s
