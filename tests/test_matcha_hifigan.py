"""Matcha HiFi-GAN vocoder + denoiser (reference:
speech/matcha/hifigan/{models,denoiser}.py) — torch parity through the
weight-norm converter, denoiser behavior, and the standalone CLI."""
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F
from torch.nn.utils import weight_norm

import jax
import jax.numpy as jnp

from minimax_speech_tpu.models.matcha_hifigan import (Denoiser,
                                                      MatchaHiFiGAN,
                                                      MatchaHiFiGANConfig,
                                                      matcha_hifigan_params)

TINY = MatchaHiFiGANConfig(
    in_channels=8, upsample_initial_channel=16, upsample_rates=(4, 2),
    upsample_kernel_sizes=(8, 4), resblock_kernel_sizes=(3, 5),
    resblock_dilation_sizes=((1, 2), (1, 2)))


def get_padding(k, d):
    return (k * d - d) // 2


class TorchResBlock1(nn.Module):
    def __init__(self, ch, k, dils):
        super().__init__()
        self.convs1 = nn.ModuleList([
            weight_norm(nn.Conv1d(ch, ch, k, 1, dilation=d,
                                  padding=get_padding(k, d))) for d in dils])
        self.convs2 = nn.ModuleList([
            weight_norm(nn.Conv1d(ch, ch, k, 1, dilation=1,
                                  padding=get_padding(k, 1))) for _ in dils])

    def forward(self, x):
        for c1, c2 in zip(self.convs1, self.convs2):
            xt = c1(F.leaky_relu(x, 0.1))
            xt = c2(F.leaky_relu(xt, 0.1))
            x = xt + x
        return x


class TorchGenerator(nn.Module):
    """matcha/hifigan/models.py:148-205 at test scale."""

    def __init__(self, cfg: MatchaHiFiGANConfig):
        super().__init__()
        self.cfg = cfg
        self.num_kernels = len(cfg.resblock_kernel_sizes)
        self.conv_pre = weight_norm(
            nn.Conv1d(cfg.in_channels, cfg.upsample_initial_channel, 7, 1,
                      padding=3))
        self.ups = nn.ModuleList()
        for i, (u, k) in enumerate(zip(cfg.upsample_rates,
                                       cfg.upsample_kernel_sizes)):
            self.ups.append(weight_norm(nn.ConvTranspose1d(
                cfg.upsample_initial_channel // (2 ** i),
                cfg.upsample_initial_channel // (2 ** (i + 1)),
                k, u, padding=(k - u) // 2)))
        self.resblocks = nn.ModuleList()
        for i in range(len(self.ups)):
            ch = cfg.upsample_initial_channel // (2 ** (i + 1))
            for k, d in zip(cfg.resblock_kernel_sizes,
                            cfg.resblock_dilation_sizes):
                self.resblocks.append(TorchResBlock1(ch, k, d))
        self.conv_post = weight_norm(nn.Conv1d(ch, 1, 7, 1, padding=3))

    def forward(self, x):
        x = self.conv_pre(x)
        for i in range(len(self.ups)):
            x = self.ups[i](F.leaky_relu(x, 0.1))
            xs = None
            for j in range(self.num_kernels):
                h = self.resblocks[i * self.num_kernels + j](x)
                xs = h if xs is None else xs + h
            x = xs / self.num_kernels
        x = self.conv_post(F.leaky_relu(x))
        return torch.tanh(x)


def test_matcha_hifigan_parity_vs_torch(rng):
    torch.manual_seed(3)
    ref = TorchGenerator(TINY).eval()
    mel = rng.standard_normal((2, 11, 8)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(mel).transpose(1, 2)).numpy()[:, 0]

    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    variables = matcha_hifigan_params(state, TINY)
    model = MatchaHiFiGAN(TINY)
    got = np.asarray(model.apply(variables, jnp.asarray(mel)))
    assert got.shape == want.shape == (2, 11 * 8)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_denoiser_reduces_bias(rng):
    model = MatchaHiFiGAN(TINY)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 8)))

    def voc(mel):
        return model.apply(variables, mel)

    den = Denoiser(voc, filter_length=64, n_overlap=4, mel_frames=16,
                   n_mels=8)
    audio = model.apply(variables, jnp.zeros((1, 32, 8)))[0]
    out = den(audio, strength=1.0)
    assert out.shape[0] <= audio.shape[0] + 64
    assert np.isfinite(np.asarray(out)).all()
    # subtracting the bias spectrum at full strength shrinks the
    # zero-mel (pure bias) signal
    assert float(jnp.mean(out[:len(audio)] ** 2)) \
        < float(jnp.mean(audio ** 2)) + 1e-9
    # strength 0 is (near-)identity through stft/istft
    out0 = den(audio, strength=0.0)
    n = min(len(out0), len(audio))
    np.testing.assert_allclose(np.asarray(out0)[:n],
                               np.asarray(audio)[:n], atol=1e-4)
