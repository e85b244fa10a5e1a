"""DAC-VAE parity vs torch weight-norm reference math (small geometry)."""
import math

import numpy as np
import pytest
import torch
import torch.nn as tnn
from torch.nn.utils import weight_norm

import jax
import jax.numpy as jnp

from minimax_speech_tpu.models import dac_vae


SMALL = dac_vae.DACVAEConfig(encoder_dim=4, encoder_rates=(2, 3),
                             latent_dim=6, decoder_dim=16,
                             decoder_rates=(3, 2))


def snake_t(x, alpha):
    return x + (alpha + 1e-9).reciprocal() * torch.sin(alpha * x).pow(2)


class TSnake(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.alpha = tnn.Parameter(torch.ones(1, c, 1))

    def forward(self, x):
        return snake_t(x, self.alpha)


def t_res_unit(dim, dilation):
    pad = ((7 - 1) * dilation) // 2
    return tnn.Sequential(
        TSnake(dim),
        weight_norm(tnn.Conv1d(dim, dim, 7, dilation=dilation, padding=pad)),
        TSnake(dim),
        weight_norm(tnn.Conv1d(dim, dim, 1)))


class TResUnit(tnn.Module):
    def __init__(self, dim, dilation):
        super().__init__()
        self.block = t_res_unit(dim, dilation)

    def forward(self, x):
        y = self.block(x)
        pad = (x.shape[-1] - y.shape[-1]) // 2
        if pad > 0:
            x = x[..., pad:-pad]
        return x + y


class TEncBlock(tnn.Module):
    def __init__(self, dim, stride):
        super().__init__()
        self.block = tnn.Sequential(
            TResUnit(dim // 2, 1), TResUnit(dim // 2, 3), TResUnit(dim // 2, 9),
            TSnake(dim // 2),
            weight_norm(tnn.Conv1d(dim // 2, dim, 2 * stride, stride=stride,
                                   padding=math.ceil(stride / 2))))

    def forward(self, x):
        return self.block(x)


class TDecBlock(tnn.Module):
    def __init__(self, in_dim, out_dim, stride):
        super().__init__()
        self.block = tnn.Sequential(
            TSnake(in_dim),
            weight_norm(tnn.ConvTranspose1d(
                in_dim, out_dim, 2 * stride, stride=stride,
                padding=math.ceil(stride / 2),
                output_padding=0 if stride % 2 == 0 else 1)),
            TResUnit(out_dim, 1), TResUnit(out_dim, 3), TResUnit(out_dim, 9))

    def forward(self, x):
        return self.block(x)


class TDACVAE(tnn.Module):
    def __init__(self, cfg):
        super().__init__()
        d = cfg.encoder_dim
        enc = [weight_norm(tnn.Conv1d(cfg.d_in, d, 7, padding=3))]
        for s in cfg.encoder_rates:
            d *= 2
            enc.append(TEncBlock(d, s))
        enc += [TSnake(d), weight_norm(tnn.Conv1d(d, cfg.latent_dim, 3,
                                                  padding=1))]
        self.encoder = tnn.Module()
        self.encoder.block = tnn.Sequential(*enc)
        dec = [weight_norm(tnn.Conv1d(cfg.latent_dim, cfg.decoder_dim, 7,
                                      padding=3))]
        dim = cfg.decoder_dim
        for s in cfg.decoder_rates:
            dec.append(TDecBlock(dim, dim // 2, s))
            dim //= 2
        dec += [TSnake(dim), weight_norm(tnn.Conv1d(dim, cfg.d_out, 7,
                                                    padding=3)), tnn.Tanh()]
        self.decoder = tnn.Module()
        self.decoder.model = tnn.Sequential(*dec)
        self.en_conv_post = weight_norm(
            tnn.Conv1d(cfg.latent_dim, 2 * cfg.latent_dim, 1))
        self.de_conv_pre = weight_norm(
            tnn.Conv1d(cfg.latent_dim, cfg.latent_dim, 1))

    def encode(self, audio):
        x = self.encoder.block(audio)
        x = torch.nn.functional.leaky_relu(x)
        x = self.en_conv_post(x)
        m, logs = torch.split(x, x.shape[1] // 2, dim=1)
        return m, torch.clamp(logs, -14.0, 14.0)

    def decode(self, z):
        return self.decoder.model(self.de_conv_pre(z))


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(3)
    tm = TDACVAE(SMALL).eval()
    state = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = dac_vae.params_from_torch_state(state, SMALL)
    jm = dac_vae.DACVAE(SMALL)
    return tm, jm, params


def test_encode_parity(pair, rng):
    tm, jm, params = pair
    hop = SMALL.hop_length  # 6
    audio = rng.standard_normal((2, 1, 20 * hop)).astype(np.float32) * 0.3
    with torch.no_grad():
        m_t, logs_t = tm.encode(torch.from_numpy(audio))
    z, m_j, logs_j = jm.apply(params, jnp.asarray(audio.transpose(0, 2, 1)),
                              method=dac_vae.DACVAE.encode)
    np.testing.assert_allclose(np.asarray(m_j).transpose(0, 2, 1),
                               m_t.numpy(), atol=3e-5)
    np.testing.assert_allclose(np.asarray(logs_j).transpose(0, 2, 1),
                               logs_t.numpy(), atol=3e-5)


def test_decode_parity(pair, rng):
    tm, jm, params = pair
    z = rng.standard_normal((1, SMALL.latent_dim, 15)).astype(np.float32)
    with torch.no_grad():
        golden = tm.decode(torch.from_numpy(z)).numpy()
    ours = jm.apply(params, jnp.asarray(z.transpose(0, 2, 1)),
                    method=dac_vae.DACVAE.decode)
    assert golden.shape[-1] == 15 * SMALL.hop_length
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 2, 1), golden,
                               atol=3e-5)


def test_roundtrip_shapes(pair, rng):
    _, jm, params = pair
    audio = dac_vae.pad_to_hop(
        rng.standard_normal((1, 1, 100)).astype(np.float32), SMALL.hop_length)
    out = jm.apply(params, jnp.asarray(audio.transpose(0, 2, 1)),
                   key=jax.random.PRNGKey(0))
    assert out["audio"].shape == (1, audio.shape[-1], 1)
    assert out["z"].shape[1] == audio.shape[-1] // SMALL.hop_length
