"""CAMPPlus x-vector extractor (D-TDNN with context-aware masking).

The reference extracts speaker embeddings with a campplus.onnx session
(reference: speech/cosyvoice/cli/frontend.py:104-113); the graph is the
public 3D-Speaker CAM++ model (feat 80 -> embedding 192): an FCM 2-D
conv front-end (freq /8), a TDNN stem, three CAM-dense-TDNN blocks with
transit layers, stats pooling (mean+std) and a dense head. This is a
TPU-native (channel-last, eval-mode batchnorm folded to affine params)
reimplementation; weights load from a released torch state dict or from
the campplus.onnx initializers (utils/convert.py:convert_campplus,
utils/onnx_reader.py) — mirroring how the reference itself ports
ONNX-only weights (S3Tokenizer/s3tokenizer/utils.py:68-174 onnx2torch).

Geometry: feat (B, T, 80) kaldi fbank (mean-subtracted) -> (B, 192).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class CAMPPlusConfig:
    feat_dim: int = 80
    embedding_size: int = 192
    growth_rate: int = 32
    bn_size: int = 4                  # bottleneck = bn_size * growth_rate
    init_channels: int = 128
    m_channels: int = 32              # FCM channels
    block_layers: Tuple[int, ...] = (12, 24, 16)
    block_dilations: Tuple[int, ...] = (1, 2, 2)
    seg_len: int = 100                # CAM segment pooling length


class BNEval(nn.Module):
    """Inference-mode BatchNorm as a stored-stats affine (torch eval
    semantics, eps 1e-5)."""
    relu: bool = True

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        gamma = self.param("gamma", nn.initializers.ones, (c,))
        beta = self.param("beta", nn.initializers.zeros, (c,))
        mean = self.param("mean", nn.initializers.zeros, (c,))
        var = self.param("var", nn.initializers.ones, (c,))
        x = (x - mean) * gamma / jnp.sqrt(var + 1e-5) + beta
        return nn.relu(x) if self.relu else x


class BasicResBlock(nn.Module):
    """FCM residual block; stride applies to the FREQ axis only."""
    planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        # x: (B, F, T, C)
        in_c = x.shape[-1]
        h = nn.Conv(self.planes, (3, 3), strides=(self.stride, 1),
                    padding=1, use_bias=False, name="conv1")(x)
        h = BNEval(name="bn1")(h)
        h = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                    name="conv2")(h)
        h = BNEval(relu=False, name="bn2")(h)
        if self.stride != 1 or in_c != self.planes:
            sc = nn.Conv(self.planes, (1, 1), strides=(self.stride, 1),
                         use_bias=False, name="shortcut_conv")(x)
            sc = BNEval(relu=False, name="shortcut_bn")(sc)
        else:
            sc = x
        return nn.relu(h + sc)


class FCM(nn.Module):
    """2-D conv front-end: (B, T, F) -> (B, T, m_channels * F/8)."""
    cfg: CAMPPlusConfig

    @nn.compact
    def __call__(self, feat):
        m = self.cfg.m_channels
        x = jnp.swapaxes(feat, 1, 2)[..., None]        # (B, F, T, 1)
        x = nn.Conv(m, (3, 3), padding=1, use_bias=False, name="conv1")(x)
        x = BNEval(name="bn1")(x)
        x = BasicResBlock(m, stride=2, name="layer1_0")(x)
        x = BasicResBlock(m, stride=1, name="layer1_1")(x)
        x = BasicResBlock(m, stride=2, name="layer2_0")(x)
        x = BasicResBlock(m, stride=1, name="layer2_1")(x)
        x = nn.Conv(m, (3, 3), strides=(2, 1), padding=1, use_bias=False,
                    name="conv2")(x)
        x = BNEval(name="bn2")(x)
        b, f, t, ch = x.shape
        # (B, F, T, C) -> (B, T, C*F) matching torch reshape(B, C*F, T)
        return jnp.transpose(x, (0, 2, 3, 1)).reshape(b, t, ch * f)


def _conv1d(x, features, kernel, stride=1, dilation=1, bias=False,
            name=None):
    pad = (kernel - 1) // 2 * dilation
    return nn.Conv(features, (kernel,), strides=(stride,),
                   padding=[(pad, pad)], kernel_dilation=(dilation,),
                   use_bias=bias, name=name)(x)


class CAMLayer(nn.Module):
    """Context-aware mask: local conv output gated by a sigmoid mask from
    global mean + segment-pooled context."""
    bn_channels: int
    out_channels: int
    kernel_size: int
    dilation: int
    seg_len: int = 100

    @nn.compact
    def __call__(self, x):
        # x: (B, T, bn_channels)
        y = _conv1d(x, self.out_channels, self.kernel_size,
                    dilation=self.dilation, name="linear_local")
        context = jnp.mean(x, axis=1, keepdims=True) + self._seg_pool(x)
        context = nn.relu(_conv1d(context, self.bn_channels // 2, 1,
                                  bias=True, name="linear1"))
        m = nn.sigmoid(_conv1d(context, self.out_channels, 1, bias=True,
                               name="linear2"))
        return y * m

    def _seg_pool(self, x):
        """avg_pool1d(seg_len, ceil_mode) then piecewise-constant
        upsample truncated to T (3D-Speaker CAMLayer.seg_pooling)."""
        b, t, c = x.shape
        s = self.seg_len
        n_seg = -(-t // s)
        pad = n_seg * s - t
        xp = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        counts = np.minimum(np.arange(1, n_seg + 1) * s, t) \
            - np.arange(n_seg) * s
        seg = xp.reshape(b, n_seg, s, c).sum(axis=2) \
            / jnp.asarray(counts, x.dtype)[None, :, None]
        up = jnp.repeat(seg, s, axis=1)[:, :t]
        return up


class CAMDenseTDNNLayer(nn.Module):
    growth_rate: int
    bn_channels: int
    kernel_size: int
    dilation: int
    seg_len: int = 100

    @nn.compact
    def __call__(self, x):
        h = BNEval(name="nonlinear1")(x)
        h = _conv1d(h, self.bn_channels, 1, name="linear1")
        h = BNEval(name="nonlinear2")(h)
        return CAMLayer(self.bn_channels, self.growth_rate,
                        self.kernel_size, self.dilation,
                        self.seg_len, name="cam_layer")(h)


class CAMPPlus(nn.Module):
    cfg: CAMPPlusConfig = CAMPPlusConfig()

    @nn.compact
    def __call__(self, feat: jnp.ndarray) -> jnp.ndarray:
        """feat: (B, T, 80) mean-subtracted kaldi fbank -> (B, 192)."""
        c = self.cfg
        x = FCM(c, name="head")(feat)

        # TDNN stem: k=5 stride 2
        x = _conv1d(x, c.init_channels, 5, stride=2, name="tdnn_linear")
        x = BNEval(name="tdnn_bn")(x)

        for bi, (n_layers, dil) in enumerate(zip(c.block_layers,
                                                 c.block_dilations)):
            for li in range(n_layers):
                h = CAMDenseTDNNLayer(
                    c.growth_rate, c.bn_size * c.growth_rate, 3, dil,
                    c.seg_len, name=f"block{bi + 1}_layer{li + 1}")(x)
                x = jnp.concatenate([x, h], axis=-1)
            x = BNEval(name=f"transit{bi + 1}_bn")(x)
            x = _conv1d(x, x.shape[-1] // 2, 1,
                        name=f"transit{bi + 1}_linear")
        x = BNEval(name="out_bn")(x)

        # stats pooling: mean + std (unbiased, torch default)
        mean = jnp.mean(x, axis=1)
        var = jnp.sum((x - mean[:, None]) ** 2, axis=1) \
            / jnp.maximum(x.shape[1] - 1, 1)
        stats = jnp.concatenate([mean, jnp.sqrt(var + 1e-10)], axis=-1)

        emb = nn.Dense(c.embedding_size, use_bias=False,
                       name="dense_linear")(stats)
        return BNEval(relu=False, name="dense_bn")(emb)
