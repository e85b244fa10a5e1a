"""Legacy MaskedDiffWithXvec (CosyVoice1 mel flow): torch-replica parity
of the non-causal ConditionalDecoder + regulator through the weight
converter, and module-level loss/inference smoke.

Reference: speech/cosyvoice/flow/flow.py:25-198, flow/decoder.py:88-294,
flow/length_regulator.py:21-51.
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from minimax_speech_tpu.models.legacy_flow import (
    ConditionalDecoder, InterpolateRegulator, LegacyEncoderConfig,
    LegacyFlowConfig, LegacyUNetConfig, MaskedDiffWithXvec,
    init_legacy_flow_variables, legacy_flow_inference)
from minimax_speech_tpu.utils import convert


# --- torch replica of the reference non-causal decoder (tiny dims) --------

class TBlock1D(torch.nn.Module):
    def __init__(self, dim, dim_out):
        super().__init__()
        self.block = torch.nn.Sequential(
            torch.nn.Conv1d(dim, dim_out, 3, padding=1),
            torch.nn.GroupNorm(8, dim_out), torch.nn.Mish())

    def forward(self, x, mask):
        return self.block(x * mask) * mask


class TResnet(torch.nn.Module):
    def __init__(self, dim, dim_out, t_dim):
        super().__init__()
        self.mlp = torch.nn.Sequential(torch.nn.Mish(),
                                       torch.nn.Linear(t_dim, dim_out))
        self.block1 = TBlock1D(dim, dim_out)
        self.block2 = TBlock1D(dim_out, dim_out)
        self.res_conv = torch.nn.Conv1d(dim, dim_out, 1)

    def forward(self, x, mask, t):
        h = self.block1(x, mask)
        h = h + self.mlp(t).unsqueeze(-1)
        h = self.block2(h, mask)
        return h + self.res_conv(x * mask)


class TAttn(torch.nn.Module):
    def __init__(self, dim, heads, head_dim):
        super().__init__()
        inner = heads * head_dim
        self.heads, self.head_dim = heads, head_dim
        self.to_q = torch.nn.Linear(dim, inner, bias=False)
        self.to_k = torch.nn.Linear(dim, inner, bias=False)
        self.to_v = torch.nn.Linear(dim, inner, bias=False)
        self.to_out = torch.nn.ModuleList([torch.nn.Linear(inner, dim)])

    def forward(self, x, bias):
        b, t, _ = x.shape
        q = self.to_q(x).view(b, t, self.heads, self.head_dim)
        k = self.to_k(x).view(b, t, self.heads, self.head_dim)
        v = self.to_v(x).view(b, t, self.heads, self.head_dim)
        s = torch.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(self.head_dim)
        w = torch.softmax(s + bias, dim=-1)
        o = torch.einsum("bhqk,bkhd->bqhd", w, v).reshape(b, t, -1)
        return self.to_out[0](o)


class TFF(torch.nn.Module):
    """diffusers FeedForward(activation_fn='gelu') layout: net.0.proj,
    net.2."""
    def __init__(self, dim):
        super().__init__()
        self.net = torch.nn.ModuleList([
            torch.nn.Module(), torch.nn.Identity(),
            torch.nn.Linear(4 * dim, dim)])
        self.net[0].proj = torch.nn.Linear(dim, 4 * dim)

    def forward(self, x):
        return self.net[2](torch.nn.functional.gelu(self.net[0].proj(x)))


class TTfBlock(torch.nn.Module):
    def __init__(self, dim, heads, head_dim):
        super().__init__()
        self.norm1 = torch.nn.LayerNorm(dim)
        self.attn1 = TAttn(dim, heads, head_dim)
        self.norm3 = torch.nn.LayerNorm(dim)
        self.ff = TFF(dim)

    def forward(self, x, bias):
        x = x + self.attn1(self.norm1(x), bias)
        return x + self.ff(self.norm3(x))


class TDown(torch.nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.conv = torch.nn.Conv1d(dim, dim, 3, 2, 1)

    def forward(self, x):
        return self.conv(x)


class TUp(torch.nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.conv = torch.nn.ConvTranspose1d(dim, dim, 4, 2, 1)

    def forward(self, x):
        return self.conv(x)


class TTimeEmbed(torch.nn.Module):
    def __init__(self, dim_in, dim):
        super().__init__()
        self.linear_1 = torch.nn.Linear(dim_in, dim)
        self.linear_2 = torch.nn.Linear(dim, dim)

    def forward(self, t):
        return self.linear_2(torch.nn.functional.silu(self.linear_1(t)))


class TDecoder(torch.nn.Module):
    """Reference ConditionalDecoder topology (flow/decoder.py:88-294)."""

    def __init__(self, in_ch, out_ch, channels, heads, head_dim,
                 n_blocks, n_mid):
        super().__init__()
        self.in_ch = in_ch
        t_dim = channels[0] * 4
        self.time_mlp = TTimeEmbed(in_ch, t_dim)
        self.down_blocks = torch.nn.ModuleList()
        self.mid_blocks = torch.nn.ModuleList()
        self.up_blocks = torch.nn.ModuleList()
        out = in_ch
        for i, ch in enumerate(channels):
            inp, out = out, ch
            last = i == len(channels) - 1
            self.down_blocks.append(torch.nn.ModuleList([
                TResnet(inp, out, t_dim),
                torch.nn.ModuleList([TTfBlock(out, heads, head_dim)
                                     for _ in range(n_blocks)]),
                torch.nn.Conv1d(out, out, 3, padding=1) if last
                else TDown(out)]))
        for _ in range(n_mid):
            self.mid_blocks.append(torch.nn.ModuleList([
                TResnet(channels[-1], channels[-1], t_dim),
                torch.nn.ModuleList([TTfBlock(channels[-1], heads, head_dim)
                                     for _ in range(n_blocks)])]))
        chs = tuple(channels[::-1]) + (channels[0],)
        for i in range(len(chs) - 1):
            inp, out = chs[i] * 2, chs[i + 1]
            last = i == len(chs) - 2
            self.up_blocks.append(torch.nn.ModuleList([
                TResnet(inp, out, t_dim),
                torch.nn.ModuleList([TTfBlock(out, heads, head_dim)
                                     for _ in range(n_blocks)]),
                torch.nn.Conv1d(out, out, 3, padding=1) if last
                else TUp(out)]))
        self.final_block = TBlock1D(chs[-1], chs[-1])
        self.final_proj = torch.nn.Conv1d(chs[-1], out_ch, 1)

    def forward(self, x, mask, mu, t, spks, cond):
        # x/mu/cond: (B, C, T); mask: (B, 1, T); t: (B,)
        half = self.in_ch // 2
        emb = np.exp(np.arange(half) * -(np.log(10000.0) / (half - 1)))
        ang = 1000.0 * t.numpy()[:, None] * emb[None]
        t_emb = torch.from_numpy(np.concatenate(
            [np.sin(ang), np.cos(ang)], -1).astype(np.float32))
        t_emb = self.time_mlp(t_emb)
        spks = spks.unsqueeze(-1).expand(-1, -1, x.shape[-1])
        h = torch.cat([x, mu, spks, cond], dim=1)

        def bias_of(m):
            return torch.where(m[:, None, None, :, 0] > 0,
                               0.0, torch.tensor(-1e9))

        hiddens, masks = [], [mask]
        for resnet, tfs, down in self.down_blocks:
            m = masks[-1]
            h = resnet(h, m, t_emb)
            hp = h.transpose(1, 2)
            b = bias_of(m.transpose(1, 2))
            for tf in tfs:
                hp = tf(hp, b)
            h = hp.transpose(1, 2)
            hiddens.append(h)
            h = down(h * m)
            masks.append(m if isinstance(down, torch.nn.Conv1d)
                         else m[:, :, ::2])
        masks = masks[:-1]
        m = masks[-1]
        for resnet, tfs in self.mid_blocks:
            h = resnet(h, m, t_emb)
            hp = h.transpose(1, 2)
            b = bias_of(m.transpose(1, 2))
            for tf in tfs:
                hp = tf(hp, b)
            h = hp.transpose(1, 2)
        for resnet, tfs, up in self.up_blocks:
            m = masks.pop()
            skip = hiddens.pop()
            h = torch.cat([h[:, :, : skip.shape[-1]], skip], dim=1)
            h = resnet(h, m, t_emb)
            hp = h.transpose(1, 2)
            b = bias_of(m.transpose(1, 2))
            for tf in tfs:
                hp = tf(hp, b)
            h = hp.transpose(1, 2)
            h = up(h * m)
        h = self.final_block(h, m)
        return self.final_proj(h * m) * mask


TINY_UNET = LegacyUNetConfig(in_channels=32, out_channels=8,
                             channels=(16, 16), attention_head_dim=8,
                             n_blocks=1, num_mid_blocks=1, num_heads=2)


def test_legacy_decoder_matches_torch(rng):
    b, t, d = 2, 10, 8
    tm = TDecoder(32, 8, (16, 16), 2, 8, 1, 1)
    tm.eval()
    x = rng.standard_normal((b, t, d)).astype(np.float32) * 0.3
    mu = rng.standard_normal((b, t, d)).astype(np.float32) * 0.3
    cond = rng.standard_normal((b, t, d)).astype(np.float32) * 0.3
    spks = rng.standard_normal((b, d)).astype(np.float32) * 0.3
    tt = np.array([0.3, 0.8], np.float32)
    mask = (np.arange(t)[None, :] < np.array([[t], [7]])).astype(np.float32)

    with torch.no_grad():
        golden = tm(torch.from_numpy(x.transpose(0, 2, 1)),
                    torch.from_numpy(mask[:, None, :]),
                    torch.from_numpy(mu.transpose(0, 2, 1)),
                    torch.from_numpy(tt),
                    torch.from_numpy(spks),
                    torch.from_numpy(cond.transpose(0, 2, 1)))
    golden = golden.numpy().transpose(0, 2, 1)

    cfg = LegacyFlowConfig(unet=TINY_UNET)
    state = {"decoder.estimator." + k: v.detach().numpy()
             for k, v in tm.state_dict().items()}
    state.update({
        "input_embedding.weight": np.zeros((4096, 512), np.float32),
        "spk_embed_affine_layer.weight": np.zeros((80, 192), np.float32),
        "spk_embed_affine_layer.bias": np.zeros((80,), np.float32),
        "encoder_proj.weight": np.zeros((80, 512), np.float32),
        "encoder_proj.bias": np.zeros((80,), np.float32),
        **_dummy_encoder_state(cfg), **_dummy_regulator_state(cfg)})
    est = convert.legacy_flow_params(state, cfg)["params"]["estimator"]
    model = ConditionalDecoder(TINY_UNET)
    ours = model.apply({"params": est}, jnp.asarray(x),
                       jnp.asarray(mask), jnp.asarray(mu),
                       jnp.asarray(tt), jnp.asarray(spks),
                       jnp.asarray(cond))
    np.testing.assert_allclose(np.asarray(ours), golden,
                               atol=2e-5, rtol=1e-4)


def test_interpolate_regulator_matches_torch(rng):
    ch, out_ch, t_in, t_out = 12, 8, 9, 15
    tm = torch.nn.Sequential(
        torch.nn.Conv1d(ch, ch, 3, 1, 1), torch.nn.GroupNorm(1, ch),
        torch.nn.Mish(), torch.nn.Conv1d(ch, out_ch, 1, 1))
    tm.eval()
    x = rng.standard_normal((2, t_in, ch)).astype(np.float32)
    with torch.no_grad():
        xi = torch.nn.functional.interpolate(
            torch.from_numpy(x.transpose(0, 2, 1)), size=t_out,
            mode="linear")
        golden = tm(xi).numpy().transpose(0, 2, 1)

    state = {"length_regulator.model." + k: v.detach().numpy()
             for k, v in tm.state_dict().items()}
    cfg = LegacyFlowConfig()
    reg = convert.legacy_flow_params(
        {**state,
         "input_embedding.weight": np.zeros((4096, 512), np.float32),
         "spk_embed_affine_layer.weight": np.zeros((80, 192), np.float32),
         "spk_embed_affine_layer.bias": np.zeros((80,), np.float32),
         "encoder_proj.weight": np.zeros((80, 512), np.float32),
         "encoder_proj.bias": np.zeros((80,), np.float32),
         **_dummy_encoder_state(cfg),
         **_dummy_decoder_state(cfg)}, cfg)["params"]["length_regulator"]
    model = InterpolateRegulator(ch, n_stages=1, out_channels=out_ch)
    mask = jnp.ones((2, t_out))
    ours = model.apply({"params": reg}, jnp.asarray(x), t_out, mask)
    np.testing.assert_allclose(np.asarray(ours), golden,
                               atol=2e-5, rtol=1e-4)


def _dummy_encoder_state(cfg):
    """Zero-filled torch-layout encoder keys (shape-only converter
    plumbing for tests that exercise a different subtree)."""
    s = {}
    d = cfg.encoder.output_size
    lu = cfg.encoder.linear_units
    s["encoder.embed.out.0.weight"] = np.zeros((d, cfg.input_size),
                                               np.float32)
    s["encoder.embed.out.0.bias"] = np.zeros((d,), np.float32)
    s["encoder.embed.out.1.weight"] = np.ones((d,), np.float32)
    s["encoder.embed.out.1.bias"] = np.zeros((d,), np.float32)
    h = cfg.encoder.attention_heads
    for i in range(cfg.encoder.num_blocks):
        p = f"encoder.encoders.{i}."
        for nm in ("norm_mha", "norm_ff"):
            s[p + nm + ".weight"] = np.ones((d,), np.float32)
            s[p + nm + ".bias"] = np.zeros((d,), np.float32)
        for nm in ("linear_q", "linear_k", "linear_v", "linear_out"):
            s[p + f"self_attn.{nm}.weight"] = np.zeros((d, d), np.float32)
            s[p + f"self_attn.{nm}.bias"] = np.zeros((d,), np.float32)
        s[p + "self_attn.linear_pos.weight"] = np.zeros((d, d), np.float32)
        s[p + "self_attn.pos_bias_u"] = np.zeros((h, d // h), np.float32)
        s[p + "self_attn.pos_bias_v"] = np.zeros((h, d // h), np.float32)
        s[p + "feed_forward.w_1.weight"] = np.zeros((lu, d), np.float32)
        s[p + "feed_forward.w_1.bias"] = np.zeros((lu,), np.float32)
        s[p + "feed_forward.w_2.weight"] = np.zeros((d, lu), np.float32)
        s[p + "feed_forward.w_2.bias"] = np.zeros((d,), np.float32)
    s["encoder.after_norm.weight"] = np.ones((d,), np.float32)
    s["encoder.after_norm.bias"] = np.zeros((d,), np.float32)
    return s


def _dummy_regulator_state(cfg):
    s = {}
    d = cfg.output_size * 0 + 512  # regulator width = encoder output
    n = len(cfg.regulator_ratios)
    for i in range(n):
        s[f"length_regulator.model.{3 * i}.weight"] = \
            np.zeros((d, d, 3), np.float32)
        s[f"length_regulator.model.{3 * i}.bias"] = np.zeros((d,), np.float32)
        s[f"length_regulator.model.{3 * i + 1}.weight"] = \
            np.ones((d,), np.float32)
        s[f"length_regulator.model.{3 * i + 1}.bias"] = \
            np.zeros((d,), np.float32)
    s[f"length_regulator.model.{3 * n}.weight"] = \
        np.zeros((d, d, 1), np.float32)
    s[f"length_regulator.model.{3 * n}.bias"] = np.zeros((d,), np.float32)
    return s


def _dummy_decoder_state(cfg):
    tm = TDecoder(cfg.unet.in_channels, cfg.unet.out_channels,
                  cfg.unet.channels, cfg.unet.num_heads,
                  cfg.unet.attention_head_dim, cfg.unet.n_blocks,
                  cfg.unet.num_mid_blocks)
    return {"decoder.estimator." + k: v.detach().numpy()
            for k, v in tm.state_dict().items()}


TINY_CFG = LegacyFlowConfig(
    input_size=16, output_size=8, spk_embed_dim=12, vocab_size=50,
    encoder=LegacyEncoderConfig(input_size=16, output_size=16,
                                attention_heads=2, linear_units=32,
                                num_blocks=1),
    unet=TINY_UNET,
    cfm=__import__("minimax_speech_tpu.models.cfm",
                   fromlist=["CFMConfig"]).CFMConfig(
        use_contrastive_fm=False, use_immiscible=False,
        training_cfg_rate=0.2, inference_cfg_rate=0.7))


def test_legacy_flow_loss_and_inference(rng):
    model = MaskedDiffWithXvec(TINY_CFG)
    variables = init_legacy_flow_variables(model, jax.random.PRNGKey(0),
                                           batch=2, tokens=6)
    tok = jnp.asarray(rng.integers(0, 50, (2, 6)))
    tok_len = jnp.array([6, 4])
    tf = 12
    feat = jnp.asarray(rng.standard_normal((2, tf, 8)).astype(np.float32))
    feat_len = jnp.array([12, 8])
    emb = jnp.asarray(rng.standard_normal((2, 12)).astype(np.float32))
    loss = jax.jit(model.apply)(variables, tok, tok_len, feat, feat_len,
                                emb, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))

    # inference: prompt 3 tokens + 6 new; static mel grid
    noise = jnp.asarray(rng.standard_normal((1, 64, 8)).astype(np.float32))
    out = legacy_flow_inference(
        model, variables, tok[:1], jnp.array([6]),
        tok[:1, :3], jnp.array([3]),
        feat[:1, :5], emb[:1], noise)
    mel_len2 = int(6 / TINY_CFG.input_frame_rate * TINY_CFG.mel_rate)
    assert out.shape == (1, mel_len2, 8)
    assert np.isfinite(np.asarray(out)).all()
    # deterministic given the same noise
    out2 = legacy_flow_inference(
        model, variables, tok[:1], jnp.array([6]),
        tok[:1, :3], jnp.array([3]),
        feat[:1, :5], emb[:1], noise)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2))
