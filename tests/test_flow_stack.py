"""Stage-2 flow stack tests: rel-pos attention parity vs torch, encoder
causality under chunk masks, UNet shapes/causality, CFM math."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from minimax_speech_tpu.models import cfm as cfm_mod
from minimax_speech_tpu.models import conformer as cf
from minimax_speech_tpu.models.decoder_unet import (CausalConditionalDecoder,
                                                    DecoderUNetConfig)
from minimax_speech_tpu.models.flow import FlowConfig, FlowModel
from minimax_speech_tpu.models.speaker_encoder import (LearnableSpeakerEncoder,
                                                       SpeakerEncoderConfig)
from minimax_speech_tpu.models.upsample_encoder import (UpsampleConformerEncoder,
                                                        UpsampleEncoderConfig)


# --------------------------------------------------------------------------
# rel-pos attention parity vs a torch replica of the reference math
# --------------------------------------------------------------------------

class TorchRelAttn(torch.nn.Module):
    def __init__(self, h, d_model):
        super().__init__()
        self.h, self.dk = h, d_model // h
        self.q = torch.nn.Linear(d_model, d_model)
        self.k = torch.nn.Linear(d_model, d_model)
        self.v = torch.nn.Linear(d_model, d_model)
        self.out = torch.nn.Linear(d_model, d_model)
        self.pos = torch.nn.Linear(d_model, d_model, bias=False)
        self.bias_u = torch.nn.Parameter(torch.randn(h, self.dk) * 0.1)
        self.bias_v = torch.nn.Parameter(torch.randn(h, self.dk) * 0.1)

    def rel_shift(self, x):
        b, h, t, n = x.shape
        zp = torch.zeros((b, h, t, 1))
        xp = torch.cat([zp, x], dim=-1).view(b, h, n + 1, t)
        return xp[:, :, 1:].view(b, h, t, n)[..., : n // 2 + 1]

    def forward(self, x, mask, pos_emb):
        b, t, c = x.shape
        q = self.q(x).view(b, t, self.h, self.dk)
        k = self.k(x).view(b, t, self.h, self.dk)
        v = self.v(x).view(b, t, self.h, self.dk)
        p = self.pos(pos_emb).view(1, -1, self.h, self.dk).transpose(1, 2)
        qu = (q + self.bias_u).transpose(1, 2)
        qv = (q + self.bias_v).transpose(1, 2)
        ac = qu @ k.transpose(1, 2).transpose(-2, -1)
        bd = qv @ p.transpose(-2, -1)
        if ac.shape != bd.shape:
            bd = self.rel_shift(bd)
        scores = (ac + bd) / np.sqrt(self.dk)
        m = mask.unsqueeze(1).eq(0)
        scores = scores.masked_fill(m, -float("inf"))
        attn = scores.softmax(-1).masked_fill(m, 0.0)
        o = (attn @ v.transpose(1, 2)).transpose(1, 2).reshape(b, t, c)
        return self.out(o)


def test_relpos_attention_parity(rng):
    h, d_model, t, b = 2, 16, 11, 2
    tm = TorchRelAttn(h, d_model).eval()
    x = rng.standard_normal((b, t, d_model)).astype(np.float32)
    lens = np.array([11, 7], np.int32)
    pad = (np.arange(t)[None] < lens[:, None])
    mask3 = np.broadcast_to(pad[:, None, :], (b, t, t)) & True

    pos = np.asarray(cf.espnet_rel_pos_emb(t, d_model))
    with torch.no_grad():
        golden = tm(torch.from_numpy(x), torch.from_numpy(mask3.copy()),
                    torch.from_numpy(pos.copy())).numpy()

    jm = cf.RelPositionAttention(h, d_model)
    params = {"params": {
        "linear_q": {"kernel": tm.q.weight.detach().numpy().T,
                     "bias": tm.q.bias.detach().numpy()},
        "linear_k": {"kernel": tm.k.weight.detach().numpy().T,
                     "bias": tm.k.bias.detach().numpy()},
        "linear_v": {"kernel": tm.v.weight.detach().numpy().T,
                     "bias": tm.v.bias.detach().numpy()},
        "linear_out": {"kernel": tm.out.weight.detach().numpy().T,
                       "bias": tm.out.bias.detach().numpy()},
        "linear_pos": {"kernel": tm.pos.weight.detach().numpy().T},
        "pos_bias_u": tm.bias_u.detach().numpy(),
        "pos_bias_v": tm.bias_v.detach().numpy(),
    }}
    ours, _ = jm.apply(params, jnp.asarray(x), jnp.asarray(mask3),
                       jnp.asarray(pos))
    # padded query rows attend to nothing -> compare valid rows only
    for i in range(b):
        np.testing.assert_allclose(np.asarray(ours)[i, :lens[i]],
                                   golden[i, :lens[i]], atol=2e-5)


# --------------------------------------------------------------------------
# upsample encoder
# --------------------------------------------------------------------------

ENC_CFG = UpsampleEncoderConfig(input_size=32, output_size=32,
                                attention_heads=4, linear_units=64,
                                num_blocks=2, num_up_blocks=1,
                                static_chunk_size=4)


@pytest.fixture(scope="module")
def enc():
    m = UpsampleConformerEncoder(ENC_CFG)
    x = jnp.zeros((1, 16, 32))
    params = m.init(jax.random.PRNGKey(0), x, jnp.array([16]))
    return m, params


def test_encoder_shapes(enc, rng):
    m, params = enc
    x = jnp.asarray(rng.standard_normal((2, 16, 32)).astype(np.float32))
    out, out_len = m.apply(params, x, jnp.array([16, 10]))
    assert out.shape == (2, 32, 32)
    np.testing.assert_array_equal(np.asarray(out_len), [32, 20])


def test_encoder_streaming_causality(enc, rng):
    """In streaming mode, changing inputs beyond chunk+lookahead must not
    change earlier outputs."""
    m, params = enc
    x1 = rng.standard_normal((1, 16, 32)).astype(np.float32)
    x2 = x1.copy()
    x2[:, 12:] += 10.0  # perturb last chunk
    o1, _ = m.apply(params, jnp.asarray(x1), jnp.array([16]), streaming=True)
    o2, _ = m.apply(params, jnp.asarray(x2), jnp.array([16]), streaming=True)
    # chunk size 4: frames 0..7 may see up to token 11 via the 3-token
    # lookahead conv + chunk mask; with perturbation at >=12, outputs for
    # the first 2 upsampled chunks (tokens 0..3 -> frames 0..7) where
    # lookahead reaches at most token 6 stay equal.
    np.testing.assert_allclose(np.asarray(o1)[0, :8], np.asarray(o2)[0, :8],
                               atol=1e-4)


# --------------------------------------------------------------------------
# UNet estimator
# --------------------------------------------------------------------------

UNET_CFG = DecoderUNetConfig(in_channels=32, out_channels=8, channels=(16,),
                             attention_head_dim=8, n_blocks=1,
                             num_mid_blocks=2, num_heads=2,
                             static_chunk_size=4)


@pytest.fixture(scope="module")
def unet():
    m = CausalConditionalDecoder(UNET_CFG)
    b, t = 1, 12
    args = (jnp.zeros((b, t, 8)), jnp.ones((b, t)), jnp.zeros((b, t, 8)),
            jnp.zeros((b,)), jnp.zeros((b, 8)), jnp.zeros((b, t, 8)))
    params = m.init(jax.random.PRNGKey(0), *args)
    return m, params


def test_unet_shape(unet, rng):
    m, params = unet
    b, t = 2, 12
    out = m.apply(params, jnp.asarray(rng.standard_normal((b, t, 8)), jnp.float32),
                  jnp.ones((b, t)),
                  jnp.asarray(rng.standard_normal((b, t, 8)), jnp.float32),
                  jnp.array([0.3, 0.7]),
                  jnp.asarray(rng.standard_normal((b, 8)), jnp.float32),
                  jnp.zeros((b, t, 8)))
    assert out.shape == (b, t, 8)
    assert np.isfinite(np.asarray(out)).all()


def test_unet_streaming_chunk_causality(unet, rng):
    """With chunk masks + causal convs, perturbing the last chunk must not
    change the first chunk's output."""
    m, params = unet
    t = 12
    x1 = rng.standard_normal((1, t, 8)).astype(np.float32)
    mu = rng.standard_normal((1, t, 8)).astype(np.float32)
    x2, mu2 = x1.copy(), mu.copy()
    x2[:, 8:] += 5.0
    mu2[:, 8:] += 5.0
    common = dict(streaming=True)
    o1 = m.apply(params, jnp.asarray(x1), jnp.ones((1, t)), jnp.asarray(mu),
                 jnp.array([0.5]), jnp.zeros((1, 8)), jnp.zeros((1, t, 8)),
                 **common)
    o2 = m.apply(params, jnp.asarray(x2), jnp.ones((1, t)), jnp.asarray(mu2),
                 jnp.array([0.5]), jnp.zeros((1, 8)), jnp.zeros((1, t, 8)),
                 **common)
    np.testing.assert_allclose(np.asarray(o1)[0, :4], np.asarray(o2)[0, :4],
                               atol=1e-5)


def test_sinusoidal_pos_emb_matches_matcha():
    from minimax_speech_tpu.models.decoder_unet import sinusoidal_pos_emb
    import math
    dim = 16
    t = torch.tensor([0.25, 0.9])
    half = dim // 2
    emb = math.log(10000) / (half - 1)
    emb = torch.exp(torch.arange(half).float() * -emb)
    ang = 1000 * t.unsqueeze(1) * emb.unsqueeze(0)
    golden = torch.cat((ang.sin(), ang.cos()), dim=-1).numpy()
    ours = np.asarray(sinusoidal_pos_emb(jnp.array([0.25, 0.9]), dim))
    # fp32 sin/cos of ~1000-rad angles carries ~1e-4 absolute error
    np.testing.assert_allclose(ours, golden, atol=5e-4)


# --------------------------------------------------------------------------
# CFM math
# --------------------------------------------------------------------------

def test_immiscible_picks_nearest():
    key = jax.random.PRNGKey(0)
    x1 = jnp.zeros((4, 6, 3))
    z = cfm_mod.immiscible_noise(key, x1, k=8)
    # chosen noise must be the argmin-distance candidate: verify against
    # brute force
    cand = jax.random.normal(key, (4, 8, 6, 3))
    d = jnp.sum((cand - x1[:, None]) ** 2, axis=(2, 3))
    best = jnp.argmin(d, axis=1)
    expect = cand[jnp.arange(4), best]
    np.testing.assert_allclose(np.asarray(z), np.asarray(expect))


def test_derangement_no_self_pairs():
    for seed in range(5):
        perm = np.asarray(cfm_mod.derangement(jax.random.PRNGKey(seed), 7))
        assert (perm != np.arange(7)).all()


def test_solve_euler_linear_estimator():
    """With estimator v(x,t) = -x (and zero uncond branch), euler matches a
    hand computation including the CFG combination."""
    cfg = cfm_mod.CFMConfig(inference_cfg_rate=0.7, t_scheduler="cosine")

    def est(params, x, mask, mu, t, spks, cond, streaming):
        # conditional half gets -x, unconditional gets -2x
        b = x.shape[0] // 2
        return jnp.concatenate([-x[:b], -2.0 * x[b:]], axis=0)

    x0 = jnp.ones((1, 4, 2))
    out = cfm_mod.solve_euler(est, None, x0, jnp.zeros_like(x0),
                              jnp.ones((1, 4)), jnp.zeros((1, 2)),
                              jnp.zeros_like(x0), 5, cfg)
    # hand euler
    t_span = 1 - np.cos(np.linspace(0, 1, 6) * np.pi / 2)
    x = np.ones((1, 4, 2))
    for i in range(5):
        dt = t_span[i + 1] - t_span[i]
        dphi = 1.7 * (-x) - 0.7 * (-2 * x)
        x = x + dt * dphi
    np.testing.assert_allclose(np.asarray(out), x, rtol=1e-5)


def test_compute_loss_runs():
    cfg = cfm_mod.CFMConfig()

    def est(params, y, mask, mu, t, spks, cond, streaming):
        return y * 0.5 + mu * 0.1

    key = jax.random.PRNGKey(3)
    x1 = jax.random.normal(key, (4, 10, 8))
    loss, y = cfm_mod.compute_loss(est, None, key, x1, jnp.ones((4, 10)),
                                   jnp.zeros_like(x1), jnp.zeros((4, 8)),
                                   jnp.zeros_like(x1), cfg)
    assert np.isfinite(float(loss))


# --------------------------------------------------------------------------
# full flow model
# --------------------------------------------------------------------------

SMALL_FLOW = FlowConfig(
    input_size=32, output_size=8, vocab_size=50,
    encoder=ENC_CFG,
    unet=DecoderUNetConfig(in_channels=32, out_channels=8, channels=(16,),
                           attention_head_dim=8, n_blocks=1, num_mid_blocks=1,
                           num_heads=2, static_chunk_size=4),
    speaker=SpeakerEncoderConfig(mel_dim=8, model_dim=16, output_dim=192,
                                 num_blocks=1, num_heads=2),
    n_timesteps=3,
)


def test_flow_train_and_inference(rng):
    m = FlowModel(SMALL_FLOW)
    b, tt = 2, 8
    token = jnp.asarray(rng.integers(0, 50, (b, tt)))
    token_len = jnp.array([8, 6])
    feat = jnp.asarray(rng.standard_normal((b, 2 * tt, 8)), jnp.float32)
    feat_len = jnp.array([16, 12])
    emb = jnp.asarray(rng.standard_normal((b, 192)), jnp.float32)
    key = jax.random.PRNGKey(0)

    variables = m.init(key, token, token_len, feat, feat_len, emb, key)
    loss = m.apply(variables, token, token_len, feat, feat_len, emb, key)
    assert np.isfinite(float(loss))

    # inference: 3 prompt tokens -> 6 prompt frames
    from minimax_speech_tpu.models.flow import flow_inference
    noise = jnp.asarray(cfm_mod.make_fixed_noise(64, 8)[None])
    out = flow_inference(m, variables, token, token_len, feat[:, :6],
                         emb, noise)
    assert out.shape == (b, 2 * tt - 6, 8)
    assert np.isfinite(np.asarray(out)).all()


def test_latent_normalization_invariance(rng):
    """A flow with latent stats on RAW latents must be exactly the
    identity-stat flow on STANDARDIZED latents: same loss, and inference
    output = standardized output * std + mean (the CFM solves in the
    standardized space; every external surface stays raw)."""
    import dataclasses

    from minimax_speech_tpu.models.flow import flow_inference

    mean = tuple(float(x) for x in rng.standard_normal(8) * 0.3)
    std = tuple(float(x) for x in rng.uniform(0.1, 0.5, 8))
    m0 = FlowModel(SMALL_FLOW)
    m1 = FlowModel(dataclasses.replace(SMALL_FLOW, latent_mean=mean,
                                       latent_std=std))
    b, tt = 2, 8
    token = jnp.asarray(rng.integers(0, 50, (b, tt)))
    token_len = jnp.array([8, 6])
    feat_std = jnp.asarray(rng.standard_normal((b, 2 * tt, 8)), jnp.float32)
    feat_raw = feat_std * jnp.asarray(std) + jnp.asarray(mean)
    feat_len = jnp.array([16, 12])
    emb = jnp.asarray(rng.standard_normal((b, 192)), jnp.float32)
    key = jax.random.PRNGKey(0)

    variables = m0.init(key, token, token_len, feat_std, feat_len, emb, key)
    loss0 = m0.apply(variables, token, token_len, feat_std, feat_len,
                     emb, key)
    loss1 = m1.apply(variables, token, token_len, feat_raw, feat_len,
                     emb, key)
    np.testing.assert_allclose(float(loss0), float(loss1), rtol=1e-5)

    noise = jnp.asarray(cfm_mod.make_fixed_noise(64, 8)[None])
    out0 = flow_inference(m0, variables, token, token_len, feat_std[:, :6],
                          emb, noise)
    out1 = flow_inference(m1, variables, token, token_len, feat_raw[:, :6],
                          emb, noise)
    np.testing.assert_allclose(
        np.asarray(out1),
        np.asarray(out0) * np.asarray(std) + np.asarray(mean),
        rtol=1e-4, atol=1e-5)


def test_speaker_encoder_unit_norm(rng):
    cfg = SpeakerEncoderConfig(mel_dim=8, model_dim=16, output_dim=12,
                               num_blocks=2, num_heads=2)
    m = LearnableSpeakerEncoder(cfg)
    x = jnp.asarray(rng.standard_normal((3, 20, 8)), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(out), axis=-1),
                               1.0, atol=1e-5)


def test_multi_reference_speaker_embedding(rng):
    """(B, N, T, 80) multi-crop conditioning: averaged + renormalized."""
    m = FlowModel(SMALL_FLOW)
    variables = None
    from minimax_speech_tpu.models.flow import init_flow_variables
    variables = init_flow_variables(m, jax.random.PRNGKey(0))
    refs = jnp.asarray(rng.standard_normal((2, 3, 12, 8)), jnp.float32)
    multi = m.apply(variables, refs, method=FlowModel.embed_speaker)
    assert multi.shape == (2, 192)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(multi), axis=-1),
                               1.0, atol=1e-5)
    # averaging over identical crops equals the single-crop embedding
    same = jnp.broadcast_to(refs[:, :1], refs.shape)
    e_multi = m.apply(variables, same, method=FlowModel.embed_speaker)
    e_single = m.apply(variables, refs[:, 0], method=FlowModel.embed_speaker)
    np.testing.assert_allclose(np.asarray(e_multi), np.asarray(e_single),
                               atol=1e-5)
