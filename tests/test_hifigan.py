"""HiFT vocoder tests: shape/finite checks, source determinism/splicing,
sine-source math vs torch reference semantics."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from minimax_speech_tpu.models import hifigan


SMALL = hifigan.HiFTConfig(in_channels=8, base_channels=32,
                           upsample_rates=(4, 3), upsample_kernel_sizes=(8, 5),
                           resblock_kernel_sizes=(3,),
                           resblock_dilations=((1, 2),),
                           source_resblock_kernel_sizes=(3, 3),
                           source_resblock_dilations=((1,), (1,)),
                           f0_cond_channels=16)


@pytest.fixture(scope="module")
def voc():
    m = hifigan.HiFTGenerator(SMALL)
    mel = jnp.zeros((1, 10, 8))
    params = m.init(jax.random.PRNGKey(0), mel)
    return m, params


def test_shapes_and_finite(voc, rng):
    m, params = voc
    t = 12
    mel = jnp.asarray(rng.standard_normal((2, t, 8)).astype(np.float32))
    wav, src = m.apply(params, mel, key=jax.random.PRNGKey(1))
    assert wav.shape == (2, t * SMALL.total_upsample)
    assert src.shape == (2, t * SMALL.total_upsample, 1)
    assert np.isfinite(np.asarray(wav)).all()
    assert np.abs(np.asarray(wav)).max() <= SMALL.audio_limit + 1e-6


def test_deterministic_without_key(voc, rng):
    m, params = voc
    mel = jnp.asarray(rng.standard_normal((1, 8, 8)).astype(np.float32))
    w1, _ = m.apply(params, mel)
    w2, _ = m.apply(params, mel)
    np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))


def test_source_cache_splice(voc, rng):
    """Splicing a cached source prefix must reproduce identical source in
    the prefix region."""
    m, params = voc
    mel = jnp.asarray(rng.standard_normal((1, 8, 8)).astype(np.float32))
    _, src = m.apply(params, mel)
    wav2, src2 = m.apply(params, mel, cache_source=src[:, :48])
    np.testing.assert_allclose(np.asarray(src2)[:, :48], np.asarray(src)[:, :48])


def test_sine_source_matches_torch_semantics():
    """Voiced-only, zero-phase sine source must equal the torch cumsum
    formulation."""
    cfg = hifigan.HiFTConfig(nb_harmonics=2, nsf_alpha=0.1,
                             nsf_voiced_threshold=10.0, sampling_rate=24000)
    f0 = np.full((1, 200), 120.0, np.float32)
    ours = np.asarray(hifigan.sine_source(jnp.asarray(f0), cfg, key=None))

    f0_t = torch.from_numpy(f0)[:, None, :]  # (B, 1, T)
    f_mat = torch.cat([f0_t * (i + 1) / 24000.0 for i in range(3)], dim=1)
    theta = 2 * np.pi * (torch.cumsum(f_mat, dim=-1) % 1)
    golden = 0.1 * torch.sin(theta)  # uv=1, phase=0, no noise
    np.testing.assert_allclose(ours, golden.numpy().transpose(0, 2, 1),
                               atol=2e-4)


def test_f0_predictor_nonneg(voc, rng):
    m, params = voc
    mel = jnp.asarray(rng.standard_normal((2, 9, 8)).astype(np.float32))
    f0 = m.apply(params, mel, method=hifigan.HiFTGenerator.predict_f0)
    assert f0.shape == (2, 9)
    assert (np.asarray(f0) >= 0).all()


def test_resblock_parity_vs_torch(rng):
    """Snake ResBlock with converted weight-norm weights must match the
    reference math (generator.py:46-101)."""
    import torch.nn as tnn
    from torch.nn.utils import weight_norm as twn

    from minimax_speech_tpu.utils.convert import _resblock

    ch, k, dil = 6, 3, (1, 3)
    torch.manual_seed(5)

    class TRes(tnn.Module):
        def __init__(self):
            super().__init__()
            self.convs1 = tnn.ModuleList(
                [twn(tnn.Conv1d(ch, ch, k, dilation=d,
                                padding=(k * d - d) // 2)) for d in dil])
            self.convs2 = tnn.ModuleList(
                [twn(tnn.Conv1d(ch, ch, k, padding=(k - 1) // 2))
                 for _ in dil])
            self.alphas1 = tnn.ParameterList(
                [tnn.Parameter(torch.rand(1, ch, 1) + 0.5) for _ in dil])
            self.alphas2 = tnn.ParameterList(
                [tnn.Parameter(torch.rand(1, ch, 1) + 0.5) for _ in dil])

        def forward(self, x):
            for i in range(len(dil)):
                a1, a2 = self.alphas1[i], self.alphas2[i]
                xt = x + (a1 + 1e-9).reciprocal() * torch.sin(a1 * x) ** 2
                xt = self.convs1[i](xt)
                xt = xt + (a2 + 1e-9).reciprocal() * torch.sin(a2 * xt) ** 2
                xt = self.convs2[i](xt)
                x = x + xt
            return x

    tm = TRes().eval()
    state = {}
    for i in range(len(dil)):
        for name, conv in (("convs1", tm.convs1[i]), ("convs2", tm.convs2[i])):
            sd = conv.state_dict()
            state[f"r.{name}.{i}.weight_g"] = sd["weight_g"].numpy()
            state[f"r.{name}.{i}.weight_v"] = sd["weight_v"].numpy()
            state[f"r.{name}.{i}.bias"] = sd["bias"].numpy()
        state[f"r.activations1.{i}.alpha"] = tm.alphas1[i].detach().numpy()
        state[f"r.activations2.{i}.alpha"] = tm.alphas2[i].detach().numpy()
    params = {"params": _resblock(state, "r.", len(dil))}

    m = hifigan.ResBlock(ch, k, dil)
    x = rng.standard_normal((1, ch, 20)).astype(np.float32)
    with torch.no_grad():
        golden = tm(torch.from_numpy(x)).numpy()
    ours = m.apply(params, jnp.asarray(x.transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 2, 1), golden,
                               atol=2e-5)
