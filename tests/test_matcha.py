"""Matcha-TTS standalone: training losses + synthesis path."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from minimax_speech_tpu.models import matcha
from minimax_speech_tpu.models.cfm import CFMConfig
from minimax_speech_tpu.models.decoder_unet import DecoderUNetConfig

TINY = matcha.MatchaConfig(
    n_vocab=40, n_feats=8, hidden=16, n_heads=2, n_layers=1, dp_filters=16,
    unet=DecoderUNetConfig(in_channels=16, out_channels=8, channels=(16,),
                           attention_head_dim=8, n_blocks=1,
                           num_mid_blocks=1, num_heads=2),
    cfm=CFMConfig(use_immiscible=False, use_contrastive_fm=False,
                  training_cfg_rate=0.0, inference_cfg_rate=0.0),
    n_timesteps=2)


@pytest.fixture(scope="module")
def model():
    rng = np.random.default_rng(1986)
    m = matcha.MatchaTTS(TINY)
    tokens = jnp.asarray(rng.integers(1, 40, (2, 7)))
    mels = jnp.asarray(rng.standard_normal((2, 20, 8)), jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), tokens, jnp.array([7, 5]),
                       mels, jnp.array([20, 14]), jax.random.PRNGKey(1))
    return m, variables


def test_training_losses(model, rng):
    m, variables = model
    tokens = jnp.asarray(rng.integers(1, 40, (2, 7)))
    mels = jnp.asarray(rng.standard_normal((2, 20, 8)), jnp.float32)
    dur, prior, cfm = m.apply(variables, tokens, jnp.array([7, 5]),
                              mels, jnp.array([20, 14]),
                              jax.random.PRNGKey(2))
    for v in (dur, prior, cfm):
        assert np.isfinite(float(v))
    assert float(prior) > 0


def test_synthesis(model, rng):
    m, variables = model
    tokens = jnp.asarray(rng.integers(1, 40, (1, 6)))
    mel, y_len = matcha.matcha_synthesise(
        m, variables, tokens, jnp.array([6]), jax.random.PRNGKey(3),
        max_frames=64)
    assert mel.shape == (1, 64, 8)
    n = int(y_len[0])
    assert 1 <= n <= 64
    assert np.isfinite(np.asarray(mel)).all()


def test_duration_expansion_monotonic(model, rng):
    """synthesise_mu's expansion must assign each frame exactly one text
    position within the valid range."""
    m, variables = model
    tokens = jnp.asarray(rng.integers(1, 40, (1, 5)))
    mu_y, y_len = m.apply(variables, tokens, jnp.array([5]), 1.0, 48,
                          method=matcha.MatchaTTS.synthesise_mu)
    assert mu_y.shape == (1, 48, 8)
    assert int(y_len[0]) >= 5  # at least one frame per token (ceil(exp))
