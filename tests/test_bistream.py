"""Bistream decode tests: extend() consistency + streaming-text generation."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from minimax_speech_tpu.infer.bistream import BistreamDecoder
from minimax_speech_tpu.models import llm as llm_mod
from minimax_speech_tpu.models import qwen2
from tests.test_llm import SMALL_LM


@pytest.fixture(scope="module")
def lm():
    m = llm_mod.SpeechLM(SMALL_LM)
    variables = llm_mod.init_lm_variables(m, jax.random.PRNGKey(0))
    return m, variables


def test_extend_matches_prefill(lm, rng):
    """Building a context block-by-block with extend() must give the same
    final logits as one prefill over the whole sequence."""
    m, variables = lm
    cfg = m.cfg
    toks = rng.integers(0, 40, 12).astype(np.int32)
    emb_all = m.apply(variables, jnp.asarray(toks[None]),
                      method=llm_mod.SpeechLM.embed_speech_token)

    # reference: full prefill
    cache = qwen2.make_cache(cfg.qwen, 1, 24)
    pad = jnp.ones((1, 12), bool)
    positions = jnp.arange(12)[None]
    hidden, _ = m.apply(variables, emb_all, pad, positions, cache,
                        method=llm_mod.SpeechLM.prefill)
    golden = m.apply(variables, hidden[:, -1],
                     method=lambda mm, h: mm.llm_decoder(h))

    # block-wise extend: 5 + 4 + 3
    cache = qwen2.make_cache(cfg.qwen, 1, 24)
    valid = jnp.zeros((1, 24), bool)
    slot = 0
    for n in (5, 4, 3):
        emb = emb_all[:, slot:slot + n]
        pos = slot + jnp.arange(n)[None]
        logits, cache, valid = m.apply(variables, emb, pos,
                                       jnp.array([n]), valid, cache, slot,
                                       method=llm_mod.SpeechLM.extend)
        slot += n
    np.testing.assert_allclose(np.asarray(logits), np.asarray(golden),
                               atol=2e-5)


def test_extend_with_padding(lm, rng):
    """A padded extend block (n_true < n) must not corrupt later logits."""
    m, variables = lm
    cfg = m.cfg
    toks = rng.integers(0, 40, 8).astype(np.int32)
    emb_all = m.apply(variables, jnp.asarray(toks[None]),
                      method=llm_mod.SpeechLM.embed_speech_token)
    cache = qwen2.make_cache(cfg.qwen, 1, 16)
    valid = jnp.zeros((1, 16), bool)
    # block 1: 5 real of 6 (one garbage pad position)
    emb1 = jnp.concatenate([emb_all[:, :5],
                            jnp.full((1, 1, 32), 77.0)], axis=1)
    pos1 = jnp.arange(6)[None]
    _, cache, valid = m.apply(variables, emb1, pos1, jnp.array([5]),
                              valid, cache, 0,
                              method=llm_mod.SpeechLM.extend)
    # block 2: remaining 3 real, written at slot 5 (overwrites pad slot)
    pos2 = 5 + jnp.arange(3)[None]
    logits, cache, valid = m.apply(variables, emb_all[:, 5:8], pos2,
                                   jnp.array([3]), valid, cache, 5,
                                   method=llm_mod.SpeechLM.extend)

    # reference: clean prefill of all 8
    cache2 = qwen2.make_cache(cfg.qwen, 1, 16)
    pad = jnp.ones((1, 8), bool)
    hidden, _ = m.apply(variables, emb_all, pad, jnp.arange(8)[None],
                        cache2, method=llm_mod.SpeechLM.prefill)
    golden = m.apply(variables, hidden[:, -1],
                     method=lambda mm, h: mm.llm_decoder(h))
    np.testing.assert_allclose(np.asarray(logits), np.asarray(golden),
                               atol=2e-5)


@pytest.mark.slow
def test_bistream_generation(lm, rng):
    m, variables = lm
    dec = BistreamDecoder(m, variables, max_steps=64)

    def text_stream():
        for i in range(4):
            yield rng.integers(0, 90, 3)  # 12 text tokens in chunks of 3

    spk = jnp.zeros((1, 32))
    toks = list(dec.generate(text_stream(), rng.integers(0, 90, 2),
                             rng.integers(0, 40, 6), spk,
                             jax.random.PRNGKey(1)))
    assert len(toks) >= 1
    assert all(0 <= t < 40 for t in toks)
