"""pregen_noise decode coverage across every decode loop.

cfg.lm.pregen_noise hoists the nucleus-sampling RNG out of the per-step
loop body (ops/sampling.py:ras_sample_batch_pregen). These tests pin its
contracts on the three burst decoders that consume it:
  * TokenStream (single-stream streaming bursts): tokens must be
    invariant to how the decode is partitioned into bursts,
  * BatchStreamingSession (lockstep batch),
  * ContinuousBatcher (slot-pool continuous batching).
"""
import dataclasses

import numpy as np
import pytest

import jax

from minimax_speech_tpu.infer import pipeline as pl
from minimax_speech_tpu.infer.continuous import ContinuousBatcher
from minimax_speech_tpu.infer.serving import Request
from minimax_speech_tpu.infer.stream_batch import BatchStreamingSession
from minimax_speech_tpu.models import llm as llm_mod
from tests.conftest import synthetic_audio
from tests.test_pipeline import tiny_cfg


@pytest.fixture(scope="module")
def pregen_pipe():
    cfg = tiny_cfg()
    cfg.max_speech_tokens = 24
    cfg.lm = dataclasses.replace(cfg.lm, pregen_noise=True)
    return pl.TTSPipeline.from_random(cfg, jax.random.PRNGKey(0))


def _prompt(pipe, rng, secs=0.5):
    p16 = synthetic_audio(rng, secs, 16000)
    p24 = synthetic_audio(rng, secs, 24000)
    toks = pipe.extract_prompt_tokens(p16)
    lat = pipe.extract_prompt_latent(p24)
    mel = pipe.extract_prompt_mel(p24)
    lm_spk, femb = pipe.speaker_embedding(mel)
    return toks, lat, lm_spk, femb


@pytest.mark.slow
def test_tokenstream_pregen_burst_invariance(pregen_pipe, rng):
    """Noise is keyed by ABSOLUTE decode step, so the token stream must
    not depend on how it is split into bursts."""
    from minimax_speech_tpu.infer.session import TokenStream
    pipe = pregen_pipe
    toks, _, lm_spk, _ = _prompt(pipe, rng)
    src, tok, plen = llm_mod.build_inference_plan(
        np.concatenate([rng.integers(0, 256, 2), rng.integers(0, 256, 5)]),
        toks, use_spk=pipe.cfg.lm.use_speaker_encoder)

    def run(bursts):
        ts = TokenStream(pipe.lm, pipe.lm_vars, max_steps=24)
        ts.start(src, tok, plen, lm_spk, jax.random.PRNGKey(5), 2, 20)
        out = []
        for n in bursts:
            t, done = ts.next_burst(n)
            out.extend(t.tolist())
            if done:
                break
        return out

    a = run([8] * 10)
    b = run([5] * 16)
    assert a == b, (a, b)
    assert len(a) >= 2
    assert all(0 <= t < pipe.cfg.lm.speech_token_size for t in a)


@pytest.mark.slow
def test_batch_streaming_pregen(pregen_pipe, rng):
    pipe = pregen_pipe
    reqs = []
    for i, secs in enumerate((0.4, 0.6)):
        toks, lat, lm_spk, femb = _prompt(pipe, rng, secs)
        reqs.append(Request(
            text_tokens=rng.integers(0, 256, 4 + i),
            prompt_text_tokens=rng.integers(0, 256, 2),
            prompt_speech_tokens=toks, prompt_feat=lat,
            lm_spk=np.asarray(lm_spk)[0], flow_emb=np.asarray(femb)[0]))
    sess = BatchStreamingSession(pipe, token_hop=8, lookahead=3,
                                 overlap_frames=2)
    events = list(sess.run(reqs, key=jax.random.PRNGKey(4)))
    assert events
    for i in range(2):
        evs = [e for e in events if e.stream == i]
        assert evs and evs[-1].final
        total = np.concatenate([e.audio for e in evs])
        assert np.isfinite(total).all() and len(total) > 0


@pytest.mark.slow
def test_continuous_pregen(pregen_pipe, rng):
    pipe = pregen_pipe
    cb = ContinuousBatcher(pipe, slots=2, token_hop=8, lookahead=3,
                           overlap_frames=2, prompt_buckets=(32, 64),
                           key=jax.random.PRNGKey(3))
    reqs = []
    for i, secs in enumerate((0.4, 0.5)):
        toks, lat, lm_spk, femb = _prompt(pipe, rng, secs)
        reqs.append(Request(
            text_tokens=rng.integers(0, 256, 4 + i),
            prompt_text_tokens=rng.integers(0, 256, 2),
            prompt_speech_tokens=toks, prompt_feat=lat,
            lm_spk=np.asarray(lm_spk)[0], flow_emb=np.asarray(femb)[0]))
    rids = [cb.submit(r) for r in reqs]
    events = []
    ticks = 0
    while cb.busy():
        events.extend(cb.tick())
        ticks += 1
        assert ticks < 100
    for rid in rids:
        evs = [e for e in events if e.stream == rid]
        assert evs and evs[-1].final
        total = np.concatenate([e.audio for e in evs])
        assert np.isfinite(total).all() and len(total) > 0
