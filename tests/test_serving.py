"""Batched serving tests (tiny geometry, CPU)."""
import numpy as np
import pytest

import jax

from minimax_speech_tpu.infer import pipeline as pl
from minimax_speech_tpu.infer.serving import BatchSynthesizer, Request
from tests.conftest import synthetic_audio
from tests.test_pipeline import tiny_cfg


@pytest.mark.slow
def test_batch_synthesis(rng):
    cfg = tiny_cfg()
    cfg.max_speech_tokens = 24
    pipe = pl.TTSPipeline.from_random(cfg, jax.random.PRNGKey(0))
    synth = BatchSynthesizer(pipe)

    reqs = []
    for i, secs in enumerate((0.4, 0.7)):
        p16 = synthetic_audio(rng, secs, 16000)
        p24 = synthetic_audio(rng, secs, 24000)
        toks = pipe.extract_prompt_tokens(p16)
        lat = pipe.extract_prompt_latent(p24)
        mel = pipe.extract_prompt_mel(p24)
        lm_spk, femb = pipe.speaker_embedding(mel)
        reqs.append(Request(
            text_tokens=rng.integers(0, 256, 4 + i),
            prompt_text_tokens=rng.integers(0, 256, 2),
            prompt_speech_tokens=toks, prompt_feat=lat,
            lm_spk=np.asarray(lm_spk)[0], flow_emb=np.asarray(femb)[0]))

    wavs, tim = synth.synthesize_batch(reqs, key=jax.random.PRNGKey(5),
                                       return_timings=True)
    assert len(wavs) == 2
    for w, n in zip(wavs, tim["tokens"]):
        assert len(w) == n * 2 * 480
        assert np.isfinite(w).all()
    # ragged prompts: the two requests had different prompt lengths
    assert reqs[0].prompt_feat.shape[0] != reqs[1].prompt_feat.shape[0]


@pytest.mark.slow
def test_batch_streaming(rng):
    from minimax_speech_tpu.infer.stream_batch import BatchStreamingSession
    cfg = tiny_cfg()
    cfg.max_speech_tokens = 28
    pipe = pl.TTSPipeline.from_random(cfg, jax.random.PRNGKey(0))

    reqs = []
    for i, secs in enumerate((0.4, 0.6)):
        p16 = synthetic_audio(rng, secs, 16000)
        p24 = synthetic_audio(rng, secs, 24000)
        toks = pipe.extract_prompt_tokens(p16)
        lat = pipe.extract_prompt_latent(p24)
        mel = pipe.extract_prompt_mel(p24)
        lm_spk, femb = pipe.speaker_embedding(mel)
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
        assert evs, f"stream {i} produced no audio"
        assert evs[-1].final
        total = np.concatenate([e.audio for e in evs])
        assert np.isfinite(total).all()
        # emitted length matches the per-stream token count exactly
        expect = ((len(reqs[i].prompt_speech_tokens) + evs[-1].tokens) * 2
                  - reqs[i].prompt_feat.shape[0]) * 480
        assert len(total) == expect
