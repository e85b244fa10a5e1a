"""Streaming session + frontend tests (tiny geometry, CPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from minimax_speech_tpu.infer import frontend as fe
from minimax_speech_tpu.infer import pipeline as pl
from minimax_speech_tpu.infer.session import StreamingSession, fade_in_out
from tests.conftest import synthetic_audio
from tests.test_pipeline import tiny_cfg


def test_normalize_numbers():
    out = fe.normalize_text("I have 21 cats and 1005 dogs")
    assert "twenty one" in out and "one thousand five" in out
    assert not any(ch.isdigit() for ch in out)


def test_split_paragraph():
    tok = fe.ByteTokenizer()
    text = ". ".join(f"sentence number {i} is here" for i in range(12)) + "."
    chunks = fe.split_paragraph(text, tok.encode, token_max_n=80)
    assert len(chunks) > 1
    rejoined = " ".join(chunks)
    assert "sentence number eleven" in rejoined or "11" in rejoined


def test_byte_tokenizer_roundtrip():
    tok = fe.ByteTokenizer()
    ids = tok.encode("héllo wörld")
    assert min(ids) >= 1
    assert tok.decode(ids) == "héllo wörld"


def test_fade_in_out():
    win = np.hamming(8)
    a = np.ones(16)
    b = np.zeros(16)
    out = fade_in_out(a, b, win)
    np.testing.assert_allclose(out[:4], win[:4])
    np.testing.assert_array_equal(out[4:], 1.0)


@pytest.mark.slow
@pytest.mark.parametrize("chunked", [True, False])
def test_streaming_session(rng, chunked):
    cfg = tiny_cfg()
    cfg.max_speech_tokens = 40
    pipe = pl.TTSPipeline.from_random(cfg, jax.random.PRNGKey(0))
    prompt_16k = synthetic_audio(rng, 0.5, sr=16000)
    prompt_24k = synthetic_audio(rng, 0.5, sr=24000)
    prompt_tokens = pipe.extract_prompt_tokens(prompt_16k)
    prompt_latent = pipe.extract_prompt_latent(prompt_24k)
    prompt_mel = pipe.extract_prompt_mel(prompt_24k)
    lm_spk, flow_emb = pipe.speaker_embedding(prompt_mel)

    sess = StreamingSession(pipe, token_hop=8, lookahead=3, overlap_frames=2,
                            chunked=chunked)
    text = rng.integers(0, 256, 6)
    ptext = rng.integers(0, 256, 2)
    chunks = list(sess.synthesize_stream(text, ptext, prompt_tokens,
                                         prompt_latent, lm_spk, flow_emb,
                                         key=jax.random.PRNGKey(3)))
    assert chunks, "no chunks emitted"
    assert chunks[-1].final
    assert all(not c.final for c in chunks[:-1])
    total = np.concatenate([c.audio for c in chunks])
    assert np.isfinite(total).all()
    if chunked:
        # chunked sessions force prompt feat = ratio x prompt tokens (the
        # reference frontend contract) so emitted frames = gen tokens * 2
        expect_frames = chunks[-1].tokens * 2
    else:
        # full-prefix path: (prompt + gen)*2 - prompt_latent_frames (the
        # prompt's latent length need not be exactly 2x its token count)
        expect_frames = ((len(prompt_tokens) + chunks[-1].tokens) * 2
                         - prompt_latent.shape[0])
    assert len(total) == expect_frames * 480


@pytest.mark.slow
def test_streaming_session_mel_mode(rng):
    """mel output: HiFT decode with spliced source cache across hops."""
    cfg = tiny_cfg()
    cfg.output_type = "mel"
    cfg.max_speech_tokens = 24
    import dataclasses
    from minimax_speech_tpu.models.hifigan import HiFTConfig
    cfg.hift = HiFTConfig(in_channels=80, base_channels=32,
                          upsample_rates=(8, 5, 3),
                          upsample_kernel_sizes=(16, 11, 7),
                          resblock_kernel_sizes=(3,),
                          resblock_dilations=((1,),),
                          source_resblock_kernel_sizes=(3, 3, 3),
                          source_resblock_dilations=((1,), (1,), (1,)),
                          f0_cond_channels=16)
    pipe = pl.TTSPipeline.from_random(cfg, jax.random.PRNGKey(0))
    prompt_16k = synthetic_audio(rng, 0.4, sr=16000)
    prompt_24k = synthetic_audio(rng, 0.4, sr=24000)
    prompt_tokens = pipe.extract_prompt_tokens(prompt_16k)
    prompt_mel = pipe.extract_prompt_mel(prompt_24k)
    lm_spk, flow_emb = pipe.speaker_embedding(prompt_mel)
    sess = StreamingSession(pipe, token_hop=6, lookahead=3, overlap_frames=2)
    chunks = list(sess.synthesize_stream(
        rng.integers(0, 256, 4), rng.integers(0, 256, 2), prompt_tokens,
        prompt_mel, lm_spk, flow_emb, key=jax.random.PRNGKey(3)))
    assert chunks and chunks[-1].final
    total = np.concatenate([c.audio for c in chunks])
    assert np.isfinite(total).all()
    expect_frames = ((len(prompt_tokens) + chunks[-1].tokens) * 2
                     - prompt_mel.shape[0])
    assert len(total) == expect_frames * 480


@pytest.mark.slow
def test_token_stream_burst_invariance(rng):
    """Burst partitioning must not change the decoded sequence: the
    device carry (key, KV cache, RAS window) advances identically
    whether tokens are fetched 28 or 7 at a time."""
    import jax.numpy as jnp
    from minimax_speech_tpu.infer import pipeline as pl
    from minimax_speech_tpu.infer.session import TokenStream
    from minimax_speech_tpu.models import llm as llm_mod

    cfg = tiny_cfg()
    cfg.max_speech_tokens = 40
    pipe = pl.TTSPipeline.from_random(cfg, jax.random.PRNGKey(0))
    src, tok, plen = llm_mod.build_inference_plan(
        rng.integers(0, 200, 6), rng.integers(0, 40, 8),
        use_spk=cfg.lm.use_speaker_encoder)
    spk = jnp.zeros((1, cfg.lm.llm_input_size))
    ts = TokenStream(pipe.lm, pipe.lm_vars, max_steps=40)

    def decode(burst):
        return list(ts.generate(src, tok, plen, spk,
                                jax.random.PRNGKey(7), 10, 40,
                                burst_size=burst))

    a = decode(28)
    b = decode(7)
    assert a == b, (a, b)
    assert 10 <= len(a) <= 40
