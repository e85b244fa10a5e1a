"""Continuous batching tests: requests join/leave the running decode
batch (tiny geometry, CPU). Reference behavior being replaced:
speech/cosyvoice/llm/llm.py:715-743 (vLLM engine), cli/model.py:274-283."""
import numpy as np
import pytest

import jax

from minimax_speech_tpu.infer import pipeline as pl
from minimax_speech_tpu.infer.continuous import ContinuousBatcher
from minimax_speech_tpu.infer.serving import Request
from tests.conftest import synthetic_audio
from tests.test_pipeline import tiny_cfg


def _make_requests(pipe, rng, specs):
    reqs = []
    for i, secs in enumerate(specs):
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
    return reqs


@pytest.mark.slow
def test_continuous_join_leave(rng):
    """Three requests over two slots: the third queues, joins when a slot
    frees, and every stream completes with the exact audio length."""
    cfg = tiny_cfg()
    cfg.max_speech_tokens = 24
    pipe = pl.TTSPipeline.from_random(cfg, jax.random.PRNGKey(0))
    cb = ContinuousBatcher(pipe, slots=2, token_hop=8, lookahead=3,
                           overlap_frames=2, prompt_buckets=(32, 64),
                           key=jax.random.PRNGKey(3))
    reqs = _make_requests(pipe, rng, (0.4, 0.6, 0.5))

    rids = [cb.submit(r) for r in reqs[:2]]
    events = []
    late_submitted = False
    ticks = 0
    while cb.busy():
        events.extend(cb.tick())
        ticks += 1
        if not late_submitted and ticks == 2:
            # request 3 arrives while 1+2 are mid-decode
            rids.append(cb.submit(reqs[2]))
            late_submitted = True
        assert ticks < 100, "batcher did not converge"
    assert late_submitted

    for rid, r in zip(rids, reqs):
        evs = [e for e in events if e.stream == rid]
        assert evs, f"stream {rid} produced no audio"
        assert evs[-1].final
        assert not any(e.final for e in evs[:-1])
        total = np.concatenate([e.audio for e in evs])
        assert np.isfinite(total).all()
        # emitted length matches the stream's generated token count
        # (2 latent frames per token, 480 samples per frame)
        assert len(total) == evs[-1].tokens * 2 * 480

    # all slots recycled
    assert all(l.free for l in cb.lanes)
    assert not cb.busy()


@pytest.mark.slow
def test_continuous_latency_independent_of_batchmates(rng):
    """A request joining a busy batch starts producing audio within a few
    ticks of arrival (not after its batch-mates finish) — the property
    that distinguishes continuous batching from window batching."""
    cfg = tiny_cfg()
    cfg.max_speech_tokens = 32
    pipe = pl.TTSPipeline.from_random(cfg, jax.random.PRNGKey(0))
    cb = ContinuousBatcher(pipe, slots=2, token_hop=6, lookahead=3,
                           overlap_frames=2, prompt_buckets=(32, 64),
                           key=jax.random.PRNGKey(9))
    reqs = _make_requests(pipe, rng, (0.4, 0.4))

    rid_a = cb.submit(reqs[0])
    first_a = None
    ticks_a = 0
    # run A alone until it emits its first audio
    while first_a is None and cb.busy():
        evs = cb.tick()
        ticks_a += 1
        if any(e.stream == rid_a and len(e.audio) for e in evs):
            first_a = ticks_a
    assert first_a is not None
    finished_a = not cb.busy()

    # B arrives while A may still be running; B's first audio must take
    # about the same number of ticks as A's did from ITS arrival
    rid_b = cb.submit(reqs[1])
    t_arrive = 0
    first_b = None
    while cb.busy():
        evs = cb.tick()
        t_arrive += 1
        if first_b is None and any(
                e.stream == rid_b and len(e.audio) for e in evs):
            first_b = t_arrive
        assert t_arrive < 100
    assert first_b is not None
    # +1 tick slack for admission (B may miss the tick it arrived on)
    assert first_b <= first_a + 1, (
        f"late joiner waited {first_b} ticks vs {first_a} for the "
        f"first arrival (finished_a={finished_a})")


@pytest.mark.slow
def test_continuous_run_driver(rng):
    """run() drives staggered arrivals on the simulated clock."""
    cfg = tiny_cfg()
    cfg.max_speech_tokens = 20
    pipe = pl.TTSPipeline.from_random(cfg, jax.random.PRNGKey(0))
    cb = ContinuousBatcher(pipe, slots=2, token_hop=8, lookahead=3,
                           overlap_frames=2, prompt_buckets=(32, 64),
                           key=jax.random.PRNGKey(1))
    reqs = _make_requests(pipe, rng, (0.4, 0.5))
    timed = list(cb.run([(0.0, reqs[0]), (0.05, reqs[1])]))
    assert timed
    times = [t for t, _ in timed]
    assert times == sorted(times)
    for rid in (0, 1):
        evs = [e for _, e in timed if e.stream == rid]
        assert evs and evs[-1].final


@pytest.mark.slow
def test_continuous_zero_token_and_oversize_requests(rng):
    """A request that finishes with zero tokens (empty text -> max_len 0)
    must still flush + recycle its lane; an oversize prompt plan must be
    rejected at submit() instead of corrupting the shared KV pool."""
    cfg = tiny_cfg()
    cfg.max_speech_tokens = 24
    pipe = pl.TTSPipeline.from_random(cfg, jax.random.PRNGKey(0))
    cb = ContinuousBatcher(pipe, slots=2, token_hop=8, lookahead=3,
                           overlap_frames=2, prompt_buckets=(32, 64),
                           key=jax.random.PRNGKey(3))
    good, = _make_requests(pipe, rng, (0.4,))

    # empty text: min/max token counts are 0, the lane finishes its
    # first burst with no tokens
    import dataclasses
    empty = dataclasses.replace(good, text_tokens=good.text_tokens[:0])
    rid_e = cb.submit(empty)
    rid_g = cb.submit(good)
    events, ticks = [], 0
    while cb.busy():
        events.extend(cb.tick())
        ticks += 1
        assert ticks < 100, "zero-token lane leaked (busy never drained)"
    evs_e = [e for e in events if e.stream == rid_e]
    assert evs_e and evs_e[-1].final and evs_e[-1].tokens == 0
    evs_g = [e for e in events if e.stream == rid_g]
    assert evs_g and evs_g[-1].final and evs_g[-1].tokens > 0
    assert all(l.free for l in cb.lanes)

    # an oversize prompt plan fails its own submit, nothing else
    big = dataclasses.replace(
        good, text_tokens=rng.integers(0, 256, 80))
    with pytest.raises(ValueError, match="prompt bucket"):
        cb.submit(big)
    assert not cb.busy()
