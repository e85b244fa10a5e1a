"""Batched streaming serving: N concurrent streaming sessions in lockstep.

Combines the streaming session's 25-token-hop contract (infer/session.py)
with batched decoding (infer/serving.py): one batched prefill + one
batched single-token step per decode tick, one batched flow+vocoder call
per hop. Streams finish independently (EOS tracked per sample); audio
chunks are emitted per stream with crossfaded boundaries.

This is the streaming face of the vLLM-replacement story: the AR decode
is weight-streaming-bound, so stepping B streams costs roughly the same
as one.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Iterator, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from minimax_speech_tpu.infer.pipeline import next_bucket
from minimax_speech_tpu.infer.serving import Request
from minimax_speech_tpu.infer.session import fade_in_out
from minimax_speech_tpu.models import llm as llm_mod
from minimax_speech_tpu.models import qwen2
from minimax_speech_tpu.models.flow import flow_inference_batched
from minimax_speech_tpu.ops import sampling as sampling_ops


@dataclass
class StreamEvent:
    stream: int
    audio: np.ndarray
    tokens: int
    final: bool


@dataclass
class _StreamState:
    tokens: list = field(default_factory=list)
    emitted_frames: int = 0
    prev_tail: Optional[np.ndarray] = None
    pending: int = 0
    done: bool = False
    flushed: bool = False


class BatchStreamingSession:
    def __init__(self, pipeline, token_hop: int = 25, lookahead: int = 3,
                 overlap_frames: int = 8):
        self.p = pipeline
        self.token_hop = token_hop
        self.lookahead = lookahead
        self.overlap_frames = overlap_frames
        self.overlap_samples = overlap_frames * 480
        self.window = np.hamming(2 * self.overlap_samples)
        # burst sizes must fit the KV headroom past max_steps
        assert token_hop + lookahead <= self.HEADROOM, \
            (token_hop, lookahead, self.HEADROOM)
        m = pipeline.lm
        self._prefill = jax.jit(partial(m.apply,
                                        method=llm_mod.SpeechLM.prefill))
        self._embed_plan = jax.jit(partial(
            m.apply, method=llm_mod.SpeechLM.embed_plan))
        self._decoder = jax.jit(
            lambda v, h: m.apply(v, h, method=lambda mm, x: mm.llm_decoder(x)))
        self._flow_batched = jax.jit(
            lambda v, tok, tl, pf, pfl, emb, nz: flow_inference_batched(
                self.p.flow, v, tok, tl, pf, pfl, emb, nz, streaming=True))
        self._burst = jax.jit(self._burst_impl, static_argnames=("n", "p"))

    HEADROOM = 64  # KV slots past max_steps for fixed-size bursts

    def _burst_impl(self, v, carry, consts, n: int, p: int):
        """n batched sample+decode steps in ONE dispatch (each host-loop
        step pays the ~28 ms tunnel RTT — see session.TokenStream)."""
        cfg = self.p.cfg
        eos = cfg.lm.eos_token
        m = self.p.lm
        plen, min_len, max_len = consts

        def body(c, xs):
            key, logits, cache, valid, recent, counts, done, step = c
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            ids = jnp.arange(logp.shape[-1])
            logp = jnp.where(ids[None] > eos, -jnp.inf, logp)
            allow = counts >= min_len
            logp = jnp.where((ids[None] == eos) & ~allow[:, None],
                             -jnp.inf, logp)
            if cfg.lm.pregen_noise:
                g_t, s = xs
                toks = sampling_ops.ras_sample_batch_pregen(
                    jax.random.fold_in(jax.random.fold_in(key, s), 1),
                    g_t, logp, recent, cfg.lm.top_p, cfg.lm.top_k,
                    cfg.lm.ras_win, cfg.lm.ras_tau).astype(jnp.int32)
            else:
                key, k1 = jax.random.split(key)
                keys = jax.random.split(k1, logits.shape[0])
                toks = sampling_ops.ras_sample_batch(
                    keys, logp, recent, cfg.lm.top_p, cfg.lm.top_k,
                    cfg.lm.ras_win, cfg.lm.ras_tau).astype(jnp.int32)
            now_eos = (toks == eos) | (counts >= max_len)
            done = done | now_eos
            emit = ~done
            out = jnp.where(emit, toks, -1)
            recent = jnp.where(
                emit[:, None],
                jnp.concatenate([recent[:, 1:], toks[:, None]], axis=1),
                recent)
            pos = plen + counts
            counts = counts + emit.astype(jnp.int32)
            emb1 = m.apply(v, jnp.clip(toks, 0, eos - 1)[:, None],
                           method=llm_mod.SpeechLM.embed_speech_token)
            logits, cache, valid = m.apply(
                v, emb1, pos, valid, cache, p + step,
                method=llm_mod.SpeechLM.decode_step)
            return (key, logits, cache, valid, recent, counts, done,
                    step + 1), out

        xs = None
        if cfg.lm.pregen_noise:
            key0, step0 = carry[0], carry[7]
            bsz = carry[1].shape[0]
            steps = step0 + jnp.arange(n, dtype=jnp.int32)
            g = jax.vmap(lambda s: jax.random.gumbel(
                jax.random.fold_in(jax.random.fold_in(key0, s), 0),
                (bsz, cfg.lm.top_k)))(steps)
            xs = (g, steps)
        carry, toks = jax.lax.scan(body, carry, xs, length=n)
        return carry, jnp.swapaxes(toks, 0, 1), carry[6]  # (B, n), done(B,)

    def run(self, requests: Sequence[Request], key=None
            ) -> Iterator[StreamEvent]:
        cfg = self.p.cfg
        b = len(requests)
        key = key if key is not None else jax.random.PRNGKey(0)
        v = self.p.lm_vars
        eos = cfg.lm.eos_token

        plans = [llm_mod.build_inference_plan(
            np.concatenate([r.prompt_text_tokens, r.text_tokens]),
            r.prompt_speech_tokens, use_spk=cfg.lm.use_speaker_encoder)
            for r in requests]
        p_max = next_bucket(max(pl[0].shape[1] for pl in plans))
        src = np.zeros((b, p_max), np.int32)
        tok = np.zeros((b, p_max), np.int32)
        plen = np.zeros((b,), np.int32)
        for i, (s, t_, n) in enumerate(plans):
            src[i, : s.shape[1]] = s[0]
            tok[i, : t_.shape[1]] = t_[0]
            plen[i] = n[0]
        spk = jnp.asarray(np.stack([r.lm_spk for r in requests]))
        min_len = np.array([int(len(r.text_tokens)
                                * cfg.min_token_text_ratio)
                            for r in requests])
        max_len = np.array([min(int(len(r.text_tokens)
                                    * cfg.max_token_text_ratio),
                                cfg.max_speech_tokens) for r in requests])

        emb = self._embed_plan(v, jnp.asarray(src), jnp.asarray(tok), spk)
        max_steps = cfg.max_speech_tokens
        cache = qwen2.make_cache(cfg.lm.qwen, b,
                                 p_max + max_steps + self.HEADROOM,
                                 emb.dtype)
        pad = jnp.arange(p_max)[None] < jnp.asarray(plen)[:, None]
        positions = jnp.broadcast_to(jnp.arange(p_max)[None], (b, p_max))
        hidden, cache = self._prefill(v, emb, pad, positions, cache)
        last = jnp.take_along_axis(
            hidden, jnp.asarray(plen - 1)[:, None, None], axis=1)[:, 0]
        logits = self._decoder(v, last)
        valid = jnp.concatenate(
            [pad, jnp.zeros((b, max_steps + self.HEADROOM), bool)], 1)
        recent = jnp.full((b, cfg.lm.ras_win), -1, jnp.int32)

        states = [_StreamState() for _ in range(b)]

        # prompt features for the flow stage (padded once)
        pf_max = next_bucket(max(r.prompt_feat.shape[0] for r in requests),
                             buckets=(16, 32, 64, 128, 256))
        pf = np.zeros((b, pf_max, cfg.flow.output_size), np.float32)
        pfl = np.zeros((b,), np.int32)
        for i, r in enumerate(requests):
            pf[i, : r.prompt_feat.shape[0]] = r.prompt_feat
            pfl[i] = r.prompt_feat.shape[0]
        femb = jnp.asarray(np.stack([r.flow_emb for r in requests]))

        carry = (key, logits, cache, valid, recent,
                 jnp.zeros((b,), jnp.int32), jnp.zeros((b,), bool),
                 jnp.int32(0))
        consts = (jnp.asarray(plen), jnp.asarray(min_len, jnp.int32),
                  jnp.asarray(max_len, jnp.int32))
        emitted = 0
        first = True
        while emitted < max_steps and not all(s.done for s in states):
            # fixed burst sizes (hop+lookahead first, then hop) so each
            # size compiles once; ONE dispatch + ONE transfer per burst
            n = self.token_hop + (self.lookahead if first else 0)
            first = False
            carry, toks_bn, done_b = self._burst(v, carry, consts,
                                                 n=n, p=p_max)
            toks_bn, done_b = jax.device_get((toks_bn, done_b))
            emitted += n
            for i, s in enumerate(states):
                if s.done:
                    continue
                new = toks_bn[i][toks_bn[i] >= 0]
                s.tokens.extend(int(t) for t in new)
                s.pending += len(new)
                s.done = bool(done_b[i])

            # hop when every ACTIVE stream is ready (lockstep batching)
            active = [s for s in states if not s.done and not s.flushed]
            ready = all(s.pending >= self.token_hop + self.lookahead
                        for s in active) and active
            finals = [s for s in states if s.done and not s.flushed
                      and s.tokens]
            if ready or finals:
                yield from self._hop(states, requests, pf, pfl, femb)

        # flush everything that still has audio pending
        for s in states:
            s.done = True
        yield from self._hop(states, requests, pf, pfl, femb)

    def _hop(self, states, requests, pf, pfl, femb):
        cfg = self.p.cfg
        idxs = [i for i, s in enumerate(states)
                if s.tokens and not s.flushed
                and (s.done or s.pending >= self.token_hop + self.lookahead)]
        if not idxs:
            return
        seqs = []
        for i in idxs:
            seqs.append(np.concatenate([requests[i].prompt_speech_tokens,
                                        np.asarray(states[i].tokens)]))
        t_max = next_bucket(max(len(q) for q in seqs))
        tok_b = np.zeros((len(idxs), t_max), np.int32)
        tls = np.zeros((len(idxs),), np.int32)
        for j, q in enumerate(seqs):
            tok_b[j, : len(q)] = q
            tls[j] = len(q)
        feat = self._flow_batched(
            self.p.flow_vars, jnp.asarray(tok_b), jnp.asarray(tls),
            jnp.asarray(pf[idxs]), jnp.asarray(pfl[idxs]), femb[jnp.asarray(idxs)],
            self.p.noise)
        wav_all = np.asarray(self.p._decode(self.p.codec_vars, feat))

        for j, i in enumerate(idxs):
            s = states[i]
            body_tokens = len(states[i].tokens) - (
                0 if s.done else self.lookahead)
            lo_frame = int(pfl[i]) + s.emitted_frames
            hi_frame = int(pfl[i]) + body_tokens * cfg.token_latent_ratio
            if hi_frame <= lo_frame:
                continue
            wav = wav_all[j, lo_frame * 480: hi_frame * 480].reshape(-1)
            if s.prev_tail is not None and len(wav) >= self.overlap_samples:
                wav = fade_in_out(wav, s.prev_tail, self.window)
            if not s.done:
                s.prev_tail = wav[-self.overlap_samples:]
                emit = wav[: len(wav) - self.overlap_samples]
                s.emitted_frames = (body_tokens * cfg.token_latent_ratio
                                    - self.overlap_frames)
                s.pending -= self.token_hop
            else:
                emit = wav
                s.flushed = True
            yield StreamEvent(stream=i, audio=emit, tokens=len(s.tokens),
                              final=s.done)
