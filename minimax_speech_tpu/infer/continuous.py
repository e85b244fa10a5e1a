"""Continuous batching: requests join/leave the running decode batch.

The TPU-native equivalent of the reference's vLLM serving path
(reference: speech/cosyvoice/llm/llm.py:715-743, cli/model.py:274-283):
instead of paged attention + an async engine, a FIXED pool of decode
lanes (slots) shares one preallocated KV cache. Admission prefills a
request into a free slot's cache region (one bucketed batch-1 program +
one scatter); every tick then runs ONE fixed-shape batched burst of
`token_hop` sample+embed+decode steps across all slots — lanes that are
free or finished are masked, lanes at different decode positions write
their own cache rows (models/llm.py:decode_step_rows). Audio hops run
per-ready-lane, NOT in lockstep: a request's latency no longer depends
on its batch-mates, and new arrivals start decoding at the next tick
instead of the next window.

Everything is fixed-shape so each program compiles once per bucket:
  * prompt prefill: one program per prompt bucket (batch 1)
  * cache scatter: one program per prompt bucket
  * decode burst: one program total
  * flow+vocoder hop: one program per (ready-count, token-bucket)
"""
from __future__ import annotations

import itertools
from dataclasses import dataclass, field
from functools import partial
from typing import Iterable, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from minimax_speech_tpu.infer.pipeline import next_bucket
from minimax_speech_tpu.infer.serving import Request
from minimax_speech_tpu.infer.session import fade_in_out
from minimax_speech_tpu.infer.stream_batch import StreamEvent
from minimax_speech_tpu.models import llm as llm_mod
from minimax_speech_tpu.models import qwen2
from minimax_speech_tpu.models.flow import flow_inference_batched
from minimax_speech_tpu.ops import sampling as sampling_ops


@dataclass
class _Lane:
    """Host-side bookkeeping for one decode slot."""
    request_id: int = -1
    request: Optional[Request] = None
    tokens: list = field(default_factory=list)
    emitted_frames: int = 0
    prev_tail: Optional[np.ndarray] = None
    pending: int = 0
    done: bool = False      # LM finished (EOS / max_len)
    flushed: bool = False   # final audio emitted
    free: bool = True


class ContinuousBatcher:
    """Slot-pool continuous batching over the streaming TTS pipeline.

    submit() enqueues a request and returns its stream id; tick() runs
    one decode burst (admitting pending requests into free slots first)
    and returns the StreamEvents produced. run(arrivals) drives a
    simulated-clock workload for benchmarks/tests.
    """

    HEADROOM = 64

    def __init__(self, pipeline, slots: int = 4, token_hop: int = 25,
                 lookahead: int = 3, overlap_frames: int = 8,
                 prompt_buckets: tuple = (64, 128, 192, 256),
                 key=None):
        self.p = pipeline
        self.slots = slots
        self.token_hop = token_hop
        self.lookahead = lookahead
        self.overlap_frames = overlap_frames
        self.overlap_samples = overlap_frames * 480
        self.window = np.hamming(2 * self.overlap_samples)
        self.prompt_buckets = tuple(sorted(prompt_buckets))
        cfg = pipeline.cfg
        assert token_hop + lookahead <= self.HEADROOM
        self._key = key if key is not None else jax.random.PRNGKey(0)
        self._ids = itertools.count()
        self._queue: list[tuple[int, Request]] = []
        self.lanes = [_Lane() for _ in range(slots)]

        m = pipeline.lm
        self._embed_plan = jax.jit(partial(
            m.apply, method=llm_mod.SpeechLM.embed_plan))
        self._prefill1 = jax.jit(self._prefill1_impl,
                                 static_argnames=("p",))
        # donate the pool state so the KV cache is updated in place
        # (without donation every scatter/burst doubles the pool in HBM)
        self._scatter = jax.jit(self._scatter_impl,
                                static_argnames=("slot",),
                                donate_argnums=tuple(range(10)))
        self._burst = jax.jit(self._burst_impl, static_argnames=("n",),
                              donate_argnums=(2, 3, 4, 5, 6, 7))
        self._flow_batched = jax.jit(
            lambda v, tok, tl, pf, pfl, emb, nz: flow_inference_batched(
                self.p.flow, v, tok, tl, pf, pfl, emb, nz, streaming=True))

        # the shared device state: one KV pool + per-lane decode carries
        s = slots
        k_len = (self.prompt_buckets[-1] + cfg.max_speech_tokens
                 + self.HEADROOM)
        self.k_len = k_len
        # lm embedding dtype drives the cache dtype
        dt = jax.tree_util.tree_leaves(pipeline.lm_vars)[0].dtype
        self._cache = qwen2.make_cache(cfg.lm.qwen, s, k_len, dt)
        self._valid = jnp.zeros((s, k_len), bool)
        self._logits = jnp.zeros((s, cfg.lm.speech_token_size + 3),
                                 jnp.float32)
        self._recent = jnp.full((s, cfg.lm.ras_win), -1, jnp.int32)
        self._counts = jnp.zeros((s,), jnp.int32)
        self._done = jnp.ones((s,), bool)
        self._active = jnp.zeros((s,), bool)
        self._plen = jnp.zeros((s,), jnp.int32)
        self._min_len = jnp.zeros((s,), jnp.int32)
        self._max_len = jnp.zeros((s,), jnp.int32)

    # -- device programs ------------------------------------------------------
    def _prefill1_impl(self, v, src, tok, plen, spk, p: int):
        """Batch-1 prompt prefill at bucket p -> (logits, k, v) block."""
        m = self.p.lm
        emb = m.apply(v, src, tok, spk, method=llm_mod.SpeechLM.embed_plan)
        cache = qwen2.make_cache(self.p.cfg.lm.qwen, 1, p, emb.dtype)
        pad = jnp.arange(p)[None] < plen[:, None]
        positions = jnp.broadcast_to(jnp.arange(p)[None], (1, p))
        hidden, cache = m.apply(v, emb, pad, positions, cache,
                                method=llm_mod.SpeechLM.prefill)
        last = jnp.take_along_axis(
            hidden, (plen - 1)[:, None, None], axis=1)[:, 0]
        logits = m.apply(v, last,
                         method=lambda mm, h: mm.llm_decoder(h))
        return (logits[0].astype(jnp.float32), cache[0][:, 0],
                cache[1][:, 0], pad[0])

    def _scatter_impl(self, cache, valid, logits, recent, counts, done,
                      active, plen, min_len, max_len,
                      blk_k, blk_v, blk_logits, blk_pad,
                      new_plen, new_min, new_max, slot: int):
        """Write one prefilled request into lane `slot` of the pool."""
        ck = jax.lax.dynamic_update_slice(
            cache[0], blk_k[:, None], (0, slot, 0, 0, 0))
        cv = jax.lax.dynamic_update_slice(
            cache[1], blk_v[:, None], (0, slot, 0, 0, 0))
        row = jnp.zeros((self.k_len,), bool)
        row = jax.lax.dynamic_update_slice(row, blk_pad, (0,))
        valid = valid.at[slot].set(row)
        logits = logits.at[slot].set(blk_logits)
        recent = recent.at[slot].set(-1)
        counts = counts.at[slot].set(0)
        done = done.at[slot].set(False)
        active = active.at[slot].set(True)
        plen = plen.at[slot].set(new_plen)
        min_len = min_len.at[slot].set(new_min)
        max_len = max_len.at[slot].set(new_max)
        return ((ck, cv), valid, logits, recent, counts, done, active,
                plen, min_len, max_len)

    def _burst_impl(self, v, key, cache, valid, logits, recent, counts,
                    done, active, plen, min_len, max_len, n: int):
        """n batched sample+embed+decode steps in ONE dispatch; inactive
        and finished lanes are masked but stay in the batch."""
        cfg = self.p.cfg
        eos = cfg.lm.eos_token
        m = self.p.lm

        def body(c, xs):
            key, logits, cache, valid, recent, counts, done = c
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            ids = jnp.arange(logp.shape[-1])
            logp = jnp.where(ids[None] > eos, -jnp.inf, logp)
            allow = counts >= min_len
            logp = jnp.where((ids[None] == eos) & ~allow[:, None],
                             -jnp.inf, logp)
            if cfg.lm.pregen_noise:
                g_t, i = xs
                toks = sampling_ops.ras_sample_batch_pregen(
                    jax.random.fold_in(jax.random.fold_in(key, i), 1),
                    g_t, logp, recent, cfg.lm.top_p, cfg.lm.top_k,
                    cfg.lm.ras_win, cfg.lm.ras_tau).astype(jnp.int32)
            else:
                key, k1 = jax.random.split(key)
                keys = jax.random.split(k1, logits.shape[0])
                toks = sampling_ops.ras_sample_batch(
                    keys, logp, recent, cfg.lm.top_p, cfg.lm.top_k,
                    cfg.lm.ras_win, cfg.lm.ras_tau).astype(jnp.int32)
            now_eos = (toks == eos) | (counts >= max_len)
            done = done | (now_eos & active)
            emit = active & ~done
            out = jnp.where(emit, toks, -1)
            recent = jnp.where(
                emit[:, None],
                jnp.concatenate([recent[:, 1:], toks[:, None]], axis=1),
                recent)
            slots_w = plen + counts          # per-lane write position
            counts = counts + emit.astype(jnp.int32)
            emb1 = m.apply(v, jnp.clip(toks, 0, eos - 1)[:, None],
                           method=llm_mod.SpeechLM.embed_speech_token)
            logits, cache, valid = m.apply(
                v, emb1, slots_w, valid, cache, slots_w, emit,
                method=llm_mod.SpeechLM.decode_step_rows)
            # bf16 weights produce bf16 logits; the pool carry is f32
            logits = logits.astype(jnp.float32)
            return (key, logits, cache, valid, recent, counts, done), out

        xs = None
        if cfg.lm.pregen_noise:
            bsz = logits.shape[0]
            steps_i = jnp.arange(n, dtype=jnp.int32)
            g = jax.vmap(lambda i: jax.random.gumbel(
                jax.random.fold_in(jax.random.fold_in(key, i), 0),
                (bsz, cfg.lm.top_k)))(steps_i)
            xs = (g, steps_i)
        (key, logits, cache, valid, recent, counts, done), toks = \
            jax.lax.scan(body, (key, logits, cache, valid, recent,
                                counts, done), xs, length=n)
        if cfg.lm.pregen_noise:
            # body never splits the carried key in pregen mode; advance
            # it once per burst so the next burst draws fresh noise
            key = jax.random.fold_in(key, 0x62757273)
        return (key, logits, cache, valid, recent, counts, done, active,
                jnp.swapaxes(toks, 0, 1))

    # -- host-side scheduling --------------------------------------------------
    def submit(self, request: Request) -> int:
        # validate against the fixed pool geometry HERE, so an oversize
        # request fails its own caller instead of corrupting the shared
        # KV pool (dynamic_update_slice clamps silently) or crashing a
        # tick that other requests are riding on
        cfg = self.p.cfg
        spk = 1 if cfg.lm.use_speaker_encoder else 0
        plan_len = (2 + spk + len(request.prompt_text_tokens)
                    + len(request.text_tokens)
                    + len(request.prompt_speech_tokens))
        if plan_len > self.prompt_buckets[-1]:
            raise ValueError(
                f"prompt plan of {plan_len} tokens exceeds the largest "
                f"prompt bucket {self.prompt_buckets[-1]}; shorten the "
                f"prompt/text or construct the batcher with larger "
                f"prompt_buckets")
        rid = next(self._ids)
        self._queue.append((rid, request))
        return rid

    def _admit(self):
        cfg = self.p.cfg
        for slot, lane in enumerate(self.lanes):
            if not self._queue:
                return
            if not lane.free:
                continue
            rid, r = self._queue.pop(0)
            src, tok, plen = llm_mod.build_inference_plan(
                np.concatenate([r.prompt_text_tokens, r.text_tokens]),
                r.prompt_speech_tokens, use_spk=cfg.lm.use_speaker_encoder)
            p = next_bucket(src.shape[1], buckets=self.prompt_buckets)
            src = np.pad(src, ((0, 0), (0, p - src.shape[1])))
            tok = np.pad(tok, ((0, 0), (0, p - tok.shape[1])))
            n_text = len(r.text_tokens)
            mn = int(n_text * cfg.min_token_text_ratio)
            mx = min(int(n_text * cfg.max_token_text_ratio),
                     cfg.max_speech_tokens)
            blk_logits, blk_k, blk_v, blk_pad = self._prefill1(
                self.p.lm_vars, jnp.asarray(src), jnp.asarray(tok),
                jnp.asarray(plen), jnp.asarray(r.lm_spk[None]), p=p)
            (self._cache, self._valid, self._logits, self._recent,
             self._counts, self._done, self._active, self._plen,
             self._min_len, self._max_len) = self._scatter(
                self._cache, self._valid, self._logits, self._recent,
                self._counts, self._done, self._active, self._plen,
                self._min_len, self._max_len,
                blk_k, blk_v, blk_logits, blk_pad,
                jnp.int32(plen[0]), jnp.int32(mn), jnp.int32(mx),
                slot=slot)
            self.lanes[slot] = _Lane(request_id=rid, request=r, free=False)

    def tick(self) -> list[StreamEvent]:
        """Admit pending requests, run one decode burst, hop ready lanes."""
        self._admit()
        if all(l.free for l in self.lanes):
            return []
        (self._key, self._logits, self._cache, self._valid, self._recent,
         self._counts, self._done, self._active, toks) = self._burst(
            self.p.lm_vars, self._key, self._cache, self._valid,
            self._logits, self._recent, self._counts, self._done,
            self._active, self._plen, self._min_len, self._max_len,
            n=self.token_hop)
        toks_h, done_h = jax.device_get((toks, self._done))
        for i, lane in enumerate(self.lanes):
            if lane.free or lane.done:
                continue
            new = toks_h[i][toks_h[i] >= 0]
            lane.tokens.extend(int(t) for t in new)
            lane.pending += len(new)
            lane.done = bool(done_h[i])
        events = list(self._hop())
        # recycle flushed lanes, then admit immediately so a waiting
        # request loses at most one tick
        for i, lane in enumerate(self.lanes):
            if lane.flushed:
                self.lanes[i] = _Lane()
        self._admit()
        return events

    def busy(self) -> bool:
        return bool(self._queue) or any(not l.free for l in self.lanes)

    def _hop(self) -> Iterator[StreamEvent]:
        """Flow+vocoder for every lane that is ready — independently of
        the others (no lockstep)."""
        cfg = self.p.cfg
        # a lane that finished with ZERO emitted tokens (empty text ->
        # max_len 0) has no audio to synthesize but must still flush,
        # or its slot leaks and busy() never drains
        for lane in self.lanes:
            if not lane.free and not lane.flushed and lane.done \
                    and not lane.tokens:
                lane.flushed = True
                yield StreamEvent(stream=lane.request_id,
                                  audio=np.zeros(0, np.float32),
                                  tokens=0, final=True)
        idxs = [i for i, l in enumerate(self.lanes)
                if not l.free and not l.flushed and l.tokens
                and (l.done
                     or l.pending >= self.token_hop + self.lookahead)]
        if not idxs:
            return
        seqs = [np.concatenate([self.lanes[i].request.prompt_speech_tokens,
                                np.asarray(self.lanes[i].tokens, np.int64)])
                for i in idxs]
        t_max = next_bucket(max(len(q) for q in seqs))
        tok_b = np.zeros((len(idxs), t_max), np.int32)
        tls = np.zeros((len(idxs),), np.int32)
        pf_max = next_bucket(
            max(self.lanes[i].request.prompt_feat.shape[0] for i in idxs),
            buckets=(16, 32, 64, 128, 256))
        pf = np.zeros((len(idxs), pf_max, cfg.flow.output_size), np.float32)
        pfl = np.zeros((len(idxs),), np.int32)
        femb = np.zeros((len(idxs),) + np.shape(
            self.lanes[idxs[0]].request.flow_emb), np.float32)
        for j, (i, q) in enumerate(zip(idxs, seqs)):
            r = self.lanes[i].request
            tok_b[j, : len(q)] = q
            tls[j] = len(q)
            pf[j, : r.prompt_feat.shape[0]] = r.prompt_feat
            pfl[j] = r.prompt_feat.shape[0]
            femb[j] = r.flow_emb
        feat = self._flow_batched(
            self.p.flow_vars, jnp.asarray(tok_b), jnp.asarray(tls),
            jnp.asarray(pf), jnp.asarray(pfl), jnp.asarray(femb),
            self.p.noise)
        wav_all = np.asarray(self.p._decode(self.p.codec_vars, feat))

        for j, i in enumerate(idxs):
            lane = self.lanes[i]
            body_tokens = len(lane.tokens) - (
                0 if lane.done else self.lookahead)
            lo = (int(pfl[j]) + lane.emitted_frames) * 480
            hi = (int(pfl[j])
                  + body_tokens * cfg.token_latent_ratio) * 480
            if hi <= lo:
                if lane.done:
                    lane.flushed = True
                    yield StreamEvent(stream=lane.request_id,
                                      audio=np.zeros(0, np.float32),
                                      tokens=len(lane.tokens), final=True)
                continue
            wav = wav_all[j].reshape(-1)[lo:hi]
            if lane.prev_tail is not None and \
                    len(wav) >= self.overlap_samples:
                wav = fade_in_out(wav, lane.prev_tail, self.window)
            if not lane.done:
                lane.prev_tail = wav[-self.overlap_samples:]
                emit = wav[: len(wav) - self.overlap_samples]
                lane.emitted_frames = (body_tokens * cfg.token_latent_ratio
                                       - self.overlap_frames)
                lane.pending -= self.token_hop
            else:
                emit = wav
                lane.flushed = True
            yield StreamEvent(stream=lane.request_id, audio=emit,
                              tokens=len(lane.tokens), final=lane.done)

    # -- workload driver -------------------------------------------------------
    def run(self, arrivals: Iterable[tuple[float, Request]],
            clock=None) -> Iterator[tuple[float, StreamEvent]]:
        """Drive a staggered-arrival workload. arrivals: (t_arrive, req)
        sorted by time; clock: callable returning 'now' (defaults to a
        simulated clock that advances to each arrival / past each tick).
        Yields (emit_time, event)."""
        import time as _time
        pending = sorted(arrivals, key=lambda a: a[0])
        use_wall = clock is not None
        now = 0.0

        def t():
            return clock() if use_wall else now

        i = 0
        while i < len(pending) or self.busy():
            while i < len(pending) and pending[i][0] <= t():
                self.submit(pending[i][1])
                i += 1
            if not self.busy():
                if use_wall:
                    _time.sleep(0.001)
                else:
                    now = pending[i][0]
                continue
            t0 = _time.perf_counter()
            events = self.tick()
            if not use_wall:
                now += _time.perf_counter() - t0
            for ev in events:
                yield t(), ev
