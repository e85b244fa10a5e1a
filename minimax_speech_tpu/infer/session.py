"""Streaming TTS session: 25-token hop, 3-token lookahead, chunk fades.

Replaces the reference session manager (reference:
speech/cosyvoice/cli/model.py:103-386): an LLM token producer feeds a
flow+vocoder consumer that emits audio every `token_hop` tokens, using
the flow encoder's pre-lookahead context for non-final chunks and
crossfading chunk boundaries. The reference runs the producer in a
thread with a 0.1 s poll (model.py:332-340); here the producer is an
incremental jitted decode the consumer pulls from directly — same
timing contract, no polling.

The incremental decoder reuses SpeechLM.prefill/decode_step: one jitted
prefill + one jitted single-token step (static shapes, preallocated KV
cache) called from a host loop so tokens are available as they decode.
"""
from __future__ import annotations

import time
from dataclasses import dataclass
from functools import partial
from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from minimax_speech_tpu.models import llm as llm_mod
from minimax_speech_tpu.models import qwen2
from minimax_speech_tpu.ops import sampling as sampling_ops


def fade_in_out(fade_in: np.ndarray, fade_out: np.ndarray,
                window: np.ndarray) -> np.ndarray:
    """Crossfade the head of fade_in with the tail of fade_out
    (reference: utils/common.py:142-150)."""
    n = len(window) // 2
    out = fade_in.copy()
    out[..., :n] = (fade_in[..., :n] * window[:n]
                    + fade_out[..., -n:] * window[n:])
    return out


class TokenStream:
    """Incremental LLM decode yielding tokens as they decode.

    Tokens are produced in jitted BURSTS (a `lax.scan` of `burst_size`
    decode+sample steps per device dispatch, one fused transfer per
    burst): on the axon tunnel every dispatch after the first
    device->host transfer costs a flat ~28 ms round trip, so a
    per-token host loop (the reference's inference_wrapper,
    llm/llm.py:744-760) would pay ~28 ms/token. The burst size is the
    streaming hop, so token latency still matches the hop contract."""

    def __init__(self, model: llm_mod.SpeechLM, variables, max_steps: int = 512):
        self.model = model
        self.variables = variables
        self.max_steps = max_steps
        cfg = model.cfg
        self._prefill = jax.jit(partial(model.apply,
                                        method=llm_mod.SpeechLM.prefill))
        self._embed_plan = jax.jit(partial(model.apply,
                                           method=llm_mod.SpeechLM.embed_plan))
        self._decoder = jax.jit(
            lambda v, h: model.apply(v, h, method=lambda m, x: m.llm_decoder(x)))
        self._burst = jax.jit(self._burst_impl, static_argnames=("n", "p"))

    def _burst_impl(self, variables, carry, n: int, p: int):
        """Run n sample+decode steps on device. Mirrors llm.generate's
        while_loop body (models/llm.py:354-391) as a bounded scan."""
        cfg = self.model.cfg
        eos = cfg.eos_token
        model = self.model

        def apply(method, *args):
            return model.apply(variables, *args, method=method)

        def body(c, xs):
            key, logits, cache, valid, recent, count, finished, \
                prompt_len, min_len, max_len, step = c
            logp = jax.nn.log_softmax(logits[0].astype(jnp.float32))
            ids = jnp.arange(logp.shape[-1])
            logp = jnp.where(ids > eos, -jnp.inf, logp)
            logp = jnp.where((ids == eos) & (count < min_len), -jnp.inf,
                             logp)
            if cfg.pregen_noise:
                # noise pregenerated per ABSOLUTE step at burst entry
                # (burst-partition invariant; key stays fixed)
                g_t, s = xs
                step_key = jax.random.fold_in(
                    jax.random.fold_in(key, s), 1)
                tok = sampling_ops.ras_sample_batch_pregen(
                    step_key, g_t[None], logp[None], recent[None],
                    cfg.top_p, cfg.top_k, cfg.ras_win,
                    cfg.ras_tau)[0].astype(jnp.int32)
            else:
                key, k1 = jax.random.split(key)
                tok = sampling_ops.ras_sample(k1, logp, recent, cfg.top_p,
                                              cfg.top_k, cfg.ras_win,
                                              cfg.ras_tau).astype(jnp.int32)
            now_eos = (tok == eos) | (count >= max_len)
            finished = finished | now_eos
            emit = ~finished
            out_tok = jnp.where(emit, tok, -1)
            recent = jnp.where(emit,
                               sampling_ops.push_recent(recent, tok), recent)
            pos = prompt_len + count
            count = count + emit.astype(jnp.int32)
            emb1 = apply(llm_mod.SpeechLM.embed_speech_token,
                         jnp.clip(tok, 0, eos - 1)[None, None])
            logits, cache, valid = apply(llm_mod.SpeechLM.decode_step,
                                         emb1, pos[None], valid, cache,
                                         p + step)
            c = (key, logits, cache, valid, recent, count, finished,
                 prompt_len, min_len, max_len, step + 1)
            return c, out_tok

        xs = None
        if cfg.pregen_noise:
            key0, step0 = carry[0], carry[10]
            steps = step0 + jnp.arange(n, dtype=jnp.int32)
            g = jax.vmap(lambda s: jax.random.gumbel(
                jax.random.fold_in(jax.random.fold_in(key0, s), 0),
                (cfg.top_k,)))(steps)
            xs = (g, steps)
        carry, toks = jax.lax.scan(body, carry, xs, length=n)
        return carry, toks, carry[6]  # (carry, (n,) tokens, finished)

    def start(self, src_type, tok_id, prompt_len, spk_emb, key,
              min_len: int, max_len: int) -> None:
        """Prefill the prompt plan and initialize the decode carry."""
        cfg = self.model.cfg
        b, p = src_type.shape
        assert b == 1, "TokenStream is single-stream (see stream_batch)"
        emb = self._embed_plan(self.variables, jnp.asarray(src_type),
                               jnp.asarray(tok_id), spk_emb)
        # +HEADROOM slots: bursts always run a FIXED step count (one
        # compiled program per burst size); steps past max_len sample
        # into the headroom and are discarded
        cache = qwen2.make_cache(cfg.qwen, b,
                                 p + self.max_steps + self.HEADROOM,
                                 emb.dtype)
        pad = jnp.arange(p)[None] < jnp.asarray(prompt_len)[:, None]
        positions = jnp.broadcast_to(jnp.arange(p)[None], (b, p))
        hidden, cache = self._prefill(self.variables, emb, pad, positions,
                                      cache)
        logits = self._decoder(self.variables,
                               hidden[:, int(prompt_len[0]) - 1])
        valid = jnp.concatenate(
            [pad, jnp.zeros((b, self.max_steps + self.HEADROOM), bool)], 1)
        recent = jnp.full((cfg.ras_win,), -1, jnp.int32)
        self._p = p
        self._emitted = 0
        self._carry = (key, logits, cache, valid, recent,
                       jnp.int32(0), jnp.bool_(False),
                       jnp.int32(int(prompt_len[0])), jnp.int32(min_len),
                       jnp.int32(max_len), jnp.int32(0))

    HEADROOM = 64  # cache slots past max_steps (fixed-size last burst)

    def next_burst(self, n: int) -> tuple[np.ndarray, bool]:
        """Decode n more steps; ONE dispatch + ONE transfer. n is used
        as-is so each distinct burst size compiles exactly once.
        Returns (emitted tokens (<=n,), done)."""
        assert n <= self.HEADROOM, (n, self.HEADROOM)
        if self._emitted >= self.max_steps:
            return np.zeros((0,), np.int32), True
        self._carry, toks, finished = self._burst(
            self.variables, self._carry, n=n, p=self._p)
        toks, finished = jax.device_get((toks, finished))
        toks = toks[toks >= 0][: self.max_steps - self._emitted]
        self._emitted += len(toks)
        done = bool(finished) or self._emitted >= self.max_steps
        return toks.astype(np.int32), done

    def generate(self, src_type, tok_id, prompt_len, spk_emb, key,
                 min_len: int, max_len: int,
                 burst_size: int = 28) -> Iterator[int]:
        """Token iterator (same contract as the per-token reference
        loop); fetches device bursts of `burst_size` under the hood."""
        self.start(src_type, tok_id, prompt_len, spk_emb, key,
                   min_len, max_len)
        while True:
            toks, done = self.next_burst(burst_size)
            yield from (int(t) for t in toks)
            if done:
                return


@dataclass
class StreamChunk:
    audio: np.ndarray
    tokens: int
    final: bool


class StreamingSession:
    """Produce audio chunks every token_hop tokens
    (reference: cli/model.py:321-386 with chunk_size 25, lookahead 3,
    config.yaml:19,69)."""

    def __init__(self, pipeline, token_hop: int = 25, lookahead: int = 3,
                 overlap_frames: int = 8, chunked: bool = True,
                 unet_window: int = 100):
        self.p = pipeline
        self.token_hop = token_hop
        self.lookahead = lookahead
        self.overlap_frames = overlap_frames
        self.overlap_samples = overlap_frames * 480  # samples per frame
        self.window = np.hamming(2 * self.overlap_samples)
        # jitted programs are shared ACROSS sessions via the pipeline
        # (a fresh TokenStream / ChunkedFlowSession per utterance would
        # re-trace every program; both reset their per-utterance state
        # in start()/prefill())
        shared = getattr(pipeline, "_session_shared", None)
        if shared is None:
            shared = pipeline._session_shared = {}
        skey = ("ts", self.p.cfg.max_speech_tokens)
        if skey not in shared:
            shared[skey] = TokenStream(
                self.p.lm, self.p.lm_vars,
                max_steps=self.p.cfg.max_speech_tokens)
        self.stream = shared[skey]
        self.chunked = chunked
        if chunked:
            # O(chunk)-per-hop flow with persistent caches
            # (infer/stream_flow.py) instead of the reference's full-prefix
            # rerun per hop (cli/model.py:285-319)
            from minimax_speech_tpu.infer.stream_flow import \
                ChunkedFlowSession
            max_tok = 512 + self.p.cfg.max_speech_tokens + 64
            ckey = ("cfs", token_hop, lookahead, max_tok, unet_window)
            if ckey not in shared:
                shared[ckey] = ChunkedFlowSession(
                    self.p.flow, self.p.flow_vars, self.p.noise,
                    token_hop=token_hop, lookahead=lookahead,
                    max_tokens=max_tok, window=unet_window)
            self.cfs = shared[ckey]
        if self.p.cfg.output_type == "mel":
            # HiFT keeps NSF source continuity across chunks via a spliced
            # source cache (reference: cli/model.py:285-319 + hift
            # generator.py:570-582); decode therefore re-runs the full mel
            # prefix each hop, like the reference's token2wav
            self._hift = jax.jit(
                lambda v, mel, src: self.p.hift.apply(v, mel,
                                                      cache_source=src))

    def synthesize_stream(self, text_tokens, prompt_text_tokens,
                          prompt_speech_tokens, prompt_feat, lm_spk,
                          flow_emb, key=None) -> Iterator[StreamChunk]:
        """One active stream per pipeline: the jitted programs are
        shared across sessions, but so are the decode carry and flow
        caches inside TokenStream/ChunkedFlowSession — interleaving two
        generators would silently clobber each other's state, so a
        second concurrent stream raises instead."""
        shared = self.p._session_shared
        if shared.get("_active"):
            raise RuntimeError(
                "another synthesize_stream generator is active on this "
                "pipeline; the shared TokenStream/ChunkedFlowSession "
                "carry state is per-utterance — exhaust or close() the "
                "other stream first (or use a separate pipeline)")
        shared["_active"] = True
        try:
            yield from self._synthesize_stream(
                text_tokens, prompt_text_tokens, prompt_speech_tokens,
                prompt_feat, lm_spk, flow_emb, key)
        finally:
            shared["_active"] = False

    def _synthesize_stream(self, text_tokens, prompt_text_tokens,
                           prompt_speech_tokens, prompt_feat, lm_spk,
                           flow_emb, key=None) -> Iterator[StreamChunk]:
        cfg = self.p.cfg
        key = key if key is not None else jax.random.PRNGKey(0)
        full_text = np.concatenate([prompt_text_tokens, text_tokens])
        src, tok, plen = llm_mod.build_inference_plan(
            full_text, prompt_speech_tokens,
            use_spk=cfg.lm.use_speaker_encoder)
        n_text = len(text_tokens)
        min_len = int(n_text * cfg.min_token_text_ratio)
        max_len = min(int(n_text * cfg.max_token_text_ratio),
                      cfg.max_speech_tokens)

        self._src_cache = None        # per-utterance HiFT source cache
        self._feat_buf = np.zeros((0, cfg.flow.output_size), np.float32)
        self._consumed = 0            # tokens already flowed (chunked mode)
        self._prefilled = False
        tokens: list[int] = []
        emitted_frames = 0            # latent frames already turned into audio
        prev_tail: Optional[np.ndarray] = None  # held-back overlap audio
        pending = 0                   # tokens since the last boundary
        gen = self.stream.generate(src, tok, plen, lm_spk, key,
                                   min_len, max_len)
        done = False
        while not done:
            tok_i = next(gen, None)
            if tok_i is None:
                done = True
            else:
                tokens.append(tok_i)
                pending += 1
            boundary = pending >= self.token_hop + self.lookahead
            if not (boundary or (done and tokens)):
                continue
            if done and not tokens:
                break
            finalize = done
            if self.chunked:
                feat = self._flow_chunk_cached(tokens, prompt_speech_tokens,
                                               prompt_feat, flow_emb,
                                               finalize)
            else:
                feat = self._flow_chunk(np.asarray(tokens, np.int32),
                                        prompt_speech_tokens, prompt_feat,
                                        flow_emb, finalize)
            chunk = feat[emitted_frames:]
            if chunk.shape[0] == 0:
                if finalize:
                    break
                pending -= self.token_hop
                continue
            if self.p.cfg.output_type == "mel":
                # full-prefix HiFT decode with source splice, then take the
                # samples belonging to the new frames
                if self._src_cache is None:
                    self._src_cache = jnp.zeros((1, 0, 1))
                wav_full, src = self._hift(self.p.codec_vars,
                                           jnp.asarray(feat[None]),
                                           self._src_cache)
                self._src_cache = None if finalize else src
                wav = np.asarray(wav_full).reshape(-1)[emitted_frames * 480:]
            else:
                if not hasattr(self.p, "_decode_pcm"):
                    dec = self.p._decode
                    self.p._decode_pcm = jax.jit(lambda v, f: jnp.clip(
                        dec.__wrapped__(v, f) * 32767.0, -32768.0,
                        32767.0).astype(jnp.int16))
                pcm = jax.device_get(self.p._decode_pcm(
                    self.p.codec_vars, jnp.asarray(chunk[None])))
                wav = pcm.reshape(-1).astype(np.float32) / 32767.0
            if prev_tail is not None and len(wav) >= self.overlap_samples:
                wav = fade_in_out(wav, prev_tail, self.window)
            if not finalize:
                prev_tail = wav[-self.overlap_samples:]
                emit = wav[: len(wav) - self.overlap_samples]
                emitted_frames = feat.shape[0] - self.overlap_frames
                pending -= self.token_hop
            else:
                emit = wav
            yield StreamChunk(audio=emit, tokens=len(tokens), final=finalize)
            if finalize:
                break

    def _flow_chunk_cached(self, tokens: list, prompt_tokens, prompt_feat,
                           flow_emb, finalize: bool) -> np.ndarray:
        """Incremental flow: only NEW tokens are processed each hop, against
        the persistent encoder/UNet caches (infer/stream_flow.py). Returns
        the accumulated generated-region feats, same contract as
        _flow_chunk."""
        look = self.lookahead
        if not self._prefilled:
            # force prompt feat to exactly ratio x prompt tokens, as the
            # reference frontend does (_extract_speech_feat,
            # cli/frontend.py:115-119 token_len = min(feat//2, token))
            ratio = self.p.cfg.token_latent_ratio
            plen = min(len(prompt_tokens), prompt_feat.shape[0] // ratio)
            self.cfs.prefill(np.asarray(prompt_tokens[:plen], np.int32),
                             np.asarray(prompt_feat[: ratio * plen],
                                        np.float32), flow_emb,
                             np.asarray(tokens[:look], np.int32))
            self._prefilled = True
        if finalize:
            rest = np.asarray(tokens[self._consumed:], np.int32)
            if len(rest):
                self._feat_buf = np.concatenate(
                    [self._feat_buf, self.cfs.final(rest)])
                self._consumed = len(tokens)
        else:
            c = self._consumed
            chunk = np.asarray(tokens[c: c + self.token_hop], np.int32)
            ctx = np.asarray(tokens[c + self.token_hop:
                                    c + self.token_hop + look], np.int32)
            self._feat_buf = np.concatenate(
                [self._feat_buf, self.cfs.step(chunk, ctx)])
            self._consumed = c + self.token_hop
        return self._feat_buf

    def _flow_chunk(self, gen_tokens, prompt_tokens, prompt_feat, flow_emb,
                    finalize: bool) -> np.ndarray:
        """Run the flow on prompt+generated tokens; non-final chunks hold
        back the lookahead tokens as encoder context
        (reference: flow.py:469-489)."""
        cfg = self.p.cfg
        all_tokens = np.concatenate([prompt_tokens, gen_tokens])
        tl = len(all_tokens)
        if finalize:
            from minimax_speech_tpu.infer.pipeline import next_bucket
            pad = next_bucket(tl)
        else:
            # exact length: the finalize=False path slices the REAL last
            # `lookahead` tokens as encoder context, which bucket padding
            # would corrupt. Chunk lengths step by token_hop, so the set of
            # compiled shapes is small and cached.
            pad = tl
        buf = np.zeros((1, pad), np.int32)
        buf[0, :tl] = all_tokens
        infer = self.p._flow_infer if finalize else self.p._flow_infer_stream
        feat = infer(
            self.p.flow_vars, jnp.asarray(buf), jnp.array([tl]),
            jnp.asarray(prompt_feat)[None].astype(jnp.float32),
            flow_emb, self.p.noise)
        body = tl - (0 if finalize else self.lookahead)
        n_valid = body * cfg.token_latent_ratio - prompt_feat.shape[0]
        return np.asarray(feat)[0, :max(n_valid, 0)]
