"""Bistream decoding: interleave STREAMING text input with speech output.

Replaces Qwen2LM.inference_bistream (reference:
speech/cosyvoice/llm/llm.py:762-861): text arrives as a generator of
token chunks; the LM context interleaves mix_ratio[0]=5 text tokens with
mix_ratio[1]=15 speech tokens, emitting a FILL token after each full
speech chunk; when the text stream ends, a TASK token is appended and
decoding runs to EOS.

The LM context grows by appending blocks to the preallocated KV cache
via SpeechLM.extend (jitted per block size — only a handful of static
shapes: 5, 15+pad, and the decode step), so the host loop does no
re-prefilling.
"""
from __future__ import annotations

from functools import partial
from typing import Generator, Iterator

import jax
import jax.numpy as jnp
import numpy as np

from minimax_speech_tpu.models import llm as llm_mod
from minimax_speech_tpu.models import qwen2
from minimax_speech_tpu.ops import sampling as sampling_ops


class BistreamDecoder:
    def __init__(self, model: llm_mod.SpeechLM, variables,
                 max_steps: int = 768):
        self.model = model
        self.variables = variables
        self.max_steps = max_steps
        self._extend = jax.jit(partial(model.apply,
                                       method=llm_mod.SpeechLM.extend))
        self._embed_text = jax.jit(partial(
            model.apply, method=llm_mod.SpeechLM.embed_text_token))
        self._embed_speech = jax.jit(partial(
            model.apply, method=llm_mod.SpeechLM.embed_speech_token))
        self._embed_plan = jax.jit(partial(
            model.apply, method=llm_mod.SpeechLM.embed_plan))
        self._run_burst = jax.jit(self._run_burst_impl,
                                  static_argnames=("n", "allow_eos"))

    def _run_burst_impl(self, v, carry, fill_at, n: int, allow_eos: bool):
        """Up to n sample+extend steps in ONE dispatch (each host step
        pays the ~28 ms tunnel RTT — see session.TokenStream). fill_at:
        step index where a fill token is FORCED (-1 = never). A fill
        (or EOS when allow_eos) stops the run; later steps no-op."""
        cfg = self.model.cfg
        eos, fill = cfg.eos_token, cfg.fill_token
        model = self.model

        def body(c, i):
            key, logits, cache, valid, recent, slot, pos, stopped = c
            key, k1 = jax.random.split(key)
            logp = jax.nn.log_softmax(logits[0].astype(jnp.float32))
            ids = jnp.arange(logp.shape[-1])
            logp = jnp.where((ids > eos) & (ids != fill), -jnp.inf, logp)
            if not allow_eos:
                logp = jnp.where(ids == eos, -jnp.inf, logp)
            sampled = sampling_ops.ras_sample(
                k1, logp, recent, cfg.top_p, cfg.top_k, cfg.ras_win,
                cfg.ras_tau).astype(jnp.int32)
            forced = fill_at == i
            tok = jnp.where(forced, fill, sampled)
            recent = jnp.where(stopped | forced,
                               recent, sampling_ops.push_recent(
                                   recent, tok))
            if allow_eos:
                stop_tok = tok == eos      # final decode: run to EOS
                skip_tok = tok > eos       # stray fill: resample next step
            else:
                stop_tok = tok >= eos      # chunk decode: fill ends the run
                skip_tok = jnp.bool_(False)
            out = jnp.where(stopped, -1, tok)
            do_ext = ~(stopped | stop_tok | skip_tok)

            def ext(ops):
                logits_, cache_, valid_ = ops
                emb = model.apply(
                    v, jnp.clip(tok, 0, eos - 1)[None, None],
                    method=llm_mod.SpeechLM.embed_speech_token)
                return model.apply(v, emb, pos[None, None], jnp.array([1]),
                                   valid_, cache_, slot,
                                   method=llm_mod.SpeechLM.extend)

            logits, cache, valid = jax.lax.cond(
                do_ext, ext, lambda ops: ops, (logits, cache, valid))
            slot = slot + do_ext.astype(jnp.int32)
            pos = pos + do_ext.astype(jnp.int32)
            stopped = stopped | stop_tok
            return (key, logits, cache, valid, recent, slot, pos,
                    stopped), out

        carry, outs = jax.lax.scan(body, carry, jnp.arange(n))
        return carry, outs

    def generate(self, text_chunks: Iterator[np.ndarray],
                 prompt_text: np.ndarray, prompt_speech: np.ndarray,
                 spk_emb, key) -> Generator[int, None, None]:
        cfg = self.model.cfg
        n_text, n_speech = cfg.mix_ratio
        eos, fill = cfg.eos_token, cfg.fill_token
        v = self.variables
        max_len = self.max_steps

        cache = qwen2.make_cache(cfg.qwen, 1, max_len + 512)
        k_total = cache[0].shape[2]
        valid = jnp.zeros((1, k_total), bool)
        slot = 0
        pos = 0
        logits = None

        def append(emb, n_true):
            nonlocal cache, valid, slot, pos, logits
            n = emb.shape[1]
            positions = pos + jnp.arange(n)[None]
            logits, cache, valid = self._extend(
                v, emb, positions, jnp.array([n_true]), valid, cache,
                slot)
            slot += n_true
            pos += n_true

        # [sos] (+ speaker conditioning slot, matching the trained layout)
        sos = self._embed_plan(v, jnp.full((1, 1), llm_mod.SRC_SPECIAL),
                               jnp.full((1, 1), llm_mod.SOS_EOS_ID), spk_emb)
        append(sos, 1)
        if cfg.use_speaker_encoder:
            spk_block = self._embed_plan(
                v, jnp.full((1, 1), llm_mod.SRC_SPK),
                jnp.zeros((1, 1), jnp.int32), spk_emb)
            append(spk_block, 1)

        text_cache = list(map(int, prompt_text))
        speech_prompt = list(map(int, prompt_speech))
        out_tokens: list[int] = []
        recent = jnp.full((cfg.ras_win,), -1, jnp.int32)
        next_fill = -1

        def append_text(toks):
            emb = self._embed_text(v, jnp.asarray([toks], jnp.int32))
            append(emb, len(toks))

        def append_speech(toks):
            emb = self._embed_speech(v, jnp.asarray([toks], jnp.int32))
            append(emb, len(toks))

        text_done = False
        text_iter = iter(text_chunks)
        while not text_done:
            chunk = next(text_iter, None)
            if chunk is None:
                text_done = True
                break
            text_cache.extend(map(int, chunk))
            # interleave prompt speech with prompt text 5:15
            while speech_prompt and len(text_cache) >= n_text:
                append_text(text_cache[:n_text])
                append_speech(speech_prompt[:n_speech])
                text_cache = text_cache[n_text:]
                speech_prompt = speech_prompt[n_speech:]
            if speech_prompt:
                continue  # need more text before decoding
            # after each full speech chunk (fill emitted), append 5 more text
            need_text = ((out_tokens and out_tokens[-1] == fill)
                         or (not out_tokens))
            if need_text:
                if len(text_cache) < n_text:
                    continue
                append_text(text_cache[:n_text])
                text_cache = text_cache[n_text:]
            # decode until the chunk's fill token, bursting n_speech+1
            # sample+extend steps per device dispatch
            while len(out_tokens) < max_len:
                fill_at = (next_fill - len(out_tokens)
                           if next_fill != -1 else -1)
                carry = (key, logits, cache, valid, recent,
                         jnp.int32(slot), jnp.int32(pos), jnp.bool_(False))
                carry, outs = self._run_burst(
                    v, carry, jnp.int32(fill_at), n=n_speech + 1,
                    allow_eos=False)
                key, logits, cache, valid, recent, slot_d, pos_d, _ = carry
                outs, slot, pos = jax.device_get((outs, slot_d, pos_d))
                slot, pos = int(slot), int(pos)
                hit_fill = False
                for tok in (int(t) for t in outs if t >= 0):
                    if len(out_tokens) >= max_len:
                        break
                    if tok == fill:
                        next_fill = len(out_tokens) + n_speech + 1
                    out_tokens.append(tok)
                    if tok >= eos:
                        hit_fill = True
                        break  # fill -> fetch more text
                    yield tok
                if hit_fill:
                    break

        # final: flush remaining text + task id, decode to EOS
        if text_cache:
            append_text(text_cache)
        task = self._embed_plan(v, jnp.full((1, 1), llm_mod.SRC_SPECIAL),
                                jnp.full((1, 1), llm_mod.TASK_ID), spk_emb)
        append(task, 1)
        while len(out_tokens) < max_len:
            carry = (key, logits, cache, valid, recent,
                     jnp.int32(slot), jnp.int32(pos), jnp.bool_(False))
            carry, outs = self._run_burst(v, carry, jnp.int32(-1),
                                          n=n_speech + 1, allow_eos=True)
            key, logits, cache, valid, recent, slot_d, pos_d, _ = carry
            outs, slot, pos = jax.device_get((outs, slot_d, pos_d))
            slot, pos = int(slot), int(pos)
            got_eos = False
            for tok in (int(t) for t in outs if t >= 0):
                if len(out_tokens) >= max_len:
                    break
                out_tokens.append(tok)
                if tok == eos:
                    got_eos = True
                    break
                if tok > eos:
                    continue  # stray fill in final decode: skip
                yield tok
            if got_eos:
                break
