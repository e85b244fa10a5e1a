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

        def decode_one(k1, ignore_eos: bool):
            nonlocal recent
            logp = jax.nn.log_softmax(logits[0].astype(jnp.float32))
            ids = jnp.arange(logp.shape[-1])
            # bistream allows the FILL token; mask eos while ignore_eos
            logp = jnp.where((ids > eos) & (ids != fill), -jnp.inf, logp)
            if ignore_eos:
                logp = jnp.where(ids == eos, -jnp.inf, logp)
            tok = int(sampling_ops.ras_sample(k1, logp, recent, cfg.top_p,
                                              cfg.top_k, cfg.ras_win,
                                              cfg.ras_tau))
            recent = sampling_ops.push_recent(recent, jnp.int32(tok))
            return tok

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
            # decode until the chunk's fill token
            while len(out_tokens) < max_len:
                key, k1 = jax.random.split(key)
                if next_fill != -1 and len(out_tokens) == next_fill:
                    tok = fill
                else:
                    tok = decode_one(k1, ignore_eos=True)
                if tok == fill:
                    next_fill = len(out_tokens) + n_speech + 1
                out_tokens.append(tok)
                if tok >= eos:
                    break  # fill -> fetch more text
                yield tok
                append_speech([tok])

        # final: flush remaining text + task id, decode to EOS
        if text_cache:
            append_text(text_cache)
        task = self._embed_plan(v, jnp.full((1, 1), llm_mod.SRC_SPECIAL),
                                jnp.full((1, 1), llm_mod.TASK_ID), spk_emb)
        append(task, 1)
        while len(out_tokens) < max_len:
            key, k1 = jax.random.split(key)
            tok = decode_one(k1, ignore_eos=False)
            out_tokens.append(tok)
            if tok == eos:
                break
            if tok > eos:
                continue
            yield tok
            append_speech([tok])
