"""Batched serving: multi-request synthesis on one chip.

The TPU answer to the reference's vLLM serving path
(reference: cli/model.py:274-283 + llm/llm.py:715-743): instead of a
paged-attention engine, requests are decoded TOGETHER in one jitted
batched lax.while_loop (per-sample prompt lengths, min/max bounds, and
EOS tracking are already batched in models/llm.py:generate), then the
flow and codec run batched with ragged prompt masks. The AR decode is
HBM-bandwidth-bound on the 0.5B weights, so batching B streams costs
nearly the same wall-clock as one — throughput scales ~linearly with B
until the MXU saturates.

BatchSynthesizer = static batching (collect B requests, run one batch).
A continuous-batching scheduler can sit on top by re-invoking with the
active set each window.
"""
from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from minimax_speech_tpu.infer.pipeline import TTSPipeline, next_bucket
from minimax_speech_tpu.models import llm as llm_mod


@dataclass
class Request:
    text_tokens: np.ndarray
    prompt_text_tokens: np.ndarray
    prompt_speech_tokens: np.ndarray
    prompt_feat: np.ndarray          # (Tp_i, 80)
    lm_spk: np.ndarray               # (C,)
    flow_emb: np.ndarray             # (192,)


class BatchSynthesizer:
    def __init__(self, pipeline: TTSPipeline):
        self.p = pipeline

    def synthesize_batch(self, requests: Sequence[Request], key=None,
                         return_timings: bool = False):
        """Run B requests in one batched decode. Returns list of wavs."""
        cfg = self.p.cfg
        n_real = len(requests)
        # pad the batch dim to a power-of-two bucket: warm_serving
        # compiles {1,2,4,...,max_batch}, so an arbitrary arrival count
        # (e.g. 3 requests in one window) reuses a warmed executable
        # instead of cold-compiling a new batch shape mid-request
        requests = list(requests)
        while len(requests) & (len(requests) - 1):
            requests.append(requests[-1])
        b = len(requests)
        key = key if key is not None else jax.random.PRNGKey(0)
        t0 = time.perf_counter()

        # --- batched LM plan -------------------------------------------------
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
                            for r in requests], np.int32)
        max_len = np.array([min(int(len(r.text_tokens)
                                    * cfg.max_token_text_ratio),
                                cfg.max_speech_tokens)
                            for r in requests], np.int32)

        # prompt tokens + features, padded once
        pt_pad = next_bucket(max(len(r.prompt_speech_tokens)
                                 for r in requests),
                             buckets=(16, 32, 64, 128, 256))
        ptoks = np.zeros((b, pt_pad), np.int32)
        ptl = np.zeros((b,), np.int32)
        for i, r in enumerate(requests):
            ptoks[i, : len(r.prompt_speech_tokens)] = r.prompt_speech_tokens
            ptl[i] = len(r.prompt_speech_tokens)
        pf_max = next_bucket(max(r.prompt_feat.shape[0] for r in requests),
                             buckets=(16, 32, 64, 128, 256))
        pf = np.zeros((b, pf_max, cfg.flow.output_size), np.float32)
        pfl = np.zeros((b,), np.int32)
        for i, r in enumerate(requests):
            pf[i, : r.prompt_feat.shape[0]] = r.prompt_feat
            pfl[i] = r.prompt_feat.shape[0]
        femb = jnp.asarray(np.stack([r.flow_emb for r in requests]))

        # whole batch through the ONE-dispatch fused program
        # (LM decode -> compact -> flow -> codec -> device-side int16
        # PCM; pipeline._e2e_fused is batch-generic)
        pcm, count = self.p._e2e_fused(
            self.p.lm_vars, self.p.flow_vars, self.p.codec_vars,
            jnp.asarray(src), jnp.asarray(tok), jnp.asarray(plen), spk,
            key, jnp.asarray(min_len), jnp.asarray(max_len),
            jnp.asarray(ptoks), jnp.asarray(ptl), jnp.asarray(pf),
            jnp.asarray(pfl), femb, self.p.noise)
        pcm, count = jax.device_get((pcm, count))
        t1 = time.perf_counter()

        # NOTE: the fused program slices each row at ITS OWN
        # prompt-feature offset before the transfer, so row i starts at
        # request i's generated region already
        wavs = []
        for i in range(n_real):
            n = int(count[i]) * cfg.token_latent_ratio * 480
            wavs.append(pcm[i, :n].astype(np.float32) / 32767.0)
        t3 = time.perf_counter()

        if return_timings:
            # the LM+flow+codec all run in ONE fused dispatch, so only
            # the combined device time is observable
            audio_s = sum(len(w) for w in wavs) / cfg.sample_rate
            return wavs, {"e2e_s": t1 - t0, "host_s": t3 - t1,
                          "total_s": t3 - t0, "audio_s": audio_s,
                          "tokens": [int(c) for c in count[:n_real]]}
        return wavs
