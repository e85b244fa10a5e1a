"""Where does the decode step's overhead go? (STATUS gap: full loop body
~0.55 ms/step vs ~0.18 ms bare decode_step.)

Times N-step scans of ablated loop bodies in ONE dispatch each (so the
tunnel RTT amortizes away) on the production LM geometry:

  bare      decode_step only (embedding fed back, no sampling)
  argmax    + log_softmax + masks + argmax feedback (no RNG, no top-k)
  topk      + top_k nucleus (gumbel from PREGENERATED noise)
  pregen    full RAS semantics, all noise pregenerated outside the scan
  current   full RAS semantics with per-step jax.random.split (shipped)

Usage: bash scripts/tpu_run.sh scripts/bench_decode_variants.py
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp

from minimax_speech_tpu import config as cfg_lib
from minimax_speech_tpu.models import llm as llm_mod
from minimax_speech_tpu.models import qwen2
from minimax_speech_tpu.ops import sampling as sampling_ops

N_STEPS = 128
P = 64  # prompt bucket


def build():
    cfg = cfg_lib.load_tts_config(str(REPO / "configs/default.yaml")).lm
    model = llm_mod.SpeechLM(cfg)
    key = jax.random.PRNGKey(0)
    src = np.zeros((1, P), np.int32)
    src[0, 0] = llm_mod.SRC_SPECIAL
    tok = np.zeros((1, P), np.int32)
    variables = model.init(key, jnp.asarray(src), jnp.asarray(tok),
                           jnp.asarray(tok), jnp.array([P]),
                           jnp.zeros((1, cfg.llm_input_size)))
    return cfg, model, variables


def make_variant(cfg, model, variables, kind: str):
    eos = cfg.eos_token

    def apply(method, *args):
        return model.apply(variables, *args, method=method)

    def prefill(key):
        src = jnp.zeros((1, P), jnp.int32).at[0, 0].set(llm_mod.SRC_SPECIAL)
        tok = jnp.zeros((1, P), jnp.int32)
        emb = apply(llm_mod.SpeechLM.embed_plan, src, tok,
                    jnp.zeros((1, cfg.llm_input_size)))
        cache = qwen2.make_cache(cfg.qwen, 1, P + N_STEPS, emb.dtype)
        pad = jnp.arange(P)[None] < 4
        positions = jnp.broadcast_to(jnp.arange(P)[None], (1, P))
        hidden, cache = apply(llm_mod.SpeechLM.prefill, emb, pad,
                              positions, cache)
        logits = apply(lambda m, h: m.llm_decoder(h), hidden[:, 3])
        valid = jnp.concatenate([pad, jnp.zeros((1, N_STEPS), bool)], 1)
        return logits, cache, valid

    def run(key):
        logits, cache, valid = prefill(key)
        # pregenerated noise: one fused RNG op for the whole burst,
        # keyed by absolute step (burst-partition invariant)
        steps = jnp.arange(N_STEPS)
        keys = jax.vmap(lambda s: jax.random.fold_in(key, s))(steps)
        g_top = jax.vmap(lambda k: jax.random.gumbel(
            k, (cfg.top_k,)))(keys)
        g_full = jax.vmap(
            lambda k: jax.random.gumbel(
                jax.random.fold_in(k, 1),
                (cfg.speech_token_size + 3,)))(keys)

        def body(c, xs):
            key, logits, cache, valid, recent, step = c
            g_t, g_f = xs
            logp = jax.nn.log_softmax(logits[0].astype(jnp.float32))
            ids = jnp.arange(logp.shape[-1])
            logp = jnp.where(ids > eos, -jnp.inf, logp)

            if kind == "bare":
                tok = jnp.int32(7)
            elif kind == "argmax":
                tok = jnp.argmax(logp).astype(jnp.int32)
            elif kind == "topk":
                probs = jnp.exp(logp - jax.nn.logsumexp(logp))
                tv, ti = jax.lax.top_k(probs, cfg.top_k)
                keep = (jnp.cumsum(tv) - tv) < cfg.top_p
                kept = jnp.log(jnp.where(keep, tv, 1e-30))
                tok = ti[jnp.argmax(kept + g_t)].astype(jnp.int32)
            elif kind == "pregen":
                probs = jnp.exp(logp - jax.nn.logsumexp(logp))
                tv, ti = jax.lax.top_k(probs, cfg.top_k)
                keep = (jnp.cumsum(tv) - tv) < cfg.top_p
                kept = jnp.log(jnp.where(keep, tv, 1e-30))
                top = ti[jnp.argmax(kept + g_t)].astype(jnp.int32)
                rep = jnp.sum(recent == top)
                fallback = jnp.argmax(logp + g_f).astype(jnp.int32)
                tok = jnp.where(rep >= cfg.ras_win * cfg.ras_tau,
                                fallback, top)
            else:  # current
                key, k1 = jax.random.split(key)
                tok = sampling_ops.ras_sample(
                    k1, logp, recent, cfg.top_p, cfg.top_k, cfg.ras_win,
                    cfg.ras_tau).astype(jnp.int32)

            recent = jnp.concatenate([recent[1:], tok[None]])
            emb1 = apply(llm_mod.SpeechLM.embed_speech_token,
                         jnp.clip(tok, 0, eos - 1)[None, None])
            pos = jnp.full((1,), P + step, jnp.int32)
            logits, cache, valid = apply(llm_mod.SpeechLM.decode_step,
                                         emb1, pos, valid, cache, P + step)
            return (key, logits, cache, valid, recent, step + 1), tok

        recent0 = jnp.full((cfg.ras_win,), -1, jnp.int32)
        (_, logits, *_), toks = jax.lax.scan(
            body, (key, logits, cache, valid, recent0, jnp.int32(0)),
            (g_top, g_full), length=N_STEPS)
        return toks.sum() + logits.sum()

    return jax.jit(run)


def main():
    from minimax_speech_tpu.utils.compile_cache import \
        enable_persistent_compile_cache
    enable_persistent_compile_cache()

    cfg, model, variables = build()
    out = {}
    for kind in ("bare", "argmax", "topk", "pregen", "current"):
        fn = make_variant(cfg, model, variables, kind)
        # device_get, not block_until_ready: on the axon tunnel the
        # latter can return at dispatch-ack, before the computation has
        # actually finished — only a D2H fetch is a trustworthy barrier.
        jax.device_get(fn(jax.random.PRNGKey(1)))  # compile
        ts = []
        for i in range(5):
            t0 = time.perf_counter()
            jax.device_get(fn(jax.random.PRNGKey(i)))
            ts.append(time.perf_counter() - t0)
        ms = 1e3 * float(np.median(ts)) / N_STEPS
        out[kind] = round(ms, 4)
        print(f"{kind:8s} {ms:.4f} ms/step")
    import json
    print(json.dumps({"metric": "decode_ms_per_step", "variants": out}))


if __name__ == "__main__":
    main()
