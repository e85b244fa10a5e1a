"""Measure the e2e RTF delta from running the CFM flow in bfloat16.

Same harness as bench.py (fused single dispatch, median of 5), run
twice: cfg.bf16_flow off (shipped default) and on. Decides whether the
default flips — alongside the quality gate from the trained-model
overfit eval (flow_nmse must not regress).

Usage: bash scripts/tpu_run.sh scripts/bench_bf16_flow.py
"""
from __future__ import annotations

import dataclasses
import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

GEN_TOKENS, TEXT_LEN, PROMPT_SECONDS = 125, 12, 3.0


def measure(bf16: bool) -> dict:
    import jax
    import jax.numpy as jnp

    from minimax_speech_tpu.infer import pipeline as pl

    cfg = pl.TTSConfig(max_speech_tokens=GEN_TOKENS, bf16_flow=bf16)
    cfg.lm = dataclasses.replace(
        cfg.lm, qwen=dataclasses.replace(cfg.lm.qwen, quantized=True))
    pipe = pl.TTSPipeline.from_random(cfg, jax.random.PRNGKey(0))

    from minimax_speech_tpu.utils.params_io import cast_floats
    pipe.lm_vars = cast_floats(pipe.lm_vars, jnp.bfloat16)

    rng = np.random.default_rng(1986)
    sr16 = np.arange(int(16000 * PROMPT_SECONDS)) / 16000
    p16 = (0.5 * np.sin(2 * np.pi * 220 * sr16)).astype(np.float32)
    sr24 = np.arange(int(24000 * PROMPT_SECONDS)) / 24000
    p24 = (0.5 * np.sin(2 * np.pi * 220 * sr24)).astype(np.float32)
    ptok = pipe.extract_prompt_tokens(p16)
    plat = pipe.extract_prompt_latent(p24)
    pmel = pipe.extract_prompt_mel(p24)
    lm_spk, femb = pipe.speaker_embedding(pmel)
    lm_spk = lm_spk.astype(jnp.bfloat16)

    text = rng.integers(0, 150000, TEXT_LEN)
    ptext = rng.integers(0, 150000, 4)
    cfg.min_token_text_ratio = GEN_TOKENS / TEXT_LEN
    cfg.max_token_text_ratio = GEN_TOKENS / TEXT_LEN

    def run(key):
        return pipe.synthesize_fused(text, ptext, ptok, plat, lm_spk,
                                     femb, key=key, return_timings=True)

    wav, _ = run(jax.random.PRNGKey(1))  # compile
    results = []
    for i in range(5):
        wav, tim = run(jax.random.PRNGKey(2 + i))
        results.append(tim)
    results.sort(key=lambda t: t["total_s"])
    med = results[len(results) // 2]
    return {"rtf": med["total_s"] / med["audio_s"],
            "total_s": med["total_s"], "audio_s": med["audio_s"],
            "wav_std": float(np.std(wav))}


def main():
    from minimax_speech_tpu.utils.compile_cache import \
        enable_persistent_compile_cache
    enable_persistent_compile_cache()
    out = {}
    for bf16 in (False, True):
        m = measure(bf16)
        out["bf16" if bf16 else "fp32"] = {k: round(v, 5)
                                           for k, v in m.items()}
        print(("bf16" if bf16 else "fp32"), m, flush=True)
    speedup = out["fp32"]["rtf"] / out["bf16"]["rtf"]
    print(json.dumps({"metric": "bf16_flow_speedup",
                      "value": round(speedup, 4), "detail": out}))


if __name__ == "__main__":
    main()
