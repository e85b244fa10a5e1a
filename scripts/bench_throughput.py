"""Throughput benchmark: batched serving on one chip.

Measures audio-seconds synthesized per wall-second at batch sizes 1..N
via infer/serving.py (static batching). The AR decode is
weight-streaming-bound, so throughput should scale near-linearly with
batch until the MXU saturates.

  PYTHONPATH=. python scripts/bench_throughput.py [--batches 1,4,8]
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="1,4,8")
    ap.add_argument("--gen_tokens", type=int, default=125)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from minimax_speech_tpu.infer import pipeline as pl
    from minimax_speech_tpu.infer.serving import BatchSynthesizer, Request

    cfg = pl.TTSConfig(max_speech_tokens=args.gen_tokens)
    cfg.min_token_text_ratio = args.gen_tokens / 12
    cfg.max_token_text_ratio = args.gen_tokens / 12
    pipe = pl.TTSPipeline.from_random(cfg, jax.random.PRNGKey(0))
    pipe.lm_vars = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
        pipe.lm_vars)
    synth = BatchSynthesizer(pipe)

    rng = np.random.default_rng(0)
    t16 = np.arange(int(16000 * 2.0)) / 16000
    prompt16 = (0.5 * np.sin(2 * np.pi * 220 * t16)).astype(np.float32)
    t24 = np.arange(int(24000 * 2.0)) / 24000
    prompt24 = (0.5 * np.sin(2 * np.pi * 220 * t24)).astype(np.float32)
    ptoks = pipe.extract_prompt_tokens(prompt16)
    plat = pipe.extract_prompt_latent(prompt24)
    pmel = pipe.extract_prompt_mel(prompt24)
    lm_spk, femb = pipe.speaker_embedding(pmel)
    lm_spk = np.asarray(lm_spk.astype(jnp.bfloat16))[0]
    femb = np.asarray(femb)[0]

    def make_req():
        return Request(text_tokens=rng.integers(0, 150000, 12),
                       prompt_text_tokens=rng.integers(0, 150000, 4),
                       prompt_speech_tokens=ptoks, prompt_feat=plat,
                       lm_spk=lm_spk, flow_emb=femb)

    for b in [int(x) for x in args.batches.split(",")]:
        reqs = [make_req() for _ in range(b)]
        synth.synthesize_batch(reqs, key=jax.random.PRNGKey(1))  # warmup
        t0 = time.perf_counter()
        wavs, tim = synth.synthesize_batch(reqs, key=jax.random.PRNGKey(2),
                                           return_timings=True)
        dt = time.perf_counter() - t0
        audio_s = sum(len(w) for w in wavs) / 24000
        print(f"batch={b}: {audio_s:.1f}s audio in {dt:.3f}s "
              f"-> throughput {audio_s / dt:.1f}x realtime "
              f"(fused dispatch {tim['e2e_s']:.3f}s "
              f"host {tim['host_s']:.3f}s)", flush=True)


if __name__ == "__main__":
    main()
