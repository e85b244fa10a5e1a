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


def staggered(pipe, make_req, n_req: int, interval_s: float,
              gen_tokens: int, slots: int = 4):
    """Continuous batching vs window batching under STAGGERED arrivals:
    per-request completion latency (from its own arrival) and total
    wall time. Continuous admits arrivals into the running decode; the
    window scheduler can only start a request after the current batch
    finishes (reference comparison target: vLLM engine vs static
    batching, speech/cosyvoice/llm/llm.py:715-743)."""
    import jax

    from minimax_speech_tpu.infer.continuous import ContinuousBatcher

    arrivals = [(i * interval_s, make_req()) for i in range(n_req)]

    # -- continuous ---------------------------------------------------------
    cb = ContinuousBatcher(pipe, slots=slots, key=jax.random.PRNGKey(3))
    # warmup compiles (one short request)
    wid = cb.submit(make_req())
    while cb.busy():
        cb.tick()
    t0 = time.perf_counter()
    clock = lambda: time.perf_counter() - t0
    first, final = {}, {}
    arrive = {id(r): t for t, r in arrivals}
    rid2arr = {}
    pending = list(arrivals)
    i = 0
    while i < len(pending) or cb.busy():
        now = clock()
        while i < len(pending) and pending[i][0] <= now:
            rid = cb.submit(pending[i][1])
            rid2arr[rid] = pending[i][0]
            i += 1
        if not cb.busy():
            time.sleep(0.001)
            continue
        for ev in cb.tick():
            if ev.stream not in rid2arr:
                continue
            t = clock() - rid2arr[ev.stream]
            if len(ev.audio) and ev.stream not in first:
                first[ev.stream] = t
            if ev.final:
                final[ev.stream] = t
    cont_wall = clock()
    cont_first = np.mean(list(first.values()))
    cont_final = np.mean(list(final.values()))

    # -- window (static batch per window; late arrivals wait) ---------------
    from minimax_speech_tpu.infer.serving import BatchSynthesizer
    synth = BatchSynthesizer(pipe)
    synth.synthesize_batch([make_req()], key=jax.random.PRNGKey(4))  # warm
    t0 = time.perf_counter()
    clock = lambda: time.perf_counter() - t0
    done_at = {}
    i = 0
    while i < len(arrivals):
        now = clock()
        if arrivals[i][0] > now:
            time.sleep(arrivals[i][0] - now)
        # batch = everything that has arrived by the time we start
        now = clock()
        batch = []
        while i < len(arrivals) and arrivals[i][0] <= now:
            batch.append(arrivals[i])
            i += 1
        synth.synthesize_batch([r for _, r in batch],
                               key=jax.random.PRNGKey(5 + i))
        t = clock()
        for at, r in batch:
            done_at[id(r)] = t - at
    win_wall = clock()
    win_final = np.mean(list(done_at.values()))

    print(f"staggered({n_req} req @ {interval_s}s, {gen_tokens} tok): "
          f"continuous first-audio {cont_first:.3f}s "
          f"final {cont_final:.3f}s wall {cont_wall:.2f}s | "
          f"window final {win_final:.3f}s wall {win_wall:.2f}s",
          flush=True)
    return {"cont_first_s": float(cont_first),
            "cont_final_s": float(cont_final),
            "cont_wall_s": float(cont_wall),
            "win_final_s": float(win_final),
            "win_wall_s": float(win_wall)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="1,4,8")
    ap.add_argument("--gen_tokens", type=int, default=125)
    ap.add_argument("--staggered", type=int, default=0,
                    help="N staggered requests for the continuous-vs-"
                         "window comparison (0 = skip)")
    ap.add_argument("--interval", type=float, default=0.1)
    ap.add_argument("--slots", type=int, default=4)
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

    if args.staggered:
        staggered(pipe, make_req, args.staggered, args.interval,
                  args.gen_tokens, slots=args.slots)
        return

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
