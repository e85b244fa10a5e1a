"""Streaming per-hop latency: chunked caches vs full-prefix rerun.

Measures the flow+vocoder cost per 25-token hop as the session grows —
the chunked path (infer/stream_flow.py) must stay FLAT while the
full-prefix path (the reference's token2wav behavior,
cli/model.py:285-319) grows with the prefix length.

Run on the TPU:  bash scripts/tpu_run.sh scripts/bench_stream.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from minimax_speech_tpu.infer import pipeline as pl
from minimax_speech_tpu.infer.stream_flow import ChunkedFlowSession

HOP, LOOK = 25, 3
N_HOPS = 12
PROMPT = 75


def main():
    print("backend:", jax.default_backend())
    cfg = pl.TTSConfig()
    pipe = pl.TTSPipeline.from_random(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    prompt_tokens = rng.integers(0, 6561, PROMPT).astype(np.int32)
    prompt_feat = rng.standard_normal((2 * PROMPT, 80)).astype(np.float32)
    emb = jnp.asarray(rng.standard_normal((1, 192)), jnp.float32)
    gen = rng.integers(0, 6561, N_HOPS * HOP + LOOK).astype(np.int32)

    # ---- chunked path ----
    s = ChunkedFlowSession(pipe.flow, pipe.flow_vars, pipe.noise,
                           token_hop=HOP, lookahead=LOOK,
                           max_tokens=1024, window=100)
    t0 = time.perf_counter()
    s.prefill(prompt_tokens, prompt_feat, emb, gen[:LOOK])
    jax.block_until_ready(s._enc_cache["kv1"][0])
    t_prefill = time.perf_counter() - t0
    hops = []
    for k in range(N_HOPS):
        chunk = gen[k * HOP: (k + 1) * HOP]
        ctx = gen[(k + 1) * HOP: (k + 1) * HOP + LOOK]
        t0 = time.perf_counter()
        f = s.step(chunk, ctx)
        hops.append(time.perf_counter() - t0)
    print(f"chunked: prefill {t_prefill*1e3:.1f} ms; hops (ms): "
          + " ".join(f"{h*1e3:.0f}" for h in hops))
    # skip the first 2 hops (compile)
    steady = hops[2:]
    print(f"chunked steady per-hop: median {np.median(steady)*1e3:.1f} ms, "
          f"first {steady[0]*1e3:.1f}, last {steady[-1]*1e3:.1f}")

    # ---- full-prefix rerun (reference behavior) ----
    full_times = []
    for k in range(1, N_HOPS + 1):
        toks = np.concatenate([prompt_tokens, gen[: k * HOP + LOOK]])
        tl = len(toks)
        pad = pl.next_bucket(tl)
        buf = np.zeros((1, pad), np.int32)
        buf[0, :tl] = toks
        t0 = time.perf_counter()
        out = pipe._flow_infer_stream(
            pipe.flow_vars, jnp.asarray(buf), jnp.array([tl]),
            jnp.asarray(prompt_feat)[None], emb, pipe.noise)
        jax.block_until_ready(out)
        full_times.append(time.perf_counter() - t0)
    # rerun once more at the largest size for a compile-free number
    t0 = time.perf_counter()
    out = pipe._flow_infer_stream(
        pipe.flow_vars, jnp.asarray(buf), jnp.array([tl]),
        jnp.asarray(prompt_feat)[None], emb, pipe.noise)
    jax.block_until_ready(out)
    t_last = time.perf_counter() - t0
    print(f"full-prefix per-hop (ms, incl. compiles): "
          + " ".join(f"{h*1e3:.0f}" for h in full_times))
    print(f"full-prefix hop at T={tl} tokens (cached compile): "
          f"{t_last*1e3:.1f} ms")
    print(f"speedup at hop {N_HOPS}: {t_last / np.median(steady):.2f}x")


if __name__ == "__main__":
    main()
