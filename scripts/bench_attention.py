"""Flash-attention vs XLA attention at production shapes (v5e).

VERDICT round-1 #8: the Pallas kernel must earn its place — measure at
the shapes the bench path actually uses (flow UNet chunk attention at
T 256-1024, conformer prefill, long-form 2k-4k) and record the table.

Run: bash scripts/tpu_run.sh scripts/bench_attention.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from minimax_speech_tpu.kernels.flash_attention import (flash_attention,
                                                        reference_attention)


def timeit(fn, q, k, v, n=32):
    """Chain n applications inside ONE compiled program (q fed from the
    previous output) so the tunnel dispatch floor doesn't drown the
    kernel time."""
    import functools

    @functools.partial(jax.jit, static_argnames=())
    def chained(q, k, v):
        def body(x, _):
            return fn(x, k, v).astype(q.dtype), None
        out, _ = jax.lax.scan(body, q, None, length=n)
        return out

    out = chained(q, k, v)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(3):
        out = chained(q, k, v)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / (3 * n) * 1e3  # ms per application


def main():
    print(f"backend={jax.default_backend()}")
    rows = []
    cases = [
        # (name, B, H, T, D, chunk, left, causal, dtype)
        ("unet_flow_T256", 2, 8, 256, 64, 50, -1, False, jnp.bfloat16),
        ("unet_flow_T512", 2, 8, 512, 64, 50, -1, False, jnp.bfloat16),
        ("unet_flow_T1024", 2, 8, 1024, 64, 50, -1, False, jnp.bfloat16),
        ("unet_window_T1024", 2, 8, 1024, 64, 50, 2, False, jnp.bfloat16),
        ("conformer_prefill_T512", 2, 8, 512, 64, 0, -1, False, jnp.bfloat16),
        ("lm_prefill_T512", 1, 14, 512, 64, 0, -1, True, jnp.bfloat16),
        ("lm_prefill_T1024", 1, 14, 1024, 64, 0, -1, True, jnp.bfloat16),
        ("longform_T2048", 2, 8, 2048, 64, 50, 2, False, jnp.bfloat16),
        ("longform_T4096", 2, 8, 4096, 64, 50, 2, False, jnp.bfloat16),
        ("longform_dense_T4096", 2, 8, 4096, 64, 50, -1, False, jnp.bfloat16),
    ]
    for name, b, h, t, d, chunk, left, causal, dt in cases:
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(k1, (b, h, t, d), dt)
        k = jax.random.normal(k2, (b, h, t, d), dt)
        v = jax.random.normal(k3, (b, h, t, d), dt)
        kv_len = jnp.full((b,), t, jnp.int32)

        def fl(q, k, v):
            return flash_attention(q, k, v, kv_len=kv_len, chunk=chunk,
                                   left_chunks=left, causal=causal)

        xla = jax.jit(lambda q, k, v: reference_attention(
            q, k, v, kv_len=kv_len, chunk=chunk, left_chunks=left,
            causal=causal))
        xla_fn = lambda q, k, v: reference_attention(
            q, k, v, kv_len=kv_len, chunk=chunk, left_chunks=left,
            causal=causal)
        ms_fl = timeit(fl, q, k, v)
        ms_xla = timeit(xla_fn, q, k, v)
        err = float(jnp.max(jnp.abs(
            fl(q, k, v).astype(jnp.float32)
            - xla(q, k, v).astype(jnp.float32))))
        speedup = ms_xla / ms_fl
        rows.append((name, ms_fl, ms_xla, speedup, err))
        print(f"{name:26s} flash {ms_fl:7.3f} ms  xla {ms_xla:7.3f} ms  "
              f"speedup {speedup:5.2f}x  maxerr {err:.3e}", flush=True)

    wins = sum(1 for r in rows if r[3] > 1.05)
    print(f"\nflash wins (>5%): {wins}/{len(rows)}")

    # -- TRAINING (fwd+bwd): splash vs XLA ---------------------------------
    # (the custom pallas kernel is fwd-only; splash ships both passes)
    from minimax_speech_tpu.kernels.splash import splash_chunk_attention
    print("\ntraining fwd+bwd (grad wrt q,k,v):")
    for name, b, h, t, d, chunk, left, causal, dt in cases:
        if causal or chunk == 0:
            continue  # flow-training shapes only
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(k1, (b, h, t, d), dt)
        k = jax.random.normal(k2, (b, h, t, d), dt)
        v = jax.random.normal(k3, (b, h, t, d), dt)
        kv_len = jnp.full((b,), t, jnp.int32)

        def mk(fn):
            def loss(q, k, v):
                return jnp.sum(fn(q, k, v).astype(jnp.float32) ** 2)
            g = jax.grad(loss, argnums=(0, 1, 2))

            def step(q, k, v):
                gq, gk, gv = g(q, k, v)
                return (q + 1e-6 * gq.astype(q.dtype)), None
            # chain like timeit: q fed forward so nothing is DCE'd
            return lambda q, k, v: step(q, k, v)[0]

        sp = mk(lambda q, k, v: splash_chunk_attention(
            q, k, v, kv_len=kv_len, chunk=chunk, left_chunks=left))
        xl = mk(lambda q, k, v: reference_attention(
            q, k, v, kv_len=kv_len, chunk=chunk, left_chunks=left))
        ms_sp = timeit(sp, q, k, v, n=8)
        ms_xl = timeit(xl, q, k, v, n=8)
        print(f"{name:26s} splash {ms_sp:7.3f} ms  xla {ms_xl:7.3f} ms  "
              f"speedup {ms_xl / ms_sp:5.2f}x", flush=True)


if __name__ == "__main__":
    main()
