"""Training-step throughput benchmark on one chip (production geometry).

The reference's headline performance numbers are training wall-clocks
(TRAINING_GUIDE.md:215-217: LLM stage 2-3 d on 1x4090 / 6-8 h on
8xA100). This measures our per-step time and derived throughput so those
can be compared directly:

  PYTHONPATH=. python scripts/bench_train.py [--stage llm|flow|both]
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parents[1]))

import numpy as np

V5E_BF16_PEAK = 197e12


def xla_flops(jitted, *args, **kwargs):
    """Analytic FLOP count of one compiled step from XLA's cost model.

    Hand-counting conv/attention FLOPs for the UNet/conformer stacks is
    error-prone; the compiler already knows. Returns None if the backend
    does not expose cost analysis."""
    try:
        cost = jitted.lower(*args, **kwargs).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost["flops"])
    except Exception:
        return None


def mfu_str(flops, dt, peak=V5E_BF16_PEAK):
    if not flops:
        return "MFU n/a (no cost analysis)"
    return (f"MFU {flops / dt / peak * 100:.1f}% of "
            f"{peak / 1e12:.0f} TFLOP/s ({flops / 1e9:.1f} GFLOP/step)")


def bench_llm(batch, seq, bf16=False, remat=False, remat_policy="none"):
    import jax
    import jax.numpy as jnp

    from minimax_speech_tpu.models import llm as llm_mod
    from minimax_speech_tpu.train import schedule, steps

    import dataclasses
    cfg = llm_mod.LMConfig()
    if remat:
        cfg = dataclasses.replace(
            cfg, qwen=dataclasses.replace(cfg.qwen, remat=True,
                                          remat_policy=remat_policy))
    model = llm_mod.SpeechLM(cfg)
    variables = jax.jit(llm_mod.init_lm_variables,
                        static_argnums=0)(model, jax.random.PRNGKey(0))
    tx = schedule.make_optimizer(lr=5e-5, warmup_steps=500)
    state = steps.make_train_state(variables["params"], tx)
    step = steps.jit_step(steps.make_lm_train_step(model, bf16=bf16))

    rng = np.random.default_rng(0)
    plan = llm_mod.build_lm_plan(
        [rng.integers(0, 150000, 20) for _ in range(batch)],
        [rng.integers(0, 6561, seq - 30) for _ in range(batch)],
        bistream_flags=[False] * batch, pad_to=seq)
    b = {k: np.asarray(v) for k, v in plan.items()}
    b["spk_emb"] = np.zeros((batch, cfg.llm_input_size), np.float32)
    import jax.numpy as jnp
    b = {k: jnp.asarray(v) for k, v in b.items()}

    state, m = step(state, b)
    # Force REAL completion with a device->host fetch: on the axon tunnel
    # backend block_until_ready can return after dispatch-ack, which made
    # an earlier revision of this bench report a physically impossible
    # 2.23M tokens/s (25x over the v5e 197-TFLOP bf16 ceiling for this
    # model). Only a D2H of a value that data-depends on the whole chain
    # is a trustworthy barrier.
    jax.device_get(m["loss"])
    t0 = time.perf_counter()
    n = 10
    for _ in range(n):
        state, m = step(state, b)
    jax.device_get(m["loss"])  # depends on every prior step via `state`
    dt = (time.perf_counter() - t0) / n
    toks = batch * seq
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree.leaves(state.params))
    n_embed = cfg.qwen.vocab_size * cfg.qwen.hidden_size
    flops = 6 * (n_params - n_embed) * toks  # fwd+bwd matmul FLOPs
    peak = V5E_BF16_PEAK if bf16 else V5E_BF16_PEAK / 4
    print(f"llm train step: batch={batch} seq={seq} bf16={bf16} "
          f"remat={remat} remat_policy={remat_policy} -> "
          f"{dt * 1e3:.1f} ms/step, "
          f"{toks / dt / 1e3:.1f}k tokens/s, "
          f"MFU {flops / dt / peak * 100:.1f}% of "
          f"{peak / 1e12:.0f} TFLOP/s", flush=True)
    return dt, toks


def bench_flow(batch, tokens):
    import jax
    import jax.numpy as jnp

    from minimax_speech_tpu.models.flow import (FlowConfig, FlowModel,
                                                init_flow_variables)
    from minimax_speech_tpu.train import schedule, steps

    cfg = FlowConfig()
    model = FlowModel(cfg)
    variables = jax.jit(init_flow_variables, static_argnums=0)(
        model, jax.random.PRNGKey(0))
    tx = schedule.make_optimizer(lr=5e-5, warmup_steps=500)
    state = steps.make_train_state(variables["params"], tx)
    step = steps.jit_step(steps.make_flow_train_step(model))

    rng = np.random.default_rng(0)
    b = {"token": jnp.asarray(rng.integers(0, 6561, (batch, tokens))),
         "token_len": jnp.full((batch,), tokens, np.int32),
         "feat": jnp.asarray(rng.standard_normal(
             (batch, tokens * 2, 80)).astype(np.float32)),
         "feat_len": jnp.full((batch,), tokens * 2, np.int32),
         "embedding": jnp.zeros((batch, cfg.spk_embed_dim))}
    state, m = step(state, b, jax.random.PRNGKey(1))
    jax.device_get(m["loss"])  # real completion barrier (see bench_llm)
    flops = xla_flops(step, state, b, jax.random.PRNGKey(2))
    t0 = time.perf_counter()
    n = 10
    for _ in range(n):
        state, m = step(state, b, jax.random.PRNGKey(2))
    jax.device_get(m["loss"])
    dt = (time.perf_counter() - t0) / n
    frames = batch * tokens * 2
    audio_s = frames / 50.0
    print(f"flow train step: batch={batch} tokens={tokens} -> "
          f"{dt * 1e3:.1f} ms/step, {frames / dt / 1e3:.1f}k frames/s "
          f"({audio_s / dt:.0f}x realtime audio consumption), "
          f"{mfu_str(flops, dt)}", flush=True)
    return dt, frames


def bench_dac(batch, samples=24000):
    import jax
    import jax.numpy as jnp

    from minimax_speech_tpu.models.dac_vae import (DACVAE, DACVAEConfig)
    from minimax_speech_tpu.models.discriminators import DACDiscriminator
    from minimax_speech_tpu.train import gan_steps, schedule, steps

    gen = DACVAE(DACVAEConfig())
    disc = DACDiscriminator()
    key = jax.random.PRNGKey(0)
    audio = jnp.asarray(np.random.default_rng(0).standard_normal(
        (batch, samples)).astype(np.float32) * 0.1)
    # same init conventions as cli/train_dac.py:78-79
    g_vars = jax.jit(gen.init)(key, audio[..., None])
    d_vars = jax.jit(disc.init)(key, audio)
    tx = schedule.make_optimizer(lr=1e-4, warmup_steps=100)
    g_state = steps.make_train_state(g_vars["params"], tx)
    d_state = steps.make_train_state(d_vars["params"], tx)
    gen_step, disc_step = gan_steps.make_dac_steps(gen, disc)
    gen_step = jax.jit(gen_step, donate_argnums=0)
    disc_step = jax.jit(disc_step, donate_argnums=0)
    b = {"audio": audio}

    d_state, dm = disc_step(d_state, g_state.params, b, key)
    g_state, gm = gen_step(g_state, d_state.params, b, key)
    jax.device_get(gm["gen/loss"])
    g_flops = xla_flops(gen_step, g_state, d_state.params, b, key)
    d_flops = xla_flops(disc_step, d_state, g_state.params, b, key)
    t0 = time.perf_counter()
    n = 5
    for _ in range(n):
        d_state, dm = disc_step(d_state, g_state.params, b, key)
        g_state, gm = gen_step(g_state, d_state.params, b, key)
    jax.device_get(gm["gen/loss"])
    dt = (time.perf_counter() - t0) / n
    audio_s = batch * samples / 24000.0
    flops = (g_flops + d_flops) if (g_flops and d_flops) else None
    print(f"dac train step (gen+disc): batch={batch} samples={samples} -> "
          f"{dt * 1e3:.1f} ms/step, {audio_s / dt:.1f}x realtime audio, "
          f"{mfu_str(flops, dt)}", flush=True)
    return dt, audio_s


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--stage", default="both",
                   choices=["llm", "flow", "dac", "both", "all"])
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--seq", type=int, default=512)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--remat", action="store_true")
    p.add_argument("--remat_policy", default="none",
                   choices=["none", "dots"])
    args = p.parse_args()
    if args.remat_policy != "none" and not args.remat:
        p.error("--remat_policy has no effect without --remat; pass "
                "--remat (a policy-only run would silently time the "
                "no-remat configuration)")
    if args.stage in ("llm", "both", "all"):
        bench_llm(args.batch, args.seq, args.bf16, args.remat,
                  args.remat_policy)
    if args.stage in ("flow", "both", "all"):
        bench_flow(args.batch, 250)
    if args.stage in ("dac", "all"):
        bench_dac(min(args.batch, 8))


if __name__ == "__main__":
    main()
