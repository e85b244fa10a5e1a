"""Training-loop tests: sharded LM/flow steps, loss decreases, executor +
checkpoint roundtrip, optimizer-state sharding on the 8-device mesh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from minimax_speech_tpu.models import llm as llm_mod
from minimax_speech_tpu.models import qwen2
from minimax_speech_tpu.models.flow import FlowModel, init_flow_variables
from minimax_speech_tpu.models.speaker_encoder import SpeakerEncoderConfig
from minimax_speech_tpu.parallel import mesh as mesh_lib
from minimax_speech_tpu.train import schedule, steps
from minimax_speech_tpu.train.checkpoint import CheckpointManager
from minimax_speech_tpu.train.executor import Executor
from minimax_speech_tpu.utils.logging import MetricsLogger
from tests.test_flow_stack import SMALL_FLOW
from tests.test_llm import SMALL_LM


def lm_batch(rng, b=4, pad_to=64):
    plan = llm_mod.build_lm_plan(
        [rng.integers(0, 90, 4) for _ in range(b)],
        [rng.integers(0, 40, 10) for _ in range(b)],
        bistream_flags=[False] * b, eos=40, fill=42, pad_to=pad_to)
    return {k: jnp.asarray(v) for k, v in plan.items()} | {
        "spk_emb": jnp.zeros((b, 32))}


def test_lm_train_step_loss_decreases(rng):
    model = llm_mod.SpeechLM(SMALL_LM)
    variables = llm_mod.init_lm_variables(model, jax.random.PRNGKey(0))
    tx = schedule.make_optimizer(lr=3e-3, warmup_steps=1)
    state = steps.make_train_state(variables["params"], tx)
    step = steps.jit_step(steps.make_lm_train_step(model))
    batch = lm_batch(rng)
    losses = []
    for _ in range(8):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]
    assert float(metrics["grad_norm/llm"]) >= 0


def test_flow_train_step(rng):
    model = FlowModel(SMALL_FLOW)
    variables = init_flow_variables(model, jax.random.PRNGKey(0))
    tx = schedule.make_optimizer(lr=1e-3, warmup_steps=1)
    state = steps.make_train_state(variables["params"], tx)
    step = steps.jit_step(steps.make_flow_train_step(model))
    b, tt = 2, 8
    batch = {"token": jnp.asarray(rng.integers(0, 50, (b, tt))),
             "token_len": jnp.array([8, 6]),
             "feat": jnp.asarray(rng.standard_normal((b, 16, 8)), jnp.float32),
             "feat_len": jnp.array([16, 12]),
             "embedding": jnp.zeros((b, 192))}
    losses = []
    for i in range(4):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()


def test_mesh_sharded_lm_step(rng):
    """dp=4 x tp=2 mesh: kernels sharded over tp, adam moments follow."""
    mesh = mesh_lib.make_mesh(dp=4, tp=2)
    model = llm_mod.SpeechLM(SMALL_LM)
    variables = llm_mod.init_lm_variables(model, jax.random.PRNGKey(0))
    tx = schedule.make_optimizer(lr=1e-3, warmup_steps=1)
    state = steps.make_train_state(variables["params"], tx, mesh, kind="lm")

    qproj = state.params["llm"]["layers_0"]["self_attn"]["q_proj"]["kernel"]
    assert "tp" in str(qproj.sharding.spec)
    mu = state.opt_state[1][0].mu  # chain(clip, adamw) -> adamw state
    mu_q = mu["llm"]["layers_0"]["self_attn"]["q_proj"]["kernel"]
    assert "tp" in str(mu_q.sharding.spec), "ZeRO-like moment sharding lost"

    batch = jax.device_put(lm_batch(rng, b=8),
                           mesh_lib.batch_sharding(mesh))
    step = steps.jit_step(steps.make_lm_train_step(model))
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))


def test_executor_and_checkpoint(rng, tmp_path):
    model = llm_mod.SpeechLM(SMALL_LM)
    variables = llm_mod.init_lm_variables(model, jax.random.PRNGKey(0))
    tx = schedule.make_optimizer(lr=1e-3, warmup_steps=1)
    state = steps.make_train_state(variables["params"], tx)
    step = steps.jit_step(steps.make_lm_train_step(model))
    logger = MetricsLogger(str(tmp_path), log_interval=2)
    ckpt = CheckpointManager(str(tmp_path / "ckpt"))
    ex = Executor(step, state, logger, ckpt, save_per_step=3)
    batches = [lm_batch(rng) for _ in range(5)]
    state = ex.train_one_epoch(batches)
    assert int(state.step) == 5
    ckpt.save(5, state)
    ckpt.wait()

    # fresh state restores step + params
    state2 = steps.make_train_state(variables["params"], tx)
    state2, step_restored = ckpt.restore(state2)
    assert step_restored == 5
    p1 = jax.tree_util.tree_leaves(state.params)[0]
    p2 = jax.tree_util.tree_leaves(state2.params)[0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2))


def test_sharded_checkpoint_roundtrip(rng, tmp_path):
    """Orbax must save/restore a TP-sharded TrainState on the mesh."""
    mesh = mesh_lib.make_mesh(dp=4, tp=2)
    model = llm_mod.SpeechLM(SMALL_LM)
    variables = llm_mod.init_lm_variables(model, jax.random.PRNGKey(0))
    tx = schedule.make_optimizer(lr=1e-3, warmup_steps=1)
    state = steps.make_train_state(variables["params"], tx, mesh, kind="lm")
    step = steps.jit_step(steps.make_lm_train_step(model))
    batch = jax.device_put(lm_batch(rng, b=8), mesh_lib.batch_sharding(mesh))
    state, _ = step(state, batch)

    ckpt = CheckpointManager(str(tmp_path / "ckpt"))
    ckpt.save(1, state)
    ckpt.wait()
    state2 = steps.make_train_state(variables["params"], tx, mesh, kind="lm")
    state2, restored = ckpt.restore(state2)
    assert restored == 1
    q1 = state.params["llm"]["layers_0"]["self_attn"]["q_proj"]["kernel"]
    q2 = state2.params["llm"]["layers_0"]["self_attn"]["q_proj"]["kernel"]
    np.testing.assert_allclose(np.asarray(q1), np.asarray(q2))
    # sharding preserved on restore target
    assert "tp" in str(q2.sharding.spec)


def test_grad_accumulation(rng):
    """optax.MultiSteps: params only change every accum_steps updates and
    match a single big-batch step."""
    model = llm_mod.SpeechLM(SMALL_LM)
    variables = llm_mod.init_lm_variables(model, jax.random.PRNGKey(0))
    tx = schedule.make_optimizer(lr=1e-3, warmup_steps=1, accum_steps=2)
    state = steps.make_train_state(variables["params"], tx)
    step = steps.jit_step(steps.make_lm_train_step(model))
    batch = lm_batch(rng)
    p0 = np.asarray(jax.tree_util.tree_leaves(state.params)[0]).copy()
    state, _ = step(state, batch)
    p1 = np.asarray(jax.tree_util.tree_leaves(state.params)[0])
    np.testing.assert_array_equal(p0, p1)  # first micro-step: no update
    state, _ = step(state, batch)
    p2 = np.asarray(jax.tree_util.tree_leaves(state.params)[0])
    assert np.abs(p2 - p0).max() > 0  # update applied after 2 micro-steps


def test_bf16_training_step(rng):
    """bf16 compute path: grads/params stay fp32 in the optimizer, loss
    tracks the fp32 loss."""
    model = llm_mod.SpeechLM(SMALL_LM)
    variables = llm_mod.init_lm_variables(model, jax.random.PRNGKey(0))
    tx = schedule.make_optimizer(lr=1e-3, warmup_steps=1)
    batch = lm_batch(rng)
    # copy params per state: jit_step donates its state argument
    params_a = jax.tree_util.tree_map(jnp.array, variables["params"])
    params_b = jax.tree_util.tree_map(jnp.array, variables["params"])
    s32 = steps.make_train_state(params_a, tx)
    step32 = steps.jit_step(steps.make_lm_train_step(model))
    _, m32 = step32(s32, batch)

    s16 = steps.make_train_state(params_b, tx)
    step16 = steps.jit_step(steps.make_lm_train_step(model, bf16=True))
    s16, m16 = step16(s16, batch)
    assert abs(float(m16["loss"]) - float(m32["loss"])) < 0.1
    leaf = jax.tree_util.tree_leaves(s16.params)[0]
    assert leaf.dtype == jnp.float32


def test_checkpoint_failures_nonfatal(rng, tmp_path, monkeypatch):
    """A failed periodic save must not kill training (observed: orbax
    async signaling timeout under IO contention), and restore must walk
    back past a partially-written latest step."""
    import orbax.checkpoint as ocp

    model = llm_mod.SpeechLM(SMALL_LM)
    variables = llm_mod.init_lm_variables(model, jax.random.PRNGKey(0))
    tx = schedule.make_optimizer(lr=1e-3, warmup_steps=1)
    state = steps.make_train_state(variables["params"], tx)

    ckpt = CheckpointManager(str(tmp_path / "ckpt"))
    ckpt.save(1, state)
    ckpt.wait()

    # save failure: log-and-continue, manager recreated and usable
    def boom(*a, **k):
        raise TimeoutError("step_directory_creation")
    monkeypatch.setattr(type(ckpt.mngr), "save", boom)
    ckpt.save(2, state)          # must not raise
    monkeypatch.undo()
    ckpt.save(3, state)          # recreated manager still works
    ckpt.wait()

    # corrupt the latest snapshot: restore falls back to step 1
    import shutil
    latest = sorted((tmp_path / "ckpt").iterdir())[-1]
    for f in (latest / "default").rglob("*"):
        if f.is_file():
            f.write_bytes(b"corrupt")
            break
    ckpt2 = CheckpointManager(str(tmp_path / "ckpt"))
    state2 = steps.make_train_state(variables["params"], tx)
    state2, restored = ckpt2.restore(state2)
    assert restored in (1, 3)    # never crashes, lands on a good step


def test_remat_policy_value_parity(rng):
    """remat and its checkpoint policy change memory/compute, not values:
    loss and grads must be bit-comparable across none/full/dots."""
    import dataclasses

    batch = lm_batch(rng)
    results = {}
    for name, (remat, policy) in {
        "plain": (False, "none"),
        "full": (True, "none"),
        "dots": (True, "dots"),
    }.items():
        cfg = dataclasses.replace(
            SMALL_LM, qwen=dataclasses.replace(
                SMALL_LM.qwen, remat=remat, remat_policy=policy))
        model = llm_mod.SpeechLM(cfg)
        variables = llm_mod.init_lm_variables(model, jax.random.PRNGKey(0))
        tx = schedule.make_optimizer(lr=3e-3, warmup_steps=1)
        state = steps.make_train_state(variables["params"], tx)
        step = steps.jit_step(steps.make_lm_train_step(model))
        _, metrics = step(state, batch)
        results[name] = (float(metrics["loss"]),
                         float(metrics["grad_norm/llm"]))
    for name in ("full", "dots"):
        np.testing.assert_allclose(results[name][0], results["plain"][0],
                                   rtol=1e-6)
        np.testing.assert_allclose(results[name][1], results["plain"][1],
                                   rtol=1e-4)


def test_remat_policy_typo_raises(rng):
    """A misspelled remat_policy must fail loudly, not silently run the
    full-recompute configuration (would invalidate throughput A/Bs)."""
    import dataclasses

    cfg = dataclasses.replace(
        SMALL_LM, qwen=dataclasses.replace(
            SMALL_LM.qwen, remat=True, remat_policy="dot"))
    model = llm_mod.SpeechLM(cfg)
    with pytest.raises(ValueError, match="remat_policy"):
        llm_mod.init_lm_variables(model, jax.random.PRNGKey(0))
