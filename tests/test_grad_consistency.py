"""Autodiff <-> finite-difference consistency guards.

Round-4 diagnosis: the DAC overfit stage diverged on the TPU because the
axon backend's backward pass for deep conv stacks is numerically wrong
(CPU f32 grad == f64 grad with cosine 1.000, while the TPU grad had
cosine ~0.5 and 2x-smaller norm against that golden gradient, and
TPU training ROSE in loss at warmup learning rates).

These tests pin the property the diagnosis relied on, on the CPU
backend: moving parameters along -grad reduces the loss by
eps * |g|^2 (ratio ~ 1 for small eps). If a model change (custom vjp,
nondifferentiable op, stop_gradient misuse) breaks the backward, the
ratio collapses and this catches it — the same probe that localized the
TPU backend bug.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from minimax_speech_tpu import config as cfg_lib
from minimax_speech_tpu.models import dac_vae


def _fd_ratio(loss_fn, params, eps):
    """(actual loss drop) / (eps * |grad|^2) when stepping along -grad."""
    l0 = float(loss_fn(params))
    g = jax.jit(jax.grad(loss_fn))(params)
    gn2 = float(sum(jnp.sum(jnp.square(x)) for x in jax.tree.leaves(g)))
    p1 = jax.tree.map(lambda a, b: a - eps * b, params, g)
    l1 = float(loss_fn(p1))
    return (l0 - l1) / (eps * gn2), gn2


def test_dac_gen_loss_grad_descends():
    cfg = cfg_lib.load_tts_config("configs/tiny.yaml")
    gen = dac_vae.DACVAE(cfg.dac)
    n = cfg.dac.hop_length * 6
    gv = jax.jit(gen.init)(jax.random.PRNGKey(0), jnp.zeros((1, n, 1)))
    rng = np.random.default_rng(0)
    audio = (0.2 * np.sin(2 * np.pi * 440 * np.arange(2 * n) / 24000)
             + 0.05 * rng.standard_normal(2 * n)).astype(
                 np.float32).reshape(2, n)

    def loss_fn(p):
        out = gen.apply({"params": p}, audio[..., None], None)
        return jnp.abs(out["audio"][..., 0] - audio).mean() * 50.0

    lf = jax.jit(loss_fn)
    ratio, gn2 = _fd_ratio(lf, gv["params"], eps=1e-4)
    assert gn2 > 0.0
    # exact autodiff of a smooth loss: first-order prediction holds
    assert ratio == pytest.approx(1.0, abs=0.25), ratio


def test_flow_loss_grad_descends():
    from minimax_speech_tpu.models.flow import FlowModel, init_flow_variables
    cfg = cfg_lib.load_tts_config("configs/tiny.yaml")
    model = FlowModel(cfg.flow)
    variables = jax.jit(init_flow_variables, static_argnums=0)(
        model, jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    tokens = 8
    batch = {
        "token": jnp.asarray(rng.integers(0, 6561, (2, tokens))),
        "token_len": jnp.full((2,), tokens, jnp.int32),
        "feat": jnp.asarray(rng.standard_normal(
            (2, tokens * 2, cfg.flow.output_size)).astype(np.float32)),
        "feat_len": jnp.full((2,), tokens * 2, jnp.int32),
        "embedding": jnp.zeros((2, cfg.flow.spk_embed_dim)),
    }

    def loss_fn(p):
        out = model.apply({"params": p}, batch["token"],
                          batch["token_len"], batch["feat"],
                          batch["feat_len"], batch["embedding"],
                          jax.random.PRNGKey(3))
        return out["loss"] if isinstance(out, dict) else out

    lf = jax.jit(loss_fn)
    ratio, gn2 = _fd_ratio(lf, variables["params"], eps=1e-5)
    assert gn2 > 0.0
    assert ratio == pytest.approx(1.0, abs=0.3), ratio
