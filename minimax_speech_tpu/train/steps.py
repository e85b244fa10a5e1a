"""Sharded training steps for the LM and flow stages.

Replaces the reference Executor/DDP loop
(reference: speech/cosyvoice/utils/executor.py:47-126 +
train_utils.py:307-449): one jitted step does forward, backward,
clip, optimizer update, and metric extraction. Data parallelism comes
from batch sharding over the mesh 'dp' axis; tensor parallelism from
the param rules in parallel/mesh.py; grad all-reduce and collective
placement are XLA's (GSPMD) from the NamedSharding annotations.

Per-component grad norms (the reference logs encoder/decoder/estimator
norms separately, train_utils.py:366-447) are computed inside the step
from the grad pytree at negligible cost.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from minimax_speech_tpu.parallel import mesh as mesh_lib
from minimax_speech_tpu.utils.params_io import cast_floats as _cast_floats


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(step=self.step + 1,
                            params=optax.apply_updates(self.params, updates),
                            opt_state=new_opt)


def make_train_state(params, tx, mesh=None, kind: str = "lm") -> TrainState:
    """Build TrainState; when a mesh is given, place params under their
    TP/replication shardings and create opt_state inside jit so the adam
    moments inherit the same layouts (ZeRO-equivalent by construction)."""
    if mesh is not None:
        shardings = mesh_lib.param_shardings(mesh, params, kind)
        params = jax.jit(lambda p: p, out_shardings=shardings)(params)
        opt_shape = jax.eval_shape(tx.init, params)
        opt_sh = mesh_lib.opt_state_shardings(mesh, opt_shape, shardings)
        opt_state = jax.jit(tx.init, out_shardings=opt_sh)(params)
    else:
        opt_state = tx.init(params)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=opt_state, tx=tx)


def grad_norms_by_component(grads, groups: dict[str, str]):
    """L2 norms per named component; groups maps name -> path substring
    (e.g. {'encoder': 'encoder', 'estimator': 'estimator'})."""
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    out = {}
    for name, needle in groups.items():
        sq = 0.0
        for path, leaf in flat:
            p = "/".join(str(getattr(k, "key", k)) for k in path)
            if needle in p:
                sq = sq + jnp.sum(jnp.square(leaf))
        out[f"grad_norm/{name}"] = jnp.sqrt(sq)
    return out


def make_lm_loss_fn(model, bf16: bool = False):
    """Shared train/cv loss: plan CE+acc with in-step speaker encoding.

    bf16=True runs the forward/backward in bfloat16 (params stay fp32 in
    the optimizer; norms/softmax still accumulate fp32 inside the
    modules) — the flowae trainer's autocast equivalent
    (reference: flowae/trainers/audio_ldm_trainer.py:56-137)."""

    def loss_fn(params, batch):
        if bf16:
            params = _cast_floats(params, jnp.bfloat16)
            batch = _cast_floats(batch, jnp.bfloat16)
        variables = {"params": params}
        if "reference_mel" in batch:
            # speaker encoder trains jointly with the LM (the reference
            # computes conditioning inside forward, llm.py:544-548)
            mask = None
            if "reference_mel_len" in batch:
                t = batch["reference_mel"].shape[1]
                mask = (jnp.arange(t)[None]
                        < batch["reference_mel_len"][:, None])
            spk = model.apply(variables, batch["reference_mel"], mask,
                              method=type(model).embed_speaker)
        else:
            spk = batch["spk_emb"]
        loss, acc = model.apply(variables, batch["src_type"],
                                batch["tok_id"], batch["target"],
                                batch["seq_len"], spk)
        return loss, acc

    return loss_fn


def make_lm_train_step(model, norm_groups=None, bf16: bool = False):
    """Returns step(state, batch) -> (state, metrics). batch holds the
    plan tensors (src_type, tok_id, target, seq_len) + spk_emb or
    reference_mel."""
    groups = norm_groups or {"llm": "llm/", "decoder": "llm_decoder",
                             "speech_emb": "speech_embedding"}
    loss_fn = make_lm_loss_fn(model, bf16=bf16)

    def step(state: TrainState, batch):
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch)
        new_state = state.apply_gradients(grads)
        metrics = {"loss": loss, "acc": acc,
                   "grad_norm": optax.global_norm(grads),
                   **grad_norms_by_component(grads, groups)}
        return new_state, metrics

    return step


def make_flow_loss_fn(model, bf16: bool = False):
    """Shared train/cv loss for the flow stage."""

    def loss_fn(params, batch, key):
        if bf16:
            params = _cast_floats(params, jnp.bfloat16)
            batch = _cast_floats(batch, jnp.bfloat16)
        variables = {"params": params}
        if "reference_mel" in batch:
            mask = None
            if "reference_mel_len" in batch:
                t = batch["reference_mel"].shape[1]
                mask = (jnp.arange(t)[None]
                        < batch["reference_mel_len"][:, None])
            emb = model.apply(variables, batch["reference_mel"], mask,
                              method=type(model).embed_speaker)
            if getattr(model.cfg, "freeze_speaker_encoder", True):
                # flow keeps the (LLM-trained) speaker encoder frozen
                # (reference: flow.py:315-321, config freeze_speaker_encoder)
                emb = jax.lax.stop_gradient(emb)
        else:
            emb = batch["embedding"]
        loss = model.apply(variables, batch["token"],
                           batch["token_len"], batch["feat"],
                           batch["feat_len"], emb, key)
        return loss

    return loss_fn


def make_flow_train_step(model, norm_groups=None, bf16: bool = False):
    """batch: token, token_len, feat, feat_len + embedding or
    reference_mel; key drives CFM noise/immiscible/CFG dropout."""
    groups = norm_groups or {"encoder": "encoder", "estimator": "estimator"}
    loss_fn = make_flow_loss_fn(model, bf16=bf16)

    def step(state: TrainState, batch, key):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch, key)
        new_state = state.apply_gradients(grads)
        metrics = {"loss": loss, "grad_norm": optax.global_norm(grads),
                   **grad_norms_by_component(grads, groups)}
        return new_state, metrics

    return step


def jit_step(step_fn):
    """jit a train step with buffer donation; shardings propagate from the
    placed state (make_train_state) and the dp-sharded batch
    (device_put(batch, mesh_lib.batch_sharding(mesh)))."""
    return jax.jit(step_fn, donate_argnums=(0,))
