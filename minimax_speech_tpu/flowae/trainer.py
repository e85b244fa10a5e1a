"""flowae trainer: bf16 train step + EMA renderer + eval.

Reference: flowae/trainers/audio_ldm_trainer.py:56-744 + base_trainer.py
(bfloat16 autocast step, EMA on the renderer, AE eval via render-and-
compare). The DDP/NCCL machinery maps to the shared mesh utilities.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax

from minimax_speech_tpu.flowae.dito import DiToAudio, dito_decode
from minimax_speech_tpu.train.steps import TrainState


def ema_update(ema_params, params, decay: float = 0.9999):
    return jax.tree_util.tree_map(
        lambda e, p: e * decay + p.astype(e.dtype) * (1 - decay),
        ema_params, params)


def make_dito_step(model: DiToAudio, kl_weight: float = 1e-4,
                   zaug_p: float = 0.1, ema_decay: float = 0.9999,
                   bf16: bool = True):
    """Returns step(state, ema_params, batch{'audio': (B,T,1)}, key)."""

    def step(state: TrainState, ema_params, batch, key):
        audio = batch["audio"]
        if bf16:
            audio = audio.astype(jnp.bfloat16)

        def loss_fn(params):
            rec, kl, _ = model.apply({"params": params}, audio, key,
                                     zaug_p, method=DiToAudio.loss)
            return rec + kl_weight * kl, {"rec": rec, "kl": kl}

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        state = state.apply_gradients(grads)
        ema_params = ema_update(ema_params, state.params, ema_decay)
        return state, ema_params, {"loss": loss,
                                   "grad_norm": optax.global_norm(grads),
                                   **aux}

    return step


def eval_reconstruction(model: DiToAudio, variables, audio, key,
                        n_steps: Optional[int] = None):
    """Encode -> sample -> MSE/SNR (reference: audio_ldm_trainer.py
    AE eval, :298-558)."""
    z, mu, _ = model.apply(variables, audio, method=DiToAudio.encode)
    rec = dito_decode(model, variables, mu, audio.shape[1], key, n_steps)
    mse = jnp.mean((rec - audio) ** 2)
    sig = jnp.mean(audio ** 2)
    snr = 10.0 * jnp.log10(jnp.maximum(sig, 1e-12)
                           / jnp.maximum(mse, 1e-12))
    return {"eval/mse": mse, "eval/snr_db": snr}
