"""Chunked streaming flow: O(chunk) work per 25-token hop.

Replaces the per-hop full-prefix rerun (reference behavior:
cli/model.py:285-319 re-enters flow.inference with ALL accumulated
tokens every hop, so an utterance costs O(T^2)) with incremental
computation against persistent caches — the TPU-native equivalent of
BaseEncoder.forward_chunk's att_cache/cnn_cache (reference:
speech/cosyvoice/transformer/encoder.py:184-274), extended through the
CFM solver: the upsample-conformer keeps preallocated KV caches, and
the UNet estimator keeps sliding-window KV + causal-conv tail caches
PER EULER STEP, so each hop's 10-step ODE solve touches only the new
chunk's frames.

Chunk grid: unit 0 = the prompt, unit k = the k-th 25-token hop
(ops/masks.py:unit_chunk_mask). Outputs are exactly reproducible by a
full-sequence pass with the same grid (FlowModel streaming with
chunk_align/unit_align — see tests/test_stream_flow.py).

Everything is static-shape: one compile for prefill (per prompt
bucket), one for the steady-state hop, one for the final ragged hop.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from minimax_speech_tpu.models import cfm
from minimax_speech_tpu.models.flow import (FlowModel, latent_denormalize,
                                            latent_normalize)
from minimax_speech_tpu.models.upsample_encoder import make_encoder_cache


# re-exported for backward compatibility; see utils/compile_cache.py
from minimax_speech_tpu.utils.compile_cache import \
    enable_persistent_compile_cache  # noqa: E402,F401


class ChunkedFlowSession:
    """Per-utterance streaming flow state + the jitted hop programs.

    Usage:
        s = ChunkedFlowSession(flow, flow_vars, noise)
        s.prefill(prompt_tokens, prompt_feat, embedding, first3)
        feat50 = s.step(tokens25, next3)     # per hop
        featN  = s.final(remaining_tokens)   # tail
    """

    def __init__(self, flow: FlowModel, variables, noise,
                 token_hop: int = 25, lookahead: int = 3,
                 max_tokens: int = 1024, window: int = 100,
                 final_bucket: int = 32,
                 prompt_buckets=(32, 64, 128, 256, 512),
                 cache_dtype=jnp.float32,
                 persistent_compile_cache: bool = True):
        if persistent_compile_cache:
            enable_persistent_compile_cache()
        self.flow = flow
        self.variables = variables
        self.noise = noise
        self.hop = token_hop
        self.lookahead = lookahead
        self.max_tokens = max_tokens
        self.window = window
        self.final_bucket = final_bucket
        self.prompt_buckets = prompt_buckets
        self.cache_dtype = cache_dtype
        c = flow.cfg
        self.ratio = c.token_latent_ratio
        self.n_timesteps = c.n_timesteps

        def est_apply(v, x, m, mu, t, s, cd, streaming, **kw):
            return flow.apply(v, x, m, mu, t, s, cd, streaming,
                              method=FlowModel.estimate, **kw)

        def _prefill(v, token_buf, plen, prompt_feat, emb, noise):
            b, p = token_buf.shape
            enc0 = make_encoder_cache(c.encoder, b, max_tokens, cache_dtype)
            mu, enc_cache = flow.apply(
                v, token_buf, plen, enc0,
                method=FlowModel.stream_encode_prefill)
            spks = flow.apply(v, emb, method=FlowModel.project_speaker)
            tf = mu.shape[1]
            plen2 = plen * self.ratio
            fmask = (jnp.arange(tf) < plen2)[None, :].astype(mu.dtype)
            conds = latent_normalize(c, prompt_feat)[:, :tf] * fmask[..., None]
            z = jnp.broadcast_to(noise[:, :tf], (b, tf, c.output_size))
            _, unet_caches = cfm.solve_euler_collect(
                est_apply, v, z, mu, fmask, spks, conds,
                self.n_timesteps, c.cfm, collect_len=plen2, window=window)
            return spks, enc_cache, unet_caches

        def _chunk(v, enc_cache, unet_caches, spks, tokens, ctx, offset,
                   q_valid, noise):
            mu, enc_cache = flow.apply(
                v, tokens, enc_cache, offset, q_valid, ctx,
                method=FlowModel.stream_encode_chunk)
            b, cq2, _ = mu.shape
            off2 = offset * self.ratio
            z = jax.lax.dynamic_slice(
                jnp.broadcast_to(noise, (b,) + noise.shape[1:]),
                (0, off2, 0), (b, cq2, c.output_size))
            cond = jnp.zeros_like(mu)
            x, unet_caches = cfm.solve_euler_chunk(
                est_apply, v, z, mu, spks, cond, self.n_timesteps, c.cfm,
                unet_caches, off2, q_valid * self.ratio, window=window)
            return latent_denormalize(c, x), enc_cache, unet_caches

        self._prefill_fn = jax.jit(_prefill)
        self._chunk_fn = jax.jit(partial(_chunk))
        self._final_fn = jax.jit(
            lambda v, ec, uc, s, tk, off, qv, nz: _chunk(
                v, ec, uc, s, tk, None, off, qv, nz))

        # per-utterance state
        self._spks = None
        self._enc_cache = None
        self._unet_caches = None
        self._offset = 0

    def prefill(self, prompt_tokens: np.ndarray, prompt_feat: np.ndarray,
                embedding, first_ctx: np.ndarray) -> None:
        """prompt_tokens: (Tp,) int; prompt_feat: (2*Tp, 80);
        embedding: (1, 192); first_ctx: first `lookahead` tokens of the
        first hop."""
        plen = len(prompt_tokens)
        if plen + self.lookahead > self.max_tokens:
            raise ValueError(
                f"prompt of {plen} tokens (+{self.lookahead} lookahead) "
                f"exceeds the session's preallocated KV cache "
                f"(max_tokens={self.max_tokens}); raise max_tokens — a "
                f"clamped dynamic_update_slice would silently corrupt "
                f"cache slots instead of erroring")
        buckets = [b for b in self.prompt_buckets
                   if b >= plen + self.lookahead]
        p = buckets[0] if buckets else plen + self.lookahead
        buf = np.zeros((1, p), np.int32)
        buf[0, :plen] = prompt_tokens
        buf[0, plen: plen + self.lookahead] = first_ctx[: self.lookahead]
        pf = np.zeros((1, p * self.ratio, prompt_feat.shape[-1]), np.float32)
        pf[0, : prompt_feat.shape[0]] = prompt_feat
        self._spks, self._enc_cache, self._unet_caches = self._prefill_fn(
            self.variables, jnp.asarray(buf), jnp.int32(plen),
            jnp.asarray(pf), embedding, self.noise)
        self._offset = plen

    def step(self, tokens: np.ndarray, next_ctx: np.ndarray) -> np.ndarray:
        """One steady-state hop: tokens (hop,), next_ctx (lookahead,).
        Returns (hop*ratio, 80) latent frames."""
        assert len(tokens) == self.hop
        if self._offset + self.hop + self.lookahead > self.max_tokens:
            raise ValueError(
                f"session at offset {self._offset} would exceed the "
                f"preallocated KV cache (max_tokens={self.max_tokens}) "
                f"with this {self.hop}-token hop; raise max_tokens")
        x, self._enc_cache, self._unet_caches = self._chunk_fn(
            self.variables, self._enc_cache, self._unet_caches, self._spks,
            jnp.asarray(tokens, jnp.int32)[None],
            jnp.asarray(next_ctx, jnp.int32)[None],
            jnp.int32(self._offset), jnp.int32(self.hop), self.noise)
        self._offset += self.hop
        return np.asarray(x)[0]

    def final(self, tokens: np.ndarray) -> np.ndarray:
        """Final ragged hop (<= final_bucket tokens, zero right-pad =
        finalize semantics). Returns (len(tokens)*ratio, 80)."""
        n = len(tokens)
        if n > self.final_bucket:
            raise ValueError(f"final hop of {n} tokens exceeds "
                             f"final_bucket={self.final_bucket}")
        if self._offset + self.final_bucket > self.max_tokens:
            raise ValueError(
                f"session at offset {self._offset} would exceed the "
                f"preallocated KV cache (max_tokens={self.max_tokens}) "
                f"with the final {self.final_bucket}-token bucket; "
                f"raise max_tokens")
        buf = np.zeros((1, self.final_bucket), np.int32)
        buf[0, :n] = tokens
        x, self._enc_cache, self._unet_caches = self._final_fn(
            self.variables, self._enc_cache, self._unet_caches, self._spks,
            jnp.asarray(buf), jnp.int32(self._offset), jnp.int32(n),
            self.noise)
        self._offset += n
        return np.asarray(x)[0, : n * self.ratio]
