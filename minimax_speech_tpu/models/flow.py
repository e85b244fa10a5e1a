"""Stage-2 flow model: FSQ tokens -> DAC-VAE latents (or mels).

CausalMaskedDiffWithXvec equivalent (reference:
speech/cosyvoice/flow/flow.py:201-511):

  token embedding (6561 -> 512) -> UpsampleConformerEncoder (2x to
  latent rate) -> Dense 512->80 -> CausalConditionalCFM with the causal
  UNet estimator. Speaker conditioning from the LearnableSpeakerEncoder
  (or an externally provided 192-d x-vector), projected to 80.

Training: 50% of samples get a random prefix of the target latent as
`cond` (prompt conditioning, flow.py:409-415); loss is (contrastive)
OT-CFM. Inference: prompt tokens+latents are concatenated in front,
the prompt region of `cond` is the prompt latent, 10 Euler steps with
CFG 0.7, and the prompt region is cut from the output.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from minimax_speech_tpu.models import cfm
from minimax_speech_tpu.models.decoder_unet import (CausalConditionalDecoder,
                                                    DecoderUNetConfig)
from minimax_speech_tpu.models.speaker_encoder import (LearnableSpeakerEncoder,
                                                       SpeakerEncoderConfig)
from minimax_speech_tpu.models.upsample_encoder import (UpsampleConformerEncoder,
                                                        UpsampleEncoderConfig)
from minimax_speech_tpu.ops import masks as mask_ops


@dataclass(frozen=True)
class FlowConfig:
    input_size: int = 512
    output_size: int = 80
    spk_embed_dim: int = 192
    vocab_size: int = 6561
    input_frame_rate: int = 25
    token_latent_ratio: int = 2
    pre_lookahead_len: int = 3
    use_speaker_encoder: bool = True
    freeze_speaker_encoder: bool = True
    n_timesteps: int = 10
    # Per-channel latent standardization (empty = identity). The
    # reference trains the flow on RAW DAC latents (flow.py:388) and
    # relies on its codec's KL term leaving them near unit scale; a
    # from-scratch or lightly-KL'd codec can emit latents at any scale,
    # and CFM conditioning drowns when std(latent) << std(noise)=1.
    # Stats come from cli/extract_dac_latents (latent_stats.json); the
    # flow normalizes internally so every external surface stays in raw
    # latent space.
    latent_mean: tuple = ()
    latent_std: tuple = ()
    encoder: UpsampleEncoderConfig = field(default_factory=UpsampleEncoderConfig)
    unet: DecoderUNetConfig = field(default_factory=DecoderUNetConfig)
    cfm: cfm.CFMConfig = field(default_factory=cfm.CFMConfig)
    speaker: SpeakerEncoderConfig = field(default_factory=SpeakerEncoderConfig)


def latent_normalize(cfg: FlowConfig, x: jnp.ndarray) -> jnp.ndarray:
    """Raw latent space -> the standardized space the CFM solves in."""
    if not cfg.latent_mean and not cfg.latent_std:
        return x
    mean = jnp.asarray(cfg.latent_mean or (0.0,) * cfg.output_size, x.dtype)
    std = jnp.asarray(cfg.latent_std or (1.0,) * cfg.output_size, x.dtype)
    return (x - mean) / std


def latent_denormalize(cfg: FlowConfig, x: jnp.ndarray) -> jnp.ndarray:
    if not cfg.latent_mean and not cfg.latent_std:
        return x
    mean = jnp.asarray(cfg.latent_mean or (0.0,) * cfg.output_size, x.dtype)
    std = jnp.asarray(cfg.latent_std or (1.0,) * cfg.output_size, x.dtype)
    return x * std + mean


class FlowModel(nn.Module):
    cfg: FlowConfig = FlowConfig()

    def setup(self):
        c = self.cfg
        self.input_embedding = nn.Embed(c.vocab_size, c.input_size)
        self.spk_embed_affine_layer = nn.Dense(c.output_size)
        self.encoder = UpsampleConformerEncoder(c.encoder)
        self.encoder_proj = nn.Dense(c.output_size)
        self.estimator = CausalConditionalDecoder(c.unet)
        if c.use_speaker_encoder:
            self.speaker_encoder = LearnableSpeakerEncoder(c.speaker)

    def embed_speaker(self, reference_mel: jnp.ndarray,
                      reference_mask: Optional[jnp.ndarray] = None
                      ) -> jnp.ndarray:
        """(B, T, 80) reference mel -> (B, 192) unit-norm embedding.

        Also accepts (B, N, T, 80) multi-reference batches: each crop is
        embedded and the results averaged then re-normalized
        (reference: flow.py:338-357 get_speaker_embedding 4-dim path)."""
        if reference_mel.ndim == 4:
            b, n, t, d = reference_mel.shape
            flat = reference_mel.reshape(b * n, t, d)
            m = (reference_mask.reshape(b * n, t)
                 if reference_mask is not None else None)
            e = self.speaker_encoder(flat, m).reshape(b, n, -1)
            e = jnp.mean(e, axis=1)
            return e / jnp.maximum(
                jnp.linalg.norm(e, axis=-1, keepdims=True), 1e-12)
        return self.speaker_encoder(reference_mel, reference_mask)

    def encode_tokens(self, token, token_len, context=None, streaming=False,
                      chunk_align=None):
        """tokens (B, T) -> (B, 2T, 80) projected encoder output."""
        t = token.shape[1]
        m = mask_ops.make_non_pad_mask(token_len, t).astype(jnp.float32)
        h = self.input_embedding(jnp.clip(token, 0, None)) * m[..., None]
        h, h_len = self.encoder(h, token_len, context=context,
                                streaming=streaming, chunk_align=chunk_align)
        return self.encoder_proj(h), h_len

    def estimate(self, x, mask, mu, t, spks, cond, streaming=False, **kw):
        return self.estimator(x, mask, mu, t, spks, cond,
                              streaming=streaming, **kw)

    # -- chunked streaming (O(chunk) per hop; infer/stream_flow.py) ----------
    def stream_encode_prefill(self, token_buf, plen, cache):
        """Prompt-unit encode. token_buf: (B, P) int32 holding the prompt
        in [0, plen) and the first pre_lookahead_len tokens of the next
        chunk at [plen, plen+L) (rest arbitrary). Returns
        (mu (B, 2P, 80) — valid through 2*plen — and the encoder cache)."""
        h = self.input_embedding(jnp.clip(token_buf, 0, None))
        out, cache = self.encoder.prefill(h, plen, cache)
        return self.encoder_proj(out), cache

    def stream_encode_chunk(self, tokens, cache, offset, q_valid, ctx=None):
        """One hop: tokens (B, cq) starting at absolute token position
        `offset`; ctx (B, L) = the next chunk's first L tokens (None for
        the final chunk). Returns (mu (B, cq*2, 80), cache)."""
        h = self.input_embedding(jnp.clip(tokens, 0, None))
        ctx_h = (self.input_embedding(jnp.clip(ctx, 0, None))
                 if ctx is not None else None)
        out, cache = self.encoder.chunk_step(h, cache, offset, q_valid,
                                             context=ctx_h)
        return self.encoder_proj(out), cache

    def project_speaker(self, embedding):
        """(B, 192) -> (B, 80) spk conditioning for the estimator."""
        return self.spk_embed_affine_layer(embedding)

    def __call__(self, token, token_len, feat, feat_len, embedding,
                 key, streaming: bool = False):
        """Training loss.

        token: (B, Tt) FSQ tokens; feat: (B, Tf=2*Tt, 80) target latents;
        embedding: (B, 192) speaker embedding (already normalized — from
        embed_speaker or an external x-vector).
        """
        c = self.cfg
        spks = self.spk_embed_affine_layer(embedding)
        feat = latent_normalize(c, feat)

        mu, h_len = self.encode_tokens(token, token_len, streaming=streaming)
        tf = feat.shape[1]
        mask = mask_ops.make_non_pad_mask(h_len, tf).astype(feat.dtype)

        # random prefix conditioning (reference: flow.py:409-415): with
        # p=0.5 per sample, expose a random prefix (<=30%) of the target
        k_on, k_idx, k_cfm = jax.random.split(key, 3)
        use_cond = jax.random.bernoulli(k_on, 0.5, (feat.shape[0],))
        frac = jax.random.uniform(k_idx, (feat.shape[0],))
        idx = (frac * 0.3 * feat_len.astype(jnp.float32)).astype(jnp.int32)
        pos = jnp.arange(tf)[None, :]
        cond_mask = (pos < idx[:, None]) & use_cond[:, None]
        conds = feat * cond_mask[..., None].astype(feat.dtype)

        loss, _ = cfm.compute_loss(
            lambda p, *a: self.estimate(*a), None, k_cfm,
            feat, mask, mu, spks, conds, c.cfm, streaming=streaming)
        return loss

    def prepare_inference(self, token, token_len, prompt_feat, embedding,
                          streaming: bool = False, finalize: bool = True,
                          prompt_feat_len=None, chunk_align=None):
        """Everything before the ODE solve: encoder output `mu`, projected
        speaker embedding, prompt conditioning, frame mask.

        token: (B, Tt) prompt+target tokens concatenated (as the reference
        does in flow.py:469-474); prompt_feat: (B, Tp, 80).
        """
        c = self.cfg
        spks = self.spk_embed_affine_layer(embedding)
        prompt_feat = latent_normalize(c, prompt_feat)

        if finalize:
            mu, h_len = self.encode_tokens(token, token_len,
                                           streaming=streaming,
                                           chunk_align=chunk_align)
        else:
            body = token[:, : -c.pre_lookahead_len]
            ctx_tokens = token[:, -c.pre_lookahead_len:]
            t = body.shape[1]
            m = mask_ops.make_non_pad_mask(
                token_len - c.pre_lookahead_len, t).astype(jnp.float32)
            h = self.input_embedding(jnp.clip(body, 0, None)) * m[..., None]
            ctx = self.input_embedding(jnp.clip(ctx_tokens, 0, None))
            h, h_len = self.encoder(h, token_len - c.pre_lookahead_len,
                                    context=ctx, streaming=streaming)
            mu = self.encoder_proj(h)

        tf = mu.shape[1]
        mel_len1 = prompt_feat.shape[1]
        mask = mask_ops.make_non_pad_mask(h_len, tf).astype(mu.dtype)

        if prompt_feat_len is None:
            conds = jnp.zeros((mu.shape[0], tf, c.output_size), mu.dtype)
            conds = conds.at[:, :mel_len1].set(prompt_feat)
        else:
            # ragged prompts (batched serving): per-sample prefix mask
            pm = (jnp.arange(mel_len1)[None, :]
                  < prompt_feat_len[:, None]).astype(mu.dtype)
            prompt = prompt_feat * pm[..., None]
            conds = jnp.zeros((mu.shape[0], tf, c.output_size), mu.dtype)
            conds = conds.at[:, :mel_len1].set(prompt)
        return mu, mask, spks, conds


def init_flow_variables(model: FlowModel, key, batch: int = 1,
                        tokens: int = 8):
    """Initialize ALL flow params (encoder + estimator + speaker affine +
    speaker encoder) by tracing training + speaker paths on dummy data."""
    c = model.cfg

    def init_all(m: FlowModel, token, lens, feat, flens, emb, k):
        loss = m(token, lens, feat, flens, emb, k)
        if c.use_speaker_encoder:
            m.embed_speaker(jnp.zeros((batch, 4, c.speaker.mel_dim)))
        return loss

    token = jnp.zeros((batch, tokens), jnp.int32)
    feat = jnp.zeros((batch, tokens * c.token_latent_ratio, c.output_size))
    emb = jnp.zeros((batch, c.spk_embed_dim))
    lens = jnp.full((batch,), tokens, jnp.int32)
    return model.init(key, token, lens, feat, lens * c.token_latent_ratio,
                      emb, key, method=init_all)


def flow_inference(model: FlowModel, variables, token, token_len,
                   prompt_feat, embedding, noise,
                   streaming: bool = False, finalize: bool = True):
    """Generate latents for `token` given a latent prompt.

    The Euler scan lives OUTSIDE the flax scope (a lax.scan over a bound
    submodule leaks tracers); the estimator is re-entered through
    model.apply per step. noise: (1 or B, >=2*Tt, 80) fixed noise table.
    Returns (B, 2*Tt - Tp, 80).
    """
    c = model.cfg
    mu, mask, spks, conds = model.apply(
        variables, token, token_len, prompt_feat, embedding,
        streaming, finalize, method=FlowModel.prepare_inference)
    tf = mu.shape[1]
    mel_len1 = prompt_feat.shape[1]

    def est_apply(_, x, m_, mu_, t_, s_, c_, streaming_):
        return model.apply(variables, x, m_, mu_, t_, s_, c_, streaming_,
                           method=FlowModel.estimate)

    z = jnp.broadcast_to(noise[:, :tf], (mu.shape[0], tf, c.output_size))
    feat = cfm.solve_euler(est_apply, None, z, mu, mask, spks, conds,
                           c.n_timesteps, c.cfm, streaming=streaming)
    return latent_denormalize(c, feat[:, mel_len1:])


def flow_inference_unit_grid(model: FlowModel, variables, token, token_len,
                             prompt_feat, prompt_len, embedding, noise,
                             window: int = 100):
    """Full-sequence streaming inference on the PROMPT-ANCHORED unit grid
    with a finite UNet attention window — the reference implementation of
    exactly what the chunked path (infer/stream_flow.py) computes
    incrementally; used to verify it. prompt_len: traced prompt token
    count (prompt_feat must be its 2x frames, possibly padded)."""
    c = model.cfg
    mu, mask, spks, conds = model.apply(
        variables, token, token_len, prompt_feat, embedding,
        True, True, None, prompt_len,
        method=FlowModel.prepare_inference)
    tf = mu.shape[1]

    def est_apply(_, x, m_, mu_, t_, s_, c_, streaming_):
        return model.apply(variables, x, m_, mu_, t_, s_, c_, streaming_,
                           method=FlowModel.estimate, window=window,
                           unit_align=prompt_len * c.token_latent_ratio)

    z = jnp.broadcast_to(noise[:, :tf], (mu.shape[0], tf, c.output_size))
    feat = cfm.solve_euler(est_apply, None, z, mu, mask, spks, conds,
                           c.n_timesteps, c.cfm, streaming=True)
    return latent_denormalize(c, feat)


def flow_inference_batched(model: FlowModel, variables, token, token_len,
                           prompt_feat, prompt_feat_len, embedding, noise,
                           streaming: bool = False):
    """Batched variant with ragged prompt lengths: returns the FULL frame
    sequence (B, 2*Tt, 80); callers slice each sample's generated region
    [prompt_feat_len[i] : token_len[i]*ratio) on the host."""
    c = model.cfg
    mu, mask, spks, conds = model.apply(
        variables, token, token_len, prompt_feat, embedding,
        streaming, True, prompt_feat_len,
        method=FlowModel.prepare_inference)
    tf = mu.shape[1]

    def est_apply(_, x, m_, mu_, t_, s_, c_, streaming_):
        return model.apply(variables, x, m_, mu_, t_, s_, c_, streaming_,
                           method=FlowModel.estimate)

    z = jnp.broadcast_to(noise[:, :tf], (mu.shape[0], tf, c.output_size))
    return latent_denormalize(c, cfm.solve_euler(
        est_apply, None, z, mu, mask, spks, conds,
        c.n_timesteps, c.cfm, streaming=streaming))
