"""End-to-end zero-shot TTS pipeline: text + prompt audio -> 24 kHz wav.

This is the glue the reference leaves EMPTY (speech/inference.py is a
0-byte file; SURVEY §3.2 notes the TPU build defines this API). Stages:

  1. prompt audio 16 kHz -> whisper log-mel -> S3 FSQ tokens
     (reference frontend: cli/frontend.py:92-102 via ONNX; here native)
  2. prompt audio 24 kHz -> 80-bin mel (speaker-encoder conditioning +
     HiFT prompt feats) and/or DAC latents (latent-flow prompt feats)
  3. SpeechLM RAS decode: text (+prompt text) tokens -> FSQ tokens
  4. FlowModel: prompt+generated tokens -> latents/mels (10-step CFG Euler)
  5. DAC-VAE decode (latent mode) or HiFT (mel mode) -> waveform

TPU-first: every stage is a jitted static-shape program; variable
lengths are bucketed (pad-to-bucket + masks) so steady-state synthesis
never recompiles. Batch size 1 mirrors the reference session model.
"""
from __future__ import annotations

import time
from dataclasses import dataclass, field
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from minimax_speech_tpu.models import cfm as cfm_mod
from minimax_speech_tpu.models import dac_vae, hifigan
from minimax_speech_tpu.models import llm as llm_mod
from minimax_speech_tpu.models import s3tokenizer as s3
from minimax_speech_tpu.models.flow import (FlowConfig, FlowModel,
                                            flow_inference,
                                            init_flow_variables)
from minimax_speech_tpu.ops import mel as mel_ops
from minimax_speech_tpu.utils import params_io


def next_bucket(n: int, buckets=(32, 64, 128, 256, 512, 1024)) -> int:
    for b in buckets:
        if n <= b:
            return b
    return ((n + 255) // 256) * 256


@dataclass
class TTSConfig:
    lm: llm_mod.LMConfig = field(default_factory=llm_mod.LMConfig)
    flow: FlowConfig = field(default_factory=FlowConfig)
    dac: dac_vae.DACVAEConfig = field(default_factory=dac_vae.DACVAEConfig)
    hift: hifigan.HiFTConfig = field(default_factory=hifigan.HiFTConfig)
    s3: s3.S3TokenizerConfig = field(default_factory=s3.S3TokenizerConfig)
    output_type: str = "latent"       # 'latent' (DAC) | 'mel' (HiFT)
    token_frame_rate: int = 25
    token_latent_ratio: int = 2
    sample_rate: int = 24000
    max_speech_tokens: int = 512
    min_token_text_ratio: float = 2.0
    max_token_text_ratio: float = 20.0
    # run the 10-step CFM UNet (the flow stage) in bfloat16: params are
    # cast once, inputs cast at the flow boundary, and the latents cast
    # back to fp32 BEFORE the codec so PCM fidelity is unaffected by
    # the vocoder. Off by default pending the trained-model quality
    # measurement (scripts/overfit_pipeline.py reports flow_nmse).
    bf16_flow: bool = False


class TTSPipeline:
    """Holds models + variables and the jitted stage functions."""

    def __init__(self, cfg: TTSConfig, lm_vars, flow_vars, codec_vars,
                 s3_vars=None):
        # serialized-executable cache: a fresh process deserializes
        # previously compiled programs instead of recompiling (~seconds
        # vs minutes); MSTPU_XLA_CACHE=0 disables
        from minimax_speech_tpu.utils.compile_cache import \
            enable_persistent_compile_cache
        enable_persistent_compile_cache()
        self.cfg = cfg
        self.lm = llm_mod.SpeechLM(cfg.lm)
        self.flow = FlowModel(cfg.flow)
        self.dac = dac_vae.DACVAE(cfg.dac)
        self.hift = hifigan.HiFTGenerator(cfg.hift)
        self.s3 = s3.S3TokenizerV2(cfg.s3)
        self.lm_vars = lm_vars
        self.flow_vars = flow_vars
        self.codec_vars = codec_vars
        self.s3_vars = s3_vars
        self.noise = jnp.asarray(cfm_mod.make_fixed_noise(
            15000, cfg.flow.output_size)[None])

        fdt = jnp.bfloat16 if cfg.bf16_flow else None
        if fdt is not None:
            self.flow_vars = params_io.cast_floats(self.flow_vars, fdt)

        def fin(*xs):
            # cast flow inputs so matmuls stay in bf16 (fp32 operands
            # would promote every op back up)
            if fdt is None:
                return xs
            return tuple(params_io.cast_floats(list(xs), fdt))

        def fout(feat):
            return feat.astype(jnp.float32) if fdt is not None else feat

        self._tokenize = jax.jit(self.s3.apply) if s3_vars is not None else None
        self._flow_infer = jax.jit(
            lambda v, tok, tl, pf, emb, noise: fout(flow_inference(
                self.flow, v, tok, tl, *fin(pf, emb, noise))))
        # streaming variant: chunk masks on, lookahead tokens held back as
        # encoder context (flow.py prepare_inference finalize=False path)
        self._flow_infer_stream = jax.jit(
            lambda v, tok, tl, pf, emb, noise: fout(flow_inference(
                self.flow, v, tok, tl, *fin(pf, emb, noise),
                streaming=True, finalize=False)))
        if cfg.output_type == "latent":
            self._decode = jax.jit(partial(self.dac.apply,
                                           method=dac_vae.DACVAE.decode))
        else:
            self._decode = jax.jit(lambda v, mel: self.hift.apply(v, mel)[0])

        # fused flow+vocoder: one device dispatch for the whole post-LM path
        # (each jit call pays tunnel/dispatch latency, which dominates the
        # per-stage compute at these sizes)
        def _post_lm(fv, cv, tok, tl, pf, emb, noise):
            feat = fout(flow_inference(self.flow, fv, tok, tl,
                                       *fin(pf, emb, noise)))
            if cfg.output_type == "latent":
                wav = self.dac.apply(cv, feat, method=dac_vae.DACVAE.decode)
            else:
                wav = self.hift.apply(cv, feat)[0]
            return wav

        self._flow_and_decode = jax.jit(_post_lm)

        # whole-utterance fusion: LM decode + flow + vocoder in ONE jitted
        # program (a single device dispatch — the tunnel round-trip per
        # dispatch costs more than the flow+codec compute)
        from minimax_speech_tpu.models.flow import flow_inference_batched

        def _e2e(lm_vars, flow_vars, codec_vars, src, tok, plen, spk, key,
                 min_len, max_len, prompt_tokens, prompt_tok_len,
                 prompt_feat, prompt_feat_len, femb, noise):
            out, count = llm_mod.generate.__wrapped__(
                self.lm, lm_vars, src, tok, plen, spk, key, min_len,
                max_len, max_steps=cfg.max_speech_tokens)
            b, p_max = prompt_tokens.shape
            gen = jnp.clip(out, 0, None)  # -1 pads -> 0, masked by length
            # compact [prompt | generated] by gather: position j holds
            # prompt_tokens[j] while j < prompt_tok_len, else
            # gen[j - prompt_tok_len]
            L = p_max + gen.shape[1]
            j = jnp.arange(L)[None, :]
            take_prompt = j < prompt_tok_len[:, None]
            pv = jnp.take_along_axis(
                prompt_tokens, jnp.clip(j, 0, p_max - 1), axis=1)
            gi = jnp.clip(j - prompt_tok_len[:, None], 0, gen.shape[1] - 1)
            gv = jnp.take_along_axis(gen, gi, axis=1)
            compact = jnp.where(take_prompt, pv, gv)
            tl = prompt_tok_len + count
            feat = fout(flow_inference_batched(
                self.flow, flow_vars, compact, tl,
                *fin(prompt_feat), prompt_feat_len, *fin(femb, noise)))
            if cfg.output_type == "latent":
                wav = self.dac.apply(codec_vars, feat,
                                     method=dac_vae.DACVAE.decode)
            else:
                wav = self.hift.apply(codec_vars, feat)[0]
            # device-side trim + int16 PCM: the tunnel D2H costs a fixed
            # RTT plus ~20 MB/s, so ship only the generated region at
            # wav-file precision (measured: full fp32 padded buffer D2H
            # was ~50 ms of the 208 ms utterance)
            wav = wav.reshape(wav.shape[0], -1)
            spf = 480
            gen_samples = min(
                cfg.max_speech_tokens * cfg.token_latent_ratio * spf,
                wav.shape[1])
            # per-row start: each request's own prompt-region length
            wav = jax.vmap(lambda w, s: jax.lax.dynamic_slice(
                w, (s * spf,), (gen_samples,)))(wav, prompt_feat_len)
            pcm = jnp.clip(wav * 32767.0, -32768.0, 32767.0).astype(jnp.int16)
            return pcm, count

        self._e2e_fused = jax.jit(_e2e)
        self._spk_lm = jax.jit(partial(self.lm.apply,
                                       method=llm_mod.SpeechLM.embed_speaker))
        self._spk_flow = jax.jit(partial(self.flow.apply,
                                         method=FlowModel.embed_speaker))
        self._encode_prompt = jax.jit(
            lambda v, a: self.dac.apply(v, a,
                                        method=dac_vae.DACVAE.encode)[1])

    # -- construction --------------------------------------------------------
    @classmethod
    def from_random(cls, cfg: TTSConfig, key=None) -> "TTSPipeline":
        """Random-weight pipeline (benchmarks, smoke tests)."""
        key = key if key is not None else jax.random.PRNGKey(0)
        k1, k2, k3, k4 = jax.random.split(key, 4)
        lm_model = llm_mod.SpeechLM(cfg.lm)
        lm_vars = jax.jit(llm_mod.init_lm_variables,
                          static_argnums=0)(lm_model, k1)
        flow_model = FlowModel(cfg.flow)
        flow_vars = jax.jit(init_flow_variables, static_argnums=0)(
            flow_model, k2)
        if cfg.output_type == "latent":
            codec = dac_vae.DACVAE(cfg.dac)
            dummy = jnp.zeros((1, cfg.dac.hop_length * 4, 1))
            codec_vars = jax.jit(codec.init)(k3, dummy)
        else:
            voc = hifigan.HiFTGenerator(cfg.hift)
            codec_vars = jax.jit(voc.init)(k3, jnp.zeros((1, 8, cfg.hift.in_channels)))
        s3_model = s3.S3TokenizerV2(cfg.s3)
        s3_vars = jax.jit(s3_model.init)(
            k4, jnp.zeros((1, 64, cfg.s3.n_mels)), jnp.array([64]))
        return cls(cfg, lm_vars, flow_vars, codec_vars, s3_vars)

    # -- prompt processing ----------------------------------------------------
    def extract_prompt_tokens(self, audio_16k: np.ndarray) -> np.ndarray:
        """16 kHz prompt audio -> FSQ tokens (<=30 s,
        reference: frontend.py:92-102)."""
        mel = mel_ops.whisper_log_mel(jnp.asarray(audio_16k))
        melT = mel.T[None]
        t = melT.shape[1]
        pad = next_bucket(t)
        melT = jnp.pad(melT, ((0, 0), (0, pad - t), (0, 0)))
        codes, code_len = self._tokenize(self.s3_vars, melT, jnp.array([t]))
        return np.asarray(codes)[0, : int(code_len[0])]

    def extract_prompt_mel(self, audio_24k: np.ndarray) -> np.ndarray:
        """24 kHz prompt -> (T, 80) log-mel at 50 Hz.

        Host numpy on purpose: eager jnp would dispatch per-op to the
        device (costly over a tunnel) for a one-off ragged-shape prompt.
        """
        return mel_ops.hifigan_log_mel_np(audio_24k).T.copy()

    def extract_prompt_latent(self, audio_24k: np.ndarray) -> np.ndarray:
        """24 kHz prompt -> (T, 80) DAC latents (mu) at 50 Hz."""
        a = dac_vae.pad_to_hop(audio_24k[None, :], self.cfg.dac.hop_length)
        mu = self._encode_prompt(self.codec_vars, jnp.asarray(a[..., None]))
        return np.asarray(mu)[0]

    def speaker_embedding(self, prompt_mel: np.ndarray):
        """(T, 80) reference mel -> conditioning for LM (projected, (1, C))
        and flow (192-d, (1, 192))."""
        mel = jnp.asarray(prompt_mel)[None]
        lm_cond = self._spk_lm(self.lm_vars, mel)
        flow_emb = self._spk_flow(self.flow_vars, mel)
        return lm_cond, flow_emb

    # -- synthesis ------------------------------------------------------------
    def synthesize(self, text_tokens: np.ndarray, prompt_text_tokens: np.ndarray,
                   prompt_speech_tokens: np.ndarray, prompt_feat: np.ndarray,
                   lm_spk, flow_emb, key=None,
                   return_timings: bool = False):
        """One utterance. text/prompt tokens are 1-D int arrays;
        prompt_feat is (Tp, 80) mel or latent matching output_type."""
        cfg = self.cfg
        key = key if key is not None else jax.random.PRNGKey(int(time.time()))
        t0 = time.perf_counter()

        full_text = np.concatenate([prompt_text_tokens, text_tokens])
        src, tok, plen = llm_mod.build_inference_plan(
            full_text, prompt_speech_tokens,
            use_spk=cfg.lm.use_speaker_encoder)
        pad_to = next_bucket(src.shape[1])
        src = np.pad(src, ((0, 0), (0, pad_to - src.shape[1])))
        tok = np.pad(tok, ((0, 0), (0, pad_to - tok.shape[1])))
        n_text = len(text_tokens)
        min_len = int(n_text * cfg.min_token_text_ratio)
        max_len = min(int(n_text * cfg.max_token_text_ratio),
                      cfg.max_speech_tokens)

        out, count = llm_mod.generate(
            self.lm, self.lm_vars, jnp.asarray(src), jnp.asarray(tok),
            jnp.asarray(plen), lm_spk, key, jnp.array([min_len]),
            jnp.array([max_len]), max_steps=cfg.max_speech_tokens)
        n = int(count[0])
        gen_tokens = np.asarray(out)[0, :n]
        t1 = time.perf_counter()

        # flow + vocoder in ONE device call; prompt region is cut inside,
        # bucket padding is trimmed from the waveform on the host
        all_tokens = np.concatenate([prompt_speech_tokens, gen_tokens])
        tl = len(all_tokens)
        tok_pad = next_bucket(tl)
        tokens = np.zeros((1, tok_pad), np.int32)
        tokens[0, :tl] = all_tokens
        wav_full = self._flow_and_decode(
            self.flow_vars, self.codec_vars, jnp.asarray(tokens),
            jnp.array([tl]),
            jnp.asarray(prompt_feat)[None].astype(jnp.float32), flow_emb,
            self.noise)
        t2 = time.perf_counter()

        spf = 480  # samples per latent frame at 24 kHz
        wav = np.asarray(wav_full).reshape(-1)
        wav = wav[: n * cfg.token_latent_ratio * spf]
        t3 = time.perf_counter()

        if return_timings:
            return wav, {"lm_s": t1 - t0, "flow_s": t2 - t1,
                         "vocoder_s": t3 - t2, "total_s": t3 - t0,
                         "tokens": n,
                         "audio_s": len(wav) / cfg.sample_rate}
        return wav

    def synthesize_fused(self, text_tokens: np.ndarray,
                         prompt_text_tokens: np.ndarray,
                         prompt_speech_tokens: np.ndarray,
                         prompt_feat: np.ndarray, lm_spk, flow_emb,
                         key=None, return_timings: bool = False):
        """One-dispatch synthesis: the whole LM-decode -> flow -> vocoder
        chain runs as a single jitted program."""
        cfg = self.cfg
        key = key if key is not None else jax.random.PRNGKey(0)
        t0 = time.perf_counter()

        full_text = np.concatenate([prompt_text_tokens, text_tokens])
        src, tok, plen = llm_mod.build_inference_plan(
            full_text, prompt_speech_tokens,
            use_spk=cfg.lm.use_speaker_encoder)
        pad_to = next_bucket(src.shape[1])
        src = np.pad(src, ((0, 0), (0, pad_to - src.shape[1])))
        tok = np.pad(tok, ((0, 0), (0, pad_to - tok.shape[1])))
        n_text = len(text_tokens)
        min_len = int(n_text * cfg.min_token_text_ratio)
        max_len = min(int(n_text * cfg.max_token_text_ratio),
                      cfg.max_speech_tokens)

        pt_pad = next_bucket(len(prompt_speech_tokens),
                             buckets=(16, 32, 64, 128, 256))
        ptoks = np.zeros((1, pt_pad), np.int32)
        ptoks[0, : len(prompt_speech_tokens)] = prompt_speech_tokens
        pf_pad = next_bucket(prompt_feat.shape[0],
                             buckets=(16, 32, 64, 128, 256, 512))
        pf = np.zeros((1, pf_pad, cfg.flow.output_size), np.float32)
        pf[0, : prompt_feat.shape[0]] = prompt_feat
        pfl = prompt_feat.shape[0]

        pcm, count = self._e2e_fused(
            self.lm_vars, self.flow_vars, self.codec_vars,
            jnp.asarray(src), jnp.asarray(tok), jnp.asarray(plen), lm_spk,
            key, jnp.array([min_len]), jnp.array([max_len]),
            jnp.asarray(ptoks),
            jnp.array([len(prompt_speech_tokens)], jnp.int32),
            jnp.asarray(pf), jnp.array([pfl], jnp.int32), flow_emb,
            self.noise)
        # ONE device_get for both outputs (each separate fetch pays a
        # full tunnel RTT)
        pcm, count = jax.device_get((pcm, count))
        n = int(count[0])
        spf = 480
        wav = pcm[0, : n * cfg.token_latent_ratio * spf].astype(
            np.float32) / 32767.0
        t1 = time.perf_counter()
        if return_timings:
            return wav, {"total_s": t1 - t0, "tokens": n,
                         "audio_s": len(wav) / cfg.sample_rate}
        return wav
