"""Stage-1 TTS LM: text tokens (+ speaker conditioning) -> FSQ speech tokens.

Qwen2LM equivalent (reference: speech/cosyvoice/llm/llm.py:374-861):
  * embeddings: 2-entry special table (sos_eos, task), 6564-entry speech
    table (6561 codes + eos + pad/blank + fill), Qwen2 text table
  * unistream / bistream (mix_ratio 5:15) training interleave
  * label-smoothed CE + token accuracy
  * KV-cache decode with RAS sampling, min/max length from the text
    length ratio (2x .. 20x)

TPU-first redesign of the interleave: the reference builds per-sample
Python lists of embedding rows (llm.py:433-527) — here the host emits a
fixed-shape integer PLAN (source-type + token-id per position) in the
data pipeline, and the device materializes embeddings with three gathers
and a select. The decode loop is one jitted lax.while_loop over a
preallocated KV cache (see models/qwen2.py) — no per-token Python.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from minimax_speech_tpu.models import qwen2
from minimax_speech_tpu.models.speaker_encoder import (LearnableSpeakerEncoder,
                                                       SpeakerEncoderConfig)
from minimax_speech_tpu.ops import masks as mask_ops
from minimax_speech_tpu.ops import sampling as sampling_ops
from minimax_speech_tpu.utils import losses

IGNORE_ID = losses.IGNORE_ID

# plan source types
SRC_PAD, SRC_SPECIAL, SRC_TEXT, SRC_SPEECH, SRC_SPK = 0, 1, 2, 3, 4
SOS_EOS_ID, TASK_ID = 0, 1


@dataclass(frozen=True)
class LMConfig:
    llm_input_size: int = 896
    llm_output_size: int = 896
    speech_token_size: int = 6561
    lsm_weight: float = 0.0
    length_normalized_loss: bool = True
    mix_ratio: Tuple[int, int] = (5, 15)
    spk_embed_dim: int = 192
    use_speaker_encoder: bool = True
    qwen: qwen2.Qwen2Config = field(default_factory=qwen2.Qwen2Config)
    speaker: SpeakerEncoderConfig = field(default_factory=SpeakerEncoderConfig)
    # sampling
    top_p: float = 0.8
    top_k: int = 25
    ras_win: int = 10
    ras_tau: float = 0.1
    # hoist the decode loop's nucleus-sampling RNG into one fused gumbel
    # generation before the loop (per-step threefry splits are pure op
    # overhead inside lax.while_loop); same distribution, different noise
    # plumbing — see ops/sampling.py:ras_sample_batch_pregen.
    # Default ON: measured round 5 on v5e (healthy tunnel), e2e RTF
    # 0.03395 pregen vs 0.03485 per-step splits (median of 5).
    pregen_noise: bool = True

    @property
    def eos_token(self) -> int:
        return self.speech_token_size

    @property
    def fill_token(self) -> int:
        return self.speech_token_size + 2


class SpeechLM(nn.Module):
    cfg: LMConfig = LMConfig()

    def setup(self):
        c = self.cfg
        self.llm_embedding = nn.Embed(2, c.llm_input_size)
        self.speech_embedding = nn.Embed(c.speech_token_size + 3,
                                         c.llm_input_size)
        self.text_embedding = nn.Embed(c.qwen.vocab_size, c.llm_input_size)
        self.llm = qwen2.Qwen2Model(c.qwen)
        self.llm_decoder = nn.Dense(c.speech_token_size + 3)
        self.spk_embed_affine_layer = nn.Dense(c.llm_input_size)
        if c.use_speaker_encoder:
            self.speaker_encoder = LearnableSpeakerEncoder(c.speaker)

    # -- embedding materialization from a host-built plan ------------------
    def embed_plan(self, src_type, tok_id, spk_emb):
        """src_type/tok_id: (B, L) int32; spk_emb: (B, C) projected speaker
        embedding. Returns (B, L, C)."""
        text_e = self.text_embedding(tok_id)
        speech_e = self.speech_embedding(jnp.clip(tok_id, 0,
                                                  self.cfg.speech_token_size + 2))
        special_e = self.llm_embedding(jnp.clip(tok_id, 0, 1))
        st = src_type[..., None]
        emb = jnp.where(st == SRC_TEXT, text_e, 0.0)
        emb = jnp.where(st == SRC_SPEECH, speech_e, emb)
        emb = jnp.where(st == SRC_SPECIAL, special_e, emb)
        emb = jnp.where(st == SRC_SPK, spk_emb[:, None, :], emb)
        return emb

    def embed_speaker(self, reference_mel, reference_mask=None):
        """(B, T, 80) or multi-crop (B, N, T, 80) -> (B, C) projected
        speaker conditioning (normalize -> affine; multi-crop averaged —
        reference: llm.py:616-655 + max_conditioning_inputs)."""
        if reference_mel.ndim == 4:
            b, n, t, d = reference_mel.shape
            flat = reference_mel.reshape(b * n, t, d)
            m = (reference_mask.reshape(b * n, t)
                 if reference_mask is not None else None)
            e = self.speaker_encoder(flat, m).reshape(b, n, -1)
            e = jnp.mean(e, axis=1)
            e = e / jnp.maximum(
                jnp.linalg.norm(e, axis=-1, keepdims=True), 1e-12)
        else:
            e = self.speaker_encoder(reference_mel, reference_mask)
        return self.spk_embed_affine_layer(e)

    def project_xvector(self, embedding):
        """External (B, 192) x-vector -> (B, C)."""
        e = embedding / jnp.maximum(
            jnp.linalg.norm(embedding, axis=-1, keepdims=True), 1e-12)
        return self.spk_embed_affine_layer(e)

    # -- training -----------------------------------------------------------
    def __call__(self, src_type, tok_id, target, seq_len, spk_emb):
        """Training forward from plan tensors.

        src_type/tok_id/target: (B, L); seq_len: (B,); spk_emb: (B, C).
        Returns (loss, accuracy)."""
        emb = self.embed_plan(src_type, tok_id, spk_emb)
        t = emb.shape[1]
        positions = jnp.broadcast_to(jnp.arange(t)[None], src_type.shape)
        # mask handled inside Qwen2Model: splash segment ids on TPU, or
        # a causal+pad bias for the XLA fallback
        hidden, _ = self.llm(emb, positions, None, lengths=seq_len)
        logits = self.llm_decoder(hidden)
        loss = losses.label_smoothing_ce(
            logits, target, self.cfg.lsm_weight,
            self.cfg.length_normalized_loss)
        acc = losses.accuracy(logits, target)
        return loss, acc

    def sequence_logp(self, src_type, tok_id, target, seq_len, spk_emb):
        """Sum log-prob of target tokens (for DPO)."""
        emb = self.embed_plan(src_type, tok_id, spk_emb)
        t = emb.shape[1]
        positions = jnp.broadcast_to(jnp.arange(t)[None], src_type.shape)
        hidden, _ = self.llm(emb, positions, None, lengths=seq_len)
        logp = jax.nn.log_softmax(
            self.llm_decoder(hidden).astype(jnp.float32), axis=-1)
        valid = target != IGNORE_ID
        tgt = jnp.where(valid, target, 0)
        tok_logp = jnp.take_along_axis(logp, tgt[..., None], -1)[..., 0]
        return jnp.sum(tok_logp * valid, axis=-1)

    # -- inference ------------------------------------------------------------
    def prefill(self, emb, pad, positions, cache):
        """Run the prompt through the LM, filling the KV cache at slots
        [0, P). Returns (last_hidden (B, C) at each sample's true last
        position, cache)."""
        bias_self = qwen2.causal_bias(pad)
        k = cache[0].shape[2]
        p = emb.shape[1]
        if k > p:
            extra = jnp.full((pad.shape[0], 1, p, k - p), -1e10, jnp.float32)
            bias = jnp.concatenate([bias_self, extra], axis=-1)
        else:
            bias = bias_self
        hidden, cache = self.llm(emb, positions, bias, cache, 0)
        return hidden, cache

    def decode_step(self, emb_1, pos, valid, cache, slot):
        """One decode step: emb_1 (B, 1, C) at true position pos (B,),
        writing cache slot `slot` (scalar). Returns (logits (B, V), cache)."""
        valid = valid.at[:, slot].set(True)
        bias = qwen2.cache_bias(valid)
        hidden, cache = self.llm(emb_1, pos[:, None], bias, cache, slot)
        return self.llm_decoder(hidden[:, -1]), cache, valid

    def decode_step_rows(self, emb_1, pos, valid, cache, slots, active):
        """One decode step with PER-ROW cache slots (continuous batching:
        lanes joined at different times sit at different positions).
        emb_1 (B, 1, C); pos/slots (B,) int32; active (B,) bool gates the
        valid-mask extension so parked lanes never grow their context.
        Returns (logits (B, V), cache, valid)."""
        b = emb_1.shape[0]
        valid = valid.at[jnp.arange(b), slots].max(active)
        bias = qwen2.cache_bias(valid)
        hidden, cache = self.llm(emb_1, pos[:, None], bias, cache, slots)
        return self.llm_decoder(hidden[:, -1]), cache, valid

    def embed_speech_token(self, tok):
        return self.speech_embedding(tok)

    def embed_text_token(self, tok):
        return self.text_embedding(tok)

    def extend(self, emb, pos, n_true, valid, cache, slot):
        """Append a block of `emb` (B, n, C) to the KV cache at slots
        [slot, slot+n) — the bistream path appends text/speech chunks
        mid-decode (reference: llm.py:762-861). Only the first n_true
        tokens are real; padded tail slots stay invalid. Returns
        (logits at the last true position (B, V), cache, valid)."""
        b, n, _ = emb.shape
        k = valid.shape[1]
        k_idx = jnp.arange(k)[None, None, :]                 # (1, 1, K)
        q_idx = jnp.arange(n)[None, :, None]                 # (1, n, 1)
        true_mask = q_idx[0, :, 0][None, :] < n_true[:, None]  # (B, n)
        new_valid = (k_idx[0] >= slot) & (k_idx[0] < slot + n_true[:, None])
        valid = valid | new_valid
        self_region = (k_idx >= slot) & (k_idx < slot + n)
        allowed = (valid[:, None, :] & ~self_region) | (
            self_region & (k_idx - slot <= q_idx)
            & (k_idx - slot < n_true[:, None, None]))
        bias = jnp.where(allowed, 0.0, -1e10)[:, None].astype(jnp.float32)
        hidden, cache = self.llm(emb, pos, bias, cache, slot)
        last = jnp.take_along_axis(
            hidden, jnp.maximum(n_true - 1, 0)[:, None, None], axis=1)[:, 0]
        return self.llm_decoder(last), cache, valid

    def _init_all(self, src_type, tok_id, target, seq_len, spk_emb,
                  reference_mel):
        """Trace every parameterized path once (training + speaker encoder)
        so init() creates the complete variable tree."""
        out = self(src_type, tok_id, target, seq_len, spk_emb)
        if self.cfg.use_speaker_encoder:
            self.embed_speaker(reference_mel)
        else:
            self.project_xvector(jnp.zeros(
                (src_type.shape[0], self.cfg.spk_embed_dim)))
        return out


def init_lm_variables(model: SpeechLM, key, seq: int = 8, mel_t: int = 16):
    c = model.cfg
    b = 1
    src = jnp.zeros((b, seq), jnp.int32)
    tok = jnp.zeros((b, seq), jnp.int32)
    tgt = jnp.full((b, seq), IGNORE_ID, jnp.int32)
    sl = jnp.full((b,), seq, jnp.int32)
    spk = jnp.zeros((b, c.llm_input_size))
    mel = jnp.zeros((b, mel_t, c.speaker.mel_dim))
    return model.init(key, src, tok, tgt, sl, spk, mel,
                      method=SpeechLM._init_all)


# ---------------------------------------------------------------------------
# Host-side plan construction (data prep; replaces llm.py:433-527)
# ---------------------------------------------------------------------------

def build_lm_plan(text_tokens: list[np.ndarray], speech_tokens: list[np.ndarray],
                  mix_ratio=(5, 15), use_spk=True, bistream_flags=None,
                  pad_to: Optional[int] = None, eos: int = 6561,
                  fill: int = 6563):
    """Build fixed-shape plan tensors for a batch.

    Returns dict(src_type, tok_id, target, seq_len) as numpy arrays
    (B, L). bistream_flags: per-sample bool (host RNG decides with p=0.5
    when speech/text ratio exceeds mix_ratio[1]/mix_ratio[0], matching
    llm.py:441,543)."""
    n_text, n_speech = mix_ratio
    b = len(text_tokens)
    rows = []
    for i in range(b):
        tt, st = list(map(int, text_tokens[i])), list(map(int, speech_tokens[i]))
        bistream = bool(bistream_flags[i]) if bistream_flags is not None \
            else False
        bistream = bistream and len(st) / max(len(tt), 1) > n_speech / n_text
        src, tok, tgt = [SRC_SPECIAL], [SOS_EOS_ID], [IGNORE_ID]
        if use_spk:
            src.append(SRC_SPK)
            tok.append(0)
            tgt.append(IGNORE_ID)
        if bistream:
            n_chunks = int(np.ceil((len(tt) + 1) / n_text))
            for j in range(n_chunks):
                tc = tt[j * n_text:(j + 1) * n_text]
                sc = st[j * n_speech:(j + 1) * n_speech]
                if len(tc) == n_text:
                    src += [SRC_TEXT] * n_text + [SRC_SPEECH] * len(sc)
                    tok += tc + sc
                    tgt += [IGNORE_ID] * (n_text - 1) + sc + [fill]
                else:
                    rest = st[j * n_speech:]
                    src += [SRC_TEXT] * len(tc) + [SRC_SPECIAL] \
                        + [SRC_SPEECH] * len(rest)
                    tok += tc + [TASK_ID] + rest
                    tgt += [IGNORE_ID] * len(tc) + rest + [eos]
        else:
            src += [SRC_TEXT] * len(tt) + [SRC_SPECIAL] + [SRC_SPEECH] * len(st)
            tok += tt + [TASK_ID] + st
            tgt += [IGNORE_ID] * len(tt) + st + [eos]
        assert len(src) == len(tok) == len(tgt)
        rows.append((src, tok, tgt))
    seq_len = np.array([len(r[0]) for r in rows], np.int32)
    L = pad_to or int(seq_len.max())
    src_type = np.zeros((b, L), np.int32)
    tok_id = np.zeros((b, L), np.int32)
    target = np.full((b, L), IGNORE_ID, np.int32)
    for i, (src, tok, tgt) in enumerate(rows):
        src_type[i, : len(src)] = src
        tok_id[i, : len(tok)] = tok
        target[i, : len(tgt)] = tgt
    return dict(src_type=src_type, tok_id=tok_id, target=target,
                seq_len=seq_len)


def build_inference_plan(text_tokens: np.ndarray, prompt_speech: np.ndarray,
                         use_spk: bool = True,
                         pad_to: Optional[int] = None):
    """Prompt plan for decoding: [sos][spk?][text][task][prompt_speech]
    (reference: llm.py:655-666)."""
    src = [SRC_SPECIAL] + ([SRC_SPK] if use_spk else []) \
        + [SRC_TEXT] * len(text_tokens) + [SRC_SPECIAL] \
        + [SRC_SPEECH] * len(prompt_speech)
    tok = [SOS_EOS_ID] + ([0] if use_spk else []) \
        + list(map(int, text_tokens)) + [TASK_ID] \
        + list(map(int, prompt_speech))
    n = len(src)
    L = pad_to or n
    src_type = np.zeros((1, L), np.int32)
    tok_id = np.zeros((1, L), np.int32)
    src_type[0, :n] = src
    tok_id[0, :n] = tok
    return src_type, tok_id, np.array([n], np.int32)


# ---------------------------------------------------------------------------
# Jitted decode loop
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("model", "max_steps"))
def generate(model: SpeechLM, variables, src_type, tok_id, prompt_len,
             spk_emb, key, min_len, max_len, max_steps: int = 512):
    """Greedy-RAS decode. Returns (tokens (B, max_steps) int32 padded with
    -1, num_tokens (B,)).

    src_type/tok_id: (B, P) padded prompt plan; prompt_len: (B,) true
    lengths; min_len/max_len: (B,) decode length bounds (reference
    computes them as 2x/20x the text length, llm.py:668-670). EOS is
    masked while step < min_len, mirroring the reference's ignore_eos
    rejection resampling; ids > eos (fill) are always masked in
    unistream decoding."""
    cfg = model.cfg
    b, p = src_type.shape
    eos = cfg.eos_token

    def apply(method, *args):
        return model.apply(variables, *args, method=method)

    emb = apply(SpeechLM.embed_plan, src_type, tok_id, spk_emb)
    cache = qwen2.make_cache(cfg.qwen, b, p + max_steps, emb.dtype)
    pad = mask_ops.make_non_pad_mask(prompt_len, p)
    positions = jnp.broadcast_to(jnp.arange(p)[None], (b, p))
    hidden, cache = apply(SpeechLM.prefill, emb, pad, positions, cache)
    # logits at each sample's last true position
    last_idx = prompt_len - 1
    last_hidden = jnp.take_along_axis(
        hidden, last_idx[:, None, None], axis=1)[:, 0]
    logits0 = apply(lambda m, h: m.llm_decoder(h), last_hidden)

    valid0 = jnp.concatenate(
        [pad, jnp.zeros((b, max_steps), bool)], axis=1)

    if cfg.pregen_noise:
        # ONE fused gumbel generation for the whole decode instead of
        # two threefry splits + a per-row split fan-out every step
        g_top_all = jax.random.gumbel(
            jax.random.fold_in(key, 0x67756d62),
            (max_steps, b, cfg.top_k))

    def _mask_logits(logits, count):
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        # mask fill/pad ids always; mask eos before min_len
        ids = jnp.arange(logp.shape[-1])
        logp = jnp.where(ids[None] > eos, -jnp.inf, logp)
        allow_eos = count >= min_len
        return jnp.where((ids[None] == eos) & ~allow_eos[:, None],
                         -jnp.inf, logp)

    def sample(key, logits, count, recent):
        logp = _mask_logits(logits, count)
        keys = jax.random.split(key, b)
        toks = sampling_ops.ras_sample_batch(
            keys, logp, recent, cfg.top_p, cfg.top_k, cfg.ras_win,
            cfg.ras_tau)
        return toks.astype(jnp.int32)

    def sample_pregen(key, step, logits, count, recent):
        logp = _mask_logits(logits, count)
        g_t = jax.lax.dynamic_index_in_dim(g_top_all, step, 0,
                                           keepdims=False)
        toks = sampling_ops.ras_sample_batch_pregen(
            jax.random.fold_in(key, step), g_t, logp, recent, cfg.top_p,
            cfg.top_k, cfg.ras_win, cfg.ras_tau)
        return toks.astype(jnp.int32)

    def cond(carry):
        step, finished, *_ = carry
        return (step < max_steps) & ~jnp.all(finished)

    def body(carry):
        (step, finished, key, logits, cache, valid, out, recent, count) = carry
        if cfg.pregen_noise:
            toks = sample_pregen(key, step, logits, count, recent)
        else:
            key, k1 = jax.random.split(key)
            toks = sample(k1, logits, count, recent)
        now_eos = (toks == eos) | (count >= max_len)
        newly_finished = finished | now_eos
        emit = ~newly_finished
        out = out.at[:, step].set(jnp.where(emit, toks, -1))
        recent = jnp.where(emit[:, None],
                           jnp.concatenate([recent[:, 1:], toks[:, None]], 1),
                           recent)
        pos = prompt_len + count  # true position of the token being fed
        count = count + emit.astype(jnp.int32)

        emb1 = apply(SpeechLM.embed_speech_token,
                     jnp.clip(toks, 0, eos - 1))[:, None, :]
        logits, cache, valid = apply(SpeechLM.decode_step, emb1, pos,
                                     valid, cache, p + step)
        return (step + 1, newly_finished, key, logits, cache, valid, out,
                recent, count)

    out0 = jnp.full((b, max_steps), -1, jnp.int32)
    recent0 = jnp.full((b, cfg.ras_win), -1, jnp.int32)
    carry = (jnp.int32(0), jnp.zeros((b,), bool), key, logits0, cache,
             valid0, out0, recent0, jnp.zeros((b,), jnp.int32))
    carry = jax.lax.while_loop(cond, body, carry)
    _, _, _, _, _, _, out, _, count = carry
    return out, count
