"""S3 FSQ speech tokenizer — Whisper-style encoder + finite scalar quantizer.

TPU-native re-design of S3TokenizerV2 (reference:
speech/tools/S3Tokenizer/s3tokenizer/model_v2.py). 16 kHz audio ->
whisper 128-bin log-mel -> 2x stride-2 convs (-> 25 Hz) -> 6 residual
attention blocks with RoPE and an FSMN memory conv fused into the value
path -> linear projection to 8 dims -> FSQ codes in [0, 6561).

Design notes (TPU-first):
  * time-major (B, T, C) layout with feature-last convs (XLA 'NWC'),
    which maps convs onto the MXU without transposes;
  * the whole encoder is one jit region with static shapes; padding is
    handled with masks, never dynamic shapes;
  * attention uses an additive bias built once from the pad mask;
    softmax in fp32 for parity with the reference;
  * long audio (>30 s) is windowed host-side into a *batch* of fixed
    3000-frame windows (4 s overlap) and encoded in one batched call —
    the merge drops half-overlap tokens per side
    (reference: model_v2.py:385-588, utils.py:367-390).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from minimax_speech_tpu.ops import fsq as fsq_ops
from minimax_speech_tpu.ops import masks as mask_ops
from minimax_speech_tpu.ops import rope as rope_ops


@dataclass(frozen=True)
class S3TokenizerConfig:
    n_mels: int = 128
    n_state: int = 1280
    n_head: int = 20
    n_layer: int = 6
    stride: int = 2          # first conv stride; total subsample = stride*2
    fsmn_kernel: int = 31
    codebook_size: int = fsq_ops.CODEBOOK_SIZE
    max_position: int = 2048


class FSMNAttention(nn.Module):
    """Self-attention with an FSMN depthwise-conv memory branch on V.

    Output = out_proj(attn(q, k, v)) + fsmn(v); reference:
    model_v2.py:152-249.
    """
    n_state: int
    n_head: int
    fsmn_kernel: int = 31

    @nn.compact
    def __call__(self, x, attn_bias, pad_mask, cos, sin):
        b, t, c = x.shape
        d = c // self.n_head
        q = nn.Dense(c, name="query")(x)
        k = nn.Dense(c, use_bias=False, name="key")(x)  # whisper: no key bias
        v = nn.Dense(c, name="value")(x)

        qh = q.reshape(b, t, self.n_head, d)
        kh = k.reshape(b, t, self.n_head, d)
        vh = v.reshape(b, t, self.n_head, d)
        qh, kh = rope_ops.apply_rope(qh, kh, cos[:t], sin[:t])

        # FSMN memory: depthwise conv over masked V (same padding, no bias)
        v_masked = v * pad_mask[..., None]
        mem = nn.Conv(c, kernel_size=(self.fsmn_kernel,), padding="SAME",
                      feature_group_count=c, use_bias=False,
                      name="fsmn_block")(v_masked)
        mem = (mem + v_masked) * pad_mask[..., None]

        scale = d ** -0.25
        scores = jnp.einsum("bqhd,bkhd->bhqk", qh * scale, kh * scale)
        scores = (scores + attn_bias).astype(jnp.float32)
        w = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", w, vh).reshape(b, t, c)
        return nn.Dense(c, name="out")(o) + mem


class ResidualAttentionBlock(nn.Module):
    n_state: int
    n_head: int
    fsmn_kernel: int = 31

    @nn.compact
    def __call__(self, x, attn_bias, pad_mask, cos, sin):
        h = nn.LayerNorm(epsilon=1e-6, name="attn_ln")(x)
        x = x + FSMNAttention(self.n_state, self.n_head, self.fsmn_kernel,
                              name="attn")(h, attn_bias, pad_mask, cos, sin)
        h = nn.LayerNorm(name="mlp_ln")(x)
        h = nn.Dense(self.n_state * 4, name="mlp1")(h)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(self.n_state, name="mlp2")(h)
        return x + h


class AudioEncoderV2(nn.Module):
    """Conv subsample (4x -> 25 Hz) + FSMN attention stack.

    Input: (B, T, n_mels) log-mel frames at 100 Hz, time-major.
    Reference: model_v2.py:290-351 (which is channel-first).
    """
    cfg: S3TokenizerConfig

    @nn.compact
    def __call__(self, mel: jnp.ndarray, mel_len: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        cfg = self.cfg
        t = mel.shape[1]
        m = mask_ops.make_non_pad_mask(mel_len, t).astype(mel.dtype)
        x = nn.Conv(cfg.n_state, (3,), strides=(cfg.stride,),
                    padding=[(1, 1)], name="conv1")(mel * m[..., None])
        x = jax.nn.gelu(x, approximate=False)
        out_len = (mel_len - 1) // cfg.stride + 1
        m = mask_ops.make_non_pad_mask(out_len, x.shape[1]).astype(x.dtype)
        x = nn.Conv(cfg.n_state, (3,), strides=(2,),
                    padding=[(1, 1)], name="conv2")(x * m[..., None])
        x = jax.nn.gelu(x, approximate=False)
        out_len = (out_len - 1) // 2 + 1

        t4 = x.shape[1]
        pad_mask = mask_ops.make_non_pad_mask(out_len, t4)
        attn_bias = mask_ops.mask_to_bias(
            pad_mask[:, None, None, :], jnp.float32)
        cos, sin = rope_ops.rope_cos_sin(
            cfg.max_position, cfg.n_state // cfg.n_head, dtype=x.dtype)
        for i in range(cfg.n_layer):
            x = ResidualAttentionBlock(
                cfg.n_state, cfg.n_head, cfg.fsmn_kernel,
                name=f"blocks_{i}")(x, attn_bias,
                                    pad_mask.astype(x.dtype), cos, sin)
        return x, out_len


class S3TokenizerV2(nn.Module):
    """Encoder + FSQ -> discrete 25 Hz speech tokens."""
    cfg: S3TokenizerConfig = S3TokenizerConfig()

    @nn.compact
    def __call__(self, mel: jnp.ndarray, mel_len: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        hidden, code_len = AudioEncoderV2(self.cfg, name="encoder")(mel, mel_len)
        h8 = nn.Dense(8, name="project_down")(hidden)
        codes = fsq_ops.fsq_encode(h8)
        return codes, code_len


# ---------------------------------------------------------------------------
# v1 variant: whisper encoder (abs sinusoidal pos, no RoPE/FSMN) + vanilla
# Euclidean VQ (reference: s3tokenizer/model.py:162-350; codebook 4096;
# stride 2 for the 25 Hz model, 1 for 50 Hz)
# ---------------------------------------------------------------------------

def sinusoid_table(length: int, channels: int) -> jnp.ndarray:
    """Whisper sinusoids (reference: s3tokenizer/model.py:67-75)."""
    import numpy as _np
    log_inc = _np.log(10000) / (channels // 2 - 1)
    inv = _np.exp(-log_inc * _np.arange(channels // 2))
    ang = _np.arange(length)[:, None] * inv[None, :]
    return jnp.asarray(_np.concatenate([_np.sin(ang), _np.cos(ang)], 1),
                       jnp.float32)


class PlainAttention(nn.Module):
    """Whisper attention (no rope, no fsmn) — v1 blocks."""
    n_state: int
    n_head: int

    @nn.compact
    def __call__(self, x, attn_bias):
        b, t, c = x.shape
        d = c // self.n_head
        q = nn.Dense(c, name="query")(x).reshape(b, t, self.n_head, d)
        k = nn.Dense(c, use_bias=False, name="key")(x).reshape(
            b, t, self.n_head, d)
        v = nn.Dense(c, name="value")(x).reshape(b, t, self.n_head, d)
        scale = d ** -0.25
        scores = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k * scale)
        scores = (scores + attn_bias).astype(jnp.float32)
        w = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", w, v).reshape(b, t, c)
        return nn.Dense(c, name="out")(o)


class V1Block(nn.Module):
    n_state: int
    n_head: int

    @nn.compact
    def __call__(self, x, attn_bias):
        h = nn.LayerNorm(name="attn_ln")(x)
        x = x + PlainAttention(self.n_state, self.n_head, name="attn")(
            h, attn_bias)
        h = nn.LayerNorm(name="mlp_ln")(x)
        h = nn.Dense(self.n_state * 4, name="mlp1")(h)
        h = jax.nn.gelu(h, approximate=False)
        return x + nn.Dense(self.n_state, name="mlp2")(h)


class S3TokenizerV1(nn.Module):
    """v1 tokenizer: whisper encoder + Euclidean VQ codebook.

    stride=2 -> 25 Hz ('speech_tokenizer_v1_25hz'), stride=1 -> 50 Hz.
    """
    cfg: S3TokenizerConfig = S3TokenizerConfig(codebook_size=4096)
    stride: int = 2

    @nn.compact
    def __call__(self, mel: jnp.ndarray, mel_len: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        cfg = self.cfg
        t = mel.shape[1]
        m = mask_ops.make_non_pad_mask(mel_len, t).astype(mel.dtype)
        x = nn.Conv(cfg.n_state, (3,), strides=(self.stride,),
                    padding=[(1, 1)], name="conv1")(mel * m[..., None])
        x = jax.nn.gelu(x, approximate=False)
        out_len = (mel_len - 1) // self.stride + 1
        m = mask_ops.make_non_pad_mask(out_len, x.shape[1]).astype(x.dtype)
        x = nn.Conv(cfg.n_state, (3,), strides=(2,),
                    padding=[(1, 1)], name="conv2")(x * m[..., None])
        x = jax.nn.gelu(x, approximate=False)
        out_len = (out_len - 1) // 2 + 1

        x = x + sinusoid_table(x.shape[1], cfg.n_state).astype(x.dtype)
        pad = mask_ops.make_non_pad_mask(out_len, x.shape[1])
        bias = mask_ops.mask_to_bias(pad[:, None, None, :], jnp.float32)
        for i in range(cfg.n_layer):
            x = V1Block(cfg.n_state, cfg.n_head, name=f"blocks_{i}")(x, bias)

        codebook = self.param("codebook", nn.initializers.normal(1.0),
                              (cfg.codebook_size, cfg.n_state))
        # nearest-neighbor code: argmax of -(|x|^2 - 2 x.e + |e|^2)
        dist = (-jnp.sum(x * x, -1, keepdims=True)
                + 2 * jnp.einsum("btd,cd->btc", x, codebook)
                - jnp.sum(codebook * codebook, -1)[None, None, :])
        codes = jnp.argmax(dist, axis=-1).astype(jnp.int32)
        return codes, out_len


# ---------------------------------------------------------------------------
# Long-audio windowing (host-side orchestration around the jitted encoder)
# ---------------------------------------------------------------------------

WINDOW_FRAMES = 3000      # 30 s of 100 Hz mel frames
OVERLAP_FRAMES = 400      # 4 s
STRIDE_FRAMES = WINDOW_FRAMES - OVERLAP_FRAMES
TOKEN_RATE = 25
OVERLAP_DROP_TOKENS = (4 // 2) * TOKEN_RATE  # 50 tokens per merged side


def split_windows(mel: np.ndarray, mel_len: int):
    """(T, n_mels) -> list of (<=3000, n_mels) windows with 4 s overlap."""
    wins = []
    start = 0
    while start < mel_len:
        end = min(start + WINDOW_FRAMES, mel_len)
        wins.append(mel[start:end])
        if end >= mel_len:
            break
        start += STRIDE_FRAMES
    return wins


def merge_window_tokens(segments: list[list[int]]) -> list[int]:
    """Drop half the overlap tokens from each junction side
    (reference: utils.py:367-390)."""
    merged: list[int] = []
    for i, toks in enumerate(segments):
        lo = 0 if i == 0 else OVERLAP_DROP_TOKENS
        hi = len(toks) if i == len(segments) - 1 else len(toks) - OVERLAP_DROP_TOKENS
        merged.extend(toks[lo:hi])
    return merged


def quantize_long(apply_fn, params, mel: np.ndarray, mel_len: int):
    """Tokenize arbitrarily long mel (T, n_mels) by windowed batch encode.

    apply_fn(params, mel_batch, mel_len_batch) -> (codes, code_len);
    all windows are padded to WINDOW_FRAMES and encoded in ONE batched
    call so the TPU sees a single static-shape launch.
    """
    if mel.shape[0] < mel_len:
        raise ValueError(f"mel has {mel.shape[0]} frames < mel_len={mel_len}")
    wins = split_windows(mel, mel_len)
    lens = np.array([w.shape[0] for w in wins], np.int32)
    batch = np.zeros((len(wins), WINDOW_FRAMES, mel.shape[1]), mel.dtype)
    for i, w in enumerate(wins):
        batch[i, : w.shape[0]] = w
    codes, code_len = apply_fn(params, jnp.asarray(batch), jnp.asarray(lens))
    codes, code_len = np.asarray(codes), np.asarray(code_len)
    segments = [codes[i, : code_len[i]].tolist() for i in range(len(wins))]
    if len(segments) == 1:
        return segments[0]
    return merge_window_tokens(segments)


# ---------------------------------------------------------------------------
# Weight import from the reference torch/ONNX checkpoints
# ---------------------------------------------------------------------------

def params_from_torch_state(state: dict) -> dict:
    """Map a reference S3TokenizerV2 state_dict (numpy arrays) to our params.

    Accepts keys like 'encoder.conv1.weight', 'encoder.blocks.0.attn.query.weight',
    'quantizer._codebook.project_down.weight'. torch Conv1d weights are
    (out, in, k) -> flax (k, in, out); Linear (out, in) -> (in, out).
    """
    p: dict = {"encoder": {}}
    enc = p["encoder"]

    def conv_w(w):
        return np.transpose(w, (2, 1, 0))

    def dense_w(w):
        return np.transpose(w, (1, 0))

    enc["conv1"] = {"kernel": conv_w(state["encoder.conv1.weight"]),
                    "bias": state["encoder.conv1.bias"]}
    enc["conv2"] = {"kernel": conv_w(state["encoder.conv2.weight"]),
                    "bias": state["encoder.conv2.bias"]}
    n_layer = 1 + max(int(k.split(".")[2]) for k in state
                      if k.startswith("encoder.blocks."))
    for i in range(n_layer):
        pre = f"encoder.blocks.{i}."
        blk = {
            "attn_ln": {"scale": state[pre + "attn_ln.weight"],
                        "bias": state[pre + "attn_ln.bias"]},
            "mlp_ln": {"scale": state[pre + "mlp_ln.weight"],
                       "bias": state[pre + "mlp_ln.bias"]},
            "mlp1": {"kernel": dense_w(state[pre + "mlp.0.weight"]),
                     "bias": state[pre + "mlp.0.bias"]},
            "mlp2": {"kernel": dense_w(state[pre + "mlp.2.weight"]),
                     "bias": state[pre + "mlp.2.bias"]},
            "attn": {
                "query": {"kernel": dense_w(state[pre + "attn.query.weight"]),
                          "bias": state[pre + "attn.query.bias"]},
                "key": {"kernel": dense_w(state[pre + "attn.key.weight"])},
                "value": {"kernel": dense_w(state[pre + "attn.value.weight"]),
                          "bias": state[pre + "attn.value.bias"]},
                "out": {"kernel": dense_w(state[pre + "attn.out.weight"]),
                        "bias": state[pre + "attn.out.bias"]},
                # torch depthwise Conv1d weight (C, 1, k) -> flax (k, 1, C)
                "fsmn_block": {"kernel": np.transpose(
                    state[pre + "attn.fsmn_block.weight"], (2, 1, 0))},
            },
        }
        enc[f"blocks_{i}"] = blk
    p["project_down"] = {
        "kernel": dense_w(state["quantizer._codebook.project_down.weight"]),
        "bias": state["quantizer._codebook.project_down.bias"]}
    return {"params": p}
