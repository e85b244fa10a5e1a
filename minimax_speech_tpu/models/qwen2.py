"""Qwen2 decoder-only backbone in flax (stage-1 LM body).

Replaces the HF Qwen2ForCausalLM the reference wraps
(reference: speech/cosyvoice/llm/llm.py:343-371). Qwen2-0.5B geometry:
hidden 896, 24 layers, 14 heads / 2 KV heads (GQA), head_dim 64,
intermediate 4864, rope theta 1e6, RMSNorm eps 1e-6.

TPU-first decode design: the KV cache is a preallocated
(n_layers, B, max_len, n_kv, head_dim) buffer; prefill writes the
(right-padded) prompt at slots [0, P) and marks validity; each decode
step writes one slot at a traced offset via dynamic-update and attends
over the full buffer with a validity bias. RoPE is applied at write
time with the *true* token position, so storage slots and positions
decouple — padded prompts need no re-packing. This keeps the whole
decode loop inside one jitted lax.while_loop (see models/llm.py) with
static shapes.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from minimax_speech_tpu.ops import rope as rope_ops


@dataclass(frozen=True)
class Qwen2Config:
    vocab_size: int = 151936
    hidden_size: int = 896
    n_layers: int = 24
    n_heads: int = 14
    n_kv_heads: int = 2
    head_dim: int = 64
    intermediate_size: int = 4864
    rope_theta: float = 1e6
    rms_eps: float = 1e-6
    dtype: Any = jnp.float32
    quantized: bool = False  # int8 weight-only projections (decode path)
    act_quant: bool = True   # + dynamic per-row int8 activations (W8A8):
    # an int8 x int8 dot runs natively on the MXU and streams int8 weights
    # from HBM; weight-only int8 with bf16 activations makes XLA
    # materialize a dequantized weight copy, forfeiting the bandwidth win
    remat: bool = False      # jax.checkpoint each layer (training memory)
    # what the per-layer checkpoint may keep: "none" recomputes the whole
    # layer in the backward pass (minimum memory); "dots" keeps weight-
    # matmul outputs (no batch-dim dots, i.e. not attention scores) so the
    # backward pass skips recomputing the MXU-heavy projections — the
    # usual transformer sweet spot when activations fit.
    # Default "dots": measured round 5 on v5e (batch 16 x seq 512, bf16),
    # 330.5 ms/step dots vs 364.4 ms full recompute (and 271.1 ms with
    # remat off — remat itself stays opt-in for memory headroom).
    remat_policy: str = "dots"
    # training attention kernel: None = auto (splash on TPU when T is a
    # multiple of 128), "splash" = force, "xla" = force the einsum path.
    # The XLA fallback materializes (B, H, T, T) fp32 scores (224 MB per
    # layer at batch 16 x seq 512) — splash never does, in either pass.
    flash_train: Any = None


class QuantDense(nn.Module):
    """int8 Dense: kernel stored int8 with per-output-channel scales.

    act_quant=True (default): dynamic per-row symmetric int8 activation
    quantization -> an int8 x int8 MXU dot accumulating in int32 that
    STREAMS int8 weights from HBM (the AR decode is
    weight-bandwidth-bound, so this is the real 2x over bf16).
    act_quant=False: weight-only path (bf16 activations) — simpler
    numerics, but XLA materializes a dequantized weight copy for the
    dot, so the bandwidth win is mostly lost."""
    features: int
    use_bias: bool = True
    act_quant: bool = True

    @nn.compact
    def __call__(self, x):
        k = self.param("kernel_q",
                       lambda key, s: jnp.zeros(s, jnp.int8),
                       (x.shape[-1], self.features))
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        if self.act_quant:
            amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
            x_scale = jnp.maximum(amax, 1e-8) / 127.0
            # clamp before the int8 cast: with bf16 activations the
            # row-max element can round to 128, and float->int out of
            # range is implementation-defined (typically wraps to -128,
            # sign-flipping the largest-magnitude activation)
            xq = jnp.clip(jnp.round(x / x_scale), -127, 127).astype(jnp.int8)
            y = jax.lax.dot_general(
                xq, k, (((xq.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            y = (y.astype(jnp.float32) * x_scale.astype(jnp.float32)
                 * scale).astype(x.dtype)
        else:
            y = jnp.dot(x, k.astype(x.dtype),
                        preferred_element_type=jnp.float32)
            y = (y * scale).astype(x.dtype)
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros,
                               (self.features,))
        return y


def _dense(cfg: Qwen2Config, features: int, use_bias: bool, name: str):
    if cfg.quantized:
        return QuantDense(features, use_bias=use_bias,
                          act_quant=cfg.act_quant, name=name)
    return nn.Dense(features, use_bias=use_bias, name=name)


def quantize_lm_params(params, scope: str = "llm"):
    """Convert the Qwen2 projection kernels under params[scope] to
    int8 (+ per-channel scales). Layernorms/embeddings/biases stay as-is.
    Returns a new params pytree matching quantized=True modules."""
    import numpy as _np

    def quantize_kernel(w):
        w = _np.asarray(w, _np.float32)
        s = _np.max(_np.abs(w), axis=0) / 127.0
        s = _np.maximum(s, 1e-12)
        q = _np.clip(_np.round(w / s), -127, 127).astype(_np.int8)
        return q, s.astype(_np.float32)

    proj_names = {"q_proj", "k_proj", "v_proj", "o_proj",
                  "gate_proj", "up_proj", "down_proj"}

    def rec(node):
        if not isinstance(node, dict):
            return node
        out = {}
        for k, v in node.items():
            if k in proj_names and isinstance(v, dict) and "kernel" in v:
                q, s = quantize_kernel(v["kernel"])
                nv = {"kernel_q": q, "scale": s}
                if "bias" in v:
                    nv["bias"] = v["bias"]
                out[k] = nv
            else:
                out[k] = rec(v)
        return out

    new = dict(params)
    new[scope] = rec(params[scope])
    return new


class RMSNorm(nn.Module):
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        scale = self.param("weight", nn.initializers.ones, (x.shape[-1],))
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1,
                       keepdims=True)
        x = x * jax.lax.rsqrt(var + self.eps).astype(x.dtype)
        return x * scale


class Qwen2Attention(nn.Module):
    cfg: Qwen2Config

    @nn.compact
    def __call__(self, x, positions, attn_bias, cache=None, cache_offset=None,
                 lengths=None, use_splash=False):
        """x: (B, T, C); positions: (B, T) int32 true token positions;
        attn_bias: (B, 1, T, K) additive (None under splash); cache:
        optional (k, v) each (B, max_len, n_kv, d) for THIS layer;
        lengths: (B,) true lengths (splash padding via segment ids).
        Returns (out, new_cache)."""
        c = self.cfg
        b, t, _ = x.shape
        h, kvh, d = c.n_heads, c.n_kv_heads, c.head_dim
        q = _dense(c, h * d, True, "q_proj")(x).reshape(b, t, h, d)
        k = _dense(c, kvh * d, True, "k_proj")(x).reshape(b, t, kvh, d)
        v = _dense(c, kvh * d, True, "v_proj")(x).reshape(b, t, kvh, d)

        # rope at true positions (flattened batch positions)
        cos, sin = rope_ops.rope_cos_sin(
            0, d, c.rope_theta,
            positions=positions.reshape(-1).astype(jnp.float32),
            dtype=x.dtype)
        cos = cos.reshape(b, t, 1, d)
        sin = sin.reshape(b, t, 1, d)
        q = q * cos + rope_ops.rotate_half(q) * sin
        k = k * cos + rope_ops.rotate_half(k) * sin

        if cache is not None:
            ck, cv = cache
            if jnp.ndim(cache_offset) == 1:
                # per-row write offsets (continuous batching: each lane
                # is at its own decode position); t is 1 there
                upd = jax.vmap(lambda c, x, i: jax.lax.dynamic_update_slice(
                    c, x, (i, 0, 0)))
                ck = upd(ck, k, cache_offset)
                cv = upd(cv, v, cache_offset)
            else:
                ck = jax.lax.dynamic_update_slice(ck, k,
                                                  (0, cache_offset, 0, 0))
                cv = jax.lax.dynamic_update_slice(cv, v,
                                                  (0, cache_offset, 0, 0))
            keys, values = ck, cv
            new_cache = (ck, cv)
        else:
            keys, values = k, v
            new_cache = None

        # GQA: repeat kv heads (XLA folds the broadcast into the dots; an
        # explicit grouped 5-d einsum measured ~20% slower end-to-end)
        rep = h // kvh
        keys_r = jnp.repeat(keys, rep, axis=2)
        values_r = jnp.repeat(values, rep, axis=2)
        if use_splash:
            # fused fwd+bwd kernel: causal + per-sample padding, no
            # (B, H, T, T) score tensor in HBM (training path only)
            from minimax_speech_tpu.kernels.splash import \
                splash_causal_attention
            o = splash_causal_attention(
                q.transpose(0, 2, 1, 3), keys_r.transpose(0, 2, 1, 3),
                values_r.transpose(0, 2, 1, 3), lengths,
                scale=1.0 / np.sqrt(d))
            o = o.transpose(0, 2, 1, 3).reshape(b, t, h * d)
            return _dense(c, c.hidden_size, False, "o_proj")(o), new_cache
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, keys_r) / np.sqrt(d)
        scores = scores.astype(jnp.float32) + attn_bias
        w = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", w, values_r).reshape(b, t, h * d)
        return _dense(c, c.hidden_size, False, "o_proj")(o), new_cache


class Qwen2MLP(nn.Module):
    cfg: Qwen2Config

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        g = _dense(c, c.intermediate_size, False, "gate_proj")(x)
        u = _dense(c, c.intermediate_size, False, "up_proj")(x)
        return _dense(c, c.hidden_size, False,
                      "down_proj")(nn.silu(g) * u)


class Qwen2Layer(nn.Module):
    cfg: Qwen2Config

    @nn.compact
    def __call__(self, x, positions, attn_bias, cache=None, cache_offset=None,
                 lengths=None, use_splash=False):
        h = RMSNorm(self.cfg.rms_eps, name="input_layernorm")(x)
        a, new_cache = Qwen2Attention(self.cfg, name="self_attn")(
            h, positions, attn_bias, cache, cache_offset, lengths, use_splash)
        x = x + a
        h = RMSNorm(self.cfg.rms_eps, name="post_attention_layernorm")(x)
        return x + Qwen2MLP(self.cfg, name="mlp")(h), new_cache


def _use_splash_train(cfg: Qwen2Config, t: int) -> bool:
    """Static choice of the training attention kernel (see
    Qwen2Config.flash_train). Splash needs T % 128 == 0; auto avoids it
    on CPU where the kernel only runs interpreted."""
    mode = cfg.flash_train
    if mode in (False, "xla"):
        return False
    if t % 128 != 0 or t < 128:
        return False
    if mode in (True, "splash"):
        return True
    try:
        # auto: on TPU, single-device always; multi-device when the
        # train harness has registered its mesh (kernels/splash then
        # runs the kernel per-device under shard_map — without a mesh a
        # Pallas call has no GSPMD partitioning rule and XLA would
        # replicate it, correct but slow)
        from minimax_speech_tpu.kernels import splash as _splash
        return (jax.default_backend() != "cpu"
                and (jax.device_count() == 1
                     or _splash._MESH is not None))
    except Exception:  # pragma: no cover - backend probe never fatal
        return False


class Qwen2Model(nn.Module):
    """Backbone over input embeddings (the TTS LM feeds mixed
    text/speech/special embeddings, never raw token ids)."""
    cfg: Qwen2Config = Qwen2Config()

    @nn.compact
    def __call__(self, inputs_embeds, positions, attn_bias,
                 cache=None, cache_offset=None, lengths=None):
        """cache: optional (k, v) each (n_layers, B, max_len, n_kv, d);
        lengths: (B,) true lengths — when given on the cache-less
        (training) path with attn_bias=None, the attention mask is
        handled here (splash segment ids, or a causal+pad bias built
        once for the XLA fallback)."""
        x = inputs_embeds
        use_splash = (cache is None and lengths is not None
                      and _use_splash_train(self.cfg,
                                            inputs_embeds.shape[1]))
        if attn_bias is None and not use_splash:
            if lengths is None:
                raise ValueError("need attn_bias or lengths")
            t = inputs_embeds.shape[1]
            pad = jnp.arange(t)[None, :] < lengths[:, None]
            attn_bias = causal_bias(pad)
        if use_splash:
            attn_bias = None  # never materialize the (B,1,T,T) bias
        new_k, new_v = [], []
        # remat trades recompute for activation memory on the training
        # path (no cache); decode keeps the plain layer
        layer_cls = Qwen2Layer
        if self.cfg.remat and cache is None:
            if self.cfg.remat_policy not in ("none", "dots"):
                # a typo ("dot") silently behaving as full recompute would
                # invalidate throughput A/Bs — fail loudly instead
                raise ValueError(
                    f"remat_policy={self.cfg.remat_policy!r} not in "
                    "{'none', 'dots'}")
            policy = None
            if self.cfg.remat_policy == "dots":
                policy = (jax.checkpoint_policies
                          .dots_with_no_batch_dims_saveable)
            layer_cls = nn.remat(Qwen2Layer, static_argnums=(4, 5, 7),
                                 policy=policy)
        for i in range(self.cfg.n_layers):
            layer_cache = None
            if cache is not None:
                layer_cache = (cache[0][i], cache[1][i])
            x, nc = layer_cls(self.cfg, name=f"layers_{i}")(
                x, positions, attn_bias, layer_cache, cache_offset,
                lengths, use_splash)
            if nc is not None:
                new_k.append(nc[0])
                new_v.append(nc[1])
        x = RMSNorm(self.cfg.rms_eps, name="norm")(x)
        if cache is not None:
            return x, (jnp.stack(new_k), jnp.stack(new_v))
        return x, None


def make_cache(cfg: Qwen2Config, batch: int, max_len: int, dtype=jnp.float32):
    shape = (cfg.n_layers, batch, max_len, cfg.n_kv_heads, cfg.head_dim)
    return (jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


def causal_bias(pad_mask: jnp.ndarray) -> jnp.ndarray:
    """(B, T) bool -> (B, 1, T, T) additive causal+pad bias."""
    t = pad_mask.shape[1]
    causal = jnp.tril(jnp.ones((t, t), bool))
    m = causal[None, :, :] & pad_mask[:, None, :]
    return jnp.where(m, 0.0, -1e10)[:, None].astype(jnp.float32)


def cache_bias(valid: jnp.ndarray) -> jnp.ndarray:
    """(B, K) cache-slot validity -> (B, 1, 1, K) additive bias for
    single-token decode steps."""
    return jnp.where(valid, 0.0, -1e10)[:, None, None, :].astype(jnp.float32)


# ---------------------------------------------------------------------------
# HF checkpoint import
# ---------------------------------------------------------------------------

def params_from_hf_state(state: dict, cfg: Qwen2Config) -> dict:
    """Map an HF Qwen2ForCausalLM state_dict (numpy) to Qwen2Model params.

    Handles 'model.' prefixes; the embedding table and (tied) lm_head are
    returned separately: (params, embed_table, lm_head_or_None).
    """
    def dw(w):
        return np.transpose(w, (1, 0))

    def get(k):
        return state.get("model." + k, state.get(k))

    p: dict = {}
    for i in range(cfg.n_layers):
        pre = f"layers.{i}."
        p[f"layers_{i}"] = {
            "input_layernorm": {"weight": get(pre + "input_layernorm.weight")},
            "post_attention_layernorm": {
                "weight": get(pre + "post_attention_layernorm.weight")},
            "self_attn": {
                "q_proj": {"kernel": dw(get(pre + "self_attn.q_proj.weight")),
                           "bias": get(pre + "self_attn.q_proj.bias")},
                "k_proj": {"kernel": dw(get(pre + "self_attn.k_proj.weight")),
                           "bias": get(pre + "self_attn.k_proj.bias")},
                "v_proj": {"kernel": dw(get(pre + "self_attn.v_proj.weight")),
                           "bias": get(pre + "self_attn.v_proj.bias")},
                "o_proj": {"kernel": dw(get(pre + "self_attn.o_proj.weight"))},
            },
            "mlp": {
                "gate_proj": {"kernel": dw(get(pre + "mlp.gate_proj.weight"))},
                "up_proj": {"kernel": dw(get(pre + "mlp.up_proj.weight"))},
                "down_proj": {"kernel": dw(get(pre + "mlp.down_proj.weight"))},
            },
        }
    p["norm"] = {"weight": get("norm.weight")}
    embed = get("embed_tokens.weight")
    lm_head = state.get("lm_head.weight")
    return {"params": p}, embed, lm_head
