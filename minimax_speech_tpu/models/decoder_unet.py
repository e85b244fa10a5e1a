"""Causal conditional UNet — the CFM velocity estimator.

1-D "UNet" over latent frames; with the production config
(speech/config.yaml:105-117: channels=[256], n_blocks=4,
num_mid_blocks=12, heads 8x64, act gelu) there is no actual down/up
sampling — it is a flat stack: 1 down stage, 12 mid stages, 1 up stage
with a skip concat, each stage = causal resnet block + 4 transformer
blocks. Input packs [x(80), mu(80), spks(80), cond(80)] = 320 channels.
Reference: speech/cosyvoice/flow/decoder.py:294-496 +
matcha/models/components/{decoder,transformer}.py.

TPU-first: channel-last (B, T, C); the whole estimator is one jit
region; attention masks are precomputed (full or chunk-causal for
streaming) and shared across stages; timestep embedding is broadcast.

Chunked streaming support: every causal conv carries a 2-frame input
tail cache and every transformer block a sliding-window KV cache of
`window` frames — the estimator equivalent of forward_chunk's
att_cache/cnn_cache (reference: transformer/encoder.py:184-274; the
reference decoder's own streaming uses finite left chunks,
flow/decoder.py:306-307 num_decoding_left_chunks=2). Two extra modes:

  * collect: full forward over the (padded) prompt that additionally
    returns the cache pytree sliced at the prompt's valid length;
  * chunk: forward over one chunk against the cache, O(chunk) work.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from minimax_speech_tpu.ops import masks as mask_ops


@dataclass(frozen=True)
class DecoderUNetConfig:
    in_channels: int = 320       # packed x+mu+spk+cond
    out_channels: int = 80
    channels: Tuple[int, ...] = (256,)
    attention_head_dim: int = 64
    n_blocks: int = 4            # transformer blocks per stage
    num_mid_blocks: int = 12
    num_heads: int = 8
    act_fn: str = "gelu"
    static_chunk_size: int = 50  # latent frames (2x token chunk)
    num_left_chunks: int = -1
    # Pallas flash attention (block-sparse chunk masks). None = auto:
    # on exactly where it measures faster than XLA on v5e
    # (scripts/bench_attention.py, chained-program timing): long-form
    # windowed attention T>=2048 with a bounded left window (1.15x at
    # T=2048, 1.49x at T=4096); XLA wins at production one-shot shapes
    # T<=1024 (0.76-0.96x) so auto leaves those on XLA.
    use_flash_attention: Optional[bool] = None
    # which kernel serves the flash region: "splash" (fwd+bwd — safe
    # under grad, so long-form TRAINING also gets block-sparse
    # attention), "pallas" (custom fwd-only kernel), "xla"
    flash_backend: str = "splash"


def sinusoidal_pos_emb(t: jnp.ndarray, dim: int, scale: float = 1000.0
                       ) -> jnp.ndarray:
    """(B,) timesteps -> (B, dim). Matches matcha SinusoidalPosEmb
    (reference: matcha/models/components/decoder.py:14-29)."""
    half = dim // 2
    emb = np.exp(np.arange(half) * -(np.log(10000.0) / (half - 1)))
    ang = scale * t[:, None].astype(jnp.float32) * jnp.asarray(emb, jnp.float32)[None]
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


def _tail(x: jnp.ndarray, n: int, valid_len) -> jnp.ndarray:
    """Last n frames of x's valid prefix (valid_len traced; left
    zero-pad when valid_len < n)."""
    b, t, c = x.shape
    padded = jnp.concatenate([jnp.zeros((b, n, c), x.dtype), x], axis=1)
    return jax.lax.dynamic_slice(padded, (0, valid_len, 0), (b, n, c))


class TimestepEmbedding(nn.Module):
    """Dense -> silu -> Dense (reference: matcha decoder.py:73-116)."""
    dim: int

    @nn.compact
    def __call__(self, t_emb):
        h = nn.Dense(self.dim, name="linear_1")(t_emb)
        h = nn.silu(h)
        return nn.Dense(self.dim, name="linear_2")(h)


class CausalBlock1D(nn.Module):
    """Causal conv(k=3) -> LayerNorm -> Mish, masked in/out
    (reference: flow/decoder.py:66-80). `ctx` carries the chunked-mode
    state keyed by `key`: None = plain left-zero-pad;
    ("collect", plen, out) = also stash the 2-frame input tail at plen
    into out[key]; ("chunk", cache, out) = prepend the cached tail
    cache[key] instead of zero padding."""
    dim_out: int

    @nn.compact
    def __call__(self, x, mask, ctx=None, key: str = ""):
        xin = x * mask[..., None]
        if ctx is not None and ctx[0] == "chunk":
            _, cache, out = ctx
            h = jnp.concatenate([cache[key], xin], axis=1)
            out[key] = xin[:, -2:]
        else:
            h = jnp.pad(xin, ((0, 0), (2, 0), (0, 0)))
            if ctx is not None:
                _, plen, out = ctx
                out[key] = _tail(xin, 2, plen)
        h = nn.Conv(self.dim_out, (3,), padding="VALID", name="conv")(h)
        h = nn.LayerNorm(name="norm")(h)
        h = h * jnp.tanh(jax.nn.softplus(h))  # mish
        return h * mask[..., None]


class CausalResnetBlock1D(nn.Module):
    """Two causal blocks + timestep shift + 1x1 residual conv
    (reference: flow/decoder.py:83-88, matcha decoder.py:46-62)."""
    dim_out: int

    @nn.compact
    def __call__(self, x, mask, t_emb, ctx=None, key: str = ""):
        h = CausalBlock1D(self.dim_out, name="block1")(
            x, mask, ctx, f"{key}.block1")
        shift = nn.Dense(self.dim_out, name="mlp")(
            t_emb * jnp.tanh(jax.nn.softplus(t_emb)))
        h = h + shift[:, None, :]
        h = CausalBlock1D(self.dim_out, name="block2")(
            h, mask, ctx, f"{key}.block2")
        return h + nn.Dense(self.dim_out, name="res_conv")(x * mask[..., None])


class UNetTransformerBlock(nn.Module):
    """LayerNorm -> MHA (no qkv bias) -> LayerNorm -> GELU-FFN, residuals.
    Matches diffusers BasicTransformerBlock with activation_fn='gelu'
    (reference: matcha/models/components/transformer.py:138-316)."""
    num_heads: int
    head_dim: int

    @nn.compact
    def __call__(self, x, attn_bias, flash_ctx=None, kv_ctx=None):
        b, t, c = x.shape
        inner = self.num_heads * self.head_dim
        h = nn.LayerNorm(name="norm1")(x)
        q = nn.Dense(inner, use_bias=False, name="to_q")(h)
        k = nn.Dense(inner, use_bias=False, name="to_k")(h)
        v = nn.Dense(inner, use_bias=False, name="to_v")(h)
        q = q.reshape(b, t, self.num_heads, self.head_dim)
        k = k.reshape(b, t, self.num_heads, self.head_dim)
        v = v.reshape(b, t, self.num_heads, self.head_dim)
        if kv_ctx is not None and kv_ctx[0] == "chunk":
            _, cache, out, name = kv_ctx
            w = cache[name].shape[2]
            kc = jnp.concatenate([cache[name][0].astype(k.dtype), k], axis=1)
            vc = jnp.concatenate([cache[name][1].astype(v.dtype), v], axis=1)
            out[name] = jnp.stack([kc, vc])[:, :, -w:].astype(cache[name].dtype)
            scores = jnp.einsum("bqhd,bkhd->bhqk", q, kc) \
                / np.sqrt(self.head_dim)
            scores = scores.astype(jnp.float32) + attn_bias
            wts = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
            o = jnp.einsum("bhqk,bkhd->bqhd", wts, vc).reshape(b, t, inner)
        elif flash_ctx is not None:
            if flash_ctx.get("backend", "pallas") == "splash":
                # differentiable block-sparse kernel: also serves the
                # TRAINING path at long T (fwd+bwd)
                from minimax_speech_tpu.kernels.splash import \
                    splash_chunk_attention
                o = splash_chunk_attention(
                    jnp.swapaxes(q, 1, 2), jnp.swapaxes(k, 1, 2),
                    jnp.swapaxes(v, 1, 2), kv_len=flash_ctx["kv_len"],
                    chunk=flash_ctx["chunk"],
                    left_chunks=flash_ctx["left_chunks"])
            else:
                from minimax_speech_tpu.kernels.flash_attention import \
                    flash_attention
                o = flash_attention(
                    jnp.swapaxes(q, 1, 2), jnp.swapaxes(k, 1, 2),
                    jnp.swapaxes(v, 1, 2), kv_len=flash_ctx["kv_len"],
                    chunk=flash_ctx["chunk"],
                    left_chunks=flash_ctx["left_chunks"])
            o = jnp.swapaxes(o, 1, 2).reshape(b, t, inner)
        else:
            scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) \
                / np.sqrt(self.head_dim)
            scores = scores.astype(jnp.float32) + attn_bias
            wts = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
            o = jnp.einsum("bhqk,bkhd->bqhd", wts, v).reshape(b, t, inner)
            if kv_ctx is not None:  # collect
                _, plen, out, name, window = kv_ctx
                kt = _tail(k.reshape(b, t, inner), window, plen)
                vt = _tail(v.reshape(b, t, inner), window, plen)
                out[name] = jnp.stack([
                    kt.reshape(b, window, self.num_heads, self.head_dim),
                    vt.reshape(b, window, self.num_heads, self.head_dim)])
        x = x + nn.Dense(c, name="to_out")(o)

        h = nn.LayerNorm(name="norm3")(x)
        h = nn.Dense(4 * c, name="ff_in")(h)
        h = jax.nn.gelu(h, approximate=False)
        x = x + nn.Dense(c, name="ff_out")(h)
        return x


class CausalConditionalDecoder(nn.Module):
    cfg: DecoderUNetConfig = DecoderUNetConfig()

    @nn.compact
    def __call__(self, x, mask, mu, t, spks=None, cond=None,
                 streaming: bool = False, collect_len=None,
                 cache=None, cache_offset=None, q_valid=None,
                 window: int = 100, unit_align=None):
        """x, mu, cond: (B, T, 80); mask: (B, T) float; t: (B,);
        spks: (B, 80). Returns velocity (B, T, 80).

        collect_len: traced prompt length — full forward that also
        returns the streaming cache pytree (prefill).
        cache/cache_offset/q_valid: chunked forward against the cache
        (returns (velocity, new_cache)); `window` is the sliding KV
        window in frames and must match the cache.
        unit_align: traced prompt length — with streaming=True, use the
        prompt-anchored unit grid limited to `window` left frames (the
        full-sequence equivalent of the chunked path, for verification)."""
        cfg = self.cfg
        b, tlen, _ = x.shape
        collect = collect_len is not None
        chunked = cache is not None
        cache_out: dict = {}

        t_emb = sinusoidal_pos_emb(t, cfg.in_channels)
        t_emb = TimestepEmbedding(cfg.channels[0] * 4, name="time_mlp")(t_emb)

        feats = [x, mu]
        if spks is not None:
            feats.append(jnp.broadcast_to(spks[:, None, :],
                                          (b, tlen, spks.shape[-1])))
        if cond is not None:
            feats.append(cond)
        h = jnp.concatenate(feats, axis=-1)

        flash_ctx = None
        if chunked:
            # keys = [window tail | current chunk]
            j = jnp.arange(window + tlen)[None, :]
            key_ok = jnp.where(
                j < window,
                (cache_offset - window + j) >= 0,
                (j - window) < q_valid)
            q_ok = (jnp.arange(tlen) < q_valid)[:, None]
            attn_bias = mask_ops.mask_to_bias(
                (key_ok & q_ok)[None, None], jnp.float32)
        else:
            boolmask = mask > 0
            use_flash = cfg.use_flash_attention
            if use_flash is None:  # auto: the measured win region only
                use_flash = (tlen >= 2048 and streaming
                             and cfg.num_left_chunks >= 0
                             and unit_align is None)
            if use_flash and tlen % 128 == 0 and not collect \
                    and cfg.flash_backend != "xla":
                flash_ctx = {"kv_len": jnp.sum(boolmask, axis=1,
                                               dtype=jnp.int32),
                             "chunk": cfg.static_chunk_size if streaming
                             else 0,
                             "left_chunks": cfg.num_left_chunks,
                             "backend": cfg.flash_backend}
                attn_bias = None
            else:
                if streaming and unit_align is not None:
                    attn = (boolmask[:, None, :]
                            & mask_ops.unit_chunk_mask(
                                tlen, unit_align, cfg.static_chunk_size,
                                window))
                elif streaming:
                    attn = mask_ops.add_optional_chunk_mask(
                        boolmask, cfg.static_chunk_size, cfg.num_left_chunks)
                else:
                    attn = mask_ops.add_optional_chunk_mask(boolmask, 0)
                attn_bias = mask_ops.mask_to_bias(attn[:, None, :, :],
                                                  jnp.float32)

        if collect:
            conv_ctx = ("collect", collect_len, cache_out)
        elif chunked:
            conv_ctx = ("chunk", cache, cache_out)
        else:
            conv_ctx = None

        def kv_ctx(name):
            if collect:
                return ("collect", collect_len, cache_out, name, window)
            if chunked:
                return ("chunk", cache, cache_out, name)
            return None

        def cconv(h, dim, name):
            """Stride-1 causal stage conv with tail cache."""
            xin = h * mask[..., None]
            if chunked:
                hin = jnp.concatenate([cache[name], xin], axis=1)
                cache_out[name] = xin[:, -2:]
            else:
                hin = jnp.pad(xin, ((0, 0), (2, 0), (0, 0)))
                if collect:
                    cache_out[name] = _tail(xin, 2, collect_len)
            return nn.Conv(dim, (3,), padding="VALID", name=name)(hin)

        def stage(h, dim, name):
            h = CausalResnetBlock1D(dim, name=f"{name}_resnet")(
                h, mask, t_emb, conv_ctx, f"{name}_resnet")
            for j in range(cfg.n_blocks):
                h = UNetTransformerBlock(
                    cfg.num_heads, cfg.attention_head_dim,
                    name=f"{name}_tf_{j}")(h, attn_bias, flash_ctx,
                                           kv_ctx(f"{name}_tf_{j}"))
            return h

        skips = []
        for i, ch in enumerate(cfg.channels):
            h = stage(h, ch, f"down_{i}")
            skips.append(h)
            # with a single channel stage the reference "downsample" is a
            # stride-1 causal conv (flow/decoder.py:346-349)
            h = cconv(h, ch, f"down_{i}_conv")

        for i in range(cfg.num_mid_blocks):
            h = stage(h, cfg.channels[-1], f"mid_{i}")

        up_channels = tuple(reversed(cfg.channels)) + (cfg.channels[0],)
        for i in range(len(up_channels) - 1):
            skip = skips.pop()
            h = jnp.concatenate([h, skip], axis=-1)
            h = stage(h, up_channels[i + 1], f"up_{i}")
            h = cconv(h, up_channels[i + 1], f"up_{i}_conv")

        h = CausalBlock1D(up_channels[-1], name="final_block")(
            h, mask, conv_ctx, "final_block")
        out = nn.Dense(cfg.out_channels, name="final_proj")(h * mask[..., None])
        out = out * mask[..., None]
        if collect or chunked:
            return out, cache_out
        return out
