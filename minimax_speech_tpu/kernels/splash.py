"""Differentiable chunk-causal attention via TPU splash attention.

The forward-only Pallas kernel (kernels/flash_attention.py) covers
inference; TRAINING at long T (the reference trains flow with dynamic
chunk masks, speech/cosyvoice/utils/mask.py:161-236) needs a backward
pass. Splash attention (jax.experimental.pallas.ops.tpu) ships fwd+bwd
kernels over block-sparse masks, so the O(T*chunk) sparsity of the
chunk pattern is exploited in both directions instead of falling back
to XLA attention with a materialized (B, 1, T, T) bias.

The chunk predicate — q attends k iff k < (q//chunk + 1) * chunk,
optionally limited to `left_chunks` whole chunks back — is dense
numpy at mask-build time (processed once per static shape into splash
MaskInfo, cached), and per-sample padding rides segment ids.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas.ops.tpu.splash_attention import (
    splash_attention_kernel as _sk,
    splash_attention_mask as _sm,
)


def chunk_mask_dense(t: int, chunk: int, left_chunks: int) -> np.ndarray:
    """(T, T) bool: the streaming chunk-causal predicate
    (reference mask semantics: utils/mask.py add_optional_chunk_mask)."""
    q = np.arange(t)[:, None]
    k = np.arange(t)[None, :]
    if chunk <= 0:
        ok = np.ones((t, t), bool)
    else:
        ok = k < (q // chunk + 1) * chunk
        if left_chunks >= 0:
            ok &= k >= (q // chunk - left_chunks) * chunk
    return ok


@functools.lru_cache(maxsize=32)
def _kernel(heads: int, t: int, chunk: int, left_chunks: int,
            interpret: bool):
    if chunk == 1 and left_chunks < 0:
        # chunk size 1 with no left bound IS plain causal (k <= q); the
        # lazy CausalMask skips the dense (T, T) numpy materialization
        head_mask = _sm.CausalMask((t, t))
    else:
        head_mask = _sm.NumpyMask(chunk_mask_dense(t, chunk, left_chunks))
    mask = _sm.MultiHeadMask([head_mask] * heads)
    # the mask-info constants make_splash_mha bakes in must be CONCRETE
    # arrays: built lazily inside a jit trace they would be tracers, and
    # the lru_cache would leak them into later traces
    with jax.ensure_compile_time_eval():
        return _sk.make_splash_mha(mask, head_shards=1, q_seq_shards=1,
                                   interpret=interpret)


# tests set this True so the kernel runs (slowly) on CPU
_INTERPRET = False

# Optional device mesh for SHARDED training: a Pallas call has no GSPMD
# partitioning rule, so under a multi-device mesh XLA would replicate it
# (correct but slow). When the train harness registers its mesh here
# (cli/train.py, __graft_entry__.dryrun_multichip), the splash call runs
# under shard_map — batch over dp, heads over tp — and each device
# executes the kernel on its local block; attention is embarrassingly
# parallel over (batch, heads), so no collectives are needed inside.
_MESH = None


def set_attention_mesh(mesh) -> None:
    """Register (or clear, with None) the mesh splash attention shards
    over. Idempotent; call before tracing the train step."""
    global _MESH
    _MESH = mesh


def _block_specs(mesh, b: int, h: int):
    """(qkv, lengths) PartitionSpecs: batch over dp and heads over tp,
    each only when divisible (shard_map requires exact divisibility)."""
    from jax.sharding import PartitionSpec as P
    dp = mesh.shape.get("dp", 1)
    tp = mesh.shape.get("tp", 1)
    bax = "dp" if dp > 1 and b % dp == 0 else None
    hax = "tp" if tp > 1 and h % tp == 0 else None
    return P(bax, hax, None, None), P(bax)


def splash_chunk_attention(q, k, v, kv_len, chunk: int, left_chunks: int,
                           scale: float | None = None,
                           interpret: bool | None = None):
    """q, k, v: (B, H, T, D); kv_len: (B,) true lengths (pad masked via
    segment ids). Returns (B, H, T, D). Differentiable. Under a
    registered mesh (set_attention_mesh) the kernel runs per-device via
    shard_map."""
    b, h, t, d = q.shape
    scale = scale if scale is not None else 1.0 / np.sqrt(d)
    interpret = _INTERPRET if interpret is None else interpret
    # splash applies no internal scaling; fold it into q
    q = (q * scale).astype(q.dtype)
    # valid tokens -> segment 0, pads -> segment 1 (pads only see pads)
    seg = (jnp.arange(t)[None, :] >= kv_len[:, None]).astype(jnp.int32)

    def batched(kernel):
        def f(qb, kb, vb, sb):
            def one(qi, ki, vi, si):
                return kernel(qi, ki, vi,
                              segment_ids=_sk.SegmentIds(q=si, kv=si))

            return jax.vmap(one)(qb, kb, vb, sb)
        return f

    mesh = _MESH
    if mesh is not None and mesh.size > 1:
        qspec, lspec = _block_specs(mesh, b, h)
        # heads are a LOCAL shard inside shard_map; the kernel must be
        # built OUTSIDE the mapped function (make_splash_mha creates
        # mask-info constants that would leak as tracers if first built
        # inside the shard_map trace and memoized by the lru_cache)
        h_local = h // mesh.shape["tp"] if qspec[1] == "tp" else h
        kernel = _kernel(h_local, t, int(chunk), int(left_chunks),
                         interpret)
        from jax.sharding import PartitionSpec as P
        return jax.shard_map(
            batched(kernel), mesh=mesh,
            in_specs=(qspec, qspec, qspec, P(qspec[0], None)),
            out_specs=qspec,
            # pallas_call carries no varying-manual-axes info; skip the
            # replication check (outputs are fully determined per-shard)
            check_vma=False)(q, k, v, seg)
    kernel = _kernel(h, t, int(chunk), int(left_chunks), interpret)
    return batched(kernel)(q, k, v, seg)


def splash_causal_attention(q, k, v, kv_len, scale: float | None = None,
                            interpret: bool | None = None):
    """Plain causal attention (k <= q) with per-sample padding via
    segment ids. q, k, v: (B, H, T, D); kv_len: (B,). Differentiable —
    this is the LM TRAINING attention (models/qwen2.py): it never
    materializes the (B, H, T, T) fp32 score tensor the XLA fallback
    does (224 MB/layer at batch 16 x seq 512), which is what forced
    full-layer remat and capped training MFU."""
    return splash_chunk_attention(q, k, v, kv_len, chunk=1, left_chunks=-1,
                                  scale=scale, interpret=interpret)
