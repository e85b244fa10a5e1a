"""Device mesh + sharding rules.

The reference scales with DDP/DeepSpeed over NCCL (SURVEY §2.7); here the
equivalents are a jax.sharding Mesh with named axes:

  dp — data parallel (batch sharding; grads all-reduced by XLA)
  tp — tensor parallel (attention heads / MLP hidden sharded)

ZeRO-style optimizer-state sharding = sharding the optimizer state over
dp (see opt_state_shardings): adam moments inherit the parameter's TP
sharding and additionally shard their largest TP-free dimension over the
dp axis, so per-device optimizer bytes shrink ~dp x — the DeepSpeed
zero-2 equivalent (reference: speech/utils/train_utils.py:142-147).
Collectives are inserted by XLA from the NamedSharding annotations and
ride ICI.
"""
from __future__ import annotations

import re
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: Optional[int] = None, tp: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None:
        dp = n // tp
    assert dp * tp == n, f"dp({dp}) * tp({tp}) != devices({n})"
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


# --- parameter partition rules (path regex -> PartitionSpec) ---------------
# Qwen2 TP: q/k/v and gate/up shard the output dim; o_proj/down shard the
# input dim; embeddings shard the vocab dim. Everything else replicated.
_LM_RULES = [
    (r".*(q_proj|k_proj|v_proj|gate_proj|up_proj).*kernel", P(None, "tp")),
    (r".*(q_proj|k_proj|v_proj).*bias", P("tp")),
    (r".*(o_proj|down_proj).*kernel", P("tp", None)),
    (r".*(text_embedding|speech_embedding).*embedding", P("tp", None)),
    (r".*llm_decoder.*kernel", P(None, "tp")),
]

# Flow/UNet TP: transformer qkv + ff sharded like the LM.
_FLOW_RULES = [
    (r".*(to_q|to_k|to_v|ff_in|w_1).*kernel", P(None, "tp")),
    (r".*(to_out|ff_out|w_2).*kernel", P("tp", None)),
]


def _spec_for(path: str, rules) -> P:
    for pat, spec in rules:
        if re.fullmatch(pat, path):
            return spec
    return P()


def param_shardings(mesh: Mesh, params, kind: str = "lm"):
    """Pytree of NamedShardings for params. kind: 'lm' | 'flow' | 'replicated'."""
    rules = {"lm": _LM_RULES, "llm": _LM_RULES, "flow": _FLOW_RULES,
             "replicated": []}[kind]

    def one(path, leaf):
        p = "/".join(str(k.key) if hasattr(k, "key") else str(k)
                     for k in path)
        spec = _spec_for(p, rules)
        # fall back to replication when a dim is not divisible by its
        # mesh axis (e.g. odd vocab/head counts on wide meshes)
        shape = getattr(leaf, "shape", ())
        for dim, axis in enumerate(spec):
            if axis is None:
                continue
            if dim >= len(shape) or shape[dim] % mesh.shape[axis] != 0:
                return NamedSharding(mesh, P())
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(one, params)


def batch_sharding(mesh: Mesh):
    """Shard leading (batch) dim over dp."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                    for k in path)


def opt_state_shardings(mesh: Mesh, opt_state_shape, params_shardings,
                        zero_axis: str = "dp"):
    """Shardings for an optimizer state pytree — the ZeRO-2 equivalent
    (DeepSpeed zero stage 2; reference: speech/utils/train_utils.py:142-147,
    194-209). Adam moments embed param-shaped subtrees: any opt leaf whose
    path ends with a parameter's path inherits that parameter's TP sharding
    AND is additionally sharded over `zero_axis` (dp) along its largest
    not-yet-sharded divisible dimension, so per-device optimizer bytes
    shrink ~dp x. XLA turns the resulting layouts into reduce-scatter /
    all-gather collectives around the optimizer update. Non-param leaves
    (step counters, schedule state) replicate."""
    flat = jax.tree_util.tree_flatten_with_path(params_shardings)[0]
    by_suffix = [(_path_str(p), s) for p, s in flat]
    zero_n = mesh.shape.get(zero_axis, 1)

    def zero_shard(spec: P, shape) -> P:
        """Add `zero_axis` to the largest unsharded, divisible dim; when
        every dim is already TP-sharded (1-D biases), co-shard the same
        dim over (tp, dp) if divisible by the combined extent."""
        if zero_n <= 1:
            return spec
        entries = list(spec) + [None] * (len(shape) - len(spec))
        best, best_size = -1, 0
        for dim, axis in enumerate(entries):
            if axis is None and shape[dim] % zero_n == 0 \
                    and shape[dim] > best_size:
                best, best_size = dim, shape[dim]
        if best >= 0:
            entries[best] = zero_axis
            return P(*entries)
        for dim, axis in enumerate(entries):
            axes = (axis,) if isinstance(axis, str) else tuple(axis or ())
            if not axes:
                continue
            extent = zero_n
            for a in axes:
                extent *= mesh.shape[a]
            if shape[dim] % extent == 0:
                entries[dim] = axes + (zero_axis,)
                return P(*entries)
        return spec

    def one(path, leaf):
        p = _path_str(path)
        shape = getattr(leaf, "shape", ())
        for suffix, sharding in by_suffix:
            if p.endswith(suffix):
                ok = True
                for dim, axis in enumerate(sharding.spec):
                    if axis is not None and (
                            dim >= len(shape)
                            or shape[dim] % mesh.shape[axis] != 0):
                        ok = False
                if ok:
                    return NamedSharding(
                        mesh, zero_shard(sharding.spec, shape))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(one, opt_state_shape)
