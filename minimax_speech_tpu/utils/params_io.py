"""Flat .npz save/load for flax param pytrees (portable checkpoints).

Orbax handles training checkpoints (train/checkpoint.py); this is the
light-weight interchange format the CLIs use for model weights, and the
landing format for converted reference checkpoints.
"""
from __future__ import annotations


import jax
import numpy as np


SEP = "||"


def cast_floats(tree, dtype):
    """Cast every floating-point leaf of a pytree to `dtype` (ints,
    bools and non-arrays pass through). The one shared dtype-policy
    helper for bf16 train steps, bf16 flow inference, and benches."""
    import jax.numpy as jnp

    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
        else x, tree)


def save_params(path: str, variables: dict):
    flat = jax.tree_util.tree_flatten_with_path(variables)[0]
    arrays = {}
    for p, leaf in flat:
        key = SEP.join(str(getattr(k, "key", getattr(k, "idx", k)))
                       for k in p)
        arrays[key] = np.asarray(leaf)
    np.savez(path, **arrays)


def load_params(path: str) -> dict:
    data = np.load(path, allow_pickle=False)
    tree: dict = {}
    for key in data.files:
        node = tree
        parts = key.split(SEP)
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = data[key]
    return tree
