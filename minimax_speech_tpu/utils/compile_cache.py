"""Persistent XLA executable cache control.

The TPU-native analogue of the reference's prebuilt-engine store
(reference: speech/cosyvoice/utils/file_utils.py:53-88 ONNX->TRT
engine caching): every jitted program's compiled executable is
serialized to disk on first compile and deserialized on later process
starts, so a fresh serving process skips the multi-minute cold
compiles (the streaming chunk program alone is ~220 s cold).

Enabled by default from TTSPipeline / streaming-session construction.
Environment overrides:
  MSTPU_XLA_CACHE=<dir>  cache location (default ~/.cache/minimax_speech_tpu/xla)
  MSTPU_XLA_CACHE=0      disable entirely
"""
from __future__ import annotations

import os

_DEFAULT = "~/.cache/minimax_speech_tpu/xla"
_enabled_path: str | None = None


def enable_persistent_compile_cache(path: str | None = None) -> str | None:
    """Idempotently point JAX's compilation cache at a disk directory.
    Returns the active path, or None if disabled via MSTPU_XLA_CACHE=0."""
    global _enabled_path
    env = os.environ.get("MSTPU_XLA_CACHE")
    if env == "0":
        return None
    if path is None and _enabled_path is not None:
        # a default call never overrides an explicitly chosen location
        return _enabled_path
    import jax
    if path is None and env is None:
        # default-enable only off-CPU: CPU compiles are cheap, and a
        # CPU AOT executable cached under one machine-feature set can
        # SIGILL on another host (cpu_aot_loader warns exactly this);
        # the cache exists for the TPU cold-start problem. jax_platforms
        # is None on plain CPU-only installs, so resolve the actual
        # backend when it is unset.
        platforms = str(jax.config.jax_platforms or "")
        if not platforms:
            try:
                platforms = jax.default_backend()
            except Exception:
                return None  # no backend resolvable -> play safe
        if "cpu" in platforms:
            return None
    p = os.path.expanduser(path or env or _DEFAULT)
    if _enabled_path == p:
        return p
    import jax

    os.makedirs(p, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", p)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    _enabled_path = p
    return p
