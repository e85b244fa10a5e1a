"""Test harness: run everything on a virtual 8-device CPU mesh.

Must set XLA flags before jax initializes. Mirrors the multi-host test
strategy recommended in SURVEY.md §4 (the reference has no fake-backend
distributed tests; we use xla_force_host_platform_device_count as the
TPU-native analogue).
"""
import os

# Force the virtual 8-device CPU mesh. The session's sitecustomize
# registers the axon TPU backend unconditionally and overrides
# JAX_PLATFORMS, so we must also set jax.config after import.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1986)


def synthetic_audio(rng, seconds: float, sr: int = 16000) -> np.ndarray:
    """Deterministic sine+noise test audio (mirrors the reference test
    fixture pattern, S3Tokenizer/test/test_onnx.py:16-43)."""
    t = np.arange(int(seconds * sr)) / sr
    x = (0.5 * np.sin(2 * np.pi * 220.0 * t)
         + 0.3 * np.sin(2 * np.pi * 880.0 * t)
         + 0.05 * rng.standard_normal(t.shape))
    return x.astype(np.float32)
