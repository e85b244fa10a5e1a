"""Model registry + sha256 integrity manifests (reference:
S3Tokenizer/s3tokenizer/__init__.py:37-153 name registry with hash
verification)."""
import numpy as np
import pytest

import jax.numpy as jnp

from minimax_speech_tpu.utils import registry
from minimax_speech_tpu.utils.params_io import save_params


def make_model_dir(tmp_path):
    d = tmp_path / "m"
    d.mkdir()
    save_params(str(d / "llm.npz"),
                {"params": {"w": np.ones((3, 2), np.float32)}})
    (d / "config.json").write_text("{}")
    return d


def test_manifest_roundtrip_and_verify(tmp_path):
    d = make_model_dir(tmp_path)
    man = registry.write_manifest(d)
    assert set(man["files"]) == {"llm.npz", "config.json"}
    assert registry.verify_model_dir(d) == []
    # corruption is detected (reference: sha256 mismatch -> re-download)
    (d / "llm.npz").write_bytes(b"corrupted")
    problems = registry.verify_model_dir(d)
    assert problems and "mismatch" in problems[0]
    # missing file detected
    (d / "llm.npz").unlink()
    assert any("missing" in p for p in registry.verify_model_dir(d))


def test_register_load_and_available(tmp_path):
    d = make_model_dir(tmp_path)
    registry.write_manifest(d)
    reg_file = tmp_path / "registry.json"
    registry.register("tiny-tts", d, persist_to=str(reg_file))
    assert "tiny-tts" in registry.available_models()
    tree = registry.load_model("tiny-tts", kind="llm")
    np.testing.assert_allclose(np.asarray(tree["params"]["w"]),
                               np.ones((3, 2)))
    # persisted registry reloads
    registry._MODELS.clear()
    registry.load_registry(str(reg_file))
    assert registry.resolve("tiny-tts") == d

    # corrupted model refuses to load
    (d / "llm.npz").write_bytes(b"xx")
    with pytest.raises(ValueError, match="verification"):
        registry.load_model("tiny-tts", kind="llm")


def test_fetcher_materializes_dir(tmp_path):
    target = tmp_path / "fetched"

    def fetcher(name, d):
        save_params(str(d / "llm.npz"),
                    {"params": {"b": np.zeros((2,), np.float32)}})
        registry.write_manifest(d)

    tree = registry.load_model(str(target), kind="llm", fetcher=fetcher)
    assert "b" in tree["params"]


def test_refetch_on_corruption(tmp_path):
    """sha256 mismatch triggers one re-fetch (reference re-downloads,
    __init__.py:99-104); a failing fetcher doesn't wedge the dir."""
    d = tmp_path / "rf"
    calls = []

    def fetcher(name, dd):
        calls.append(1)
        save_params(str(dd / "llm.npz"),
                    {"params": {"w": np.ones((2,), np.float32)}})
        registry.write_manifest(dd)

    tree = registry.load_model(str(d), kind="llm", fetcher=fetcher)
    assert len(calls) == 1 and "w" in tree["params"]
    # corrupt -> next load re-fetches instead of failing forever
    (d / "llm.npz").write_bytes(b"junk")
    tree = registry.load_model(str(d), kind="llm", fetcher=fetcher)
    assert len(calls) == 2 and "w" in tree["params"]

    # failing fetcher cleans up the partial dir
    d2 = tmp_path / "boom"

    def bad_fetcher(name, dd):
        (dd / "half.npz").write_bytes(b"partial")
        raise OSError("network down")

    with pytest.raises(OSError):
        registry.load_model(str(d2), kind="llm", fetcher=bad_fetcher)
    assert not d2.exists()
