"""Model registry: named model dirs with sha256 integrity manifests.

Reference: S3Tokenizer/s3tokenizer/__init__.py:37-153 — a name ->
(url, sha256) registry whose load_model() verifies the artifact hash
before use (and re-downloads on mismatch). This environment has no
egress, so the download leg is gated behind an injectable fetcher; the
portable parts — the named registry, hash verification, and corrupted-
checkpoint detection — work on local model dirs:

  registry.write_manifest("ckpts/tts")       # after converting ckpts
  registry.register("my-tts", "ckpts/tts")
  vars_ = registry.load_model("my-tts", kind="llm")   # verifies sha256
"""
from __future__ import annotations

import hashlib
import json
from pathlib import Path
from typing import Callable, Dict, Optional

MANIFEST = "manifest.json"

# name -> model dir (process-local registry; persisted registrations go
# through register(..., persist_to=...))
_MODELS: Dict[str, str] = {}


def sha256_file(path: str | Path, chunk: int = 1 << 20) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        while True:
            block = f.read(chunk)
            if not block:
                break
            h.update(block)
    return h.hexdigest()


def write_manifest(model_dir: str | Path,
                   patterns=("*.npz", "*.tiktoken", "*.json")) -> dict:
    """Hash every model artifact in the dir into manifest.json."""
    d = Path(model_dir)
    files = {}
    for pat in patterns:
        for p in sorted(d.glob(pat)):
            if p.name == MANIFEST:
                continue
            files[p.name] = sha256_file(p)
    manifest = {"files": files}
    (d / MANIFEST).write_text(json.dumps(manifest, indent=1))
    return manifest


def verify_model_dir(model_dir: str | Path) -> list[str]:
    """Returns a list of problems (empty = verified), mirroring the
    reference's hash check (s3tokenizer/__init__.py:73,99)."""
    d = Path(model_dir)
    mpath = d / MANIFEST
    if not mpath.exists():
        return [f"missing {MANIFEST}"]
    manifest = json.loads(mpath.read_text())
    problems = []
    for name, want in manifest.get("files", {}).items():
        p = d / name
        if not p.exists():
            problems.append(f"missing file {name}")
        elif sha256_file(p) != want:
            problems.append(f"sha256 mismatch: {name}")
    return problems


def register(name: str, model_dir: str | Path,
             persist_to: Optional[str] = None) -> None:
    _MODELS[name] = str(model_dir)
    if persist_to:
        p = Path(persist_to)
        data = json.loads(p.read_text()) if p.exists() else {}
        data[name] = str(model_dir)
        p.write_text(json.dumps(data, indent=1))


def load_registry(path: str | Path) -> None:
    for name, d in json.loads(Path(path).read_text()).items():
        _MODELS[name] = d


def available_models() -> list[str]:
    """Reference: available_models(), __init__.py:107-109."""
    return sorted(_MODELS)


def resolve(name_or_dir: str) -> Path:
    return Path(_MODELS.get(name_or_dir, name_or_dir))


def load_model(name_or_dir: str, kind: str = "llm", verify: bool = True,
               fetcher: Optional[Callable[[str, Path], None]] = None
               ) -> dict:
    """Load `<dir>/<kind>.npz` params after integrity verification
    (reference: load_model, __init__.py:112-153). `fetcher(name, dir)`
    may materialize the dir first (the download leg — injectable since
    this environment has no network)."""
    d = resolve(name_or_dir)

    def fetch():
        d.mkdir(parents=True, exist_ok=True)
        try:
            fetcher(name_or_dir, d)
        except Exception:
            # don't leave a half-fetched dir that wedges future loads
            import shutil
            shutil.rmtree(d, ignore_errors=True)
            raise

    if not d.exists() and fetcher is not None:
        fetch()
    if verify:
        problems = verify_model_dir(d)
        # A merely-missing manifest on an otherwise-present dir is NOT
        # corruption evidence (e.g. locally converted checkpoints the
        # fetcher could never reproduce) — never delete user data for
        # that; only re-fetch on actual hash mismatch / missing files.
        corrupted = [p for p in problems
                     if not p.startswith("missing manifest")]
        if problems and fetcher is not None and (corrupted
                                                 or not d.exists()):
            # corrupted/partial artifacts: re-fetch once into a temp
            # dir and atomically swap (reference re-downloads on sha256
            # mismatch, __init__.py:99-104)
            import shutil
            import tempfile
            tmp = Path(tempfile.mkdtemp(dir=str(d.parent),
                                        prefix=d.name + ".fetch"))
            try:
                fetcher(name_or_dir, tmp)
            except Exception:
                shutil.rmtree(tmp, ignore_errors=True)
                raise
            shutil.rmtree(d, ignore_errors=True)
            tmp.rename(d)
            problems = verify_model_dir(d)
        if problems:
            raise ValueError(f"model dir {d} failed verification: "
                             f"{problems}")
    from minimax_speech_tpu.utils.params_io import load_params
    return load_params(str(d / f"{kind}.npz"))
