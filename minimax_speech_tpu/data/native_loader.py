"""Python wrapper for the native C++ audio loader.

Provides batch_load(paths, target_sr, num_threads): multithreaded WAV
decode + resample in C++ with the GIL released (see
native/audio_loader.cpp). Builds the extension on first use (g++,
cached .so); falls back to the pure-python loader when compilation is
unavailable.
"""
from __future__ import annotations

import importlib.util
import sys
from pathlib import Path

import numpy as np

_NATIVE = None
_TRIED = False


def _load_native():
    global _NATIVE, _TRIED
    if _TRIED:
        return _NATIVE
    _TRIED = True
    root = Path(__file__).resolve().parents[2] / "native"
    so = root / "_native_audio.so"
    src = root / "audio_loader.cpp"
    try:
        stale = (not so.exists()
                 or (src.exists()
                     and src.stat().st_mtime > so.stat().st_mtime))
        if stale:
            sys.path.insert(0, str(root))
            from build import build  # type: ignore
            build(verbose=False)
            sys.path.pop(0)
        spec = importlib.util.spec_from_file_location("_native_audio", so)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        _NATIVE = mod
    except Exception as e:  # pragma: no cover - env without g++
        print(f"native loader unavailable ({e}); using python fallback")
        _NATIVE = None
    return _NATIVE


def native_available() -> bool:
    return _load_native() is not None


def batch_load(paths: list[str], target_sr: int = 0,
               num_threads: int = 4):
    """Decode wavs in parallel. Returns list of (audio float32 np array,
    sample_rate) — sample_rate is target_sr when resampling was requested.
    Raises on per-file errors (caller decides skip policy)."""
    mod = _load_native()
    if mod is None:
        from minimax_speech_tpu.data.pipeline import _load_audio
        out = []
        for p in paths:
            audio, sr = _load_audio(p)
            if target_sr and sr != target_sr:
                n = int(round(len(audio) * target_sr / sr))
                audio = np.interp(
                    np.linspace(0, 1, n, endpoint=False),
                    np.linspace(0, 1, len(audio), endpoint=False),
                    audio).astype(np.float32)
                sr = target_sr
            out.append((audio, sr))
        return out
    results = mod.load_batch([str(p) for p in paths], target_sr, num_threads)
    out = []
    for (data, sr, err), p in zip(results, paths):
        if err is not None:
            raise IOError(f"{p}: {err}")
        audio = np.frombuffer(data, np.float32)
        out.append((audio, target_sr or sr))
    return out


def native_file_opener(data, token_latent_ratio: int = 2,
                       prefetch: int = 16, num_threads: int = 4,
                       target_sr: int = 0):
    """Drop-in pipeline stage: like individual_file_opener but decoding
    `prefetch` wavs at a time in C++ threads."""
    from minimax_speech_tpu.data import pipeline as dp

    def flush(buf):
        try:
            audios = batch_load([s["src"] for s in buf], target_sr,
                                num_threads)
        except IOError as e:
            print(f"native opener batch failed, skipping: {e}")
            return
        for s, (audio, sr) in zip(buf, audios):
            s["audio"] = audio
            s["sample_rate"] = sr
            yield from dp.attach_sidecars(s, token_latent_ratio)

    buf = []
    for sample in data:
        buf.append(sample)
        if len(buf) >= prefetch:
            yield from flush(buf)
            buf = []
    if buf:
        yield from flush(buf)
