"""Audio-folder datasets for the flowae track and codec training.

Replaces the reference's audiotools AudioLoader + flowae
class_folder_audio (reference: dac-vae/audiotools/data/datasets.py:15-153,
flowae/datasets/class_folder_audio.py): recursive wav scan, fixed-duration
random crops, optional loudness-style peak normalization, and an infinite
batched iterator (the dac trainer's infinite loader, train.py:368-383).
"""
from __future__ import annotations

import random
from pathlib import Path
from typing import Iterator, Optional

import numpy as np


class AudioFolder:
    def __init__(self, roots: list[str] | str, duration: float = 0.38,
                 sample_rate: int = 24000, normalize: bool = True,
                 seed: int = 0, use_native: bool = True):
        roots = [roots] if isinstance(roots, str) else roots
        self.files = sorted(f for r in roots for f in Path(r).rglob("*.wav"))
        if not self.files:
            raise ValueError(f"no wavs under {roots}")
        self.duration = duration
        self.sample_rate = sample_rate
        self.normalize = normalize
        self.rng = random.Random(seed)
        self.use_native = use_native

    def __len__(self):
        return len(self.files)

    def _load(self, paths):
        if self.use_native:
            from minimax_speech_tpu.data.native_loader import batch_load
            try:
                return batch_load([str(p) for p in paths],
                                  target_sr=self.sample_rate)
            except Exception:
                pass
        from minimax_speech_tpu.data.pipeline import _load_audio
        out = []
        for p in paths:
            audio, sr = _load_audio(str(p))
            if sr != self.sample_rate:
                n = int(round(len(audio) * self.sample_rate / sr))
                audio = np.interp(
                    np.linspace(0, 1, n, endpoint=False),
                    np.linspace(0, 1, len(audio), endpoint=False),
                    audio).astype(np.float32)
            out.append((audio, self.sample_rate))
        return out

    def sample_batch(self, batch_size: int) -> np.ndarray:
        """(B, duration*sr) random crops."""
        n = int(self.duration * self.sample_rate)
        paths = [self.rng.choice(self.files) for _ in range(batch_size)]
        loaded = self._load(paths)
        out = np.zeros((batch_size, n), np.float32)
        for i, (audio, _) in enumerate(loaded):
            if len(audio) >= n:
                start = self.rng.randint(0, len(audio) - n)
                crop = audio[start: start + n]
            else:
                crop = np.pad(audio, (0, n - len(audio)))
            if self.normalize:
                peak = np.abs(crop).max()
                if peak > 1.0:
                    crop = crop / peak * 0.95
            out[i] = crop
        return out

    def infinite_batches(self, batch_size: int) -> Iterator[np.ndarray]:
        """Endless batch stream (reference: dac train.py infinite loader)."""
        while True:
            yield self.sample_batch(batch_size)
