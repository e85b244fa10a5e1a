"""DACVAEFile: serialized codec artifact + chunked compress/decompress.

The reference's CodecMixin/DACFile (reference: dac-vae/base.py:16-293)
processes audio in constant-memory windows and stores quantizer codes +
loudness metadata in a `.dac` numpy artifact. This is the VAE-variant
equivalent for the TPU build:

  * the "codes" are the encoder's deterministic mu latents stored as
    float16 (the VAE has no discrete quantizer);
  * chunking is overlap-crop instead of the reference's
    padding=False/delay scheme (which mutates every conv's padding —
    hostile to jitted static graphs): each window is encoded with an
    overlap larger than the conv stack's receptive field on both sides
    and only the center latents are kept, so chunked == full-signal
    encoding up to float noise, with ONE compiled program reused for
    every chunk;
  * loudness is an unweighted BS.1770-style energy measure (the
    reference uses audiotools' K-weighted LUFS; the normalize/restore
    pair cancels in the roundtrip either way).

Artifact format (np.save dict, suffix .dacz):
  {"latents": float16 (T_lat, D), "metadata": {original_length,
   input_db, sample_rate, chunk_length, channels, version}}
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

VERSION = "minimax-speech-tpu-dacvae-1.0"


def loudness_db(audio: np.ndarray) -> float:
    """Unweighted BS.1770-style program loudness in dB."""
    energy = float(np.mean(np.square(audio, dtype=np.float64)))
    return -0.691 + 10.0 * math.log10(max(energy, 1e-12))


@dataclass
class DACVAEFile:
    """Compressed-latent artifact (reference: dac-vae/base.py:16-54)."""
    latents: np.ndarray          # (T_lat, D) float16
    original_length: int
    input_db: float
    sample_rate: int
    chunk_length: int            # latent frames per compressed chunk
    channels: int = 1
    version: str = VERSION

    def save(self, path) -> Path:
        path = Path(path).with_suffix(".dacz")
        artifacts = {
            "latents": self.latents.astype(np.float16),
            "metadata": {
                "original_length": int(self.original_length),
                "input_db": float(self.input_db),
                "sample_rate": int(self.sample_rate),
                "chunk_length": int(self.chunk_length),
                "channels": int(self.channels),
                "version": self.version,
            },
        }
        with open(path, "wb") as f:
            np.save(f, artifacts, allow_pickle=True)
        return path

    @classmethod
    def load(cls, path) -> "DACVAEFile":
        artifacts = np.load(path, allow_pickle=True)[()]
        meta = artifacts["metadata"]
        if meta.get("version") != VERSION:
            raise RuntimeError(f"{path}: unsupported artifact version "
                               f"{meta.get('version')!r}")
        return cls(latents=artifacts["latents"],
                   original_length=meta["original_length"],
                   input_db=meta["input_db"],
                   sample_rate=meta["sample_rate"],
                   chunk_length=meta["chunk_length"],
                   channels=meta["channels"], version=meta["version"])


class DACVAECodec:
    """Chunked compress/decompress around a DACVAE model.

    win_duration seconds per chunk; `overlap` samples of context on each
    side (must exceed the encoder/decoder receptive field — default 1 s
    covers the (2,3,4,4,5)-stride stack's ~0.6 s)."""

    def __init__(self, model, variables, model_sr: int = 24000,
                 win_duration: float = 5.0, overlap: int = 24000):
        self.model = model
        self.variables = variables
        self.model_sr = model_sr
        self.hop = model.cfg.hop_length
        self.win = int(math.ceil(win_duration * model_sr / self.hop)) \
            * self.hop
        self.overlap = int(math.ceil(overlap / self.hop)) * self.hop
        self.ov_lat = self.overlap // self.hop
        self.win_lat = self.win // self.hop

        self._encode = jax.jit(lambda v, a: model.apply(
            v, a, method=type(model).encode)[1])
        self._decode = jax.jit(partial(model.apply,
                                       method=type(model).decode))

    # -- helpers ---------------------------------------------------------
    def _resample(self, audio: np.ndarray, sr: int, out_sr: int):
        if sr == out_sr:
            return audio.astype(np.float32)
        n = int(round(len(audio) * out_sr / sr))
        return np.interp(np.linspace(0, 1, n, endpoint=False),
                         np.linspace(0, 1, len(audio), endpoint=False),
                         audio).astype(np.float32)

    # -- compress (reference: base.py:125-233) ----------------------------
    def compress(self, audio: np.ndarray, sample_rate: int,
                 normalize_db: float = -16.0) -> DACVAEFile:
        """(T,) mono float audio -> DACVAEFile."""
        original_length = len(audio)
        x = self._resample(audio, sample_rate, self.model_sr)
        input_db = loudness_db(x)
        if normalize_db is not None:
            x = x * (10.0 ** ((normalize_db - input_db) / 20.0))
        peak = float(np.max(np.abs(x), initial=1e-9))
        if peak > 1.0:          # ensure_max_of_audio (base.py:180)
            x = x / peak

        t = len(x)
        t_pad = int(math.ceil(max(t, 1) / self.win)) * self.win
        n_chunks = t_pad // self.win
        buf = np.zeros(self.overlap + t_pad + self.overlap, np.float32)
        buf[self.overlap: self.overlap + t] = x

        lat_chunks = []
        for c in range(n_chunks):
            s = c * self.win
            window = buf[s: s + self.win + 2 * self.overlap]
            mu = self._encode(self.variables,
                              jnp.asarray(window)[None, :, None])
            lat_chunks.append(np.asarray(
                mu)[0, self.ov_lat: self.ov_lat + self.win_lat])
        latents = np.concatenate(lat_chunks, axis=0)
        n_lat = int(math.ceil(t / self.hop))
        return DACVAEFile(latents=latents[:n_lat].astype(np.float16),
                          original_length=original_length,
                          input_db=input_db, sample_rate=sample_rate,
                          chunk_length=self.win_lat)

    # -- decompress (reference: base.py:235-293) --------------------------
    def decompress(self, obj) -> np.ndarray:
        """DACVAEFile (or path) -> (original_length,) float audio at the
        artifact's sample rate."""
        if isinstance(obj, (str, Path)):
            obj = DACVAEFile.load(obj)
        lat = obj.latents.astype(np.float32)
        n_lat, d = lat.shape
        n_chunks = int(math.ceil(n_lat / self.win_lat))
        buf = np.zeros((self.ov_lat + n_chunks * self.win_lat + self.ov_lat,
                        d), np.float32)
        buf[self.ov_lat: self.ov_lat + n_lat] = lat

        wavs = []
        for c in range(n_chunks):
            s = c * self.win_lat
            window = buf[s: s + self.win_lat + 2 * self.ov_lat]
            w = self._decode(self.variables, jnp.asarray(window)[None])
            w = np.asarray(w).reshape(-1)
            wavs.append(w[self.overlap: self.overlap + self.win])
        wav = np.concatenate(wavs)[: n_lat * self.hop]

        out_db = loudness_db(wav)
        wav = wav * (10.0 ** ((obj.input_db - out_db) / 20.0))
        wav = self._resample(wav, self.model_sr, obj.sample_rate)
        return wav[: obj.original_length]
