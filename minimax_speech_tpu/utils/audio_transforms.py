"""audiotools data transforms slice (functional, key-driven).

Reference: dac-vae/audiotools/data/transforms.py — the transforms the
reference trainer wires (train.py:39-49 build_transform): Identity,
Compose(prob), VolumeNorm, RescaleAudio, ShiftPhase. The reference's
two-phase instantiate()/call protocol (random params drawn in the
dataloader worker, applied on device) becomes a single functional
`transform(key, signal)` here — JAX PRNG keys make the draw
reproducible without carrying state dicts around.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from minimax_speech_tpu.utils.audio_signal import AudioSignal


class BaseTransform:
    """prob-gated per-item transform (reference: transforms.py:44-140)."""

    def __init__(self, name: str = None, prob: float = 1.0):
        self.name = name or type(self).__name__
        self.prob = prob

    def _transform(self, key, signal: AudioSignal) -> AudioSignal:
        return signal

    def __call__(self, key, signal: AudioSignal) -> AudioSignal:
        k_gate, k_tfm = jax.random.split(key)
        if self.prob >= 1.0:
            return self._transform(k_tfm, signal)
        if self.prob <= 0.0:
            return signal
        apply = jax.random.bernoulli(k_gate, self.prob,
                                     (signal.batch_size,))
        out = self._transform(k_tfm, signal.clone())
        mixed = jnp.where(np.asarray(apply)[:, None, None],
                          out.audio_data, signal.audio_data)
        res = AudioSignal(mixed, signal.sample_rate, signal.stft_params)
        return res


class Identity(BaseTransform):
    """Returns the original signal (reference: transforms.py:268-271)."""
    pass


class Compose(BaseTransform):
    """Apply transforms in sequence (reference: transforms.py:289-330)."""

    def __init__(self, *transforms: BaseTransform, name: str = None,
                 prob: float = 1.0):
        super().__init__(name=name, prob=prob)
        flat = []
        for t in transforms:
            flat.extend(t if isinstance(t, (list, tuple)) else [t])
        self.transforms = flat

    def _transform(self, key, signal):
        for t in self.transforms:
            key, k = jax.random.split(key)
            signal = t(k, signal)
        return signal


class VolumeNorm(BaseTransform):
    """Normalize loudness to a dB draw (reference: transforms.py:973-1010;
    db=("const", x) fixed, ("uniform", lo, hi) sampled per item)."""

    def __init__(self, db: Tuple = ("const", -24), name: str = None,
                 prob: float = 1.0):
        super().__init__(name=name, prob=prob)
        self.db = db

    def _transform(self, key, signal):
        if self.db[0] in ("const", "lufs"):
            return signal.normalize(float(self.db[1]))
        lo, hi = float(self.db[1]), float(self.db[2])
        draws = jax.random.uniform(key, (signal.batch_size,),
                                   minval=lo, maxval=hi)
        gain_db = np.asarray(draws) - signal.loudness()
        gain = jnp.asarray(np.exp(gain_db * np.log(10.0) / 20.0),
                           jnp.float32)
        return AudioSignal(signal.audio_data * gain[:, None, None],
                           signal.sample_rate, signal.stft_params)


class VolumeChange(BaseTransform):
    """Uniform gain in dB (reference: transforms.py VolumeChange)."""

    def __init__(self, db: Tuple = ("uniform", -12.0, 0.0),
                 name: str = None, prob: float = 1.0):
        super().__init__(name=name, prob=prob)
        self.db = db

    def _transform(self, key, signal):
        lo, hi = float(self.db[1]), float(self.db[2])
        draws = jax.random.uniform(key, (signal.batch_size,),
                                   minval=lo, maxval=hi)
        gain = jnp.exp(draws * jnp.log(10.0) / 20.0)
        return AudioSignal(signal.audio_data * gain[:, None, None],
                           signal.sample_rate, signal.stft_params)


class RescaleAudio(BaseTransform):
    """Clamp-by-rescale to |x| <= val (reference: transforms.py:1173-1207)."""

    def __init__(self, val: float = 1.0, name: str = None,
                 prob: float = 1.0):
        super().__init__(name=name, prob=prob)
        self.val = val

    def _transform(self, key, signal):
        return signal.ensure_max_of_audio(self.val)


class ShiftPhase(BaseTransform):
    """Uniform constant phase shift in the STFT domain (reference:
    transforms.py ShiftPhase: stft -> phase += shift -> istft)."""

    def __init__(self, shift: Tuple = ("uniform", -np.pi, np.pi),
                 name: str = None, prob: float = 1.0):
        super().__init__(name=name, prob=prob)
        self.shift = shift

    # jitted: eager complex arithmetic is UNIMPLEMENTED on the axon TPU
    _rotate = staticmethod(jax.jit(
        lambda spec, draws: spec * jnp.exp(1j * draws)[:, None, None, None]))

    def _transform(self, key, signal):
        lo, hi = float(self.shift[1]), float(self.shift[2])
        draws = jax.random.uniform(key, (signal.batch_size,),
                                   minval=lo, maxval=hi)
        signal = signal.clone().stft()
        signal.stft_data = self._rotate(signal.stft_data,
                                        draws.astype(jnp.float32))
        return signal.istft()


def build_transform(augment_prob: float = 1.0,
                    preprocess: Sequence[str] = ("Identity",),
                    augment: Sequence[str] = ("Identity",),
                    postprocess: Sequence[str] = ("Identity",)) -> Compose:
    """Reference: dac-vae/train.py:39-49."""
    reg = globals()

    def to_tfm(names):
        return [reg[n]() for n in names]

    return Compose(
        Compose(*to_tfm(preprocess), name="preprocess"),
        Compose(*to_tfm(augment), name="augment", prob=augment_prob),
        Compose(*to_tfm(postprocess), name="postprocess"))
