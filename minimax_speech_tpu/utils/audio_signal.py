"""audiotools slice: AudioSignal, BS.1770 loudness meter, resampling.

Reference: dac-vae/audiotools/core/{audio_signal,loudness,effects}.py
(the ~9.1k-LoC vendored lib; this is the subset the reference stack
actually exercises: STFT/iSTFT state, K-weighted integrated loudness
(Meter, loudness.py:11-246), normalize-to-LUFS + ensure_max_of_audio
(effects.py:181-224), kaiser-sinc resampling (julius), mono mixdown).

TPU-native shape: the signal wraps a (B, C, T) array; every DSP op is a
pure function over jnp arrays (stft/istft/gain run jitted on device);
only the sequential K-weighting IIR runs host-side through
scipy.signal.lfilter — an IIR over millions of samples is a serial
recurrence, the one shape TPUs are wrong for, and loudness is metadata,
not training math.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from minimax_speech_tpu.ops import mel as mel_ops

MIN_LOUDNESS = -70.0


@dataclass(frozen=True)
class STFTParams:
    """audio_signal.py STFTParams (defaults mirror audiotools)."""
    window_length: int = 2048
    hop_length: int = 512
    window_type: str = "hann"


# ------------------------------------------------------------------ resample
def _kaiser_sinc_kernel(orig_sr: int, new_sr: int, zeros: int = 24,
                        rolloff: float = 0.945):
    """Windowed-sinc polyphase filter bank (julius resample_frac
    conventions, the backend of audiotools' resample)."""
    g = math.gcd(orig_sr, new_sr)
    up, down = new_sr // g, orig_sr // g
    cutoff = rolloff * 0.5 / max(up, down)
    width = int(math.ceil(zeros / cutoff / 2))
    t = (np.arange(-width, width + 1)[None, :]
         - np.arange(up)[:, None] / up)  # (up, taps)
    sinc = np.sinc(2 * cutoff * t) * 2 * cutoff
    beta = 14.769656459379492  # kaiser beta for 180 dB sidelobe (julius)
    x = t / width
    win = np.i0(beta * np.sqrt(np.clip(1 - x ** 2, 0, 1))) / np.i0(beta)
    return (sinc * win).astype(np.float32), up, down, width


def resample(audio: jnp.ndarray, orig_sr: int, new_sr: int) -> jnp.ndarray:
    """audio (..., T) -> (..., T * new/orig): polyphase kaiser-sinc."""
    if orig_sr == new_sr:
        return audio
    kernels, up, down, width = _kaiser_sinc_kernel(orig_sr, new_sr)
    t = audio.shape[-1]
    lead = audio.shape[:-1]
    x = audio.reshape((-1, 1, t))
    # y_up[i*up + p] = (x * h_p)[i]: stride-1 conv per phase, interleave
    # to the rate-orig*up stream, then decimate by `down`
    xp = jnp.pad(x, ((0, 0), (0, 0), (width, width + down)))
    w = jnp.asarray(kernels)[:, None, :]  # (up, 1, taps)
    y = jax.lax.conv_general_dilated(
        xp, w, window_strides=(1,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"))  # (B, up, T')
    flat = jnp.swapaxes(y, 1, 2).reshape(x.shape[0], -1)  # j = i*up + p
    n_out = int(math.ceil(t * new_sr / orig_sr))
    return flat[:, ::down][:, :n_out].reshape(lead + (n_out,))


# ------------------------------------------------------------------ loudness
def _k_weighting_coeffs(sr: int):
    """ITU-R BS.1770-4 K-weighting: high-shelf pre-filter + RLB
    high-pass, coefficients re-derived for arbitrary sample rates
    (reference: loudness.py:49-174, pyloudnorm conventions)."""
    # stage 1: spherical-head high shelf
    f0, G, Q = 1681.9744509555319, 3.99984385397, 0.7071752369554193
    K = math.tan(math.pi * f0 / sr)
    Vh = 10.0 ** (G / 20.0)
    Vb = Vh ** 0.499666774155
    a0_ = 1.0 + K / Q + K * K
    b_shelf = [(Vh + Vb * K / Q + K * K) / a0_,
               2.0 * (K * K - Vh) / a0_,
               (Vh - Vb * K / Q + K * K) / a0_]
    a_shelf = [1.0, 2.0 * (K * K - 1.0) / a0_, (1.0 - K / Q + K * K) / a0_]
    # stage 2: RLB high-pass
    f0, Q = 38.13547087602444, 0.5003270373238773
    K = math.tan(math.pi * f0 / sr)
    denom = 1.0 + K / Q + K * K
    b_hp = [1.0, -2.0, 1.0]
    a_hp = [1.0, 2.0 * (K * K - 1.0) / denom,
            (1.0 - K / Q + K * K) / denom]
    return (np.array(b_shelf), np.array(a_shelf),
            np.array(b_hp), np.array(a_hp))


def integrated_loudness(audio: Union[np.ndarray, jnp.ndarray],
                        sample_rate: int,
                        block_size: float = 0.4) -> np.ndarray:
    """Gated integrated loudness in LUFS (BS.1770-4; reference:
    Meter.integrated_loudness, loudness.py:176-246). audio: (B, C, T),
    (C, T) or (T,). Returns (B,) loudness, floored at -70."""
    from scipy.signal import lfilter
    x = np.asarray(audio, np.float64)
    while x.ndim < 3:
        x = x[None]
    nb, nch, t = x.shape
    b1, a1, b2, a2 = _k_weighting_coeffs(sample_rate)
    y = lfilter(b1, a1, x, axis=-1)
    y = lfilter(b2, a2, y, axis=-1)

    gate = int(block_size * sample_rate)   # 400 ms blocks
    hop = int(gate * 0.25)                 # 75% overlap
    if t < gate:
        y = np.pad(y, ((0, 0), (0, 0), (0, gate - t)))
        t = gate
    n_blocks = 1 + (t - gate) // hop
    idx = (np.arange(gate)[None, :] + hop * np.arange(n_blocks)[:, None])
    frames = y[..., idx]                   # (nb, nch, n_blocks, gate)
    z = np.mean(frames ** 2, axis=-1)      # (nb, nch, n_blocks)

    G = np.array([1.0, 1.0, 1.0, 1.41, 1.41])[:nch]
    l = -0.691 + 10.0 * np.log10(
        np.maximum((G[None, :, None] * z).sum(1), 1e-12))  # (nb, n_blocks)

    out = np.full((nb,), MIN_LOUDNESS)
    for i in range(nb):
        m_a = l[i] > -70.0
        if not m_a.any():
            continue
        z_a = z[i][:, m_a].mean(-1)
        gamma_r = -0.691 + 10.0 * np.log10(
            np.maximum((G * z_a).sum(), 1e-12)) - 10.0
        m = m_a & (l[i] > gamma_r)
        if not m.any():
            continue
        z_g = z[i][:, m].mean(-1)
        out[i] = -0.691 + 10.0 * np.log10(np.maximum((G * z_g).sum(), 1e-12))
    return np.maximum(out, MIN_LOUDNESS)


# jitted stft/istft internals: complex arithmetic must go through a
# compiled program on the axon TPU backend (eager complex ops are
# UNIMPLEMENTED there), and jit makes repeat calls cheap everywhere
import functools


@functools.partial(jax.jit, static_argnames=("n_fft", "hop"))
def _stft_impl(x: jnp.ndarray, n_fft: int, hop: int):
    xp = jnp.pad(x, ((0, 0), (n_fft // 2, n_fft // 2)), mode="reflect")
    rem = (xp.shape[-1] - n_fft) % hop
    if rem:
        xp = jnp.pad(xp, ((0, 0), (0, hop - rem)))
    frames = jax.vmap(lambda s: mel_ops.frame_signal(s, n_fft, hop))(xp)
    win = mel_ops.hann_window(n_fft, x.dtype)
    return jnp.fft.rfft(frames * win, n=n_fft, axis=-1)


@functools.partial(jax.jit, static_argnames=("n_fft", "hop", "length"))
def _istft_impl(real, imag, n_fft: int, hop: int, length: int):
    return mel_ops.istft(real, imag, n_fft, hop, length=length)


# ---------------------------------------------------------------- the signal
class AudioSignal:
    """Functional AudioSignal (reference: core/audio_signal.py:53+).

    audio_data: (B, C, T) jnp array. DSP methods return NEW signals
    (JAX-functional, no in-place mutation); `.loudness()` is cached per
    instance like the reference."""

    def __init__(self, audio_data, sample_rate: int,
                 stft_params: Optional[STFTParams] = None):
        a = jnp.asarray(audio_data, jnp.float32)
        while a.ndim < 3:
            a = a[None]
        self.audio_data = a
        self.sample_rate = int(sample_rate)
        self.stft_params = stft_params or STFTParams()
        self._loudness = None
        self.stft_data = None

    # -- properties ------------------------------------------------------
    @property
    def batch_size(self) -> int:
        return self.audio_data.shape[0]

    @property
    def num_channels(self) -> int:
        return self.audio_data.shape[1]

    @property
    def signal_length(self) -> int:
        return self.audio_data.shape[-1]

    @property
    def signal_duration(self) -> float:
        return self.signal_length / self.sample_rate

    def clone(self) -> "AudioSignal":
        s = AudioSignal(self.audio_data, self.sample_rate, self.stft_params)
        s._loudness = self._loudness
        s.stft_data = self.stft_data
        return s

    def _replace(self, audio) -> "AudioSignal":
        return AudioSignal(audio, self.sample_rate, self.stft_params)

    # -- stft ------------------------------------------------------------
    def stft(self) -> "AudioSignal":
        """Center-padded hann STFT; stores complex (B, C, F, frames)."""
        p = self.stft_params
        n_fft = p.window_length
        x = self.audio_data.reshape(-1, self.signal_length)
        spec = _stft_impl(x, n_fft, p.hop_length)
        self.stft_data = jnp.swapaxes(spec, -1, -2).reshape(
            self.batch_size, self.num_channels, n_fft // 2 + 1, -1)
        return self

    def istft(self) -> "AudioSignal":
        """Inverse of .stft(); writes audio_data back (NOLA-normalized)."""
        assert self.stft_data is not None, "call stft() first"
        p = self.stft_params
        spec = self.stft_data.reshape(
            -1, *self.stft_data.shape[2:])  # (BC, F, frames)
        wav = _istft_impl(jnp.real(spec), jnp.imag(spec),
                          p.window_length, p.hop_length,
                          self.signal_length)
        audio = wav.reshape(self.batch_size, self.num_channels, -1)
        out = self._replace(audio)
        out.stft_data = self.stft_data
        return out

    def magnitude(self) -> jnp.ndarray:
        if self.stft_data is None:
            self.stft()
        return jnp.abs(self.stft_data)

    def log_magnitude(self, ref_value: float = 1.0,
                      amin: float = 1e-5) -> jnp.ndarray:
        mag = self.magnitude()
        return 20.0 * jnp.log10(jnp.maximum(mag, amin) / ref_value)

    # -- loudness / gain -------------------------------------------------
    def loudness(self) -> np.ndarray:
        """(B,) integrated LUFS, cached (reference:
        loudness.py Meter + audio_signal caching)."""
        if self._loudness is None:
            self._loudness = integrated_loudness(
                np.asarray(self.audio_data), self.sample_rate)
        return self._loudness

    def normalize(self, db: float = -24.0) -> "AudioSignal":
        """Gain to the target LUFS (reference: effects.py:200-224)."""
        gain_db = db - self.loudness()
        gain = np.exp(gain_db * np.log(10.0) / 20.0)
        out = self._replace(self.audio_data * jnp.asarray(
            gain, jnp.float32)[:, None, None])
        out._loudness = np.full_like(self.loudness(), db)
        return out

    def ensure_max_of_audio(self, max: float = 1.0) -> "AudioSignal":
        """Rescale only where |audio| exceeds max (effects.py:181-198)."""
        peak = jnp.max(jnp.abs(self.audio_data), axis=(1, 2), keepdims=True)
        scale = jnp.where(peak > max, max / jnp.maximum(peak, 1e-12), 1.0)
        return self._replace(self.audio_data * scale)

    def volume_change(self, db: float) -> "AudioSignal":
        return self._replace(
            self.audio_data * jnp.exp(db * jnp.log(10.0) / 20.0))

    # -- channel / rate --------------------------------------------------
    def to_mono(self) -> "AudioSignal":
        return self._replace(
            jnp.mean(self.audio_data, axis=1, keepdims=True))

    def resample(self, new_sr: int) -> "AudioSignal":
        if new_sr == self.sample_rate:
            return self
        audio = resample(self.audio_data, self.sample_rate, new_sr)
        return AudioSignal(audio, new_sr, self.stft_params)

    # -- io --------------------------------------------------------------
    def write(self, path: str) -> "AudioSignal":
        from minimax_speech_tpu.cli.synthesize import write_wav
        mono = np.asarray(self.to_mono().audio_data[0, 0])
        write_wav(path, mono, self.sample_rate)
        return self

    @classmethod
    def load(cls, path: str) -> "AudioSignal":
        from minimax_speech_tpu.data.pipeline import _load_audio
        audio, sr = _load_audio(path)
        return cls(audio, sr)
