"""Kaldi-compatible fbank features (torchaudio.compliance.kaldi.fbank).

The reference extracts campplus x-vector inputs with
kaldi.fbank(num_mel_bins=80, dither=0, sample_frequency=16000)
(reference: speech/cosyvoice/cli/frontend.py:104-113). This is the
TPU-native equivalent with kaldi's exact conventions (which differ from
the whisper/librosa mel in ops/mel.py):

  * snip_edges frames: 25 ms window / 10 ms shift, no padding
  * per-frame DC removal, preemphasis 0.97 (edge-replicated), povey
    window (hann ** 0.85)
  * FFT padded to the next power of two (512), POWER spectrum
  * kaldi mel banks: mel = 1127 ln(1 + f/700), low 20 Hz, high nyquist,
    triangle weights on the fft-bin grid, NO area normalization
  * natural-log output, floored at eps

All constants are precomputed with numpy in fp64 and closed over, so
the jitted path is one matmul-shaped program.
"""
from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np


def _mel(f):
    return 1127.0 * np.log(1.0 + f / 700.0)


@lru_cache(maxsize=None)
def _mel_banks(num_bins: int, fft: int, sr: int, low: float, high: float
               ) -> np.ndarray:
    """(num_bins, fft//2 + 1) kaldi triangular mel weights
    (kaldi feat/mel-computations.cc MelBanks; torchaudio get_mel_banks).
    Note kaldi drops the nyquist column (uses fft//2 bins)."""
    if high <= 0:
        high = sr / 2.0 + high
    mel_low, mel_high = _mel(low), _mel(high)
    delta = (mel_high - mel_low) / (num_bins + 1)
    fft_freqs = np.arange(fft // 2) * (sr / fft)
    mel_f = _mel(fft_freqs)
    banks = np.zeros((num_bins, fft // 2), np.float64)
    for b in range(num_bins):
        l, c, r = (mel_low + d * delta for d in (b, b + 1, b + 2))
        up = (mel_f - l) / (c - l)
        down = (r - mel_f) / (r - c)
        banks[b] = np.clip(np.minimum(up, down), 0.0, None)
    return banks.astype(np.float32)


@lru_cache(maxsize=None)
def _povey_window(n: int) -> np.ndarray:
    a = 2 * np.pi / (n - 1)
    return ((0.5 - 0.5 * np.cos(a * np.arange(n))) ** 0.85).astype(np.float32)


def kaldi_fbank(audio: jnp.ndarray, num_mel_bins: int = 80,
                sample_rate: int = 16000, frame_length_ms: float = 25.0,
                frame_shift_ms: float = 10.0, preemphasis: float = 0.97,
                low_freq: float = 20.0, high_freq: float = 0.0,
                ) -> jnp.ndarray:
    """(T,) 16 kHz float waveform in [-1, 1] -> (frames, num_mel_bins).

    Matches torchaudio.compliance.kaldi.fbank defaults with dither=0
    EXCEPT the input scale: kaldi operates on int16-scale waveforms, and
    since log-mel is shift-equivariant in log space this only offsets
    features by log(32768); campplus consumes mean-subtracted features
    (frontend.py:110), so the offset cancels. Pass
    audio * 32768 to match torchaudio bit-for-bit."""
    win = int(sample_rate * frame_length_ms / 1000.0)   # 400
    hop = int(sample_rate * frame_shift_ms / 1000.0)    # 160
    fft = 1
    while fft < win:
        fft *= 2                                        # 512

    n = audio.shape[0]
    num_frames = max(1 + (n - win) // hop, 0)
    idx = (np.arange(num_frames)[:, None] * hop
           + np.arange(win)[None, :])
    frames = audio[idx]                                  # (F, win)

    # per-frame DC removal
    frames = frames - jnp.mean(frames, axis=1, keepdims=True)
    # preemphasis with edge replication (kaldi: x[0] -= p*x[0])
    prev = jnp.concatenate([frames[:, :1], frames[:, :-1]], axis=1)
    frames = frames - preemphasis * prev
    frames = frames * jnp.asarray(_povey_window(win))

    spec = jnp.fft.rfft(frames, n=fft)
    power = (spec.real ** 2 + spec.imag ** 2)[:, : fft // 2]

    banks = jnp.asarray(_mel_banks(num_mel_bins, fft, sample_rate,
                                   low_freq, high_freq))
    mel = power @ banks.T
    eps = jnp.finfo(jnp.float32).eps
    return jnp.log(jnp.maximum(mel, eps))
