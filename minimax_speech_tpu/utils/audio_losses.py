"""Spectral reconstruction losses (DAC-VAE / vocoder training).

Reference: dac-vae/loss.py:142-330 (audiotools-derived): multi-scale
STFT L1 on (log-)magnitudes and multi-resolution mel loss with
n_mels [5..320] over windows [32..2048], hop = window/4.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp

from minimax_speech_tpu.ops import mel as mel_ops


def _magnitude(x, n_fft, hop):
    p = n_fft // 2
    xp = jnp.pad(x, ((0, 0), (p, p)), mode="reflect")
    frames = mel_ops.frame_signal(xp, n_fft, hop)
    win = mel_ops.hann_window(n_fft, x.dtype)
    spec = jnp.fft.rfft(frames * win, axis=-1)
    return jnp.abs(spec)  # (B, T, F)


def multi_scale_stft_loss(x: jnp.ndarray, y: jnp.ndarray,
                          window_lengths: Sequence[int] = (2048, 512),
                          clamp_eps: float = 1e-5, mag_weight: float = 1.0,
                          log_weight: float = 1.0, pow: float = 2.0):
    """L1 on log10(mag^pow) + L1 on mag, summed over scales
    (reference: loss.py:142-231)."""
    loss = 0.0
    for w in window_lengths:
        mx = _magnitude(x, w, w // 4)
        my = _magnitude(y, w, w // 4)
        loss = loss + log_weight * jnp.mean(jnp.abs(
            jnp.log10(jnp.maximum(mx, clamp_eps) ** pow)
            - jnp.log10(jnp.maximum(my, clamp_eps) ** pow)))
        loss = loss + mag_weight * jnp.mean(jnp.abs(mx - my))
    return loss


def mel_spectrogram_loss(x: jnp.ndarray, y: jnp.ndarray,
                         sample_rate: int = 24000,
                         n_mels: Sequence[int] = (5, 10, 20, 40, 80, 160, 320),
                         window_lengths: Sequence[int] = (32, 64, 128, 256,
                                                          512, 1024, 2048),
                         clamp_eps: float = 1e-5, mag_weight: float = 0.0,
                         log_weight: float = 1.0, pow: float = 1.0):
    """Multi-resolution mel L1 (reference: loss.py:231-330; config
    lambdas mel/loss 15.0)."""
    loss = 0.0
    for nm, w in zip(n_mels, window_lengths):
        filters = jnp.asarray(mel_ops.mel_filterbank(sample_rate, w, nm))
        mx = jnp.einsum("mf,btf->btm", filters, _magnitude(x, w, w // 4))
        my = jnp.einsum("mf,btf->btm", filters, _magnitude(y, w, w // 4))
        loss = loss + log_weight * jnp.mean(jnp.abs(
            jnp.log10(jnp.maximum(mx, clamp_eps) ** pow)
            - jnp.log10(jnp.maximum(my, clamp_eps) ** pow)))
        if mag_weight:
            loss = loss + mag_weight * jnp.mean(jnp.abs(mx - my))
    return loss


def l1_loss(x, y):
    return jnp.mean(jnp.abs(x - y))


def sisdr_loss(x: jnp.ndarray, y: jnp.ndarray, eps: float = 1e-8):
    """Negative SI-SDR (reference: audiotools metrics/distance.py)."""
    x = x - jnp.mean(x, axis=-1, keepdims=True)
    y = y - jnp.mean(y, axis=-1, keepdims=True)
    dot = jnp.sum(x * y, axis=-1, keepdims=True)
    s_target = dot * y / (jnp.sum(y * y, axis=-1, keepdims=True) + eps)
    e_noise = x - s_target
    ratio = (jnp.sum(s_target ** 2, -1) + eps) / (jnp.sum(e_noise ** 2, -1) + eps)
    return -10.0 * jnp.mean(jnp.log10(ratio))
