"""Parity tests: JAX mel/STFT frontends vs torch-computed golden values."""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

from minimax_speech_tpu.ops import mel as jmel
from tests.conftest import synthetic_audio


def torch_whisper_log_mel(audio: np.ndarray, filters: np.ndarray) -> np.ndarray:
    x = torch.from_numpy(audio)
    window = torch.hann_window(400)
    stft = torch.stft(x, 400, 160, window=window, return_complex=True)
    magnitudes = stft[..., :-1].abs() ** 2
    mel_spec = torch.from_numpy(filters) @ magnitudes
    log_spec = torch.clamp(mel_spec, min=1e-10).log10()
    log_spec = torch.maximum(log_spec, log_spec.max() - 8.0)
    return ((log_spec + 4.0) / 4.0).numpy()


def torch_hifigan_mel(audio: np.ndarray, filters: np.ndarray,
                      n_fft=1920, hop=480, win=1920) -> np.ndarray:
    y = torch.from_numpy(audio)[None]
    y = torch.nn.functional.pad(
        y.unsqueeze(1), (int((n_fft - hop) / 2), int((n_fft - hop) / 2)),
        mode="reflect").squeeze(1)
    spec = torch.view_as_real(
        torch.stft(y, n_fft, hop_length=hop, win_length=win,
                   window=torch.hann_window(win), center=False,
                   pad_mode="reflect", normalized=False, onesided=True,
                   return_complex=True))
    spec = torch.sqrt(spec.pow(2).sum(-1) + 1e-9)
    spec = torch.matmul(torch.from_numpy(filters), spec)
    return torch.log(torch.clamp(spec, min=1e-5)).numpy()[0]


def test_mel_filterbank_matches_reference_asset():
    """Our from-scratch Slaney filterbank must match the shipped whisper
    asset (reference: s3tokenizer/assets/mel_filters.npz)."""
    path = ("/root/reference/speech/tools/S3Tokenizer/s3tokenizer/assets/"
            "mel_filters.npz")
    ref = np.load(path)
    for n_mels in (80, 128):
        ours = jmel.mel_filterbank(16000, 400, n_mels)
        np.testing.assert_allclose(ours, ref[f"mel_{n_mels}"], atol=2e-7)


def test_whisper_log_mel_parity(rng):
    audio = synthetic_audio(rng, 1.3, sr=16000)
    filters = jmel.mel_filterbank(16000, 400, 128)
    golden = torch_whisper_log_mel(audio, filters)
    ours = np.asarray(jmel.whisper_log_mel(jnp.asarray(audio)))
    assert ours.shape == golden.shape
    np.testing.assert_allclose(ours, golden, atol=2e-4, rtol=1e-4)


def test_hifigan_log_mel_parity(rng):
    audio = synthetic_audio(rng, 0.7, sr=24000)
    filters = jmel.mel_filterbank(24000, 1920, 80, 0.0, 8000.0)
    golden = torch_hifigan_mel(audio, filters)
    ours = np.asarray(jmel.hifigan_log_mel(jnp.asarray(audio)))
    assert ours.shape == golden.shape
    np.testing.assert_allclose(ours, golden, atol=2e-4, rtol=1e-4)


def test_hifigan_log_mel_np_matches_jnp(rng):
    """The host-numpy twin (used by the data pipeline so extraction never
    dispatches to the accelerator) must match the jnp version."""
    for dur in (0.31, 0.7):
        audio = synthetic_audio(rng, dur, sr=24000)
        ours = jmel.hifigan_log_mel_np(audio)
        ref = np.asarray(jmel.hifigan_log_mel(jnp.asarray(audio)))
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-4)
    # batched input path
    batch = np.stack([synthetic_audio(rng, 0.5, sr=24000) for _ in range(2)])
    ours = jmel.hifigan_log_mel_np(batch)
    ref = np.asarray(jmel.hifigan_log_mel(jnp.asarray(batch)))
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-4)


def test_istft_roundtrip(rng):
    """istft must invert our stft (NOLA) like torch.istft does."""
    n_fft, hop = 16, 4
    audio = rng.standard_normal(400).astype(np.float32)
    x = torch.from_numpy(audio)
    win = torch.hann_window(n_fft)
    spec = torch.stft(x, n_fft, hop, n_fft, window=win, return_complex=True)
    golden = torch.istft(spec, n_fft, hop, n_fft, window=win).numpy()
    ours = np.asarray(jmel.istft(jnp.asarray(spec.real.numpy()),
                                 jnp.asarray(spec.imag.numpy()), n_fft, hop))
    np.testing.assert_allclose(ours, golden, atol=1e-4)
