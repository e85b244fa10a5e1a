"""audiotools slice: AudioSignal / loudness meter / resample /
transforms (reference: dac-vae/audiotools/core + data/transforms)."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from minimax_speech_tpu.utils import audio_signal as asig
from minimax_speech_tpu.utils import audio_transforms as tfm


def sine(freq=997.0, sr=48000, dur=2.0, amp=1.0):
    t = np.arange(int(sr * dur)) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_integrated_loudness_known_values():
    """BS.1770: a 997 Hz full-scale mono sine reads ~-3.01 LUFS
    (the K-weighting is ~0 dB at 1 kHz; mean square of a unit sine is
    -3.01 dB)."""
    sr = 48000
    x = sine(997.0, sr, 2.0, 1.0)
    lufs = asig.integrated_loudness(x, sr)[0]
    assert abs(lufs - (-3.01)) < 0.2, lufs
    # 20 dB quieter signal reads 20 LU lower
    lufs_q = asig.integrated_loudness(0.1 * x, sr)[0]
    assert abs((lufs - lufs_q) - 20.0) < 0.1
    # silence floors at -70
    assert asig.integrated_loudness(np.zeros(sr), sr)[0] == -70.0


def test_loudness_sample_rate_consistency():
    for sr in (16000, 22050, 24000, 44100):
        x = sine(997.0, sr, 2.0, 0.5)
        lufs = asig.integrated_loudness(x, sr)[0]
        assert abs(lufs - (-3.01 - 6.02)) < 0.4, (sr, lufs)


def test_normalize_to_target_lufs():
    s = asig.AudioSignal(sine(440.0, 24000, 1.0, 0.8), 24000)
    out = s.normalize(-18.0)
    measured = asig.integrated_loudness(
        np.asarray(out.audio_data), 24000)[0]
    assert abs(measured - (-18.0)) < 0.3


def test_ensure_max_and_volume_change():
    s = asig.AudioSignal(2.0 * sine(100.0, 8000, 0.5), 8000)
    out = s.ensure_max_of_audio(1.0)
    assert float(jnp.abs(out.audio_data).max()) <= 1.0 + 1e-6
    # already-in-range signal untouched
    s2 = asig.AudioSignal(0.5 * sine(100.0, 8000, 0.5), 8000)
    np.testing.assert_allclose(
        np.asarray(s2.ensure_max_of_audio(1.0).audio_data),
        np.asarray(s2.audio_data))
    v = s2.volume_change(-6.0206)
    assert abs(float(jnp.abs(v.audio_data).max()) - 0.25) < 1e-3


def test_stft_istft_roundtrip():
    s = asig.AudioSignal(sine(220.0, 16000, 0.3), 16000,
                         asig.STFTParams(512, 128))
    rec = s.stft().istft()
    np.testing.assert_allclose(np.asarray(rec.audio_data),
                               np.asarray(s.audio_data), atol=1e-4)


def test_resample_vs_torchaudio_semantics():
    """Kaiser-sinc resample: tone survives, energy preserved, length
    scales by the rate ratio."""
    sr, new = 16000, 24000
    x = sine(440.0, sr, 0.5, 0.5)
    y = np.asarray(asig.resample(jnp.asarray(x), sr, new))
    assert y.shape[0] == int(np.ceil(len(x) * new / sr))
    # cross-check against torch's linear interp at low error: a 440 Hz
    # tone resampled should still be a 440 Hz tone (correlate)
    t_new = np.arange(len(y)) / new
    ref = 0.5 * np.sin(2 * np.pi * 440.0 * t_new)
    # ignore filter edges
    m = slice(500, -500)
    err = np.abs(y[m] - ref[m]).max()
    assert err < 5e-3, err
    s = asig.AudioSignal(x, sr).resample(new)
    assert s.sample_rate == new


def test_to_mono_and_multichannel_loudness():
    x = np.stack([sine(997.0, 48000, 1.0, 1.0),
                  np.zeros(48000, np.float32)])
    s = asig.AudioSignal(x, 48000)
    assert s.num_channels == 2
    mono = s.to_mono()
    assert mono.num_channels == 1
    # stereo sums channel energies: one silent channel = same as mono ch
    lufs = s.loudness()[0]
    assert abs(lufs - (-3.01)) < 0.3


def test_transforms_compose_and_volume_norm():
    key = jax.random.PRNGKey(0)
    s = asig.AudioSignal(sine(330.0, 24000, 1.0, 0.9), 24000)
    t = tfm.build_transform(
        augment_prob=0.0, preprocess=["Identity"], augment=["Identity"],
        postprocess=["Identity", "RescaleAudio"])
    out = t(key, s)
    assert float(jnp.abs(out.audio_data).max()) <= 1.0 + 1e-6

    vn = tfm.VolumeNorm(("lufs", -18))
    out = vn(key, s)
    measured = asig.integrated_loudness(np.asarray(out.audio_data), 24000)
    assert abs(measured[0] - (-18.0)) < 0.3


def test_shift_phase_preserves_magnitude():
    key = jax.random.PRNGKey(3)
    s = asig.AudioSignal(sine(500.0, 16000, 0.4, 0.5), 16000,
                         asig.STFTParams(512, 128))
    out = tfm.ShiftPhase()(key, s)
    m0 = np.asarray(s.clone().magnitude())
    m1 = np.asarray(out.clone().stft().magnitude() if out.stft_data is None
                    else jnp.abs(out.stft_data))
    np.testing.assert_allclose(m1, m0, atol=2e-3)
    # but the waveform actually changed
    assert np.abs(np.asarray(out.audio_data)
                  - np.asarray(s.audio_data)).max() > 0.05


def test_prob_gating():
    key = jax.random.PRNGKey(1)
    x = np.stack([sine(200.0, 8000, 0.25, 0.5)] * 8)[:, None, :]
    s = asig.AudioSignal(x, 8000)
    t = tfm.VolumeChange(("uniform", -20.0, -20.0), prob=0.5)
    out = t(key, s)
    changed = np.abs(np.asarray(out.audio_data) - x).max(axis=(1, 2)) > 1e-6
    assert 0 < changed.sum() < 8  # some items transformed, some not
