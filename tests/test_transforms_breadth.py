"""Remaining audiotools transform classes + spectral DSP methods
(reference: dac-vae/audiotools/data/transforms.py,
core/dsp.py:217-380, ml/layers/spectral_gate.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from minimax_speech_tpu.utils import audio_transforms as tfm
from minimax_speech_tpu.utils.audio_signal import (AudioSignal,
                                                   spectral_gate)

SR = 16000


def make_signal(rng, batch=2, seconds=0.5, f=440.0):
    t = np.arange(int(SR * seconds)) / SR
    x = 0.5 * np.sin(2 * np.pi * f * t)[None, None, :]
    x = np.repeat(x, batch, 0) + 0.01 * rng.standard_normal(
        (batch, 1, len(t)))
    return AudioSignal(x.astype(np.float32), SR)


def test_all_reference_transform_classes_exist():
    """Every transform class the reference library ships is available
    (transforms.py class inventory)."""
    wanted = [
        "Identity", "SpectralTransform", "Compose", "Choose", "Repeat",
        "RepeatUpTo", "ClippingDistortion", "Equalizer", "Quantization",
        "MuLawQuantization", "NoiseFloor", "BackgroundNoise",
        "CrossTalk", "RoomImpulseResponse", "VolumeChange", "VolumeNorm",
        "GlobalVolumeNorm", "Silence", "LowPass", "HighPass",
        "RescaleAudio", "ShiftPhase", "InvertPhase", "CorruptPhase",
        "FrequencyMask", "TimeMask", "MaskLowMagnitudes", "Smoothing",
        "TimeNoise", "FrequencyNoise", "SpectralDenoising"]
    missing = [w for w in wanted if not hasattr(tfm, w)]
    assert not missing, missing


def test_choose_applies_exactly_one(rng):
    sig = make_signal(rng, batch=4)
    # two transforms with disjoint, detectable effects
    t = tfm.Choose(tfm.Silence(prob=1.0), tfm.Identity())
    out = t(jax.random.PRNGKey(0), sig)
    silent = np.asarray(jnp.max(jnp.abs(out.audio_data), (1, 2))) < 1e-9
    kept = np.allclose(np.asarray(out.audio_data),
                       np.asarray(sig.audio_data)) if not silent.any() \
        else None
    # each item is EITHER silenced OR untouched — never a blend
    for b in range(4):
        a = np.asarray(out.audio_data[b])
        assert (np.max(np.abs(a)) < 1e-9
                or np.allclose(a, np.asarray(sig.audio_data[b])))
    del kept


def test_choose_weights_degenerate(rng):
    sig = make_signal(rng, batch=3)
    t = tfm.Choose(tfm.Silence(prob=1.0), tfm.Identity(),
                   weights=[0.0, 1.0])
    out = t(jax.random.PRNGKey(1), sig)
    np.testing.assert_allclose(np.asarray(out.audio_data),
                               np.asarray(sig.audio_data))


def test_repeat_and_repeat_up_to(rng):
    sig = make_signal(rng)
    g = tfm.VolumeChange(db=("const", -6.0, -6.0))
    # VolumeChange _sample_dist uses uniform lo==hi -> exactly -6 dB
    twice = tfm.Repeat(g, n_repeat=2)
    out = twice(jax.random.PRNGKey(0), sig)
    expected = np.asarray(sig.audio_data) * 10 ** (-12 / 20)
    np.testing.assert_allclose(np.asarray(out.audio_data), expected,
                               atol=1e-5)
    up_to = tfm.RepeatUpTo(g, max_repeat=4)
    out2 = up_to(jax.random.PRNGKey(3), sig)
    ratio = float(jnp.max(jnp.abs(out2.audio_data))
                  / jnp.max(jnp.abs(sig.audio_data)))
    # 1, 2 or 3 applications of -6 dB
    assert any(abs(ratio - 10 ** (-6 * n / 20)) < 1e-3
               for n in (1, 2, 3)), ratio


def test_noise_floor_raises_floor(rng):
    sig = make_signal(rng)
    out = tfm.NoiseFloor(db=("const", -30.0))(jax.random.PRNGKey(0), sig)
    # noise got added
    diff = np.asarray(out.audio_data - sig.audio_data)
    assert np.std(diff) > 1e-4
    # at roughly -30 LUFS
    nz_loud = AudioSignal(diff, SR).loudness()
    assert np.all(np.abs(nz_loud + 30.0) < 3.0), nz_loud


def test_crosstalk_preserves_loudness(rng):
    sig = make_signal(rng, seconds=1.0)
    out = tfm.CrossTalk(snr=("const", 5.0))(jax.random.PRNGKey(0), sig)
    assert not np.allclose(np.asarray(out.audio_data),
                           np.asarray(sig.audio_data))
    np.testing.assert_allclose(out.loudness(), sig.loudness(), atol=0.5)


def test_global_volume_norm_uses_metadata(rng):
    sig = make_signal(rng)
    sig.metadata["loudness"] = -30.0
    out = tfm.GlobalVolumeNorm(db=("const", -24.0))(
        jax.random.PRNGKey(0), sig)
    # +6 dB gain applied blindly from file-level loudness
    np.testing.assert_allclose(np.asarray(out.audio_data),
                               np.asarray(sig.audio_data) * 10 ** 0.3,
                               rtol=1e-5)
    # without metadata: passthrough
    sig2 = make_signal(rng)
    out2 = tfm.GlobalVolumeNorm(db=("const", -24.0))(
        jax.random.PRNGKey(0), sig2)
    np.testing.assert_allclose(np.asarray(out2.audio_data),
                               np.asarray(sig2.audio_data))


def test_silence_and_invert_phase(rng):
    sig = make_signal(rng)
    out = tfm.Silence(prob=1.0)(jax.random.PRNGKey(0), sig)
    assert float(jnp.max(jnp.abs(out.audio_data))) == 0.0
    inv = tfm.InvertPhase()(jax.random.PRNGKey(0), sig)
    np.testing.assert_allclose(np.asarray(inv.audio_data),
                               -np.asarray(sig.audio_data))


def test_frequency_mask_removes_band(rng):
    sig = make_signal(rng, f=2000.0)
    # mask 0.2..0.3 of nyquist = 1600..2400 Hz, covering the 2 kHz tone
    out = tfm.FrequencyMask(f_center=("const", 0.25),
                            f_width=("const", 0.1))(
        jax.random.PRNGKey(0), sig)
    spec = np.abs(np.fft.rfft(np.asarray(out.audio_data[0, 0])))
    freqs = np.fft.rfftfreq(sig.signal_length, 1 / SR)
    band = (freqs > 1700) & (freqs < 2300)
    outside = (freqs < 1200) | (freqs > 2800)
    assert spec[band].max() < 0.05 * np.abs(
        np.fft.rfft(np.asarray(sig.audio_data[0, 0])))[band].max()
    del outside


def test_time_mask_zeroes_span(rng):
    sig = make_signal(rng)
    out = tfm.TimeMask(t_center=("const", 0.5),
                       t_width=("const", 0.3))(jax.random.PRNGKey(0), sig)
    a = np.asarray(out.audio_data[0, 0])
    t = sig.signal_length
    mid = a[int(0.45 * t): int(0.55 * t)]
    edge = a[: int(0.2 * t)]
    assert np.abs(mid).max() < 0.1 * np.abs(edge).max()


def test_mask_low_magnitudes_denoises(rng):
    sig = make_signal(rng)
    out = tfm.MaskLowMagnitudes(db_cutoff=("const", -5.0))(
        jax.random.PRNGKey(0), sig)
    # the tone survives, the -40ish dB noise floor drops
    assert float(jnp.max(jnp.abs(out.audio_data))) > 0.2
    res_in = np.asarray(sig.audio_data[0, 0])
    res_out = np.asarray(out.audio_data[0, 0])
    spec_in = np.abs(np.fft.rfft(res_in))
    spec_out = np.abs(np.fft.rfft(res_out))
    floor_in = np.median(spec_in)
    floor_out = np.median(spec_out)
    assert floor_out < 0.5 * floor_in


def test_time_and_frequency_noise_fill_with_noise(rng):
    sig = make_signal(rng)
    tn = tfm.TimeNoise(t_center=("const", 0.5),
                       t_width=("const", 0.3))(jax.random.PRNGKey(0), sig)
    a = np.asarray(tn.audio_data[0, 0])
    mid = a[int(0.45 * sig.signal_length): int(0.55 * sig.signal_length)]
    assert np.std(mid) > 1e-3  # noise, not zeros
    fn = tfm.FrequencyNoise(f_center=("const", 0.25),
                            f_width=("const", 0.1))(
        jax.random.PRNGKey(0), sig)
    assert not np.allclose(np.asarray(fn.audio_data),
                           np.asarray(sig.audio_data))


def test_corrupt_phase_keeps_magnitude(rng):
    sig = make_signal(rng)
    out = tfm.CorruptPhase(scale=("const", 0.3))(jax.random.PRNGKey(0),
                                                 sig)
    # mild phase scrambling roughly preserves spectral energy (some loss
    # to overlap-add interference is physical and matches the reference)
    e_in = float(jnp.sum(sig.clone().stft().magnitude() ** 2))
    e_out = float(jnp.sum(out.clone().stft().magnitude() ** 2))
    assert abs(e_out - e_in) / e_in < 0.3
    assert not np.allclose(np.asarray(out.audio_data),
                           np.asarray(sig.audio_data), atol=1e-3)


def test_spectral_gate_removes_noise_keeps_tone(rng):
    t = np.arange(SR) / SR
    tone = 0.5 * np.sin(2 * np.pi * 440 * t)
    noise = 0.05 * rng.standard_normal(SR)
    sig = AudioSignal((tone + noise).astype(np.float32)[None, None], SR)
    nz = AudioSignal(
        (0.05 * rng.standard_normal(SR)).astype(np.float32)[None, None],
        SR)
    out = spectral_gate(sig, nz, denoise_amount=1.0)
    spec_in = np.abs(np.fft.rfft(np.asarray(sig.audio_data[0, 0])))
    spec_out = np.abs(np.fft.rfft(np.asarray(out.audio_data[0, 0])))
    freqs = np.fft.rfftfreq(SR, 1 / SR)
    tone_bin = np.argmin(np.abs(freqs - 440))
    hf = freqs > 4000
    # tone survives (within 3 dB), high-frequency noise floor drops >6 dB
    assert spec_out[tone_bin] > 0.7 * spec_in[tone_bin]
    assert np.median(spec_out[hf]) < 0.5 * np.median(spec_in[hf])


def test_spectral_denoising_transform_runs(rng):
    sig = make_signal(rng, batch=1, seconds=0.6)
    out = tfm.SpectralDenoising()(jax.random.PRNGKey(0), sig)
    assert out.audio_data.shape == sig.audio_data.shape
    assert np.all(np.isfinite(np.asarray(out.audio_data)))


def test_build_transform_accepts_new_names():
    t = tfm.build_transform(
        augment_prob=1.0, preprocess=("Identity",),
        augment=("NoiseFloor", "TimeMask", "FrequencyMask"),
        postprocess=("RescaleAudio",))
    assert isinstance(t, tfm.Compose)


@pytest.mark.parametrize("cls,kw", [
    ("Choose", {}), ("NoiseFloor", {}), ("CrossTalk", {}),
    ("Silence", {"prob": 1.0}), ("InvertPhase", {}),
    ("CorruptPhase", {}), ("FrequencyMask", {}), ("TimeMask", {}),
    ("MaskLowMagnitudes", {}), ("TimeNoise", {}), ("FrequencyNoise", {}),
])
def test_prob_gating_and_shapes(rng, cls, kw):
    sig = make_signal(rng, batch=2, seconds=0.3)
    ctor = getattr(tfm, cls)
    t = ctor(tfm.Identity(), tfm.Identity(), **kw) if cls == "Choose" \
        else ctor(**kw)
    out = t(jax.random.PRNGKey(7), sig)
    assert out.audio_data.shape == sig.audio_data.shape
    assert np.all(np.isfinite(np.asarray(out.audio_data)))
    # prob=0 must be a passthrough
    t0 = ctor(tfm.Identity(), tfm.Identity(), prob=0.0) \
        if cls == "Choose" else ctor(prob=0.0)
    out0 = t0(jax.random.PRNGKey(7), sig)
    np.testing.assert_allclose(np.asarray(out0.audio_data),
                               np.asarray(sig.audio_data))


def test_pesq_visqol_gated_api():
    """pesq()/visqol() exist with the reference signature and fail with
    an actionable ImportError when the external packages are absent
    (reference: audiotools/metrics/quality.py)."""
    from minimax_speech_tpu.utils import audio_metrics as m
    x = np.zeros(16000, np.float32)
    for fn in (m.pesq, m.visqol):
        try:
            fn(x, x, 16000)
        except ImportError as e:
            assert "stoi" in str(e)
        # if the optional package IS installed, any result is fine
