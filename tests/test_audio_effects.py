"""audiotools effects/transforms/metrics slice (CPU).

Reference behaviors: dac-vae/audiotools/core/effects.py (EffectMixin),
data/transforms.py (transform classes), metrics/{quality,distance}.py.
"""
import numpy as np
import pytest

import jax

from minimax_speech_tpu.utils import audio_metrics as am
from minimax_speech_tpu.utils import audio_transforms as tfm
from minimax_speech_tpu.utils.audio_signal import AudioSignal

SR = 24000


def _sine(f0=220.0, secs=0.5, amp=0.5, sr=SR):
    t = np.arange(int(secs * sr)) / sr
    return (amp * np.sin(2 * np.pi * f0 * t)).astype(np.float32)


@pytest.fixture
def sig():
    return AudioSignal(_sine()[None, None, :], SR)


def test_equalizer_zero_db_is_identity(sig):
    out = sig.equalizer(np.zeros(6))
    np.testing.assert_allclose(np.asarray(out.audio_data),
                               np.asarray(sig.audio_data), atol=1e-4)


def test_equalizer_cut_reduces_energy(sig):
    out = sig.equalizer(np.full(6, -3.0))
    e_in = float(np.mean(np.asarray(sig.audio_data) ** 2))
    e_out = float(np.mean(np.asarray(out.audio_data) ** 2))
    assert e_out < 0.1 * e_in  # 10^-3 per band in power-ish terms


def test_low_high_pass_complement(sig):
    lp = sig.low_pass(2000)
    hp = sig.high_pass(2000)
    np.testing.assert_allclose(
        np.asarray(lp.audio_data) + np.asarray(hp.audio_data),
        np.asarray(sig.audio_data), atol=1e-4)


def test_low_pass_kills_high_tone():
    lo = AudioSignal(_sine(220)[None, None], SR)
    hi = AudioSignal(_sine(8000)[None, None], SR)
    lp_lo = lo.low_pass(2000)
    lp_hi = hi.low_pass(2000)
    e = lambda s: float(np.mean(np.asarray(s.audio_data) ** 2))
    assert e(lp_lo) > 0.8 * e(lo)     # passband intact
    assert e(lp_hi) < 0.02 * e(hi)    # stopband attenuated


def test_convolve_with_delta_is_identity(sig):
    delta = np.zeros(256, np.float32)
    delta[0] = 1.0
    out = sig.convolve(AudioSignal(delta[None, None], SR),
                       start_at_max=False)
    np.testing.assert_allclose(np.asarray(out.audio_data),
                               np.asarray(sig.audio_data), atol=1e-4)


def test_clip_distortion(sig):
    out = sig.clip_distortion(0.2)
    assert float(np.max(np.abs(out.audio_data))) \
        < float(np.max(np.abs(sig.audio_data)))
    # zero percentile = no clipping
    out0 = sig.clip_distortion(0.0)
    np.testing.assert_allclose(np.asarray(out0.audio_data),
                               np.asarray(sig.audio_data), atol=1e-6)


def test_quantization_levels(sig):
    out = sig.quantization(16)
    vals = np.unique(np.round(np.asarray(out.audio_data), 6))
    assert len(vals) <= 17
    # error bounded by one step
    assert float(np.max(np.abs(np.asarray(out.audio_data)
                               - np.asarray(sig.audio_data)))) <= 2 / 16


def test_mulaw_quantization(sig):
    out = sig.mulaw_quantization(256)
    err = float(np.max(np.abs(np.asarray(out.audio_data)
                              - np.asarray(sig.audio_data))))
    assert err < 0.05  # mu-law at 256 channels is fine-grained


def test_mix_snr(sig):
    noise = AudioSignal(
        np.random.default_rng(0).standard_normal(
            sig.signal_length).astype(np.float32)[None, None] * 0.1, SR)
    quiet = sig.clone().mix(noise.clone(), snr=60.0)
    loud = sig.clone().mix(noise.clone(), snr=0.0)
    err_q = float(np.mean((np.asarray(quiet.audio_data)
                           - np.asarray(sig.audio_data)) ** 2))
    err_l = float(np.mean((np.asarray(loud.audio_data)
                           - np.asarray(sig.audio_data)) ** 2))
    assert err_q < 1e-4
    assert err_l > 100 * err_q


def test_transform_chain(sig):
    chain = tfm.Compose(
        tfm.BackgroundNoise(snr=("uniform", 20.0, 30.0)),
        tfm.Equalizer(),
        tfm.LowPass(cutoff=("const", 8000)),
        tfm.ClippingDistortion(perc=("const", 0.02)),
        tfm.MuLawQuantization(channels=("const", 256)),
        tfm.Smoothing(window_length=("const", 8)),
        tfm.RescaleAudio())
    out = chain(jax.random.PRNGKey(0), sig)
    a = np.asarray(out.audio_data)
    assert a.shape == np.asarray(sig.audio_data).shape
    assert np.isfinite(a).all()
    assert np.max(np.abs(a)) <= 1.0 + 1e-6
    # still correlated with the input (augmentation, not destruction)
    x = np.asarray(sig.audio_data).ravel()
    y = a.ravel()
    corr = np.dot(x - x.mean(), y - y.mean()) / (
        np.std(x) * np.std(y) * len(x))
    assert corr > 0.5


def test_room_impulse_response(sig):
    out = tfm.RoomImpulseResponse()(jax.random.PRNGKey(1), sig)
    a = np.asarray(out.audio_data)
    assert np.isfinite(a).all()
    # peak preserved (apply_ir semantics)
    np.testing.assert_allclose(np.max(np.abs(a)),
                               float(np.max(np.abs(sig.audio_data))),
                               rtol=1e-3)


def test_smoothing_preserves_peak(sig):
    out = tfm.Smoothing(window_length=("const", 32))(
        jax.random.PRNGKey(2), sig)
    np.testing.assert_allclose(
        float(np.max(np.abs(out.audio_data))),
        float(np.max(np.abs(sig.audio_data))), rtol=1e-3)


# -- metrics ----------------------------------------------------------------

def _speechy(secs=1.5, sr=SR, seed=0):
    """Modulated multi-tone — enough structure for STOI's bands."""
    rng = np.random.default_rng(seed)
    t = np.arange(int(secs * sr)) / sr
    x = np.zeros_like(t)
    for f0 in (180, 420, 950, 2100, 3600):
        x += rng.uniform(0.1, 0.3) * np.sin(
            2 * np.pi * f0 * t + rng.uniform(0, 6))
    env = 0.4 + 0.6 * np.abs(np.sin(2 * np.pi * 3.0 * t))
    return (x * env).astype(np.float32)


def test_stoi_clean_vs_noisy():
    x = _speechy()
    clean = am.stoi(x, x, SR)
    noisy = am.stoi(x, x + 0.5 * np.random.default_rng(1)
                    .standard_normal(len(x)).astype(np.float32), SR)
    assert clean > 0.99
    assert noisy < clean - 0.05


def test_si_sdr():
    x = _speechy()
    assert am.si_sdr(x, x * 0.5) > 50        # scale-invariant
    noisy = x + 0.1 * np.random.default_rng(2).standard_normal(
        len(x)).astype(np.float32)
    v = am.si_sdr(x, noisy)
    assert 0 < v < 30


def test_distances():
    x = _speechy()
    assert am.l1_distance(x, x) == 0.0
    assert am.mel_distance(x, x) < 1e-6
    y = np.roll(x, 100)
    assert am.l1_distance(x, y) > 0
